"""ERC-4337 end-to-end through the bytecode EVM.

The foundry-test pattern (P256Account.t.sol:32-38,89-124 and
SponsorPaymaster.t.sol:92-132): deploy the REAL generated verifier
bytecode, drive EntryPoint.handleOps with a REAL proof as the userOp
signature, and assert a Counter increments — plus the failure and
paymaster variants. Everything runs as actual EVM bytecode in
evm/machine.py; the contracts are compiled from the framework's own Yul
sources by evm/yulc.py."""
import sys

import pytest

sys.path.insert(0, "tests")
from test_plonk_e2e import K, build_toy, build_witness

from webauthn_halo2_tpu.chain import abi, contracts
from webauthn_halo2_tpu.chain.abi import UserOperation, selector
from webauthn_halo2_tpu.evm.machine import Chain
from webauthn_halo2_tpu.evm.yul_asm import compile_yul
from webauthn_halo2_tpu.evm.codegen import generate_verifier
from webauthn_halo2_tpu.plonk.keygen import keygen
from webauthn_halo2_tpu.plonk.prover import create_proof
from webauthn_halo2_tpu.plonk.srs import get_srs
from webauthn_halo2_tpu.plonk.transcript import KeccakWrite

RICHARD = 0x1234  # the funder (t.sol's makeAddr("richard"))
BENEFICIARY = 0xBEEF
PUBLIC_KEY = b"iliketturtles"  # P256Account.t.sol's registration constant
ETH = 10**18


@pytest.fixture(scope="module")
def proof_and_verifier():
    """One expensive artifact set per module: a valid GWC/Keccak proof and
    the generated verifier's deploy bytecode (the t.sol embedded-constant
    pattern, P256Account.t.sol:120-124)."""
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [], scheme="gwc",
                         transcript=KeccakWrite())
    yul, _sol = generate_verifier(pk.vk, srs)
    deploy, _runtime = compile_yul(yul)
    return proof, deploy


@pytest.fixture()
def world(proof_and_verifier):
    """Fresh chain with the full suite deployed + a Counter target."""
    proof, verifier_deploy = proof_and_verifier
    chain = Chain()
    chain.set_balance(RICHARD, 1000 * ETH)
    vaddr, res = chain.create(RICHARD, verifier_deploy)
    assert res.success, "verifier deployment failed"
    suite = contracts.deploy_suite(chain, RICHARD, vaddr)
    caddr, res = chain.create(RICHARD, contracts.compile_counter()[0])
    assert res.success
    suite["counter"] = caddr
    return chain, suite, proof


def _call(chain, sender, to, data, value=0):
    return chain.call(sender, to, data, value=value)


def _word(res, i=0) -> int:
    return int.from_bytes(res.output[32 * i:32 * (i + 1)], "big")


def _create_account(chain, suite) -> int:
    res = _call(chain, RICHARD, suite["factory"],
                abi.encode_create_account(PUBLIC_KEY))
    assert res.success, "createAccount failed"
    return _word(res)


def _fund_deposit(chain, suite, account: int, wei: int) -> None:
    res = _call(chain, RICHARD, suite["entry_point"],
                selector("depositTo(address)").to_bytes(4, "big")
                + account.to_bytes(32, "big"), value=wei)
    assert res.success


def _user_op(chain, suite, account: int, signature: bytes,
             paymaster: int = 0, init_code: bytes = b"") -> UserOperation:
    nonce_res = _call(chain, RICHARD, suite["entry_point"],
                      selector("getNonce(address,uint192)").to_bytes(4, "big")
                      + account.to_bytes(32, "big") + (0).to_bytes(32, "big"))
    call_data = abi.encode_execute(
        suite["counter"], 0,
        selector("increment()").to_bytes(4, "big"))
    pmd = paymaster.to_bytes(20, "big") if paymaster else b""
    return UserOperation(
        sender=account, nonce=_word(nonce_res), init_code=init_code,
        call_data=call_data, paymaster_and_data=pmd, signature=signature,
        # t.sol's gas constants (_createUserOp)
        call_gas_limit=10_000_000, verification_gas_limit=10_000_000,
        pre_verification_gas=1_000_000, max_fee_per_gas=10_000_000,
        max_priority_fee_per_gas=10_000_000,
    )


def _handle_ops(chain, suite, ops):
    return _call(chain, RICHARD, suite["entry_point"],
                 abi.encode_handle_ops(ops, BENEFICIARY))


def _counter_value(chain, suite) -> int:
    return _word(_call(chain, RICHARD, suite["counter"],
                       selector("number()").to_bytes(4, "big")))


def test_account_creation(world):
    """testCreation parity: deterministic address, stored publicKey,
    idempotent createAccount."""
    chain, suite, _ = world
    pred = _word(_call(chain, RICHARD, suite["factory"],
                       abi.encode_get_address(PUBLIC_KEY)))
    account = _create_account(chain, suite)
    assert account == pred, "counterfactual address mismatch"
    assert chain.account(account).code, "no proxy code deployed"
    # publicKey() returns the registered bytes
    res = _call(chain, RICHARD, account,
                selector("publicKey()").to_bytes(4, "big"))
    assert res.success
    ln = _word(res, 1)
    assert res.output[64:64 + ln] == PUBLIC_KEY
    # idempotent: second call returns the same address, doesn't redeploy
    assert _create_account(chain, suite) == account
    # entryPoint/snarkVerifier wired
    assert _word(_call(chain, RICHARD, account,
                       selector("entryPoint()").to_bytes(4, "big"))) \
        == suite["entry_point"]
    assert _word(_call(chain, RICHARD, account,
                       selector("snarkVerifier()").to_bytes(4, "big"))) \
        == suite["verifier"]


def test_user_op_e2e_success(world):
    """testUserOpE2ESuccess parity: valid proof as signature -> counter
    increments through handleOps; beneficiary is compensated."""
    chain, suite, proof = world
    account = _create_account(chain, suite)
    _fund_deposit(chain, suite, account, 10 * ETH)
    op = _user_op(chain, suite, account, proof)
    res = _handle_ops(chain, suite, [op])
    assert res.success, f"handleOps reverted: {res.output.hex()[:100]}"
    assert _counter_value(chain, suite) == 1
    assert chain.account(BENEFICIARY).balance > 0, "beneficiary not paid"
    # UserOperationEvent emitted with success=1
    ev = [l for l in res.logs
          if l.topics and l.topics[0] == contracts.USER_OPERATION_EVENT_TOPIC]
    assert len(ev) == 1
    assert int.from_bytes(ev[0].data[32:64], "big") == 1  # success flag


def test_user_op_e2e_failure(world):
    """testUserOpE2EFailure parity: empty/garbage signature -> FailedOp
    AA24 revert, counter unchanged."""
    chain, suite, proof = world
    account = _create_account(chain, suite)
    _fund_deposit(chain, suite, account, 10 * ETH)
    for sig in (b"", proof[:-32], bytes(len(proof))):
        op = _user_op(chain, suite, account, sig)
        res = _handle_ops(chain, suite, [op])
        assert not res.success, "handleOps accepted a bad signature"
        assert res.output[:4] == contracts.FAILED_OP_SELECTOR.to_bytes(4, "big")
        assert b"AA24" in res.output, res.output.hex()
    assert _counter_value(chain, suite) == 0


def test_user_op_with_paymaster(world):
    """testUserOpWithPaymaster parity: paymaster pays; account needs no
    deposit; paymaster's deposit is charged."""
    chain, suite, proof = world
    account = _create_account(chain, suite)
    # paymaster deposits with the entrypoint (deposit() forwards)
    res = _call(chain, RICHARD, suite["paymaster"],
                selector("deposit()").to_bytes(4, "big"), value=20 * ETH)
    assert res.success
    bal = selector("balanceOf(address)").to_bytes(4, "big")
    before = _word(_call(chain, RICHARD, suite["entry_point"],
                         bal + suite["paymaster"].to_bytes(32, "big")))
    assert before == 20 * ETH
    op = _user_op(chain, suite, account, proof,
                  paymaster=suite["paymaster"])
    res = _handle_ops(chain, suite, [op])
    assert res.success, f"handleOps reverted: {res.output.hex()[:100]}"
    assert _counter_value(chain, suite) == 1
    after = _word(_call(chain, RICHARD, suite["entry_point"],
                        bal + suite["paymaster"].to_bytes(32, "big")))
    assert after < before, "paymaster deposit not charged"


def test_user_op_with_paymaster_no_deposit(world):
    """testUserOpWithPaymasterNoDeposit parity: AA31 revert."""
    chain, suite, proof = world
    account = _create_account(chain, suite)
    op = _user_op(chain, suite, account, proof,
                  paymaster=suite["paymaster"])
    res = _handle_ops(chain, suite, [op])
    assert not res.success
    assert b"AA31" in res.output, res.output.hex()


def test_init_code_counterfactual_deployment(world):
    """The web demo's counterfactual flow (index.tsx:327-341): userOp with
    initCode deploys the account inside handleOps; getSenderAddress
    reverts with SenderAddressResult."""
    chain, suite, proof = world
    pred = _word(_call(chain, RICHARD, suite["factory"],
                       abi.encode_get_address(PUBLIC_KEY)))
    assert not chain.account(pred).code
    # getSenderAddress revert-parse trick
    init_code = abi.init_code_for(suite["factory"], PUBLIC_KEY)
    res = _call(chain, RICHARD, suite["entry_point"],
                selector("getSenderAddress(bytes)").to_bytes(4, "big")
                + (0x20).to_bytes(32, "big") + abi.encode_bytes(init_code))
    assert not res.success
    assert res.output[:4] == \
        contracts.SENDER_ADDRESS_RESULT_SELECTOR.to_bytes(4, "big")
    assert int.from_bytes(res.output[4:36], "big") == pred
    # userOp with initCode: account deployed + op executed in one handleOps
    _fund_deposit(chain, suite, pred, 10 * ETH)
    op = _user_op(chain, suite, pred, proof, init_code=init_code)
    res = _handle_ops(chain, suite, [op])
    assert res.success, f"handleOps reverted: {res.output.hex()[:100]}"
    assert chain.account(pred).code, "initCode did not deploy the account"
    assert _counter_value(chain, suite) == 1


def test_entrypoint_gated_setters_and_inherit(world):
    """P256Account.sol:49-71 parity: setters only from the entrypoint;
    inherit() transfers the balance after the inactivity window."""
    chain, suite, _ = world
    account = _create_account(chain, suite)
    ep = suite["entry_point"]
    heir = 0x4321
    set_inh = selector("setInheritor(address)").to_bytes(4, "big") \
        + heir.to_bytes(32, "big")
    # non-entrypoint caller is rejected
    assert not _call(chain, RICHARD, account, set_inh).success
    assert _call(chain, ep, account, set_inh).success
    limit = selector("setInactiveTimeLimit(uint256)").to_bytes(4, "big") \
        + (0).to_bytes(32, "big")
    assert _call(chain, ep, account, limit).success
    # fund the account and inherit (timestamp > lastActiveTime + 0 limit)
    chain.set_balance(account, 5 * ETH)
    chain.timestamp += 1_000_000
    res = _call(chain, heir, account,
                selector("inherit()").to_bytes(4, "big"))
    assert res.success, res.output.hex()
    assert chain.account(heir).balance == 5 * ETH
    # a stranger cannot inherit
    assert not _call(chain, 0x9999, account,
                     selector("inherit()").to_bytes(4, "big")).success


def test_stake_manager_lifecycle(world):
    """StakeManager surface (core/StakeManager.sol parity): addStake /
    unlockStake / withdrawStake / getDepositInfo."""
    chain, suite, _ = world
    ep = suite["entry_point"]
    add_stake = selector("addStake(uint32)").to_bytes(4, "big") \
        + (100).to_bytes(32, "big")
    # zero delay rejected
    assert not _call(chain, RICHARD, ep,
                     selector("addStake(uint32)").to_bytes(4, "big")
                     + (0).to_bytes(32, "big"), value=ETH).success
    assert _call(chain, RICHARD, ep, add_stake, value=2 * ETH).success
    # decreasing the delay is rejected
    assert not _call(chain, RICHARD, ep,
                     selector("addStake(uint32)").to_bytes(4, "big")
                     + (50).to_bytes(32, "big")).success
    info = _call(chain, RICHARD, ep,
                 selector("getDepositInfo(address)").to_bytes(4, "big")
                 + RICHARD.to_bytes(32, "big"))
    assert info.success
    assert _word(info, 1) == 1            # staked
    assert _word(info, 2) == 2 * ETH      # stake
    assert _word(info, 3) == 100          # unstakeDelaySec
    # withdraw before unlock rejected
    wd = selector("withdrawStake(address)").to_bytes(4, "big") \
        + (0x7777).to_bytes(32, "big")
    assert not _call(chain, RICHARD, ep, wd).success
    assert _call(chain, RICHARD, ep,
                 selector("unlockStake()").to_bytes(4, "big")).success
    # unlock twice rejected (no longer staked)
    assert not _call(chain, RICHARD, ep,
                     selector("unlockStake()").to_bytes(4, "big")).success
    # withdraw before the delay elapses rejected
    assert not _call(chain, RICHARD, ep, wd).success
    chain.timestamp += 101
    assert _call(chain, RICHARD, ep, wd).success
    assert chain.account(0x7777).balance == 2 * ETH
    info = _call(chain, RICHARD, ep,
                 selector("getDepositInfo(address)").to_bytes(4, "big")
                 + RICHARD.to_bytes(32, "big"))
    assert _word(info, 2) == 0


def test_simulate_validation(world):
    """simulateValidation (core/EntryPoint.sol:503): always reverts —
    ValidationResult with sigFailed=false for a valid proof, true for a
    garbage signature; decodes ReturnInfo and stake info."""
    chain, suite, proof = world
    account = _create_account(chain, suite)
    _fund_deposit(chain, suite, account, 10 * ETH)
    from webauthn_halo2_tpu.chain.contracts import \
        VALIDATION_RESULT_SELECTOR

    op = _user_op(chain, suite, account, proof)
    res = _call(chain, RICHARD, suite["entry_point"],
                abi.encode_simulate_validation(op))
    assert not res.success, "simulateValidation must always revert"
    assert int.from_bytes(res.output[:4], "big") == VALIDATION_RESULT_SELECTOR
    body = res.output[4:]
    ri_off = int.from_bytes(body[0:32], "big")
    assert ri_off == 0xE0
    sig_failed = int.from_bytes(body[ri_off + 64:ri_off + 96], "big")
    assert sig_failed == 0
    prefund = int.from_bytes(body[ri_off + 32:ri_off + 64], "big")
    assert prefund == op.max_fee_per_gas * (
        op.call_gas_limit + op.verification_gas_limit
        + op.pre_verification_gas)

    bad = _user_op(chain, suite, account, b"\x00" * len(proof))
    res = _call(chain, RICHARD, suite["entry_point"],
                abi.encode_simulate_validation(bad))
    assert not res.success
    assert int.from_bytes(res.output[:4], "big") == VALIDATION_RESULT_SELECTOR
    body = res.output[4:]
    sig_failed = int.from_bytes(body[0xE0 + 64:0xE0 + 96], "big")
    assert sig_failed == 1


def test_production_circuit_user_op():
    """handleOps with the PRODUCTION k=17 ECDSA circuit: the generated
    verifier bytecode + a real GWC/Keccak proof produced on the TPU by
    bench_evm.py (the reference's P256Account.t.sol pins its production
    artifacts the same way). Runs only when the committed artifacts
    exist; the K=6 toy fixture covers the flow in every CI run."""
    import json as _json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code_p = os.path.join(root, "results", "P256Verifier.code")
    proof_p = os.path.join(root, "results", "proof_gwc_k17.hex")
    if not (os.path.exists(code_p) and os.path.exists(proof_p)):
        pytest.skip("production artifacts not generated (run bench_evm.py)")
    deploy = bytes(_json.load(open(code_p))["code"])
    proof = bytes.fromhex(open(proof_p).read().strip())

    chain = Chain()
    chain.set_balance(RICHARD, 1000 * ETH)
    vaddr, res = chain.create(RICHARD, deploy)
    assert res.success
    suite = contracts.deploy_suite(chain, RICHARD, vaddr)
    caddr, res = chain.create(RICHARD, contracts.compile_counter()[0])
    assert res.success
    suite["counter"] = caddr

    account = _create_account(chain, suite)
    _fund_deposit(chain, suite, account, 10 * ETH)
    op = _user_op(chain, suite, account, proof)
    res = _handle_ops(chain, suite, [op])
    assert res.success, res.output.hex()
    num = _call(chain, RICHARD, suite["counter"],
                selector("number()").to_bytes(4, "big"))
    assert _word(num) == 1

    bad = _user_op(chain, suite, account, b"\x00" * len(proof))
    res = _handle_ops(chain, suite, [bad])
    assert not res.success  # AA24 via FailedOp revert


def test_handle_aggregated_ops(world):
    """handleAggregatedOps parity (core/EntryPoint.sol:228 +
    interfaces/IAggregator.sol): the aggregator's validateSignatures runs
    per group before the ops execute; a bad aggregated signature fails
    the whole bundle with AA96."""
    chain, suite, proof = world
    agg_deploy, _ = contracts.compile_mock_aggregator()
    agg, res = chain.create(RICHARD, agg_deploy)
    assert res.success

    account = _create_account(chain, suite)
    _fund_deposit(chain, suite, account, 10 * ETH)
    ops = [_user_op(chain, suite, account, proof)]
    magic = contracts.AGGREGATOR_MAGIC.to_bytes(32, "big")
    start = _counter_value(chain, suite)

    res = _call(chain, RICHARD, suite["entry_point"],
                abi.encode_handle_aggregated_ops([(ops, agg, magic)],
                                                 BENEFICIARY))
    assert res.success, f"handleAggregatedOps reverted: {res.output.hex()[:100]}"
    assert _counter_value(chain, suite) == start + 1
    # the aggregator's validateSignatures actually ran (its group counter)
    assert _word(_call(chain, RICHARD, agg,
                       selector("number()").to_bytes(4, "big"))) == 1

    # second bundle with TWO ops in one group (fresh nonces)
    ops2 = [_user_op(chain, suite, account, proof)]
    res = _call(chain, RICHARD, suite["entry_point"],
                abi.encode_handle_aggregated_ops([(ops2, agg, magic)],
                                                 BENEFICIARY))
    assert res.success
    assert _counter_value(chain, suite) == start + 2

    # bad aggregated signature -> AA96, nothing executes
    ops3 = [_user_op(chain, suite, account, proof)]
    res = _call(chain, RICHARD, suite["entry_point"],
                abi.encode_handle_aggregated_ops(
                    [(ops3, agg, b"\x00" * 32)], BENEFICIARY))
    assert not res.success
    assert b"AA96" in res.output, res.output.hex()
    assert _counter_value(chain, suite) == start + 2

    # aggregator = 0 group behaves like plain handleOps
    ops4 = [_user_op(chain, suite, account, proof)]
    res = _call(chain, RICHARD, suite["entry_point"],
                abi.encode_handle_aggregated_ops([(ops4, 0, b"")],
                                                 BENEFICIARY))
    assert res.success
    assert _counter_value(chain, suite) == start + 3
