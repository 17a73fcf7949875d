#!/usr/bin/env python
"""Deploy-script-as-test (DeployAccountFactory.s.sol:47-88 parity).

Deploys the full chain suite into the in-repo EVM — EntryPoint, account
implementation, factory, SponsorPaymaster (+deposit), Counter, and the
snark verifier — creates an account, sends one real UserOperation through
`handleOps`, asserts the counter incremented, and prints a forge-style
gas report (contracts/README.md:6-30 parity).

Verifier source, in priority order:
  --verifier-code <path>   deploy-bytecode JSON ({"code": [...]}, the
                           generate_verifier artifact) + --proof <hex file>
  (default)                a stub verifier that accepts 96-byte-aligned
                           calldata (measures the ERC-4337 overhead
                           separately from the SNARK verify gas)

Pure host Python — no JAX needed.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webauthn_halo2_tpu.chain import abi, contracts
from webauthn_halo2_tpu.chain.abi import UserOperation, selector
from webauthn_halo2_tpu.evm.machine import Chain
from webauthn_halo2_tpu.evm.yulc import compile_contract

ETH = 10**18
DEPLOYER = 0xD3B10  # the broadcast EOA
BENEFICIARY = 0xFEE

# stub verifier: success iff calldatasize() > 0 and calldatasize() % 32 == 0
STUB_VERIFIER_YUL = """
if iszero(calldatasize()) { revert(0, 0) }
if mod(calldatasize(), 32) { revert(0, 0) }
return(0, 0)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--verifier-code", help="deploy bytecode JSON artifact")
    ap.add_argument("--proof", help="hex proof file (the userOp signature)")
    args = ap.parse_args()

    chain = Chain()
    chain.set_balance(DEPLOYER, 10_000 * ETH)
    gas_report: list[tuple[str, int]] = []

    def deploy(name: str, code: bytes) -> int:
        addr, res = chain.create(DEPLOYER, code)
        assert res.success, f"{name} deploy failed"
        gas_report.append((f"deploy {name}", res.gas_used))
        return addr

    if args.verifier_code:
        with open(args.verifier_code) as f:
            vcode = bytes(json.load(f)["code"])
        proof = bytes.fromhex(
            open(args.proof).read().strip().removeprefix("0x"))
        verifier = deploy("Verifier (generated)", vcode)
    else:
        vcode, _ = compile_contract(STUB_VERIFIER_YUL)
        proof = bytes(64)  # any 32-aligned payload satisfies the stub
        verifier = deploy("Verifier (stub)", vcode)

    ep = deploy("EntryPoint", contracts.compile_entry_point()[0])
    impl = deploy("P256Account impl", contracts.compile_account_impl()[0])
    factory = deploy("P256AccountFactory",
                     contracts.compile_factory(impl, ep, verifier)[0])
    paymaster = deploy("SponsorPaymaster",
                       contracts.compile_paymaster(ep, DEPLOYER)[0])
    counter = deploy("Counter", contracts.compile_counter()[0])

    # paymaster deposit (script sends 1 ETH — DeployAccountFactory.s.sol)
    res = chain.call(DEPLOYER, paymaster,
                     selector("deposit()").to_bytes(4, "big"), value=1 * ETH)
    assert res.success
    gas_report.append(("paymaster.deposit(1 ETH)", res.gas_used))

    # createAccount
    pk_bytes = b"deploy-script-demo-key"
    res = chain.call(DEPLOYER, factory, abi.encode_create_account(pk_bytes))
    assert res.success
    account = int.from_bytes(res.output, "big")
    gas_report.append(("factory.createAccount", res.gas_used))

    # fund the account's entrypoint deposit and send one userOp e2e
    res = chain.call(DEPLOYER, ep,
                     selector("depositTo(address)").to_bytes(4, "big")
                     + account.to_bytes(32, "big"), value=10 * ETH)
    assert res.success
    op = UserOperation(
        sender=account,
        call_data=abi.encode_execute(
            counter, 0, selector("increment()").to_bytes(4, "big")),
        signature=proof,
    )
    res = chain.call(DEPLOYER, ep, abi.encode_handle_ops([op], BENEFICIARY))
    assert res.success, f"handleOps reverted: {res.output.hex()[:80]}"
    gas_report.append(("handleOps (1 op, e2e)", res.gas_used))

    out = chain.call(DEPLOYER, counter, selector("number()").to_bytes(4, "big"))
    assert int.from_bytes(out.output, "big") == 1, "counter did not increment"

    print("== gas report (in-repo EVM; reference tables at "
          "contracts/README.md:6-30) ==")
    for name, gas in gas_report:
        print(f"  {name:32s} {gas:>12,}")
    print("counter incremented through handleOps: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
