"""Roofline / speed-of-light accounting for the prover's hot kernels.

SURVEY §5.1: the north star asks each phase to report its fraction of
hardware speed-of-light, not just wall time. This module holds the
static work models (limb-op counts per protocol phase) and converts
measured phase spans into utilization fractions against a chip spec.

Work model. All field elements are L=33 8-bit limbs in int32 lanes on
the VPU (the MXU's int8 matmul path is a future direction — the CIOS
inner products are matmul-shaped). One Montgomery multiply costs ~2*L^2
int32 multiply-adds (CIOS product + reduction); adds/subs cost ~L ops
with lazy reduction. Per proof at degree k (n = 2^k rows):

  * NTT of size m: (m/2)*log2(m) butterflies, each 1 montmul + 2 add
  * MSM of size m, window c: ~(m + 2^(c+1) + 4*K) point-adds per window,
    W = ceil(256/c) windows; one Jacobian add_unsafe = 12 montmul
  * grand products: ~(3 montmul + 2 add) per row per permutation column
    + one batch inversion (~3 montmul/row) per chunk
  * quotient: |gates| montmul-equivalents per extended row

v5e peak (public figure): 394 TOPS int8 — an MXU figure. Round-5
measurements (scripts/probe_mxu.py, scripts/bench_mxu.py, on-chip)
replaced the speculative 25 T int32-op VPU ceiling used through round 4
with observed numbers:

  * raw int8 MXU matmul sustains ~119 TOPS at (4096^3); the
    eval-domain int8 montmul built on it (ops/mxu_mod.py) reaches only
    42.9 Mmontmul/s because the per-point mod-q glue exceeds the CIOS
    op budget — the MXU does not serve pairwise bigint products;
  * the tuned VPU/Pallas CIOS montmul sustains 73.3 Mmontmul/s at
    width 2^17 (chained, anchored) = 1.6e11 int32 MAC/s — int32
    multiply is emulated on the VPU, so this IS the practical chip
    ceiling for pairwise modmul (f32 FMA and int16 paths measured
    within ~2x, all HBM- or emulation-bound);
  * elementwise int32/f32 chains are HBM-bound at ~33 G elem/s.

The MEASURED_MONTMUL_PER_S constant below is therefore the honest
speed-of-light denominator: one 2^17 MSM costs ~2.1e7 montmuls -> a
~290 ms floor, and the measured 371 ms MSM runs at ~78% of it.
"""
from __future__ import annotations

from dataclasses import dataclass

L = 33
MONTMUL_OPS = 2 * L * L  # int32 mul-adds per Montgomery multiply (CIOS)
ADD_OPS = L
JAC_ADD_MONTMULS = 12  # add_unsafe: 12 montmuls per point add

# conservative practical int32-op ceiling for one v5e chip, kept for the
# historical SoL table denominators (see module doc for why it is ~150x
# above what int32-multiply workloads can actually reach)
V5E_INT32_OPS = 25e12

# measured chip ceilings (round 5, scripts/bench_mxu.py + probes)
MEASURED_MONTMUL_PER_S = 73.3e6   # chained Pallas CIOS, width 2^17
MEASURED_INT8_MXU_TOPS = 118.6    # raw (4096^3) int8 matmul
MEASURED_HBM_ELEM_PER_S = 33.2e9  # elementwise int32/f32 chain


def montmul_sol(montmuls: float, seconds: float) -> float:
    """Fraction of the MEASURED montmul ceiling a phase achieved."""
    if seconds <= 0:
        return 0.0
    return montmuls / (seconds * MEASURED_MONTMUL_PER_S)


@dataclass
class PhaseWork:
    name: str
    montmuls: float
    adds: float = 0.0

    @property
    def int32_ops(self) -> float:
        return self.montmuls * MONTMUL_OPS + self.adds * ADD_OPS


def ntt_work(m: int, count: int = 1) -> PhaseWork:
    import math

    bf = (m / 2) * math.log2(m) * count
    return PhaseWork("ntt", montmuls=bf, adds=2 * bf)


def msm_work(m: int, c: int = 13, k_lanes: int = 1024) -> PhaseWork:
    W = -(-256 // c)
    adds = W * (m + (1 << (c + 1)) + 4 * k_lanes)
    return PhaseWork("msm", montmuls=adds * JAC_ADD_MONTMULS)


def grand_product_work(n: int, perm_cols: int, chunks: int) -> PhaseWork:
    return PhaseWork("grand products",
                     montmuls=3 * n * perm_cols + 3 * n * chunks,
                     adds=2 * n * perm_cols)


def quotient_work(ext_n: int, gate_terms: int) -> PhaseWork:
    return PhaseWork("quotient", montmuls=float(ext_n) * gate_terms)


def proof_work_model(k: int, num_advice: int, perm_cols: int,
                     lookups: int, gate_terms: int = 120) -> dict:
    """Per-phase work for one ECDSA proof at degree k (static model)."""
    n = 1 << k
    ext_n = 4 * n
    chunks = max(1, -(-perm_cols // 2))
    n_msms = (num_advice + 2 * lookups + chunks + lookups + 1  # commits
              + 3 + 2)  # h pieces + multiopen
    n_ntts_n = (num_advice + chunks + 5 * lookups + 1) * 1  # l2c
    n_ntts_ext = (num_advice + chunks + 5 * lookups + 1)  # c2e (on ext_n)
    return {
        "msm": msm_work(n, c=13),
        "ntt_n": ntt_work(n, n_ntts_n + 10),  # + multiopen cosets
        "ntt_ext": ntt_work(ext_n, n_ntts_ext + 1),
        "grand_products": grand_product_work(n, perm_cols, chunks),
        "quotient": quotient_work(ext_n, gate_terms),
        "_n_msms": n_msms,
    }


def report(spans: dict[str, float], k: int = 17, num_advice: int = 8,
           perm_cols: int = 9, lookups: int = 1,
           peak_ops: float = V5E_INT32_OPS) -> str:
    """spans: measured {phase: seconds}. Returns a speed-of-light table.

    Phases map: 'commits' covers every MSM; 'conversions' the basis NTTs;
    'grand products'; 'quotient'; 'multiopen' the opening NTT pipelines.
    """
    model = proof_work_model(k, num_advice, perm_cols, lookups)
    n_msms = model.pop("_n_msms")
    groups = {
        "commits": model["msm"].int32_ops * n_msms,
        "conversions": model["ntt_n"].int32_ops + model["ntt_ext"].int32_ops,
        "grand products": model["grand_products"].int32_ops,
        "quotient": model["quotient"].int32_ops,
    }
    lines = [f"{'phase':18s} {'time':>9s} {'work(int32 Gop)':>16s} "
             f"{'SoL frac':>9s}"]
    total_t = 0.0
    total_w = 0.0
    for phase, t in spans.items():
        w = groups.get(phase)
        total_t += t
        if w is None:
            lines.append(f"{phase:18s} {t:>8.3f}s {'-':>16s} {'-':>9s}")
            continue
        total_w += w
        frac = w / (t * peak_ops) if t > 0 else 0.0
        lines.append(f"{phase:18s} {t:>8.3f}s {w/1e9:>15.1f} {frac:>8.1%}")
    if total_t:
        lines.append(f"{'TOTAL':18s} {total_t:>8.3f}s {total_w/1e9:>15.1f} "
                     f"{total_w/(total_t*peak_ops):>8.1%}")
    return "\n".join(lines)
