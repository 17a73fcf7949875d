"""Evaluation domain: subgroup H (size 2^k) + extended coset (size 2^ek).

The halo2 EvaluationDomain equivalent (SURVEY §2.2 halo2_proofs row):
polynomials live in three bases — Lagrange-on-H (assignment form),
coefficient, and extended-coset evaluation (for the quotient). All basis
changes are device NTTs; the coset generator is the Fr multiplicative
generator (7), which lies outside every 2-power subgroup.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_FR, BN254_FR_GENERATOR
from ..fields.limbs import FR_SPEC, L
from ..ops import modops as M
from ..ops import ntt as N

R = BN254_FR
COSET_GEN = BN254_FR_GENERATOR


@dataclass(frozen=True)
class Domain:
    k: int
    extended_k: int

    def __hash__(self):
        return hash((self.k, self.extended_k))

    @property
    def n(self) -> int:
        return 1 << self.k

    @property
    def ext_n(self) -> int:
        return 1 << self.extended_k

    @property
    def omega(self) -> int:
        return N.root_of_unity(self.k)

    @property
    def omega_ext(self) -> int:
        return N.root_of_unity(self.extended_k)

    # --- basis conversions (device) ---
    def lagrange_to_coeff(self, a: jnp.ndarray) -> jnp.ndarray:
        return N.intt(FR_SPEC, a, self.k)

    def coeff_to_lagrange(self, a: jnp.ndarray) -> jnp.ndarray:
        return N.ntt(FR_SPEC, a, self.k)

    def coeff_to_extended(self, a: jnp.ndarray) -> jnp.ndarray:
        """coeff (L, n) -> evaluations on the coset g*H_ext (L, ext_n)."""
        pad = jnp.zeros((L, self.ext_n - a.shape[1]), dtype=jnp.int32)
        a = jnp.concatenate([a, pad], axis=1)
        return N.ntt(FR_SPEC, N.coset_shift(FR_SPEC, a, COSET_GEN), self.extended_k)

    def extended_to_coeff(self, a: jnp.ndarray) -> jnp.ndarray:
        """coset evals (L, ext_n) -> coeffs (L, ext_n) (caller truncates)."""
        coeffs = N.intt(FR_SPEC, a, self.extended_k)
        ginv = pow(COSET_GEN, R - 2, R)
        return N.coset_shift(FR_SPEC, coeffs, ginv)

    # --- vanishing polynomial helpers ---
    @functools.lru_cache(maxsize=None)
    def zh_inv_extended_np(self) -> np.ndarray:
        """(L, ext_n) Montgomery tensor of 1 / Z_H(coset point j).

        Z_H(g w_ext^j) = g^n * (w_ext^n)^j - 1: periodic with period
        ext_n / n, never zero on the coset.
        """
        period = self.ext_n // self.n
        gn = pow(COSET_GEN, self.n, R)
        wn = pow(self.omega_ext, self.n, R)
        vals = []
        acc = gn
        for _ in range(period):
            vals.append(pow((acc - 1) % R, R - 2, R))
            acc = acc * wn % R
        tiled = (vals * (self.ext_n // period))[: self.ext_n]
        return np.asarray(FR_SPEC.encode(tiled), dtype=np.int32)

    def divide_by_vanishing(self, ext_evals: jnp.ndarray) -> jnp.ndarray:
        return M.montmul(FR_SPEC, ext_evals, jnp.asarray(self.zh_inv_extended_np()))

    # --- scalar helpers (host ints) ---
    def rotate_point(self, x: int, rotation: int) -> int:
        """x * omega^rotation (host)."""
        if rotation >= 0:
            return x * pow(self.omega, rotation, R) % R
        return x * pow(pow(self.omega, R - 2, R), -rotation, R) % R
