"""Blind rotation — the hot core of TFHE gate bootstrapping, MXU-first.

Replaces the reference's per-gate CPU blind rotation inside tfhe-lib
(every ``bootsAND/XOR/NOT`` at ``/root/reference/Cloud/cloud.c:30-43``
costs one of these).  Design:

* one CMux step per LWE mask coefficient:
  ``acc <- acc + BK_i ⊡ (X^bara_i · acc - acc)``
* the external product ``⊡`` is flattened into int8 matmuls:
  digits ``D (B, rows·N)`` x negacyclic-Toeplitz matrix
  ``G (rows·N, (k+1)·N)`` of the step's TRGSW polynomials, split into
  four signed int8 torus limbs.  Each ``s8 x s8 -> s32`` matmul is
  exact; limb recombination with wrapping shifts is exact mod 2^32.
* G is built on the fly per step from the (n, rows, k+1, N) BK tensor
  with log2(N) static rolls — ~25 MB of BK feeds ~50 MB of transient G
  per step, amortized over the whole batch B, so MXU work dominates
  for B >= 256.
* per-gate rotation amounts (bara) make X^bara a batched negacyclic
  roll: a take-along-axis gather on the doubled accumulator.

Cost model per bootstrap (default params, B-batched):
n=500 steps x 4 limb-matmuls x (6144 x 2048) ≈ 25 G int8 MACs — at
v5e's ~394 TOPS int8 peak that is ~8 k bootstraps/s/chip of pure MXU
math, far above the ≥1000/s target; the reference's tfhe-spqlios core
does ~40/s/core (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ieache_tpu.core.poly import (
    TORUS_LIMBS,
    _toeplitz_from_extended,
    negacyclic_extend,
    split_i8_limbs,
)
from ieache_tpu.ops.decompose import gadget_decompose
from ieache_tpu.params import TFHEParams


def _dot_i8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def make_step_gmatrix(bk_step: jnp.ndarray, params: TFHEParams) -> jnp.ndarray:
    """TRGSW step -> flattened negacyclic matmul operand.

    bk_step: int32 (rows, k+1, N) -> int8 (TORUS_LIMBS, rows*N, (k+1)*N)
    with G[v, p*N+m, o*N+j] = limb_v( e_{p,o}[N + j - m] ),
    e = concat(-g, g).
    """
    n = params.N
    rows, kp1 = bk_step.shape[0], bk_step.shape[1]
    e = negacyclic_extend(bk_step)            # (rows, k+1, 2N) int32
    el = split_i8_limbs(e)                    # (rows, k+1, 2N, L) int8
    el = jnp.moveaxis(el, -1, 0)              # (L, rows, k+1, 2N)
    t = _toeplitz_from_extended(el, n)        # (L, rows, k+1, N, 2N)
    t = t[..., n:]                            # (L, rows, k+1, N, N)
    t = jnp.moveaxis(t, 3, 2)                 # (L, rows, N, k+1, N)
    return t.reshape(TORUS_LIMBS, rows * n, kp1 * n)


def negacyclic_rotate_batch(acc: jnp.ndarray, amount: jnp.ndarray) -> jnp.ndarray:
    """X^amount · acc for per-batch amounts in [0, 2N).

    acc: (B, k+1, N) int32; amount: (B,) int32 -> (B, k+1, N).
    """
    n = acc.shape[-1]
    acc2 = jnp.concatenate([acc, -acc], axis=-1)          # (B, k+1, 2N)
    j = jnp.arange(n, dtype=jnp.int32)
    idx = (j[None, :] - amount[:, None]) % (2 * n)        # (B, N)
    return jnp.take_along_axis(acc2, idx[:, None, :], axis=-1)


def _step_digits(acc: jnp.ndarray, bara_i: jnp.ndarray,
                 params: TFHEParams) -> jnp.ndarray:
    """Digits of (X^bara·acc - acc): int32 (B, rows*N)."""
    b = acc.shape[0]
    diff = negacyclic_rotate_batch(acc, bara_i) - acc      # (B, k+1, N)
    digits = gadget_decompose(diff, params.bg_bit, params.l)
    # (B, k+1, N, l) -> (B, k+1, l, N): row p = u*l + j matches BK layout
    digits = jnp.moveaxis(digits, -1, 2)
    return digits.reshape(b, params.trgsw_rows * params.N)


def external_product_step(
    acc: jnp.ndarray, bara_i: jnp.ndarray, bk_i: jnp.ndarray,
    params: TFHEParams,
) -> jnp.ndarray:
    """One CMux: acc + BK_i ⊡ (X^bara_i · acc - acc).  Exact mod 2^32."""
    b = acc.shape[0]
    kp1, n = params.k + 1, params.N
    d = _step_digits(acc, bara_i, params)                  # (B, K) int32
    g = make_step_gmatrix(bk_i, params)                    # (L, K, kp1*N)

    out = jnp.zeros((b, kp1 * n), jnp.int32)
    if params.digit_limbs == 1:
        d8 = d.astype(jnp.int8)
        for v in range(TORUS_LIMBS):
            out = out + (_dot_i8(d8, g[v]) << (8 * v))
    else:
        dl = split_i8_limbs(d, params.digit_limbs)         # (B, K, 2)
        for u in range(params.digit_limbs):
            for v in range(TORUS_LIMBS):
                sh = 8 * u + 8 * v
                if sh >= 32:
                    continue
                out = out + (_dot_i8(dl[..., u], g[v]) << sh)
    return acc + out.reshape(b, kp1, n)


def blind_rotate(
    acc0: jnp.ndarray, bara: jnp.ndarray, bk: jnp.ndarray,
    params: TFHEParams,
) -> jnp.ndarray:
    """Full blind rotation over all n LWE coefficients.

    acc0: (B, k+1, N) int32 — rotated test-vector accumulator.
    bara: (B, n) int32 in [0, 2N) — mod-switched mask coefficients.
    bk:   (n, rows, k+1, N) int32 — bootstrapping key.
    """
    def step(acc, xs):
        bk_i, bara_i = xs
        return external_product_step(acc, bara_i, bk_i, params), None

    acc, _ = jax.lax.scan(step, acc0, (bk, bara.T))
    return acc
