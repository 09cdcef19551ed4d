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
    _toeplitz_rows,
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
    """TRGSW step -> negacyclic matmul operand (Toeplitz tensor).

    bk_step: int32 (rows, k+1, N) -> int8 (TORUS_LIMBS, rows, k+1, N, N)
    with G[v, p, o, m, j] = limb_v( e_{p,o}[N + j - m] ), e = concat(-g, g).
    Kept in this axis order (no transposes/reshapes across non-adjacent
    axes — those cost ~100 MB of relayout per step); the consumer uses
    a multi-dimension dot_general contraction instead.
    """
    n = params.N
    e = negacyclic_extend(bk_step)            # (rows, k+1, 2N) int32
    el = split_i8_limbs(e)                    # (rows, k+1, 2N, L) int8
    el = jnp.moveaxis(el, -1, 0)              # (L, rows, k+1, 2N)
    t = _toeplitz_from_extended(el, n)        # (L, rows, k+1, N, 2N)
    return t[..., n:]                         # (L, rows, k+1, N, N)


def make_step_gmatrix_local(
    bk_step: jnp.ndarray, params: TFHEParams, start: jnp.ndarray,
    n_local: int,
) -> jnp.ndarray:
    """Columns [start, start+n_local) of the step's Toeplitz operand,
    WITHOUT materializing the full (N, 2N) row tensor.

    The SP-sharded bootstrap's memory fix (VERDICT r3): with
    ``T[m, j] = e[N + j - m]``, the local block only reads the window
    ``ew[t] = e[start+1+t]`` of length N + n_local - 1, and splitting
    the m axis into N/n_local blocks makes each block a small
    (n_local, 2·n_local−1) windowed Toeplitz — peak transient is the
    output block (÷sp of the full build) plus one build window, so
    per-device memory actually shrinks with sp (the full-size-build
    + dynamic-slice r3 version shrank only FLOPs).

    ``start`` may be traced (``jax.lax.axis_index``): it only feeds a
    dynamic_slice of ``e``; all block offsets within the window are
    static.

    bk_step: int32 (rows, k+1, N) -> int8 (L, rows, k+1, N, n_local);
    bit-identical to ``make_step_gmatrix(...)[..., start:start+n_local]``.
    """
    n = params.N
    if n % n_local:
        raise ValueError(f"n_local={n_local} must divide N={n}")
    e = negacyclic_extend(bk_step)               # (rows, k+1, 2N) int32
    ew = jax.lax.dynamic_slice_in_dim(
        e, start + 1, n + n_local - 1, axis=-1
    )
    el = split_i8_limbs(ew)                      # (rows, k+1, L', L)
    el = jnp.moveaxis(el, -1, 0)                 # (L, rows, k+1, L')
    blocks = []
    for q in range(n // n_local):
        # rows m = q*n_local + r:  T[m, jj] = wq[(n_local-1) + jj - r]
        lo = n - (q + 1) * n_local
        wq = jax.lax.slice_in_dim(
            el, lo, lo + 2 * n_local - 1, axis=-1
        )
        rows = _toeplitz_rows(wq, n_local)       # (..., n_local, 2nl-1)
        blocks.append(rows[..., n_local - 1:])   # (..., n_local, n_local)
    return jnp.concatenate(blocks, axis=-2)      # (L, rows, k+1, N, nl)


def negacyclic_rotate_batch(acc: jnp.ndarray, amount: jnp.ndarray) -> jnp.ndarray:
    """X^amount · acc for per-batch amounts in [0, 2N).

    acc: (B, k+1, N) int32; amount: (B,) int32 -> (B, k+1, N).

    Implemented as a barrel shifter: log2(2N) stages of conditional
    *static* negacyclic rolls (VPU selects + lane rolls).  A
    take-along-axis gather here costs ~4 ms/step on TPU at B=512 —
    ~10x the entire external product's matmuls — because per-row
    dynamic gathers do not vectorize across lanes; the barrel shifter
    is pure elementwise traffic.
    """
    n = acc.shape[-1]
    j = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    x = acc
    # stage for shift amount 2^t, t = 0 .. log2(2N)-1; a shift by N or
    # more is  X^N == -1  times the shift-by-(s-N) — handled naturally
    # by the sign-flip mask of each static roll.
    shift = 1
    for t in range(params_log2_2n(n)):
        bit = ((amount >> t) & 1).astype(jnp.bool_)[:, None, None]
        if shift < n:
            rolled = jnp.roll(x, shift, axis=-1)
            rolled = jnp.where(j < shift, -rolled, rolled)
        else:  # shift == N: X^N * x == -x
            rolled = -x
        x = jnp.where(bit, rolled, x)
        shift *= 2
    return x


def params_log2_2n(n: int) -> int:
    return int(2 * n).bit_length() - 1


def _step_digits(acc: jnp.ndarray, bara_i: jnp.ndarray,
                 params: TFHEParams) -> jnp.ndarray:
    """Digits of (X^bara·acc - acc): int32 (B, rows, N)."""
    b = acc.shape[0]
    diff = negacyclic_rotate_batch(acc, bara_i) - acc      # (B, k+1, N)
    digits = gadget_decompose(diff, params.bg_bit, params.l)
    # (B, k+1, N, l) -> (B, k+1, l, N): row p = u*l + j matches BK layout
    digits = jnp.moveaxis(digits, -1, 2)
    return digits.reshape(b, params.trgsw_rows, params.N)


def _dot_digits_g(d8: jnp.ndarray, gv: jnp.ndarray) -> jnp.ndarray:
    """(B, rows, m) x (rows, kp1, m, j) -> (B, kp1, j), s8 x s8 -> s32."""
    return jax.lax.dot_general(
        d8, gv,
        dimension_numbers=(((1, 2), (0, 2)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _interpret() -> bool:
    """True when IEACHE_PALLAS=interpret: run the Pallas kernels in
    interpret mode (CPU emulation) — the virtual-mesh coverage hook
    for the step-mode matrix (VERDICT r4 #7).  Read at trace time;
    callers changing it mid-process must clear jit caches."""
    import os

    return os.environ.get("IEACHE_PALLAS") == "interpret"


def _use_pallas(params: TFHEParams) -> bool:
    """Pallas fused kernel on TPU unless IEACHE_PALLAS=0 (or =1 to
    force it elsewhere; =interpret for CPU-emulated kernels); requires
    the single-limb gadget and — on real hardware — a lane-tileable
    polynomial degree: with N < 128 (TEST_TINY) the kernels' static
    lane rolls act on Mosaic's padding lanes and silently corrupt the
    accumulator — measured on hardware as wrong expr answers at
    test_tiny while N=1024 is bit-exact.  Interpret mode does not tile
    and is exempt from the N constraint."""
    import os

    if params.digit_limbs != 1:
        return False
    if _interpret():
        return True
    if params.N % 128 != 0:
        return False
    mode = os.environ.get("IEACHE_PALLAS", "auto")
    if mode == "0":
        # KNOWN CRASH (CLAUDE.md, artifacts/PALLAS_PROBE_r02.json):
        # the pure-XLA fallback reproducibly kills the tunneled TPU
        # worker ("kernel fault") on wide-mul shapes (width_bench
        # mul128), and a wedged worker takes the service down for
        # minutes.  Refuse the footgun on TPU unless explicitly
        # forced; CPU/interpret runs are unaffected.
        if (jax.default_backend() == "tpu"
                and os.environ.get("IEACHE_FORCE", "0") != "1"):
            raise RuntimeError(
                "IEACHE_PALLAS=0 on TPU is known to crash the worker "
                "on wide-multiply shapes (see CLAUDE.md known issue; "
                "artifacts/PALLAS_PROBE_r02.json). Set IEACHE_FORCE=1 "
                "to run the XLA fallback on TPU anyway."
            )
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def external_product_step(
    acc: jnp.ndarray, bara_i: jnp.ndarray, bk_i: jnp.ndarray,
    params: TFHEParams,
) -> jnp.ndarray:
    """One CMux: acc + BK_i ⊡ (X^bara_i · acc - acc).  Exact mod 2^32."""
    if _use_pallas(params):
        from ieache_tpu.ops.pallas_kernels import external_product_pallas

        d8 = _step_digits(acc, bara_i, params).astype(jnp.int8)
        return acc + external_product_pallas(d8, bk_i, params,
                                             interpret=_interpret())
    d = _step_digits(acc, bara_i, params)                  # (B, rows, N)
    g = make_step_gmatrix(bk_i, params)                    # (L, rows, kp1, N, N)

    out = jnp.zeros_like(acc)
    if params.digit_limbs == 1:
        d8 = d.astype(jnp.int8)
        for v in range(TORUS_LIMBS):
            out = out + (_dot_digits_g(d8, g[v]) << (8 * v))
    else:
        dl = split_i8_limbs(d, params.digit_limbs)         # (B, rows, N, 2)
        for u in range(params.digit_limbs):
            for v in range(TORUS_LIMBS):
                sh = 8 * u + 8 * v
                if sh >= 32:
                    continue
                out = out + (_dot_digits_g(dl[..., u], g[v]) << sh)
    return acc + out


def external_product_step_sharded(
    acc: jnp.ndarray, bara_i: jnp.ndarray, bk_i_local: jnp.ndarray,
    params: TFHEParams, tp_axis: str,
) -> jnp.ndarray:
    """Tensor-parallel CMux step (runs inside shard_map).

    The TRGSW `rows` axis is sharded over `tp_axis`: each shard holds
    ``bk_i_local (rows/tp, k+1, N)``, builds only its G slice, contracts
    it against its digit slice, and the partial external products are
    combined with one ``psum`` over the ICI.  acc stays replicated
    across tp (it is dp-sharded over the batch).
    """
    rows_local = bk_i_local.shape[0]
    digits = _step_digits(acc, bara_i, params)             # (B, rows, N)
    start = jax.lax.axis_index(tp_axis) * rows_local
    d_local = jax.lax.dynamic_slice_in_dim(digits, start, rows_local, 1)
    g = make_step_gmatrix(bk_i_local, params)              # (L, r/tp, ...)

    out = jnp.zeros_like(acc)
    if params.digit_limbs == 1:
        d8 = d_local.astype(jnp.int8)
        for v in range(TORUS_LIMBS):
            out = out + (_dot_digits_g(d8, g[v]) << (8 * v))
    else:
        dl = split_i8_limbs(d_local, params.digit_limbs)
        for u in range(params.digit_limbs):
            for v in range(TORUS_LIMBS):
                sh = 8 * u + 8 * v
                if sh >= 32:
                    continue
                out = out + (_dot_digits_g(dl[..., u], g[v]) << sh)
    return acc + jax.lax.psum(out, tp_axis)


def blind_rotate_sharded(
    acc0: jnp.ndarray, bara: jnp.ndarray, bk_local: jnp.ndarray,
    params: TFHEParams, tp_axis: str, overlap_chunks: int = 2,
) -> jnp.ndarray:
    """Blind rotation with the BK rows axis sharded over `tp_axis`.

    ``overlap_chunks``: the tp psum sits on the CMux scan's serial
    critical path (psum_i -> decompose_{i+1} -> dots_{i+1} -> ...;
    it cannot be deferred across steps because gadget decomposition
    is nonlinear).  Splitting the per-shard batch into C independent
    sub-chunks breaks each step into C dependency chains, so chunk
    c+1's matmuls have no dependence on chunk c's psum and XLA's
    async collectives can run them concurrently (software pipelining
    over the batch, VERDICT r4 directive #5).  Bit-exact for any C:
    the math per lane is unchanged (tests/test_dist.py).  C=1
    restores the unpipelined r4 schedule.
    """
    b = acc0.shape[0]
    if overlap_chunks > 1 and b % overlap_chunks == 0 and \
            b >= 2 * overlap_chunks:
        nc = overlap_chunks

        def step(acc, xs):
            bk_i, bara_i = xs
            outs = [
                external_product_step_sharded(
                    acc[c * (b // nc):(c + 1) * (b // nc)],
                    bara_i[c * (b // nc):(c + 1) * (b // nc)],
                    bk_i, params, tp_axis,
                )
                for c in range(nc)
            ]
            return jnp.concatenate(outs, axis=0), None
    else:
        def step(acc, xs):
            bk_i, bara_i = xs
            return (
                external_product_step_sharded(acc, bara_i, bk_i, params,
                                              tp_axis),
                None,
            )

    acc, _ = jax.lax.scan(step, acc0, (bk_local, bara.T))
    return acc


def _blind_rotate_ntt(
    acc0: jnp.ndarray, bara: jnp.ndarray, bk: jnp.ndarray,
    params: TFHEParams,
) -> jnp.ndarray:
    """Blind rotation with the CRT-NTT external product
    (core/ntt.py) — the O(N log N)-per-lane small-batch path
    (IEACHE_PALLAS_STEP=ntt).

    The BK spectra are computed once per call and fed through the scan
    (500 x (P=2, limbs=4, rows, k+1, N) uint32 ~ 131 MB at lambda=110
    — amortized over the whole wave); each step forward-transforms
    only the digits, sums the rows-contraction in the spectral domain,
    and CRT-recombines four byte-limb convolutions exactly mod 2^32.
    Range: |sum over rows*N of d*s_v| <= rows * N * 128 * 128 — within
    the two-prime CRT range for rows <= 6 (both shipped gadgets).
    Bit-identical to the Toeplitz paths (tests/test_ntt.py)."""
    from ieache_tpu.core import ntt

    n = params.N
    # CRT dynamic-range guard (exactness invariant): every byte-limb
    # convolution must satisfy |sum over rows*N of d*s_v| < P/2 with
    # P = 12289*18433.  |d| <= 2^(bg_bit-1), |s_v| <= 128.
    bound = params.trgsw_rows * n * (1 << (params.bg_bit - 1)) * 128
    if bound >= (ntt.PRIMES[0] * ntt.PRIMES[1]) // 2:
        raise ValueError(
            f"CRT-NTT range exceeded: rows*N*2^(bg_bit-1)*128 = {bound}"
            f" >= P/2 = {(ntt.PRIMES[0] * ntt.PRIMES[1]) // 2}; the"
            " two-prime byte-limb path needs rows <= 6 at N=1024,"
            " bg_bit=8 — use the Toeplitz path for wider gadgets"
        )
    bkhat = ntt.ntt_forward_torus_limbs(bk, n)   # (P, 4, steps, r, kp1, N)
    bkhat = jnp.moveaxis(bkhat, 2, 0)            # (steps, P, 4, r, kp1, N)
    nprimes = len(ntt.PRIMES)

    def step(acc, xs):
        bkhat_i, bara_i = xs
        digits = _step_digits(acc, bara_i, params)   # (B, rows, N)
        dh = ntt.ntt_forward_digits(digits, n)       # (P, B, rows, N)
        out = jnp.zeros_like(acc)
        for v in range(4):
            res = []
            for pi in range(nprimes):
                prod = ntt.ntt_pointwise(
                    dh[pi][:, :, None, :],
                    bkhat_i[pi, v][None, :, :, :], pi, n,
                )                                    # (B, rows, kp1, N)
                acc_p = prod[:, 0]
                for r in range(1, prod.shape[1]):
                    acc_p = ntt._add_mod(acc_p, prod[:, r],
                                         ntt.PRIMES[pi])
                res.append(ntt.ntt_inverse(acc_p, pi, n))
            out = out + (ntt.crt_to_int32(res[0], res[1], n=n)
                         << (8 * v))
        return acc + out, None

    acc, _ = jax.lax.scan(step, acc0, (bkhat, bara.T))
    return acc


def blind_rotate(
    acc0: jnp.ndarray, bara: jnp.ndarray, bk: jnp.ndarray,
    params: TFHEParams,
) -> jnp.ndarray:
    """Full blind rotation over all n LWE coefficients.

    acc0: (B, k+1, N) int32 — rotated test-vector accumulator.
    bara: (B, n) int32 in [0, 2N) — mod-switched mask coefficients.
    bk:   (n, rows, k+1, N) int32 — bootstrapping key.

    On the Pallas path the scan carry lives in the transposed
    (k+1, B, N) layout: the rotation/diff/decompose and the external
    product are two fused VMEM kernels per step with no relayouts in
    between (the XLA barrel shifter costs ~11 HBM round trips per step
    otherwise), transposing only once at entry/exit.
    """
    import os as _os

    if _os.environ.get("IEACHE_PALLAS_STEP") == "ntt":
        if params.digit_limbs == 1:
            return _blind_rotate_ntt(acc0, bara, bk, params)
        # an EXPLICIT ntt request that cannot be honored must not
        # silently measure the default path (ADVICE r4, matching the
        # tr/overlap warn-on-downgrade rule)
        import warnings

        warnings.warn(
            f"IEACHE_PALLAS_STEP=ntt needs digit_limbs == 1 (got "
            f"{params.digit_limbs}); falling back to the default path",
            stacklevel=2,
        )

    if _use_pallas(params):
        from ieache_tpu.ops.pallas_kernels import (
            external_product_pallas_t,
            rot_diff_decompose_pallas,
        )

        # pad the batch to the 8-sublane tile (Mosaic blocks); pad
        # rows are all-zero LWE vectors (their CMux steps accumulate
        # only decomposition-rounding residue) and are sliced off at
        # exit
        b = acc0.shape[0]
        pad = (-b) % 8
        if pad:
            acc0 = jnp.concatenate(
                [acc0,
                 jnp.zeros((pad, *acc0.shape[1:]), acc0.dtype)], 0
            )
            bara = jnp.concatenate(
                [bara, jnp.zeros((pad, bara.shape[1]), bara.dtype)], 0
            )

        # IEACHE_PALLAS_STEP selects the step kernel:
        # * "overlap" (opt-in): ONE kernel per step
        #   whose grid runs batch-block-major — each program does this
        #   block's Toeplitz matmuls (MXU) plus 1/(kp1*rows) of the
        #   NEXT block's rotate+diff+decompose (VPU), so the two units
        #   get independent work to interleave.  Targets the measured
        #   0.257 ms/step vs ~0.17 ms pure-matmul floor (the rotation
        #   serializing with the MXU).  Needs >= (kp1*rows)*8 lanes
        #   per batch block.
        # * "fused2": whole CMux step as ONE kernel, rotation serial
        #   per block.  Measured on hardware (B=1024, λ=110 l2):
        #   bit-exact and performance-NEUTRAL vs split (125.3 vs
        #   125.2 ms/batch).
        # * "split": the two-kernel pipeline (rotation kernel + ext-
        #   product kernel); Mosaic pipelines the digit DMA between
        #   them.
        import os

        step_mode = os.environ.get("IEACHE_PALLAS_STEP", "auto")
        if step_mode == "auto":
            # "split" until the overlap kernel is proven on hardware:
            # its first on-device compile (r3) ran >20 min without
            # completing and wedged the tunneled TPU service — opt in
            # explicitly with IEACHE_PALLAS_STEP=overlap while that is
            # being characterized.
            step_mode = "split"
        if step_mode in ("overlap", "overlap2"):
            from ieache_tpu.ops.pallas_kernels import _pick_bb

            bb = _pick_bb(acc0.shape[0], 128)
            if bb % ((params.k + 1) * params.trgsw_rows * 8):
                # an EXPLICIT overlap request that cannot be honored
                # must not silently measure split (ADVICE r3)
                import warnings

                warnings.warn(
                    f"IEACHE_PALLAS_STEP={step_mode}: batch "
                    f"{acc0.shape[0]} has no sublane-aligned rotation "
                    "slicing; falling back to 'split'",
                    stacklevel=2,
                )
                step_mode = "split"
        if step_mode == "tr" and acc0.shape[0] % 128 \
                and not _interpret():
            # interpret mode is exempt: the %128 constraint is the
            # hardware lane tile of the (k+1, N, B) layout
            import warnings

            warnings.warn(
                f"IEACHE_PALLAS_STEP=tr needs batch % 128 == 0 (got "
                f"{acc0.shape[0]}); falling back to 'split'",
                stacklevel=2,
            )
            step_mode = "split"
        if step_mode == "scan" and acc0.shape[0] > 256:
            import warnings

            warnings.warn(
                f"IEACHE_PALLAS_STEP=scan caps the batch at 256 "
                f"(VMEM-resident accumulator; 512 AOT-OOMs scoped "
                f"vmem, artifacts/r5/step_scan_b512.json); got "
                f"{acc0.shape[0]} — falling back to 'split'",
                stacklevel=2,
            )
            step_mode = "split"
        if step_mode == "scan":
            # whole-rotation kernel: ONE pallas launch for all n CMux
            # steps, accumulator resident in VMEM scratch — the
            # small-batch latency mode (r5; kills the per-step launch
            # + acc-HBM overhead that pinned B=8 at 27 us/step,
            # LATENCY8_r04)
            from ieache_tpu.ops.pallas_kernels import (
                blind_rotate_scan_pallas,
            )

            acc_t = blind_rotate_scan_pallas(
                jnp.transpose(acc0, (1, 0, 2)), bara, bk, params,
                interpret=_interpret(),
            )
            out = jnp.transpose(acc_t, (1, 0, 2))
            return out[:b] if pad else out
        if step_mode == "tr":
            # fully-transposed (k+1, N, B) pipeline: batch on the lane
            # axis so every ext-product dot is B-wide (the >=2048-lane
            # geometry Mosaic runs at ~200+ TOPS) and the rotation
            # rolls sublanes (measured 32% cheaper per lane) —
            # artifacts/EXT_FLOOR_r04.json
            from ieache_tpu.ops.pallas_kernels import (
                external_product_pallas_tr,
                rot_diff_decompose_pallas_tr,
            )

            def step_t2(acc_t2, xs):
                bk_i, bara_i = xs
                d_t2 = rot_diff_decompose_pallas_tr(
                    acc_t2, bara_i, params, interpret=_interpret()
                )
                return external_product_pallas_tr(
                    d_t2, bk_i, params, acc_t2, interpret=_interpret()
                ), None

            acc_t20 = jnp.transpose(acc0, (1, 2, 0))
            acc_t2, _ = jax.lax.scan(step_t2, acc_t20, (bk, bara.T))
            out = jnp.transpose(acc_t2, (2, 0, 1))
            return out[:b] if pad else out
        if step_mode in ("overlap", "overlap2"):
            from ieache_tpu.ops.pallas_kernels import (
                cmux_step_overlap2_pallas,
                cmux_step_overlap_pallas,
            )

            kern = (cmux_step_overlap2_pallas if step_mode == "overlap2"
                    else cmux_step_overlap_pallas)

            def step_t(acc_t, xs):
                bk_i, bara_i = xs
                return kern(acc_t, bara_i, bk_i, params,
                            interpret=_interpret()), None
        elif step_mode == "fused2":
            from ieache_tpu.ops.pallas_kernels import cmux_step_pallas

            def step_t(acc_t, xs):
                bk_i, bara_i = xs
                return cmux_step_pallas(acc_t, bara_i, bk_i, params,
                                        interpret=_interpret()), None
        else:
            def step_t(acc_t, xs):
                bk_i, bara_i = xs
                d_t = rot_diff_decompose_pallas(
                    acc_t, bara_i, params, interpret=_interpret()
                )
                return external_product_pallas_t(
                    d_t, bk_i, params, acc_t=acc_t,
                    interpret=_interpret()
                ), None

        acc_t0 = jnp.transpose(acc0, (1, 0, 2))
        acc_t, _ = jax.lax.scan(step_t, acc_t0, (bk, bara.T))
        out = jnp.transpose(acc_t, (1, 0, 2))
        return out[:b] if pad else out

    def step(acc, xs):
        bk_i, bara_i = xs
        return external_product_step(acc, bara_i, bk_i, params), None

    acc, _ = jax.lax.scan(step, acc0, (bk, bara.T))
    return acc
