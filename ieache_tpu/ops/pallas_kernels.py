"""Pallas TPU kernels for the blind-rotation hot loop.

The XLA path (ops/blind_rotate.py) materializes the negacyclic
Toeplitz expansion of each TRGSW step in HBM (~100 MB of transient
per step).  This kernel builds each (p, o) Toeplitz tile **in VMEM**
(log2(N) on-chip rolls of the extended poly) and feeds it straight
into the MXU, so HBM only ever sees the 48 KB BK step and the digit
matrix.

Grid: (k+1, rows) with `rows` minor — the output block (B, 1, N) for
a given `o` stays resident across the consecutive `p` programs, which
makes the cross-row accumulation valid (zero-init at p == 0).

Only the single-digit-limb gadget (bg_bit <= 8, the default) runs
here; the two-limb compat gadget falls back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ieache_tpu.core.poly import TORUS_LIMBS
from ieache_tpu.params import TFHEParams


#: bias making byte_v(x + BIAS) - 128 the v-th *balanced* base-256
#: limb of x (the serial peel's digits, extracted in parallel):
#: 0x80808080 as a wrapped int32.
_LIMB_BIAS = -0x7F7F7F80


def _pick_bb(b: int, cap: int) -> int:
    """Largest batch block <= cap that divides ``b`` AND is a multiple
    of 8 (the Mosaic sublane tile).

    The r2/r3 halving loop assumed power-of-two batches; the windowed
    CSA multiplier (r4) produces b*(W+1) lanes (e.g. 1056 = 8*132)
    where halving lands on a non-multiple-of-8 divisor and Mosaic
    rejects the block shape.  Device callers pad the batch to a
    multiple of 8 (blind_rotate), so bb=8 always qualifies there; for
    interpret-mode batches < 8 the legacy halving fallback applies
    (Mosaic tiling is not enforced in interpret mode).
    """
    if b % 8:
        bb = b
        while bb > cap or (b % bb):
            bb //= 2
        return bb
    best = 8
    for bb in range(8, min(cap, b) + 1, 8):
        if b % bb == 0:
            best = bb
    return best


def _ext_product_kernel(*refs, n: int, chunk: int, fuse_acc: bool,
                        impl: str = "arith", fold: int = 4):
    """One (o, p) tile: out[o] += digits_p ⊛ bk[p, o].

    The int32 Toeplitz rows are built ONCE per program in VMEM (doubling
    static rolls — Mosaic only rotates 32-bit data); chunk c's matmul
    tile is then the 256-aligned sliding column window
    ``scratch[:, n - c*chunk : 2n - c*chunk]`` of the SAME rows (row i
    = roll(e, i), so column n - c*chunk + j holds e[n + j - c*chunk - i]
    — exactly Toeplitz row c*chunk + i), which deletes the r2/r3
    per-chunk advance rolls (~6 MB of VMEM roll traffic per program).

    ``impl`` selects how the four int8 limb planes are produced:

    * ``"arith"``: per-(chunk, limb) shift/mask/sub extraction from the
      +0x80808080-biased rows — ~17M VPU element-ops per program at
      chunk=256, which r3 profiling identified as the dominant non-MXU
      cost (the kernel measured ~44% of the int8-MXU floor with the
      VPU work serializing against the matmuls).
    * ``"plane"``: the scratch additionally carries a per-byte XOR with
      0x80 (``(x + 0x80808080) ^ 0x80808080``): the sign-extended
      byte_v of the result is then exactly the *balanced* limb_v, so
      each limb plane is extracted ONCE per program into an int8
      plane scratch with two shifts (``(x << 24-8v) >> 24``) + a
      narrowing cast — ~6M VPU ops instead of ~17M — and every chunk's
      tile is a plane-scratch column window (no per-chunk extraction
      at all).  (A stride-4 sublane slice of ``pltpu.bitcast(x, int8)``
      would be free, but Mosaic rejects strided slices on device —
      'extract_strided_slice strides confined to [1, 2)', r4 probe.)

    ``fold`` = limbs combined per ``out_ref`` read-modify-write
    (4 = one RMW per limb as r2/r3 shipped; 1 = all four limb parts of
    a chunk tree-summed into one RMW).  r3 measured a persistent
    whole-program accumulator value as perf-neutral *and* a VMEM OOM
    at the multiplier's (B=8192, bb=1024) shapes; per-chunk folding
    keeps at most one transient (bb, N) partial alive.

    With ``fuse_acc`` the output block is seeded from the accumulator
    instead of zeros, so the scan's ``acc + out`` add (3 HBM passes
    over 8 MB at B=1024) disappears into the kernel.
    """
    refs = list(refs)
    d_ref, bk_ref = refs.pop(0), refs.pop(0)
    acc_ref = refs.pop(0) if fuse_acc else None
    out_ref = refs.pop(0)
    tscratch = refs.pop(0) if impl != "probe_noextract" else None
    pscratch = refs.pop(0) if impl.startswith(("plane", "probe")) else None
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        if fuse_acc:
            out_ref[...] = acc_ref[...]
        else:
            out_ref[...] = jnp.zeros_like(out_ref)

    g = bk_ref[0, 0, :, :]                       # (1, N) int32
    e = jnp.concatenate([-g, g], axis=1) + jnp.int32(_LIMB_BIAS)
    if impl == "plane":
        e = e ^ jnp.int32(_LIMB_BIAS)            # flip each byte's top bit
    d = d_ref[0]                                 # (B, N) int8

    if impl != "probe_noextract":
        # row i = roll(e, i), by doubling (once per program)
        tscratch[0:1, :] = e
        size = 1
        while size < chunk:
            tscratch[size:2 * size, :] = pltpu.roll(
                tscratch[0:size, :], size, axis=1
            )
            size *= 2

    if impl in ("plane", "probe_nodot"):
        xs = tscratch[:, :]
        for v in range(TORUS_LIMBS):
            sx = (xs << (24 - 8 * v)) >> 24      # sign-extended byte_v
            pscratch[v] = sx.astype(jnp.int8)

    if impl == "probe_nodot":
        # perf probe: build + extract only; a token broadcast add of
        # one extracted row keeps the data dependency alive (output is
        # NOT the external product)
        out_ref[0] += pscratch[0, 0:1, n:2 * n].astype(jnp.int32)
        return

    for c in range(n // chunk):
        dc = d[:, c * chunk:(c + 1) * chunk]     # (B, chunk) int8
        lo = n - c * chunk                       # sliding tile window
        parts = []
        for v in range(TORUS_LIMBS):
            if impl in ("plane", "probe_noextract"):
                # probe_noextract: pscratch is UNINITIALIZED garbage —
                # dots + recombination timing without build/extract
                s = pscratch[v, :, lo:lo + n]
            else:
                x = tscratch[:, lo:lo + n]       # (chunk, N), biased
                s = (((x >> (8 * v)) & 0xFF) - 128).astype(jnp.int8)
            part = jax.lax.dot_general(
                dc, s,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            parts.append(part << (8 * v) if v else part)
            if len(parts) == fold:
                acc = parts[0]
                if len(parts) == 4:              # balanced tree-sum
                    acc = (parts[0] + parts[1]) + (parts[2] + parts[3])
                else:
                    for pt in parts[1:]:
                        acc = acc + pt
                out_ref[0] += acc
                parts = []


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def external_product_pallas(
    digits_i8: jnp.ndarray, bk_i: jnp.ndarray, params: TFHEParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """digits (B, rows, N) int8 x bk_i (rows, k+1, N) int32
    -> (B, k+1, N) int32 external product (exact mod 2^32)."""
    out = external_product_pallas_t(
        jnp.transpose(digits_i8, (1, 0, 2)), bk_i, params,
        interpret=interpret,
    )
    return jnp.transpose(out, (1, 0, 2))          # (B, kp1, N)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def external_product_pallas_t(
    d_t: jnp.ndarray, bk_i: jnp.ndarray, params: TFHEParams,
    acc_t: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transposed-layout external product: d_t (rows, B, N) int8 x
    bk_i (rows, k+1, N) int32 -> (k+1, B, N) int32, exact mod 2^32.

    The (poly, batch, N) layout keeps blocked axes leading (Mosaic
    wants the last two block dims full/divisible) and lets the blind-
    rotation scan run transpose-free when paired with
    :func:`rot_diff_decompose_pallas`.

    With ``acc_t`` (k+1, B, N) the kernel returns ``acc_t + product``
    directly (output block seeded from acc), fusing the CMux
    accumulator update.
    """
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    b = d_t.shape[1]
    n, rows, kp1 = params.N, params.trgsw_rows, params.k + 1

    bk_t = bk_i[:, :, None, :]                    # (rows, kp1, 1, N)
    fuse_acc = acc_t is not None

    # IEACHE_EXT_CHUNK (trace-time, like IEACHE_PALLAS): Toeplitz rows
    # built per VMEM block; larger chunks mean fewer fold/RMW rounds
    # but a bigger (chunk, 2N) int32 (+ int8 plane) scratch.
    # IEACHE_EXT_IMPL: "plane" (default; once-per-program limb plane
    # extraction — measured r4) or "arith" (r2/r3 per-chunk shift-mask
    # extraction).  IEACHE_EXT_FOLD: limb parts per out_ref RMW (1 =
    # per-chunk tree-sum, default; 4 = legacy per-limb).
    import os

    # default chunk: 256 for throughput batches; small batches are
    # bound by the batch-INDEPENDENT Toeplitz build+extract (~13 us/
    # step at chunk=256, r4 probe_nodot), whose cost is proportional
    # to chunk (the sliding-window tiles reuse one (chunk, 2N) build),
    # so latency-shaped batches drop to chunk=64
    default_chunk = 256 if b >= 128 else 64
    chunk = min(int(os.environ.get("IEACHE_EXT_CHUNK", default_chunk)),
                n)
    impl = os.environ.get("IEACHE_EXT_IMPL", "plane")
    fold = int(os.environ.get("IEACHE_EXT_FOLD", 1))
    if fold not in (1, 2, 4):
        raise ValueError("IEACHE_EXT_FOLD must be 1, 2 or 4")
    # batch block: bb=1024 at the bootstrap's proven B<=1024 shapes;
    # cap at 512 beyond that — with multiple bbi grid steps Mosaic
    # double-buffers the (1, bb, N) d/acc/out windows, and bb=1024
    # blocks then exceed the 16M scoped-vmem limit (A*B*C's second
    # multiply at 16384 internal lanes OOM'd at 20.0M, r3)
    bb_cap = 1024 if b <= 1024 else 512
    bb = _pick_bb(b, bb_cap)
    in_specs = [
        pl.BlockSpec(
            (1, bb, n), lambda o, bbi, p: (p, bbi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, n), lambda o, bbi, p: (p, o, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [d_t, bk_t]
    if fuse_acc:
        in_specs.append(pl.BlockSpec(
            (1, bb, n), lambda o, bbi, p: (o, bbi, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(acc_t)
    out = pl.pallas_call(
        functools.partial(_ext_product_kernel, n=n, chunk=chunk,
                          fuse_acc=fuse_acc, impl=impl, fold=fold),
        grid=(kp1, b // bb, rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bb, n), lambda o, bbi, p: (o, bbi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kp1, b, n), jnp.int32),
        scratch_shapes=(
            ([pltpu.VMEM((chunk, 2 * n), jnp.int32)]
             if impl != "probe_noextract" else [])
            + ([pltpu.VMEM((TORUS_LIMBS, chunk, 2 * n), jnp.int8)]
               if impl.startswith(("plane", "probe")) else [])
        ),
        interpret=interpret,
    )(*args)
    return out                                    # (kp1, B, N)


def _cmux_step_kernel(acc_ref, bara_ref, bk_ref, out_ref,
                      dscratch, tscratch, *, n: int, chunk: int,
                      log2_2n: int, bg_bit: int, l: int, offset: int,
                      kp1: int):
    """ONE fused CMux step for one batch block.

    Grid (bblocks, kp1, rows), (kp1, rows) minor: the rotation + diff
    + gadget decompose runs once per batch block (at o==0, p==0) into
    a PERSISTENT digits scratch, and every (o, p) program does the
    Toeplitz matmuls of `_ext_product_kernel` against its digit row —
    digits never touch HBM and the accumulator block is fetched once
    per batch block instead of once per kernel.

    acc_ref:  (kp1, bb, N) int32 — full transposed accumulator block
    bara_ref: (bb, 1) int32
    bk_ref:   (1, 1, 1, N) int32 — this (p, o) BK polynomial
    out_ref:  (1, bb, N) int32 — new accumulator slice for `o`
    dscratch: (rows, bb, N) int8 persistent digits
    tscratch: (chunk, 2N) int32 Toeplitz build space
    """
    o = pl.program_id(1)
    p = pl.program_id(2)

    @pl.when(jnp.logical_and(o == 0, p == 0))
    def _():
        x0 = acc_ref[...]
        amt = bara_ref[...]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        x = x0
        shift = 1
        for t in range(log2_2n):
            bit = ((amt >> t) & 1)[None, :, :]
            if shift < n:
                rolled = pltpu.roll(x, shift, axis=2)
                rolled = jnp.where(j < shift, -rolled, rolled)
            else:                                  # X^N == -1
                rolled = -x
            x = jnp.where(bit != 0, rolled, x)
            shift *= 2
        v = (x - x0) + jnp.int32(offset)
        half = 1 << (bg_bit - 1)
        mask = (1 << bg_bit) - 1
        for u in range(kp1):
            vu = v[u]
            for jl in range(l):
                sh = 32 - (jl + 1) * bg_bit
                d = ((vu >> sh) & mask) - half
                dscratch[u * l + jl] = d.astype(jnp.int8)

    @pl.when(p == 0)
    def _():
        out_ref[...] = acc_ref[pl.ds(o, 1)]        # seed: acc + ...

    g = bk_ref[0, 0, :, :]                         # (1, N) int32
    e = jnp.concatenate([-g, g], axis=1) + jnp.int32(_LIMB_BIAS)
    d = dscratch[pl.ds(p, 1)][0]                   # (bb, N) int8

    tscratch[0:1, :] = e
    size = 1
    while size < chunk:
        tscratch[size:2 * size, :] = pltpu.roll(
            tscratch[0:size, :], size, axis=1
        )
        size *= 2

    for c in range(n // chunk):
        if c > 0:
            tscratch[:, :] = pltpu.roll(tscratch[:, :], chunk, axis=1)
        x = tscratch[:, n:]                        # (chunk, N), biased
        dc = d[:, c * chunk:(c + 1) * chunk]       # (bb, chunk) int8
        for v in range(TORUS_LIMBS):
            s = ((x >> (8 * v)) & 0xFF) - 128
            part = jax.lax.dot_general(
                dc, s.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out_ref[0] += part << (8 * v)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def cmux_step_pallas(acc_t: jnp.ndarray, bara_i: jnp.ndarray,
                     bk_i: jnp.ndarray, params: TFHEParams,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused CMux step: acc + BK ⊡ (X^bara·acc − acc) as ONE kernel.

    acc_t (k+1, B, N) int32, bara_i (B,), bk_i (rows, k+1, N) int32
    -> new acc_t.  Bit-identical to rot_diff_decompose_pallas +
    external_product_pallas_t(acc_t=...) (tests/test_pallas_kernels);
    selected by IEACHE_PALLAS_STEP=fused2 in blind_rotate.
    """
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    from ieache_tpu.ops.decompose import _offset

    kp1, b, n = acc_t.shape
    rows = params.trgsw_rows
    if b % 8:
        raise ValueError(f"batch {b} must be a multiple of 8")

    off = _offset(params.bg_bit, params.l)
    if off >= 2**31:
        off -= 2**32

    chunk = min(256, n)
    bb = _pick_bb(b, 256)

    return pl.pallas_call(
        functools.partial(
            _cmux_step_kernel, n=n, chunk=chunk,
            log2_2n=params.log2_2N, bg_bit=params.bg_bit,
            l=params.l, offset=off, kp1=kp1,
        ),
        grid=(b // bb, kp1, rows),
        in_specs=[
            pl.BlockSpec((kp1, bb, n), lambda bi, o, p: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda bi, o, p: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda bi, o, p: (p, o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, n), lambda bi, o, p: (o, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp1, b, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows, bb, n), jnp.int8),
            pltpu.VMEM((chunk, 2 * n), jnp.int32),
        ],
        interpret=interpret,
    )(acc_t, bara_i[:, None], bk_i[:, :, None, :])


def _blind_rotate_scan_kernel(acc0_ref, bara_ref, bk_ref, out_ref,
                              ascratch, dscratch, tscratch, *, n: int,
                              chunk: int, log2_2n: int, bg_bit: int,
                              l: int, offset: int, kp1: int,
                              steps: int, rows: int):
    """The ENTIRE blind rotation as one kernel: grid (steps, kp1,
    rows) with steps MAJOR, the accumulator persistent in VMEM scratch
    across all grid iterations.

    The r4 small-batch floor decomposition (LATENCY8_r04) showed the
    B=8 per-step cost pinned at ~27 us by per-step fixed overheads —
    two pallas launches + the acc HBM round-trip per scan iteration —
    not by compute (chunk=64 vs 256 moved it only 13%).  Here the scan
    disappears: one launch per 500 steps, acc never touches HBM, and
    per-step HBM traffic is the 32 KB BK step (streamed + Mosaic
    double-buffered via the grid index_map).  VMEM budget caps the
    batch at ~512 lanes (acc + digits + Toeplitz scratch); bigger
    batches keep the split pipeline (throughput mode, where the scan
    overhead is invisible).

    Program (s, o, p):
    * (o==0, p==0): CMux rotation + diff + gadget decompose of the
      RESIDENT accumulator (step s-1's result) into dscratch;
    * every program: the (o, p) Toeplitz matmuls accumulated into
      ascratch[o] (read-modify-write on scratch);
    * (s==steps-1): flush ascratch to the output block.

    Sequential grid iteration is the step dependency: Mosaic runs the
    grid as a loop on one core, so step s's rotation reads the fully
    accumulated step s-1 state.
    """
    s = pl.program_id(0)
    o = pl.program_id(1)
    p = pl.program_id(2)

    @pl.when(jnp.logical_and(s == 0,
                             jnp.logical_and(o == 0, p == 0)))
    def _():
        ascratch[...] = acc0_ref[...]

    @pl.when(jnp.logical_and(o == 0, p == 0))
    def _():
        def write(row, d):
            dscratch[row] = d

        _rotate_decompose_into(
            ascratch[...], bara_ref[0].T, write,
            n=n, log2_2n=log2_2n, bg_bit=bg_bit, l=l, offset=offset,
            kp1=kp1,
        )

    g = bk_ref[0, 0, 0, 0, :][None, :]             # (1, N) int32
    e = jnp.concatenate([-g, g], axis=1) + jnp.int32(_LIMB_BIAS)
    d = dscratch[pl.ds(p, 1)][0]                   # (bb, N) int8

    tscratch[0:1, :] = e
    size = 1
    while size < chunk:
        tscratch[size:2 * size, :] = pltpu.roll(
            tscratch[0:size, :], size, axis=1
        )
        size *= 2

    for c in range(n // chunk):
        if c > 0:
            tscratch[:, :] = pltpu.roll(tscratch[:, :], chunk, axis=1)
        x = tscratch[:, n:]                        # (chunk, N), biased
        dc = d[:, c * chunk:(c + 1) * chunk]       # (bb, chunk) int8
        for v in range(TORUS_LIMBS):
            sx = ((x >> (8 * v)) & 0xFF) - 128
            part = jax.lax.dot_general(
                dc, sx.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            ascratch[pl.ds(o, 1), :, :] += (part << (8 * v))[None]

    @pl.when(jnp.logical_and(s == steps - 1, p == rows - 1))
    def _():
        out_ref[...] = ascratch[pl.ds(o, 1)]


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def blind_rotate_scan_pallas(acc_t: jnp.ndarray, bara: jnp.ndarray,
                             bk: jnp.ndarray, params: TFHEParams,
                             interpret: bool = False) -> jnp.ndarray:
    """Whole-rotation kernel: acc_t (k+1, B, N) int32, bara (B, n)
    int32, bk (n, rows, k+1, N) int32 -> final acc_t, exact mod 2^32.

    One pallas_call for all n CMux steps (IEACHE_PALLAS_STEP=scan);
    bit-identical to the per-step pipelines (tests/test_pallas_kernels,
    tools/pallas_probe.py)."""
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    import os

    from ieache_tpu.ops.decompose import _offset

    kp1, b, n = acc_t.shape
    rows = params.trgsw_rows
    steps = bara.shape[1]
    if b % 8:
        raise ValueError(f"batch {b} must be a multiple of 8")
    if b > 256:
        # B=512 AOT-OOMs scoped vmem at 19.66M > 16M (the resident
        # (kp1, B, N) acc + digits + Toeplitz scratch; r5 hw log
        # artifacts/r5/step_scan_b512.json) — 256 compiles and runs
        raise ValueError(
            f"scan kernel caps the batch at 256 (VMEM-resident acc); "
            f"got {b} — use the split pipeline"
        )

    off = _offset(params.bg_bit, params.l)
    if off >= 2**31:
        off -= 2**32

    chunk = min(int(os.environ.get(
        "IEACHE_EXT_CHUNK", 256 if b >= 128 else 64)), n)

    return pl.pallas_call(
        functools.partial(
            _blind_rotate_scan_kernel, n=n, chunk=chunk,
            log2_2n=params.log2_2N, bg_bit=params.bg_bit,
            l=params.l, offset=off, kp1=kp1, steps=steps, rows=rows,
        ),
        grid=(steps, kp1, rows),
        in_specs=[
            pl.BlockSpec((kp1, b, n), lambda s, o, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # trailing singleton axes keep the last two block dims
            # equal to the array dims (the Mosaic (8, 128) block rule
            # — hardware-enforced only, CLAUDE.md)
            pl.BlockSpec((1, 1, b), lambda s, o, p: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, n),
                         lambda s, o, p: (s, p, o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, n), lambda s, o, p: (o, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp1, b, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((kp1, b, n), jnp.int32),
            pltpu.VMEM((rows, b, n), jnp.int8),
            pltpu.VMEM((chunk, 2 * n), jnp.int32),
        ],
        interpret=interpret,
    )(acc_t, bara.T[:, None, :], bk[:, :, :, None, :])


def _rotate_decompose_into(x0, amt, write, *, n: int, log2_2n: int,
                           bg_bit: int, l: int, offset: int, kp1: int):
    """Barrel-shift rotate + diff + gadget-decompose a (kp1, m, N)
    int32 block; ``write(row, digits_i8)`` stores each (m, N) digit
    row (row = u*l + jl, the BK layout)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    x = x0
    shift = 1
    for t in range(log2_2n):
        bit = ((amt >> t) & 1)[None, :, :]
        if shift < n:
            rolled = pltpu.roll(x, shift, axis=2)
            rolled = jnp.where(j < shift, -rolled, rolled)
        else:                                      # X^N == -1
            rolled = -x
        x = jnp.where(bit != 0, rolled, x)
        shift *= 2
    v = (x - x0) + jnp.int32(offset)
    half = 1 << (bg_bit - 1)
    mask = (1 << bg_bit) - 1
    for u in range(kp1):
        vu = v[u]
        for jl in range(l):
            sh = 32 - (jl + 1) * bg_bit
            d = ((vu >> sh) & mask) - half
            write(u * l + jl, d.astype(jnp.int8))


def _cmux_overlap_kernel(acc_ref, acc_next_ref, bara_ref, bara_next_ref,
                         bk_ref, out_ref, dscratch, tscratch, *, n: int,
                         chunk: int, log2_2n: int, bg_bit: int, l: int,
                         offset: int, kp1: int, rows: int, nb: int,
                         rows_per: int):
    """CMux step with the NEXT batch block's rotation hidden under this
    block's matmuls (VERDICT r2 weak #3: the measured 0.257 ms/step vs
    ~0.17 ms pure-matmul floor is the rotation's VPU work serializing
    with the MXU).

    Grid (nb, kp1, rows), batch-block-major.  Program (bi, o, p):

    * MXU: the (o, p) Toeplitz matmuls for block ``bi`` against digits
      read from ``dscratch[bi % 2]``;
    * VPU: slice ``o*rows + p`` (1/(kp1*rows)-th of the batch rows) of
      block ``bi+1``'s rotate+diff+decompose, written to
      ``dscratch[(bi+1) % 2]``.

    The two are data-independent, giving Mosaic's scheduler VPU and
    MXU work to interleave inside one instruction stream.  Block 0's
    digits are a serial prologue at program (0, 0, 0) — the only
    rotation not hidden; its share falls as 1/nb.
    """
    bi = pl.program_id(0)
    o = pl.program_id(1)
    p = pl.program_id(2)
    par = bi % 2
    nxt = (bi + 1) % 2

    @pl.when(jnp.logical_and(bi == 0,
                             jnp.logical_and(o == 0, p == 0)))
    def _():                                       # prologue: block 0
        def write(row, d):
            dscratch[0, row] = d

        _rotate_decompose_into(
            acc_ref[...], bara_ref[...], write,
            n=n, log2_2n=log2_2n, bg_bit=bg_bit, l=l, offset=offset,
            kp1=kp1,
        )

    @pl.when(p == 0)
    def _():
        out_ref[...] = acc_ref[pl.ds(o, 1)]        # seed: acc + ...

    # ---- VPU stream: 1/(kp1*rows) of block bi+1's rotation ----
    @pl.when(bi < nb - 1)
    def _():
        s = (o * rows + p) * rows_per
        xs = acc_next_ref[:, pl.ds(s, rows_per), :]
        amt = bara_next_ref[pl.ds(s, rows_per), :]

        def write(row, d):
            dscratch[pl.ds(nxt, 1), row, pl.ds(s, rows_per), :] = (
                d[None]
            )

        _rotate_decompose_into(
            xs, amt, write,
            n=n, log2_2n=log2_2n, bg_bit=bg_bit, l=l, offset=offset,
            kp1=kp1,
        )

    # ---- MXU stream: Toeplitz matmuls for block bi ----
    g = bk_ref[0, 0, :, :]                         # (1, N) int32
    e = jnp.concatenate([-g, g], axis=1) + jnp.int32(_LIMB_BIAS)
    d = dscratch[pl.ds(par, 1), pl.ds(p, 1)][0, 0]  # (bb, N) int8

    tscratch[0:1, :] = e
    size = 1
    while size < chunk:
        tscratch[size:2 * size, :] = pltpu.roll(
            tscratch[0:size, :], size, axis=1
        )
        size *= 2

    for c in range(n // chunk):
        if c > 0:
            tscratch[:, :] = pltpu.roll(tscratch[:, :], chunk, axis=1)
        x = tscratch[:, n:]                        # (chunk, N), biased
        dc = d[:, c * chunk:(c + 1) * chunk]       # (bb, chunk) int8
        for v in range(TORUS_LIMBS):
            s8 = ((x >> (8 * v)) & 0xFF) - 128
            part = jax.lax.dot_general(
                dc, s8.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out_ref[0] += part << (8 * v)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def cmux_step_overlap_pallas(acc_t: jnp.ndarray, bara_i: jnp.ndarray,
                             bk_i: jnp.ndarray, params: TFHEParams,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused CMux step with cross-batch-block VPU/MXU overlap.

    acc_t (k+1, B, N) int32, bara_i (B,), bk_i (rows, k+1, N) int32
    -> new acc_t.  Bit-identical to cmux_step_pallas (the overlap only
    reorders independent work); selected by IEACHE_PALLAS_STEP=overlap
    in blind_rotate.  Requires the batch to split into >= 1 blocks
    whose rotation slices stay sublane-aligned:
    (bb / (kp1*rows)) % 8 == 0.
    """
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    from ieache_tpu.ops.decompose import _offset

    kp1, b, n = acc_t.shape
    rows = params.trgsw_rows
    if b % 8:
        raise ValueError(f"batch {b} must be a multiple of 8")

    off = _offset(params.bg_bit, params.l)
    if off >= 2**31:
        off -= 2**32

    # bb=128 (not 256): this kernel holds TWO acc blocks + the digit
    # double-buffer + Toeplitz scratch in VMEM, and Mosaic double-
    # buffers the input blocks across grid programs — bb=256 was
    # measured 17.02M > the 16M scoped-vmem limit on v5e.  Smaller
    # blocks also shrink the serial block-0 prologue share (1/nb).
    chunk = min(128, n)
    nslices = kp1 * rows
    bb = _pick_bb(b, 128)
    nb = b // bb
    rows_per = bb // nslices
    if rows_per % 8 or rows_per * nslices != bb:
        raise ValueError(
            f"batch block {bb} not splittable into {nslices} "
            "sublane-aligned rotation slices — use the split/fused2 "
            "path"
        )

    return pl.pallas_call(
        functools.partial(
            _cmux_overlap_kernel, n=n, chunk=chunk,
            log2_2n=params.log2_2N, bg_bit=params.bg_bit,
            l=params.l, offset=off, kp1=kp1, rows=rows, nb=nb,
            rows_per=rows_per,
        ),
        grid=(nb, kp1, rows),
        in_specs=[
            pl.BlockSpec((kp1, bb, n), lambda bi, o, p: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (kp1, bb, n),
                lambda bi, o, p: (0, jnp.minimum(bi + 1, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bb, 1), lambda bi, o, p: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bb, 1),
                lambda bi, o, p: (jnp.minimum(bi + 1, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1, n), lambda bi, o, p: (p, o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, n), lambda bi, o, p: (o, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp1, b, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, bb, n), jnp.int8),
            pltpu.VMEM((chunk, 2 * n), jnp.int32),
        ],
        interpret=interpret,
    )(acc_t, acc_t, bara_i[:, None], bara_i[:, None],
      bk_i[:, :, None, :])


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def cmux_step_overlap2_pallas(acc_t: jnp.ndarray, bara_i: jnp.ndarray,
                              bk_i: jnp.ndarray, params: TFHEParams,
                              interpret: bool = False) -> jnp.ndarray:
    """Overlap CMux step, compile-friendly operand layout.

    Same kernel body as :func:`cmux_step_overlap_pallas`, but the
    "next block" operands are XLA-side shifted copies of acc/bara
    (one ~20 us HBM copy per step at B=1024) instead of a second view
    of the SAME buffer with ``min(bi+1, nb-1)`` index maps — the
    duplicated-operand + non-monotonic-window combination is the prime
    suspect for the pathological 10-min-per-signature XLA compile of
    the v1 kernel under ``lax.scan`` (single calls compile in ~27 s).
    Bit-identical to cmux_step_pallas.
    """
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    from ieache_tpu.ops.decompose import _offset

    kp1, b, n = acc_t.shape
    rows = params.trgsw_rows
    if b % 8:
        raise ValueError(f"batch {b} must be a multiple of 8")

    off = _offset(params.bg_bit, params.l)
    if off >= 2**31:
        off -= 2**32

    chunk = min(128, n)
    nslices = kp1 * rows
    bb = _pick_bb(b, 128)
    nb = b // bb
    rows_per = bb // nslices
    if rows_per % 8 or rows_per * nslices != bb:
        raise ValueError(
            f"batch block {bb} not splittable into {nslices} "
            "sublane-aligned rotation slices — use the split/fused2 "
            "path"
        )

    # block-shifted copies: window bi of *_next is window bi+1 of the
    # original (wrap-around content at bi == nb-1 is never consumed —
    # the kernel's VPU stream is gated on bi < nb-1)
    acc_next = jnp.concatenate(
        [acc_t[:, bb:, :], acc_t[:, :bb, :]], axis=1
    )
    bara_col = bara_i[:, None]
    bara_next = jnp.concatenate([bara_col[bb:], bara_col[:bb]], axis=0)

    return pl.pallas_call(
        functools.partial(
            _cmux_overlap_kernel, n=n, chunk=chunk,
            log2_2n=params.log2_2N, bg_bit=params.bg_bit,
            l=params.l, offset=off, kp1=kp1, rows=rows, nb=nb,
            rows_per=rows_per,
        ),
        grid=(nb, kp1, rows),
        in_specs=[
            pl.BlockSpec((kp1, bb, n), lambda bi, o, p: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp1, bb, n), lambda bi, o, p: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda bi, o, p: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda bi, o, p: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda bi, o, p: (p, o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, n), lambda bi, o, p: (o, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp1, b, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, bb, n), jnp.int8),
            pltpu.VMEM((chunk, 2 * n), jnp.int32),
        ],
        interpret=interpret,
    )(acc_t, acc_next, bara_col, bara_next, bk_i[:, :, None, :])


def _rot_diff_decompose_kernel(acc_ref, bara_ref, out_ref, *, n: int,
                               log2_2n: int, bg_bit: int, l: int,
                               offset: int, kp1: int):
    """Fused X^bara rotation + diff + gadget decompose, all in VMEM.

    acc_ref:  (kp1, bb, N) int32 — transposed accumulator block
    bara_ref: (bb, 1) int32 in [0, 2N)
    out_ref:  (rows, bb, N) int8 — digits, row p = u*l + j (the BK
              layout consumed by the external-product kernel)

    Replaces the XLA barrel shifter whose 11 roll stages each cost an
    HBM round trip over the 8 MB accumulator (~0.3 ms/step measured at
    B=1024 — the whole bootstrap step budget); here the stages are VPU
    selects over a VMEM-resident block.
    """
    x0 = acc_ref[...]
    amt = bara_ref[...]                            # (bb, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    x = x0
    shift = 1
    for t in range(log2_2n):
        bit = ((amt >> t) & 1)[None, :, :]         # (1, bb, 1)
        if shift < n:
            rolled = pltpu.roll(x, shift, axis=2)
            rolled = jnp.where(j < shift, -rolled, rolled)
        else:                                      # X^N == -1
            rolled = -x
        x = jnp.where(bit != 0, rolled, x)
        shift *= 2

    v = (x - x0) + jnp.int32(offset)               # wrapping int32
    half = 1 << (bg_bit - 1)
    mask = (1 << bg_bit) - 1
    for u in range(kp1):
        vu = v[u]
        for jl in range(l):
            sh = 32 - (jl + 1) * bg_bit
            d = ((vu >> sh) & mask) - half
            out_ref[u * l + jl] = d.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def rot_diff_decompose_pallas(
    acc_t: jnp.ndarray, bara_i: jnp.ndarray, params: TFHEParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """acc_t (k+1, B, N) int32, bara_i (B,) int32 -> digits of
    (X^bara·acc - acc): (rows, B, N) int8.

    Bit-identical to ``blind_rotate.negacyclic_rotate_batch`` +
    ``gadget_decompose`` (tests/test_pallas_kernels.py)."""
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    from ieache_tpu.ops.decompose import _offset

    kp1, b, n = acc_t.shape
    rows = params.trgsw_rows

    off = _offset(params.bg_bit, params.l)
    if off >= 2**31:                       # as a wrapped int32 constant
        off -= 2**32

    if b % 8:
        # sublane misalignment must fail LOUDLY: the old max(bb, 8)
        # clamp made grid=(b//8,)==(0,) for b<8 — the kernel never ran
        # and the output was uninitialized garbage (caught on hardware
        # as systematically wrong mul128 products at B=4; callers now
        # pad via blind_rotate)
        raise ValueError(f"batch {b} must be a multiple of 8")
    bb = _pick_bb(b, 256)

    out = pl.pallas_call(
        functools.partial(
            _rot_diff_decompose_kernel, n=n,
            log2_2n=params.log2_2N, bg_bit=params.bg_bit, l=params.l,
            offset=off, kp1=kp1,
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((kp1, bb, n), lambda bi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, bb, n), lambda bi: (0, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, b, n), jnp.int8),
        interpret=interpret,
    )(acc_t, bara_i[:, None])
    return out


def _ext_product_tr_kernel(d_ref, bkrev_ref, acc_ref, out_ref,
                           tscratch, pscratch, *, n: int, jb: int,
                           chunk: int, fold: int, impl: str = "plane"):
    """Transposed-layout external-product tile: out[o, jb-block, lanes]
    += Toeplitz^T(bk[p, o])[jb-block] @ digits[p].

    Layouts: digits dT (rows, N, B) int8, acc/out (k+1, N, B) int32 —
    batch occupies the LANE axis, so with B >= 2048 every dot has a
    2048-wide output, the geometry Mosaic sustains ~200+ TOPS at
    (vs ~160-196 for the shipped layout's 1024-wide dots,
    artifacts/EXT_FLOOR_r04.json).

    The Toeplitz transpose T^T[j, m] = e[N + j - m] is built with the
    SAME doubling-roll scheme as the forward kernel via the reversed
    extended polynomial: with base[t] = rev_e[(N - j0 - jb) + t] the
    doubled rows satisfy roll(base, r)[jb + m] = T^T[j0 + r, m], so
    chunk c's tile is the aligned sliding column window
    [jb + c*chunk, jb + (c+1)*chunk).  ``bkrev_ref`` is the host-side
    pre-tiled (rows, k+1, N/jb, N+jb) reversed/biased/XOR'd BK step.

    Grid (k+1, N/jb, B/bb, rows), rows minor (out accumulates over p).

    ``impl`` (IEACHE_TR_IMPL) is the r5 decomposition hook (VERDICT
    r4 #4 — the probe methodology that cracked the split kernel):
    * "plane": the real kernel;
    * "probe_ident": seed-from-acc only — times the rotation kernel +
      per-program fixed overhead (garbage output);
    * "probe_nodot": Toeplitz build + limb extract, no dots;
    * "probe_noextract": dots + RMW from UNINITIALIZED planes, no
      build/extract.
    """
    p = pl.program_id(3)

    @pl.when(p == 0)
    def _():
        out_ref[...] = acc_ref[...]

    if impl == "probe_ident":
        return

    base = bkrev_ref[0]                          # (1, N+jb) int32
    d = d_ref[0]                                 # (N, bb) int8

    if impl != "probe_noextract":
        tscratch[0:1, :] = base
        size = 1
        while size < jb:
            tscratch[size:2 * size, :] = pltpu.roll(
                tscratch[0:size, :], size, axis=1
            )
            size *= 2

        xs = tscratch[:, :]
        for v in range(TORUS_LIMBS):
            sx = (xs << (24 - 8 * v)) >> 24      # sign-extended byte_v
            pscratch[v] = sx.astype(jnp.int8)

    if impl == "probe_nodot":
        # token dependency so the build+extract is not dead code
        # ((1, 1) broadcasts over the (1, bb) out row)
        out_ref[0, 0:1, :] += pscratch[0, 0:1, 0:1].astype(jnp.int32)
        return

    for c in range(n // chunk):
        lo = jb + c * chunk
        dslice = d[c * chunk:(c + 1) * chunk, :]  # (chunk, bb) int8
        parts = []
        for v in range(TORUS_LIMBS):
            tile = pscratch[v, :, lo:lo + chunk]  # (jb, chunk) int8
            part = jax.lax.dot_general(
                tile, dslice,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            parts.append(part << (8 * v) if v else part)
            if len(parts) == fold:
                acc = parts[0]
                if len(parts) == 4:
                    acc = (parts[0] + parts[1]) + (parts[2] + parts[3])
                else:
                    for pt in parts[1:]:
                        acc = acc + pt
                out_ref[0] += acc
                parts = []


def _bk_rev_tiles(bk_i: jnp.ndarray, n: int, jb: int) -> jnp.ndarray:
    """(rows, k+1, N) int32 BK step -> pre-tiled reversed operand
    (rows, k+1, N/jb, N+jb) for :func:`_ext_product_tr_kernel`.

    With rev_e = reverse((concat(-g, g) + BIAS) ^ BIAS), tile jbi's
    element t is rev_e[(N - 1 - (jbi+1)*jb) + t]; a single zero is
    front-padded so the last block's (never-consumed) t=0 element
    stays in range, and ``roll(tile, jj)[jb + m] = T^T[j0 + jj, m]``.
    """
    g = bk_i
    e = jnp.concatenate([-g, g], axis=-1) + jnp.int32(_LIMB_BIAS)
    e = e ^ jnp.int32(_LIMB_BIAS)
    rev = jnp.flip(e, axis=-1)                   # (rows, kp1, 2N)
    pad = jnp.zeros(rev.shape[:-1] + (1,), rev.dtype)
    rev = jnp.concatenate([pad, rev], axis=-1)   # (rows, kp1, 2N+1)
    tiles = [
        jax.lax.slice_in_dim(rev, n - (jbi + 1) * jb,
                             2 * n - jbi * jb, axis=-1)
        for jbi in range(n // jb)
    ]
    return jnp.stack(tiles, axis=2)              # (rows, kp1, N/jb, N+jb)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def external_product_pallas_tr(
    d_t2: jnp.ndarray, bk_i: jnp.ndarray, params: TFHEParams,
    acc_t2: jnp.ndarray, interpret: bool = False,
) -> jnp.ndarray:
    """Fully-transposed external product: d_t2 (rows, N, B) int8 x
    bk_i (rows, k+1, N) int32 + acc_t2 (k+1, N, B) -> new acc
    (k+1, N, B) int32, exact mod 2^32.  The B >= 2048 throughput
    layout (see _ext_product_tr_kernel); bit-identical to the shipped
    path modulo the (B <-> N) transpose (tests/test_pallas_kernels)."""
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    import os

    n, b = params.N, d_t2.shape[2]
    rows, kp1 = params.trgsw_rows, params.k + 1
    # jb=256 + chunk=512 measured best on hardware (0.937 vs 1.011
    # ms/step at jb=128/chunk=256, B=4096; artifacts/r4/sb_tr_*.log)
    jb = min(int(os.environ.get("IEACHE_TR_JB", 256)), n)
    chunk = min(int(os.environ.get("IEACHE_EXT_CHUNK", 512)), n)
    fold = int(os.environ.get("IEACHE_EXT_FOLD", 1))
    bb = b
    while bb > 2048 or (b % bb):
        bb //= 2
    if b % 128 and not interpret:
        # lane tile of the (k+1, N, B) layout; interpret mode does not
        # tile and is exempt (virtual-mesh mode-matrix coverage)
        raise ValueError(f"transposed path needs B % 128 == 0, got {b}")

    njb = n // jb
    # flat (rows*kp1*njb, 1, N+jb): a 4-D window with two size-1 minor
    # blocks violates Mosaic's (8, 128)-divisible block rule
    bkrev = _bk_rev_tiles(bk_i, n, jb).reshape(
        rows * kp1 * njb, 1, n + jb
    )
    impl = os.environ.get("IEACHE_TR_IMPL", "plane")
    return pl.pallas_call(
        functools.partial(_ext_product_tr_kernel, n=n, jb=jb,
                          chunk=chunk, fold=fold, impl=impl),
        grid=(kp1, njb, b // bb, rows),
        in_specs=[
            pl.BlockSpec((1, n, bb), lambda o, j, bi, p: (p, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n + jb),
                         lambda o, j, bi, p:
                         (p * kp1 * njb + o * njb + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jb, bb), lambda o, j, bi, p: (o, j, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jb, bb), lambda o, j, bi, p: (o, j, bi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp1, n, b), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((jb, n + jb), jnp.int32),
            pltpu.VMEM((TORUS_LIMBS, jb, n + jb), jnp.int8),
        ],
        interpret=interpret,
    )(d_t2, bkrev, acc_t2)


def _rot_diff_decompose_tr_kernel(acc_ref, bara_ref, out_ref, *,
                                  n: int, log2_2n: int, bg_bit: int,
                                  l: int, offset: int, kp1: int):
    """Transposed rotation + diff + gadget decompose: acc (kp1, N, bb)
    int32 with per-LANE amounts (1, bb) -> digits (rows, N, bb) int8.

    Same barrel shifter as :func:`_rot_diff_decompose_kernel` with the
    rolls on the SUBLANE axis — measured 32% faster per lane than the
    lane-roll layout and bit-exact (tools/transposed_probe.py,
    artifacts/EXT_FLOOR_r04.json)."""
    x0 = acc_ref[...]
    amt = bara_ref[...]                            # (1, bb)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    x = x0
    shift = 1
    for t in range(log2_2n):
        bit = ((amt >> t) & 1)[None, :, :]         # (1, 1, bb)
        if shift < n:
            rolled = pltpu.roll(x, shift, axis=1)
            rolled = jnp.where(j < shift, -rolled, rolled)
        else:                                      # X^N == -1
            rolled = -x
        x = jnp.where(bit != 0, rolled, x)
        shift *= 2

    v = (x - x0) + jnp.int32(offset)               # wrapping int32
    half = 1 << (bg_bit - 1)
    mask = (1 << bg_bit) - 1
    for u in range(kp1):
        vu = v[u]
        for jl in range(l):
            sh = 32 - (jl + 1) * bg_bit
            d = ((vu >> sh) & mask) - half
            out_ref[u * l + jl] = d.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def rot_diff_decompose_pallas_tr(
    acc_t2: jnp.ndarray, bara_i: jnp.ndarray, params: TFHEParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """acc_t2 (k+1, N, B) int32, bara_i (B,) int32 -> digits of
    (X^bara·acc - acc) in the transposed layout: (rows, N, B) int8."""
    if params.digit_limbs != 1:
        raise ValueError("pallas path requires single-limb digits")
    from ieache_tpu.ops.decompose import _offset

    kp1, n, b = acc_t2.shape
    rows = params.trgsw_rows

    off = _offset(params.bg_bit, params.l)
    if off >= 2**31:
        off -= 2**32

    # bb=512 blocks AOT-OOM at 19.9M scoped vmem (the (kp1, N, bb)
    # int32 window doubles through the barrel stages); 256 fits
    bb = _pick_bb(b, 256)
    return pl.pallas_call(
        functools.partial(
            _rot_diff_decompose_tr_kernel, n=n,
            log2_2n=params.log2_2N, bg_bit=params.bg_bit, l=params.l,
            offset=off, kp1=kp1,
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((kp1, n, bb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), lambda bi: (0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, n, bb), lambda bi: (0, 0, bi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n, b), jnp.int8),
        interpret=interpret,
    )(acc_t2, bara_i[None, :])
