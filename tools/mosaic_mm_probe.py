#!/usr/bin/env python
"""Mosaic (in-kernel) matmul rate probe: int8 vs bf16 TOPS from VMEM.

The ext-product kernel's dots run at ~196 TOPS (the 1x MXU rate) while
XLA at 4096^3 reaches ~278 TOPS int8 (the 2x int8 mode) -- this probe
measures what a bare pallas dot achieves per shape/dtype, operands
resident in VMEM windows, grid-iterated to amortize.

Env: PM_M/PM_K/PM_N (1024), PM_G (grid steps, 512), PM_DT (s8|bf16|both)
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = int(os.environ.get("PM_M", 1024))
    k = int(os.environ.get("PM_K", 1024))
    n = int(os.environ.get("PM_N", 1024))
    g = int(os.environ.get("PM_G", 512))
    which = os.environ.get("PM_DT", "both")
    rng = np.random.RandomState(0)

    out = {"probe": "mosaic_mm_rate", "m": m, "k": k, "n": n, "grid": g}

    def run(name, a, b, acc_t):
        def kern(a_ref, b_ref, o_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            o_ref[...] += jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )

        f = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), acc_t),
        )
        jf = jax.jit(lambda a, b: jnp.sum(f(a, b)[:8, :8]))
        r = np.asarray(jf(a, b))
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            r = jf(a, b)
        r = np.asarray(r)
        dt = (time.time() - t0) / iters
        tops = g * 2 * m * k * n / dt / 1e12
        out[name] = {"s": round(dt, 5), "tops": round(tops, 1)}
        print(f"# {name}: {tops:.1f} TOPS", file=sys.stderr, flush=True)

    if which in ("s8", "both"):
        a8 = jnp.asarray(rng.randint(-128, 128, (m, k)).astype(np.int8))
        b8 = jnp.asarray(rng.randint(-128, 128, (k, n)).astype(np.int8))
        run("s8s8_s32", a8, b8, jnp.int32)
    if which in ("bf16", "both"):
        abf = jnp.asarray(rng.randn(m, k), dtype=jnp.bfloat16)
        bbf = jnp.asarray(rng.randn(k, n), dtype=jnp.bfloat16)
        run("bf16_f32", abf, bbf, jnp.float32)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
