#!/usr/bin/env python
"""Probe the transposed-pipeline ingredients (future N_out=2048 route).

EXT_FLOOR_r04 showed Mosaic int8 dots sustain ~230-245 TOPS only when
the dot's output is 2048 lanes wide; the clean route is a (k+1, N, B)
accumulator layout with B >= 2048 so batch occupies the lane axis.
Unknown ingredient: the barrel-shifter rotation then rolls the
SUBLANE axis (per-LANE rotation amounts), and sublane rolls /
sublane-masked selects have unmeasured cost.  This probe times one
rotation stage pipeline in both layouts at equal element counts.

Env: TP_B (2048), TP_STEPS (200), TP_ITERS (8).
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

    b = int(os.environ.get("TP_B", 2048))
    steps = int(os.environ.get("TP_STEPS", 200))
    iters = int(os.environ.get("TP_ITERS", 8))
    n, kp1, log2_2n = 1024, 2, 11
    rng = np.random.RandomState(0)

    out = {"probe": "transposed_rotation", "b": b, "steps": steps,
           "n": n}

    def run(name, make_kernel, acc, bara):
        f = make_kernel()

        @jax.jit
        def scan(acc, baras):
            def step(a, bi):
                return f(a, bi), None
            a, _ = jax.lax.scan(step, acc, baras)
            return jnp.sum(a, dtype=jnp.int32)

        r = np.asarray(scan(acc, bara))
        t0 = time.time()
        for _ in range(iters):
            r = scan(acc, bara)
        r = np.asarray(r)
        dt = (time.time() - t0) / iters / steps
        out[name] = {"ms_per_step": round(dt * 1e3, 4),
                     "checksum": int(np.int64(r) & 0xFFFFFFFF)}
        print(f"# {name}: {dt*1e3:.4f} ms/step", file=sys.stderr,
              flush=True)

    # --- current layout: (kp1, B, N), rolls on the lane axis --------
    def lane_kernel():
        def kern(a_ref, bara_ref, o_ref):
            x = a_ref[...]
            amt = bara_ref[...]                      # (bb, 1)
            j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
            shift = 1
            for t in range(log2_2n):
                bit = ((amt >> t) & 1)[None, :, :]
                if shift < n:
                    rolled = pltpu.roll(x, shift, axis=2)
                    rolled = jnp.where(j < shift, -rolled, rolled)
                else:
                    rolled = -x
                x = jnp.where(bit != 0, rolled, x)
                shift *= 2
            o_ref[...] = x

        bb = 256
        inner = pl.pallas_call(
            kern,
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((kp1, bb, n), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((kp1, bb, n), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((kp1, b, n), jnp.int32),
        )
        return lambda a, bi: inner(a, bi[:, None])

    # --- transposed layout: (kp1, N, B), rolls on the sublane axis --
    def sublane_kernel():
        def kern(a_ref, bara_ref, o_ref):
            x = a_ref[...]                           # (kp1, n, bb)
            amt = bara_ref[...]                      # (1, bb)
            j = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
            shift = 1
            for t in range(log2_2n):
                bit = ((amt >> t) & 1)[None, :, :]   # (1, 1, bb)
                if shift < n:
                    rolled = pltpu.roll(x, shift, axis=1)
                    rolled = jnp.where(j < shift, -rolled, rolled)
                else:
                    rolled = -x
                x = jnp.where(bit != 0, rolled, x)
                shift *= 2
            o_ref[...] = x

        bb = 256
        inner = pl.pallas_call(
            kern,
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((kp1, n, bb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((kp1, n, bb), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((kp1, n, b), jnp.int32),
        )
        return lambda a, bi: inner(a, bi[None, :])

    acc = jnp.asarray(
        rng.randint(-2**31, 2**31, (kp1, b, n)).astype(np.int32))
    acc_t = jnp.transpose(acc, (0, 2, 1))
    bara = jnp.asarray(
        rng.randint(0, 2 * n, (steps, b)).astype(np.int32))

    run("lane_rolls_kpl_B_N", lane_kernel, acc, bara)
    try:
        run("sublane_rolls_kpl_N_B", sublane_kernel, acc_t, bara)
        # same logical rotation on the same data in both layouts: the
        # scalar checksums must MATCH (bit-exactness check for free)
        out["checksums_match"] = (
            out["lane_rolls_kpl_B_N"]["checksum"]
            == out["sublane_rolls_kpl_N_B"]["checksum"]
        )
    except Exception as e:  # noqa: BLE001
        out["sublane_rolls_kpl_N_B"] = {"error": str(e)[:500]}
        print(f"# sublane: FAILED {str(e)[:200]}", file=sys.stderr,
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
