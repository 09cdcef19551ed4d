#!/usr/bin/env python
"""Per-step cost of each Pallas CMux step kernel (split/fused2/overlap).

Times an ST_STEPS-step blind-rotation scan per step mode on the active
device, printing staged progress (compile vs run) with flush so a
pathological compile is visible immediately, plus one JSON line per
mode and a summary.  Unlike tools/profile_scan.py this exercises the
exact scan bodies `blind_rotate` dispatches (transposed layout,
IEACHE_PALLAS_STEP), so it measures what bench.py will see.

Env (ST_ prefix; legacy SB_ still honored but collides with
scaling_bench): ST_MODES (comma list, default "split,fused2" -- the
overlap kernel under lax.scan is the documented compile pathology on
this platform, 581 s at 8 steps and a service wedge if killed
(CLAUDE.md, artifacts/STEPMODE_r03.json); request it EXPLICITLY),
ST_B (1024), ST_STEPS (128), ST_PARAMS (ieache_110_l2), ST_ITERS (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ieache_tpu import params as P
    from ieache_tpu.ops import pallas_kernels as pk

    def env(name, default):
        return os.environ.get("ST_" + name,
                              os.environ.get("SB_" + name, default))

    pname = env("PARAMS", "ieache_110_l2")
    p = {"ieache_110": P.IEACHE_110,
         "ieache_110_l2": P.IEACHE_110_FAST}[pname]
    b = int(env("B", 1024))
    steps = int(env("STEPS", 128))
    iters = int(env("ITERS", 8))
    modes = env("MODES", "split,fused2").split(",")

    rows, kp1, n = p.trgsw_rows, p.k + 1, p.N
    rng = np.random.RandomState(7)
    acc_bn = rng.randint(-2**31, 2**31, (kp1, b, n)).astype(np.int32)
    acc_t = jnp.asarray(acc_bn)
    acc_t2 = jnp.asarray(np.transpose(acc_bn, (0, 2, 1)))
    bara = jnp.asarray(
        rng.randint(0, 2 * n, (steps, b)).astype(np.int32))
    bks = jnp.asarray(
        rng.randint(-2**31, 2**31, (steps, rows, kp1, n)).astype(np.int32))

    interp = os.environ.get("IEACHE_PALLAS") == "interpret"

    def body(mode):
        if mode == "scan":
            # whole-rotation kernel: ONE pallas_call for all steps
            @jax.jit
            def f(acc_t, bks, bara):
                acc = pk.blind_rotate_scan_pallas(acc_t, bara.T, bks, p,
                                                  interpret=interp)
                return jnp.sum(acc, dtype=jnp.int32)

            return f
        if mode == "tr" or mode.startswith("tr:"):
            # "tr:probe_ident|probe_nodot|probe_noextract" set the
            # ext kernel's IEACHE_TR_IMPL decomposition hook (r5);
            # probe outputs are garbage — checksums differ, timing
            # only
            impl = mode.partition(":")[2] or "plane"
            os.environ["IEACHE_TR_IMPL"] = impl
            jax.clear_caches()

            def step(acc, xs):
                bk_i, bara_i = xs
                d_t2 = pk.rot_diff_decompose_pallas_tr(
                    acc, bara_i, p, interpret=interp)
                return pk.external_product_pallas_tr(
                    d_t2, bk_i, p, acc, interpret=interp), None
        elif mode in ("overlap", "overlap2"):
            kern = (pk.cmux_step_overlap2_pallas if mode == "overlap2"
                    else pk.cmux_step_overlap_pallas)

            def step(acc, xs):
                bk_i, bara_i = xs
                return kern(acc, bara_i, bk_i, p,
                            interpret=interp), None
        elif mode == "fused2":
            def step(acc, xs):
                bk_i, bara_i = xs
                return pk.cmux_step_pallas(acc, bara_i, bk_i, p,
                                           interpret=interp), None
        elif mode == "split":
            def step(acc, xs):
                bk_i, bara_i = xs
                d_t = pk.rot_diff_decompose_pallas(
                    acc, bara_i, p, interpret=interp)
                return pk.external_product_pallas_t(
                    d_t, bk_i, p, acc_t=acc, interpret=interp), None
        else:
            raise SystemExit(f"unknown mode {mode!r}")

        @jax.jit
        def f(acc_t, bks, bara):
            acc, _ = jax.lax.scan(step, acc_t, (bks, bara))
            # scalar checksum, NOT the 8 MB accumulator: the tunneled
            # host link runs ~20 MB/s, so materializing acc would add
            # ~0.4 s per timing pass and swamp the per-step signal
            return jnp.sum(acc, dtype=jnp.int32)

        return f

    results = {}
    for mode in modes:
        mode = mode.strip()
        f = body(mode)
        a0 = acc_t2 if mode.startswith("tr") else acc_t
        print(f"# {mode}: compiling...", flush=True)
        t0 = time.time()
        out = np.asarray(f(a0, bks, bara))   # materialize = fence
        t_compile = time.time() - t0
        print(f"# {mode}: compile+first run {t_compile:.1f}s; timing...",
              flush=True)
        t0 = time.time()
        for _ in range(iters):
            out = f(a0, bks, bara)
        out = np.asarray(out)
        dt = (time.time() - t0) / iters / steps
        results[mode] = dt
        print(json.dumps({
            "mode": mode, "ms_per_step": round(dt * 1e3, 4),
            "compile_s": round(t_compile, 1),
            "b": b, "steps": steps, "params": p.name,
            "proj_bootstraps_per_s": round(b / (p.n * dt), 1),
            "checksum": int(np.int64(out) & 0xFFFFFFFF),
        }), flush=True)

    if len(results) > 1:
        base = results.get("split") or next(iter(results.values()))
        summary = {m: round(base / v - 1, 4) for m, v in results.items()}
        print(json.dumps({"speedup_vs_split": summary}), flush=True)


if __name__ == "__main__":
    main()
