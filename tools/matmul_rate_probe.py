#!/usr/bin/env python
"""Device matmul rate probe: achievable int8 vs bf16 MXU rate per shape.

Context (r4): the ext-product kernel's pure-dot probe measured ~196
TOPS (the bf16-ish rate); XLA at 4096^3 int8 reaches ~260 TOPS.  This
probe chains CH matmuls of one shape inside a single jit (fori_loop,
next operand sliced from the previous product, so nothing folds) to
measure the dispatch-free rate at the kernel's shapes.

Env: MR_M/MR_K/MR_N (4096), MR_CHAIN (128), MR_ITERS (8).
Requires K <= N (the chain slices columns).
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

    m = int(os.environ.get("MR_M", 4096))
    k = int(os.environ.get("MR_K", 4096))
    n = int(os.environ.get("MR_N", 4096))
    chain = int(os.environ.get("MR_CHAIN", 128))
    iters = int(os.environ.get("MR_ITERS", 8))
    assert k <= n
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-128, 128, (m, k)).astype(np.int8))
    b8 = jnp.asarray(rng.randint(-128, 128, (k, n)).astype(np.int8))
    abf = jnp.asarray(rng.randn(m, k).astype(np.float32), dtype=jnp.bfloat16)
    bbf = jnp.asarray(rng.randn(k, n).astype(np.float32), dtype=jnp.bfloat16)

    cases = {
        "s8s8_s32": (a8, b8, jnp.int32, jnp.int8),
        "bf16_f32": (abf, bbf, jnp.float32, jnp.bfloat16),
    }
    out = {"probe": "matmul_rate", "m": m, "k": k, "n": n,
           "chain": chain,
           "device": str(jax.devices()[0].device_kind)}
    for name, (a, b, acc, opd) in cases.items():
        @jax.jit
        def f(a, b):
            def body(_, x):
                y = x[:, :k].astype(opd)
                return jax.lax.dot_general(
                    y, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
            x0 = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                     preferred_element_type=acc)
            x = jax.lax.fori_loop(0, chain - 1, body, x0)
            return jnp.sum(x[:8, :8])

        r = np.asarray(f(a, b))  # compile+warm
        t0 = time.time()
        for _ in range(iters):
            r = f(a, b)
        r = np.asarray(r)
        dt = (time.time() - t0) / iters
        tops = chain * 2 * m * k * n / dt / 1e12
        out[name] = {"s_per_iter": round(dt, 5), "tops": round(tops, 1)}
        print(f"# {name} {m}x{k}x{n}: {tops:.1f} TOPS",
              file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
