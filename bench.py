#!/usr/bin/env python
"""Headline benchmark: TFHE gate bootstraps/sec/chip.

Prints ONE JSON line:
    {"metric": "gate_bootstraps_per_sec_per_chip", "value": N,
     "unit": "bootstraps/s", "vs_baseline": R}

Baseline: the reference's tfhe-spqlios core sustains ~40 gate
bootstraps/sec/core (BASELINE.md: A*B*C = 22.6k bootstraps in 563 s on
the paper's i7 VM), so vs_baseline = value / 40.

Runs on whatever JAX's default platform is (the real TPU chip under the
driver; CPU elsewhere).  Full lambda=110 parameters; keyset cached on
disk after first generation.  Env overrides: BENCH_BATCH, BENCH_ITERS,
BENCH_PARAMS=tiny for a smoke run.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        # plain JAX_PLATFORMS is ignored when a hardware plugin is
        # pre-registered (CLAUDE.md); force through jax.config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ieache_tpu import params as P
    from ieache_tpu.codec import files
    import ieache_tpu.boot.bootstrap as boot
    from ieache_tpu.boot import gates
    from ieache_tpu.lwe import encrypt, keygen
    from ieache_tpu.utils import prng

    pname = os.environ.get("BENCH_PARAMS", "fast")
    if pname == "tiny":
        p = P.TEST_TINY
        batch = int(os.environ.get("BENCH_BATCH", 64))
    else:
        # "fast" (default) = IEACHE_110_FAST: same lambda=110 security
        # sizes/noise as IEACHE_110, gadget (8,2) instead of (8,3) ->
        # 1/3 less MXU work; margin validated by tools/margin_probe.py.
        choices = {"fast": P.IEACHE_110_FAST, "l3": P.IEACHE_110,
                   "ieache_110": P.IEACHE_110}
        if pname not in choices:
            sys.exit(f"BENCH_PARAMS must be one of "
                     f"{['tiny', *choices]}, got {pname!r}")
        p = choices[pname]
        batch = int(os.environ.get("BENCH_BATCH", 1024))
    # 16 iterations keep run-to-run spread under a few % (round-1's
    # iters=6 showed ~10% between captures of the same build —
    # per-dispatch tunnel jitter, amortize it away)
    iters = int(os.environ.get("BENCH_ITERS", 16))

    cache_dir = os.path.join(os.path.dirname(__file__), ".keycache")
    os.makedirs(cache_dir, exist_ok=True)
    key_path = os.path.join(cache_dir, f"{p.name}.iek")
    if os.path.exists(key_path):
        ks = files.load_secret_keyset(key_path)
    else:
        t0 = time.time()
        ks = keygen.generate_secret_keyset(p)
        print(f"# keygen: {time.time() - t0:.1f}s", file=sys.stderr)
        files.save_secret_keyset(key_path, ks)
    dck = boot.pack_cloud_key(ks.cloud)

    # batch of NAND gates over random bits
    stream = prng.key_from_seed_words([2026])
    xbits = prng.uniform_bits01(prng.derive(stream, 0), batch)
    ybits = prng.uniform_bits01(prng.derive(stream, 1), batch)
    cx = jnp.asarray(encrypt.encrypt_bits(ks, xbits, prng.derive(stream, 2)))
    cy = jnp.asarray(encrypt.encrypt_bits(ks, ybits, prng.derive(stream, 3)))

    # NOTE: device->host materialization (np.asarray) is the fence;
    # block_until_ready() returns early on the tunneled axon platform.
    out = gates.NAND(cx, cy, dck)  # compile + warmup
    np.asarray(out)

    t0 = time.time()
    for _ in range(iters):
        out = gates.NAND(cx, cy, dck)
    out_host = np.asarray(out)
    dt = time.time() - t0

    got = encrypt.decrypt_bits(ks, out_host)
    want = 1 - (xbits & ybits)
    errors = int((got != want).sum())

    value = batch * iters / dt
    result = {
        "metric": "gate_bootstraps_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / 40.0, 2),
        "batch": batch,
        "iters": iters,
        "seconds": round(dt, 3),
        "decrypt_errors": errors,
        "params": p.name,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
