#!/usr/bin/env python
"""On-device Pallas-vs-XLA bit-exactness probe.

The fused Pallas kernels (`ops/pallas_kernels.py`) are CI-tested in
interpret mode only; this probe runs BOTH implementations of the full
gate bootstrap on the active device (the real TPU under the driver) at
full lambda=110 geometry and asserts int32 bit-exact equality of every
output ciphertext, plus verified decrypts.  Exit code 0 = exact match.

Env: PP_PARAMS (ieache_110_l2|ieache_110), PP_BATCH (default 256),
PP_BITS (default 64 random gate inputs per pass).
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
    from ieache_tpu.codec import files
    import ieache_tpu.boot.bootstrap as boot
    from ieache_tpu.lwe import encrypt, keygen
    from ieache_tpu.utils import prng

    pname = os.environ.get("PP_PARAMS", "ieache_110_l2")
    p = {"ieache_110": P.IEACHE_110,
         "ieache_110_l2": P.IEACHE_110_FAST}[pname]
    batch = int(os.environ.get("PP_BATCH", 256))

    cache = os.path.join(os.path.dirname(__file__), "..", ".keycache")
    os.makedirs(cache, exist_ok=True)
    key_path = os.path.join(cache, f"{p.name}.iek")
    if os.path.exists(key_path):
        ks = files.load_secret_keyset(key_path)
    else:
        ks = keygen.generate_secret_keyset(p, keygen.MAIN_SEED)
        files.save_secret_keyset(key_path, ks)
    dck = boot.pack_cloud_key(ks.cloud)

    stream = prng.key_from_seed_words([0x9A11, batch])
    bits = prng.uniform_bits01(prng.derive(stream, 0), batch)
    ct = jnp.asarray(encrypt.encrypt_bits(ks, bits,
                                          prng.derive(stream, 1)))

    # IEACHE_PALLAS is consulted at TRACE time inside blind_rotate, so
    # each mode gets its own freshly-jitted wrapper (separate trace).
    def run(mode):
        os.environ["IEACHE_PALLAS"] = mode
        # plain bootstraps at this batch are the documented-safe XLA
        # shape (the worker-crash repro is wide multiplies only); the
        # probe is the deliberate consumer of the fallback
        os.environ["IEACHE_FORCE"] = "1"

        @jax.jit
        def f(x):
            return boot.bootstrap(x, dck)

        out = np.asarray(f(ct))     # materialize = the real fence here
        t0 = time.time()
        out = np.asarray(f(ct))
        return out, time.time() - t0

    out_pallas, t_pallas = run("1")
    out_xla, t_xla = run("0")
    os.environ.pop("IEACHE_PALLAS", None)

    exact = bool(np.array_equal(out_pallas, out_xla))
    dec = encrypt.decrypt_bits(ks, out_pallas)
    errors = int(np.sum(np.asarray(dec) != np.asarray(bits)))
    print(json.dumps({
        "probe": "pallas_vs_xla_bootstrap",
        "params": p.name,
        "batch": batch,
        "bit_exact": exact,
        "max_abs_diff": int(
            np.max(np.abs(out_pallas.astype(np.int64)
                          - out_xla.astype(np.int64)))
        ),
        "decrypt_errors": errors,
        "seconds_pallas": round(t_pallas, 3),
        "seconds_xla": round(t_xla, 3),
        "device": str(jax.devices()[0]),
    }))
    sys.exit(0 if exact and errors == 0 else 1)


if __name__ == "__main__":
    main()
