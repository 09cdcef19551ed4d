"""Symmetric LWE encryption/decryption of gate-bootstrapping bits.

Counterpart of ``bootsSymEncrypt`` / ``bootsSymDecrypt`` as used by the
reference encryptor/decryptor (``/root/reference/Client1/alice.c:116-149``,
``/root/reference/Output/verif.c:91-95``): a bit is the torus message
+1/8 (true) or -1/8 (false); decryption is the sign of the phase.

Host (NumPy) implementation; batched over a leading axis.  Device-side
batch encryption lives with the gate API (ieache_tpu/boot).
"""

from __future__ import annotations

import numpy as np

from ieache_tpu.lwe.types import SecretKeySet
from ieache_tpu.utils import prng

#: torus encoding of a gate-bootstrapping bit: 1/8 of the torus
MU = np.int32(1 << 29)


def encrypt_bits(keyset: SecretKeySet, bits, stream_key) -> np.ndarray:
    """Encrypt a bit array -> LWE batch int32 (..., n+1).

    `stream_key` is a prng key; sample r of the flattened batch uses
    sub-stream derive(stream_key, r) with mask at derive(sub, 0) and
    noise at derive(sub, 1)  (normative; mirrored by the C++ oracle).
    """
    p = keyset.params
    bits = np.asarray(bits)
    flat = bits.reshape(-1).astype(np.int64)
    r = flat.shape[0]

    row_keys = prng.derive_multi(stream_key, np.arange(r))

    def _derive_all(keys, idx):
        y0, y1 = prng.threefry2x32(
            (keys[0], keys[1]),
            (np.full_like(keys[0], idx), np.full_like(keys[0], 0x9E3779B9)),
        )
        return (y0, y1)

    a = prng.random_bits_multi(_derive_all(row_keys, 0), p.n).astype(np.int32)
    e = prng.binomial_noise_multi(
        _derive_all(row_keys, 1), 1, p.lwe_noise_scale, p.noise_bits
    )[:, 0]
    mu = np.where(flat != 0, MU, -MU).astype(np.int32)
    s = keyset.lwe_key.s
    with np.errstate(over="ignore"):
        b = (a @ s + mu + e).astype(np.int32)
    out = np.concatenate([a, b[:, None]], axis=1)
    return out.reshape(bits.shape + (p.n + 1,))


def decrypt_bits(keyset: SecretKeySet, lwe) -> np.ndarray:
    """Decrypt LWE batch (..., n+1) -> bit array (...,) of int32 {0,1}."""
    p = keyset.params
    lwe = np.asarray(lwe, np.int32)
    a = lwe[..., : p.n]
    b = lwe[..., p.n]
    s = keyset.lwe_key.s
    with np.errstate(over="ignore"):
        phase = (b - a @ s).astype(np.int32)
    return (phase > 0).astype(np.int32)


def phase_of(keyset: SecretKeySet, lwe) -> np.ndarray:
    """Raw phase (b - a.s) as int32 — for noise-margin diagnostics."""
    p = keyset.params
    lwe = np.asarray(lwe, np.int32)
    with np.errstate(over="ignore"):
        return (lwe[..., p.n] - lwe[..., : p.n] @ keyset.lwe_key.s).astype(
            np.int32
        )


def trivial(bits, params) -> np.ndarray:
    """Noiseless 'trivial' LWE samples (a=0, b=±MU) for constants."""
    bits = np.asarray(bits)
    out = np.zeros(bits.shape + (params.n + 1,), np.int32)
    out[..., params.n] = np.where(bits != 0, MU, -MU)
    return out
