import numpy as np
import jax.numpy as jnp

import ieache_tpu.boot.bootstrap as B
from ieache_tpu import params as P
from ieache_tpu.boot import gates
from ieache_tpu.circuits import fused, words
from ieache_tpu.lwe import keygen
from ieache_tpu.utils import prng

_C = {}


def _setup():
    if "ks" not in _C:
        _C["ks"] = keygen.generate_secret_keyset(P.TEST_TINY)
        _C["dck"] = B.pack_cloud_key(_C["ks"].cloud)
    return _C["ks"], _C["dck"]


def _enc(ks, vals, width, salt):
    return words.encrypt_word(
        ks, vals, width, prng.key_from_seed_words([salt])
    )


def test_fused_ripple_add():
    ks, dck = _setup()
    rng = np.random.RandomState(0)
    a = rng.randint(0, 1 << 12, 5)
    b = rng.randint(0, 1 << 12, 5)
    ca = _enc(ks, a, 12, 1)
    cb = _enc(ks, b, 12, 2)
    zero = gates.CONSTANT(jnp.zeros((5,), jnp.int32), ks.params.n)
    s, cout = fused.ripple_add(ca, cb, zero, dck)
    assert words.decrypt_word(ks, s) == [
        (int(x) + int(y)) & 0xFFF for x, y in zip(a, b)
    ]


def test_fused_twos_complement_and_chain():
    ks, dck = _setup()
    vals = [0, 3, 200, 255]
    c = _enc(ks, vals, 8, 3)
    neg = fused.twos_complement(c, dck)
    assert words.decrypt_word(ks, neg) == [(-v) & 0xFF for v in vals]

    a = _enc(ks, [30, 1], 8, 4)
    b = _enc(ks, [12, 2], 8, 5)
    cc = _enc(ks, [50, 3], 8, 6)
    s = fused.add_then_sub(a, b, cc, dck)
    got = words.decrypt_word_signed(ks, s)
    assert got == [30 + 12 - 50, 1 + 2 - 3]


def test_fused_mul():
    ks, dck = _setup()
    rng = np.random.RandomState(1)
    a = rng.randint(0, 1 << 5, 4)
    b = rng.randint(0, 1 << 5, 4)
    ca = _enc(ks, a, 5, 7)
    cb = _enc(ks, b, 5, 8)
    prod = fused.schoolbook_mul_fused(ca, cb, dck)
    assert words.decrypt_word(ks, prod) == [
        int(x) * int(y) for x, y in zip(a, b)
    ]
