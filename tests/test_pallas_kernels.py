import numpy as np
import jax.numpy as jnp

from ieache_tpu import params as P
from ieache_tpu.core import poly
from ieache_tpu.ops import blind_rotate as br
from ieache_tpu.ops.pallas_kernels import external_product_pallas
from ieache_tpu.utils import prng


def test_pallas_external_product_matches_xla():
    p = P.TEST_TINY
    rng = np.random.RandomState(0)
    b = 8
    digits = rng.randint(-128, 128,
                         (b, p.trgsw_rows, p.N)).astype(np.int8)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

    got = np.asarray(
        external_product_pallas(
            jnp.asarray(digits), jnp.asarray(bk_i), p, interpret=True
        )
    )

    # XLA reference
    g = br.make_step_gmatrix(jnp.asarray(bk_i), p)
    want = np.zeros((b, p.k + 1, p.N), np.int32)
    out = jnp.zeros((b, p.k + 1, p.N), jnp.int32)
    for v in range(poly.TORUS_LIMBS):
        out = out + (br._dot_digits_g(jnp.asarray(digits), g[v]) << (8 * v))
    want = np.asarray(out)
    np.testing.assert_array_equal(got, want)


def test_pallas_external_product_vs_schoolbook():
    p = P.TEST_TINY
    rng = np.random.RandomState(1)
    b = 2
    digits = rng.randint(-128, 128,
                         (b, p.trgsw_rows, p.N)).astype(np.int8)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)
    got = np.asarray(
        external_product_pallas(
            jnp.asarray(digits), jnp.asarray(bk_i), p, interpret=True
        )
    )
    for bi in range(b):
        for o in range(p.k + 1):
            acc = np.zeros(p.N, np.int64)
            for pr in range(p.trgsw_rows):
                acc += poly.negacyclic_mul_np(
                    digits[bi, pr].astype(np.int32), bk_i[pr, o]
                ).astype(np.int64)
            np.testing.assert_array_equal(
                got[bi, o], (acc & 0xFFFFFFFF).astype(np.uint32)
                .astype(np.int32).view(np.int32)
            )
