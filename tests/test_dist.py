import numpy as np
import jax
import jax.numpy as jnp

import ieache_tpu.boot.bootstrap as B
from ieache_tpu import params as P
from ieache_tpu.dist import mesh as dmesh
from ieache_tpu.dist import shard as dshard
from ieache_tpu.lwe import encrypt, keygen
from ieache_tpu.utils import prng


def test_mesh_shapes():
    m = dmesh.make_mesh(8, tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m = dmesh.make_mesh(4, tp=4)
    assert m.shape == {"dp": 1, "tp": 4}


def test_sharded_bootstrap_matches_single_device():
    p = P.TEST_TINY  # trgsw_rows = 4, kN*t = 256 — tp=2 divides both
    ks = keygen.generate_secret_keyset(p)
    dck = B.pack_cloud_key(ks.cloud)

    bits = prng.uniform_bits01(prng.key_from_seed_words([3]), 16)
    ct = jnp.asarray(
        encrypt.encrypt_bits(ks, bits, prng.key_from_seed_words([4]))
    )
    # single-device reference
    ref = np.asarray(B.bootstrap(ct, dck))

    m = dmesh.make_mesh(8, tp=2)
    boot_fn = dshard.make_sharded_bootstrap(m, p)
    bk, ksl = dshard.shard_cloud_key(dck, m)
    ct_sharded = dshard.shard_batch(ct, m)
    out = np.asarray(boot_fn(ct_sharded, bk, ksl))

    # bit-exact agreement between sharded and single-device pipelines
    np.testing.assert_array_equal(out, ref)
    got = encrypt.decrypt_bits(ks, out)
    np.testing.assert_array_equal(got, bits)


def test_sharded_bootstrap_tp4():
    p = P.TEST_TINY
    ks = keygen.generate_secret_keyset(p)
    dck = B.pack_cloud_key(ks.cloud)
    bits = np.array([0, 1, 1, 0, 1, 1, 0, 0])
    ct = jnp.asarray(
        encrypt.encrypt_bits(ks, bits, prng.key_from_seed_words([5]))
    )
    m = dmesh.make_mesh(8, tp=4)
    boot_fn = dshard.make_sharded_bootstrap(m, p)
    bk, ksl = dshard.shard_cloud_key(dck, m)
    out = np.asarray(boot_fn(dshard.shard_batch(ct, m), bk, ksl))
    np.testing.assert_array_equal(
        encrypt.decrypt_bits(ks, out), bits
    )
