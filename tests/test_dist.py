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


def test_dp_sharded_evaluator_bit_exact():
    """Full fused expression evaluation with the batch dp-sharded over
    8 devices agrees bit-for-bit with the single-device run — the
    placement layer (dist/batch.py) changes no compute path."""
    from ieache_tpu.circuits import evaluator as ev
    from ieache_tpu.dist import batch as dbatch

    p = P.TEST_TINY
    pair = keygen.generate_gate_keypair(p)
    dck = B.pack_cloud_key(pair.main.cloud)

    rng = np.random.RandomState(7)
    width, batch = 8, 16
    a_vals = rng.randint(1, 50, batch)
    b_vals = rng.randint(1, 50, batch)
    s = prng.key_from_seed_words([0xD9])
    a = ev.encrypt_operand(pair.main, pair.nbit, a_vals, width,
                           prng.derive(s, 0))
    b = ev.encrypt_operand(pair.main, pair.nbit, b_vals, width,
                           prng.derive(s, 1))

    cloud = ev.CloudEvaluator(dck, pair.nbit)
    ref, _ = cloud.compute(ev.OP_ADD, a, b)
    ref_value = np.asarray(ref.value)

    m = dmesh.make_mesh(8, tp=1)
    cloud_dp = ev.CloudEvaluator(
        dbatch.replicate_cloud_key(dck, m), pair.nbit
    )
    ans, _ = cloud_dp.compute(
        ev.OP_ADD, dbatch.shard_operand(a, m), dbatch.shard_operand(b, m)
    )
    ans = dbatch.gather_operand(ans)
    np.testing.assert_array_equal(ans.value, ref_value)
    got = ev.decrypt_answer(pair.main, pair.nbit, ans, ev.OP_ADD)
    assert got == [int(x) + int(y) for x, y in zip(a_vals, b_vals)]


def test_shard_operand_rejects_uneven_batch():
    from ieache_tpu.circuits import evaluator as ev
    from ieache_tpu.dist import batch as dbatch

    p = P.TEST_TINY
    pair = keygen.generate_gate_keypair(p)
    s = prng.key_from_seed_words([0xDA])
    a = ev.encrypt_operand(pair.main, pair.nbit, [1, 2, 3], 8,
                           prng.derive(s, 0))
    m = dmesh.make_mesh(8, tp=1)
    try:
        dbatch.shard_operand(a, m)
        assert False, "expected ValueError"
    except ValueError:
        pass


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


def test_sharded_bootstrap_tp_overlap_chunks_bit_exact():
    """The batch-pipelined tp schedule (overlap_chunks>1 — the r5 psum
    overlap, VERDICT r4 #5) is bit-identical to the unpipelined
    schedule and the single-device pipeline for every chunking."""
    p = P.TEST_TINY
    ks = keygen.generate_secret_keyset(p)
    dck = B.pack_cloud_key(ks.cloud)
    bits = prng.uniform_bits01(prng.key_from_seed_words([31]), 16)
    ct = jnp.asarray(
        encrypt.encrypt_bits(ks, bits, prng.key_from_seed_words([32]))
    )
    ref = np.asarray(B.bootstrap(ct, dck))

    m = dmesh.make_mesh(8, tp=2)
    bk, ksl = dshard.shard_cloud_key(dck, m)
    ct_sharded = dshard.shard_batch(ct, m)
    for chunks in (1, 2, 4):
        boot_fn = dshard.make_sharded_bootstrap(
            m, p, overlap_chunks=chunks
        )
        out = np.asarray(boot_fn(ct_sharded, bk, ksl))
        np.testing.assert_array_equal(out, ref)


def test_sharded_bootstrap_tp2_full_geometry():
    """tp-sharded bootstrap at FULL production geometry (N=1024,
    production noise scales; n shrunk for CPU runtime, as in
    test_oracle_parity) — bit-exact vs the single-device pipeline.
    VERDICT r1: tp>1 correctness previously rested on TEST_TINY only."""
    import dataclasses

    p = dataclasses.replace(P.IEACHE_110_FAST, n=32, name="fullgeo_l2")
    ks = keygen.generate_secret_keyset(p)
    dck = B.pack_cloud_key(ks.cloud)
    bits = np.array([0, 1, 1, 0, 1, 1, 0, 0])
    ct = jnp.asarray(
        encrypt.encrypt_bits(ks, bits, prng.key_from_seed_words([6]))
    )
    ref = np.asarray(B.bootstrap(ct, dck))

    m = dmesh.make_mesh(8, tp=2)
    boot_fn = dshard.make_sharded_bootstrap(m, p)
    bk, ksl = dshard.shard_cloud_key(dck, m)
    out = np.asarray(boot_fn(dshard.shard_batch(ct, m), bk, ksl))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(encrypt.decrypt_bits(ks, out), bits)


def test_sharded_bootstrap_sp_polynomial_axis():
    """sp-sharded bootstrap: the accumulator's polynomial dimension N
    split over 4 devices (one all_gather per blind-rotation step — the
    SURVEY §5.7 "NTT stage all-to-all" analog), dp=2 over the batch.
    Bit-exact vs the single-device pipeline."""
    p = P.TEST_TINY
    ks = keygen.generate_secret_keyset(p)
    dck = B.pack_cloud_key(ks.cloud)
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0])
    ct = jnp.asarray(
        encrypt.encrypt_bits(ks, bits, prng.key_from_seed_words([7]))
    )
    ref = np.asarray(B.bootstrap(ct, dck))

    m = dshard.make_sp_mesh(8, sp=4)
    assert m.shape == {"dp": 2, "sp": 4}
    boot_fn = dshard.make_sharded_bootstrap_sp(m, p)
    out = np.asarray(boot_fn(ct, dck.bk, dck.ks_limbs))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(encrypt.decrypt_bits(ks, out), bits)


def test_step_gmatrix_local_blocks_match_full():
    """make_step_gmatrix_local (the r4 SP memory fix: windowed block
    build, no full-size (N, 2N) transient) is bit-identical to slicing
    the full Toeplitz operand, at every shard offset."""
    import jax.numpy as jnp

    from ieache_tpu import params as P
    from ieache_tpu.ops.blind_rotate import (
        make_step_gmatrix,
        make_step_gmatrix_local,
    )

    p = P.TEST_TINY
    rng = np.random.RandomState(21)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)
    full = np.asarray(make_step_gmatrix(jnp.asarray(bk_i), p))
    for sp in (2, 4):
        nl = p.N // sp
        for s in range(sp):
            loc = np.asarray(make_step_gmatrix_local(
                jnp.asarray(bk_i), p, jnp.int32(s * nl), nl
            ))
            np.testing.assert_array_equal(
                loc, full[..., s * nl:(s + 1) * nl],
                err_msg=f"sp={sp} shard={s}",
            )
