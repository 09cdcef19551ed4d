import numpy as np
import jax.numpy as jnp

from ieache_tpu import params as P
from ieache_tpu.core import poly
from ieache_tpu.ops import blind_rotate as br
from ieache_tpu.ops.pallas_kernels import (
    external_product_pallas,
    external_product_pallas_t,
    rot_diff_decompose_pallas,
)
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


def test_pallas_external_product_impl_variants():
    """Every (IEACHE_EXT_IMPL, IEACHE_EXT_FOLD) kernel variant is
    bit-identical to the XLA reference.  The env is read at trace
    time, so caches are cleared between combos."""
    import os

    import jax

    p = P.TEST_TINY
    rng = np.random.RandomState(11)
    b = 16
    digits = rng.randint(-128, 128,
                         (b, p.trgsw_rows, p.N)).astype(np.int8)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

    g = br.make_step_gmatrix(jnp.asarray(bk_i), p)
    out = jnp.zeros((b, p.k + 1, p.N), jnp.int32)
    for v in range(poly.TORUS_LIMBS):
        out = out + (br._dot_digits_g(jnp.asarray(digits), g[v]) << (8 * v))
    want = np.asarray(out)

    saved = {k: os.environ.get(k)
             for k in ("IEACHE_EXT_IMPL", "IEACHE_EXT_FOLD")}
    try:
        for impl in ("arith", "plane"):
            for fold in (1, 2, 4):
                os.environ["IEACHE_EXT_IMPL"] = impl
                os.environ["IEACHE_EXT_FOLD"] = str(fold)
                jax.clear_caches()
                got = np.asarray(external_product_pallas(
                    jnp.asarray(digits), jnp.asarray(bk_i), p,
                    interpret=True,
                ))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"impl={impl} fold={fold}"
                )
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
        jax.clear_caches()


def test_pallas_rot_diff_decompose_matches_xla():
    """Fused rotation+diff+decompose kernel == the XLA barrel shifter
    + gadget_decompose reference (bit-exact), incl. the transposed
    digits layout consumed by external_product_pallas_t."""
    import jax.numpy as jnp2

    p = P.TEST_TINY
    rng = np.random.RandomState(2)
    b = 16
    acc = rng.randint(-2**31, 2**31, (b, p.k + 1, p.N)).astype(np.int32)
    bara = rng.randint(0, 2 * p.N, (b,)).astype(np.int32)

    got = np.asarray(
        rot_diff_decompose_pallas(
            jnp.asarray(np.transpose(acc, (1, 0, 2))),
            jnp.asarray(bara), p, interpret=True,
        )
    )  # (rows, B, N) int8

    want = np.asarray(
        br._step_digits(jnp.asarray(acc), jnp.asarray(bara), p)
    ).astype(np.int8)  # (B, rows, N)
    np.testing.assert_array_equal(got, np.transpose(want, (1, 0, 2)))

    # edge rotations: 0 (identity diff = 0 digits) and N (negation)
    for amt in (0, p.N, 2 * p.N - 1):
        bara_e = np.full((b,), amt, np.int32)
        got_e = np.asarray(
            rot_diff_decompose_pallas(
                jnp.asarray(np.transpose(acc, (1, 0, 2))),
                jnp.asarray(bara_e), p, interpret=True,
            )
        )
        want_e = np.asarray(
            br._step_digits(jnp.asarray(acc), jnp.asarray(bara_e), p)
        ).astype(np.int8)
        np.testing.assert_array_equal(
            got_e, np.transpose(want_e, (1, 0, 2))
        )


def test_pallas_full_step_transposed_pipeline():
    """rot_diff_decompose -> external_product_t composition equals
    the XLA external_product_step (the whole pallas scan body)."""
    p = P.TEST_TINY
    rng = np.random.RandomState(3)
    b = 8
    acc = rng.randint(-2**31, 2**31, (b, p.k + 1, p.N)).astype(np.int32)
    bara = rng.randint(0, 2 * p.N, (b,)).astype(np.int32)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

    acc_t = jnp.asarray(np.transpose(acc, (1, 0, 2)))
    d_t = rot_diff_decompose_pallas(acc_t, jnp.asarray(bara), p,
                                    interpret=True)
    # fused-accumulator variant (the scan body)
    got = np.transpose(np.asarray(
        external_product_pallas_t(d_t, jnp.asarray(bk_i), p,
                                  acc_t=acc_t, interpret=True)
    ), (1, 0, 2))
    # and it must equal acc + the unfused product
    out_t = external_product_pallas_t(d_t, jnp.asarray(bk_i), p,
                                      interpret=True)
    np.testing.assert_array_equal(
        got, np.transpose(np.asarray(acc_t + out_t), (1, 0, 2))
    )

    want = np.asarray(
        br.external_product_step(
            jnp.asarray(acc), jnp.asarray(bara), jnp.asarray(bk_i), p
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_fused2_step_matches_split_and_xla():
    """cmux_step_pallas (single fused kernel) must be bit-identical to
    the split rot_diff_decompose -> external_product_t pipeline and to
    the XLA step."""
    from ieache_tpu.ops.pallas_kernels import cmux_step_pallas

    p = P.TEST_TINY
    rng = np.random.RandomState(5)
    b = 16
    acc = rng.randint(-2**31, 2**31, (b, p.k + 1, p.N)).astype(np.int32)
    bara = rng.randint(0, 2 * p.N, (b,)).astype(np.int32)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

    acc_t = jnp.asarray(np.transpose(acc, (1, 0, 2)))
    got = np.transpose(np.asarray(
        cmux_step_pallas(acc_t, jnp.asarray(bara), jnp.asarray(bk_i),
                         p, interpret=True)
    ), (1, 0, 2))

    d_t = rot_diff_decompose_pallas(acc_t, jnp.asarray(bara), p,
                                    interpret=True)
    split = np.transpose(np.asarray(
        external_product_pallas_t(d_t, jnp.asarray(bk_i), p,
                                  acc_t=acc_t, interpret=True)
    ), (1, 0, 2))
    np.testing.assert_array_equal(got, split)

    want = np.asarray(
        br.external_product_step(
            jnp.asarray(acc), jnp.asarray(bara), jnp.asarray(bk_i), p
        )
    )
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


def test_pallas_overlap_step_matches_fused2():
    """cmux_step_overlap_pallas (next-block rotation hidden under this
    block's matmuls) must be bit-identical to cmux_step_pallas and the
    XLA step — the overlap only reorders independent work.  b=512
    forces nb=2 blocks so the cross-block digits handoff (double-
    buffered dscratch parity) is actually exercised."""
    from ieache_tpu.ops.pallas_kernels import (
        cmux_step_overlap_pallas,
        cmux_step_pallas,
    )

    p = P.TEST_TINY
    rng = np.random.RandomState(6)
    for b in (512, 64):  # nb=2 (overlap) and nb=1 (prologue only)
        acc = rng.randint(-2**31, 2**31,
                          (b, p.k + 1, p.N)).astype(np.int32)
        bara = rng.randint(0, 2 * p.N, (b,)).astype(np.int32)
        bk_i = rng.randint(-2**31, 2**31,
                           (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

        acc_t = jnp.asarray(np.transpose(acc, (1, 0, 2)))
        got = np.asarray(
            cmux_step_overlap_pallas(
                acc_t, jnp.asarray(bara), jnp.asarray(bk_i), p,
                interpret=True,
            )
        )
        want = np.asarray(
            cmux_step_pallas(acc_t, jnp.asarray(bara),
                             jnp.asarray(bk_i), p, interpret=True)
        )
        np.testing.assert_array_equal(got, want)

        xla = np.asarray(br.external_product_step(
            jnp.asarray(acc), jnp.asarray(bara), jnp.asarray(bk_i), p
        ))
        np.testing.assert_array_equal(
            np.transpose(got, (1, 0, 2)), xla
        )


def test_pallas_overlap2_step_matches_fused2():
    """cmux_step_overlap2_pallas (compile-friendly variant: the next
    block arrives as an XLA-side shifted copy instead of a second view
    of the same buffer) must be bit-identical to cmux_step_pallas."""
    from ieache_tpu.ops.pallas_kernels import (
        cmux_step_overlap2_pallas,
        cmux_step_pallas,
    )

    p = P.TEST_TINY
    rng = np.random.RandomState(9)
    for b in (512, 64):  # nb=2 (shifted copy consumed) and nb=1
        acc = rng.randint(-2**31, 2**31,
                          (b, p.k + 1, p.N)).astype(np.int32)
        bara = rng.randint(0, 2 * p.N, (b,)).astype(np.int32)
        bk_i = rng.randint(-2**31, 2**31,
                           (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

        acc_t = jnp.asarray(np.transpose(acc, (1, 0, 2)))
        got = np.asarray(
            cmux_step_overlap2_pallas(
                acc_t, jnp.asarray(bara), jnp.asarray(bk_i), p,
                interpret=True,
            )
        )
        want = np.asarray(
            cmux_step_pallas(acc_t, jnp.asarray(bara),
                             jnp.asarray(bk_i), p, interpret=True)
        )
        np.testing.assert_array_equal(got, want)


def test_pick_bb_legal_blocks():
    """Batch blocks must divide b AND be sublane-tile (8) multiples —
    the windowed CSA's b*(W+1) lane counts broke the old halving
    search on device (Mosaic block-shape error at 1056 = 8*132)."""
    from ieache_tpu.ops.pallas_kernels import _pick_bb

    for b, cap in [(1056, 512), (1056, 256), (4352, 512), (8448, 512),
                   (17408, 512), (520, 512), (1024, 1024), (8, 256),
                   (256, 1024)]:
        bb = _pick_bb(b, cap)
        assert b % bb == 0 and bb % 8 == 0 and bb <= cap, (b, cap, bb)
    # known values: the width-bench classes that ran on hardware
    assert _pick_bb(1056, 512) == 352
    assert _pick_bb(520, 512) == 104
    assert _pick_bb(1024, 1024) == 1024
    # interpret-mode sub-8 batches fall back to halving
    assert _pick_bb(2, 256) == 2


def test_pallas_transposed_external_product_matches():
    """The (k+1, N, B)-layout external product (the B>=2048 throughput
    geometry) is bit-identical to the shipped path modulo transpose."""
    import jax.numpy as jnp2

    from ieache_tpu.ops.pallas_kernels import (
        external_product_pallas_t,
        external_product_pallas_tr,
    )

    p = P.TEST_TINY
    rng = np.random.RandomState(31)
    b = 128
    digits = rng.randint(-128, 128,
                         (p.trgsw_rows, b, p.N)).astype(np.int8)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)
    acc_t = rng.randint(-2**31, 2**31,
                        (p.k + 1, b, p.N)).astype(np.int32)

    want = np.asarray(external_product_pallas_t(
        jnp.asarray(digits), jnp.asarray(bk_i), p,
        acc_t=jnp.asarray(acc_t), interpret=True,
    ))                                           # (kp1, B, N)

    d_t2 = jnp.asarray(np.transpose(digits, (0, 2, 1)))  # (rows, N, B)
    acc_t2 = jnp.asarray(np.transpose(acc_t, (0, 2, 1)))
    got = np.asarray(external_product_pallas_tr(
        d_t2, jnp.asarray(bk_i), p, acc_t2, interpret=True,
    ))                                           # (kp1, N, B)
    np.testing.assert_array_equal(
        np.transpose(got, (0, 2, 1)), want
    )


def test_pallas_transposed_full_step_matches():
    """Transposed rot+decompose -> transposed ext product == the
    shipped split pipeline (the whole tr scan body), bit-exact."""
    from ieache_tpu.ops.pallas_kernels import (
        external_product_pallas_t,
        external_product_pallas_tr,
        rot_diff_decompose_pallas,
        rot_diff_decompose_pallas_tr,
    )

    p = P.TEST_TINY
    rng = np.random.RandomState(33)
    b = 128
    acc = rng.randint(-2**31, 2**31, (b, p.k + 1, p.N)).astype(np.int32)
    bara = rng.randint(0, 2 * p.N, (b,)).astype(np.int32)
    bk_i = rng.randint(-2**31, 2**31,
                       (p.trgsw_rows, p.k + 1, p.N)).astype(np.int32)

    acc_t = jnp.asarray(np.transpose(acc, (1, 0, 2)))   # (kp1, B, N)
    d_t = rot_diff_decompose_pallas(acc_t, jnp.asarray(bara), p,
                                    interpret=True)
    want = np.asarray(external_product_pallas_t(
        d_t, jnp.asarray(bk_i), p, acc_t=acc_t, interpret=True,
    ))

    acc_t2 = jnp.asarray(np.transpose(acc, (1, 2, 0)))  # (kp1, N, B)
    d_t2 = rot_diff_decompose_pallas_tr(acc_t2, jnp.asarray(bara), p,
                                        interpret=True)
    np.testing.assert_array_equal(
        np.asarray(d_t2), np.transpose(np.asarray(d_t), (0, 2, 1))
    )
    got = np.asarray(external_product_pallas_tr(
        d_t2, jnp.asarray(bk_i), p, acc_t2, interpret=True,
    ))
    np.testing.assert_array_equal(np.transpose(got, (0, 2, 1)), want)


def test_blind_rotate_scan_kernel_matches_xla():
    """The whole-rotation scan kernel (one pallas_call for all n CMux
    steps, VMEM-resident accumulator — IEACHE_PALLAS_STEP=scan) is
    bit-identical to the XLA blind rotation."""
    import os

    import jax

    from ieache_tpu.lwe import encrypt, keygen
    import ieache_tpu.boot.bootstrap as B

    p = P.TEST_TINY
    ks = keygen.generate_secret_keyset(p)
    dck = B.pack_cloud_key(ks.cloud)
    bits = prng.uniform_bits01(prng.key_from_seed_words([91]), 24)
    ct = jnp.asarray(
        encrypt.encrypt_bits(ks, bits, prng.key_from_seed_words([92]))
    )

    saved = {k: os.environ.get(k)
             for k in ("IEACHE_PALLAS", "IEACHE_PALLAS_STEP")}
    try:
        os.environ["IEACHE_PALLAS"] = "0"
        os.environ.pop("IEACHE_PALLAS_STEP", None)
        jax.clear_caches()
        ref = np.asarray(B.bootstrap(ct, dck))

        os.environ["IEACHE_PALLAS"] = "interpret"
        os.environ["IEACHE_PALLAS_STEP"] = "scan"
        jax.clear_caches()
        got = np.asarray(B.bootstrap(ct, dck))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(
            np.asarray(encrypt.decrypt_bits(ks, got)), np.asarray(bits)
        )
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()
