"""Sharded (multi-chip) gate bootstrapping via shard_map.

Parallelism surface (SURVEY §2 parallelism table):

* ``dp``: the gate batch is sharded — the reference's "independent
  gates under OpenMP sections / multi-client fan-out" axis;
* ``tp``: the external-product contraction (TRGSW rows) and the
  keyswitch contraction (kN*t) are sharded; each blind-rotation step
  ends in one ``psum`` over tp (XLA collectives over ICI), and the
  bootstrapping/keyswitch keys are memory-sharded accordingly;
* ``pp``: pipeline parallelism over expression-chain stages is
  device-level in ieache_tpu/dist/pipeline.py (microbatched GPipe
  schedule, ppermute handoff — the analog of the reference's
  Cloud answer.data re-upload chain); the host-level counterpart of
  the Keygen->Client->Cloud->Output pipeline is the scheduler
  (ieache_tpu/mp/scheduler.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.7 style
    shard_map = jax.shard_map
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ieache_tpu.boot.bootstrap import (
    MU,
    DeviceCloudKey,
    _rotated_test_vector,
    mod_switch_2n,
    sample_extract,
)
from ieache_tpu.core.poly import TORUS_LIMBS
from ieache_tpu.ops.blind_rotate import blind_rotate_sharded
from ieache_tpu.ops.decompose import gadget_decompose
from ieache_tpu.params import TFHEParams


def _keyswitch_sharded(lwe_ext, ks_local, params: TFHEParams, tp_axis: str):
    """Keyswitch with the (kN*t) contraction sharded over tp."""
    b_dim = lwe_ext.shape[0]
    kn, t, n = params.kN, params.ks_t, params.n
    a = lwe_ext[:, :kn]
    body = lwe_ext[:, kn]

    digits = gadget_decompose(a, params.ks_basebit, t).reshape(
        b_dim, kn * t
    )
    k_local = ks_local.shape[1]
    start = jax.lax.axis_index(tp_axis) * k_local
    d8 = jax.lax.dynamic_slice_in_dim(digits, start, k_local, 1).astype(
        jnp.int8
    )

    acc = jnp.zeros((b_dim, n + 1), jnp.int32)
    for v in range(TORUS_LIMBS):
        part = jax.lax.dot_general(
            d8, ks_local[v],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + (part << (8 * v))
    acc = jax.lax.psum(acc, tp_axis)
    out = -acc
    out = out.at[:, n].add(body)
    return out


def make_sharded_bootstrap(mesh: Mesh, params: TFHEParams, mu: int = MU):
    """Build a jitted sharded bootstrap: (lwe, bk, ks_limbs) -> lwe_out.

    lwe is dp-sharded on the batch; bk's TRGSW-rows axis and
    ks_limbs' contraction axis are tp-sharded.  `tp` must divide
    (k+1)*l and kN*ks_t.
    """
    tp = mesh.shape["tp"]
    if params.trgsw_rows % tp or (params.kN * params.ks_t) % tp:
        raise ValueError(f"tp={tp} must divide TRGSW rows and kN*t")

    def fn(lwe, bk_local, ks_local):
        p = params
        n = p.n
        a, b = lwe[:, :n], lwe[:, n]
        bara = mod_switch_2n(a, p)
        barb = mod_switch_2n(b, p)
        acc0 = jnp.zeros((lwe.shape[0], p.k + 1, p.N), jnp.int32)
        acc0 = acc0.at[:, p.k, :].set(_rotated_test_vector(barb, mu, p))
        acc = blind_rotate_sharded(acc0, bara, bk_local, p, "tp")
        ext = sample_extract(acc, p)
        return _keyswitch_sharded(ext, ks_local, p, "tp")

    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P(None, "tp", None, None),
            P(None, "tp", None),
        ),
        out_specs=P("dp", None),
    )
    return jax.jit(mapped)


def shard_cloud_key(dck: DeviceCloudKey, mesh: Mesh):
    """Place bk/ks_limbs with their tp shardings (dp-replicated)."""
    bk = jax.device_put(
        dck.bk, NamedSharding(mesh, P(None, "tp", None, None))
    )
    ks = jax.device_put(
        dck.ks_limbs, NamedSharding(mesh, P(None, "tp", None))
    )
    return bk, ks


def shard_batch(lwe, mesh: Mesh):
    return jax.device_put(lwe, NamedSharding(mesh, P("dp", None)))
