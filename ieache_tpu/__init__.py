"""ieache_tpu — a TPU-native TFHE gate-bootstrapping framework.

A from-scratch rebuild of the capabilities of kennethsoh/IE-ACHE
(homomorphic evaluation of 2-3 operand integer expressions over TFHE
gate bootstrapping, with a multi-party Keygen/Client/Cloud/Output
protocol), re-designed TPU-first:

* the TFHE primitive layer (the external C library the reference links
  as ``-ltfhe-spqlios-fma``; interface used at
  ``/root/reference/Cloud/cloud.c:24-46``) is re-implemented natively
  on top of JAX/XLA with the hot path expressed as int8 MXU matmuls
  (see :mod:`ieache_tpu.core.poly` and :mod:`ieache_tpu.ops`);
* the homomorphic circuit library (``Cloud/cloud.c:18-647``) becomes
  batched circuits over a leading expression axis
  (:mod:`ieache_tpu.circuits`);
* the multi-party transport/key plane (Dragonfly SAE + AES key wrap +
  ASN.1 BER messaging) lives in :mod:`ieache_tpu.mp` and
  :mod:`ieache_tpu.codec`;
* multi-chip scaling via ``jax.sharding`` meshes in
  :mod:`ieache_tpu.dist`.
"""

__version__ = "0.1.0"

from ieache_tpu.params import (  # noqa: F401
    TFHEParams,
    IEACHE_110,
    IEACHE_110_TFHE_COMPAT,
    TEST_TINY,
)
