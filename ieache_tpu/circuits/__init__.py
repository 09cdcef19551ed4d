from ieache_tpu.circuits import arith, words  # noqa: F401
