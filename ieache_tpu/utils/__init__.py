from ieache_tpu.utils import prng  # noqa: F401
