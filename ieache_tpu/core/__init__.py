from ieache_tpu.core import poly  # noqa: F401
