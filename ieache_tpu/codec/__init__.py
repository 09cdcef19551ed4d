from ieache_tpu.codec import files  # noqa: F401
