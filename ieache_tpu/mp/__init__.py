from ieache_tpu.mp import dragonfly, keywrap  # noqa: F401
