from ieache_tpu.ops import decompose, blind_rotate, keyswitch  # noqa: F401
