from ieache_tpu.dist import mesh, shard  # noqa: F401
