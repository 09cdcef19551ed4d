from ieache_tpu.boot.bootstrap import (  # noqa: F401
    DeviceCloudKey,
    pack_cloud_key,
)
from ieache_tpu.boot import gates  # noqa: F401

# NOTE: the `bootstrap`/`bootstrap_no_ks` functions live in
# ieache_tpu.boot.bootstrap; they are intentionally not re-exported here
# so that `ieache_tpu.boot.bootstrap` keeps naming the submodule.
