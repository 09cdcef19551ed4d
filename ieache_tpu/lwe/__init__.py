from ieache_tpu.lwe.types import (  # noqa: F401
    LweKey,
    TrlweKey,
    SecretKeySet,
    CloudKeySet,
    GateKeyPair,
)
from ieache_tpu.lwe import keygen, encrypt  # noqa: F401
