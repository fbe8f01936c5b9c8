"""Device-mesh parallelism: mesh construction, sharding rules, collectives.

The reference is single-device (`main.py:9-14`; no NCCL/MPI anywhere — see
SURVEY §2.4). This package is the TPU-native parallel layer it never had:
`jax.sharding.Mesh` over ICI, batch sharded on the 'data' axis, parameters
replicated (with a 'model' tensor-parallel axis expressible for headroom),
and XLA-inserted collectives (psum for gradient all-reduce).
"""

from avsync.parallel.mesh import (
    batch_sharding,
    lipnet_param_spec,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
)
from avsync.parallel import multihost

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "lipnet_param_spec",
    "param_sharding",
    "multihost",
]
