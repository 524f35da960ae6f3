"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL layer
(`tools/train.py:88-120`, `torchie/apis/train.py:286-293`): one JAX process
group over ICI/DCN, a 1-D data-parallel mesh, batch arrays sharded on the
'dp' axis, parameters/optimizer state replicated. Gradient all-reduce and
cross-replica BatchNorm statistics are compiler-inserted collectives — there
is no explicit NCCL-style call site. Scaling to multi-host follows from
`jax.distributed.initialize` + the same mesh over all devices.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="dp"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh, axis_name="dp"):
    """Place a host batch (pytree of arrays, leading dim = global batch)
    sharded across the mesh's data axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
