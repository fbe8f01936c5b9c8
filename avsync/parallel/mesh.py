"""Mesh construction and sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs
and parameters, let XLA insert the collectives, profile, iterate.

  * Axes: ('data', 'model'). Data parallelism is the primary strategy for
    this 12.5M-param model — the batch shards over 'data' and gradients
    all-reduce over ICI. 'model' is the tensor-parallel axis: the GRU gate
    matrices and the CTC head shard over it when mesh_shape[1] > 1 (design
    headroom per SURVEY §2.4 — not needed at this size, but expressible).
  * All shardings are `NamedSharding(mesh, PartitionSpec(...))` so a jitted
    step compiles identically on 1 real TPU, a v5e-8 slice, or 8 virtual CPU
    devices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"


def make_mesh(
    shape: Tuple[int, int] = (-1, 1),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. shape=(-1, m) assigns all remaining
    devices to the data axis.

    Multi-slice: under the standard JAX multi-slice runtime, `jax.devices()`
    spans slices and this same mesh construction applies — put 'data' as the
    outer (DCN-crossing) axis and keep 'model' inside a slice so tensor
    collectives ride ICI; gradient all-reduce then hierarchically reduces
    over ICI before crossing DCN (XLA handles the decomposition).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    d, m = shape
    if d == -1:
        assert n % m == 0, f"{n} devices not divisible by model={m}"
        d = n // m
    assert d * m == n, f"mesh {d}x{m} != {n} devices"
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_hierarchical_mesh(
    shape: Tuple[int, int, int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-level ('slice', 'data', 'model') mesh for multi-slice topologies.

    'slice' is the outer, DCN-crossing axis; 'data' and 'model' stay inside
    a slice so their collectives ride ICI. The batch shards over
    ('slice', 'data') jointly (see `batch_sharding`), and XLA decomposes the
    gradient all-reduce hierarchically: reduce-scatter/all-gather over ICI
    within each slice, then the small cross-slice reduce over DCN. On real
    multi-slice hardware `jax.devices()` spans slices in slice-major order,
    which is exactly the reshape below.
    """
    devices = list(devices if devices is not None else jax.devices())
    s, d, m = shape
    assert s * d * m == len(devices), (
        f"mesh {s}x{d}x{m} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(s, d, m)
    return Mesh(arr, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data' (jointly with 'slice' when the mesh
    is hierarchical)."""
    if SLICE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((SLICE_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree onto the mesh, sharded over 'data'.

    Multi-controller safe: when the mesh spans processes, each process
    uploads only its own rows (see parallel.multihost.put_with_sharding)."""
    from avsync.parallel.multihost import put_with_sharding

    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: put_with_sharding(x, s), batch)


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

def lipnet_param_spec(params: Any, model_axis_size: int = 0) -> Any:
    """PartitionSpec tree for LipNet params.

    Tensor-parallel rule (active when the 'model' axis size > 1):
      * GRU/LSTM input/hidden projections shard their 3H output columns over
        'model' — each shard computes a slice of the gates; biases shard
        alike. (The recurrent matmul then needs its H input gathered; XLA
        inserts the all-gather.)
      * The CTC head ('fc') shards its vocab output columns when divisible
        (vocab=39 is not for typical axis sizes — it stays replicated then).
      * Conv kernels stay replicated (tiny).
    With model=1 every spec collapses to full replication. Dims that are not
    divisible by `model_axis_size` fall back to replication (pass 0 to skip
    the divisibility check and emit the idealized spec).
    """

    def ok(leaf, dim: int) -> bool:
        if model_axis_size <= 1:
            return model_axis_size == 0
        return leaf.shape[dim] % model_axis_size == 0

    def spec_for(path: Tuple, leaf) -> P:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        name = "/".join(str(k) for k in keys)
        ndim = getattr(leaf, "ndim", 0)
        if "gru" in name or "lstm" in name:
            if ndim == 2:  # (D, 3H) / (H, 3H)
                return P(None, MODEL_AXIS) if ok(leaf, 1) else P()
            return P(MODEL_AXIS) if ok(leaf, 0) else P()  # (3H,) biases
        if name.endswith("fc/kernel"):
            return P(None, MODEL_AXIS) if ok(leaf, 1) else P()
        if name.endswith("fc/bias"):
            return P(MODEL_AXIS) if ok(leaf, 0) else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_sharding(mesh: Mesh, params: Any) -> Any:
    size = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        lipnet_param_spec(params, model_axis_size=size),
        is_leaf=lambda x: isinstance(x, P),
    )
