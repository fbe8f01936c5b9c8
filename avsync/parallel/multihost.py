"""Multi-host (multi-controller) execution support.

The reference is strictly single-process, single-device (`main.py:9-14`;
no NCCL/MPI/torch.distributed anywhere — SURVEY §2.4). TPU pods beyond one
host are multi-controller by construction: every host runs the SAME Python
program, owns a subset of the chips, and jitted programs execute SPMD over
the global `jax.sharding.Mesh` with XLA collectives riding ICI/DCN. This
module is the thin seam that makes the rest of avsync (trainers, batcher,
mesh helpers) work unchanged in that regime:

  * `initialize()` — wraps `jax.distributed.initialize`, plus the config
    knobs needed to SIMULATE a multi-host topology with several CPU
    processes on one machine (how tests/test_multihost.py exercises this
    without a pod: 2 processes x 4 virtual CPU devices = 8-device mesh,
    gloo collectives).
  * `put_with_sharding(x, sharding)` — the one primitive the framework
    needs: place a host value onto a (possibly non-addressable) sharding.
    Single-process it is exactly `jax.device_put`. Multi-process, `x` must
    be the FULL logical value on every process (each host runs identical
    data code — the batcher's epoch order is a seeded permutation, so this
    holds by construction); each process extracts and uploads only the
    shards its own devices own, and the global `jax.Array` is assembled
    with `make_array_from_single_device_arrays`. No contiguity or layout
    assumption: the sharding's own index map decides what is local.

Scope: LipNet training (streamed, device-cached, and whole-epoch-scanned)
and Orbax checkpointing are multi-controller ready (tests/test_multihost.py
runs all of them on a simulated 2-process pod). The misalignment-detector
pipeline assumes a single controller: its whole working set (a ~180 MB
feature bank at the reference's production scale) fits one host and its
AUROC evaluation fetches per-sample probabilities to the host — sharding it
across hosts would add collectives to save nothing. Per-host input decode
IS sharded (LipNetBatcher._local_rows): each host decodes only the rows its
own devices hold.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_multiprocess",
    "put_with_sharding",
    "get_global",
    "any_process_flagged",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    simulate_cpu_devices: Optional[int] = None,
) -> int:
    """Join (or start) a multi-controller run. Returns this process's index.

    On a real TPU pod all arguments are optional — `jax.distributed` reads
    the cluster environment (TPU metadata, SLURM, etc.). For CPU simulation
    pass all three plus `simulate_cpu_devices` (virtual CPU devices per
    process); collectives then run over gloo. Must be called before any JAX
    backend use (the session preloads jax, so we use jax.config.update, not
    env vars — see tests/conftest.py for the same trap).
    """
    if simulate_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(simulate_cpu_devices))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    explicit = (coordinator_address, num_processes, process_id)
    if any(a is not None for a in explicit) and any(
        a is None for a in explicit
    ):
        raise ValueError(
            "pass coordinator_address, num_processes and process_id "
            "together (got a partial set — jax.distributed cannot mix "
            "explicit and autodetected cluster parameters)"
        )
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError as e:
        raise ValueError(
            "jax.distributed could not autodetect a cluster (TPU pod "
            "metadata / SLURM). Either run on a pod, or pass "
            "coordinator_address/num_processes/process_id explicitly "
            f"(avsync.parallel.multihost.initialize). Original error: {e}"
        ) from e
    return jax.process_index()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_with_sharding(x: Any, sharding) -> jax.Array:
    """Place host value `x` onto `sharding`, multi-controller-safe.

    Single-process (or a sharding whose devices are all local): plain
    `jax.device_put`. Multi-process: `x` is the full logical value on every
    process; upload only the addressable shards and assemble the global
    array. Works for any PartitionSpec — replicated params, 'data'-sharded
    batches, 'model'-sharded tensor-parallel columns — because the
    sharding's `addressable_devices_indices_map` is the source of truth.
    """
    if getattr(sharding, "is_fully_addressable", True):
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array (e.g. the batcher's device-preprocessed
        # video, sharded by the preprocess jit's out_shardings) — it cannot
        # be fetched to host, and it does not need to be: jit consumes it
        # directly (resharding on the same mesh if specs differ)
        return x
    x = np.asarray(x)
    shards = [
        jax.device_put(x[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            x.shape
        ).items()
    ]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, shards)


# Per-device-set program caches. A fresh `jax.jit(lambda ...)` wrapper has
# its own trace cache, so building one per call would retrace every call —
# and the vote runs every PREEMPT_CHECK_EVERY batches.
_REPLICATE_CACHE: dict = {}
_VOTE_CACHE: dict = {}


def get_global(tree: Any, mesh) -> Any:
    """Fetch a pytree of (possibly sharded) global arrays to host numpy.

    Single-process this is `jax.device_get`. Multi-controller, leaves that
    are sharded over non-addressable devices (e.g. tensor-parallel gate
    columns) cannot be fetched directly — they are first all-gathered to a
    fully-replicated layout by an identity jit, then read from the local
    replica. Every process receives the full value (checkpointing and
    best-snapshot paths need it everywhere)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.sharding import NamedSharding, PartitionSpec

    key = (tuple(mesh.devices.reshape(-1)), mesh.axis_names)
    replicate = _REPLICATE_CACHE.get(key)
    if replicate is None:
        rep = NamedSharding(mesh, PartitionSpec())
        replicate = jax.jit(lambda v: v, out_shardings=rep)
        _REPLICATE_CACHE[key] = replicate

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if not x.is_fully_replicated:
                x = replicate(x)
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


def any_process_flagged(flag: bool, mesh) -> bool:
    """True iff ANY process passes flag=True — a lockstep cross-host vote.

    For control-flow decisions that every host must take identically (e.g.
    'stop training now' on preemption): a process-local flag lets hosts
    diverge — the signaled one exits the epoch loop while another enters
    the next collective and deadlocks. All processes call this at the same
    boundary; the vote is a tiny max-reduce over a per-device array (each
    process contributes its flag on its own devices), so every process
    returns the same answer. Single-process it is just `flag`."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    import jax.numpy as jnp

    devs = tuple(mesh.devices.reshape(-1))
    cached = _VOTE_CACHE.get(devs)
    if cached is None:
        flat = Mesh(np.asarray(devs), ("all",))
        sh = NamedSharding(flat, PartitionSpec("all"))
        rep = NamedSharding(flat, PartitionSpec())
        prog = jax.jit(lambda v: jnp.max(v), out_shardings=rep)
        cached = (sh, prog)
        _VOTE_CACHE[devs] = cached
    sh, prog = cached
    mine = [d for d in devs if d.process_index == jax.process_index()]
    votes = jax.make_array_from_single_device_arrays(
        (len(devs),), sh,
        [jax.device_put(np.asarray([np.float32(flag)]), d) for d in mine],
    )
    return bool(float(prog(votes)) >= 0.5)
