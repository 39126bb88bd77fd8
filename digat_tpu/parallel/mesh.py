"""Device mesh construction and sharding layouts.

The reference's parallelism is DDP over NCCL (config.py:89, trainer.py:19).
Here the entire story is one `jax.sharding.Mesh` with axes:

  * `data`  — batch dimension; gradients all-reduce over ICI/DCN because
    the jitted loss contracts a data-sharded batch against replicated
    params (XLA inserts the psum — no user-level collective code);
  * `model` — optional row-sharding of the word-embedding table (and any
    future large table); lookups become sharded gathers for which SPMD
    emits the all-to-all/all-gather exchange.

Multi-host: call `jax.distributed.initialize()` per process before building
the mesh; every host runs the same program and feeds its own strided data
shard (data/batching.py)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (the reference's dist.init_process_group
    equivalent, config.py:89). On TPU pods with default env vars all
    arguments resolve automatically; no-op when already initialized or
    single-process with no coordinator configured."""
    # NB: must not touch the XLA backend (jax.process_count() etc.) before
    # jax.distributed.initialize, or the rendezvous is refused
    if jax.distributed.is_initialized():
        return
    import os

    explicit = coordinator_address is not None or num_processes is not None
    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
        explicit = True
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise  # a configured rendezvous that fails must not be silent
        # single-process / already-initialized environments: fine


def make_mesh(data: int = 0, model: int = 1, devices=None) -> Mesh:
    """`data=0` means: use all devices not consumed by `model`."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if data <= 0:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis of every batch array is split along `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, shard_embedding: bool = True):
    """Params replicated, except the word-embedding table which row-shards
    along `model` when that axis is real."""
    repl = replicated(mesh)
    if mesh.shape[MODEL_AXIS] == 1 or not shard_embedding:
        return jax.tree.map(lambda _: repl, params)
    emb = NamedSharding(mesh, P(MODEL_AXIS, None))

    def assign(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "word_embedding" in keys:
            return emb
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_batch_arrays(mesh: Optional[Mesh], batch):
    """device_put a batch pytree with data-axis sharding (or default
    placement when no mesh). The sorted embedding-gradient metadata of a
    DedupTrainBatch (`emb`) is batch-global — its arrays are work lists,
    not per-sample rows — so it is replicated.

    Multi-process: every process holds only ITS batch rows, so the global
    array is assembled from per-process local shards (the DDP per-rank
    batch contract, reference trainer.py:75-80) — the global batch dim is
    local_rows x process_count."""
    if mesh is None:
        return jax.device_put(batch)
    from digat_tpu.models.model import ShardedDedupBatch

    emb = getattr(batch, "emb", None)
    if isinstance(batch, ShardedDedupBatch):
        # per-shard dedup: EVERY leaf (including the per-shard emb-grad
        # work lists) is stacked on the shard axis and splits along `data`
        emb = None
    rows = batch if emb is None else batch._replace(emb=None)
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        nproc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sh, x, (x.shape[0] * nproc,) + x.shape[1:]
            )

        rows = jax.tree.map(put, rows)
    else:
        rows = jax.device_put(rows, sh)
    if emb is None:
        return rows
    return rows._replace(emb=jax.device_put(emb, replicated(mesh)))
