"""The jitted, sharded training step.

One XLA program per run: value_and_grad over the listwise loss, optional
global-norm clip + Adam, lr applied as a scalar operand. Params and
optimizer state are donated, so the step updates in place on device.

Sharding follows the data (modern jit style): the trainer places params
with `parallel.mesh.param_shardings` (replicated; embedding optionally
row-sharded along `model`) and each batch with `batch_sharding` (split
along `data`), and jit propagates those placements — XLA inserts the
gradient all-reduce, the reference's DDP equivalent (trainer.py:19,102)
with zero user communication code."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from digat_tpu.models.model import Model


def make_train_step(model: Model, tx):
    """Returns jitted step(params, opt_state, tables, batch, rng, lr) ->
    (params, opt_state, loss)."""

    def step(params, opt_state, tables, batch, rng, lr):
        loss, grads = jax.value_and_grad(model.loss)(params, tables, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_shardmap_train_step(model: Model, tx, mesh, data_axis: str = "data"):
    """Data-parallel train step as an explicit `shard_map` over `data_axis`.

    This is the multi-chip path for the Pallas kernels: under plain jit,
    XLA's SPMD partitioner treats a pallas_call as an opaque custom call and
    REPLICATES it (all-gathering the batch onto every device — correct but
    unscaled). Inside shard_map each device traces its own kernel over the
    local batch shard, and the only collectives are the loss/gradient psums
    — exactly the reference's DDP all-reduce (trainer.py:19,102), made
    explicit.

    Contract: params / opt_state / tables replicated; every batch leaf
    sharded along its leading (batch) axis; dropout streams decorrelated
    per shard by folding the axis index into the rng. Loss is the global
    weighted mean (identical to the single-device step up to fp32
    reduction order).
    """
    from jax.sharding import PartitionSpec as P

    from digat_tpu.models.model import ShardedDedupBatch

    def step(params, opt_state, tables, batch, rng, lr):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        if isinstance(batch, ShardedDedupBatch):
            batch = batch.local()  # this shard's own unique-title batch

        def loss_fn(p):
            num, den = model.loss_parts(p, tables, batch, rng)
            num = jax.lax.psum(num, data_axis)
            den = jax.lax.psum(den, data_axis)
            return num / jnp.maximum(den, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, data_axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def specs_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    def wrapped(params, opt_state, tables, batch, rng, lr):
        sharded = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(
                specs_like(params, P()),
                specs_like(opt_state, P()),
                specs_like(tables, P()),
                specs_like(batch, P(data_axis)),
                P(),
                P(),
            ),
            out_specs=(
                specs_like(params, P()),
                specs_like(opt_state, P()),
                P(),
            ),
            check_vma=False,
        )
        return sharded(params, opt_state, tables, batch, rng, lr)

    return jax.jit(wrapped, donate_argnums=(0, 1))
