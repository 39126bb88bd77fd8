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
