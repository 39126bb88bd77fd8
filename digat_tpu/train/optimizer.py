"""Optimizer: Adam with parameter-group weight decay and global-norm clip.

Replicates the reference's optimizer semantics (trainer.py:25-32,103-105):

  * Adam(beta=0.9/0.999, eps=1e-8) — optax.scale_by_adam defaults;
  * L2-into-gradient weight decay (torch Adam style, not AdamW), masked off
    for parameter paths containing 'bias', 'embed' or belonging to the
    graph encoder (the reference's no_decay name groups);
  * gradient clipping by global norm *before* the decay term, matching
    torch's clip-on-.grad-then-step order;
  * learning rate divided by 10 at epoch E - ((E-1)//10 + 1) + 1
    (trainer.py:32,81) — supplied per-step as a scalar so one compiled step
    serves both phases.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

NO_DECAY_SUBSTRINGS = ("bias", "embed", "graph_encoder")


def decay_mask(params) -> Any:
    """True where weight decay applies."""

    def assign(path, _):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))).lower() for p in path]
        joined = "/".join(keys)
        # 'b' leaves are biases in this framework's linear params
        if keys and keys[-1] == "b":
            return False
        return not any(s in joined for s in NO_DECAY_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(assign, params)


def clip_by_global_norm_torch(max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics: scale by
    max_norm / (total_norm + 1e-6), clamped at 1. Differs from
    optax.clip_by_global_norm only by the 1e-6 in the denominator (a
    ~4e-7-relative difference whenever clipping engages) — functionally
    irrelevant for training, but the weight-transplant protocol check
    (scripts/parity/transplant.py) uses this to track the reference's
    trajectory exactly instead of to within chaos-amplified epsilon."""
    import jax.numpy as jnp

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        gnorm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (gnorm + 1e-6), 1.0)
        return jax.tree.map(lambda u: u * coef, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(weight_decay: float, gradient_clip_norm: float, params,
                   torch_compat_clip: bool = False):
    chain = []
    if gradient_clip_norm > 0:
        chain.append(
            clip_by_global_norm_torch(gradient_clip_norm)
            if torch_compat_clip
            else optax.clip_by_global_norm(gradient_clip_norm)
        )
    if weight_decay > 0:
        chain.append(
            optax.masked(
                optax.add_decayed_weights(weight_decay), decay_mask(params)
            )
        )
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)


def lr_at_epoch(base_lr: float, epoch: int, lr_decay_epoch: int) -> float:
    """lr/10 from the decay epoch on (1-indexed epochs)."""
    return base_lr / 10.0 if epoch >= lr_decay_epoch else base_lr
