"""Checkpointing: params + optimizer state + epoch, resumable.

The reference saves model weights only, on each new best dev epoch
(trainer.py:169-170) — training cannot resume mid-run. Here the whole
training state round-trips through flax.serialization msgpack bytes, so a
killed run restarts from its last best checkpoint with optimizer moments
intact. Loading restores into freshly-initialized target structures
(model.init / tx.init), the standard functional-checkpoint contract."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save(path: str, params: Any, opt_state: Any, epoch: int) -> None:
    state = {
        "params": serialization.to_state_dict(jax.tree.map(np.asarray, params)),
        "opt_state": serialization.to_state_dict(
            jax.tree.map(np.asarray, opt_state)
        ),
        "epoch": epoch,
    }
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load(
    path: str,
    params_target: Optional[Any] = None,
    opt_state_target: Optional[Any] = None,
) -> Tuple[Any, Any, int]:
    """Targets give back the original pytree structure (lists, NamedTuple
    optax states); without a target the raw state dict is returned."""
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = state["params"]
    opt_state = state["opt_state"]
    if params_target is not None:
        params = serialization.from_state_dict(params_target, params)
    if opt_state_target is not None:
        opt_state = serialization.from_state_dict(opt_state_target, opt_state)
    return params, opt_state, int(state["epoch"])
