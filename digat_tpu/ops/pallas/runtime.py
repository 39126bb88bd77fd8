"""Pallas runtime gating.

Every kernel in this package is a TPU Mosaic kernel; off-TPU the callers
fall back to the equivalent XLA expression. Setting
`DIGAT_PALLAS_INTERPRET=1` (read once at import) instead runs the kernels
in Pallas interpret mode on any backend — functionally exact, slow — which
lets the multi-chip dryrun and the sharding tests validate the kernels'
SPMD composition on a virtual CPU mesh without TPU hardware.
"""

from __future__ import annotations

import os

import jax

INTERPRET = os.environ.get("DIGAT_PALLAS_INTERPRET", "0") == "1"


def set_interpret(on: bool) -> None:
    """Flip interpret mode at runtime (used by the multichip dryrun to
    exercise the kernels' SPMD composition on a CPU mesh). Call before the
    first trace; kernels read the flag at call time."""
    global INTERPRET
    INTERPRET = bool(on)


def pallas_available() -> bool:
    """True when pallas_call may be emitted (real TPU or interpret mode)."""
    return jax.default_backend() == "tpu" or INTERPRET
