"""A/B the B=64 train step on the chip between env-gated code variants.

Reuses profile_trace.build_step (the production train step with dedup and
kernels) and the bench.py two-point marginal method. The variant under
test is selected by env vars read at import (e.g. DIGAT_FUSED_Y), so each
arm runs in its own process:

    DIGAT_FUSED_Y=0 python scripts/ab_train_step.py
    DIGAT_FUSED_Y=1 python scripts/ab_train_step.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from profile_trace import build_step  # noqa: E402


def main():
    run = build_step()
    t0 = time.time()
    run(2)
    print(f"compile {time.time() - t0:.1f}s", flush=True)
    est = []
    for _ in range(7):
        t0 = time.time(); run(4); t1 = time.time() - t0
        t0 = time.time(); run(54); t2 = time.time() - t0
        est.append((t2 - t1) / 50)
    ms = float(np.median(est)) * 1e3
    print(f"train step B=64: {ms:.2f} ms  ({64 / (ms / 1e3):,.0f} samples/s)"
          f"  [DIGAT_FUSED_Y={os.environ.get('DIGAT_FUSED_Y', '0')}]",
          flush=True)


if __name__ == "__main__":
    main()
