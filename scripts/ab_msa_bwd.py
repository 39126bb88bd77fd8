"""Isolated A/B of the fused MSA-encoder backward kernel variants
(round-5 item 6; see msa_encoder._bwd_kernel_v2).

Times fwd and fwd+bwd of msa_encoder_pooled at the production training
shape (~10k deduped titles x L=32 x Din=300, in-kernel dropout on) with
the bench.py device-loop marginal method. Variant selected by
DIGAT_MSA_BWD at import:

    DIGAT_MSA_BWD=v1 python scripts/ab_msa_bwd.py
    DIGAT_MSA_BWD=v2 python scripts/ab_msa_bwd.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from digat_tpu import layers as L
from digat_tpu.ops.pallas.msa_attention_grouped import unpad_heads
from digat_tpu.ops.pallas.msa_encoder import msa_encoder_pooled

HEADS, DK, LT, DIN, A = 16, 25, 32, 300, 256
N = 10240


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    msa = L.mha_init(ks[0], HEADS, DIN, DK, DK)
    pool = L.attn_pool_init(ks[1], HEADS * DK, A)
    x = jax.random.normal(ks[2], (N, LT, DIN))
    mask = jax.random.uniform(ks[3], (N, LT)) < 0.8
    cvec = jax.random.normal(ks[4], (N, HEADS * DK))
    seed = jnp.zeros((1,), jnp.int32)

    def fwd_loss(msa, pool, x):
        p, _ = msa_encoder_pooled(
            x, mask, msa, pool, HEADS, DK, precision="default",
            dropout_rate=0.2, dropout_seed=seed,
        )
        return jnp.sum(unpad_heads(p, HEADS, DK) * cvec)

    grad_fn = jax.grad(fwd_loss, argnums=(0, 1, 2))

    def make_run(fn, *args):
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, x, *rest):
            def body(i, carry):
                out = fn(carry[0], *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(jnp.abs(l)) for l in leaves)
                return (carry[0] * (1.0 + 1e-12 * bump),) + carry[1:]

            return jax.lax.fori_loop(0, n, body, (x,) + args[1:])[0]

        def run(n):
            return float(jnp.sum(run_n(n, *args)))

        return run

    fwd_run = make_run(lambda x: fwd_loss(msa, pool, x), x)
    bwd_run = make_run(lambda x: grad_fn(msa, pool, x), x)

    for name, run in (("fwd", fwd_run), ("fwd+bwd", bwd_run)):
        t0 = time.time()
        run(2)
        print(f"[ab] {name} compile {time.time() - t0:.1f}s", flush=True)
        est = []
        for _ in range(5):
            t0 = time.time(); run(3); t1 = time.time() - t0
            t0 = time.time(); run(23); t2 = time.time() - t0
            est.append((t2 - t1) / 20)
        ms = float(np.median(est)) * 1e3
        print(f"[ab] {name}: {ms:.2f} ms  "
              f"[DIGAT_MSA_BWD={os.environ.get('DIGAT_MSA_BWD', 'v1')}]",
              flush=True)


if __name__ == "__main__":
    main()
