"""Fused MSA news-encoder kernel vs the unfused composition.

Interpret-mode parity (runs on CPU) for the forward pooled output and for
every parameter/input gradient, including the all-masked-title edge case
(reference semantics: masked_softmax passes no gradient through masked
logits — layers.py:91-115)."""

import jax
import jax.numpy as jnp
import pytest

from digat_tpu import layers as L
from digat_tpu.ops.pallas.msa_attention_grouped import unpad_heads
from digat_tpu.ops.pallas.msa_encoder import msa_encoder_pooled

HEADS, DK, LT, DIN, A = 16, 25, 32, 300, 256

# fp32-exact parity requires the CPU backend: under DIGAT_TPU_TESTS=1 the
# unfused reference itself runs DEFAULT-precision (bf16) MXU matmuls and
# drifts ~1e-3 from the interpret-mode kernel. Hardware parity at the
# appropriate tolerance is covered by
# test_kernels_tpu.py::test_msa_encoder_fused_vs_unfused.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="CPU fp32 parity test"
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    msa = L.mha_init(ks[0], HEADS, DIN, DK, DK)
    pool = L.attn_pool_init(ks[1], HEADS * DK, A)
    n = 24
    x = jax.random.normal(ks[2], (n, LT, DIN))  # O(1) scale: saturates pools
    mask = jax.random.uniform(ks[3], (n, LT)) < 0.75
    mask = mask.at[0].set(False)  # all-pad title
    cvec = jax.random.normal(ks[4], (n, HEADS * DK))
    return msa, pool, x, mask, cvec


def _ref(msa, pool, x, mask):
    h = jax.nn.relu(L.mha(msa, x, HEADS))
    return L.attn_pool(pool, h, mask=mask)


def _fused(msa, pool, x, mask):
    p, _ = msa_encoder_pooled(x, mask, msa, pool, HEADS, DK,
                              tile=8, interpret=True)
    return unpad_heads(p, HEADS, DK)


def test_forward_parity(setup):
    msa, pool, x, mask, _ = setup
    r = _ref(msa, pool, x, mask)
    f = _fused(msa, pool, x, mask)
    assert float(jnp.max(jnp.abs(r - f))) < 1e-5 * float(jnp.max(jnp.abs(r)) + 1)


def test_grad_parity(setup):
    msa, pool, x, mask, cvec = setup

    def loss(fn, params):
        m, p, xx = params
        return jnp.sum(fn(m, p, xx, mask) * cvec)

    gr = jax.grad(lambda p: loss(_ref, p))((msa, pool, x))
    gf = jax.grad(lambda p: loss(_fused, p))((msa, pool, x))

    def check(a, b):
        scale = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * (scale + 1e-3), (
            f"grad mismatch: scale={scale}"
        )

    jax.tree.map(check, gr, gf)


def test_padded_tail_rows_are_exact(setup):
    """Batch padding inside the kernel must not change real rows."""
    msa, pool, x, mask, _ = setup
    f_all = _fused(msa, pool, x, mask)
    f_head = _fused(msa, pool, x[:9], mask[:9])  # forces padding to tile=8*2
    assert float(jnp.max(jnp.abs(f_all[:9] - f_head))) < 1e-6
