"""NRMS / NRMS-SA family (Appendix-B capability)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from digat_tpu import layers as L
from digat_tpu.config import Config
from digat_tpu.models.nrms import NRMSModel, NRMSTables


def tiny_cfg(**kw):
    base = dict(
        dataset="synthetic", vocabulary_size=200, category_num=4,
        max_history_num=6, max_title_length=8, model_family="nrms",
        nrms_head_num=4, nrms_head_dim=8, nrms_attention_dim=16,
        augmented_news_num=3, use_pallas=False,
    )
    base.update(kw)
    return Config(**base)


def make_tables(cfg, news_num=30, seed=0):
    rng = np.random.default_rng(seed)
    L_ = cfg.max_title_length
    return NRMSTables(
        news_title_text=jnp.asarray(
            rng.integers(1, cfg.vocabulary_size, (news_num, L_)), jnp.int32
        ),
        news_title_mask=jnp.asarray(rng.random((news_num, L_)) < 0.8),
        augmented_news=jnp.asarray(
            rng.integers(0, news_num, (news_num, cfg.augmented_news_num)),
            jnp.int32,
        ),
    )


def test_masked_mha_ignores_masked_keys():
    params = L.mha_init(jax.random.PRNGKey(0), 2, 8, 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    mask = jnp.array([[1, 1, 1, 0, 0]])
    out1 = L.mha(params, x, 2, key_mask=mask)
    x2 = x.at[0, 4].set(50.0)  # perturb a masked key
    out2 = L.mha(params, x2, 2, key_mask=mask)
    # masked key cannot influence unmasked queries' outputs
    np.testing.assert_allclose(
        np.asarray(out1[0, :3]), np.asarray(out2[0, :3]), atol=1e-5
    )


def test_nrms_forward_shapes_and_loss():
    from digat_tpu.models.model import TrainBatch

    cfg = tiny_cfg()
    model = NRMSModel(cfg)
    assert model.model_name == "NRMS-SA"
    tables = make_tables(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, H, K = 4, cfg.max_history_num, cfg.negative_sample_num
    batch = TrainBatch(
        history_idx=jnp.asarray(rng.integers(0, 30, (B, H)), jnp.int32),
        cat_idx=jnp.zeros((B, H), jnp.int32),
        sample_idx=jnp.asarray(rng.integers(0, 30, (B, 1 + K)), jnp.int32),
        weight=jnp.ones((B,), jnp.float32),
    )
    logits = model.forward_indexed(params, tables, batch, jax.random.PRNGKey(0), False)
    assert logits.shape == (B, 1 + K)
    loss, grads = jax.value_and_grad(model.loss)(
        params, tables, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    )
    assert gnorm > 0


def test_plain_nrms_has_no_sa_params():
    cfg = tiny_cfg(nrms_model="NRMS")
    model = NRMSModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "sa_attn" not in params and "sa_gate" not in params
    assert model.model_name == "NRMS"


def test_dual_cache_eval_matches_forward():
    """The dual-cache scorer must reproduce the train-forward candidate
    scores exactly (eval contract, Appendix-B/util.py:20-55)."""
    from digat_tpu.eval.scorer import NRMSCachedScorer
    from digat_tpu.models.model import TrainBatch

    cfg = tiny_cfg()
    model = NRMSModel(cfg)
    tables = make_tables(cfg)
    params = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    B, H = 4, cfg.max_history_num
    batch = TrainBatch(
        history_idx=jnp.asarray(rng.integers(0, 30, (B, H)), jnp.int32),
        cat_idx=jnp.zeros((B, H), jnp.int32),
        sample_idx=jnp.asarray(rng.integers(0, 30, (B, 1)), jnp.int32),
        weight=jnp.ones((B,), jnp.float32),
    )
    fwd = model.forward_indexed(params, tables, batch, jax.random.PRNGKey(0), False)

    scorer = NRMSCachedScorer(model, batch_size=16)
    scores = scorer.score_items(
        params, tables,
        np.asarray(batch.history_idx), np.asarray(batch.cat_idx),
        np.arange(B), np.asarray(batch.sample_idx[:, 0]),
    )
    np.testing.assert_allclose(scores, np.asarray(fwd[:, 0]), rtol=1e-4, atol=1e-5)


def test_nrms_e2e_cli(tmp_path):
    from digat_tpu import cli
    from digat_tpu.data import synthetic

    root = str(tmp_path)
    synthetic.generate(
        os.path.join(root, "data", "synthetic"), news_num=80, categories=3,
        train_behaviors=30, dev_behaviors=10, test_behaviors=10, users=10,
    )
    cfg = Config(
        dataset="synthetic", data_root=os.path.join(root, "data"),
        run_root=os.path.join(root, "runs"), model_family="nrms",
        epoch=1, batch_size=8, max_history_num=6, max_title_length=8,
        nrms_head_num=4, nrms_head_dim=8, nrms_attention_dim=16,
        augmented_news_num=3, eval_batch_size=32, use_pallas=False,
    )
    cli.run_train(cfg)
    run_dir = os.path.join(
        cfg.run_root, cfg.dataset, "NRMS-SA", f"#{cfg.run_index}"
    )
    assert os.path.exists(os.path.join(run_dir, "best.ckpt"))


def test_nrms_bf16_eval_actually_casts():
    """compute_dtype=bfloat16 must reach the NRMS scorer (round-3 ADVICE:
    score_items silently ran fp32). bf16 scores differ from fp32 but
    rank-agree at init scale, mirroring tests/test_bf16.py."""
    from digat_tpu.eval.scorer import NRMSCachedScorer

    cfg32, cfg16 = tiny_cfg(), tiny_cfg(compute_dtype="bfloat16")
    m32, m16 = NRMSModel(cfg32), NRMSModel(cfg16)
    tables = make_tables(cfg32)
    params = m32.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    B, H = 8, cfg32.max_history_num
    hist = rng.integers(0, 30, (B, H)).astype(np.int32)
    cat = np.zeros((B, H), np.int32)
    cand = rng.integers(0, 30, B).astype(np.int32)
    s32 = NRMSCachedScorer(m32, batch_size=16).score_items(
        params, tables, hist, cat, np.arange(B), cand
    )
    s16 = NRMSCachedScorer(m16, batch_size=16).score_items(
        params, tables, hist, cat, np.arange(B), cand
    )
    # the cast must actually change the numerics (not a silent fp32 run)...
    assert not np.array_equal(s32, s16)
    # ...but only by bf16 rounding, not by a wrong computation
    rel = np.abs(s16 - s32) / np.maximum(np.abs(s32), 1.0)
    assert rel.max() < 0.05, rel.max()
