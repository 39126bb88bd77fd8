"""Structural tests for the torch-checkpoint converter (digat_tpu/interop.py).

Hermetic (no torch): builds numpy mappings with the reference's state_dict
names/shapes (reference model.py:7-41, graphEncoders.py:48-843,
Appendix-B/model.py:7-22) and asserts the converted pytree matches the
corresponding digat_tpu ``Model.init`` tree exactly — same treedef, same
shapes — and that strict accounting rejects missing/extra/duplicate
tensors. Numerical equivalence against the executable reference is covered
by scripts/parity/transplant.py (docs/TRANSPLANT.json)."""

import numpy as np
import jax
import pytest

from digat_tpu import interop
from digat_tpu.config import Config
from digat_tpu.models.model import Model
from digat_tpu.models.nrms import NRMSModel

GEO = dict(
    word_embedding_dim=24, MSA_head_num=4, MSA_head_dim=8,
    cnn_kernel_num=30, attention_dim=16, max_title_length=8,
    max_history_num=6, SAG_neighbors=3, SAG_hops=2, graph_depth=2,
    vocabulary_size=50, category_num=4, user_num=5, use_pallas=False,
)


def _cfg(variant="DIGAT", news_encoder="MSA", **over):
    kw = dict(GEO)
    kw.update(over)
    return Config(news_encoder=news_encoder, graph_encoder=variant, **kw).validate()


def _lin(rng, d_out, d_in, bias=True, prefix=""):
    sd = {f"{prefix}.weight": rng.normal(size=(d_out, d_in))}
    if bias:
        sd[f"{prefix}.bias"] = rng.normal(size=(d_out,))
    return sd


def _sdp(rng, d, prefix):
    return {**_lin(rng, d, d, bias=False, prefix=f"{prefix}.K"),
            **_lin(rng, d, d, prefix=f"{prefix}.Q")}


def _pool(rng, d, a, prefix):
    return {**_lin(rng, a, d, prefix=f"{prefix}.affine1"),
            **_lin(rng, 1, a, bias=False, prefix=f"{prefix}.affine2")}


def _mha(rng, d_model, hd, prefix):
    return {**_lin(rng, hd, d_model, bias=False, prefix=f"{prefix}.W_K"),
            **_lin(rng, hd, d_model, prefix=f"{prefix}.W_Q"),
            **_lin(rng, hd, d_model, prefix=f"{prefix}.W_V")}


def _gat_interactive(rng, d, depth, prefix):
    sd = {}
    for i in range(depth):
        sd.update(_lin(rng, d, d, prefix=f"{prefix}_W.{i}"))
        sd.update(_lin(rng, d, d, bias=False, prefix=f"{prefix}_ffn1.{i}"))
        sd.update(_lin(rng, d, d, bias=False, prefix=f"{prefix}_ffn2.{i}"))
        sd.update(_lin(rng, d, d, prefix=f"{prefix}_ffn3.{i}"))
        sd.update(_lin(rng, 1, d, bias=False, prefix=f"{prefix}_a.{i}"))
    return sd


def _gat_vanilla(rng, d, depth, prefix):
    sd = {}
    for i in range(depth):
        sd.update(_lin(rng, d, d, prefix=f"{prefix}_W.{i}"))
        sd.update(_lin(rng, 1, d, bias=False, prefix=f"{prefix}_a1.{i}"))
        sd.update(_lin(rng, 1, d, bias=False, prefix=f"{prefix}_a2.{i}"))
    return sd


def reference_state_dict(cfg: Config, rng) -> dict:
    d = cfg.news_embedding_dim
    wd, a, depth = cfg.word_embedding_dim, cfg.attention_dim, cfg.graph_depth
    sd = {"news_encoder.word_embedding.weight":
          rng.normal(size=(cfg.vocabulary_size, wd))}
    sd.update(_pool(rng, d, a, "news_encoder.attention"))
    if cfg.news_encoder == "MSA":
        sd.update(_mha(rng, wd, d, "news_encoder.multiheadSelfattention"))
    else:
        sd[f"news_encoder.conv.conv.weight"] = rng.normal(
            size=(cfg.cnn_kernel_num, wd, cfg.cnn_window_size))
        sd[f"news_encoder.conv.conv.bias"] = rng.normal(size=(cfg.cnn_kernel_num,))
    g = "graph_encoder"
    sd[f"{g}.topic_node_embedding"] = rng.normal(size=(cfg.category_num, d))
    if cfg.graph_encoder != "wo_SA":
        sd.update(_sdp(rng, d, f"{g}.candidate_attention"))
        sd.update(_lin(rng, d, 2 * d, prefix=f"{g}.news_graph_W"))
    sd.update(_lin(rng, d, d, bias=False, prefix=f"{g}.user_news_K"))
    sd.update(_lin(rng, d, d, prefix=f"{g}.user_news_Q"))
    sd.update(_lin(rng, d, d, prefix=f"{g}.featureAffine"))
    sd.update(_sdp(rng, d, f"{g}.userAttention"))
    news_gat, user_gat = interop._VARIANT_GATS[cfg.graph_encoder]
    if news_gat == "interactive":
        sd.update(_gat_interactive(rng, d, depth, f"{g}.news_graph_attention"))
    elif news_gat == "vanilla":
        sd.update(_gat_vanilla(rng, d, depth, f"{g}.news_graph_attention"))
    if user_gat == "interactive":
        sd.update(_gat_interactive(rng, d, depth, f"{g}.user_graph_attention"))
    else:
        sd.update(_gat_vanilla(rng, d, depth, f"{g}.user_graph_attention"))
    return sd


@pytest.mark.parametrize("variant", interop._VARIANT_GATS)
def test_digat_tree_structure(variant):
    cfg = _cfg(variant)
    sd = reference_state_dict(cfg, np.random.default_rng(0))
    params = interop.torch_to_params(sd, cfg)
    want = Model(cfg).param_template()
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    want_shapes = jax.tree.map(lambda x: tuple(x.shape), want)
    assert got_shapes == want_shapes


def test_cnn_tree_structure():
    cfg = _cfg("DIGAT", news_encoder="CNN")
    sd = reference_state_dict(cfg, np.random.default_rng(0))
    params = interop.torch_to_params(sd, cfg)
    want = Model(cfg).param_template()
    assert jax.tree.map(lambda x: tuple(x.shape), params) == jax.tree.map(
        lambda x: tuple(x.shape), want)
    # kernel layout [width, in, out]
    w = params["news_encoder"]["conv"]["convs"][0]["w"]
    assert w.shape == (cfg.cnn_window_size, cfg.word_embedding_dim,
                       cfg.cnn_kernel_num)


def test_strict_accounting():
    cfg = _cfg("DIGAT")
    sd = reference_state_dict(cfg, np.random.default_rng(0))
    missing = dict(sd)
    missing.pop("graph_encoder.user_news_K.weight")
    with pytest.raises(KeyError):
        interop.torch_to_params(missing, cfg)
    extra = dict(sd, **{"graph_encoder.bogus.weight": np.zeros((2, 2))})
    with pytest.raises(ValueError):
        interop.torch_to_params(extra, cfg)


def test_linear_transposes():
    cfg = _cfg("DIGAT")
    sd = reference_state_dict(cfg, np.random.default_rng(0))
    params = interop.torch_to_params(sd, cfg)
    np.testing.assert_array_equal(
        params["graph_encoder"]["user_ctx"]["K"]["w"],
        sd["graph_encoder.user_news_K.weight"].T,
    )
    np.testing.assert_array_equal(
        params["graph_encoder"]["news_gat"]["a"]["w"][1],
        sd["graph_encoder.news_graph_attention_a.1.weight"].T,
    )


def _nrms_cfg(model="NRMS-SA"):
    return Config(
        model_family="nrms", nrms_model=model, nrms_head_num=4,
        nrms_head_dim=8, nrms_attention_dim=16, augmented_news_num=3,
        word_embedding_dim=24, max_title_length=8, max_history_num=6,
        vocabulary_size=50, category_num=4, user_num=5, use_pallas=False,
    ).validate()


@pytest.mark.parametrize("model", ["NRMS", "NRMS-SA"])
def test_nrms_tree_structure(model):
    cfg = _nrms_cfg(model)
    d = cfg.nrms_head_num * cfg.nrms_head_dim
    rng = np.random.default_rng(0)
    sd = {"news_encoder.word_embedding.weight":
          rng.normal(size=(cfg.vocabulary_size, cfg.word_embedding_dim))}
    sd.update(_mha(rng, cfg.word_embedding_dim, d, "news_encoder.multiheadAttention"))
    sd.update(_pool(rng, d, cfg.nrms_attention_dim, "news_encoder.attention"))
    sd.update(_mha(rng, d, d, "user_encoder.multiheadAttention"))
    sd.update(_pool(rng, d, cfg.nrms_attention_dim, "user_encoder.attention"))
    if model == "NRMS-SA":
        sd.update(_sdp(rng, d, "news_encoder.SA_attention"))
        sd.update(_lin(rng, d, 2 * d, prefix="news_encoder.SA_transformation"))
    # aliased duplicates the reference state_dict carries (shared module)
    sd["user_encoder.news_encoder.word_embedding.weight"] = sd[
        "news_encoder.word_embedding.weight"]
    params = interop.torch_to_nrms_params(sd, cfg)
    want = NRMSModel(cfg).param_template()
    assert jax.tree.map(lambda x: tuple(x.shape), params) == jax.tree.map(
        lambda x: tuple(x.shape), want)


def test_converted_params_do_not_alias_source():
    """torch state_dicts VIEW the live model's storage; the converter must
    deep-copy so a later in-place optimizer step cannot mutate imported
    params (found by the round-5 train-trajectory leg)."""
    cfg = _cfg("DIGAT")
    sd = reference_state_dict(cfg, np.random.default_rng(1))
    params = interop.torch_to_params(sd, cfg)
    before = np.array(params["graph_encoder"]["user_ctx"]["K"]["w"])
    sd["graph_encoder.user_news_K.weight"][:] = 777.0  # in-place mutation
    np.testing.assert_array_equal(
        np.asarray(params["graph_encoder"]["user_ctx"]["K"]["w"]), before)
