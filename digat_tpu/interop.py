"""Torch-checkpoint interop: load reference DIGAT/NRMS ``state_dict``s.

Converts a PyTorch ``state_dict`` saved by the reference implementation
(reference model.py:7-41 for the DIGAT family, Appendix-B/model.py:7-22 for
the NRMS family) into a digat_tpu parameter pytree, so

  * users migrating from the reference can carry trained weights over, and
  * the parity harness can assert *deterministic functional equivalence*:
    identical weights -> identical logits (scripts/parity/transplant.py).

The mapping is strict both ways: every consumed ``state_dict`` entry is
checked off and every produced parameter leaf must come from exactly one
entry — a missing or superfluous tensor raises instead of silently
zero-filling.

Torch ``nn.Linear`` stores ``weight [out, in]`` applied as ``x @ W.T + b``;
digat_tpu stores ``w [in, out]`` applied as ``x @ w + b`` (layers.py:40-82),
so every weight transposes. Conv1d kernels ``[out, in, width]`` map to
``[width, in, out]`` (both frameworks compute cross-correlation:
torch.nn.Conv1d and lax.conv_general_dilated with ('NWC','WIO','NWC')).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from digat_tpu.config import Config


class StateDict:
    """Wraps a torch ``state_dict`` (or any name->tensor mapping) with
    strict take-accounting."""

    def __init__(self, sd: Mapping):
        self._arrays = {}
        for k, v in sd.items():
            if hasattr(v, "detach"):
                v = v.detach().cpu().numpy()
            # always copy: torch state_dict tensors VIEW the live model's
            # storage (and jnp.asarray on CPU can alias numpy buffers), so
            # without a copy a later in-place optimizer step on the torch
            # side would silently mutate the converted params
            self._arrays[k] = np.array(v, copy=True)
        self._taken = set()

    def take(self, name: str) -> np.ndarray:
        if name not in self._arrays:
            raise KeyError(f"reference state_dict has no tensor '{name}'; "
                           f"available: {sorted(set(self._arrays) - self._taken)[:8]}...")
        if name in self._taken:
            raise KeyError(f"tensor '{name}' consumed twice")
        self._taken.add(name)
        return self._arrays[name]

    def finish(self):
        left = sorted(set(self._arrays) - self._taken)
        if left:
            raise ValueError(f"unconsumed reference tensors: {left}")


def _linear(sd: StateDict, prefix: str, bias: bool = True) -> dict:
    p = {"w": sd.take(f"{prefix}.weight").T}
    if bias:
        p["b"] = sd.take(f"{prefix}.bias")
    return p


def _sdp_attn(sd: StateDict, prefix: str) -> dict:
    """reference layers.py:188-206 ScaledDotProductAttention."""
    return {
        "K": _linear(sd, f"{prefix}.K", bias=False),
        "Q": _linear(sd, f"{prefix}.Q"),
    }


def _attn_pool(sd: StateDict, prefix: str) -> dict:
    """reference layers.py:98-115 Attention (tanh-MLP pool)."""
    return {
        "affine1": _linear(sd, f"{prefix}.affine1"),
        "affine2": _linear(sd, f"{prefix}.affine2", bias=False),
    }


def _mha(sd: StateDict, prefix: str) -> dict:
    """reference layers.py:50-88 MultiHeadAttention projections."""
    return {
        "W_K": _linear(sd, f"{prefix}.W_K", bias=False),
        "W_Q": _linear(sd, f"{prefix}.W_Q"),
        "W_V": _linear(sd, f"{prefix}.W_V"),
    }


def _stacked(sd: StateDict, prefix: str, depth: int, bias: bool = True) -> dict:
    """nn.ModuleList of Linears -> leading-depth-axis stack
    (layers.py stacked_linear_init layout)."""
    ws = [sd.take(f"{prefix}.{i}.weight").T for i in range(depth)]
    p = {"w": np.stack(ws)}
    if bias:
        p["b"] = np.stack([sd.take(f"{prefix}.{i}.bias") for i in range(depth)])
    return p


def _gat_interactive(sd: StateDict, prefix: str, depth: int) -> dict:
    """Eq.(8) per-depth parameter lists (graphEncoders.py:62-74)."""
    return {
        "W": _stacked(sd, f"{prefix}_W", depth),
        "ffn1": _stacked(sd, f"{prefix}_ffn1", depth, bias=False),
        "ffn2": _stacked(sd, f"{prefix}_ffn2", depth, bias=False),
        "ffn3": _stacked(sd, f"{prefix}_ffn3", depth),
        "a": _stacked(sd, f"{prefix}_a", depth, bias=False),
    }


def _gat_vanilla(sd: StateDict, prefix: str, depth: int) -> dict:
    """Additive-GAT parameter lists (graphEncoders.py:424-432)."""
    return {
        "W": _stacked(sd, f"{prefix}_W", depth),
        "a1": _stacked(sd, f"{prefix}_a1", depth, bias=False),
        "a2": _stacked(sd, f"{prefix}_a2", depth, bias=False),
    }


def _conv_bank(sd: StateDict, prefix: str, method: str) -> dict:
    """reference layers.py:7-47 Conv1D bank."""
    if method == "naive":
        names = [f"{prefix}.conv"]
    elif method == "group3":
        names = [f"{prefix}.conv{i}" for i in (1, 2, 3)]
    else:  # group5
        names = [f"{prefix}.conv{i}" for i in (1, 2, 3, 4, 5)]
    convs = []
    for n in names:
        w = sd.take(f"{n}.weight")  # [out, in, width]
        convs.append({"w": np.transpose(w, (2, 1, 0)), "b": sd.take(f"{n}.bias")})
    return {"convs": convs}


# ---------------------------------------------------------------------------
# DIGAT family (reference model.py:7-90, graphEncoders.py:48-843)
# ---------------------------------------------------------------------------

# graph-encoder composition per variant: which GAT stack each graph uses
# (None = the variant has no such stack). Mirrors models.graph_encoders.init.
_VARIANT_GATS = {
    "DIGAT": ("interactive", "interactive"),
    "wo_SA": (None, "interactive"),
    "Seq_SA": (None, "interactive"),
    "wo_interaction": ("vanilla", "vanilla"),
    "news_graph_wo_inter": ("vanilla", "interactive"),
    "user_graph_wo_inter": ("interactive", "vanilla"),
}


def torch_to_params(state_dict: Mapping, config: Config) -> dict:
    """Reference DIGAT-family ``state_dict`` -> digat_tpu params pytree.

    Matches models.model.Model.init's tree structure exactly (verified by
    tests/test_interop.py structural assert)."""
    sd = StateDict(state_dict)
    depth = config.graph_depth
    variant = config.graph_encoder

    news = {"word_embedding": sd.take("news_encoder.word_embedding.weight"),
            "pool": _attn_pool(sd, "news_encoder.attention")}
    if config.news_encoder == "CNN":
        news["conv"] = _conv_bank(sd, "news_encoder.conv", config.cnn_method)
    else:
        news["msa"] = _mha(sd, "news_encoder.multiheadSelfattention")

    g = "graph_encoder"
    graph = {"topic_node_embedding": sd.take(f"{g}.topic_node_embedding")}
    if variant != "wo_SA":
        graph["news_ctx"] = {
            "cand_attn": _sdp_attn(sd, f"{g}.candidate_attention"),
            "gate": _linear(sd, f"{g}.news_graph_W"),
        }
    graph["user_ctx"] = {
        "K": _linear(sd, f"{g}.user_news_K", bias=False),
        "Q": _linear(sd, f"{g}.user_news_Q"),
        "affine": _linear(sd, f"{g}.featureAffine"),
        "attn": _sdp_attn(sd, f"{g}.userAttention"),
    }
    news_gat, user_gat = _VARIANT_GATS[variant]
    if news_gat == "interactive":
        graph["news_gat"] = _gat_interactive(sd, f"{g}.news_graph_attention", depth)
    elif news_gat == "vanilla":
        graph["news_gat"] = _gat_vanilla(sd, f"{g}.news_graph_attention", depth)
    if user_gat == "interactive":
        graph["user_gat"] = _gat_interactive(sd, f"{g}.user_graph_attention", depth)
    else:
        graph["user_gat"] = _gat_vanilla(sd, f"{g}.user_graph_attention", depth)

    sd.finish()
    return {"news_encoder": news, "graph_encoder": graph}


# ---------------------------------------------------------------------------
# NRMS family (reference Appendix-B/model.py:7-31)
# ---------------------------------------------------------------------------


def torch_to_nrms_params(state_dict: Mapping, config: Config) -> dict:
    """Appendix-B NRMS / NRMS-SA ``state_dict`` -> digat_tpu NRMS params.

    The reference user encoder holds the SAME news-encoder module
    (Appendix-B/model.py:16), so its tensors reappear aliased under
    ``user_encoder.news_encoder.*`` — those duplicates are dropped."""
    state_dict = {k: v for k, v in state_dict.items()
                  if not k.startswith("user_encoder.news_encoder.")}
    sd = StateDict(state_dict)
    params = {
        "word_embedding": sd.take("news_encoder.word_embedding.weight"),
        "news_msa": _mha(sd, "news_encoder.multiheadAttention"),
        "news_pool": _attn_pool(sd, "news_encoder.attention"),
        "user_msa": _mha(sd, "user_encoder.multiheadAttention"),
        "user_pool": _attn_pool(sd, "user_encoder.attention"),
    }
    if config.nrms_model == "NRMS-SA":
        params["sa_attn"] = _sdp_attn(sd, "news_encoder.SA_attention")
        params["sa_gate"] = _linear(sd, "news_encoder.SA_transformation")
    sd.finish()
    return params


def load_torch_checkpoint(path: str, config: Config) -> dict:
    """Load a reference checkpoint file (``{model_name: state_dict}``,
    reference trainer.py saves / main.py:23 loads) into digat_tpu params."""
    import torch

    blob = torch.load(path, map_location="cpu")
    model_name = config.model_name if config.model_family == "digat" else config.nrms_model
    sd = blob[model_name] if model_name in blob else blob
    if config.model_family == "nrms":
        return torch_to_nrms_params(sd, config)
    return torch_to_params(sd, config)
