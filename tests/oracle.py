"""Independent NumPy oracle of the reference model math (eval mode).

Re-derived from the equations of the reference implementation
(graphEncoders.py, newsEncoders.py, layers.py) and written in plain NumPy
with explicit loops, deliberately *not* sharing code with digat_tpu, so that
agreement between the two is a meaningful check of the JAX composition.
"""

import numpy as np

MASK_FILL = -1e9


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def masked_softmax(scores, mask, axis=-1):
    scores = np.where(mask.astype(bool), scores, MASK_FILL)
    return softmax(scores, axis=axis)


def lin(p, x):
    y = x @ np.asarray(p["w"])
    if "b" in p:
        y = y + np.asarray(p["b"])
    return y


def lin_i(p, i, x):
    q = {k: np.asarray(v)[i] for k, v in p.items()}
    return lin(q, x)


def sdp_attn(p, feature, query, mask):
    # [B,L,D], [B,D], [B,L]
    d = np.asarray(p["K"]["w"]).shape[-1]
    a = np.einsum("bld,bd->bl", lin(p["K"], feature), lin(p["Q"], query))
    a = a / np.sqrt(float(d))
    alpha = masked_softmax(a, mask)
    return np.einsum("bl,bld->bd", alpha, feature)


def attn_pool(p, feature, mask):
    a = lin(p["affine2"], np.tanh(lin(p["affine1"], feature)))[..., 0]
    alpha = masked_softmax(a, mask)
    return np.einsum("...l,...ld->...d", alpha, feature)


def news_graph_context(p, x, node_mask):
    local = x[:, 0, :]
    global_ = sdp_attn(p["cand_attn"], x, local, node_mask)
    gate = 1.0 / (1.0 + np.exp(-lin(p["gate"], np.concatenate([local, global_], -1))))
    return gate * local + (1 - gate) * global_


def user_graph_context(p, user_x, cat_mask, cat_idx, query, H, C):
    hist = user_x[:, :H, :]
    d = hist.shape[-1]
    a = np.einsum("bhd,bd->bh", lin(p["K"], hist), lin(p["Q"], query)) / np.sqrt(d)
    B = a.shape[0]
    topic = np.zeros((B, C + 1, d))
    for b in range(B):
        for c in range(C + 1):
            sel = np.where(cat_idx[b] == c)[0]
            if len(sel) == 0:
                continue
            alpha = softmax(a[b, sel])
            topic[b, c] = alpha @ hist[b, sel]
    topic = np.maximum(lin(p["affine"], topic), 0.0) + topic
    return sdp_attn(p["attn"], topic, query, cat_mask)


def gat_layer_interactive(p, i, x, adj, query):
    h = lin_i(p["W"], i, x)
    k1 = lin_i(p["ffn1"], i, x)  # j axis
    k2 = lin_i(p["ffn2"], i, x)  # i axis
    k3 = lin_i(p["ffn3"], i, query)  # [B, D]
    z = np.maximum(k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :], 0.0)
    a_vec = np.asarray(p["a"]["w"])[i][:, 0]
    scores = np.einsum("bijd,d->bij", z, a_vec)
    e = np.where(scores >= 0, scores, 0.2 * scores)
    alpha = masked_softmax(e, adj, axis=2)
    return np.maximum(np.einsum("bij,bjd->bid", alpha, h), 0.0) + x


def gat_layer_vanilla(p, i, x, adj):
    h = lin_i(p["W"], i, x)
    a1 = np.einsum("bjd,d->bj", h, np.asarray(p["a1"]["w"])[i][:, 0])  # j axis
    a2 = np.einsum("bid,d->bi", h, np.asarray(p["a2"]["w"])[i][:, 0])  # i axis
    scores = a1[:, None, :] + a2[:, :, None]
    e = np.where(scores >= 0, scores, 0.2 * scores)
    alpha = masked_softmax(e, adj, axis=2)
    return np.maximum(np.einsum("bij,bjd->bid", alpha, h), 0.0) + x


def graph_forward(params, variant, depth, H, C, news_x, news_graph,
                  news_graph_mask, user_news, user_graph, cat_mask, cat_idx,
                  c_n0=None):
    """Oracle for graph_encoders.forward (eval mode). Returns (c_n, c_u)."""
    params = {k: v for k, v in params.items()}
    B = news_x.shape[0]
    topic_nodes = np.broadcast_to(
        np.asarray(params["topic_node_embedding"])[None], (B, C, news_x.shape[-1])
    )
    user_x = np.concatenate([user_news, topic_nodes], axis=1)

    if variant == "wo_SA":
        cand = news_x[:, 0, :]
        for i in range(depth):
            user_x = gat_layer_interactive(params["user_gat"], i, user_x, user_graph, cand)
        c_u = user_graph_context(params["user_ctx"], user_x, cat_mask, cat_idx, cand, H, C)
        return cand, c_u

    c_n = c_n0 if c_n0 is not None else news_graph_context(
        params["news_ctx"], news_x, news_graph_mask
    )
    c_u = user_graph_context(params["user_ctx"], user_x, cat_mask, cat_idx, c_n, H, C)

    if variant == "Seq_SA":
        for i in range(depth):
            user_x = gat_layer_interactive(params["user_gat"], i, user_x, user_graph, c_n)
            c_u = c_u + user_graph_context(params["user_ctx"], user_x, cat_mask, cat_idx, c_n, H, C)
        return c_n, c_u

    news_inter = variant in ("DIGAT", "user_graph_wo_inter")
    user_inter = variant in ("DIGAT", "news_graph_wo_inter")
    for i in range(depth):
        if news_inter:
            news_x = gat_layer_interactive(params["news_gat"], i, news_x, news_graph, c_u)
        else:
            news_x = gat_layer_vanilla(params["news_gat"], i, news_x, news_graph)
        if user_inter:
            user_x = gat_layer_interactive(params["user_gat"], i, user_x, user_graph, c_n)
        else:
            user_x = gat_layer_vanilla(params["user_gat"], i, user_x, user_graph)
        c_n = c_n + news_graph_context(params["news_ctx"], news_x, news_graph_mask)
        c_u = c_u + user_graph_context(params["user_ctx"], user_x, cat_mask, cat_idx, c_n, H, C)
    return c_n, c_u


def mha_np(p, x, heads):
    """Unmasked multi-head self-attention (reference layers.py:50-88).

    x: [B, L, d_model] -> [B, L, heads*d_v]. Pads participate in the
    softmax (main-variant semantics)."""
    q = lin(p["W_Q"], x)
    k = lin(p["W_K"], x)
    v = lin(p["W_V"], x)
    B, L = x.shape[:2]
    d_k = q.shape[-1] // heads
    d_v = v.shape[-1] // heads
    q = q.reshape(B, L, heads, d_k)
    k = k.reshape(B, L, heads, d_k)
    v = v.reshape(B, L, heads, d_v)
    a = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(float(d_k))
    alpha = softmax(a, axis=-1)
    out = np.einsum("bhqk,bkhd->bqhd", alpha, v)
    return out.reshape(B, L, heads * d_v)


def conv1d_bank_np(params, x, widths):
    """Oracle of the conv bank (layers.py conv1d_bank): per width, same-pad
    1-D conv (odd widths symmetric; even widths one extra right zero),
    concat, relu. x: [N, L, Cin] -> [N, L, kernel_num]."""
    N, L, _ = x.shape
    outs = []
    for p, width in zip(params["convs"], widths):
        w = np.asarray(p["w"], np.float64)  # [width, Cin, Cout]
        b = np.asarray(p["b"], np.float64)
        pad = (width - 1) // 2
        rpad = pad if width % 2 == 1 else pad + 1
        xp = np.pad(x, ((0, 0), (pad, rpad), (0, 0)))
        acc = np.zeros((N, L, w.shape[2]))
        for t in range(width):
            acc += xp[:, t : t + L] @ w[t]
        outs.append(acc + b)
    return np.maximum(np.concatenate(outs, axis=-1), 0.0)


def cnn_encode_np(params, tokens, mask, widths):
    """Oracle of the CNN news encoder, eval mode (newsEncoders.py:29-54):
    GloVe lookup -> conv bank + relu -> masked tanh-MLP pooling."""
    emb = np.asarray(params["word_embedding"], np.float64)
    h = conv1d_bank_np(params["conv"], emb[tokens], widths)
    return attn_pool(params["pool"], h, mask)


def msa_encode_np(params, tokens, mask, heads):
    """Oracle of the MSA news encoder, eval mode (newsEncoders.py:57-82):
    GloVe lookup -> 16-head self-attention -> relu -> masked tanh-MLP
    attention pooling. tokens: [N, L] int; mask: [N, L] -> [N, D]."""
    emb = np.asarray(params["word_embedding"], np.float64)
    w = emb[tokens]
    h = np.maximum(mha_np(params["msa"], w, heads), 0.0)
    return attn_pool(params["pool"], h, mask)


def model_eval_np(params, variant, depth, H, C, heads, news_reps,
                  node_id, news_graph, news_graph_mask, batch_hist_idx,
                  batch_cat_idx, batch_sample_idx, chunk=64):
    """Full-model eval oracle -> logits [B, 1+K] (model.py:54-77 semantics).

    `news_reps` [news_num, D]: pre-encoded unique news (from msa_encode_np).
    Gathers candidate-SAG node reps and history reps, broadcasts the user
    side across candidates, runs the graph oracle in flat [B*(1+K)] chunks
    (the [B', G, G, D] Eq.(8) intermediate is materialized per chunk), and
    dots news/user representations."""
    B, N = batch_sample_idx.shape
    cand = news_reps[node_id[batch_sample_idx]]      # [B, N, Gn, D]
    hist = news_reps[batch_hist_idx]                 # [B, H, D]
    ngraph = news_graph[batch_sample_idx]            # [B, N, Gn, Gn]
    nmask = news_graph_mask[batch_sample_idx]        # [B, N, Gn]
    ugraph = np.stack([user_graph_np(r, H, C)[0] for r in batch_cat_idx])
    cmask = np.stack([user_graph_np(r, H, C)[1] for r in batch_cat_idx])

    flat = lambda x: x.reshape((B * N,) + x.shape[2:])
    rep = lambda x: np.broadcast_to(
        x[:, None], (B, N) + x.shape[1:]
    ).reshape((B * N,) + x.shape[1:])
    fc, fg, fm = flat(cand), flat(ngraph), flat(nmask)
    rh, rg = rep(hist), rep(ugraph)
    rcm, rci = rep(cmask), rep(batch_cat_idx)

    outs = []
    for s in range(0, B * N, chunk):
        e = min(s + chunk, B * N)
        c_n, c_u = graph_forward(
            params, variant, depth, H, C, fc[s:e], fg[s:e], fm[s:e],
            rh[s:e], rg[s:e], rcm[s:e], rci[s:e],
        )
        outs.append(np.sum(c_n * c_u, axis=-1))
    return np.concatenate(outs).reshape(B, N)


def listwise_nll_np(logits, weight):
    """Weighted listwise NLL (trainer.py:100): -log_softmax(logits)[:, 0]."""
    p = softmax(logits, axis=1)
    nll = -np.log(p[:, 0])
    return float(np.sum(nll * weight) / max(np.sum(weight), 1.0))


def user_graph_np(cat_idx_row, H, C):
    """Oracle for the reference's user-graph edge rules
    (MIND_corpus.py:153-176), built with the original per-pair loops."""
    G = H + C
    g = np.identity(G, dtype=bool)
    cmask = np.zeros(C + 1, dtype=bool)
    valid = [i for i in range(H) if cat_idx_row[i] < C]
    for i in valid:
        c = cat_idx_row[i]
        cmask[c] = 1
        g[i, H + c] = 1
        g[H + c, i] = 1
        for j in valid:
            if j <= i:
                continue
            c2 = cat_idx_row[j]
            if c == c2:
                g[i, j] = g[j, i] = 1
            else:
                g[H + c, H + c2] = g[H + c2, H + c] = 1
    return g, cmask
