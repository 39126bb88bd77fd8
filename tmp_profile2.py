"""Decompose the B=64 train step: encoder fwd+bwd vs graph fwd+bwd vs emb grad."""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp

from digat_tpu.config import Config
from digat_tpu.models.model import CorpusTables, Model, TrainBatch
from digat_tpu.models import news_encoders as N
from digat_tpu.models import graph_encoders as G
from digat_tpu.data.user_graph import build_user_graph
from digat_tpu.data.batching import dedup_batch
from digat_tpu.cli import apply_runtime_config

def log(*a): print(*a, file=sys.stderr, flush=True)

def marginal(run, n1, n2, trials=3):
    run(n1)
    est = []
    for _ in range(trials):
        t0 = time.time(); float(run(n1)); t1 = time.time() - t0
        t0 = time.time(); float(run(n2)); t2 = time.time() - t0
        est.append(max(t2 - t1, 1e-9) / (n2 - n1))
    return float(np.median(est))

cfg = Config(dataset="synthetic", vocabulary_size=40_000, category_num=18,
             use_pallas=jax.default_backend() == "tpu")
apply_runtime_config(cfg)
model = Model(cfg)
Gn, L, H = cfg.news_graph_size, cfg.max_title_length, cfg.max_history_num
news_num = 20_000
rng = np.random.default_rng(0)
tables = CorpusTables(
    news_title_text=jnp.asarray(rng.integers(0, cfg.vocabulary_size, (news_num, L)), jnp.int32),
    news_title_mask=jnp.asarray(rng.random((news_num, L)) < 0.8),
    news_node_id=jnp.asarray(rng.integers(0, news_num, (news_num, Gn)), jnp.int32),
    news_graph=jnp.asarray((rng.random((news_num, Gn, Gn)) < 0.25) | np.eye(Gn, dtype=bool)),
    news_graph_mask=jnp.asarray(np.concatenate(
        [np.zeros((news_num, 1), bool), rng.random((news_num, Gn - 1)) < 0.9], axis=1)),
)
params = model.init(jax.random.PRNGKey(0))
B, K = cfg.batch_size, cfg.negative_sample_num

def make_train_batch(seed):
    r = np.random.default_rng(seed)
    cat = r.integers(0, cfg.category_num + 1, (B, H)).astype(np.int32)
    return TrainBatch(
        history_idx=jnp.asarray(r.integers(0, news_num, (B, H)), jnp.int32),
        cat_idx=jnp.asarray(cat),
        sample_idx=jnp.asarray(r.integers(0, news_num, (B, 1 + K)), jnp.int32),
        weight=jnp.ones((B,), jnp.float32),
    )

raw = [make_train_batch(s) for s in range(4)]
node_np = np.asarray(tables.news_node_id)
ucount = max(len(np.unique(np.concatenate([
    node_np[np.asarray(b.sample_idx)].ravel(), np.asarray(b.history_idx).ravel()])))
    for b in raw)
cap = int(np.ceil(ucount * 1.15 / 256.0) * 256)
tpool = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *[
    dedup_batch(b, tables.news_node_id, cap,
                news_title_text=np.asarray(tables.news_title_text),
                vocab_size=cfg.vocabulary_size) for b in raw])
log(f"cap={cap}")
# ---- (3) graph encoder fwd+bwd at B*(1+K) with precomputed reps ----
b0 = jax.tree.map(lambda x: x[0], tpool)
uniq_reps = N.encode(params["news_encoder"], model.news_st, jax.random.PRNGKey(0),
                     False, tables.news_title_text[b0.uniq_ids],
                     tables.news_title_mask[b0.uniq_ids])
cand0 = uniq_reps[b0.cand_inv]
hist0 = uniq_reps[b0.hist_inv]
ng0 = tables.news_graph[b0.sample_idx]
ngm0 = tables.news_graph_mask[b0.sample_idx]
ug0, ucm0 = build_user_graph(b0.cat_idx, cfg.max_history_num, cfg.category_num)
import dataclasses
# ---- (8) graph fwd only (train mode) ----
@functools.partial(jax.jit, static_argnums=1)
def graph_fwd(params, n):
    def body(i, carry):
        logits = model.forward_encoded(
            params, jax.random.fold_in(jax.random.PRNGKey(0), i), True,
            cand0, hist0, ug0, ucm0, b0.cat_idx, ng0, ngm0)
        return carry + jnp.sum(logits[0, :2])
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

t8 = marginal(lambda n: graph_fwd(params, n), 4, 54)
log(f"graph fwd only: {t8*1e3:.2f} ms")

# ---- (9) graph fwd+bwd with dropout_rate=0 ----
cfg0 = dataclasses.replace(cfg, dropout_rate=0.0)
model0 = Model(cfg0)
@functools.partial(jax.jit, static_argnums=1)
def graph_grad_nodrop(params, n):
    def body(i, carry):
        def f(p):
            logits = model0.forward_encoded(
                p, jax.random.fold_in(jax.random.PRNGKey(0), i), True,
                cand0, hist0, ug0, ucm0, b0.cat_idx, ng0, ngm0)
            return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])
        loss, grads = jax.value_and_grad(f)(params)
        return carry + loss + grads["graph_encoder"]["topic_node_embedding"][0, 0]
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

t9 = marginal(lambda n: graph_grad_nodrop(params, n), 4, 54)
log(f"graph fwd+bwd dropout=0: {t9*1e3:.2f} ms")

# ---- (10) graph fwd+bwd without pallas scores (XLA fallback) ----
cfgX = dataclasses.replace(cfg, use_pallas=False)
modelX = Model(cfgX)
@functools.partial(jax.jit, static_argnums=1)
def graph_grad_xla(params, n):
    def body(i, carry):
        def f(p):
            logits = modelX.forward_encoded(
                p, jax.random.fold_in(jax.random.PRNGKey(0), i), True,
                cand0, hist0, ug0, ucm0, b0.cat_idx, ng0, ngm0)
            return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])
        loss, grads = jax.value_and_grad(f)(params)
        return carry + loss + grads["graph_encoder"]["topic_node_embedding"][0, 0]
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

t10 = marginal(lambda n: graph_grad_xla(params, n), 4, 54)
log(f"graph fwd+bwd XLA scores: {t10*1e3:.2f} ms")
