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

import jax.random as jr
from digat_tpu import layers as L
from digat_tpu.ops.gat import interactive_gat_scores
from digat_tpu.ops.segment import segment_softmax_sum
gparams = params["graph_encoder"]
st = model.graph_st

def dep(x, carry):  # forge a cheap data dependence to defeat LICM
    return x + (carry * 0.0).astype(x.dtype) if x.dtype.kind == 'f' else x

def time_block(name, fn, n1=8, n2=108):
    @functools.partial(jax.jit, static_argnums=0)
    def run(n):
        def body(i, carry):
            return carry + fn(i, carry)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    t = marginal(lambda n: run(n), n1, n2)
    log(f"{name}: {t*1e3:.3f} ms")
    return t

key = jax.random.PRNGKey(7)
xu = jnp.asarray(np.random.default_rng(1).normal(size=(320, 68, 400)), jnp.float32)
xn = cand0  # [320? no: B=64 -> 320,26,400]
log(f"xn {cand0.shape}")
qry = jnp.asarray(np.random.default_rng(2).normal(size=(320, 400)), jnp.float32)

gat_u = gparams["user_gat"] if "user_gat" in gparams else None
log(f"graph param keys: {list(gparams.keys())}")

from digat_tpu.models.graph_encoders import _gat_layer
# single user GAT layer fwd
time_block("user GAT layer fwd (train)", lambda i, c: jnp.sum(_gat_layer(
    gparams["user_gat"], 0, st, jr.fold_in(key, i), True,
    dep(xu, c), ug0, qry)[0, 0, :2]))
# single user GAT layer fwd+bwd
def ug_loss(x, p, i):
    return jnp.sum(_gat_layer(p, 0, st, jr.fold_in(key, i), True, x, ug0, qry) ** 2) * 1e-6
time_block("user GAT layer fwd+bwd", lambda i, c: jax.value_and_grad(ug_loss)(
    dep(xu, c), gparams["user_gat"], i)[0])
# news GAT layer fwd+bwd
def ng_loss(x, p, i):
    return jnp.sum(_gat_layer(p, 0, st, jr.fold_in(key, i), True, x, ng0, qry) ** 2) * 1e-6
time_block("news GAT layer fwd+bwd", lambda i, c: jax.value_and_grad(ng_loss)(
    dep(cand0, c), gparams["news_gat"], i)[0])
# segment softmax/sum (user context piece)
hist68 = xu[:, :50, :]
avec = jnp.asarray(np.random.default_rng(3).normal(size=(320, 50)), jnp.float32)
time_block("segment_softmax_sum", lambda i, c: jnp.sum(segment_softmax_sum(
    dep(avec, c), hist68, b0.cat_idx.repeat(5, 0)[:320], st.category_num + 1)[1][0, 0, :2]))
# dropout cost alone at [320,68,400]
time_block("dropout [320,68,400]", lambda i, c: jnp.sum(L.dropout(
    jr.fold_in(key, i), dep(xu, c), 0.1, True)[0, 0, :2]))
# masked softmax at [320,68,68]
sc = jnp.asarray(np.random.default_rng(4).normal(size=(320, 68, 68)), jnp.float32)
time_block("masked_softmax [320,68,68]", lambda i, c: jnp.sum(L.masked_softmax(
    dep(sc, c), ug0, axis=2)[0, 0, :2]))
# interactive scores kernel fwd+bwd at user shape
k1 = xu; k2 = xu; k3 = qry
a_vec = gparams["user_gat"]["a"]["w"][0, :, 0]
def sc_loss(k1_, i):
    s = interactive_gat_scores(k1_, k2, k3, a_vec, use_pallas=True)
    return jnp.sum(s ** 2) * 1e-6
time_block("Eq8 scores user fwd+bwd", lambda i, c: jax.value_and_grad(sc_loss)(dep(k1, c), i)[0])
