"""Multi-device semantics on the 8-device CPU mesh: data-parallel training
must be numerically equivalent to single-device, and the row-sharded
embedding path must produce identical results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from digat_tpu.parallel import mesh as mesh_lib
from digat_tpu.train.optimizer import make_optimizer
from digat_tpu.train.train_step import make_train_step


@pytest.fixture(scope="module")
def setup():
    from digat_tpu.models.model import Model

    cfg = graft._tiny_config()
    model = Model(cfg)
    tables, batch = graft._tiny_data(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.weight_decay, cfg.gradient_clip_norm, params)
    return model, tables, batch, params, tx


def _run_steps(model, tx, params, tables, batch, mesh, n_model, steps=2):
    # deep-copy: the jitted step donates params/opt_state buffers
    params = jax.tree.map(jnp.array, params)
    opt_state = tx.init(params)
    if mesh is not None:
        params = jax.device_put(
            params, mesh_lib.param_shardings(mesh, params, n_model > 1)
        )
        opt_state = jax.device_put(opt_state, mesh_lib.replicated(mesh))
        tables = jax.device_put(tables, mesh_lib.replicated(mesh))
        batch = mesh_lib.shard_batch_arrays(mesh, batch)
    step = make_train_step(model, tx)
    losses = []
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, tables, batch, jax.random.PRNGKey(42),
            jnp.float32(1e-3),
        )
        losses.append(float(loss))
    return losses, jax.tree.map(np.asarray, params)


def test_dp_matches_single_device(setup):
    model, tables, batch, params, tx = setup
    ref_losses, ref_params = _run_steps(
        model, tx, params, tables, batch, None, 1
    )
    mesh = mesh_lib.make_mesh(data=8, model=1)
    dp_losses, dp_params = _run_steps(model, tx, params, tables, batch, mesh, 1)
    np.testing.assert_allclose(ref_losses, dp_losses, rtol=5e-4)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(dp_params)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)


def test_model_sharded_embedding_matches(setup):
    model, tables, batch, params, tx = setup
    ref_losses, _ = _run_steps(model, tx, params, tables, batch, None, 1)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    sh_losses, _ = _run_steps(model, tx, params, tables, batch, mesh, 2)
    np.testing.assert_allclose(ref_losses, sh_losses, rtol=5e-4)


def test_shardmap_step_with_kernels_matches_single_device(setup):
    """The explicit-shard_map DP step — the multi-chip path for the Pallas
    kernels — must match single-device numerics. Kernels run in interpret
    mode here (dropout off so rng-stream differences are irrelevant)."""
    import dataclasses

    from digat_tpu.models.model import Model
    from digat_tpu.ops.pallas import runtime as plrt
    from digat_tpu.train.train_step import make_shardmap_train_step

    cfg = dataclasses.replace(graft._tiny_config(), use_pallas=True)
    cfg.dropout_rate = 0.0
    model = Model(cfg)
    tables, batch = graft._tiny_data(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.weight_decay, cfg.gradient_clip_norm, params)

    ref_losses, ref_params = _run_steps(model, tx, params, tables, batch, None, 1)

    plrt.set_interpret(True)
    try:
        mesh = mesh_lib.make_mesh(data=8, model=1)
        p = jax.device_put(
            jax.tree.map(jnp.array, params), mesh_lib.replicated(mesh)
        )
        o = jax.device_put(tx.init(params), mesh_lib.replicated(mesh))
        t = jax.device_put(tables, mesh_lib.replicated(mesh))
        b = mesh_lib.shard_batch_arrays(mesh, batch)
        step = make_shardmap_train_step(model, tx, mesh)
        losses = []
        for _ in range(2):
            p, o, loss = step(p, o, t, b, jax.random.PRNGKey(42), jnp.float32(1e-3))
            losses.append(float(loss))
    finally:
        plrt.set_interpret(False)
    np.testing.assert_allclose(ref_losses, losses, rtol=5e-4)
    # psum reduction order differs from the single-device sum; Adam's
    # second-moment rescaling amplifies that on near-zero gradients, so the
    # parameter tolerance is looser than the pure-DP jit test above
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(jax.tree.map(np.asarray, p))):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=3e-3)


def test_shardmap_per_shard_dedup_matches_plain(setup):
    """ShardedDedupBatch (each shard dedups its own titles) must be
    mathematically identical to the plain sharded batch: the inverse-index
    gathers fan encoded titles out to exactly the dense layout."""
    import dataclasses

    from digat_tpu.data.batching import dedup_shards
    from digat_tpu.models.model import Model
    from digat_tpu.train.train_step import make_shardmap_train_step

    cfg = dataclasses.replace(graft._tiny_config(), use_pallas=False)
    cfg.dropout_rate = 0.0
    model = Model(cfg)
    tables, batch = graft._tiny_data(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.weight_decay, cfg.gradient_clip_norm, params)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    step = make_shardmap_train_step(model, tx, mesh)

    sharded = dedup_shards(
        jax.tree.map(np.asarray, batch), np.asarray(tables.news_node_id),
        capacity=64, n_shards=8,
    )
    assert sharded is not None and sharded.uniq_ids.shape == (8, 64)

    def run(b):
        p = jax.device_put(
            jax.tree.map(jnp.array, params), mesh_lib.replicated(mesh)
        )
        o = jax.device_put(tx.init(params), mesh_lib.replicated(mesh))
        t = jax.device_put(tables, mesh_lib.replicated(mesh))
        b = mesh_lib.shard_batch_arrays(mesh, b)
        p, o, loss = step(p, o, t, b, jax.random.PRNGKey(3), jnp.float32(1e-3))
        return float(loss), jax.tree.map(np.asarray, p)

    loss_plain, p_plain = run(batch)
    loss_dedup, p_dedup = run(sharded)
    assert abs(loss_plain - loss_dedup) < 1e-5, (loss_plain, loss_dedup)
    # the gather-VJP scatter-add reorders gradient accumulation vs the
    # dense path; Adam's rescaling amplifies that on near-zero grads
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_dedup)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5)


def test_dryrun_multichip_entry():
    graft.dryrun_multichip(8)


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[2].sample_idx.shape[0], args[2].sample_idx.shape[1])


def test_sharded_eval_matches_single_device():
    """Eval stages under shard_map over the 8-device local mesh must equal
    the single-device scorer exactly (mirror of the train-step DP test;
    closes the reference's idle-ranks eval wart one level down,
    trainer.py:109-114)."""
    from digat_tpu.eval.scorer import CachedScorer
    from digat_tpu.models.model import Model

    cfg = graft._tiny_config()
    model = Model(cfg)
    news_num = 50
    tables, _ = graft._tiny_data(cfg, news_num=news_num)
    params = model.init(jax.random.PRNGKey(3))

    rng = np.random.default_rng(1)
    rows, n_items, H = 40, 70, cfg.max_history_num
    history_idx = rng.integers(0, news_num, (rows, H)).astype(np.int32)
    cat_idx = rng.integers(0, cfg.category_num + 1, (rows, H)).astype(np.int32)
    imp_index = np.sort(rng.integers(0, rows, n_items)).astype(np.int32)
    cand = rng.integers(0, news_num, n_items).astype(np.int32)

    single = CachedScorer(model, batch_size=16, mesh=False)
    assert single.mesh is None
    sharded = CachedScorer(model, batch_size=16)  # auto: 8-device local mesh
    assert sharded.mesh is not None and sharded.mesh.devices.size == 8

    s1 = single.score_items(params, tables, history_idx, cat_idx, imp_index, cand)
    s8 = sharded.score_items(params, tables, history_idx, cat_idx, imp_index, cand)
    np.testing.assert_allclose(s1, s8, rtol=1e-6, atol=1e-6)


def test_sharded_eval_nrms_matches_single_device():
    from digat_tpu.eval.scorer import NRMSCachedScorer
    from digat_tpu.models.nrms import NRMSModel, NRMSTables

    import dataclasses

    cfg = dataclasses.replace(
        graft._tiny_config(), model_family="nrms", nrms_model="NRMS-SA",
        augmented_news_num=4,
    )
    model = NRMSModel(cfg)
    news_num = 50
    rng = np.random.default_rng(2)
    L = cfg.max_title_length
    tables = NRMSTables(
        news_title_text=jnp.asarray(
            rng.integers(0, cfg.vocabulary_size, (news_num, L)), jnp.int32
        ),
        news_title_mask=jnp.asarray(rng.random((news_num, L)) < 0.8),
        augmented_news=jnp.asarray(
            rng.integers(0, news_num, (news_num, cfg.augmented_news_num)),
            jnp.int32,
        ),
    )
    params = model.init(jax.random.PRNGKey(4))
    rows, n_items, H = 30, 55, cfg.max_history_num
    history_idx = rng.integers(0, news_num, (rows, H)).astype(np.int32)
    cat_idx = rng.integers(0, cfg.category_num + 1, (rows, H)).astype(np.int32)
    imp_index = np.sort(rng.integers(0, rows, n_items)).astype(np.int32)
    cand = rng.integers(0, news_num, n_items).astype(np.int32)

    single = NRMSCachedScorer(model, batch_size=16, mesh=False)
    sharded = NRMSCachedScorer(model, batch_size=16)
    s1 = single.score_items(params, tables, history_idx, cat_idx, imp_index, cand)
    s8 = sharded.score_items(params, tables, history_idx, cat_idx, imp_index, cand)
    np.testing.assert_allclose(s1, s8, rtol=1e-6, atol=1e-6)
