"""Real multi-PROCESS execution (not just a multi-device mesh): two local
jax.distributed processes (Gloo collectives on CPU) drive the full CLI
train path — rank-0-only preprocessing with a barrier, strided per-host
train batches assembled into global arrays, sharded eval with the
allgather-sum reassembly (eval/scorer.py), the broadcast early-stop
decision, and the broadcast best-checkpoint auto-test.

This is the TPU-world equivalent of testing the reference's 2-GPU DDP
launch (reference trainer.py:19,78-80) without hardware: SURVEY §4 calls
for exactly this kind of multi-host simulation."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
data_root = sys.argv[3]
run_root = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from digat_tpu.cli import main
FLAGS = [
    "--dataset", "synthetic", "--data_root", data_root,
    "--epoch", "2", "--batch_size", "16",
    "--max_history_num", "10", "--max_title_length", "12",
    "--SAG_neighbors", "3", "--graph_depth", "2",
    "--eval_batch_size", "32", "--use_pallas", "false",
    "--dedup_titles", "0", "--rng_impl", "threefry",
]
main(FLAGS + [
    "--run_root", run_root,
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2", "--process_id", str(pid),
])
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

# ---- eval-shard parity probe: the 2-process sharded+reassembled scoring
# must EXACTLY equal a full single-shard local rescore of the same params
import numpy as np
from digat_tpu.cli import build_model, prepare
from digat_tpu.config import Config
from digat_tpu.eval import metrics as M
from digat_tpu.eval.scorer import CachedScorer, compute_scores
cfg = Config.from_args(FLAGS + ["--run_root", run_root])
corpus = prepare(cfg)  # cache hit; includes the cross-process barrier
model = build_model(cfg)
params = model.init(jax.random.PRNGKey(0), word_embedding=corpus.word_embedding)
sharded = compute_scores(model, params, corpus, "dev")
scorer = CachedScorer(model, cfg.effective_eval_batch_size())
split = corpus.splits["dev"]
full = scorer.score_items(
    params, corpus.tables(), split.history_idx, split.cat_idx,
    corpus.dev_imp_index, corpus.dev_cand,
)
local = M.score_impressions_flat(corpus.dev_imp_index, corpus.dev_labels, full)
assert np.array_equal(np.asarray(sharded), np.asarray(local)), (sharded, local)
print(f"EVAL_SHARD_PARITY pid={pid} " + " ".join(f"{x:.6f}" for x in sharded))
print(f"WORKER_OK pid={pid}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_eval(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    data_root = str(tmp_path / "data")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        run_root = str(tmp_path / f"runs{pid}")
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(port),
                 data_root, run_root],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=str(tmp_path),
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out

    # process 0 logs the training epochs + auto-test; process 1 is silent
    # (main-rank logging) but joins every collective
    dev_lines = [l for l in outs[0].splitlines() if "dev AUC=" in l]
    assert len(dev_lines) == 2, outs[0]
    assert any("[test] epoch" in l for l in outs[0].splitlines()), outs[0]

    # the sharded eval reassembly agrees exactly across processes
    def parity(out, pid):
        for l in out.splitlines():
            if l.startswith(f"EVAL_SHARD_PARITY pid={pid}"):
                return l.split(None, 2)[2]
        raise AssertionError(out)

    assert parity(outs[0], 0) == parity(outs[1], 1)

    # rank 0 wrote the run artifacts; rank 1 did not allocate a run dir
    assert "[prepare]" in outs[0]
    assert "[prepare]" not in outs[1]
    run0 = os.path.join(str(tmp_path / "runs0"), "synthetic", "MSA-DIGAT", "#1")
    assert os.path.exists(os.path.join(run0, "best.ckpt"))
    assert os.path.exists(
        os.path.join(str(tmp_path / "runs0"), "dev", "synthetic", "ref", "truth.txt")
    )
    assert not os.path.exists(str(tmp_path / "runs1" / "synthetic"))


@pytest.mark.slow
def test_explicit_bad_coordinator_is_loud(tmp_path):
    """An unreachable configured coordinator must not silently degrade to
    single-process mode: jax's coordination client terminates the process
    with a fatal DEADLINE_EXCEEDED log (there is no Python exception to
    swallow), so the observable contract is a non-zero exit + the error."""
    script = tmp_path / "bad.py"
    script.write_text(
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "from digat_tpu.parallel import mesh\n"
        "mesh.initialize_distributed('localhost:1', 2, 0,\n"
        "                            initialization_timeout=5)\n"
        "print('SILENT_SUCCESS')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert out.returncode != 0, out.stdout + out.stderr
    assert "SILENT_SUCCESS" not in out.stdout
    assert "DEADLINE_EXCEEDED" in (out.stdout + out.stderr)
