"""Full MIND-large training protocol at magnitude on the real TPU
(round-5 item 4).

Round 4 proved ONE epoch + auto-test at the 100k-news / 650k-sample hazard
point; this driver runs the COMPOSED reference protocol
(reference config.py:65-67 MIND-large: 7 epochs, dropout 0.1;
trainer.py:67-82,121-172: per-epoch dev, lr/10 late decay,
best-checkpoint-by-avg, early stop, auto-test) — and injects a hard
SIGKILL mid-protocol followed by `--resume` from the best checkpoint, the
failure-recovery path the reference does not have.

Phases:
  1. CLI train (--epoch 7) killed right after a chosen epoch's dev eval;
  2. tunnel-recovery probe (killed clients can wedge the axon tunnel);
  3. CLI train --resume <run>/best.ckpt, continuing to epoch 7 + auto-test.

Per-epoch wall/RSS land in docs/tpu_large_protocol.json (summarized in
docs/PERF.md).

Run: python scripts/tpu_large_protocol.py [--kill-after-epoch 3]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_ROOT = os.path.join(REPO, "data-tpu-large")
RUN_ROOT = os.path.join(REPO, "runs-tpu-large-protocol")
CACHE = os.path.join(REPO, ".jax_cache")

CLI_FLAGS = [
    "--dataset", "synthetic",
    "--data_root", DATA_ROOT,
    "--run_root", RUN_ROOT,
    "--epoch", "7",
    "--seed", "0",
    "--dropout_rate", "0.1",  # MIND-large protocol (reference config.py:66)
    "--compilation_cache_dir", CACHE,
]


def rss_of(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM"):
                    return int(line.split()[1]) / 1e6  # GB
    except OSError:
        pass
    return 0.0


def run_cli(extra, kill_after_epoch=0, log_path=None):
    """Run the CLI as a subprocess, stream + parse stdout. Returns
    (events, rc, peak_rss)."""
    cmd = [sys.executable, "-u", "-c",
           "import sys; from digat_tpu.cli import main; main(sys.argv[1:])"
           ] + CLI_FLAGS + extra
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=REPO)
    events = []
    peak_rss = 0.0
    t0 = time.time()
    log = open(log_path, "w") if log_path else None
    try:
        for line in proc.stdout:
            line = line.rstrip("\n")
            print(f"  | {line}", flush=True)
            if log:
                log.write(line + "\n")
                log.flush()
            peak_rss = max(peak_rss, rss_of(proc.pid))
            m = re.match(r"Epoch (\d+): train done .*\| ([\d.]+)s \| "
                         r"lr=([\deE.+-]+) \| ([\d,]+) samples/s", line)
            if m:
                events.append(dict(
                    kind="train", epoch=int(m.group(1)), t=time.time() - t0,
                    wall_s=float(m.group(2)), lr=float(m.group(3)),
                    samples_per_s=float(m.group(4).replace(",", "")),
                    rss_gb=peak_rss,
                ))
            m = re.match(r"Epoch (\d+): dev AUC=([\d.]+) MRR=([\d.]+) "
                         r"nDCG@5=([\d.]+) nDCG@10=([\d.]+)", line)
            if m:
                events.append(dict(
                    kind="dev", epoch=int(m.group(1)), t=time.time() - t0,
                    auc=float(m.group(2)), mrr=float(m.group(3)),
                    ndcg5=float(m.group(4)), ndcg10=float(m.group(5)),
                    rss_gb=peak_rss,
                ))
                if kill_after_epoch and int(m.group(1)) == kill_after_epoch:
                    # give the best-ckpt write a moment, then hard-kill
                    time.sleep(20)
                    print(f"[protocol] SIGKILL pid {proc.pid} after epoch "
                          f"{kill_after_epoch} dev", flush=True)
                    proc.send_signal(signal.SIGKILL)
                    break
            m = re.match(r"\[test\] epoch (\d+): AUC=([\d.]+) MRR=([\d.]+) "
                         r"nDCG@5=([\d.]+) nDCG@10=([\d.]+) \(([\d.]+)s\)", line)
            if m:
                events.append(dict(
                    kind="test", best_epoch=int(m.group(1)),
                    t=time.time() - t0,
                    auc=float(m.group(2)), mrr=float(m.group(3)),
                    ndcg5=float(m.group(4)), ndcg10=float(m.group(5)),
                    eval_s=float(m.group(6)), rss_gb=peak_rss,
                ))
        rc = proc.wait(timeout=120)
    finally:
        if log:
            log.close()
        if proc.poll() is None:
            proc.kill()
    return events, rc, peak_rss


def probe_tunnel(max_wait=600):
    """Killed clients can wedge the axon tunnel; probe with a trivial
    program until it answers (kill the probe itself if it hangs)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones(8).sum()), jax.devices())"],
                timeout=120, capture_output=True, text=True, cwd=REPO,
            )
            if out.returncode == 0 and "8.0" in out.stdout:
                print(f"[protocol] tunnel ok ({time.time() - t0:.0f}s)",
                      flush=True)
                return
        except subprocess.TimeoutExpired:
            pass
        print("[protocol] tunnel probe failed; retrying", flush=True)
        time.sleep(15)
    raise RuntimeError("tunnel did not recover")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kill-after-epoch", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "tpu_large_protocol.json"))
    args = ap.parse_args()

    from digat_tpu.data import synthetic
    import scripts.tpu_large_epoch as large

    root = os.path.join(DATA_ROOT, "synthetic")
    if not os.path.exists(os.path.join(root, "train", "behaviors.tsv")):
        print("[protocol] generating MIND-large-magnitude dataset", flush=True)
        synthetic.generate(root, **large.DATA)

    report = {"kill_after_epoch": args.kill_after_epoch, "phases": []}

    print("[protocol] phase 1: train to kill point", flush=True)
    t0 = time.time()
    ev1, rc1, rss1 = run_cli(
        [], kill_after_epoch=args.kill_after_epoch,
        log_path=os.path.join(REPO, "docs", "tpu_large_phase1.log"))
    report["phases"].append(dict(name="train-then-kill", events=ev1,
                                 rc=rc1, wall_s=time.time() - t0,
                                 peak_rss_gb=rss1))

    probe_tunnel()

    # newest run dir of this model under RUN_ROOT/synthetic/<model>/#N
    model_dirs = os.path.join(RUN_ROOT, "synthetic")
    model_name = os.listdir(model_dirs)[0]
    runs = sorted(
        (d for d in os.listdir(os.path.join(model_dirs, model_name))
         if d.startswith("#")), key=lambda d: int(d[1:]))
    ckpt = os.path.join(model_dirs, model_name, runs[-1], "best.ckpt")
    assert os.path.exists(ckpt), f"no checkpoint at {ckpt}"
    print(f"[protocol] phase 2: resume from {ckpt}", flush=True)

    t0 = time.time()
    ev2, rc2, rss2 = run_cli(
        ["--resume", ckpt],
        log_path=os.path.join(REPO, "docs", "tpu_large_phase2.log"))
    report["phases"].append(dict(name="resume-to-completion", events=ev2,
                                 rc=rc2, wall_s=time.time() - t0,
                                 peak_rss_gb=rss2))
    report["ok"] = bool(
        rc2 == 0
        and any(e["kind"] == "test" for e in ev2)
        and max((e["epoch"] for e in ev2 if e["kind"] == "dev"), default=0)
        >= args.kill_after_epoch + 1
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[protocol] wrote {args.out}; ok={report['ok']}", flush=True)


if __name__ == "__main__":
    main()
