"""Ablation sweep driver.

Runs the experiment grid the reference documents as separate shell
invocations (README.md:21-50): graph-encoder ablations, SAG geometry
(neighbors 1-8, hops 1-4), graph depth (1-7), news-encoder choice — each
point a full train + dev/test cycle, results landing in the shared
results tree for `eval.aggregate`.

Usage:
    python -m digat_tpu.sweep --dataset MIND-small \
        --axis graph_encoder=DIGAT,wo_SA,Seq_SA \
        --axis graph_depth=1,2,3
Axes combine as a cartesian product. Each point reuses every cached
artifact that its config keys share with previous points (SAG sweeps only
rebuild the news-graph artifact).
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import sys
from typing import Dict, List, Sequence, Tuple

from digat_tpu import cli
from digat_tpu.config import Config
from digat_tpu.eval.aggregate import aggregate


def parse_axis(spec: str) -> Tuple[str, List[str]]:
    name, _, values = spec.partition("=")
    assert values, f"axis spec '{spec}' needs name=v1,v2,..."
    return name, values.split(",")


def _coerce(cfg_field_type, value: str):
    if cfg_field_type is int:
        return int(value)
    if cfg_field_type is float:
        return float(value)
    if cfg_field_type is bool:
        return value.lower() in ("1", "true", "yes")
    return value


def sweep_points(base: Config, axes: Sequence[Tuple[str, List[str]]]):
    field_types = {f.name: type(f.default) for f in dataclasses.fields(Config)}
    names = [a[0] for a in axes]
    for combo in itertools.product(*[a[1] for a in axes]):
        cfg = dataclasses.replace(base)
        for name, value in zip(names, combo):
            setattr(cfg, name, _coerce(field_types[name], value))
        yield dict(zip(names, combo)), cfg.validate()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="digat_tpu ablation sweeps")
    parser.add_argument("--axis", action="append", default=[], help="name=v1,v2,...")
    parser.add_argument("--base", nargs=argparse.REMAINDER, default=[],
                        help="remaining args parsed as the base Config")
    known, rest = parser.parse_known_args(argv)
    base = Config.from_args((known.base or []) + rest)
    axes = [parse_axis(s) for s in known.axis]
    points = list(sweep_points(base, axes))
    print(f"[sweep] {len(points)} points over axes {[a[0] for a in axes]}")
    for i, (combo, cfg) in enumerate(points):
        print(f"[sweep] point {i + 1}/{len(points)}: {combo}")
        cli.run_train(cfg)
    for mode in ("dev", "test"):
        overall = aggregate(base.run_root, base.dataset, mode)
        for name, m in overall.items():
            print("[sweep %s] %s AUC=%.4f MRR=%.4f nDCG@5=%.4f nDCG@10=%.4f"
                  % (mode, name, *m))


if __name__ == "__main__":
    main(sys.argv[1:])
