"""MIND dataset acquisition and split preparation.

Equivalent of the reference's prepare_MIND_dataset.py:

  * MIND-small: download train/dev archives, then re-split the official
    train behaviors 95/5 into local train/dev and reuse the official dev
    split as the local test split (prepare_MIND_dataset.py:56-126);
  * MIND-large: download train/dev/test as-is.

Downloads use urllib (no shelling out to wget) and are skipped when the
files already exist, so pre-staged data works in offline environments —
just place the official zips under <root>/download/ or the extracted
train/dev(/test) directories in place.
"""

from __future__ import annotations

import os
import random
import shutil
import urllib.request
import zipfile
from typing import List, Tuple

MIND_URLS = {
    "MIND-small": {
        "train": "https://mind201910small.blob.core.windows.net/release/MINDsmall_train.zip",
        "dev": "https://mind201910small.blob.core.windows.net/release/MINDsmall_dev.zip",
    },
    "MIND-large": {
        "train": "https://mind201910small.blob.core.windows.net/release/MINDlarge_train.zip",
        "dev": "https://mind201910small.blob.core.windows.net/release/MINDlarge_dev.zip",
        "test": "https://mind201910small.blob.core.windows.net/release/MINDlarge_test.zip",
    },
}
TRAIN_RATIO = 0.95  # prepare_MIND_dataset.py:9


def _download_extract(root: str, dataset: str) -> None:
    dl = os.path.join(root, "download")
    os.makedirs(dl, exist_ok=True)
    for split, url in MIND_URLS[dataset].items():
        out_dir = os.path.join(dl, split)
        if os.path.exists(out_dir):
            continue
        zip_path = os.path.join(dl, os.path.basename(url))
        if not os.path.exists(zip_path):
            print(f"[prepare] downloading {url}")
            urllib.request.urlretrieve(url, zip_path)
        os.makedirs(out_dir, exist_ok=True)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(out_dir)


def split_behaviors(lines: List[str], seed: int = 0) -> Tuple[List[str], List[str]]:
    """95/5 random split of behavior lines: shuffle once, mark a uniform
    random 95% subset of positions as train, keep both splits in shuffled
    order. Distribution-identical to the reference's split_training_behaviors
    (prepare_MIND_dataset.py:56-77), which additionally shuffles the id list
    before sampling — a no-op, since `random.sample` over a permuted
    population is still a uniform subset. (The reference seeds the global
    RNGs with 0; here the split is self-seeded and deterministic.)"""
    rng = random.Random(seed)
    shuffled = list(lines)
    rng.shuffle(shuffled)
    train_ids = set(rng.sample(range(len(lines)), int(len(lines) * TRAIN_RATIO)))
    train = [l for i, l in enumerate(shuffled) if i in train_ids]
    dev = [l for i, l in enumerate(shuffled) if i not in train_ids]
    return train, dev


def _copy_if_exists(src: str, dst: str) -> None:
    if os.path.exists(src) and not os.path.exists(dst):
        shutil.copyfile(src, dst)


def prepare_mind_small(root: str, seed: int = 0) -> None:
    """root: e.g. data/MIND-small. Produces train/ dev/ test/ subdirs."""
    _download_extract(root, "MIND-small")
    dl = os.path.join(root, "download")
    with open(os.path.join(dl, "train", "behaviors.tsv"), encoding="utf-8") as f:
        lines = [l for l in f if l.strip()]
    train_lines, dev_lines = split_behaviors(lines, seed)
    for split, blines, news_src in [
        ("train", train_lines, "train"),
        ("dev", dev_lines, "train"),
        ("test", None, "dev"),
    ]:
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        bpath = os.path.join(d, "behaviors.tsv")
        if not os.path.exists(bpath):
            if blines is None:  # official dev becomes local test
                shutil.copyfile(os.path.join(dl, "dev", "behaviors.tsv"), bpath)
            else:
                with open(bpath, "w", encoding="utf-8") as f:
                    f.writelines(blines)
        _copy_if_exists(
            os.path.join(dl, news_src, "news.tsv"), os.path.join(d, "news.tsv")
        )
        for extra in ("entity_embedding.vec", "relation_embedding.vec"):
            _copy_if_exists(os.path.join(dl, news_src, extra), os.path.join(d, extra))


def prepare_mind_large(root: str) -> None:
    _download_extract(root, "MIND-large")
    dl = os.path.join(root, "download")
    for split in ("train", "dev", "test"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for name in ("behaviors.tsv", "news.tsv"):
            _copy_if_exists(os.path.join(dl, split, name), os.path.join(d, name))


def prepare(dataset: str, data_root: str, seed: int = 0) -> None:
    root = os.path.join(data_root, dataset)
    done = all(
        os.path.exists(os.path.join(root, s, "behaviors.tsv"))
        for s in ("train", "dev", "test")
    )
    if done:
        return
    if dataset == "MIND-small":
        prepare_mind_small(root, seed)
    elif dataset == "MIND-large":
        prepare_mind_large(root)
    else:
        raise ValueError(f"unknown dataset {dataset}")
