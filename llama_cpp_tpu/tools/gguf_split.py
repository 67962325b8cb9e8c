"""GGUF shard/merge tool (gguf-split analog, reference tools/gguf-split)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..gguf.constants import Keys
from ..gguf.reader import read_gguf, split_paths
from ..gguf.writer import GGUFWriter


def split(src: str, dst_prefix: str, max_tensors: int = 128, max_bytes: int = 0):
    f = read_gguf(src)
    items = list(f.tensors.items())
    shards: list[list] = [[]]
    size = 0
    for name, info in items:
        cur = shards[-1]
        if (max_tensors and len(cur) >= max_tensors) or (
            max_bytes and size + info.n_bytes > max_bytes and cur
        ):
            shards.append([])
            size = 0
            cur = shards[-1]
        cur.append((name, info))
        size += info.n_bytes
    n = len(shards)
    paths = []
    for i, shard in enumerate(shards):
        w = GGUFWriter()
        if i == 0:
            for k, v in f.metadata.items():
                w.add(k, v)
        w.add(Keys.Split.NO, np.uint16(i))
        w.add(Keys.Split.COUNT, np.uint16(n))
        w.add(Keys.Split.TENSORS_COUNT, np.int32(len(items)))
        for name, info in shard:
            w.add_tensor(name, np.asarray(info.data).tobytes(), info.ne, info.dtype)
        path = f"{dst_prefix}-{i + 1:05d}-of-{n:05d}.gguf"
        w.write(path)
        paths.append(path)
    return paths


def merge(src: str, dst: str):
    f = read_gguf(src)  # reader already follows shards
    w = GGUFWriter()
    for k, v in f.metadata.items():
        if k.startswith("split."):
            continue
        w.add(k, v)
    for name, info in f.tensors.items():
        w.add_tensor(name, np.asarray(info.data).tobytes(), info.ne, info.dtype)
    w.write(dst)
    return dst


def main(argv=None):
    ap = argparse.ArgumentParser("gguf-split (TPU)")
    ap.add_argument("mode", choices=("split", "merge"))
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--max-tensors", type=int, default=128)
    ap.add_argument("--max-size-mb", type=int, default=0)
    args = ap.parse_args(argv)
    if args.mode == "split":
        paths = split(args.src, args.dst, args.max_tensors, args.max_size_mb * 1024 * 1024)
        print("\n".join(paths))
    else:
        print(merge(args.src, args.dst))


if __name__ == "__main__":
    main()
