"""One-time extraction of the IQ-quant codebook LUTs into iq_grids.npz.

The IQ formats (IQ1/IQ2/IQ3) store 8-element vector indices into fixed codebook
grids. The grids are pure numeric data required for bit-exact format
compatibility (reference: ggml/src/ggml-common.h tables iq2xxs_grid etc.); this
script parses them out of the reference header once and stores them as a
compressed numpy archive committed to the repo, so the runtime never depends on
the reference checkout.

Usage: python scripts/extract_iq_grids.py [path-to-ggml-common.h]
"""

from __future__ import annotations

import re
import sys

import numpy as np

DEFAULT_SRC = "/root/reference/ggml/src/ggml-common.h"

TABLES = {
    # name -> numpy dtype
    "kmask_iq2xs": np.uint8,
    "ksigns_iq2xs": np.uint8,
    "iq2xxs_grid": np.uint64,
    "iq2xs_grid": np.uint64,
    "iq2s_grid": np.uint64,
    "iq3xxs_grid": np.uint32,
    "iq3s_grid": np.uint32,
    "iq1s_grid": np.uint64,
    "kvalues_iq4nl": np.int8,
    "kvalues_fp4": np.int8,
}


def extract(src_path: str) -> dict[str, np.ndarray]:
    text = open(src_path).read()
    out = {}
    for name, dtype in TABLES.items():
        m = re.search(
            r"GGML_TABLE_BEGIN\(\w+,\s*" + name + r",\s*\w+\)(.*?)GGML_TABLE_END",
            text,
            re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found in {src_path}")
        body = m.group(1)
        vals = re.findall(r"-?0x[0-9a-fA-F]+|-?\d+", body)
        arr = np.array([int(v, 0) for v in vals], dtype=np.int64 if "-" in body else np.uint64)
        out[name] = arr.astype(dtype)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    tables = extract(src)
    for k, v in tables.items():
        print(f"{k}: {v.shape} {v.dtype} first={v[:4]}")
    np.savez_compressed("llama_cpp_tpu/quant/iq_grids.npz", **tables)
    print("wrote llama_cpp_tpu/quant/iq_grids.npz")
