"""export-lora: merge a LoRA adapter into a base GGUF
(reference tools/export-lora/export-lora.cpp).

Each matching tensor is dequantized, W + scale·B@A applied, and requantized
to its original storage type; everything else is copied verbatim.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import read_gguf
from ..gguf.writer import GGUFWriter
from ..quant.dequant import dequantize_tensor
from ..quant.quantize import quantize
from ..models.adapters import load_lora
from ..models.loader import GLOBAL_TENSORS, LAYER_TENSORS


def _lora_key(name: str):
    if name in GLOBAL_TENSORS:
        return ("global", GLOBAL_TENSORS[name])
    if name.startswith("blk."):
        parts = name.split(".", 2)
        wk = LAYER_TENSORS.get(parts[2])
        if wk is not None:
            return ("layer", int(parts[1]), wk)
    return None


def merge_lora(base_path: str, lora_path: str, out_path: str,
               scale: float = 1.0) -> int:
    base = read_gguf(base_path)
    adapter = load_lora(lora_path)
    s = scale * adapter.alpha / max(adapter.rank, 1)

    w = GGUFWriter()
    for k, v in base.metadata.items():
        w.add(k, v)

    n_merged = 0
    for name, info in base.tensors.items():
        key = _lora_key(name)
        raw = np.asarray(info.data)
        if key is not None and key in adapter.tensors:
            a, b = adapter.tensors[key]
            W = dequantize_tensor(raw, info.dtype, info.shape).astype(np.float32)
            W = W + s * (b.astype(np.float32) @ a.astype(np.float32))
            dt = GGMLType(info.dtype)
            if dt in (GGMLType.F32,):
                data = W.astype(np.float32).tobytes()
            elif dt == GGMLType.F16:
                data = W.astype(np.float16).tobytes()
            else:
                try:
                    data = quantize(W, dt).tobytes()
                except (KeyError, NotImplementedError):
                    dt = GGMLType.F16
                    data = W.astype(np.float16).tobytes()
            w.add_tensor(name, data, tuple(reversed(W.shape)), dt)
            n_merged += 1
        else:
            w.add_tensor(name, raw.tobytes(), tuple(reversed(info.shape)),
                         GGMLType(info.dtype))
    w.write(out_path)
    return n_merged


def main(argv=None):
    ap = argparse.ArgumentParser("export-lora (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--lora", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--lora-scale", type=float, default=1.0)
    args = ap.parse_args(argv)
    n = merge_lora(args.model, args.lora, args.output, args.lora_scale)
    print(f"merged {n} tensors -> {args.output}")


if __name__ == "__main__":
    main()
