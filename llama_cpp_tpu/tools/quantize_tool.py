"""GGUF -> GGUF requantization tool (llama-quantize analog).

Parity: reference src/llama-quant.cpp — per-tensor target types chosen by
role/ftype heuristics (llama_tensor_get_type_impl :424), imatrix-weighted
quantization, dry-run sizing; tools/quantize CLI surface.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from ..gguf.constants import GGML_BLOCK_LAYOUT, FileType, GGMLType
from ..gguf.reader import read_gguf
from ..gguf.writer import GGUFWriter
from ..quant.dequant import dequantize_tensor
from ..quant.quantize import IMATRIX_AWARE, _QUANT, quantize

# ftype string -> (default type, FileType id)
FTYPES = {
    "f32": (GGMLType.F32, FileType.ALL_F32),
    "f16": (GGMLType.F16, FileType.MOSTLY_F16),
    "bf16": (GGMLType.BF16, FileType.MOSTLY_BF16),
    "q8_0": (GGMLType.Q8_0, FileType.MOSTLY_Q8_0),
    "q4_0": (GGMLType.Q4_0, FileType.MOSTLY_Q4_0),
    "q4_1": (GGMLType.Q4_1, FileType.MOSTLY_Q4_1),
    "q5_0": (GGMLType.Q5_0, FileType.MOSTLY_Q5_0),
    "q5_1": (GGMLType.Q5_1, FileType.MOSTLY_Q5_1),
    "q2_k": (GGMLType.Q2_K, FileType.MOSTLY_Q2_K),
    "q3_k_m": (GGMLType.Q3_K, FileType.MOSTLY_Q3_K_M),
    "q4_k_s": (GGMLType.Q4_K, FileType.MOSTLY_Q4_K_S),
    "q4_k_m": (GGMLType.Q4_K, FileType.MOSTLY_Q4_K_M),
    "q5_k_s": (GGMLType.Q5_K, FileType.MOSTLY_Q5_K_S),
    "q5_k_m": (GGMLType.Q5_K, FileType.MOSTLY_Q5_K_M),
    "q6_k": (GGMLType.Q6_K, FileType.MOSTLY_Q6_K),
    "mxfp4": (GGMLType.MXFP4, FileType.MOSTLY_MXFP4),
    "iq4_nl": (GGMLType.IQ4_NL, FileType.MOSTLY_IQ4_NL),
    "iq4_xs": (GGMLType.IQ4_XS, FileType.MOSTLY_IQ4_XS),
    "iq3_s": (GGMLType.IQ3_S, FileType.MOSTLY_IQ3_S),
    "iq2_xs": (GGMLType.IQ2_XS, FileType.MOSTLY_IQ2_XS),
}


def tensor_target_type(
    name: str, shape: tuple[int, ...], default: GGMLType, ftype_name: str
) -> GGMLType:
    """Role-based type selection (reference llama_tensor_get_type_impl:424
    policy, condensed): embeddings/output and attn_v get a bump at low-bit
    ftypes; 1-D and non-256-divisible tensors stay f32."""
    if len(shape) == 1 or shape[-1] % 256 != 0 or "norm" in name or name.endswith(".bias"):
        return GGMLType.F32
    low_bit = default in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_0, GGMLType.Q4_K)
    if name == "output.weight" and low_bit:
        return GGMLType.Q6_K
    if name == "token_embd.weight" and default == GGMLType.Q2_K:
        return GGMLType.Q4_K
    if "_m" in ftype_name:
        # "_M" mixes: bump attn_v / ffn_down on some layers
        if ".attn_v.weight" in name and default == GGMLType.Q4_K:
            return GGMLType.Q6_K
        if ".attn_v.weight" in name and default == GGMLType.Q5_K:
            return GGMLType.Q6_K
    return default


def quantize_model(
    src_path: str,
    dst_path: str,
    ftype: str = "q4_k_m",
    imatrix: dict[str, np.ndarray] | None = None,
    dry_run: bool = False,
    progress=None,
) -> dict[str, Any]:
    ftype = ftype.lower()
    if ftype not in FTYPES:
        raise ValueError(f"unknown ftype {ftype}; have {sorted(FTYPES)}")
    default_type, ftype_id = FTYPES[ftype]
    if default_type not in _QUANT and default_type not in (
        GGMLType.F32, GGMLType.F16, GGMLType.BF16,
    ):
        raise ValueError(f"no quantizer for {default_type.name}")

    f = read_gguf(src_path)
    w = GGUFWriter()
    for k, v in f.metadata.items():
        w.add(k, v)
    w.add("general.file_type", np.uint32(int(ftype_id)))
    w.add("general.quantization_version", np.uint32(2))

    stats = {"n_tensors": 0, "in_bytes": 0, "out_bytes": 0, "per_type": {}}
    t0 = time.time()
    for i, (name, info) in enumerate(f.tensors.items()):
        target = tensor_target_type(name, info.shape, default_type, ftype)
        data = None
        if target == info.dtype:
            data = np.asarray(info.data).tobytes()
        else:
            arr = dequantize_tensor(np.asarray(info.data), info.dtype, info.shape)
            qw = None
            if imatrix is not None and target in IMATRIX_AWARE:
                row_w = imatrix.get(name)
                if row_w is not None and row_w.shape[0] == info.shape[-1]:
                    qw = np.broadcast_to(row_w, arr.shape)
            data = quantize(arr, target, qw=qw).tobytes()
        out_size = len(data)
        stats["n_tensors"] += 1
        stats["in_bytes"] += info.n_bytes
        stats["out_bytes"] += out_size
        stats["per_type"][target.name] = stats["per_type"].get(target.name, 0) + 1
        if not dry_run:
            w.add_tensor(name, data, info.ne, target)
        if progress:
            progress(i + 1, len(f.tensors), name, target.name)
    if not dry_run:
        w.write(dst_path)
    stats["t_s"] = time.time() - t0
    return stats


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("llama-quantize (TPU)")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", nargs="?", default="q4_k_m")
    ap.add_argument("--imatrix", help="imatrix .npz file")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    imatrix = None
    if args.imatrix:
        imatrix = dict(np.load(args.imatrix))

    def prog(i, n, name, t):
        print(f"[{i:4d}/{n}] {name} -> {t}", flush=True)

    stats = quantize_model(args.src, args.dst, args.ftype, imatrix,
                           dry_run=args.dry_run, progress=prog)
    mb = 1024 * 1024
    print(
        f"done: {stats['n_tensors']} tensors, "
        f"{stats['in_bytes']/mb:.1f} MiB -> {stats['out_bytes']/mb:.1f} MiB "
        f"in {stats['t_s']:.1f}s; types: {stats['per_type']}"
    )


if __name__ == "__main__":
    main()
