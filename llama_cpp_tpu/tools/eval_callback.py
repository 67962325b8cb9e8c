"""Per-op activation dump for debugging a forward pass.

Analog of the reference's eval-callback example + common/debug.cpp
(common_debug_cb_eval / common_debug_print_tensor): run one prompt through
the model with the activation tap armed and print, for every captured
tensor, its name, shape, corner values and sum — with optional
abort-on-NaN. The tap points are the trace-time hooks the imatrix tool
already uses (models/transformer.py _tap: l_in / l_out / attn_* / ffn_*
GEMM inputs), so the dump shows exactly what the compiled graph computes
per layer.

Usage:
  python -m llama_cpp_tpu.tools.eval_callback -m model.gguf -p "hello" \
      [--keys l_in,l_out] [--n 3] [--abort-on-nan]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def format_tensor(arr: np.ndarray, n: int = 3) -> str:
    """Corner-printing like common_debug_print_tensor (first/last n of each
    axis with ... elision), plus the total sum."""
    a = np.asarray(arr, np.float32)
    lines = []

    def fmt_axis(v, depth):
        ind = "    " * (depth + 1)
        if v.ndim == 1:
            vals = []
            if len(v) > 2 * n:
                shown = [*v[:n], None, *v[-n:]]
            else:
                shown = list(v)
            for x in shown:
                vals.append("   ..." if x is None else f"{float(x):12.4f}")
            lines.append(ind + "[" + ", ".join(vals) + "  ],")
            return
        lines.append(ind + "[")
        if v.shape[0] > 2 * n:
            for r in v[:n]:
                fmt_axis(r, depth + 1)
            lines.append(ind + "    ..., ")
            for r in v[-n:]:
                fmt_axis(r, depth + 1)
        else:
            for r in v:
                fmt_axis(r, depth + 1)
        lines.append(ind + "],")

    fmt_axis(a, 0)
    lines.append(f"    sum = {float(a.sum()):f}")
    return "\n".join(lines)


def run_eval_callback(model_path: str, prompt_ids, keys=None, n: int = 3,
                      abort_on_nan: bool = False, out=sys.stdout,
                      model=None):
    """Forward `prompt_ids` once with taps armed; print each capture."""
    import jax

    from ..models import transformer
    from ..models.loader import load_model
    from ..runtime.context import Context

    captures = []

    def tap(il, key, val):
        if keys and key not in keys:
            return
        captures.append((il, key, np.asarray(val, np.float32)))

    if model is None:
        model = load_model(model_path, prefer_quant=False)
    ctx = Context(model, n_ctx=max(64, len(prompt_ids) + 8), n_seqs=1)
    transformer.set_activation_tap(tap)
    try:
        with jax.disable_jit():  # taps read concrete values per op
            ctx.prefill(list(prompt_ids), seq=0)
    finally:
        transformer.set_activation_tap(None)

    for il, key, arr in captures:
        print(f"blk.{il}.{key}: type = f32, ne = "
              f"{list(reversed(arr.shape))}", file=out)
        print(format_tensor(arr, n=n), file=out)
        if abort_on_nan and not np.isfinite(arr).all():
            print("encountered NaN - aborting", file=out)
            return captures
    return captures


def main(argv=None):
    ap = argparse.ArgumentParser("llama-eval-callback")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="hello world")
    ap.add_argument("--keys", default="",
                    help="comma-separated tap keys (default: all; e.g. "
                    "l_in,l_out,attn_output)")
    ap.add_argument("--n", type=int, default=3,
                    help="corner values per axis")
    ap.add_argument("--abort-on-nan", action="store_true")
    args = ap.parse_args(argv)

    from ..models.loader import load_model

    model = load_model(args.model, prefer_quant=False)
    ids = model.tokenizer.encode(args.prompt)
    print(f"prompt tokens: {ids}", file=sys.stderr)
    keys = {k.strip() for k in args.keys.split(",") if k.strip()} or None
    run_eval_callback(args.model, ids, keys=keys, n=args.n,
                      abort_on_nan=args.abort_on_nan, model=model)


if __name__ == "__main__":
    main()
