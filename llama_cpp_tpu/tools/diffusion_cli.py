"""Diffusion-LM CLI (reference examples/diffusion/diffusion-cli.cpp analog).

    python -m llama_cpp_tpu.tools.diffusion_cli -m model.gguf -p "..." \
        --diffusion-steps 64 --diffusion-algorithm confidence
"""

from __future__ import annotations

import argparse
import sys

from ..models.loader import load_model
from ..runtime.context import Context
from ..runtime.diffusion import ALGORITHMS, DiffusionParams, diffusion_generate


def main(argv=None):
    ap = argparse.ArgumentParser("llama-diffusion-cli")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("--diffusion-steps", type=int, default=64)
    ap.add_argument("--diffusion-algorithm", default="confidence",
                    choices=ALGORITHMS)
    ap.add_argument("--diffusion-max-length", type=int, default=128)
    ap.add_argument("--diffusion-block-length", type=int, default=0,
                    help="enable block schedule with this block size")
    ap.add_argument("--diffusion-eps", type=float, default=1e-3)
    ap.add_argument("--diffusion-alg-temp", type=float, default=0.0)
    ap.add_argument("--diffusion-add-gumbel-noise", action="store_true")
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--diffusion-visual", action="store_true",
                    help="print the sequence at every step")
    args = ap.parse_args(argv)

    model = load_model(args.model)
    if not model.cfg.extra.get("diffusion"):
        print(f"warning: arch {model.cfg.arch!r} is not a diffusion LM",
              file=sys.stderr)
    ctx = Context(model, n_ctx=args.diffusion_max_length, n_seqs=1,
                  n_ubatch=args.diffusion_max_length)
    tok = model.tokenizer
    prompt_ids = tok.encode(args.prompt) if tok else []

    p = DiffusionParams(
        steps=args.diffusion_steps,
        max_length=args.diffusion_max_length,
        algorithm=args.diffusion_algorithm,
        schedule="block" if args.diffusion_block_length else "timestep",
        block_length=args.diffusion_block_length or 32,
        temperature=args.temp,
        eps=args.diffusion_eps,
        alg_temp=args.diffusion_alg_temp,
        seed=args.seed,
        add_gumbel_noise=args.diffusion_add_gumbel_noise,
    )

    def cb(step, seq):
        if args.diffusion_visual and tok:
            print(f"\rstep {step}: {tok.decode([int(t) for t in seq])!r}",
                  end="", file=sys.stderr)

    out = diffusion_generate(ctx, prompt_ids, p, step_cb=cb)
    if args.diffusion_visual:
        print(file=sys.stderr)
    print(tok.decode(out) if tok else out)


if __name__ == "__main__":
    main()
