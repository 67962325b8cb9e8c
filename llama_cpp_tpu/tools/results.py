"""Output-drift regression harness (reference tools/results: `llama-results
--check` snapshots model outputs vs a previous commit).

`record` stores greedy tokens + last-position logits for a set of prompts;
`check` re-runs and reports drift. Intended to be run before/after a change
with the same GGUF file.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

DEFAULT_PROMPTS = (
    [3, 7, 11, 19],
    [42, 42, 42, 42, 42, 42],
    [5, 9, 23, 9, 23, 9, 77, 42],
)


def snapshot(model_path: str, n_tokens: int = 16, prompts=DEFAULT_PROMPTS):
    from ..models.loader import load_model
    from ..runtime.context import Context

    model = load_model(model_path)
    out = []
    for prompt in prompts:
        ctx = Context(model, n_ctx=256, n_seqs=1)
        toks = ctx.generate(list(prompt), max_new_tokens=n_tokens)
        logits = ctx.prefill([toks[-1] if toks else 1])
        out.append({
            "prompt": list(prompt),
            "tokens": [int(t) for t in toks],
            "logits_head": [float(x) for x in np.asarray(logits[:32])],
        })
    return out


def check(model_path: str, baseline: list, n_tokens: int = 16,
          logit_tol: float = 5e-3) -> dict:
    cur = snapshot(model_path, n_tokens, [b["prompt"] for b in baseline])
    report = {"n": len(baseline), "token_mismatches": 0, "max_logit_drift": 0.0}
    for b, c in zip(baseline, cur):
        if b["tokens"] != c["tokens"]:
            report["token_mismatches"] += 1
        lb = np.asarray(b["logits_head"])
        lc = np.asarray(c["logits_head"])
        drift = float(np.abs(lb - lc).max() / (np.abs(lb).max() + 1e-9))
        report["max_logit_drift"] = max(report["max_logit_drift"], drift)
    report["ok"] = (report["token_mismatches"] == 0
                    and report["max_logit_drift"] < logit_tol)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser("llama-results (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-o", "--output", default="results.json")
    ap.add_argument("--check", default=None,
                    help="baseline json to compare against")
    ap.add_argument("-n", "--n-tokens", type=int, default=16)
    args = ap.parse_args(argv)

    if args.check:
        base = json.load(open(args.check))
        rep = check(args.model, base, args.n_tokens)
        print(json.dumps(rep))
        raise SystemExit(0 if rep["ok"] else 1)
    snap = snapshot(args.model, args.n_tokens)
    json.dump(snap, open(args.output, "w"))
    print(f"recorded {len(snap)} prompts -> {args.output}")


if __name__ == "__main__":
    main()
