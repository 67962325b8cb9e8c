#!/usr/bin/env python
"""Quantization quality gates: ΔPPL + KL-divergence per quant tier on the
SAME weights (VERDICT r1 item 2; reference methodology tools/perplexity/
README.md:49-91 — per-quant PPL ladder on one base model).

Real checkpoints are not downloadable here, and a random-weight model has no
PPL gradient, so the harness (a) trains a small llama on a deterministic
synthetic corpus until it has real structure, (b) saves the trained weights
as f32 GGUF, (c) requantizes that one file through the quantize tool into
descending-bit tiers, and (d) measures wikitext-style PPL + KL vs the f32
logits on held-out text. The gate asserts the reference's tier ORDERING
(ΔPPL grows as bits shrink; q8_0 ΔPPL ~ 0) — the shape-free reproducible
part of BASELINE.md's table.

Usage: python scripts/quality_gates.py [--steps 600] [--out docs/quality_gates.md]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and the cat sat on the mat near the door "
    "of the old stone house where a small red hen found a grain of wheat "
    "and asked who will help me plant this wheat said the hen not i said "
    "the duck not i said the pig then i will do it myself she said and so "
    "she did the sun rose over the green hills and the river ran down to "
    "the sea where the boats waited for the morning tide to come in "
)


def gen_corpus(n_chars: int, seed: int = 0) -> str:
    """Deterministic order-3 character Markov text from SEED_TEXT."""
    rng = np.random.default_rng(seed)
    trans: dict[str, list[str]] = {}
    t = SEED_TEXT
    for i in range(len(t) - 3):
        trans.setdefault(t[i : i + 3], []).append(t[i + 3])
    out = list(t[:3])
    key = t[:3]
    for _ in range(n_chars):
        nxt = trans.get(key)
        if not nxt:
            key = t[:3]
            continue
        c = nxt[rng.integers(0, len(nxt))]
        out.append(c)
        key = key[1:] + c
    return "".join(out)


def save_llama_f32_gguf(model, path: str, src_md: dict):
    """Write the (trained) dense-f32 param tree back to a llama GGUF."""
    from llama_cpp_tpu.gguf.constants import GGMLType
    from llama_cpp_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter()
    for k, v in src_md.items():
        w.add(k, v)

    def emit(name, arr):
        arr = np.ascontiguousarray(np.asarray(arr), dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    p = model.params
    emit("token_embd.weight", p["token_embd"])
    emit("output_norm.weight", p["output_norm"])
    if "output" in p:
        emit("output.weight", p["output"])
    names = {
        "attn_norm": "attn_norm.weight", "attn_q": "attn_q.weight",
        "attn_k": "attn_k.weight", "attn_v": "attn_v.weight",
        "attn_output": "attn_output.weight", "ffn_norm": "ffn_norm.weight",
        "ffn_gate": "ffn_gate.weight", "ffn_up": "ffn_up.weight",
        "ffn_down": "ffn_down.weight",
    }
    for i, lw in enumerate(p["layers"]):
        for key, suffix in names.items():
            if key in lw:
                emit(f"blk.{i}.{suffix}", lw[key])
    w.write(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--n-ctx", type=int, default=128)
    ap.add_argument(
        "--tiers",
        default="q8_0,q4_k_m,iq4_xs,q3_k_m,iq3_s,q2_k,iq2_xs")
    ap.add_argument("--out", default="docs/quality_gates.md")
    ap.add_argument("--tmp", default="/tmp/quality_gates")
    ap.add_argument("--reuse", action="store_true",
                    help="skip train/quantize when tier files already exist")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon plugin's get_backend hook ignores JAX_PLATFORMS and can
        # block on a dead tunnel; the config knob is honored before init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.flash_attn import set_force_flash

    # the Pallas flash kernel has no JVP rule; training + the f32 PPL oracle
    # both use the (differentiable, exact) einsum attention path
    set_force_flash(False)

    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.runtime.training import train_epoch
    from llama_cpp_tpu.testing import make_tiny_llama_gguf
    from llama_cpp_tpu.tools.perplexity import kl_divergence, perplexity
    from llama_cpp_tpu.tools.quantize_tool import main as quantize_main
    from llama_cpp_tpu.gguf.reader import read_gguf

    os.makedirs(args.tmp, exist_ok=True)
    base = os.path.join(args.tmp, "base_f32.gguf")
    trained = os.path.join(args.tmp, "trained_f32.gguf")
    reuse = args.reuse and os.path.exists(trained)
    if not reuse:
        # dims must stay 256-divisible or the role heuristics keep tensors
        # f32; depth matters more than width: low-bit error has to COMPOUND
        # through layers for the 2-bit tiers to show a real ΔPPL signal
        make_tiny_llama_gguf(base, vocab_size=512, n_layers=10, n_embd=256,
                             n_heads=8, n_kv_heads=4, n_ff=1024, ftype="f32",
                             n_ctx=1024, seed=11)
        model = load_model(base, prefer_quant=False, dense_dtype=jnp.float32,
                           fuse=False)  # separate q/k/v for the GGUF saver
        tok = model.tokenizer
    else:
        tok = load_model(trained, prefer_quant=False).tokenizer

    corpus = gen_corpus(420_000, seed=0)
    ids = tok.encode(corpus, add_special=False, parse_special=False)
    split = int(len(ids) * 0.9)
    train_ids, test_ids = ids[:split], ids[split : split + 12000]
    print(f"# corpus: {len(ids)} tokens ({len(set(ids))} distinct)",
          file=sys.stderr)

    if not reuse:
        n = args.n_ctx
        chunks = []
        for off in range(0, len(train_ids) - n - 1, n):
            c = train_ids[off : off + n + 1]
            chunks.append((c[:-1], c[1:]))
        rng = np.random.default_rng(1)
        order = rng.permutation(len(chunks))
        dataset = [chunks[i] for i in order[: args.steps]]
        losses = train_epoch(model, dataset, lr=3e-3, n_ctx=n)
        print(f"# train loss {losses[0]:.3f} -> {np.mean(losses[-20:]):.3f}",
              file=sys.stderr)
        save_llama_f32_gguf(model, trained, read_gguf(base).metadata)

    tiers = ["f32"] + [t.strip() for t in args.tiers.split(",")]
    results = {}
    f32_logits = None
    for tier in tiers:
        if tier == "f32":
            path = trained
        else:
            path = os.path.join(args.tmp, f"trained_{tier}.gguf")
            if not (reuse and os.path.exists(path)):
                quantize_main([trained, path, tier])
        m = load_model(path, dense_dtype=jnp.float32,
                       prefer_quant=False if tier == "f32" else True)
        m.cfg.compute_dtype = jnp.float32  # isolate WEIGHT quant error
        ctx = Context(m, n_ctx=256, n_seqs=1)
        ppl = perplexity(ctx, tokens=test_ids, n_ctx=256)
        row = {"ppl": float(ppl.ppl), "ppl_err": float(ppl.ppl_err),
               "bytes": os.path.getsize(path)}
        if tier == "f32":
            from llama_cpp_tpu.tools.perplexity import eval_chunk_logits

            f32_logits = [
                eval_chunk_logits(ctx, test_ids[o : o + 256])
                for o in range(0, 8192, 256)
            ]
        else:
            from llama_cpp_tpu.tools.perplexity import eval_chunk_logits

            kls = []
            for j, o in enumerate(range(0, 8192, 256)):
                q = eval_chunk_logits(ctx, test_ids[o : o + 256])
                pe_ = f32_logits[j]
                # mean token KL(p_f32 || p_tier)
                p = pe_ - pe_.max(-1, keepdims=True)
                lp = p - np.log(np.exp(p).sum(-1, keepdims=True))
                qq = q - q.max(-1, keepdims=True)
                lq = qq - np.log(np.exp(qq).sum(-1, keepdims=True))
                kls.append(float(np.mean(np.sum(np.exp(lp) * (lp - lq), -1))))
            row["kl_mean"] = float(np.mean(kls))
        results[tier] = row
        ctx.reset()
        print(f"# {tier}: ppl={row['ppl']:.4f} "
              f"kl={row.get('kl_mean', 0.0):.5f}", file=sys.stderr)

    base_ppl = results["f32"]["ppl"]
    for t in results:
        results[t]["delta_ppl"] = results[t]["ppl"] - base_ppl

    # ---- gates: reference tier ordering (BASELINE.md ladder) ----
    # The reference's own ladder is monotone WITHIN a quant family, not
    # across families at equal size: BASELINE.md has IQ2_M (+2.3692, 2.7
    # bpw) BETTER than the larger Q2_K (+2.4207) and IQ4_XS (+0.2281)
    # worse than the larger Q4_K_S (+0.1781).  So the shape we assert is
    # per-family: K-quants ordered by bits, IQ tiers ordered by bits, with
    # KL(f32‖tier) as the strict instrument; ΔPPL comparisons carry the
    # measurement's own +/- standard error (the reference reports PPL the
    # same way, tools/perplexity/README.md) plus one coarse separation
    # gate at the 2-bit end.
    ordered = [t for t in tiers if t != "f32"]
    families = {
        "k": [t for t in ordered if not t.startswith("iq")],
        "iq": [t for t in ordered if t.startswith("iq")],
    }

    def monotone(ts, key, eps=None):
        vals = [results[t][key] for t in ts]
        for i in range(len(vals) - 1):
            band = eps if eps is not None else 2.0 * (
                results[ts[i]]["ppl_err"] + results[ts[i + 1]]["ppl_err"])
            if vals[i] > vals[i + 1] + band:
                return False
        return True

    gates = {
        "q8_near_lossless": abs(results.get("q8_0", {}).get("delta_ppl", 0))
        < 0.05 * base_ppl,
        "kl_ordering_k": monotone(families["k"], "kl_mean", 1e-4),
        "kl_ordering_iq": monotone(families["iq"], "kl_mean", 1e-4)
        if families["iq"] else True,
        "delta_ppl_ordering_k": monotone(families["k"], "delta_ppl"),
        "delta_ppl_ordering_iq": monotone(families["iq"], "delta_ppl")
        if families["iq"] else True,
    }
    if "q2_k" in results and "q4_k_m" in results:
        gates["low_bit_separation"] = (
            results["q2_k"]["delta_ppl"]
            > results["q4_k_m"]["delta_ppl"] + 0.01 * base_ppl)
    ok = all(gates.values())

    lines = ["# Quantization quality gates", "",
             "Same trained weights, requantized per tier through the "
             "quantize tool; PPL on held-out synthetic corpus; KL vs f32 "
             "logits (methodology: reference tools/perplexity/README.md).", "",
             "| tier | file bytes | PPL (± se) | ΔPPL | KL(f32‖tier) |",
             "|---|---|---|---|---|"]
    for t in tiers:
        r = results[t]
        lines.append(f"| {t} | {r['bytes']} | {r['ppl']:.4f} ± "
                     f"{r['ppl_err']:.4f} | {r['delta_ppl']:+.4f} | "
                     f"{r.get('kl_mean', 0.0):.5f} |")
    lines += ["", f"Gates: {json.dumps(gates)} -> "
              f"{'PASS' if ok else 'FAIL'}", ""]
    out = "\n".join(lines)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out)
    print(out)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
