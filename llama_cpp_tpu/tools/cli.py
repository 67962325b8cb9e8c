"""Interactive / one-shot CLI (llama-cli analog, reference tools/cli).

Supports one-shot prompt completion, interactive chat with the model's chat
template, grammar constraints, and perf reporting.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("llama-cli (TPU)")
    ap.add_argument("-m", "--model", required=True, help="GGUF model path")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None, help="prompt from file")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--grammar", default=None)
    ap.add_argument("--grammar-file", default=None)
    ap.add_argument("--json-schema", default=None)
    ap.add_argument("-cnv", "--conversation", action="store_true")
    ap.add_argument("-md", "--model-draft", default=None,
                    help="draft model GGUF for speculative decoding")
    ap.add_argument("--draft-max", type=int, default=8,
                    help="tokens drafted per speculative step")
    ap.add_argument("--spec-ngram", action="store_true",
                    help="self-speculative n-gram (prompt lookup) drafting")
    ap.add_argument("--prompt-cache", default=None,
                    help="session file: reuse the cached prompt prefix "
                         "(reference --prompt-cache)")
    ap.add_argument("--mmproj", default=None, help="vision mmproj GGUF")
    ap.add_argument("--image", action="append", default=[],
                    help="image file(s); use <__media__> markers in prompt")
    ap.add_argument("--lora", default=None, help="LoRA adapter GGUF")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--control-vector", default=None)
    ap.add_argument("--control-vector-scale", type=float, default=1.0)
    ap.add_argument("--no-quant", action="store_true", help="dense bf16 weights")
    ap.add_argument("--kv-quant", action="store_true", help="int8 KV cache")
    ap.add_argument("--verbose-prompt", action="store_true")
    return ap


def main(argv=None):
    from .args import apply_env_and_preset
    from ..utils.logging import add_log_args, apply_log_args

    ap = build_parser()
    add_log_args(ap)
    args = apply_env_and_preset(ap, argv)
    apply_log_args(args)

    from ..models.loader import load_model
    from ..runtime.context import Context
    from ..sampling.samplers import SamplerChain, SamplingParams

    print(f"loading {args.model} ...", file=sys.stderr, flush=True)
    model = load_model(args.model, prefer_quant=not args.no_quant)
    tok = model.tokenizer
    ctx = Context(model, n_ctx=args.ctx_size, quantized_kv=args.kv_quant)
    print(
        f"arch={model.cfg.arch} layers={model.cfg.n_layers} "
        f"vocab={model.cfg.vocab_size} archs_ok", file=sys.stderr,
    )

    grammar = args.grammar
    if args.grammar_file:
        grammar = open(args.grammar_file).read()
    if args.json_schema:
        from ..sampling.json_schema import schema_to_gbnf

        grammar = schema_to_gbnf(args.json_schema)

    params = SamplingParams(
        temp=args.temp, top_k=args.top_k, top_p=args.top_p, min_p=args.min_p,
        penalty_repeat=args.repeat_penalty,
        seed=args.seed if args.seed >= 0 else 0xFFFFFFFF,
        grammar=grammar or "",
    )
    # model-embedded sampling defaults (general.sampling.*) fill any knob
    # the user left at its CLI default
    defaults = ap.parse_args([a for a in ("-m", args.model)])
    explicit = {f for f, a in (("temp", "temp"), ("top_k", "top_k"),
                               ("top_p", "top_p"), ("min_p", "min_p"),
                               ("penalty_repeat", "repeat_penalty"))
                if getattr(args, a) != getattr(defaults, a)}
    params = params.apply_gguf_defaults(model.gguf.metadata, explicit)

    if args.lora:
        from ..models.adapters import apply_lora, load_lora

        n = apply_lora(model, load_lora(args.lora), scale=args.lora_scale)
        print(f"lora: applied {n} tensors from {args.lora}", file=sys.stderr)
    if args.control_vector:
        from ..models.adapters import apply_control_vector, load_control_vector

        cv = load_control_vector(args.control_vector, model.cfg.n_layers,
                                 model.cfg.n_embd)
        apply_control_vector(model, cv, strength=args.control_vector_scale)
        print(f"control vector: {args.control_vector}", file=sys.stderr)

    speculator = None
    if args.model_draft:
        dmodel = load_model(args.model_draft, prefer_quant=not args.no_quant)
        if dmodel.cfg.arch == "eagle3":
            from ..models.eagle3 import Eagle3Speculator

            speculator = Eagle3Speculator(dmodel, model, n_ctx=args.ctx_size)
        elif dmodel.cfg.arch == "dflash":
            from ..models.dflash import DflashSpeculator

            speculator = DflashSpeculator(dmodel, model, n_ctx=args.ctx_size)
        elif dmodel.cfg.arch == "gemma4-assistant":
            from ..models.gemma3n import Gemma4AssistantSpeculator

            speculator = Gemma4AssistantSpeculator(dmodel, ctx)
        else:
            from ..runtime.speculative import DraftModelSpeculator

            speculator = DraftModelSpeculator(
                Context(dmodel, n_ctx=args.ctx_size))
    elif args.spec_ngram:
        from ..runtime.speculative import NgramSpeculator

        speculator = NgramSpeculator()

    mtmd = None
    if args.mmproj:
        from ..multimodal import MtmdModel

        mtmd = MtmdModel(args.mmproj)
        print(f"mmproj: {args.mmproj} ({mtmd.cfg.n_layers} vision layers)",
              file=sys.stderr)

    def run_once(prompt_text: str, seq_reset=True):
        if seq_reset:
            ctx.seq_rm(0)
        if mtmd is not None and args.image:
            from ..multimodal.mtmd import prefill_chunks, tokenize_chunks
            from ..sampling.samplers import SamplerChain as _SC

            images = [mtmd.encode(__import__("PIL.Image", fromlist=["open"])
                                  .open(p)) for p in args.image]
            chunks = tokenize_chunks(tok, prompt_text, images)
            logits = prefill_chunks(ctx, mtmd, chunks)
            sampler = _SC.from_params(params, tok.vocab)
            out = []
            import numpy as np

            for _ in range(args.n_predict):
                token = sampler.sample(np.asarray(logits, np.float32))
                if tok.is_eog(token):
                    break
                sys.stdout.write(tok.piece(token))
                sys.stdout.flush()
                out.append(token)
                logits = ctx.decode_one(token)
            sys.stdout.write("\n")
            return out
        ids = tok.encode(prompt_text, add_special=True, parse_special=True)
        if args.verbose_prompt:
            for t in ids:
                print(f"{t:7d} -> {tok.piece(t)!r}", file=sys.stderr)
        prefilled = None
        if args.prompt_cache:
            import os as _os

            from ..runtime.state import load_state, save_state

            cached = []
            if _os.path.exists(args.prompt_cache):
                try:
                    extra = load_state(ctx, args.prompt_cache)
                    cached = list(extra.get("tokens", []))
                except ValueError as e:
                    print(f"prompt cache ignored: {e}", file=sys.stderr)
            n_match = 0
            while (n_match < len(cached) and n_match < len(ids) - 1
                   and cached[n_match] == ids[n_match]):
                n_match += 1
            if n_match:
                ctx.seq_rm(0, p0=n_match)
                print(f"prompt cache: reused {n_match}/{len(ids)} tokens",
                      file=sys.stderr)
            else:
                ctx.seq_rm(0)
                n_match = 0
            prefilled = ctx.prefill(ids[n_match:])
            save_state(ctx, args.prompt_cache, extra={"tokens": list(ids)})
        if speculator is not None and not grammar and prefilled is None:
            from ..runtime.speculative import speculative_generate

            speculator.reset()
            sampler = SamplerChain.from_params(params, tok.vocab)
            out, stats = speculative_generate(
                ctx, speculator, ids, max_new_tokens=args.n_predict,
                n_draft=args.draft_max, sampler=sampler,
                stream=lambda t: (sys.stdout.write(tok.piece(t)), sys.stdout.flush()),
            )
            acc = stats["n_accept"] / max(stats["n_draft"], 1)
            print(f"\nspec: drafted {stats['n_draft']} accepted "
                  f"{stats['n_accept']} ({acc:.0%})", file=sys.stderr)
            return out
        sampler = SamplerChain.from_params(params, tok.vocab)
        gsampler = None
        if grammar:
            from ..sampling.grammar import GrammarSampler

            gsampler = GrammarSampler(grammar, tok)
        logits = prefilled if prefilled is not None else ctx.prefill(ids)
        out = []
        import numpy as np

        for _ in range(args.n_predict):
            lg = np.asarray(logits, dtype=np.float32)
            if gsampler:
                lg = gsampler.filter_logits(lg)
            token = sampler.sample(lg)
            if gsampler:
                gsampler.accept(token)
            if tok.is_eog(token):
                break
            piece = tok.piece(token)
            sys.stdout.write(piece)
            sys.stdout.flush()
            out.append(token)
            if ctx.seq_len[0] >= ctx.n_ctx - 1:
                break
            logits = ctx.decode_one(token)
        sys.stdout.write("\n")
        return out

    if args.conversation:
        template = tok.vocab.chat_template
        from ..server.chat import apply_chat_template

        history = []
        print("== interactive chat (empty line to exit) ==", file=sys.stderr)
        while True:
            try:
                user = input("> ")
            except EOFError:
                break
            if not user.strip():
                break
            history.append({"role": "user", "content": user})
            prompt = apply_chat_template(history, template, "", "", True)
            toks = run_once(prompt)
            history.append({"role": "assistant", "content": tok.decode(toks)})
    else:
        prompt = args.prompt
        if args.file:
            prompt = open(args.file, encoding="utf-8").read()
        if prompt is None:
            print("need -p or -f (or -cnv)", file=sys.stderr)
            return 1
        run_once(prompt)

    s = ctx.perf.summary()
    print(
        f"\nperf: prompt {s['n_prefill']} tok @ {s['prefill_tok_per_s']:.1f} tok/s; "
        f"gen {s['n_decode']} tok @ {s['decode_tok_per_s']:.1f} tok/s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
