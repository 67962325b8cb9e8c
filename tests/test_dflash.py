"""DFlash block-diffusion drafting (reference common/speculative.cpp
'draft-dflash' :917-1244 + src/models/dflash.cpp).

Contract: greedy output through the DFlash drafting path is token-identical
to plain greedy decode (acceptance is a pure optimization); the encoder /
KV-injection / noise-block plumbing is exercised end-to-end, and the block
decode is checked against an independent f64 numpy transcription of the
reference graph."""

import numpy as np
import pytest

from llama_cpp_tpu.models.dflash import (DflashSpeculator, dflash_encode)
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.runtime.speculative import speculative_generate
from llama_cpp_tpu.testing import make_tiny_dflash_gguf, make_tiny_llama_gguf

PROMPT = [5, 9, 23, 9, 23, 9, 23, 42]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("dflash")
    tp = str(d / "target.gguf")
    dp = str(d / "draft.gguf")
    make_tiny_llama_gguf(tp, vocab_size=256, n_layers=3, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    make_tiny_dflash_gguf(dp, target_layers=(0, 2), n_embd_tgt=64,
                          n_embd=64, n_layers=2, n_heads=4, n_kv_heads=2,
                          n_ff=128, vocab_size=256, block_size=8)
    tgt = load_model(tp, prefer_quant=False)
    dft = load_model(dp, prefer_quant=False)
    return tgt, dft


def test_dflash_loads(pair):
    _, dft = pair
    assert dft.cfg.arch == "dflash"
    assert dft.cfg.extra["target_layers"] == (0, 2)
    assert dft.cfg.extra["block_size"] == 8
    assert dft.cfg.extra["mask_token_id"] == 3
    assert "fc" in dft.params and "enc_output_norm" in dft.params


def test_dflash_inject_and_draft_shapes(pair):
    tgt, dft = pair
    spec = DflashSpeculator(dft, tgt, n_ctx=64, p_min=0.0)
    n = len(PROMPT)
    feats = np.random.default_rng(0).standard_normal(
        (n, 2 * tgt.cfg.n_embd)).astype(np.float32)
    spec.process(PROMPT, feats, pos0=0)
    assert int(np.asarray(spec.cache_pos).max()) == n - 1
    out = spec.draft(PROMPT, 4)
    assert len(out) <= 4
    assert all(0 <= t < 256 for t in out)
    # drafting without injected context refuses (prefix not processed)
    spec2 = DflashSpeculator(dft, tgt, n_ctx=64, p_min=0.0)
    assert spec2.draft(PROMPT, 4) == []


def test_dflash_block_decode_matches_numpy(pair):
    """f64 transcription of dflash.cpp graph<false> (noise-token branch):
    non-causal attention over injected context + block, per-head qk norm,
    NEOX rope, swiglu; logits via the target's head."""
    import np_oracle as orc

    tgt, dft = pair
    cfg = dft.cfg
    spec = DflashSpeculator(dft, tgt, n_ctx=64, p_min=0.0)
    rng = np.random.default_rng(1)
    n_ctx_toks = 6
    feats = rng.standard_normal((n_ctx_toks, 2 * tgt.cfg.n_embd)).astype(
        np.float32)
    spec.process(PROMPT[:n_ctx_toks], feats, pos0=0)

    nb = 4
    toks = np.array([PROMPT[n_ctx_toks - 1], 3, 3, 3], np.int32)
    pos = (n_ctx_toks - 1 + np.arange(nb)).astype(np.int32)
    got = np.asarray(spec._decode(nb)(
        spec.params, np.asarray(toks), np.asarray(pos),
        spec.k_cache, spec.v_cache, spec.cache_pos), np.float64)

    # ---- numpy oracle ----
    P = {k: np.asarray(v, np.float64) if hasattr(v, "dtype") else v
         for k, v in dft.params.items()}
    layers = [{k: np.asarray(v, np.float64) for k, v in lw.items()}
              for lw in dft.params["layers"]]
    H, HKV, HD = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim_k
    G = H // HKV
    g = np.asarray(
        dflash_encode(dft.params, cfg, np.asarray(feats)), np.float64)
    # injected context K/V per layer
    ctx_pos = np.arange(n_ctx_toks)
    ctx_kv = []
    for lw in layers:
        k = (g @ lw["attn_k"].T).reshape(n_ctx_toks, HKV, HD)
        k = orc.rms_norm(k, lw["attn_k_norm"], cfg.rms_eps)
        k = orc.rope(k, ctx_pos, HD, "neox")
        v = (g @ lw["attn_v"].T).reshape(n_ctx_toks, HKV, HD)
        ctx_kv.append((k, v))
    emb = np.asarray(tgt.params["token_embd"], np.float64)
    x = emb[toks]
    for il, lw in enumerate(layers):
        h = orc.rms_norm(x, lw["attn_norm"], cfg.rms_eps)
        q = (h @ lw["attn_q"].T).reshape(nb, H, HD)
        k = (h @ lw["attn_k"].T).reshape(nb, HKV, HD)
        v = (h @ lw["attn_v"].T).reshape(nb, HKV, HD)
        q = orc.rms_norm(q, lw["attn_q_norm"], cfg.rms_eps)
        k = orc.rms_norm(k, lw["attn_k_norm"], cfg.rms_eps)
        q = orc.rope(q, pos, HD, "neox")
        k = orc.rope(k, pos, HD, "neox")
        ks = np.concatenate([ctx_kv[il][0], k], axis=0)
        vs = np.concatenate([ctx_kv[il][1], v], axis=0)
        outs = []
        for hh in range(H):
            s = (q[:, hh] @ ks[:, hh // G].T) * HD ** -0.5
            p = orc.softmax(s)  # non-causal: every live slot visible
            outs.append(p @ vs[:, hh // G])
        att = np.concatenate(outs, -1) @ lw["attn_output"].T
        x = x + att
        hf = orc.rms_norm(x, lw["ffn_norm"], cfg.rms_eps)
        x = x + (orc.silu(hf @ lw["ffn_gate"].T) * (hf @ lw["ffn_up"].T)
                 ) @ lw["ffn_down"].T
    x = orc.rms_norm(x, P["output_norm"], cfg.rms_eps)
    head = np.asarray(
        tgt.params.get("output", tgt.params["token_embd"]), np.float64)
    want = x @ head.T
    # drafter computes in bf16: compare argmax ordering + loose values
    assert got.shape == want.shape
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()
    np.testing.assert_allclose(got, want, rtol=0.15, atol=0.15)


def test_dflash_greedy_identical(pair):
    tgt, dft = pair
    ref = Context(tgt, n_ctx=128, n_seqs=1).generate(
        PROMPT, max_new_tokens=20)

    ctx = Context(tgt, n_ctx=128, n_seqs=1)
    spec = DflashSpeculator(dft, tgt, n_ctx=128, p_min=0.0)
    out, stats = speculative_generate(ctx, spec, PROMPT,
                                      max_new_tokens=20, n_draft=4)
    assert out == ref, f"{out} != {ref}"
    assert stats["n_draft"] > 0
    assert stats["n_steps"] > 0


def test_dflash_through_scheduler(pair):
    """DFlash drafting through the continuous-batching scheduler yields
    greedy output identical to a scheduler without speculation, and the
    draft counters move."""
    import threading

    from llama_cpp_tpu.sampling.samplers import SamplingParams
    from llama_cpp_tpu.server.scheduler import GenTask, Scheduler

    tgt, dft = pair

    def serve(spec):
        ctx = Context(tgt, n_ctx=128, n_seqs=2)
        factory = (lambda i: DflashSpeculator(dft, tgt, n_ctx=128,
                                              p_min=0.0)) if spec else None
        sched = Scheduler(ctx, spec_factory=factory, n_draft=4)
        sched.start()
        outs = {}
        evs = []
        try:
            for rid, prompt in (("a", PROMPT), ("b", [7, 3, 88, 11, 6])):
                ev = threading.Event()
                evs.append(ev)

                def done(res, rid=rid, ev=ev):
                    outs[rid] = res["tokens"]
                    ev.set()

                sched.submit(GenTask(prompt_ids=prompt,
                                     params=SamplingParams(temp=0.0),
                                     max_tokens=12, done_cb=done))
            for ev in evs:
                assert ev.wait(timeout=300), "generation timed out"
        finally:
            sched.stop()
        return outs, dict(sched.metrics)

    ref, _ = serve(False)
    got, metrics = serve(True)
    assert ref == got
    assert metrics["draft_tokens_total"] > 0
