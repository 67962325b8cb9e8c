"""Speculative decoding invariants: greedy output must be token-identical to
plain decoding regardless of the draft source (reference property of
common/speculative.cpp accept/rollback)."""

import numpy as np
import pytest

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.runtime.speculative import (
    DraftModelSpeculator,
    NgramSpeculator,
    speculative_generate,
)
from llama_cpp_tpu.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("spec") / "tiny.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=128,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    return load_model(p, prefer_quant=False)


PROMPT = [5, 9, 23, 9, 23, 9, 23, 42]


def plain(model, n=24):
    ctx = Context(model, n_ctx=256, n_seqs=1)
    return ctx.generate(PROMPT, max_new_tokens=n)


def test_ngram_speculator_lookup():
    sp = NgramSpeculator(n_min=1, n_max=3)
    toks = [1, 2, 3, 4, 1, 2, 3]
    assert sp.draft(toks, 2) == [4, 1]
    assert sp.draft([7, 8, 9], 4) == []  # no repeat -> no draft


def test_ngram_spec_greedy_identical(model):
    ref = plain(model)
    ctx = Context(model, n_ctx=256, n_seqs=1)
    out, stats = speculative_generate(
        ctx, NgramSpeculator(n_min=1, n_max=3), PROMPT,
        max_new_tokens=len(ref), n_draft=4,
    )
    assert out == ref
    assert stats["n_steps"] > 0


def test_draft_model_spec_greedy_identical(model):
    ref = plain(model)
    ctx = Context(model, n_ctx=256, n_seqs=1)
    # self-draft: draft model == target -> near-total acceptance
    draft_ctx = Context(model, n_ctx=256, n_seqs=1)
    spec = DraftModelSpeculator(draft_ctx)
    out, stats = speculative_generate(
        ctx, spec, PROMPT, max_new_tokens=len(ref), n_draft=4,
    )
    assert out == ref
    assert stats["n_accept"] > 0
    # self-drafting must accept (nearly) everything
    assert stats["n_accept"] >= stats["n_draft"] - 2


def test_spec_rollback_consistency(model):
    """After rejections, continuing generation stays correct (KV rollback)."""
    ref = plain(model, n=30)
    ctx = Context(model, n_ctx=256, n_seqs=1)

    class BadSpeculator:
        calls = 0

        def draft(self, tokens, n):
            # alternate garbage and nothing: forces rejection + rollback
            self.calls += 1
            return [255, 254, 253][: n if self.calls % 2 else 0]

        def reset(self):
            pass

    out, stats = speculative_generate(
        ctx, BadSpeculator(), PROMPT, max_new_tokens=len(ref), n_draft=3,
    )
    assert out == ref


def _gemma4_pair(tmp_path):
    """Tiny gemma4 target + gemma4-assistant drafter GGUF pair with aligned
    head dims/classes (assistant layer class c attends the target's last
    layer of class c)."""
    import numpy as np

    from llama_cpp_tpu.gguf.constants import GGMLType
    from llama_cpp_tpu.gguf.writer import GGUFWriter
    from llama_cpp_tpu.testing import tiny_spm_vocab

    V, E, H, HKV, DKF, DKS, FF = 96, 64, 4, 2, 16, 8, 96
    rng = np.random.default_rng(9)

    def emit(w, name, *shape, scale=None):
        s = scale or (1.0 / np.sqrt(shape[-1]))
        arr = (rng.standard_normal(shape) * s).astype(np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)
        return arr

    def base_md(w, arch, L, swa):
        P = arch + "."
        w.add("general.architecture", arch)
        w.add("general.name", "t")
        w.add(P + "block_count", np.uint32(L))
        w.add(P + "context_length", np.uint32(256))
        w.add(P + "embedding_length", np.uint32(E))
        w.add(P + "feed_forward_length", np.uint32(FF))
        w.add(P + "attention.head_count", np.uint32(H))
        w.add(P + "attention.head_count_kv", np.uint32(HKV))
        w.add(P + "attention.key_length", np.uint32(DKF))
        w.add(P + "attention.value_length", np.uint32(DKF))
        w.add(P + "attention.key_length_swa", np.uint32(DKS))
        w.add(P + "attention.value_length_swa", np.uint32(DKS))
        w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
        w.add(P + "attention.sliding_window", np.uint32(8))
        w.add(P + "attention.sliding_window_pattern",
              np.asarray(swa, np.uint32))
        w.add(P + "rope.freq_base", 10000.0)
        w.add(P + "rope.freq_base_swa", 10000.0)
        w.add(P + "rope.dimension_count", np.uint32(DKF))
        w.add(P + "vocab_size", np.uint32(V))
        vocab = tiny_spm_vocab(V)
        from llama_cpp_tpu.gguf.constants import Keys
        for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES,
                  Keys.Tokenizer.TOKEN_TYPE):
            vocab[k] = vocab[k][:V]
        w.add_all(vocab)

    def layer(w, i, dk, q_only):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E)
        emit(w, b + "attn_q.weight", H * dk, E)
        emit(w, b + "attn_q_norm.weight", dk)
        if not q_only:
            emit(w, b + "attn_k.weight", HKV * dk, E)
            emit(w, b + "attn_v.weight", HKV * dk, E)
            emit(w, b + "attn_k_norm.weight", dk)
        emit(w, b + "attn_output.weight", E, H * dk)
        emit(w, b + "attn_post_norm.weight", E)
        emit(w, b + "ffn_norm.weight", E)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_post_norm.weight", E)

    # target: 4 layers [swa, swa, swa, full]
    wt = GGUFWriter()
    t_swa = [1, 1, 1, 0]
    base_md(wt, "gemma4", 4, t_swa)
    emit(wt, "token_embd.weight", V, E, scale=0.05)
    emit(wt, "output_norm.weight", E)
    for i in range(4):
        layer(wt, i, DKS if t_swa[i] else DKF, q_only=False)
        a = np.asarray([1.0], np.float32)
        wt.add_tensor(f"blk.{i}.layer_output_scale.weight", a.tobytes(),
                      (1,), GGMLType.F32)
    tpath = str(tmp_path / "tgt.gguf")
    wt.write(tpath)

    # assistant: 2 layers [swa, full] -> attend target layers 2 / 3
    wa = GGUFWriter()
    a_swa = [1, 0]
    base_md(wa, "gemma4-assistant", 2, a_swa)
    wa.add("gemma4-assistant.embedding_length_out", np.uint32(E))
    wa.add("gemma4-assistant.nextn_predict_layers", np.uint32(2))
    emit(wa, "token_embd.weight", V, E, scale=0.05)
    emit(wa, "output_norm.weight", E)
    emit(wa, "nextn.pre_projection.weight", E, 2 * E)
    emit(wa, "nextn.post_projection.weight", E, E)
    for i in range(2):
        layer(wa, i, DKS if a_swa[i] else DKF, q_only=True)
        a = np.asarray([1.0], np.float32)
        wa.add_tensor(f"blk.{i}.layer_output_scale.weight", a.tobytes(),
                      (1,), GGMLType.F32)
    apath = str(tmp_path / "ast.gguf")
    wa.write(apath)
    return tpath, apath


def test_gemma4_assistant_mtp(tmp_path):
    """Gemma-4 MTP assistant drafting (reference common/speculative.cpp
    'draft-mtp' is_mem_shared mode): the drafter attends the live TARGET KV
    cache (no draft KV), chains its own h_next, and greedy speculative
    output must be token-identical to plain generation."""
    import jax.numpy as jnp
    import numpy as np

    from llama_cpp_tpu.models.gemma3n import Gemma4AssistantSpeculator
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.runtime.speculative import speculative_generate

    tpath, apath = _gemma4_pair(tmp_path)
    model = load_model(tpath, prefer_quant=False, dense_dtype=jnp.float32)
    prompt = [3, 5, 9, 2, 7, 11]

    ctx = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    plain = ctx.generate(prompt, max_new_tokens=10)

    dmodel = load_model(apath, prefer_quant=False, dense_dtype=jnp.float32)
    ctx2 = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    spec = Gemma4AssistantSpeculator(dmodel, ctx2, p_min=0.0)
    out, stats = speculative_generate(
        ctx2, spec, prompt, max_new_tokens=10, n_draft=4)
    assert out == plain, (out, plain)
    assert stats["n_draft"] > 0  # the drafter actually drafted
