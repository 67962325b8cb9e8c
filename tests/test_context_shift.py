"""Context shift: discarding early tokens and sliding the KV down (with K
re-rotation) must yield logits identical to a fresh context over the kept
tokens (RoPE-consistency, reference build_rope_shift)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    # single layer: K/V depend only on (token, position), so shifting is
    # EXACTLY a fresh context over the kept tokens. With more layers the
    # dropped tokens legitimately leave traces in deeper activations (the
    # reference's context shift is the same approximation).
    p = str(tmp_path_factory.mktemp("cs") / "tiny.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=1, n_embd=128,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    return load_model(p, prefer_quant=False, dense_dtype=jnp.float32)


def test_shift_matches_fresh_context(model):
    toks = list(np.random.default_rng(0).integers(4, 250, 24))
    n_keep, n_discard = 4, 8

    ctx = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    ctx.prefill(toks)
    ctx.context_shift(0, n_keep=n_keep, n_discard=n_discard)
    assert int(ctx.seq_len[0]) == len(toks) - n_discard
    out_shifted = ctx.decode_one(42)

    # fresh context over kept tokens (same shifted positions)
    kept = toks[:n_keep] + toks[n_keep + n_discard:]
    ctx2 = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    ctx2.prefill(kept)
    out_fresh = ctx2.decode_one(42)
    np.testing.assert_allclose(out_shifted, out_fresh, rtol=2e-4, atol=2e-4)


def test_shift_quantized_kv(model):
    toks = list(np.random.default_rng(1).integers(4, 250, 20))
    ctx = Context(model, n_ctx=64, n_seqs=1, quantized_kv=True)
    ctx.prefill(toks)
    ctx.context_shift(0, n_keep=2, n_discard=6)
    out = ctx.decode_one(7)

    kept = toks[:2] + toks[8:]
    ctx2 = Context(model, n_ctx=64, n_seqs=1, quantized_kv=True)
    ctx2.prefill(kept)
    ref = ctx2.decode_one(7)
    # int8 requantization round-trip adds small noise
    denom = np.abs(ref).max()
    np.testing.assert_allclose(out / denom, ref / denom, atol=3e-2)


def test_shift_preserves_other_seqs(model):
    ctx = Context(model, n_ctx=64, n_seqs=2, kv_dtype=jnp.float32)
    ctx.prefill([5, 9, 23, 42, 8, 1], seq=0)
    ctx.prefill([7, 7, 7, 7], seq=1)
    before = ctx.decode_one(3, seq=1)
    ctx.seq_len[1] -= 1  # rewind the probe token
    ctx.seq_rm(1, p0=4)
    ctx.context_shift(0, n_keep=0, n_discard=2)
    after = ctx.decode_one(3, seq=1)
    np.testing.assert_allclose(after, before, rtol=1e-5, atol=1e-5)
