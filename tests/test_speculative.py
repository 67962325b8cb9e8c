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
