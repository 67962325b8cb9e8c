"""Thread safety: multiple Contexts over one model decoding concurrently
(reference tests/test-thread-safety.cpp: N models x M contexts in threads)."""

import threading

import numpy as np
import pytest

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import make_tiny_llama_gguf


def test_parallel_contexts_decode(tmp_path):
    p = str(tmp_path / "ts.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    model = load_model(p, prefer_quant=False)
    prompt = [5, 9, 23, 42]

    # reference output single-threaded
    ref = Context(model, n_ctx=64, n_seqs=1).generate(prompt, max_new_tokens=6)

    results = [None] * 4
    errs = []

    def worker(i):
        try:
            ctx = Context(model, n_ctx=64, n_seqs=1)
            results[i] = ctx.generate(prompt, max_new_tokens=6)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert all(r == ref for r in results), results


def test_results_drift_tool(tmp_path):
    from llama_cpp_tpu.tools.results import check, snapshot

    p = str(tmp_path / "rs.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=1, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    base = snapshot(p, n_tokens=6)
    rep = check(p, base, n_tokens=6)
    assert rep["ok"] and rep["token_mismatches"] == 0
