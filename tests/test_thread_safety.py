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


def test_scheduler_concurrent_submission_stress(tmp_path):
    """Server-scheduler stress (reference test-thread-safety.cpp style):
    many HTTP-thread submitters racing into the task queue + run_sync calls
    interleaved with decoding; all tasks must complete with coherent output
    and the prompt-cache slot reuse must stay position-aligned."""
    import queue as _q

    from llama_cpp_tpu.sampling.samplers import SamplingParams
    from llama_cpp_tpu.server.scheduler import GenTask, Scheduler

    import jax.numpy as jnp

    p = str(tmp_path / "st.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    # f32 compute: XLA:CPU lacks bf16 dot thunks in some fused shapes
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=96, n_seqs=3)
    sched = Scheduler(ctx)
    sched.start()
    try:
        prompts = [[5, 9, 23, 42], [7, 7, 7, 9, 1], [3, 15, 8]]
        # single-threaded references
        refctx = Context(model, n_ctx=96, n_seqs=1)
        refs = []
        for pr in prompts:
            refctx.seq_rm(0)
            refs.append(refctx.generate(pr, max_new_tokens=5))

        done: _q.Queue = _q.Queue()
        n_tasks = 24

        def submit(i):
            pr = prompts[i % len(prompts)]
            sched.submit(GenTask(
                prompt_ids=pr, params=SamplingParams(temp=0.0), max_tokens=5,
                done_cb=lambda r, i=i: done.put((i, r))))

        submitters = [threading.Thread(target=submit, args=(i,))
                      for i in range(n_tasks)]
        for t in submitters:
            t.start()
        # hammer run_sync from another thread while decoding
        stats = []

        def syncer():
            for _ in range(10):
                stats.append(sched.run_sync(lambda: int(ctx.seq_len.sum())))

        ts = threading.Thread(target=syncer)
        ts.start()
        for t in submitters:
            t.join()
        ts.join()

        got = {}
        for _ in range(n_tasks):
            i, r = done.get(timeout=180)
            got[i] = r
        assert len(got) == n_tasks
        for i, r in got.items():
            assert r["tokens"] == refs[i % len(prompts)], (i, r["tokens"])
        assert len(stats) == 10
    finally:
        sched.stop()


def test_n_models_m_contexts_stress(tmp_path):
    """The reference's full matrix (tests/test-thread-safety.cpp): N models
    x M contexts, every context generating concurrently in its own thread,
    each with a different prompt; all outputs must match their own
    single-threaded reference run."""
    paths = []
    for i in range(2):  # N = 2 models (different seeds -> different weights)
        p = str(tmp_path / f"ts{i}.gguf")
        make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=64,
                             n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32",
                             seed=10 + i)
        paths.append(p)
    models = [load_model(p, prefer_quant=False) for p in paths]
    prompts = [[5, 9, 23, 42], [7, 3, 88, 11, 6], [1, 2, 3],
               [42, 42, 42, 42, 42]]

    refs = {}
    for mi, m in enumerate(models):
        for pi, pr in enumerate(prompts):
            refs[(mi, pi)] = Context(m, n_ctx=64, n_seqs=1).generate(
                pr, max_new_tokens=6)

    results = {}
    errs = []

    def worker(mi, pi):
        try:
            ctx = Context(models[mi], n_ctx=64, n_seqs=1)
            results[(mi, pi)] = ctx.generate(prompts[pi], max_new_tokens=6)
        except Exception as e:  # pragma: no cover
            errs.append((mi, pi, repr(e)))

    threads = [threading.Thread(target=worker, args=(mi, pi))
               for mi in range(len(models)) for pi in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    assert results == refs
