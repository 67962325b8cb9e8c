"""Context/sequence state save-restore (llama_state_* analog,
reference src/llama-context.cpp:3021-3213 + tools/server slot save tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.runtime.state import (
    load_seq_state,
    load_state,
    save_seq_state,
    save_state,
)
from llama_cpp_tpu.testing import make_tiny_llama_gguf

PROMPT = [4, 9, 23, 9, 23, 9, 77, 42]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("st") / "tiny.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=128,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    return load_model(p, prefer_quant=False)


def test_full_state_roundtrip(model, tmp_path):
    ctx = Context(model, n_ctx=128, n_seqs=2)
    part1 = ctx.generate(PROMPT, max_new_tokens=6)
    save_state(ctx, str(tmp_path / "sess.bin"))
    ctx.generate(PROMPT + part1, max_new_tokens=6, seq=1)  # unrelated seq work
    part2_ref = _continue(ctx, part1, 6)

    ctx2 = Context(model, n_ctx=128, n_seqs=2)
    load_state(ctx2, str(tmp_path / "sess.bin"))
    assert int(ctx2.seq_len[0]) == len(PROMPT) + len(part1)
    part2 = _continue(ctx2, part1, 6)
    assert part2 == part2_ref


def _continue(ctx, prev, n):
    """Continue seq 0 from its current KV with the last generated token."""
    out = []
    logits = ctx.decode_one(prev[-1] if not out else out[-1], seq=0)
    for _ in range(n):
        t = int(np.argmax(logits))
        out.append(t)
        logits = ctx.decode_one(t, seq=0)
    return out


def test_seq_state_migration(model):
    """Save one sequence, restore into a different context, continue."""
    ctx = Context(model, n_ctx=128, n_seqs=1)
    part1 = ctx.generate(PROMPT, max_new_tokens=6)
    blob = save_seq_state(ctx, 0)  # snapshot BEFORE continuing
    ref = _continue(ctx, part1, 5)

    ctx2 = Context(model, n_ctx=256, n_seqs=3)  # different geometry
    n = load_seq_state(ctx2, 2, blob)
    assert n == len(PROMPT) + len(part1)
    ctx2.seq_len[0] = 0  # untouched rows stay clean
    # continue on the restored row
    out = []
    logits = ctx2.decode_one(part1[-1], seq=2)
    for _ in range(5):
        t = int(np.argmax(logits))
        out.append(t)
        logits = ctx2.decode_one(t, seq=2)
    assert out == ref


def test_state_model_mismatch(model, tmp_path):
    ctx = Context(model, n_ctx=128, n_seqs=1)
    ctx.generate(PROMPT, max_new_tokens=2)
    save_state(ctx, str(tmp_path / "s.bin"))
    bad = Context(model, n_ctx=128, n_seqs=2)  # different slot geometry
    with pytest.raises(ValueError):
        load_state(bad, str(tmp_path / "s.bin"))


def test_server_slot_save_restore(model, tmp_path):
    """HTTP surface: /slots/{id}?action=save|restore|erase."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_tpu.server.app import ServerApp
    from llama_cpp_tpu.server.scheduler import Scheduler

    ctx = Context(model, n_ctx=128, n_seqs=2)
    part1 = ctx.generate(PROMPT, max_new_tokens=4)
    sched = Scheduler(ctx)
    sched.start()
    try:
        app = ServerApp(sched, model_name="tiny",
                        slot_save_dir=str(tmp_path)).app

        async def flow():
            client = TestClient(TestServer(app))
            await client.start_server()
            r = await client.post("/slots/0?action=save",
                                  json={"filename": "a.bin"})
            assert r.status == 200
            j = await r.json()
            assert j["n_written"] > 0
            r = await client.post("/slots/1?action=restore",
                                  json={"filename": "a.bin"})
            assert (await r.json())["n_restored"] == len(PROMPT) + len(part1)
            r = await client.post("/slots/0?action=erase", json={})
            assert (await r.json())["erased"]
            r = await client.post("/slots/9?action=save", json={})
            assert r.status == 400
            await client.close()

        asyncio.new_event_loop().run_until_complete(flow())
    finally:
        sched.stop()


def test_recurrent_state_roundtrip(tmp_path):
    """Whole-context + per-seq state for recurrent memory (rwkv6) —
    reference serializes recurrent state too (llama-memory-recurrent.cpp
    state_write_data)."""
    from llama_cpp_tpu.testing import make_tiny_rwkv6_gguf

    p = str(tmp_path / "rwkv.gguf")
    make_tiny_rwkv6_gguf(p)
    model = load_model(p, prefer_quant=False)
    ctx = Context(model, n_ctx=64, n_seqs=2)
    prompt = [3, 5, 7, 9, 11, 13]
    part1 = ctx.generate(prompt, max_new_tokens=4)
    save_state(ctx, str(tmp_path / "sess.bin"))
    blob = save_seq_state(ctx, 0)
    ref = _continue(ctx, part1, 4)

    ctx2 = Context(model, n_ctx=64, n_seqs=2)
    load_state(ctx2, str(tmp_path / "sess.bin"))
    assert _continue(ctx2, part1, 4) == ref

    ctx3 = Context(model, n_ctx=64, n_seqs=2)
    load_seq_state(ctx3, 0, blob)
    assert int(ctx3.seq_len[0]) == len(prompt) + len(part1)
    assert _continue(ctx3, part1, 4) == ref


def test_hybrid_paged_state_roundtrip(tmp_path):
    """Whole-context + per-seq state for HYBRID memory whose attention half
    is the paged pool (nemotron-h: mamba2 + attention interleave; reference
    llama-memory-hybrid.cpp state paths)."""
    from llama_cpp_tpu.runtime.paged_kv import PagedKVCache
    from llama_cpp_tpu.testing import make_tiny_nemotron_h_gguf

    p = str(tmp_path / "nemh.gguf")
    make_tiny_nemotron_h_gguf(p)
    model = load_model(p, prefer_quant=False)
    ctx = Context(model, n_ctx=64, n_seqs=2)
    assert isinstance(ctx.kv.kv, PagedKVCache)  # attention half is paged
    prompt = [3, 5, 7, 9, 11, 13]
    part1 = ctx.generate(prompt, max_new_tokens=4)
    save_state(ctx, str(tmp_path / "sess.bin"))
    blob = save_seq_state(ctx, 0)
    ref = _continue(ctx, part1, 4)

    ctx2 = Context(model, n_ctx=64, n_seqs=2)
    load_state(ctx2, str(tmp_path / "sess.bin"))
    assert _continue(ctx2, part1, 4) == ref

    ctx3 = Context(model, n_ctx=64, n_seqs=2)
    load_seq_state(ctx3, 0, blob)
    assert int(ctx3.seq_len[0]) == len(prompt) + len(part1)
    assert _continue(ctx3, part1, 4) == ref
