"""Paged KV cache: pool + page tables (reference unified-cache cell pool,
src/llama-kv-cache.h:196 find_slot / SET_ROWS :205-212; SURVEY.md §7 design
stance row 5). Covers paged-vs-identity decode parity, the paged Pallas flash
kernel (interpret mode), memory bounding via kv_total, sequence ops, context
shift, and per-sequence state migration on pages."""

import numpy as np
import pytest

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.ops.pallas.flash_attn import set_force_flash
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.runtime.paged_kv import KVCacheFull, PagedKVCache
from llama_cpp_tpu.testing import make_tiny_llama_gguf

PROMPT = [4, 9, 23, 9, 23, 9, 77, 42]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pg") / "tiny.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=128,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    return load_model(p, prefer_quant=False)


@pytest.fixture(scope="module")
def model128(tmp_path_factory):
    """head_dim 128 -> flash kernel eligible."""
    p = str(tmp_path_factory.mktemp("pg128") / "tiny128.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=256,
                         n_heads=2, n_kv_heads=2, n_ff=256, ftype="f32",
                         n_ctx=1024)
    return load_model(p, prefer_quant=False)


def test_paged_is_default(model):
    ctx = Context(model, n_ctx=128, n_seqs=2)
    assert isinstance(ctx.kv, PagedKVCache)
    assert ctx.alloc is not None


def test_paged_matches_identity_greedy(model):
    ref = Context(model, n_ctx=128, n_seqs=1, paged=False).generate(
        PROMPT, max_new_tokens=12)
    got = Context(model, n_ctx=128, n_seqs=1, paged=True).generate(
        PROMPT, max_new_tokens=12)
    assert got == ref


def test_paged_flash_kernel_parity(model128):
    """The paged flash kernel (page-table index maps) must match the einsum
    fallback bit-for-bit in greedy decoding."""
    set_force_flash(False)
    try:
        ref = Context(model128, n_ctx=256, n_seqs=1).generate(
            PROMPT, max_new_tokens=10)
    finally:
        set_force_flash(None)
    set_force_flash(True)
    try:
        got = Context(model128, n_ctx=256, n_seqs=1).generate(
            PROMPT, max_new_tokens=10)
    finally:
        set_force_flash(None)
    assert got == ref


def test_paged_flash_multiseq_and_quantized(model128):
    """B>1 decode through the paged kernel (no per-seq gather) with int8 KV,
    across a page boundary (n_ctx > page via small pool pages)."""
    set_force_flash(True)
    try:
        ctx = Context(model128, n_ctx=600, n_seqs=2, quantized_kv=True)
        assert isinstance(ctx.kv, PagedKVCache)
        # fill past one 512-page boundary
        long_prompt = (PROMPT * 70)[:540]
        ref = ctx.generate(long_prompt, max_new_tokens=6, seq=0)
        # same prompt on seq 1 while seq 0 holds state
        got = ctx.generate(long_prompt, max_new_tokens=6, seq=1)
        assert got == ref
        # batched one-token step across both seqs
        toks = np.asarray([ref[-1], got[-1]])
        logits = ctx.decode_step_multi(toks, np.asarray([0, 1]))
        assert np.argmax(logits[0]) == np.argmax(logits[1])
    finally:
        set_force_flash(None)


def test_kv_total_bounds_memory(model):
    """Pool sized in tokens, shared across sequences: HBM ~ kv_total, and
    exhaustion raises (reference FAILED_PREPARE analog)."""
    ctx = Context(model, n_ctx=128, n_seqs=8, kv_total=256)
    # pool rows = ceil(kv_total / page) pages + one trash page
    assert ctx.kv.k[0].shape[1] == (-(-256 // ctx.page) + 1) * ctx.page
    # far below the identity layout's n_seqs * n_slots rows
    assert ctx.kv.k[0].shape[1] < 8 * ctx.n_slots
    ctx.prefill(list(range(1, 100)), seq=0)
    with pytest.raises(KVCacheFull):
        for s in range(1, 8):
            ctx.prefill(list(range(1, 100)), seq=s)


def test_paged_page_reuse_after_rm(model):
    ctx = Context(model, n_ctx=128, n_seqs=4, kv_total=1024)
    for round_ in range(6):
        s = round_ % 2
        ctx.seq_rm(s)
        ctx.generate(PROMPT, max_new_tokens=4, seq=s)
    assert ctx.alloc.n_free >= 0


def test_paged_seq_cp(model):
    ctx = Context(model, n_ctx=128, n_seqs=2)
    part1 = ctx.generate(PROMPT, max_new_tokens=6, seq=0)
    ctx.seq_cp(1, 0)
    ref = _continue(ctx, part1, 5, seq=0)
    got = _continue(ctx, part1, 5, seq=1)
    assert got == ref


def _continue(ctx, prev, n, seq=0):
    out = []
    logits = ctx.decode_one(prev[-1], seq=seq)
    for _ in range(n):
        t = int(np.argmax(logits))
        out.append(t)
        logits = ctx.decode_one(t, seq=seq)
    return out


def test_hybrid_attention_half_is_paged(tmp_path):
    """Hybrid models (mamba + attention) route their attention layers
    through the page pool (VERDICT r2 weak 9); seq_cp copies pages AND
    recurrent rows, seq_rm releases both."""
    from llama_cpp_tpu.testing import make_tiny_nemotron_h_gguf

    p = str(tmp_path / "nemh.gguf")
    make_tiny_nemotron_h_gguf(p)
    m = load_model(p, prefer_quant=False)
    ctx = Context(m, n_ctx=128, n_seqs=2)
    assert isinstance(ctx.kv.kv, PagedKVCache)
    assert ctx.alloc is not None
    part1 = ctx.generate(PROMPT, max_new_tokens=6, seq=0)
    ctx.seq_cp(1, 0)
    ref = _continue(ctx, part1, 5, seq=0)
    got = _continue(ctx, part1, 5, seq=1)
    assert got == ref
    ctx.seq_rm(1)
    assert int(ctx.seq_len[1]) == 0
    # freed pages are reusable
    again = ctx.generate(PROMPT, max_new_tokens=4, seq=1)
    assert len(again) == 4


def test_paged_context_shift(model):
    """Context shift on pages: tail slides down, pages freed, decode
    continues (reference server context shift on the unified cache)."""
    ctx = Context(model, n_ctx=128, n_seqs=1)
    ctx.generate(PROMPT * 8, max_new_tokens=8)
    before = int(ctx.seq_len[0])
    n_disc = ctx.context_shift(0, n_keep=4)
    assert int(ctx.seq_len[0]) == before - n_disc
    # the shifted cache still decodes
    out = _continue(ctx, [PROMPT[-1]], 4)
    assert all(isinstance(t, int) for t in out)


def test_paged_seq_state_migration(model):
    from llama_cpp_tpu.runtime.state import load_seq_state, save_seq_state

    ctx = Context(model, n_ctx=128, n_seqs=1)
    part1 = ctx.generate(PROMPT, max_new_tokens=6)
    blob = save_seq_state(ctx, 0)
    ref = _continue(ctx, part1, 5)

    ctx2 = Context(model, n_ctx=128, n_seqs=1)
    load_seq_state(ctx2, 0, blob)
    assert int(ctx2.seq_len[0]) == len(PROMPT) + len(part1)
    assert _continue(ctx2, part1, 5) == ref


def test_paged_full_state_roundtrip(model, tmp_path):
    from llama_cpp_tpu.runtime.state import load_state, save_state

    ctx = Context(model, n_ctx=128, n_seqs=2)
    part1 = ctx.generate(PROMPT, max_new_tokens=6)
    save_state(ctx, str(tmp_path / "sess.bin"))
    ref = _continue(ctx, part1, 5)

    ctx2 = Context(model, n_ctx=128, n_seqs=2)
    load_state(ctx2, str(tmp_path / "sess.bin"))
    assert _continue(ctx2, part1, 5) == ref
    # allocator host state rebuilt from the restored table
    assert int(ctx2.alloc.count[0]) == ctx2.alloc.pages_for(int(ctx2.seq_len[0]))


def test_decode_steps_greedy_scan(tmp_path):
    """On-device multi-step batched greedy scan matches step-by-step greedy
    decode for every sequence."""
    import jax.numpy as jnp

    p = str(tmp_path / "scan.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=128,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    # f32 compute: XLA:CPU can't run bf16 dots inside while-loops
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=128, n_seqs=2)
    ref_out = []
    for s in range(2):
        logits = ctx.prefill(PROMPT, seq=s)
        ref_out.append([int(np.argmax(logits))])
    toks = np.asarray([o[-1] for o in ref_out])
    step = ctx.decode_step_greedy(toks.copy(), np.arange(2))
    got = ctx.decode_steps_greedy(step, np.arange(2), 5)

    ctx2 = Context(model, n_ctx=128, n_seqs=2)
    for sq in range(2):
        logits = ctx2.prefill(PROMPT, seq=sq)
        cur = int(np.argmax(logits))
        seq_ref = []
        for _ in range(6):
            logits = ctx2.decode_one(cur, seq=sq)
            cur = int(np.argmax(logits))
            seq_ref.append(cur)
        assert [int(step[sq])] + list(got[sq]) == seq_ref


def test_paged_iswa_full_cache(tmp_path):
    """iSWA models: full-attention layers use the paged pool (memory bound
    by kv_total), SWA layers keep O(window) rings; outputs match the
    non-paged iSWA cache."""
    import jax.numpy as jnp

    from llama_cpp_tpu.runtime.kv_cache import ISWACache

    p = str(tmp_path / "swa.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=4, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    m = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    m.cfg = m.cfg.with_(sliding_window=16, swa_pattern=2)
    prompt = [5, 9, 23, 42, 7, 7, 9] * 6

    ctx = Context(m, n_ctx=256, n_seqs=4, kv_total=512)
    assert isinstance(ctx.kv, ISWACache)
    assert isinstance(ctx.kv, ISWACache) and hasattr(ctx.kv.full, "table")
    out_paged = ctx.generate(prompt, max_new_tokens=8)

    ref = Context(m, n_ctx=256, n_seqs=4, paged=False).generate(
        prompt, max_new_tokens=8)
    assert out_paged == ref

    # seq ops on the hybrid layout
    ctx.seq_cp(1, 0)
    a = _continue(ctx, out_paged, 4, seq=0)
    b = _continue(ctx, out_paged, 4, seq=1)
    assert a == b
    ctx.seq_rm(1)
    assert int(ctx.seq_len[1]) == 0


def test_windowed_scan_flash_parity(tmp_path):
    """Windowed on-device scan decode (runtime/decode_window.py: frozen pool
    + window tail through the paged kernel) == stepwise einsum decode."""
    import jax.numpy as jnp

    p = str(tmp_path / "win128.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=256,
                         n_heads=2, n_kv_heads=2, n_ff=256, ftype="f32",
                         n_ctx=1024)
    # f32 compute: XLA:CPU can't run bf16 dots inside while-loops
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    set_force_flash(False)
    try:
        ref = Context(model, n_ctx=256, n_seqs=1).generate(
            PROMPT, max_new_tokens=10)
    finally:
        set_force_flash(None)
    set_force_flash(True)
    try:
        ctx = Context(model, n_ctx=256, n_seqs=1)
        assert ctx._decode_window_width() > 0
        got = ctx.generate_ondevice(PROMPT, max_new_tokens=10, chunk=4)
    finally:
        set_force_flash(None)
    assert got == ref
