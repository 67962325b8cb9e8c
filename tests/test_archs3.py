"""Round-3 architecture tranche. Beyond the structural-smoke tier, these
tests carry NUMERIC checks (VERDICT r2 item 6): exact-equivalence against a
differently-expressed model (deci-uniform == llama, nanbeige loops ==
unrolled llama) and transcribed numpy forwards for the genuinely new math
(deci special layers, openelm per-layer head arrays)."""

import numpy as np
import pytest

from llama_cpp_tpu.gguf.constants import GGMLType, Keys
from llama_cpp_tpu.gguf.writer import GGUFWriter
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import tiny_spm_vocab

V, L, E, H, HKV, FF = 96, 2, 64, 4, 2, 96
HD = E // H

PROMPT = [3, 5, 9, 2, 7]


def _writer(arch, extra_md=None, n_layers=L, heads=H, kv=HKV, n_rot=None):
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, f"tiny-{arch}")
    P = arch + "."
    w.add(P + "block_count", np.uint32(n_layers))
    w.add(P + "context_length", np.uint32(256))
    w.add(P + "embedding_length", np.uint32(E))
    w.add(P + "feed_forward_length", np.uint32(FF))
    if isinstance(heads, (list, tuple)):
        w.add(P + "attention.head_count", np.asarray(heads, np.uint32))
    else:
        w.add(P + "attention.head_count", np.uint32(heads))
    if isinstance(kv, (list, tuple)):
        w.add(P + "attention.head_count_kv", np.asarray(kv, np.uint32))
    else:
        w.add(P + "attention.head_count_kv", np.uint32(kv))
    w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(P + "attention.layer_norm_epsilon", 1e-5)
    w.add(P + "rope.freq_base", 10000.0)
    w.add(P + "rope.dimension_count", np.uint32(n_rot or HD))
    w.add(P + "vocab_size", np.uint32(V))
    for k, v in (extra_md or {}).items():
        w.add(P + k if not k.startswith("!") else k[1:], v)
    vocab = tiny_spm_vocab(V)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES,
              Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:V]
    w.add_all(vocab)
    return w


def _emit_fn(seed):
    rng = np.random.default_rng(seed)
    store = {}

    def emit(w, name, *shape, scale=None, ones=False):
        if ones:
            arr = np.ones(shape, np.float32)
        else:
            s = scale or (1.0 / np.sqrt(shape[-1]))
            arr = (rng.standard_normal(shape) * s).astype(np.float32)
        store[name] = arr
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    return emit, store


def _logits(path, prompt=PROMPT):
    import jax.numpy as jnp

    model = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=64, n_seqs=1)
    return np.asarray(ctx.prefill(prompt, seq=0))


def _run(path, n_new=4):
    model = load_model(path, prefer_quant=False)
    ctx = Context(model, n_ctx=64, n_seqs=1)
    out = ctx.generate(PROMPT, max_new_tokens=n_new)
    assert len(out) >= 1 and all(0 <= t < V for t in out)
    return out


# ---------------------------------------------------------------------------
# starcoder / jais2
# ---------------------------------------------------------------------------

def test_starcoder(tmp_path):
    """gpt-bigcode: learned positions + LN + fused biased MQA QKV + gelu seq
    FFN (reference src/models/starcoder.cpp)."""
    w = _writer("starcoder", kv=1)
    emit, _ = _emit_fn(0)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "position_embd.weight", 256, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output_norm.bias", E, scale=0.02)
    qkv = E + 2 * (1 * HD)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_norm.bias", E, scale=0.02)
        emit(w, b + "attn_qkv.weight", qkv, E)
        emit(w, b + "attn_qkv.bias", qkv, scale=0.05)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_output.bias", E, scale=0.02)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.bias", E, scale=0.02)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.02)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.02)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_jais2(tmp_path):
    """Jais-2: LN blocks + biased separate QKV + NEOX rope + relu^2 seq FFN
    (reference src/models/jais2.cpp)."""
    w = _writer("jais2")
    emit, _ = _emit_fn(1)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output_norm.bias", E, scale=0.02)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_norm.bias", E, scale=0.02)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_q.bias", H * HD, scale=0.02)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_k.bias", HKV * HD, scale=0.02)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_v.bias", HKV * HD, scale=0.02)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_output.bias", E, scale=0.02)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.bias", E, scale=0.02)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_up.bias", FF, scale=0.02)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.02)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


# ---------------------------------------------------------------------------
# deci (per-layer head arrays)
# ---------------------------------------------------------------------------

def _emit_llama_layer(emit, w, b, heads=H, kv=HKV):
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "attn_q.weight", heads * HD, E)
    emit(w, b + "attn_k.weight", kv * HD, E)
    emit(w, b + "attn_v.weight", kv * HD, E)
    emit(w, b + "attn_output.weight", E, heads * HD)
    emit(w, b + "ffn_norm.weight", E, ones=True)
    emit(w, b + "ffn_gate.weight", FF, E)
    emit(w, b + "ffn_up.weight", FF, E)
    emit(w, b + "ffn_down.weight", E, FF)


def test_deci_uniform_equals_llama(tmp_path):
    """With uniform per-layer arrays, the deci graph IS the llama graph:
    byte-identical weights must give identical logits (exact plumbing check
    for n_head_arr/n_head_kv_arr)."""
    outs = []
    for arch, heads, kv in (("llama", H, HKV),
                            ("deci", [H] * L, [HKV] * L)):
        w = _writer(arch, heads=heads, kv=kv)
        emit, _ = _emit_fn(42)  # same seed -> identical tensors
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E, ones=True)
        emit(w, "output.weight", V, E)
        for i in range(L):
            _emit_llama_layer(emit, w, f"blk.{i}.")
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        outs.append(_logits(p))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_deci_special_layers_numeric(tmp_path):
    """Linear-attention (n_head>0, n_head_kv==0) and attention-free
    (n_head==0) layers vs a numpy transcription of deci.cpp's graph."""
    w = _writer("deci", n_layers=2, heads=[H, 0], kv=[0, 0])
    emit, st = _emit_fn(7)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E)
    emit(w, "output.weight", V, E)
    # layer 0: linear attention (attn_norm + wo only)
    emit(w, "blk.0.attn_norm.weight", E)
    emit(w, "blk.0.attn_output.weight", E, E)
    emit(w, "blk.0.ffn_norm.weight", E)
    emit(w, "blk.0.ffn_gate.weight", FF, E)
    emit(w, "blk.0.ffn_up.weight", FF, E)
    emit(w, "blk.0.ffn_down.weight", E, FF)
    # layer 1: attention-free (FFN only, normed by ffn_norm)
    emit(w, "blk.1.ffn_norm.weight", E)
    emit(w, "blk.1.ffn_gate.weight", FF, E)
    emit(w, "blk.1.ffn_up.weight", FF, E)
    emit(w, "blk.1.ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    got = _logits(p)

    def rms(x, g):
        return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + 1e-5) * g

    def silu(x):
        return x / (1.0 + np.exp(-x))

    x = st["token_embd.weight"][PROMPT].astype(np.float64)
    # layer 0: x += wo @ norm(x); then x += ffn(ffn_norm(x))
    h = rms(x, st["blk.0.attn_norm.weight"])
    x = x + h @ st["blk.0.attn_output.weight"].T
    h = rms(x, st["blk.0.ffn_norm.weight"])
    x = x + (silu(h @ st["blk.0.ffn_gate.weight"].T)
             * (h @ st["blk.0.ffn_up.weight"].T)) @ st["blk.0.ffn_down.weight"].T
    # layer 1: attention-free
    h = rms(x, st["blk.1.ffn_norm.weight"])
    x = x + (silu(h @ st["blk.1.ffn_gate.weight"].T)
             * (h @ st["blk.1.ffn_up.weight"].T)) @ st["blk.1.ffn_down.weight"].T
    want = rms(x[-1], st["output_norm.weight"]) @ st["output.weight"].T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deci_mixed_structural(tmp_path):
    """4-layer mix: normal GQA / linear-attn / attention-free / dummy
    identity — loads and decodes."""
    w = _writer("deci", n_layers=4, heads=[H, H, 0, 0], kv=[HKV, 0, 0, 0])
    emit, _ = _emit_fn(8)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    _emit_llama_layer(emit, w, "blk.0.")
    emit(w, "blk.1.attn_norm.weight", E, ones=True)
    emit(w, "blk.1.attn_output.weight", E, E)
    emit(w, "blk.1.ffn_norm.weight", E, ones=True)
    emit(w, "blk.1.ffn_gate.weight", FF, E)
    emit(w, "blk.1.ffn_up.weight", FF, E)
    emit(w, "blk.1.ffn_down.weight", E, FF)
    emit(w, "blk.2.ffn_norm.weight", E, ones=True)
    emit(w, "blk.2.ffn_gate.weight", FF, E)
    emit(w, "blk.2.ffn_up.weight", FF, E)
    emit(w, "blk.2.ffn_down.weight", E, FF)
    # blk.3: dummy — no tensors at all
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


# ---------------------------------------------------------------------------
# nanbeige (looped layers)
# ---------------------------------------------------------------------------

def test_nanbeige_loops_equal_unrolled(tmp_path):
    """n_loops=2 with skip_loop_final_norm == a llama model whose layer
    stack is physically unrolled twice (exact logit equality proves the
    shared-weight loop + per-logical-layer KV wiring)."""
    # nanbeige: 2 physical layers, 2 loops
    w = _writer("nanbeige", n_layers=L,
                extra_md={"num_loops": np.uint32(2),
                          "skip_loop_final_norm": True})
    emit, st = _emit_fn(11)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    for i in range(L):
        _emit_llama_layer(emit, w, f"blk.{i}.")
    p1 = str(tmp_path / "nb.gguf")
    w.write(p1)

    # llama: 4 layers = the same 2 repeated
    w = _writer("llama", n_layers=2 * L)
    emit2, _ = _emit_fn(11)  # same seed: blk.0/1 tensors identical
    emit2(w, "token_embd.weight", V, E, scale=0.05)
    emit2(w, "output_norm.weight", E, ones=True)
    emit2(w, "output.weight", V, E)
    for i in range(L):
        _emit_llama_layer(emit2, w, f"blk.{i}.")
    # replicate physical layers as logical 2..3 byte-for-byte
    for i in range(L):
        for suf in ("attn_norm", "attn_q", "attn_k", "attn_v", "attn_output",
                    "ffn_norm", "ffn_gate", "ffn_up", "ffn_down"):
            name = f"blk.{i}.{suf}.weight"
            arr = st[name]
            w.add_tensor(f"blk.{i + L}.{suf}.weight", arr.tobytes(),
                         tuple(reversed(arr.shape)), GGMLType.F32)
    p2 = str(tmp_path / "llama.gguf")
    w.write(p2)
    np.testing.assert_allclose(_logits(p1), _logits(p2), rtol=1e-5, atol=1e-5)


def test_nanbeige_loop_norm_structural(tmp_path):
    """Default (no skip): output_norm re-applied at the loop boundary —
    loads, decodes, and differs from the skip variant."""
    outs = []
    for skip in (True, False):
        w = _writer("nanbeige", n_layers=L,
                    extra_md={"num_loops": np.uint32(2),
                              "skip_loop_final_norm": skip})
        emit, _ = _emit_fn(12)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E)  # non-trivial norm weight
        emit(w, "output.weight", V, E)
        for i in range(L):
            _emit_llama_layer(emit, w, f"blk.{i}.")
        p = str(tmp_path / f"nb{skip}.gguf")
        w.write(p)
        outs.append(_logits(p))
    assert not np.allclose(outs[0], outs[1])


# ---------------------------------------------------------------------------
# openelm (per-layer heads + fused qkv + shared qk-norm)
# ---------------------------------------------------------------------------

def test_openelm_numeric(tmp_path):
    """Per-layer (n_head, n_kv_head) = (4,2) then (2,1) vs a numpy
    transcription of openelm.cpp's graph: fused [q|k|v] split, shared
    [head_dim] q/k rmsnorm, NEOX rope, parallel silu-GLU FFN, tied output."""
    heads, kvh = [4, 2], [2, 1]
    w = _writer("openelm", heads=heads, kv=kvh)
    emit, st = _emit_fn(21)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        nq, nk = heads[i], kvh[i]
        emit(w, b + "attn_norm.weight", E)
        emit(w, b + "attn_qkv.weight", (nq + 2 * nk) * HD, E)
        emit(w, b + "attn_q_norm.weight", HD)
        emit(w, b + "attn_k_norm.weight", HD)
        emit(w, b + "attn_output.weight", E, nq * HD)
        emit(w, b + "ffn_norm.weight", E)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    got = _logits(p)

    def rms(x, g):
        return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + 1e-5) * g

    def silu(x):
        return x / (1.0 + np.exp(-x))

    def neox_rope(x, pos):  # x [T, Hh, D]
        d = x.shape[-1]
        half = d // 2
        inv = 10000.0 ** (-np.arange(half) * 2.0 / d)
        ang = pos[:, None] * inv[None]  # [T, half]
        cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                              axis=-1)

    T = len(PROMPT)
    pos = np.arange(T, dtype=np.float64)
    x = st["token_embd.weight"][PROMPT].astype(np.float64)
    for i in range(L):
        b = f"blk.{i}."
        nq, nk = heads[i], kvh[i]
        h = rms(x, st[b + "attn_norm.weight"])
        qkv = (h @ st[b + "attn_qkv.weight"].T).reshape(T, nq + 2 * nk, HD)
        q, k, v = qkv[:, :nq], qkv[:, nq:nq + nk], qkv[:, nq + nk:]
        q = rms(q, st[b + "attn_q_norm.weight"])
        k = rms(k, st[b + "attn_k_norm.weight"])
        q, k = neox_rope(q, pos), neox_rope(k, pos)
        g = nq // nk
        attn_o = np.zeros((T, nq, HD))
        for hq in range(nq):
            kk, vv = k[:, hq // g], v[:, hq // g]  # [T, D]
            sc = (q[:, hq] @ kk.T) / np.sqrt(HD)
            sc = np.where(np.tril(np.ones((T, T), bool)), sc, -np.inf)
            pr = np.exp(sc - sc.max(-1, keepdims=True))
            pr = pr / pr.sum(-1, keepdims=True)
            attn_o[:, hq] = pr @ vv
        x = x + attn_o.reshape(T, nq * HD) @ st[b + "attn_output.weight"].T
        h = rms(x, st[b + "ffn_norm.weight"])
        x = x + (silu(h @ st[b + "ffn_gate.weight"].T)
                 * (h @ st[b + "ffn_up.weight"].T)) @ st[b + "ffn_down.weight"].T
    want = rms(x[-1], st["output_norm.weight"]) @ st["token_embd.weight"].T
    # f32 model vs f64 transcription: ~1e-4/layer accumulation
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# rwkv hybrids (rwkv6qwen2 / arwkv7)
# ---------------------------------------------------------------------------

def test_gla_scan_matches_recurrence():
    """gated linear attention scan vs the reference kernel's per-step
    recurrence (ggml_compute_forward_gla_f32): S_t = w[i]S + k[i]v[j],
    y[j] = scale * sum_i r[i] S_t[i,j]."""
    import jax.numpy as jnp

    from llama_cpp_tpu.models.rwkv import gla_scan

    rng = np.random.default_rng(0)
    B, T, Hh, hs = 2, 7, 3, 8
    r, k, v = (rng.standard_normal((B, T, Hh, hs)) for _ in range(3))
    w = rng.uniform(0.5, 1.0, (B, T, Hh, hs))
    s0 = rng.standard_normal((B, Hh, hs, hs))
    scale = hs ** -0.5

    y, sT = gla_scan(jnp.asarray(s0), jnp.asarray(r), jnp.asarray(k),
                     jnp.asarray(v), jnp.asarray(w), scale)
    S = s0.copy()
    ys = np.zeros((B, T, Hh, hs))
    for t in range(T):
        S = w[:, t, :, :, None] * S + k[:, t, :, :, None] * v[:, t, :, None, :]
        ys[:, t] = np.einsum("bhi,bhij->bhj", r[:, t], S) * scale
    np.testing.assert_allclose(np.asarray(y), ys, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), S, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch", ["rwkv6qwen2", "arwkv7"])
def test_rwkv_hybrid_prefill_equals_stepwise(arch, tmp_path):
    """The hybrids' parallel-scan prefill must equal one-token-at-a-time
    decode (exact recurrent-state correctness), and generate end-to-end."""
    import jax.numpy as jnp

    from llama_cpp_tpu.testing import make_tiny_rwkv_hybrid_gguf

    p = str(tmp_path / "m.gguf")
    make_tiny_rwkv_hybrid_gguf(p, arch=arch)
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    prompt = [3, 5, 9, 2, 7, 11]

    ctx = Context(model, n_ctx=64, n_seqs=1)
    full = np.asarray(ctx.prefill(prompt, seq=0))

    ctx2 = Context(model, n_ctx=64, n_seqs=1, n_ubatch=1)
    step = None
    for off in range(len(prompt)):
        step = ctx2.decode(np.asarray([[prompt[off]]]), np.asarray([0]),
                           np.asarray([[off]]), np.asarray([0]))
    np.testing.assert_allclose(full, np.asarray(step)[0], rtol=2e-4, atol=2e-4)

    out = Context(model, n_ctx=64, n_seqs=1).generate(
        prompt, max_new_tokens=4)
    assert len(out) >= 1 and all(0 <= t < 256 for t in out)


# ---------------------------------------------------------------------------
# mistral4 / plm (MLA family) + nemotron_h_moe alias
# ---------------------------------------------------------------------------

def _emit_mla_layers(emit, w, q_lora=True):
    n_rot, nope, dv, kvr, qr = 8, 8, 16, 16, 24
    hd_k = n_rot + nope
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        if q_lora:
            emit(w, b + "attn_q_a.weight", qr, E)
            emit(w, b + "attn_q_a_norm.weight", qr, ones=True)
            emit(w, b + "attn_q_b.weight", H * hd_k, qr)
        else:
            emit(w, b + "attn_q.weight", H * hd_k, E)
        emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
        emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
        emit(w, b + "attn_kv_b.weight", H * (nope + dv), kvr)
        emit(w, b + "attn_output.weight", E, H * dv)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    return n_rot, kvr, qr, hd_k, dv


def test_mistral4_is_deepseek2_alias(tmp_path):
    """mistral4 == deepseek2 graph (reference models.h:1316): identical
    weights under either arch name give identical logits."""
    outs = []
    for arch in ("deepseek2", "mistral4"):
        n_rot = 8
        w = _writer(arch, n_rot=n_rot, extra_md={
            "attention.kv_lora_rank": np.uint32(16),
            "attention.q_lora_rank": np.uint32(24),
            "attention.key_length": np.uint32(16),
            "attention.value_length": np.uint32(16),
        })
        emit, _ = _emit_fn(55)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E, ones=True)
        emit(w, "output.weight", V, E)
        _emit_mla_layers(emit, w)
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        outs.append(_logits(p))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_plm_mla_relu2(tmp_path):
    """PLM (reference src/models/plm.cpp): MLA without q-lora + non-gated
    relu^2 FFN + tied output."""
    w = _writer("plm", n_rot=8, extra_md={
        "attention.kv_lora_rank": np.uint32(16),
        "attention.key_length": np.uint32(16),
        "attention.value_length": np.uint32(16),
    })
    emit, _ = _emit_fn(56)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    n_rot, nope, dv, kvr = 8, 8, 16, 16
    hd_k = n_rot + nope
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * hd_k, E)
        emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
        emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
        emit(w, b + "attn_kv_b.weight", H * (nope + dv), kvr)
        emit(w, b + "attn_output.weight", E, H * dv)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_up.weight", FF, E)  # no gate: relu^2 seq FFN
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    m = load_model(p, prefer_quant=False)
    assert m.cfg.extra.get("mla_absorb"), "plm should use the latent cache"
    _run(p)


def test_nemotron_h_moe(tmp_path):
    """nemotron_h_moe == nemotron_h alias (models.h:1458) whose F-layers
    carry MoE expert tensors."""
    a = "nemotron_h_moe"
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, a)
    w.add(Keys.General.NAME, "tiny-nhm")
    d_state, d_conv, d_inner, ng = 16, 4, 2 * E, 1
    heads_m = d_inner // 16
    w.add(a + ".block_count", np.uint32(3))
    w.add(a + ".context_length", np.uint32(256))
    w.add(a + ".embedding_length", np.uint32(E))
    w.add(a + ".feed_forward_length", np.uint32(FF))
    w.add(a + ".attention.head_count", np.uint32(H))
    w.add(a + ".attention.head_count_kv", np.asarray([0, HKV, 0], np.uint32))
    w.add(a + ".attention.layer_norm_rms_epsilon", 1e-5)
    w.add(a + ".ssm.conv_kernel", np.uint32(d_conv))
    w.add(a + ".ssm.inner_size", np.uint32(d_inner))
    w.add(a + ".ssm.state_size", np.uint32(d_state))
    w.add(a + ".ssm.group_count", np.uint32(ng))
    w.add(a + ".ssm.time_step_rank", np.uint32(heads_m))
    w.add(a + ".expert_count", np.uint32(4))
    w.add(a + ".expert_used_count", np.uint32(2))
    w.add(a + ".vocab_size", np.uint32(V))
    vocab = tiny_spm_vocab(V)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES,
              Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:V]
    w.add_all(vocab)
    emit, _ = _emit_fn(57)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    conv_dim = d_inner + 2 * ng * d_state
    # layer 0: mamba2 M-block
    b = "blk.0."
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "ssm_in.weight", 2 * d_inner + 2 * ng * d_state + heads_m, E)
    emit(w, b + "ssm_conv1d.weight", conv_dim, d_conv)
    emit(w, b + "ssm_conv1d.bias", conv_dim, scale=0.02)
    emit(w, b + "ssm_dt.bias", heads_m, scale=0.1)
    emit(w, b + "ssm_a", heads_m, scale=0.1)
    emit(w, b + "ssm_d", heads_m, scale=0.1)
    emit(w, b + "ssm_norm.weight", d_inner, ones=True)
    emit(w, b + "ssm_out.weight", E, d_inner)
    # layer 1: attention A-block
    b = "blk.1."
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "attn_q.weight", H * HD, E)
    emit(w, b + "attn_k.weight", HKV * HD, E)
    emit(w, b + "attn_v.weight", HKV * HD, E)
    emit(w, b + "attn_output.weight", E, H * HD)
    # layer 2: MoE F-block
    b = "blk.2."
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "ffn_gate_inp.weight", 4, E)
    emit(w, b + "ffn_up_exps.weight", 4, FF, E)
    emit(w, b + "ffn_down_exps.weight", 4, E, FF)
    emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


# ---------------------------------------------------------------------------
# laguna
# ---------------------------------------------------------------------------

def _laguna_writer(tmp_path, seed, per_head_gate, name):
    w = _writer("laguna", extra_md={
        "leading_dense_block_count": np.uint32(1),
        "expert_count": np.uint32(4),
        "expert_used_count": np.uint32(2),
        "expert_feed_forward_length": np.uint32(FF),
        "expert_shared_feed_forward_length": np.uint32(FF),
        "expert_weights_scale": np.float32(1.5),
        "expert_gating_func": np.uint32(2),
    })
    emit, st = _emit_fn(seed)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    rng = np.random.default_rng(seed + 1000)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_q_norm.weight", HD, ones=True)
        emit(w, b + "attn_k_norm.weight", HD, ones=True)
        emit(w, b + "attn_output.weight", E, H * HD)
        # the gate: same per-head weights expressed both ways
        gw = (rng.standard_normal((H, E)) * 0.1).astype(np.float32)
        if per_head_gate:
            arr = gw
        else:
            arr = np.repeat(gw, HD, axis=0)  # per-element, head-constant
        w.add_tensor(b + "attn_gate.weight", arr.tobytes(),
                     tuple(reversed(arr.shape)), GGMLType.F32)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        if i == 0:  # leading dense layer
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        else:
            emit(w, b + "ffn_gate_inp.weight", 4, E)
            emit(w, b + "ffn_exp_probs_b.bias", 4, scale=0.1)
            emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
            emit(w, b + "ffn_up_exps.weight", 4, FF, E)
            emit(w, b + "ffn_down_exps.weight", 4, E, FF)
            emit(w, b + "ffn_gate_shexp.weight", FF, E)
            emit(w, b + "ffn_up_shexp.weight", FF, E)
            emit(w, b + "ffn_down_shexp.weight", E, FF)
    p = str(tmp_path / name)
    w.write(p)
    return p


def test_laguna_gate_shapes_equivalent(tmp_path):
    """Per-head softplus gate == per-element gate whose weight rows are
    head-constant (exercises both reshape paths of laguna.cpp:243-249),
    plus dense-lead + sigmoid MoE + shared expert end-to-end."""
    p1 = _laguna_writer(tmp_path, 60, True, "ph.gguf")
    p2 = _laguna_writer(tmp_path, 60, False, "pe.gguf")
    a, b = _logits(p1), _logits(p2)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    _run(p1)


# ---------------------------------------------------------------------------
# jina-bert-v2 (ALiBi encoder)
# ---------------------------------------------------------------------------

def test_jina_bert_v2_numeric(tmp_path):
    """Symmetric-ALiBi post-norm encoder with up-contains-gate GEGLU vs a
    numpy transcription of bert.cpp's JINA_BERT_V2 branches."""
    w = _writer("jina-bert-v2", kv=H)
    emit, st = _emit_fn(70)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "token_types.weight", 2, E, scale=0.05)
    emit(w, "token_embd_norm.weight", E)
    emit(w, "token_embd_norm.bias", E, scale=0.02)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_q.weight", E, E)
        emit(w, b + "attn_q.bias", E, scale=0.02)
        emit(w, b + "attn_k.weight", E, E)
        emit(w, b + "attn_k.bias", E, scale=0.02)
        emit(w, b + "attn_v.weight", E, E)
        emit(w, b + "attn_v.bias", E, scale=0.02)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "attn_output.bias", E, scale=0.02)
        emit(w, b + "attn_output_norm.weight", E)
        emit(w, b + "attn_output_norm.bias", E, scale=0.02)
        emit(w, b + "ffn_up.weight", 2 * FF, E)  # up-contains-gate GEGLU
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "ffn_down.bias", E, scale=0.02)
        emit(w, b + "layer_output_norm.weight", E)
        emit(w, b + "layer_output_norm.bias", E, scale=0.02)
    p = str(tmp_path / "m.gguf")
    w.write(p)

    import jax.numpy as jnp

    toks = [3, 5, 9, 2]
    m = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    got = Context(m, n_ctx=64, n_seqs=1).embed(toks, pooling="mean")

    def ln(x, g, b):
        mu = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(v + 1e-5) * g + b

    def gelu(x):
        return 0.5 * x * (1.0 + np.tanh(
            np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))

    T = len(toks)
    x = (st["token_embd.weight"][toks]
         + st["token_types.weight"][0]).astype(np.float64)
    x = ln(x, st["token_embd_norm.weight"], st["token_embd_norm.bias"])
    n2 = 1 << (H.bit_length() - 1)
    m0, m1 = 2.0 ** (-8.0 / n2), 2.0 ** (-4.0 / n2)
    slopes = np.array([m0 ** (i + 1) for i in range(n2)]
                      + [m1 ** (2 * i + 1) for i in range(H - n2)])
    for i in range(L):
        b = f"blk.{i}."
        q = (x @ st[b + "attn_q.weight"].T + st[b + "attn_q.bias"])
        k = (x @ st[b + "attn_k.weight"].T + st[b + "attn_k.bias"])
        v = (x @ st[b + "attn_v.weight"].T + st[b + "attn_v.bias"])
        q = q.reshape(T, H, HD)
        k = k.reshape(T, H, HD)
        v = v.reshape(T, H, HD)
        ao = np.zeros((T, H, HD))
        pos = np.arange(T)
        for hq in range(H):
            sc = (q[:, hq] @ k[:, hq].T) / np.sqrt(HD)
            sc = sc - slopes[hq] * np.abs(pos[:, None] - pos[None, :])
            pr = np.exp(sc - sc.max(-1, keepdims=True))
            pr = pr / pr.sum(-1, keepdims=True)
            ao[:, hq] = pr @ v[:, hq]
        attn = (ao.reshape(T, E) @ st[b + "attn_output.weight"].T
                + st[b + "attn_output.bias"])
        x = ln(x + attn, st[b + "attn_output_norm.weight"],
               st[b + "attn_output_norm.bias"])
        up = x @ st[b + "ffn_up.weight"].T
        h = gelu(up[:, :FF]) * up[:, FF:]
        y = h @ st[b + "ffn_down.weight"].T + st[b + "ffn_down.bias"]
        x = ln(x + y, st[b + "layer_output_norm.weight"],
               st[b + "layer_output_norm.bias"])
    want = x.mean(axis=0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# qwen3vl family (IMROPE + deepstack)
# ---------------------------------------------------------------------------

def _emit_qwen3_layers(emit, w):
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_q_norm.weight", HD, ones=True)
        emit(w, b + "attn_k_norm.weight", HD, ones=True)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)


def test_qwen3vl_text_equals_qwen3(tmp_path):
    """Text-only IMROPE degenerates to plain NEOX rope (all three position
    streams equal), so qwen3vl == qwen3 on identical weights — exact check
    of the imrope wiring."""
    outs = []
    for arch in ("qwen3", "qwen3vl"):
        extra = {}
        if arch == "qwen3vl":
            # sections chosen so no sector below half routes to the zero
            # "extra" stream: s%3==1 -> s<3*sec1, s%3==2 -> s<3*sec2
            extra["rope.dimension_sections"] = np.asarray(
                [3, 3, 2, 0], np.uint32)
        w = _writer(arch, extra_md=extra)
        emit, _ = _emit_fn(80)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E, ones=True)
        emit(w, "output.weight", V, E)
        _emit_qwen3_layers(emit, w)
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        outs.append(_logits(p))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_imrope_selector_matches_reference():
    """apply_mrope(interleaved=True) vs a transcription of the reference
    sector rule (ggml-cpu/ops.cpp:5898-5907) with DISTINCT t/h/w streams."""
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.rope import RopeParams, apply_mrope

    rng = np.random.default_rng(0)
    T_, Hh, D = 5, 2, 32
    half = D // 2
    sections = (8, 4, 4, 0)
    x = rng.standard_normal((1, T_, Hh, D)).astype(np.float32)
    pos3 = np.stack([np.arange(T_), 2 * np.arange(T_) + 1, 7 - np.arange(T_)])
    got = np.asarray(apply_mrope(
        jnp.asarray(x), jnp.asarray(pos3[:, None, :]), sections,
        RopeParams(n_dims=D, freq_base=10000.0), interleaved=True))

    want = x.copy()
    for t in range(T_):
        for s in range(half):  # sector rule
            if s % 3 == 1 and s < 3 * sections[1]:
                p = pos3[1, t]
            elif s % 3 == 2 and s < 3 * sections[2]:
                p = pos3[2, t]
            elif s % 3 == 0 and s < 3 * sections[0]:
                p = pos3[0, t]
            else:
                p = 0  # 4th stream is zero for text (llama-graph.cpp:138)
            theta = p * 10000.0 ** (-2.0 * s / D)
            c, si = np.cos(theta), np.sin(theta)
            for hh in range(Hh):
                x0, x1 = x[0, t, hh, s], x[0, t, hh, s + half]
                want[0, t, hh, s] = x0 * c - x1 * si
                want[0, t, hh, s + half] = x0 * si + x1 * c
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_qwen3vl_deepstack_zero_equals_text(tmp_path):
    """Wide (1+n_ds)*E inputs_embeds with ZERO deepstack slices must equal
    the plain text forward (deepstack residual wiring)."""
    import jax.numpy as jnp

    w = _writer("qwen3vl", extra_md={
        "rope.dimension_sections": np.asarray([HD // 4, HD // 8, HD // 8, 0],
                                              np.uint32),
        "n_deepstack_layers": np.uint32(1),
    })
    emit, st = _emit_fn(81)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    _emit_qwen3_layers(emit, w)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    from llama_cpp_tpu.models.transformer import AttnInputs, forward

    toks = np.asarray([PROMPT])
    pos = np.arange(len(PROMPT))[None]
    inputs = AttnInputs(seq_idx=jnp.asarray([0]), slots=jnp.asarray(pos),
                        positions=jnp.asarray(pos))

    def fresh_kv():
        from llama_cpp_tpu.runtime.context import Context
        return Context(model, n_ctx=32, n_seqs=1).kv

    logits_txt, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                            inputs, fresh_kv())
    emb = st["token_embd.weight"][PROMPT][None]  # [1, T, E]
    wide = np.concatenate([emb, np.zeros_like(emb)], axis=-1)
    logits_ds, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                           inputs, fresh_kv(),
                           inputs_embeds=jnp.asarray(wide, jnp.float32))
    np.testing.assert_allclose(np.asarray(logits_txt), np.asarray(logits_ds),
                               rtol=1e-5, atol=1e-5)
    # and non-zero slices change the result
    wide2 = wide.copy()
    wide2[..., E:] = 0.1
    logits_nz, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                           inputs, fresh_kv(),
                           inputs_embeds=jnp.asarray(wide2, jnp.float32))
    assert not np.allclose(np.asarray(logits_txt), np.asarray(logits_nz))


def test_qwen3vlmoe_and_tts(tmp_path):
    """qwen3vlmoe structural (IMROPE + expert FFN); qwen3tts loads with the
    audio-codebook output head."""
    for arch in ("qwen3vlmoe", "qwen3tts"):
        extra = {"rope.dimension_sections": np.asarray(
            [HD // 4, HD // 8, HD // 8, 0], np.uint32)}
        if arch == "qwen3vlmoe":
            extra.update({"expert_count": np.uint32(4),
                          "expert_used_count": np.uint32(2)})
        w = _writer(arch, extra_md=extra)
        emit, _ = _emit_fn(82)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E, ones=True)
        emit(w, "output.weight", (48 if arch == "qwen3tts" else V), E)
        for i in range(L):
            b = f"blk.{i}."
            emit(w, b + "attn_norm.weight", E, ones=True)
            emit(w, b + "attn_q.weight", H * HD, E)
            emit(w, b + "attn_k.weight", HKV * HD, E)
            emit(w, b + "attn_v.weight", HKV * HD, E)
            emit(w, b + "attn_q_norm.weight", HD, ones=True)
            emit(w, b + "attn_k_norm.weight", HD, ones=True)
            emit(w, b + "attn_output.weight", E, H * HD)
            emit(w, b + "ffn_norm.weight", E, ones=True)
            if arch == "qwen3vlmoe":
                emit(w, b + "ffn_gate_inp.weight", 4, E)
                emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
                emit(w, b + "ffn_up_exps.weight", 4, FF, E)
                emit(w, b + "ffn_down_exps.weight", 4, E, FF)
            else:
                emit(w, b + "ffn_gate.weight", FF, E)
                emit(w, b + "ffn_up.weight", FF, E)
                emit(w, b + "ffn_down.weight", E, FF)
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        if arch == "qwen3tts":
            model = load_model(p, prefer_quant=False)
            ctx = Context(model, n_ctx=64, n_seqs=1)
            logits = ctx.prefill(PROMPT, seq=0)
            assert logits.shape[-1] == 48  # audio codebook head
        else:
            _run(p)


# ---------------------------------------------------------------------------
# qwen35 / qwen35moe (hybrid DeltaNet + gated attention + IMROPE)
# ---------------------------------------------------------------------------

def test_qwen35_deltanet_layouts_equivalent():
    """The optimized qwen35 tensor layout (flat wqkv + z gate + separate
    ssm_beta/ssm_alpha) must produce the same mixer output as qwen3next's
    legacy interleaved ssm_in/ssm_ba built from the SAME weights."""
    import jax.numpy as jnp

    from llama_cpp_tpu.models import mamba
    from llama_cpp_tpu.models.config import ModelConfig

    rng = np.random.default_rng(0)
    E_, T_, B_ = 32, 6, 2
    Dk, Hk, Hv, Dv = 8, 2, 4, 8
    R = Hv // Hk
    key_dim, d_inner, d_conv = Hk * Dk, Hv * Dv, 3

    cfg = ModelConfig(arch="qwen35", n_embd=E_)
    cfg.extra.update(ssm_d_state=Dk, ssm_n_group=Hk, ssm_dt_rank=Hv,
                     ssm_d_inner=d_inner, ssm_d_conv=d_conv)

    wq = rng.standard_normal((E_, key_dim)).astype(np.float32) * 0.2
    wk = rng.standard_normal((E_, key_dim)).astype(np.float32) * 0.2
    wv = rng.standard_normal((E_, d_inner)).astype(np.float32) * 0.2
    wz = rng.standard_normal((E_, d_inner)).astype(np.float32) * 0.2
    wb = rng.standard_normal((E_, Hv)).astype(np.float32) * 0.2
    wa = rng.standard_normal((E_, Hv)).astype(np.float32) * 0.2

    common = {
        "ssm_conv1d": jnp.asarray(
            rng.standard_normal((2 * key_dim + d_inner, d_conv)) * 0.2),
        "ssm_dt_bias": jnp.asarray(rng.standard_normal(Hv) * 0.1),
        "ssm_a": jnp.asarray(-np.exp(rng.standard_normal(Hv) * 0.3)),
        "ssm_norm": jnp.asarray(1 + rng.standard_normal(Dv) * 0.02),
        "ssm_out": jnp.asarray(
            (rng.standard_normal((E_, d_inner)) * 0.2).astype(np.float32)),
    }
    # legacy interleave: per k-head [q | k | v_group | z_group]
    win = np.concatenate([np.concatenate([
        wq[:, g * Dk:(g + 1) * Dk], wk[:, g * Dk:(g + 1) * Dk],
        wv[:, g * R * Dv:(g + 1) * R * Dv],
        wz[:, g * R * Dv:(g + 1) * R * Dv]], axis=1)
        for g in range(Hk)], axis=1)
    # legacy ba: per k-head [beta_group | alpha_group]
    wba = np.concatenate([np.concatenate([
        wb[:, g * R:(g + 1) * R], wa[:, g * R:(g + 1) * R]], axis=1)
        for g in range(Hk)], axis=1)

    # dense weights are stored [O, K] (matmul computes x @ W^T)
    lw_legacy = dict(common, ssm_in=jnp.asarray(win.T.copy()),
                     ssm_ba=jnp.asarray(wba.T.copy()))
    lw_opt = dict(common, attn_qkv=jnp.asarray(
        np.concatenate([wq, wk, wv], axis=1).T.copy()),
        attn_gate=jnp.asarray(wz.T.copy()), ssm_beta=jnp.asarray(wb.T.copy()),
        ssm_alpha=jnp.asarray(wa.T.copy()))

    class Mem:
        conv = np.zeros((1, 2, d_conv - 1, 2 * key_dim + d_inner), np.float32)
        ssm = np.zeros((1, 2, Dk, d_inner), np.float32)

    h = jnp.asarray(rng.standard_normal((B_, T_, E_)).astype(np.float32))
    sidx = jnp.asarray([0, 1])
    y1, c1, s1 = mamba.gated_delta_layer(cfg, lw_legacy, h, Mem, sidx, 0)
    y2, c2, s2 = mamba.gated_delta_layer(cfg, lw_opt, h, Mem, sidx, 0)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch", ["qwen35", "qwen35moe"])
def test_qwen35_hybrid(arch, tmp_path):
    """Alternating DeltaNet/gated-attention stack loads, prefill equals
    stepwise decode (recurrent+KV state), and generates."""
    import jax.numpy as jnp

    Dk, Hk, Hv, Dv = 8, 2, 4, 16
    key_dim, d_inner, d_conv = Hk * Dk, Hv * Dv, 3
    w = _writer(arch, extra_md={
        "ssm.conv_kernel": np.uint32(d_conv),
        "ssm.inner_size": np.uint32(d_inner),
        "ssm.state_size": np.uint32(Dk),
        "ssm.group_count": np.uint32(Hk),
        "ssm.time_step_rank": np.uint32(Hv),
        "rope.dimension_sections": np.asarray([3, 3, 2, 0], np.uint32),
        **({"expert_count": np.uint32(4), "expert_used_count": np.uint32(2)}
           if arch == "qwen35moe" else {}),
    })
    emit, _ = _emit_fn(83)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_post_norm.weight", E, ones=True)
        if i % 2 == 0:  # DeltaNet linear layer (optimized layout)
            emit(w, b + "attn_qkv.weight", 2 * key_dim + d_inner, E)
            emit(w, b + "attn_gate.weight", d_inner, E)
            emit(w, b + "ssm_conv1d.weight", 2 * key_dim + d_inner, d_conv)
            emit(w, b + "ssm_dt.bias", Hv, scale=0.1)
            emit(w, b + "ssm_a", Hv, scale=0.1)
            emit(w, b + "ssm_beta.weight", Hv, E)
            emit(w, b + "ssm_alpha.weight", Hv, E)
            emit(w, b + "ssm_norm.weight", Dv, ones=True)
            emit(w, b + "ssm_out.weight", E, d_inner)
        else:  # gated full attention: wq emits per-head [q|gate]
            emit(w, b + "attn_q.weight", 2 * H * HD, E)
            emit(w, b + "attn_k.weight", HKV * HD, E)
            emit(w, b + "attn_v.weight", HKV * HD, E)
            emit(w, b + "attn_q_norm.weight", HD, ones=True)
            emit(w, b + "attn_k_norm.weight", HD, ones=True)
            emit(w, b + "attn_output.weight", E, H * HD)
        if arch == "qwen35moe":
            emit(w, b + "ffn_norm.weight", E, ones=True)
            emit(w, b + "ffn_gate_inp.weight", 4, E)
            emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
            emit(w, b + "ffn_up_exps.weight", 4, FF, E)
            emit(w, b + "ffn_down_exps.weight", 4, E, FF)
            emit(w, b + "ffn_gate_inp_shexp.weight", 1, E)
            emit(w, b + "ffn_gate_shexp.weight", FF, E)
            emit(w, b + "ffn_up_shexp.weight", FF, E)
            emit(w, b + "ffn_down_shexp.weight", E, FF)
        else:
            emit(w, b + "ffn_norm.weight", E, ones=True)
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    assert model.cfg.extra["memory"] == "hybrid"
    prompt = PROMPT
    ctx = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    full = np.asarray(ctx.prefill(prompt, seq=0))
    ctx2 = Context(model, n_ctx=64, n_seqs=1, n_ubatch=1,
                   kv_dtype=jnp.float32)
    step = None
    for off in range(len(prompt)):
        step = ctx2.decode(np.asarray([[prompt[off]]]), np.asarray([0]),
                           np.asarray([[off]]), np.asarray([0]))
    np.testing.assert_allclose(full, np.asarray(step)[0], rtol=3e-4,
                               atol=3e-4)
    out = Context(model, n_ctx=64, n_seqs=1).generate(prompt, max_new_tokens=4)
    assert len(out) >= 1


# ---------------------------------------------------------------------------
# glm-dsa
# ---------------------------------------------------------------------------

def test_glm_dsa_presplit_equals_deepseek32(tmp_path):
    """glm-dsa with all-full indexers and pre-split attn_k_b/attn_v_b must
    equal deepseek32 with the SAME math packaged as fused attn_kv_b (checks
    the load-time reassembly exactly)."""
    rng = np.random.default_rng(44)
    n_rot, nope, dv, kvr, qr = 8, 8, 16, 16, 24
    hd_k = n_rot + nope
    Hi, Di, topk = 2, 16, 4
    kb = (rng.standard_normal((L, H, kvr, nope)) * 0.1).astype(np.float32)
    vb = (rng.standard_normal((L, H, dv, kvr)) * 0.1).astype(np.float32)

    outs = []
    for arch in ("deepseek32", "glm-dsa"):
        w = _writer(arch, n_rot=n_rot, extra_md={
            "attention.kv_lora_rank": np.uint32(kvr),
            "attention.q_lora_rank": np.uint32(qr),
            "attention.key_length_mla": np.uint32(hd_k),
            "attention.value_length_mla": np.uint32(dv),
            "attention.key_length": np.uint32(hd_k),
            "attention.value_length": np.uint32(dv),
            "attention.indexer.head_count": np.uint32(Hi),
            "attention.indexer.key_length": np.uint32(Di),
            "attention.indexer.top_k": np.uint32(topk),
        })
        emit, _ = _emit_fn(45)  # same seed: shared non-kv_b tensors
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E, ones=True)
        emit(w, "output.weight", V, E)
        for i in range(L):
            b = f"blk.{i}."
            emit(w, b + "attn_norm.weight", E, ones=True)
            emit(w, b + "attn_q_a.weight", qr, E)
            emit(w, b + "attn_q_a_norm.weight", qr, ones=True)
            emit(w, b + "attn_q_b.weight", H * hd_k, qr)
            emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
            emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
            if arch == "glm-dsa":  # pre-split decompression
                for nm, arr in (("attn_k_b", kb[i]), ("attn_v_b", vb[i])):
                    w.add_tensor(f"{b}{nm}.weight", arr.tobytes(),
                                 tuple(reversed(arr.shape)), GGMLType.F32)
            else:  # fused rows per head: [k_b^T | v_b]
                fused = np.concatenate(
                    [np.swapaxes(kb[i], 1, 2), vb[i]], axis=1
                ).reshape(H * (nope + dv), kvr)
                w.add_tensor(b + "attn_kv_b.weight", fused.tobytes(),
                             tuple(reversed(fused.shape)), GGMLType.F32)
            emit(w, b + "attn_output.weight", E, H * dv)
            emit(w, b + "indexer.proj.weight", Hi, E)
            emit(w, b + "indexer.attn_k.weight", Di, E)
            emit(w, b + "indexer.k_norm.weight", Di, ones=True)
            emit(w, b + "indexer.attn_q_b.weight", Hi * Di, qr)
            emit(w, b + "ffn_norm.weight", E, ones=True)
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        outs.append(_logits(p))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-4)


def test_glm_dsa_lite_indexer_reuse(tmp_path):
    """Layer 1 has NO indexer tensors (lite) — it must reuse layer 0's
    top-k selection and still decode."""
    rng = np.random.default_rng(46)
    n_rot, nope, dv, kvr, qr = 8, 8, 16, 16, 24
    hd_k = n_rot + nope
    Hi, Di, topk = 2, 16, 3
    w = _writer("glm-dsa", n_rot=n_rot, extra_md={
        "attention.kv_lora_rank": np.uint32(kvr),
        "attention.q_lora_rank": np.uint32(qr),
        "attention.key_length_mla": np.uint32(hd_k),
        "attention.value_length_mla": np.uint32(dv),
        "attention.key_length": np.uint32(hd_k),
        "attention.value_length": np.uint32(dv),
        "attention.indexer.head_count": np.uint32(Hi),
        "attention.indexer.key_length": np.uint32(Di),
        "attention.indexer.top_k": np.uint32(topk),
    })
    emit, _ = _emit_fn(47)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q_a.weight", qr, E)
        emit(w, b + "attn_q_a_norm.weight", qr, ones=True)
        emit(w, b + "attn_q_b.weight", H * hd_k, qr)
        emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
        emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
        kb = (rng.standard_normal((H, kvr, nope)) * 0.1).astype(np.float32)
        vb = (rng.standard_normal((H, dv, kvr)) * 0.1).astype(np.float32)
        w.add_tensor(b + "attn_k_b.weight", kb.tobytes(),
                     tuple(reversed(kb.shape)), GGMLType.F32)
        w.add_tensor(b + "attn_v_b.weight", vb.tobytes(),
                     tuple(reversed(vb.shape)), GGMLType.F32)
        emit(w, b + "attn_output.weight", E, H * dv)
        if i == 0:  # only layer 0 carries the full indexer
            emit(w, b + "indexer.proj.weight", Hi, E)
            emit(w, b + "indexer.attn_k.weight", Di, E)
            emit(w, b + "indexer.k_norm.weight", Di, ones=True)
            emit(w, b + "indexer.attn_q_b.weight", Hi * Di, qr)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


def test_hy_v3(tmp_path):
    """Hunyuan V3: dense-lead + sigmoid MoE with probs bias and shared
    expert (reference src/models/hy-v3.cpp)."""
    w = _writer("hy_v3", extra_md={
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_feed_forward_length": np.uint32(FF),
        "expert_gating_func": np.uint32(2),
    })
    emit, _ = _emit_fn(48)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "attn_q.weight", H * HD, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_q_norm.weight", HD, ones=True)
        emit(w, b + "attn_k_norm.weight", HD, ones=True)
        emit(w, b + "attn_output.weight", E, H * HD)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        if i == 0:  # leading dense
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        else:
            emit(w, b + "ffn_gate_inp.weight", 4, E)
            emit(w, b + "exp_probs_b.bias", 4, scale=0.1)
            emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
            emit(w, b + "ffn_up_exps.weight", 4, FF, E)
            emit(w, b + "ffn_down_exps.weight", 4, E, FF)
            emit(w, b + "ffn_gate_shexp.weight", FF, E)
            emit(w, b + "ffn_up_shexp.weight", FF, E)
            emit(w, b + "ffn_down_shexp.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    _run(p)


# ---------------------------------------------------------------------------
# kimi-linear (KDA)
# ---------------------------------------------------------------------------

def test_kimi_linear_hybrid(tmp_path):
    """KDA + rope-free MLA hybrid: loads, prefill == stepwise decode
    (per-channel-decay delta state + separate q/k/v conv windows + MLA KV),
    and generates (reference src/models/kimi-linear.cpp)."""
    import jax.numpy as jnp

    kda_dh, d_conv = 16, 4
    d_inner = H * kda_dh
    n_rot, nope, dv, kvr = 8, 8, 16, 16
    hd_k = n_rot + nope
    w = _writer("kimi-linear", n_rot=n_rot, heads=H, kv=[0, H], extra_md={
        "attention.kv_lora_rank": np.uint32(kvr),
        "attention.key_length_mla": np.uint32(hd_k),
        "attention.value_length_mla": np.uint32(dv),
        "kda.head_dim": np.uint32(kda_dh),
        "ssm.conv_kernel": np.uint32(d_conv),
        "expert_count": np.uint32(4), "expert_used_count": np.uint32(2),
        "expert_feed_forward_length": np.uint32(FF),
    })
    emit, _ = _emit_fn(49)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    # layer 0: KDA
    b = "blk.0."
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "attn_q.weight", d_inner, E)
    emit(w, b + "attn_k.weight", d_inner, E)
    emit(w, b + "attn_v.weight", d_inner, E)
    for cn in ("ssm_conv1d_q", "ssm_conv1d_k", "ssm_conv1d_v"):
        emit(w, b + cn + ".weight", d_inner, 1, d_conv)
    emit(w, b + "ssm_f_a.weight", kda_dh, E)
    emit(w, b + "ssm_f_b.weight", d_inner, kda_dh)
    emit(w, b + "ssm_beta.weight", H, E)
    arr = -np.exp(np.random.default_rng(1).standard_normal((H, 1)) * 0.3
                  ).astype(np.float32)
    w.add_tensor(b + "ssm_a", arr.tobytes(), tuple(reversed(arr.shape)),
                 GGMLType.F32)
    emit(w, b + "ssm_dt.bias", d_inner, scale=0.1)
    emit(w, b + "ssm_g_a.weight", kda_dh, E)
    emit(w, b + "ssm_g_b.weight", d_inner, kda_dh)
    emit(w, b + "ssm_norm.weight", kda_dh, ones=True)
    emit(w, b + "attn_output.weight", E, d_inner)
    emit(w, b + "ffn_norm.weight", E, ones=True)
    emit(w, b + "ffn_gate.weight", FF, E)
    emit(w, b + "ffn_up.weight", FF, E)
    emit(w, b + "ffn_down.weight", E, FF)
    # layer 1: rope-free MLA + MoE
    b = "blk.1."
    emit(w, b + "attn_norm.weight", E, ones=True)
    emit(w, b + "attn_q.weight", H * hd_k, E)
    emit(w, b + "attn_kv_a_mqa.weight", kvr + n_rot, E)
    emit(w, b + "attn_kv_a_norm.weight", kvr, ones=True)
    emit(w, b + "attn_kv_b.weight", H * (nope + dv), kvr)
    emit(w, b + "attn_output.weight", E, H * dv)
    emit(w, b + "ffn_norm.weight", E, ones=True)
    emit(w, b + "ffn_gate_inp.weight", 4, E)
    emit(w, b + "exp_probs_b.bias", 4, scale=0.1)
    emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
    emit(w, b + "ffn_up_exps.weight", 4, FF, E)
    emit(w, b + "ffn_down_exps.weight", 4, E, FF)
    emit(w, b + "ffn_gate_shexp.weight", FF, E)
    emit(w, b + "ffn_up_shexp.weight", FF, E)
    emit(w, b + "ffn_down_shexp.weight", E, FF)
    p = str(tmp_path / "m.gguf")
    w.write(p)
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    assert model.cfg.extra["memory"] == "hybrid"
    prompt = PROMPT + [11, 13]
    ctx = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    full = np.asarray(ctx.prefill(prompt, seq=0))
    ctx2 = Context(model, n_ctx=64, n_seqs=1, n_ubatch=1,
                   kv_dtype=jnp.float32)
    step = None
    for off in range(len(prompt)):
        step = ctx2.decode(np.asarray([[prompt[off]]]), np.asarray([0]),
                           np.asarray([[off]]), np.asarray([0]))
    np.testing.assert_allclose(full, np.asarray(step)[0], rtol=3e-4,
                               atol=3e-4)
    out = Context(model, n_ctx=64, n_seqs=1).generate(PROMPT,
                                                      max_new_tokens=4)
    assert len(out) >= 1


def test_kda_per_channel_decay_matters():
    """KDA's decay is per (head, k-channel): a g1 varying across channels
    must produce different output than its per-head mean (distinguishes KDA
    from the qwen3next per-head rule)."""
    import jax.numpy as jnp

    from llama_cpp_tpu.models import mamba
    from llama_cpp_tpu.models.config import ModelConfig

    rng = np.random.default_rng(2)
    E_, Hh, Dh, dc = 32, 2, 8, 3
    d_inner = Hh * Dh
    cfg = ModelConfig(arch="kimi-linear", n_embd=E_, n_heads=Hh)
    cfg.extra.update(kda_head_dim=Dh, ssm_d_conv=dc)

    def mk(seed, fb_scale):
        r = np.random.default_rng(seed)
        lw = {
            "attn_q": jnp.asarray(r.standard_normal((d_inner, E_)) * .2,
                                  jnp.float32),
            "attn_k": jnp.asarray(r.standard_normal((d_inner, E_)) * .2,
                                  jnp.float32),
            "attn_v": jnp.asarray(r.standard_normal((d_inner, E_)) * .2,
                                  jnp.float32),
            "ssm_conv1d_q": jnp.asarray(
                r.standard_normal((d_inner, dc)) * .2, jnp.float32),
            "ssm_conv1d_k": jnp.asarray(
                r.standard_normal((d_inner, dc)) * .2, jnp.float32),
            "ssm_conv1d_v": jnp.asarray(
                r.standard_normal((d_inner, dc)) * .2, jnp.float32),
            "ssm_f_a": jnp.asarray(r.standard_normal((Dh, E_)) * .2,
                                   jnp.float32),
            "ssm_f_b": jnp.asarray(
                r.standard_normal((d_inner, Dh)) * fb_scale, jnp.float32),
            "ssm_beta": jnp.asarray(r.standard_normal((Hh, E_)) * .2,
                                    jnp.float32),
            "ssm_a": jnp.asarray(-np.ones((Hh,)), jnp.float32),
            "ssm_dt_bias": jnp.asarray(r.standard_normal(d_inner) * .1,
                                       jnp.float32),
            "ssm_g_a": jnp.asarray(r.standard_normal((Dh, E_)) * .2,
                                   jnp.float32),
            "ssm_g_b": jnp.asarray(r.standard_normal((d_inner, Dh)) * .2,
                                   jnp.float32),
            "ssm_norm": jnp.asarray(np.ones(Dh), jnp.float32),
            "attn_output": jnp.asarray(
                r.standard_normal((E_, d_inner)) * .2, jnp.float32),
        }
        return lw

    class Mem:
        conv = np.zeros((1, 1, dc - 1, 3 * d_inner), np.float32)
        ssm = np.zeros((1, 1, Dh, d_inner), np.float32)

    h = jnp.asarray(rng.standard_normal((1, 5, E_)), jnp.float32)
    lw = mk(7, 0.5)
    y1, _, s1 = mamba.kda_layer(cfg, lw, h, Mem, jnp.asarray([0]), 0)
    assert np.isfinite(np.asarray(y1)).all()
    # flatten g1 channel variation away -> different result
    lw2 = dict(lw, ssm_f_b=jnp.asarray(np.zeros((d_inner, Dh)), jnp.float32))
    y2, _, _ = mamba.kda_layer(cfg, lw2, h, Mem, jnp.asarray([0]), 0)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


# ---------------------------------------------------------------------------
# deepseek4 (DSV4)
# ---------------------------------------------------------------------------

def _make_dsv4(tmp_path, seed=90, ratios=(4, 8), window=16):
    """Tiny DeepSeek-V4: layer0 = CSA (overlapped compression + lightning
    indexer), layer1 = HCA-style non-overlap compression (small ratio so the
    path is exercised at test sizes), hash routing on layer0."""
    hc, G, olr, qr = 4, 2, 8, 24
    Dh, rot = 16, 8
    Hi, Di = 2, 16
    w = _writer("deepseek4", n_rot=rot, extra_md={
        "attention.key_length": np.uint32(Dh),
        "attention.value_length": np.uint32(Dh),
        "attention.q_lora_rank": np.uint32(qr),
        "attention.output_group_count": np.uint32(G),
        "attention.output_lora_rank": np.uint32(olr),
        "attention.compress_ratios": np.asarray(ratios, np.uint32),
        "attention.compress_rope_freq_base": np.float32(10000.0),
        "attention.sliding_window": np.uint32(window),
        "attention.indexer.head_count": np.uint32(Hi),
        "attention.indexer.key_length": np.uint32(Di),
        "attention.indexer.top_k": np.uint32(3),
        "hyper_connection.count": np.uint32(hc),
        "hyper_connection.sinkhorn_iterations": np.uint32(3),
        "hyper_connection.epsilon": np.float32(1e-4),
        "hash_layer_count": np.uint32(1),
        "expert_count": np.uint32(4),
        "expert_used_count": np.uint32(2),
        "expert_feed_forward_length": np.uint32(FF),
        "expert_gating_func": np.uint32(4),
    })
    emit, st = _emit_fn(seed)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E, ones=True)
    emit(w, "output.weight", V, E)
    emit(w, "output_hc_fn.weight", hc, hc * E)
    emit(w, "output_hc_base.weight", hc, scale=0.1)
    emit(w, "output_hc_scale.weight", 1, scale=0.5)
    rng = np.random.default_rng(seed + 1)
    for i, ratio in enumerate(ratios):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E, ones=True)
        emit(w, b + "ffn_norm.weight", E, ones=True)
        emit(w, b + "attn_sinks.weight", H, scale=0.2)
        emit(w, b + "attn_q_a.weight", qr, E)
        emit(w, b + "attn_q_a_norm.weight", qr, ones=True)
        emit(w, b + "attn_q_b.weight", H * Dh, qr)
        emit(w, b + "attn_kv.weight", Dh, E)
        emit(w, b + "attn_kv_a_norm.weight", Dh, ones=True)
        # grouped o-lora: gguf {o_group_dim, o_lora, G} -> numpy [G, olr, gd]
        gd = (H // G) * Dh
        arr = (rng.standard_normal((G, olr, gd)) / np.sqrt(gd)).astype(
            np.float32)
        w.add_tensor(b + "attn_output_a.weight", arr.tobytes(),
                     tuple(reversed(arr.shape)), GGMLType.F32)
        st[b + "attn_output_a.weight"] = arr
        emit(w, b + "attn_output_b.weight", E, G * olr)
        for half in ("attn", "ffn"):
            emit(w, b + f"hc_{half}_fn.weight", (2 + hc) * hc, hc * E)
            emit(w, b + f"hc_{half}_base.weight", (2 + hc) * hc, scale=0.1)
            emit(w, b + f"hc_{half}_scale.weight", 3, scale=0.5)
        coff = 2 if ratio == 4 else 1
        emit(w, b + "attn_compressor_kv.weight", coff * Dh, E)
        emit(w, b + "attn_compressor_gate.weight", coff * Dh, E)
        ape = (rng.standard_normal((ratio, coff * Dh)) * 0.2).astype(
            np.float32)
        w.add_tensor(b + "attn_compressor_ape.weight", ape.tobytes(),
                     tuple(reversed(ape.shape)), GGMLType.F32)
        emit(w, b + "attn_compressor_norm.weight", Dh, ones=True)
        if ratio == 4:  # CSA: lightning indexer over compressed lid rows
            emit(w, b + "indexer_compressor_kv.weight", 2 * Di, E)
            emit(w, b + "indexer_compressor_gate.weight", 2 * Di, E)
            iape = (rng.standard_normal((ratio, 2 * Di)) * 0.2).astype(
                np.float32)
            w.add_tensor(b + "indexer_compressor_ape.weight", iape.tobytes(),
                         tuple(reversed(iape.shape)), GGMLType.F32)
            emit(w, b + "indexer_compressor_norm.weight", Di, ones=True)
            emit(w, b + "indexer.proj.weight", Hi, E)
            emit(w, b + "indexer.attn_q_b.weight", Hi * Di, qr)
        emit(w, b + "ffn_gate_inp.weight", 4, E)
        if i == 0:  # hash-routed layer: token id -> expert ids
            t2e = (np.arange(V * 2) % 4).reshape(V, 2).astype(np.float32)
            w.add_tensor(b + "ffn_gate_tid2eid.weight", t2e.tobytes(),
                         tuple(reversed(t2e.shape)), GGMLType.F32)
        else:
            emit(w, b + "exp_probs_b.bias", 4, scale=0.1)
        emit(w, b + "ffn_gate_exps.weight", 4, FF, E)
        emit(w, b + "ffn_up_exps.weight", 4, FF, E)
        emit(w, b + "ffn_down_exps.weight", 4, E, FF)
        emit(w, b + "ffn_gate_shexp.weight", FF, E)
        emit(w, b + "ffn_up_shexp.weight", FF, E)
        emit(w, b + "ffn_down_shexp.weight", E, FF)
    p = str(tmp_path / "dsv4.gguf")
    w.write(p)
    return p


def test_dsv4_sinkhorn_doubly_stochastic():
    """Sinkhorn output: every src row and dst column sums to ~1 (matching
    deepseek4.cpp build_hc_sinkhorn semantics)."""
    import jax.numpy as jnp

    from llama_cpp_tpu.models.deepseek4 import _hc_sinkhorn

    rng = np.random.default_rng(0)
    comb = jnp.asarray(rng.standard_normal((2, 3, 4, 4)), jnp.float32)
    out = np.asarray(_hc_sinkhorn(comb, 6, 1e-6))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=2e-3)  # over dst
    np.testing.assert_allclose(out.sum(-2), 1.0, atol=2e-3)  # over src


def test_dsv4_compress_blocks_reference():
    """_compress_blocks vs a naive per-block transcription of
    build_overlap_compressed_kv_from_state (prev-half of block b-1 +
    cur-half of block b, softmax-weighted sum; first block's prev window
    is the zero/-inf synthetic row)."""
    import jax.numpy as jnp

    from llama_cpp_tpu.models.deepseek4 import _compress_blocks

    rng = np.random.default_rng(1)
    ratio, Dh, S = 4, 8, 16
    kv = rng.standard_normal((S, 2 * Dh)).astype(np.float32)
    sc = rng.standard_normal((S, 2 * Dh)).astype(np.float32)
    pos = np.arange(S, dtype=np.int32)
    comp, valid = _compress_blocks(jnp.asarray(kv), jnp.asarray(sc),
                                   jnp.asarray(pos), ratio, True, Dh)
    assert valid.all()
    NB = S // ratio
    for b in range(NB):
        vals, scs = [], []
        if b == 0:
            vals.append(np.zeros((ratio, Dh)))
            scs.append(np.full((ratio, Dh), -np.inf))
        else:
            vals.append(kv[(b - 1) * ratio: b * ratio, :Dh])
            scs.append(sc[(b - 1) * ratio: b * ratio, :Dh])
        vals.append(kv[b * ratio: (b + 1) * ratio, Dh:])
        scs.append(sc[b * ratio: (b + 1) * ratio, Dh:])
        vals = np.concatenate(vals)
        scs = np.concatenate(scs)
        e = np.exp(scs - scs.max(0, keepdims=True))
        wgt = np.where(np.isfinite(scs), e, 0.0)
        wgt = wgt / wgt.sum(0, keepdims=True)
        want = (vals * wgt).sum(0)
        np.testing.assert_allclose(np.asarray(comp)[b], want, rtol=1e-5,
                                   atol=1e-5)


def test_deepseek4_prefill_equals_stepwise(tmp_path):
    """The whole DSV4 stack — hyper-connections, CSA with indexer, HCA-style
    compression, hash MoE — must give identical logits from one prefill and
    from one-token-at-a-time decode (proves the activation-cache compression
    recompute is block-boundary-correct across decode)."""
    import jax.numpy as jnp

    p = _make_dsv4(tmp_path)
    model = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    assert model.cfg.extra["dsv4"]
    prompt = [3, 5, 9, 2, 7, 11, 13, 4, 8, 6, 1, 12, 10, 14]  # crosses blocks
    ctx = Context(model, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    full = np.asarray(ctx.prefill(prompt, seq=0))
    ctx2 = Context(model, n_ctx=64, n_seqs=1, n_ubatch=1,
                   kv_dtype=jnp.float32)
    step = None
    for off in range(len(prompt)):
        step = ctx2.decode(np.asarray([[prompt[off]]]), np.asarray([0]),
                           np.asarray([[off]]), np.asarray([0]))
    np.testing.assert_allclose(full, np.asarray(step)[0], rtol=5e-4,
                               atol=5e-4)


def test_deepseek4_generates(tmp_path):
    p = _make_dsv4(tmp_path, seed=91)
    out = _run(p)
    assert len(out) >= 1


# ---------------------------------------------------------------------------
# gemma4 (transcribed numpy oracle — no HF implementation exists)
# ---------------------------------------------------------------------------

def _np_rms(x, w=None, eps=1e-5):
    y = x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps)
    return y * w if w is not None else y


def _np_gelu(x):
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def _np_rope_neox(v, pos, base, factors=None):
    T, H, D = v.shape
    half = D // 2
    inv = base ** -(np.arange(half, dtype=np.float64) * 2.0 / D)
    if factors is not None:
        inv = inv / factors[:half]
    ang = pos[:, None].astype(np.float64) * inv  # [T, half]
    c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x0, x1 = v[..., :half], v[..., half:]
    return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c],
                          axis=-1).astype(v.dtype)


def test_gemma4(tmp_path):
    """Gemma 4 (reference src/models/gemma4.cpp) against a line-by-line
    numpy transcription: per-layer SWA array with narrower SWA heads,
    shared-KV tail layer, alternative attention (no v_proj -> V from the K
    projection), dual-branch MoE with weightless-norm router, per-layer
    embeddings, proportional rope (rope_freqs on full layers), per-layer
    output scalars, final softcap."""
    L4, H, HKV4, DKF, DKS, FF4, EPL = 4, 4, 2, 16, 8, 96, 8
    NEXP, NUSED, FEXP = 4, 2, 32
    is_swa = [1, 0, 1, 1]
    window = 4
    w = _writer("gemma4", n_layers=L4, heads=H, kv=HKV4, n_rot=DKF,
                extra_md={
                    "attention.key_length": np.uint32(DKF),
                    "attention.value_length": np.uint32(DKF),
                    "attention.key_length_swa": np.uint32(DKS),
                    "attention.value_length_swa": np.uint32(DKS),
                    "attention.sliding_window": np.uint32(window),
                    "attention.sliding_window_pattern":
                        np.asarray(is_swa, np.uint32),
                    "attention.shared_kv_layers": np.uint32(1),
                    "rope.freq_base_swa": 10000.0,
                    "embedding_length_per_layer_input": np.uint32(EPL),
                    "expert_count": np.uint32(NEXP),
                    "expert_used_count": np.uint32(NUSED),
                    "expert_feed_forward_length": np.uint32(FEXP),
                    "final_logit_softcapping": 30.0,
                })
    emit, st = _emit_fn(41)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E)
    ff_arr = np.linspace(1.0, 2.0, DKF // 2).astype(np.float32)
    st["rope_freqs.weight"] = ff_arr  # exercise the frequency division
    w.add_tensor("rope_freqs.weight", ff_arr.tobytes(), (DKF // 2,),
                 GGMLType.F32)
    emit(w, "per_layer_token_embd.weight", V, L4 * EPL, scale=0.05)
    emit(w, "per_layer_model_proj.weight", L4 * EPL, E)
    emit(w, "per_layer_proj_norm.weight", EPL)
    moe_layer, alt_v_layer, shared_layer = 1, 2, 3
    for i in range(L4):
        b = f"blk.{i}."
        dk = DKS if is_swa[i] else DKF
        emit(w, b + "attn_norm.weight", E)
        emit(w, b + "attn_q.weight", H * dk, E)
        if i != shared_layer:
            emit(w, b + "attn_k.weight", HKV4 * dk, E)
            if i != alt_v_layer:
                emit(w, b + "attn_v.weight", HKV4 * dk, E)
            emit(w, b + "attn_k_norm.weight", dk)
        emit(w, b + "attn_output.weight", E, H * dk)
        emit(w, b + "attn_q_norm.weight", dk)
        emit(w, b + "attn_post_norm.weight", E)
        emit(w, b + "ffn_norm.weight", E)
        emit(w, b + "ffn_gate.weight", FF4, E)
        emit(w, b + "ffn_up.weight", FF4, E)
        emit(w, b + "ffn_down.weight", E, FF4)
        emit(w, b + "ffn_post_norm.weight", E)
        if i == moe_layer:
            emit(w, b + "ffn_gate_inp.weight", NEXP, E)
            emit(w, b + "ffn_gate_inp.scale", E)
            emit(w, b + "pre_ffw_norm_2.weight", E)
            emit(w, b + "post_ffw_norm_1.weight", E)
            emit(w, b + "post_ffw_norm_2.weight", E)
            emit(w, b + "ffn_gate_up_exps.weight", NEXP, 2 * FEXP, E)
            emit(w, b + "ffn_down_exps.weight", NEXP, E, FEXP)
        emit(w, b + "inp_gate.weight", EPL, E)
        emit(w, b + "proj.weight", E, EPL)
        emit(w, b + "post_norm.weight", E)
        os_arr = np.asarray([0.98 + 0.01 * i], np.float32)
        st[b + "layer_output_scale.weight"] = os_arr
        w.add_tensor(b + "layer_output_scale.weight", os_arr.tobytes(), (1,),
                     GGMLType.F32)
    p = str(tmp_path / "g4.gguf")
    w.write(p)

    # ---------------- numpy transcription ----------------
    toks = np.asarray(PROMPT, np.int32)
    T = len(toks)
    pos = np.arange(T)
    g = lambda n: st[n]
    x = g("token_embd.weight")[toks] * np.sqrt(E)
    # per-layer inputs
    per = g("per_layer_token_embd.weight")[toks].reshape(T, L4, EPL) \
        * np.sqrt(EPL)
    plp = (x @ g("per_layer_model_proj.weight").T) / np.sqrt(E)
    plp = _np_rms(plp.reshape(T, L4, EPL), g("per_layer_proj_norm.weight"))
    per = (plp + per) / np.sqrt(2.0)
    kv_store = {}
    for i in range(L4):
        b = f"blk.{i}."
        dk = DKS if is_swa[i] else DKF
        base = 10000.0  # both bases equal in this fixture; factors differ
        factors = None if is_swa[i] else g("rope_freqs.weight")
        h = _np_rms(x, g(b + "attn_norm.weight"))
        q = (h @ g(b + "attn_q.weight").T).reshape(T, H, dk)
        q = _np_rms(q, g(b + "attn_q_norm.weight"))
        q = _np_rope_neox(q, pos, base, factors)
        if i == shared_layer:
            k, v = kv_store[2]  # last owned SWA layer
        else:
            k = (h @ g(b + "attn_k.weight").T).reshape(T, HKV4, dk)
            kv_name = b + "attn_v.weight"
            v = ((h @ g(kv_name).T).reshape(T, HKV4, dk)
                 if kv_name in st else
                 (h @ g(b + "attn_k.weight").T).reshape(T, HKV4, dk))
            k = _np_rms(k, g(b + "attn_k_norm.weight"))
            v = _np_rms(v)  # weightless v norm
            k = _np_rope_neox(k, pos, base, factors)
            kv_store[i] = (k, v)
        mask = pos[None, :] <= pos[:, None]
        if is_swa[i]:
            mask &= pos[None, :] > pos[:, None] - window
        groups = H // HKV4
        att = np.zeros((T, H, dk))
        for hh in range(H):
            sc = q[:, hh] @ k[:, hh // groups].T  # scale = 1.0
            sc = np.where(mask, sc, -np.inf)
            pr = np.exp(sc - sc.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            att[:, hh] = pr @ v[:, hh // groups]
        attn = att.reshape(T, H * dk) @ g(b + "attn_output.weight").T
        attn = _np_rms(attn, g(b + "attn_post_norm.weight"))
        attn_out = x + attn
        if i == moe_layer:
            mlp = _np_rms(attn_out, g(b + "ffn_norm.weight"))
            mlp = (_np_gelu(mlp @ g(b + "ffn_gate.weight").T)
                   * (mlp @ g(b + "ffn_up.weight").T)) \
                @ g(b + "ffn_down.weight").T
            mlp = _np_rms(mlp, g(b + "post_ffw_norm_1.weight"))
            moe_in = _np_rms(attn_out, g(b + "pre_ffw_norm_2.weight"))
            rx = _np_rms(attn_out) / np.sqrt(E) * g(b + "ffn_gate_inp.scale")
            logits_r = rx @ g(b + "ffn_gate_inp.weight").T
            pr = np.exp(logits_r - logits_r.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            gu = g(b + "ffn_gate_up_exps.weight")  # [NEXP, 2F, E]
            dn = g(b + "ffn_down_exps.weight")  # [NEXP, E, F]
            moe = np.zeros((T, E))
            for t in range(T):
                sel = np.argsort(-pr[t])[:NUSED]
                wts = pr[t][sel] / pr[t][sel].sum()  # norm_w=true
                for e, wt in zip(sel, wts):
                    ge = _np_gelu(moe_in[t] @ gu[e, :FEXP].T)
                    ue = moe_in[t] @ gu[e, FEXP:].T
                    moe[t] += wt * ((ge * ue) @ dn[e].T)
            moe = _np_rms(moe, g(b + "post_ffw_norm_2.weight"))
            cur = mlp + moe
        else:
            hf = _np_rms(attn_out, g(b + "ffn_norm.weight"))
            cur = (_np_gelu(hf @ g(b + "ffn_gate.weight").T)
                   * (hf @ g(b + "ffn_up.weight").T)) \
                @ g(b + "ffn_down.weight").T
        cur = _np_rms(cur, g(b + "ffn_post_norm.weight"))
        x = attn_out + cur
        fp = _np_gelu(x @ g(b + "inp_gate.weight").T) * per[:, i]
        fp = _np_rms(fp @ g(b + "proj.weight").T, g(b + "post_norm.weight"))
        x = x + fp
        x = x * g(b + "layer_output_scale.weight")[0]
    x = _np_rms(x, g("output_norm.weight"))
    ref = x @ g("token_embd.weight").T
    ref = 30.0 * np.tanh(ref / 30.0)

    ours = _logits(p)
    np.testing.assert_allclose(ours.reshape(-1), ref[-1], rtol=2e-4,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# cogvlm / hunyuan_vl / paddleocr / deepseek2-ocr
# ---------------------------------------------------------------------------

def _np_rope_neox_t(v, pos, base):
    T, H_, D = v.shape
    half = D // 2
    inv = base ** -(np.arange(half, dtype=np.float64) * 2.0 / D)
    ang = pos[:, None].astype(np.float64) * inv
    c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x0, x1 = v[..., :half], v[..., half:]
    return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c],
                          axis=-1).astype(v.dtype)


def _np_rms_t(x, w=None, eps=1e-5):
    y = x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps)
    return y * w if w is not None else y


def _np_attn(q, k, v, pos):
    T, H_, D = q.shape
    Hkv = k.shape[1]
    groups = H_ // Hkv
    mask = pos[None, :] <= pos[:, None]
    out = np.zeros_like(q[..., : v.shape[-1]])
    for hh in range(H_):
        sc = (q[:, hh] @ k[:, hh // groups].T) / np.sqrt(D)
        sc = np.where(mask, sc, -np.inf)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        out[:, hh] = pr @ v[:, hh // groups]
    return out


def test_cogvlm(tmp_path):
    """CogVLM (reference src/models/cogvlm.cpp) vs a numpy transcription of
    the text path, plus the vision-expert weight switch on embedding
    ubatches."""
    w = _writer("cogvlm", kv=H)  # fused qkv => H == HKV
    emit, st = _emit_fn(43)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E)
        emit(w, b + "attn_qkv.weight", 3 * E, E)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "vis_attn_qkv.weight", 3 * E, E)
        emit(w, b + "vis_attn_output.weight", E, E)
        emit(w, b + "ffn_norm.weight", E)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
        emit(w, b + "vis_gate.weight", FF, E)
        emit(w, b + "vis_up.weight", FF, E)
        emit(w, b + "vis_down.weight", E, FF)
    p = str(tmp_path / "cog.gguf")
    w.write(p)

    toks = np.asarray(PROMPT, np.int32)
    T = len(toks)
    pos = np.arange(T)
    g = lambda n: st[n]

    def np_forward(x, vis):
        pre = "vis_" if vis else ""
        qkv_n = "vis_attn_qkv" if vis else "attn_qkv"
        out_n = "vis_attn_output" if vis else "attn_output"
        for i in range(L):
            b = f"blk.{i}."
            h = _np_rms_t(x, g(b + "attn_norm.weight"))
            qkv = h @ g(b + qkv_n + ".weight").T
            q = qkv[:, :E].reshape(T, H, HD)
            k = qkv[:, E:2 * E].reshape(T, H, HD)
            v = qkv[:, 2 * E:].reshape(T, H, HD)
            q = _np_rope_neox_t(q, pos, 10000.0)
            k = _np_rope_neox_t(k, pos, 10000.0)
            att = _np_attn(q, k, v, pos).reshape(T, E)
            x = x + att @ g(b + out_n + ".weight").T
            hf = _np_rms_t(x, g(b + "ffn_norm.weight"))
            gate = hf @ g(b + ("vis_gate" if vis else "ffn_gate") + ".weight").T
            up = hf @ g(b + ("vis_up" if vis else "ffn_up") + ".weight").T
            sil = gate / (1.0 + np.exp(-gate))
            x = x + (sil * up) @ g(b + ("vis_down" if vis else "ffn_down")
                                   + ".weight").T
        x = _np_rms_t(x, g("output_norm.weight"))
        return x @ g("token_embd.weight").T

    import jax.numpy as jnp

    from llama_cpp_tpu.models.transformer import AttnInputs
    from llama_cpp_tpu.runtime.kv_cache import KVCache

    m = load_model(p, prefer_quant=False, dense_dtype=jnp.float32)
    x0 = g("token_embd.weight")[toks]

    def run(vis):
        kv = KVCache.create(L, 1, 32, H, HD, HD, dtype=jnp.float32)
        inputs = AttnInputs(seq_idx=jnp.zeros(1, jnp.int32),
                            slots=jnp.asarray(pos)[None, :],
                            positions=jnp.asarray(pos)[None, :])
        if vis:
            lg, _ = m.forward_fn(m.params, m.cfg,
                                 jnp.asarray(toks)[None, :], inputs, kv,
                                 inputs_embeds=jnp.asarray(x0)[None, :])
        else:
            lg, _ = m.forward_fn(m.params, m.cfg,
                                 jnp.asarray(toks)[None, :], inputs, kv)
        return np.asarray(lg)

    np.testing.assert_allclose(run(False), np_forward(x0.copy(), False),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(run(True), np_forward(x0.copy(), True),
                               rtol=2e-4, atol=2e-4)


def test_hunyuan_vl(tmp_path):
    """Hunyuan-VL text graph (reference src/models/hunyuan-vl.cpp): q/k
    rms-norm AFTER rope + XDRoPE NTK-alpha base scaling, vs numpy."""
    alpha = 4.0
    w = _writer("hunyuan_vl", extra_md={"rope.scaling.alpha": alpha})
    emit, st = _emit_fn(44)
    emit(w, "token_embd.weight", V, E, scale=0.05)
    emit(w, "output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        emit(w, b + "attn_norm.weight", E)
        emit(w, b + "attn_q.weight", E, E)
        emit(w, b + "attn_k.weight", HKV * HD, E)
        emit(w, b + "attn_v.weight", HKV * HD, E)
        emit(w, b + "attn_q_norm.weight", HD)
        emit(w, b + "attn_k_norm.weight", HD)
        emit(w, b + "attn_output.weight", E, E)
        emit(w, b + "ffn_norm.weight", E)
        emit(w, b + "ffn_gate.weight", FF, E)
        emit(w, b + "ffn_up.weight", FF, E)
        emit(w, b + "ffn_down.weight", E, FF)
    p = str(tmp_path / "hyvl.gguf")
    w.write(p)

    toks = np.asarray(PROMPT, np.int32)
    T = len(toks)
    pos = np.arange(T)
    g = lambda n: st[n]
    base = 10000.0 * alpha ** (HD / (HD - 2))

    x = g("token_embd.weight")[toks]
    for i in range(L):
        b = f"blk.{i}."
        h = _np_rms_t(x, g(b + "attn_norm.weight"))
        q = (h @ g(b + "attn_q.weight").T).reshape(T, H, HD)
        k = (h @ g(b + "attn_k.weight").T).reshape(T, HKV, HD)
        v = (h @ g(b + "attn_v.weight").T).reshape(T, HKV, HD)
        q = _np_rope_neox_t(q, pos, base)
        k = _np_rope_neox_t(k, pos, base)
        q = _np_rms_t(q, g(b + "attn_q_norm.weight"))  # norm AFTER rope
        k = _np_rms_t(k, g(b + "attn_k_norm.weight"))
        att = _np_attn(q, k, v, pos).reshape(T, E)
        x = x + att @ g(b + "attn_output.weight").T
        hf = _np_rms_t(x, g(b + "ffn_norm.weight"))
        gate = hf @ g(b + "ffn_gate.weight").T
        sil = gate / (1.0 + np.exp(-gate))
        x = x + (sil * (hf @ g(b + "ffn_up.weight").T)) \
            @ g(b + "ffn_down.weight").T
    x = _np_rms_t(x, g("output_norm.weight"))
    ref = x @ g("token_embd.weight").T

    ours = _logits(p)
    # Context keeps a bf16 KV cache; allow its quantization noise
    np.testing.assert_allclose(ours.reshape(-1), ref[-1], rtol=5e-4,
                               atol=5e-4)


def test_paddleocr_matches_qwen2vl(tmp_path):
    """PaddleOCR text model == qwen2vl graph when no biases are present
    (reference paddleocr.cpp:10 'same with qwen2vl.cpp, bias optional')."""
    def build(arch):
        w = _writer(arch, extra_md={
            "rope.dimension_sections": np.asarray([4, 2, 2, 0], np.uint32)})
        emit, st = _emit_fn(45)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E)
        for i in range(L):
            b = f"blk.{i}."
            emit(w, b + "attn_norm.weight", E)
            emit(w, b + "attn_q.weight", E, E)
            emit(w, b + "attn_k.weight", HKV * HD, E)
            emit(w, b + "attn_v.weight", HKV * HD, E)
            emit(w, b + "attn_output.weight", E, E)
            emit(w, b + "ffn_norm.weight", E)
            emit(w, b + "ffn_gate.weight", FF, E)
            emit(w, b + "ffn_up.weight", FF, E)
            emit(w, b + "ffn_down.weight", E, FF)
        p = str(tmp_path / f"{arch}.gguf")
        w.write(p)
        return p

    a = _logits(build("paddleocr"))
    b = _logits(build("qwen2vl"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_deepseek2_ocr(tmp_path):
    """DeepSeek-OCR decoder (reference src/models/deepseek2ocr.cpp): plain
    MHA + deepseek MoE. Dense-lead layers match the qwen2 graph exactly;
    the MoE tail (sigmoid gating + shared expert) decodes finitely."""
    def build(arch, moe):
        md = {}
        if arch == "deepseek2-ocr":
            md = {"expert_gating_func": np.uint32(2),
                  "expert_weights_norm": True,
                  "leading_dense_block_count": np.uint32(L if not moe else 1)}
            if moe:
                md.update({"expert_count": np.uint32(4),
                           "expert_used_count": np.uint32(2),
                           "expert_feed_forward_length": np.uint32(32),
                           "expert_shared_count": np.uint32(1),
                           "expert_weights_scale": 2.0})
        w = _writer(arch, extra_md=md)
        emit, st = _emit_fn(46)
        emit(w, "token_embd.weight", V, E, scale=0.05)
        emit(w, "output_norm.weight", E)
        for i in range(L):
            b = f"blk.{i}."
            emit(w, b + "attn_norm.weight", E)
            emit(w, b + "attn_q.weight", E, E)
            emit(w, b + "attn_k.weight", HKV * HD, E)
            emit(w, b + "attn_v.weight", HKV * HD, E)
            emit(w, b + "attn_output.weight", E, E)
            emit(w, b + "ffn_norm.weight", E)
            if moe and i >= 1:
                emit(w, b + "ffn_gate_inp.weight", 4, E)
                emit(w, b + "ffn_gate_exps.weight", 4, 32, E)
                emit(w, b + "ffn_up_exps.weight", 4, 32, E)
                emit(w, b + "ffn_down_exps.weight", 4, E, 32)
                emit(w, b + "ffn_gate_shexp.weight", 32, E)
                emit(w, b + "ffn_up_shexp.weight", 32, E)
                emit(w, b + "ffn_down_shexp.weight", E, 32)
            else:
                emit(w, b + "ffn_gate.weight", FF, E)
                emit(w, b + "ffn_up.weight", FF, E)
                emit(w, b + "ffn_down.weight", E, FF)
        p = str(tmp_path / f"{arch}{moe}.gguf")
        w.write(p)
        return p

    # all-dense: graph identical to qwen2
    a = _logits(build("deepseek2-ocr", False))
    b = _logits(build("qwen2", False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # MoE tail decodes
    _run(build("deepseek2-ocr", True))
