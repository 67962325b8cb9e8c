"""Synthetic model fixtures (analog of reference tests/gguf-model-data.cpp:
generate fake models in memory — no downloads)."""

from __future__ import annotations

import numpy as np

from .gguf.constants import GGMLType, Keys, TokenType
from .gguf.writer import GGUFWriter
from .quant.quantize import quantize


def tiny_spm_vocab(n_tokens: int = 256) -> dict:
    """Minimal SPM-style vocab: specials + byte tokens + a few words."""
    K = Keys.Tokenizer
    tokens = ["<unk>", "<s>", "</s>"]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(int(TokenType.BYTE))
        scores.append(0.0)
    words = ["▁the", "▁a", "▁of", "▁to", "▁and", "▁in", "he", "at", "on", "re",
             "▁is", "▁was", "th", "er", "an", "▁that", "ing", "▁it", "es", "en"]
    # include single chars + prefixes so SPM bigram merging can reach the words
    pieces: dict[str, float] = {}
    for ch in "▁abcdefghijklmnopqrstuvwxyz":
        pieces[ch] = -30.0
    for i, wrd in enumerate(words):
        for plen in range(2, len(wrd)):
            pieces.setdefault(wrd[:plen], -20.0 - plen)
        pieces[wrd] = -float(i)
    for wrd, score in pieces.items():
        tokens.append(wrd)
        types.append(int(TokenType.NORMAL))
        scores.append(score)
    pad = n_tokens - len(tokens)
    for i in range(max(pad, 0)):
        tokens.append(f"▁w{i}")
        types.append(int(TokenType.NORMAL))
        scores.append(-100.0 - i)
    return {
        K.MODEL: "llama",
        K.TOKENS: tokens[:max(n_tokens, len(tokens))],
        K.SCORES: np.asarray(scores[:max(n_tokens, len(scores))], dtype=np.float32),
        K.TOKEN_TYPE: np.asarray(types[:max(n_tokens, len(types))], dtype=np.int32),
        K.BOS_ID: np.uint32(1),
        K.EOS_ID: np.uint32(2),
        K.UNK_ID: np.uint32(0),
        K.ADD_BOS: True,
        K.ADD_SPACE_PREFIX: True,
    }


def make_tiny_llama_gguf(
    path: str,
    vocab_size: int = 300,
    n_layers: int = 2,
    n_embd: int = 64,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    n_ff: int = 128,
    ftype: str = "f32",
    seed: int = 0,
    n_ctx: int = 256,
) -> str:
    """Random-weight llama-arch GGUF with a working SPM vocab."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "llama")
    w.add(Keys.General.NAME, "tiny-synthetic")
    w.add("llama.block_count", np.uint32(n_layers))
    w.add("llama.context_length", np.uint32(n_ctx))
    w.add("llama.embedding_length", np.uint32(n_embd))
    w.add("llama.feed_forward_length", np.uint32(n_ff))
    w.add("llama.attention.head_count", np.uint32(n_heads))
    w.add("llama.attention.head_count_kv", np.uint32(n_kv_heads))
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.rope.dimension_count", np.uint32(head_dim))
    w.add("llama.vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    # make vocab arrays consistent with vocab_size
    vocab[Keys.Tokenizer.TOKENS] = vocab[Keys.Tokenizer.TOKENS][:vocab_size]
    vocab[Keys.Tokenizer.SCORES] = vocab[Keys.Tokenizer.SCORES][:vocab_size]
    vocab[Keys.Tokenizer.TOKEN_TYPE] = vocab[Keys.Tokenizer.TOKEN_TYPE][:vocab_size]
    w.add_all(vocab)

    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0,
          "q4_k": GGMLType.Q4_K, "q4_0": GGMLType.Q4_0}[ftype]

    def emit(name, arr, force_f32=False):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        t = GGMLType.F32 if (force_f32 or arr.ndim == 1 or arr.shape[-1] % 256 != 0) else ft
        if t == GGMLType.F32:
            data = arr.tobytes()
        elif t == GGMLType.F16:
            data = arr.astype(np.float16).tobytes()
        else:
            data = quantize(arr, t).tobytes()
        w.add_tensor(name, data, tuple(reversed(arr.shape)), t)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.02))
    emit("output_norm.weight", np.ones(n_embd))
    emit("output.weight", rand(vocab_size, n_embd))
    kv_dim = n_kv_heads * head_dim
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", np.ones(n_embd))
        emit(b + "attn_q.weight", rand(n_embd, n_embd))
        emit(b + "attn_k.weight", rand(kv_dim, n_embd))
        emit(b + "attn_v.weight", rand(kv_dim, n_embd))
        emit(b + "attn_output.weight", rand(n_embd, n_embd))
        emit(b + "ffn_norm.weight", np.ones(n_embd))
        emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
        emit(b + "ffn_up.weight", rand(n_ff, n_embd))
        emit(b + "ffn_down.weight", rand(n_embd, n_ff))
    w.write(path)
    return path


def make_tiny_rwkv6_gguf(
    path: str,
    vocab_size: int = 256,
    n_layers: int = 2,
    n_embd: int = 64,
    head_size: int = 16,
    n_ff: int = 128,
    seed: int = 0,
) -> str:
    """Random-weight RWKV6 GGUF (reference rwkv6 tensor layout,
    src/models/rwkv6.cpp load_arch_tensors)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "rwkv6")
    w.add(Keys.General.NAME, "tiny-rwkv6")
    w.add("rwkv6.block_count", np.uint32(n_layers))
    w.add("rwkv6.context_length", np.uint32(1 << 20))
    w.add("rwkv6.embedding_length", np.uint32(n_embd))
    w.add("rwkv6.feed_forward_length", np.uint32(n_ff))
    w.add("rwkv6.wkv.head_size", np.uint32(head_size))
    w.add("rwkv6.attention.layer_norm_epsilon", 1e-5)
    w.add("rwkv6.token_shift_count", np.uint32(2))
    w.add("rwkv6.attention.head_count", np.uint32(0))
    w.add("rwkv6.vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    vocab[Keys.Tokenizer.TOKENS] = vocab[Keys.Tokenizer.TOKENS][:vocab_size]
    vocab[Keys.Tokenizer.SCORES] = vocab[Keys.Tokenizer.SCORES][:vocab_size]
    vocab[Keys.Tokenizer.TOKEN_TYPE] = vocab[Keys.Tokenizer.TOKEN_TYPE][:vocab_size]
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    H = n_embd // head_size
    r_mix, r_decay = 8, 8
    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("token_embd_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("token_embd_norm.bias", rand(n_embd, scale=0.02))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("output_norm.bias", rand(n_embd, scale=0.02))
    emit("output.weight", rand(vocab_size, n_embd))
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "attn_norm.bias", rand(n_embd, scale=0.02))
        emit(b + "attn_norm_2.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "attn_norm_2.bias", rand(n_embd, scale=0.02))
        emit(b + "time_mix_w1.weight", rand(5 * r_mix, n_embd))
        emit(b + "time_mix_w2.weight", rand(5, n_embd, r_mix))
        emit(b + "time_mix_lerp_x.weight", rand(n_embd, scale=0.3))
        emit(b + "time_mix_lerp_fused.weight",
             rand(5, 1, 1, n_embd, scale=0.3))
        emit(b + "time_mix_first.weight", rand(H, head_size, scale=0.3))
        emit(b + "time_mix_decay.weight", rand(n_embd, scale=0.3))
        emit(b + "time_mix_decay_w1.weight", rand(r_decay, n_embd))
        emit(b + "time_mix_decay_w2.weight", rand(n_embd, r_decay))
        emit(b + "time_mix_key.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_value.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_receptance.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_gate.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_ln.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "time_mix_ln.bias", rand(n_embd, scale=0.02))
        emit(b + "time_mix_output.weight", rand(n_embd, n_embd))
        emit(b + "channel_mix_lerp_k.weight", rand(n_embd, scale=0.3))
        emit(b + "channel_mix_lerp_r.weight", rand(n_embd, scale=0.3))
        emit(b + "channel_mix_key.weight", rand(n_ff, n_embd))
        emit(b + "channel_mix_value.weight", rand(n_embd, n_ff))
        emit(b + "channel_mix_receptance.weight", rand(n_embd, n_embd))
    w.write(path)
    return path


def make_tiny_rwkv7_gguf(
    path: str,
    vocab_size: int = 256,
    n_layers: int = 2,
    n_embd: int = 64,
    head_size: int = 16,
    n_ff: int = 128,
    seed: int = 0,
    gated: bool = True,
) -> str:
    """Random-weight RWKV-7 GGUF (reference rwkv7 tensor layout,
    src/models/rwkv7.cpp load_arch_tensors)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "rwkv7")
    w.add(Keys.General.NAME, "tiny-rwkv7")
    w.add("rwkv7.block_count", np.uint32(n_layers))
    w.add("rwkv7.context_length", np.uint32(1 << 20))
    w.add("rwkv7.embedding_length", np.uint32(n_embd))
    w.add("rwkv7.feed_forward_length", np.uint32(n_ff))
    w.add("rwkv7.wkv.head_size", np.uint32(head_size))
    w.add("rwkv7.attention.layer_norm_epsilon", 1e-5)
    w.add("rwkv7.attention.head_count", np.uint32(0))
    w.add("rwkv7.vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    vocab[Keys.Tokenizer.TOKENS] = vocab[Keys.Tokenizer.TOKENS][:vocab_size]
    vocab[Keys.Tokenizer.SCORES] = vocab[Keys.Tokenizer.SCORES][:vocab_size]
    vocab[Keys.Tokenizer.TOKEN_TYPE] = vocab[Keys.Tokenizer.TOKEN_TYPE][:vocab_size]
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    H = n_embd // head_size
    rk = 8
    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("token_embd_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("token_embd_norm.bias", rand(n_embd, scale=0.02))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("output_norm.bias", rand(n_embd, scale=0.02))
    emit("output.weight", rand(vocab_size, n_embd))
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "attn_norm.bias", rand(n_embd, scale=0.02))
        emit(b + "attn_norm_2.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "attn_norm_2.bias", rand(n_embd, scale=0.02))
        emit(b + "time_mix_lerp_fused.weight",
             rand(6 if gated else 5, 1, 1, n_embd, scale=0.3))
        emit(b + "time_mix_w0.weight", rand(n_embd, scale=0.3))
        emit(b + "time_mix_w1.weight", rand(rk, n_embd))
        emit(b + "time_mix_w2.weight", rand(n_embd, rk))
        emit(b + "time_mix_a0.weight", rand(n_embd, scale=0.3))
        emit(b + "time_mix_a1.weight", rand(rk, n_embd))
        emit(b + "time_mix_a2.weight", rand(n_embd, rk))
        if i > 0:
            emit(b + "time_mix_v0.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_v1.weight", rand(rk, n_embd))
            emit(b + "time_mix_v2.weight", rand(n_embd, rk))
        if gated:
            emit(b + "time_mix_g1.weight", rand(rk, n_embd))
            emit(b + "time_mix_g2.weight", rand(n_embd, rk))
        emit(b + "time_mix_k_k.weight", rand(n_embd, scale=0.3))
        emit(b + "time_mix_k_a.weight", rand(n_embd, scale=0.3))
        emit(b + "time_mix_r_k.weight", rand(H, head_size, scale=0.3))
        emit(b + "time_mix_key.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_value.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_receptance.weight", rand(n_embd, n_embd))
        emit(b + "time_mix_ln.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "time_mix_ln.bias", rand(n_embd, scale=0.02))
        emit(b + "time_mix_output.weight", rand(n_embd, n_embd))
        emit(b + "channel_mix_lerp_k.weight", rand(n_embd, scale=0.3))
        emit(b + "channel_mix_key.weight", rand(n_ff, n_embd))
        emit(b + "channel_mix_value.weight", rand(n_embd, n_ff))
    w.write(path)
    return path


def make_tiny_nemotron_h_gguf(
    path: str,
    vocab_size: int = 128,
    n_embd: int = 48,
    seed: int = 0,
) -> str:
    """Random-weight Nemotron-H GGUF: layer pattern [M, A, F, M, F]
    (reference src/models/nemotron-h.cpp: one block per layer)."""
    rng = np.random.default_rng(seed)
    d_inner = 64
    d_state = 16
    nh = 4
    d_conv = 4
    n_group = 1
    conv_dim = d_inner + 2 * n_group * d_state
    n_head, n_kv, hd = 4, 2, 12
    n_ff = 96
    pattern = "MAFMF"
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "nemotron_h")
    w.add(Keys.General.NAME, "tiny-nemotron-h")
    P = "nemotron_h."
    w.add(P + "block_count", np.uint32(len(pattern)))
    w.add(P + "context_length", np.uint32(1 << 16))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(n_head))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv))
    w.add(P + "attention.key_length", np.uint32(hd))
    w.add(P + "attention.value_length", np.uint32(hd))
    w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(P + "ssm.conv_kernel", np.uint32(d_conv))
    w.add(P + "ssm.inner_size", np.uint32(d_inner))
    w.add(P + "ssm.state_size", np.uint32(d_state))
    w.add(P + "ssm.time_step_rank", np.uint32(nh))
    w.add(P + "ssm.group_count", np.uint32(n_group))
    w.add(P + "vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES, Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:vocab_size]
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("output.weight", rand(vocab_size, n_embd))
    for i, kind in enumerate(pattern):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        if kind == "M":
            emit(b + "ssm_in.weight", rand(2 * d_inner + 2 * n_group * d_state + nh, n_embd))
            emit(b + "ssm_conv1d.weight", rand(conv_dim, d_conv, scale=0.4))
            emit(b + "ssm_dt.bias", rand(nh, scale=0.3))
            emit(b + "ssm_a", -np.exp(rng.standard_normal((nh, 1))).astype(np.float32) * 0.5)
            emit(b + "ssm_d", rand(nh, 1, scale=0.3))
            emit(b + "ssm_norm.weight", 1 + rand(n_group, d_inner // n_group, scale=0.02))
            emit(b + "ssm_out.weight", rand(n_embd, d_inner))
        elif kind == "A":
            emit(b + "attn_q.weight", rand(n_head * hd, n_embd))
            emit(b + "attn_k.weight", rand(n_kv * hd, n_embd))
            emit(b + "attn_v.weight", rand(n_kv * hd, n_embd))
            emit(b + "attn_output.weight", rand(n_embd, n_head * hd))
        else:
            emit(b + "ffn_up.weight", rand(n_ff, n_embd))
            emit(b + "ffn_down.weight", rand(n_embd, n_ff))
    w.write(path)
    return path


def make_tiny_diffusion_gguf(path: str, arch: str = "llada",
                             vocab_size: int = 160, seed: int = 0) -> str:
    """Random-weight diffusion-LM GGUF (llada = llama graph, dream = qwen2
    graph; reference src/models/llada.cpp, dream.cpp). Last vocab id is the
    mask token."""
    rng = np.random.default_rng(seed)
    n_embd, n_heads, n_kv, n_ff, n_layers = 48, 4, 2, 96, 2
    hd = n_embd // n_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, f"tiny-{arch}")
    P = arch + "."
    w.add(P + "block_count", np.uint32(n_layers))
    w.add(P + "context_length", np.uint32(256))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(n_heads))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv))
    w.add(P + "attention.key_length", np.uint32(hd))
    w.add(P + "attention.value_length", np.uint32(hd))
    w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(P + "rope.freq_base", 10000.0)
    w.add(P + "rope.dimension_count", np.uint32(hd))
    w.add(P + "vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES, Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:vocab_size]
    vocab[Keys.Tokenizer.MASK_ID] = np.uint32(vocab_size - 1)
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("output.weight", rand(vocab_size, n_embd))
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "ffn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "attn_q.weight", rand(n_heads * hd, n_embd))
        emit(b + "attn_k.weight", rand(n_kv * hd, n_embd))
        emit(b + "attn_v.weight", rand(n_kv * hd, n_embd))
        emit(b + "attn_output.weight", rand(n_embd, n_heads * hd))
        if arch == "dream":  # qwen2-style qkv biases
            emit(b + "attn_q.bias", rand(n_heads * hd, scale=0.1))
            emit(b + "attn_k.bias", rand(n_kv * hd, scale=0.1))
            emit(b + "attn_v.bias", rand(n_kv * hd, scale=0.1))
        emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
        emit(b + "ffn_up.weight", rand(n_ff, n_embd))
        emit(b + "ffn_down.weight", rand(n_embd, n_ff))
    w.write(path)
    return path


def make_tiny_generic_gguf(path: str, arch: str, vocab_size: int = 128,
                           n_layers: int = 2, n_embd: int = 48, n_heads: int = 4,
                           n_kv_heads: int = 2, n_ff: int = 96, seed: int = 0,
                           norm_bias: bool = False, qkv_bias: bool = False,
                           gate_bias: bool = False, tie: bool = False) -> str:
    """Random-weight GGUF in the llama tensor layout under an arbitrary arch
    name — smoke-tests registry entries that have no local HF oracle."""
    rng = np.random.default_rng(seed)
    hd = n_embd // n_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, f"tiny-{arch}")
    P = arch + "."
    w.add(P + "block_count", np.uint32(n_layers))
    w.add(P + "context_length", np.uint32(256))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(n_heads))
    w.add(P + "attention.head_count_kv", np.uint32(n_kv_heads))
    w.add(P + "attention.key_length", np.uint32(hd))
    w.add(P + "attention.value_length", np.uint32(hd))
    w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(P + "attention.layer_norm_epsilon", 1e-5)
    w.add(P + "rope.freq_base", 10000.0)
    w.add(P + "rope.dimension_count", np.uint32(hd))
    w.add(P + "vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES, Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:vocab_size]
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    if norm_bias:
        emit("output_norm.bias", rand(n_embd, scale=0.02))
    if not tie:
        emit("output.weight", rand(vocab_size, n_embd))
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "ffn_norm.weight", 1 + rand(n_embd, scale=0.02))
        if norm_bias:
            emit(b + "attn_norm.bias", rand(n_embd, scale=0.02))
            emit(b + "ffn_norm.bias", rand(n_embd, scale=0.02))
        emit(b + "attn_q.weight", rand(n_heads * hd, n_embd))
        emit(b + "attn_k.weight", rand(n_kv_heads * hd, n_embd))
        emit(b + "attn_v.weight", rand(n_kv_heads * hd, n_embd))
        emit(b + "attn_output.weight", rand(n_embd, n_heads * hd))
        if qkv_bias:
            emit(b + "attn_q.bias", rand(n_heads * hd, scale=0.1))
            emit(b + "attn_k.bias", rand(n_kv_heads * hd, scale=0.1))
            emit(b + "attn_v.bias", rand(n_kv_heads * hd, scale=0.1))
        emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
        emit(b + "ffn_up.weight", rand(n_ff, n_embd))
        emit(b + "ffn_down.weight", rand(n_embd, n_ff))
        if gate_bias:
            emit(b + "ffn_gate.bias", rand(n_ff, scale=0.1))
            emit(b + "ffn_up.bias", rand(n_ff, scale=0.1))
            emit(b + "ffn_down.bias", rand(n_embd, scale=0.1))
    w.write(path)
    return path


def make_tiny_deepseek32_gguf(path: str, vocab_size: int = 128,
                              n_layers: int = 2, n_embd: int = 48,
                              top_k: int = 4, seed: int = 0,
                              arch: str = "deepseek32") -> str:
    """Random-weight DeepSeek-V3.2 DSA GGUF (MLA + lightning indexer;
    reference src/models/deepseek32.cpp tensor layout). arch="deepseek2"
    emits the same weights minus the indexer (dense-equality oracle)."""
    rng = np.random.default_rng(seed)
    H = 4
    qk_nope, qk_rope, v_dim = 8, 4, 8
    kv_lora, q_lora = 16, 16
    hi, di = 2, 8  # indexer heads / key dim (>= qk_rope rope split)
    n_ff = 96
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, f"tiny-{arch}")
    P = arch + "."
    w.add(P + "block_count", np.uint32(n_layers))
    w.add(P + "context_length", np.uint32(256))
    w.add(P + "embedding_length", np.uint32(n_embd))
    w.add(P + "feed_forward_length", np.uint32(n_ff))
    w.add(P + "attention.head_count", np.uint32(H))
    w.add(P + "attention.head_count_kv", np.uint32(1))
    w.add(P + "attention.key_length", np.uint32(kv_lora + qk_rope))
    w.add(P + "attention.value_length", np.uint32(kv_lora))
    w.add(P + "attention.key_length_mla", np.uint32(qk_nope + qk_rope))
    w.add(P + "attention.value_length_mla", np.uint32(v_dim))
    w.add(P + "attention.kv_lora_rank", np.uint32(kv_lora))
    w.add(P + "attention.q_lora_rank", np.uint32(q_lora))
    w.add(P + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(P + "rope.freq_base", 10000.0)
    w.add(P + "rope.dimension_count", np.uint32(qk_rope))
    w.add(P + "vocab_size", np.uint32(vocab_size))
    if arch == "deepseek32":
        w.add(P + "attention.indexer.head_count", np.uint32(hi))
        w.add(P + "attention.indexer.key_length", np.uint32(di))
        w.add(P + "attention.indexer.top_k", np.uint32(top_k))
    vocab = tiny_spm_vocab(vocab_size)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES, Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:vocab_size]
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("output.weight", rand(vocab_size, n_embd))
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "ffn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "attn_q_a.weight", rand(q_lora, n_embd))
        emit(b + "attn_q_a_norm.weight", 1 + rand(q_lora, scale=0.02))
        emit(b + "attn_q_b.weight", rand(H * (qk_nope + qk_rope), q_lora))
        emit(b + "attn_kv_a_mqa.weight", rand(kv_lora + qk_rope, n_embd))
        emit(b + "attn_kv_a_norm.weight", 1 + rand(kv_lora, scale=0.02))
        emit(b + "attn_kv_b.weight", rand(H * (qk_nope + v_dim), kv_lora))
        emit(b + "attn_output.weight", rand(n_embd, H * v_dim))
        emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
        emit(b + "ffn_up.weight", rand(n_ff, n_embd))
        emit(b + "ffn_down.weight", rand(n_embd, n_ff))
        if arch == "deepseek32":
            # independent stream so the shared weights match the
            # arch="deepseek2" fixture draw-for-draw
            rng2 = np.random.default_rng(seed + 1000 + i)

            def rand2(*shape, scale=None):
                scale = scale or (1.0 / np.sqrt(shape[-1]))
                return (rng2.standard_normal(shape) * scale).astype(np.float32)

            emit(b + "indexer.k_norm.weight", 1 + rand2(di, scale=0.02))
            emit(b + "indexer.k_norm.bias", rand2(di, scale=0.02))
            emit(b + "indexer.proj.weight", rand2(hi, n_embd))
            emit(b + "indexer.attn_k.weight", rand2(di, n_embd))
            emit(b + "indexer.attn_q_b.weight", rand2(hi * di, q_lora))
    w.write(path)
    return path


def make_tiny_gpt_oss_gguf(
    path: str,
    vocab_size: int = 1024,
    n_layers: int = 4,
    n_embd: int = 512,
    n_heads: int = 8,
    n_kv_heads: int = 2,
    head_dim: int = 64,
    n_expert: int = 8,
    n_expert_used: int = 2,
    n_ff_exp: int = 512,
    sliding_window: int = 128,
    expert_ftype: str = "mxfp4",
    seed: int = 0,
) -> str:
    """Random gpt-oss-shaped GGUF: MXFP4 MoE experts, attention sinks,
    alternating SWA, qkv/out biases (reference openai-moe layout)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "gpt-oss")
    w.add(Keys.General.NAME, "tiny-gpt-oss")
    w.add("gpt-oss.block_count", np.uint32(n_layers))
    w.add("gpt-oss.context_length", np.uint32(4096))
    w.add("gpt-oss.embedding_length", np.uint32(n_embd))
    w.add("gpt-oss.feed_forward_length", np.uint32(n_ff_exp))
    w.add("gpt-oss.expert_feed_forward_length", np.uint32(n_ff_exp))
    w.add("gpt-oss.attention.head_count", np.uint32(n_heads))
    w.add("gpt-oss.attention.head_count_kv", np.uint32(n_kv_heads))
    w.add("gpt-oss.attention.key_length", np.uint32(head_dim))
    w.add("gpt-oss.attention.value_length", np.uint32(head_dim))
    w.add("gpt-oss.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("gpt-oss.attention.sliding_window", np.uint32(sliding_window))
    w.add("gpt-oss.rope.freq_base", 150000.0)
    w.add("gpt-oss.rope.dimension_count", np.uint32(head_dim))
    w.add("gpt-oss.expert_count", np.uint32(n_expert))
    w.add("gpt-oss.expert_used_count", np.uint32(n_expert_used))
    w.add("gpt-oss.vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    vocab[Keys.Tokenizer.TOKENS] = vocab[Keys.Tokenizer.TOKENS][:vocab_size]
    vocab[Keys.Tokenizer.SCORES] = vocab[Keys.Tokenizer.SCORES][:vocab_size]
    vocab[Keys.Tokenizer.TOKEN_TYPE] = vocab[Keys.Tokenizer.TOKEN_TYPE][:vocab_size]
    w.add_all(vocab)

    eft = {"mxfp4": GGMLType.MXFP4, "q8_0": GGMLType.Q8_0,
           "f32": GGMLType.F32}[expert_ftype]

    def emit(name, arr, t=GGMLType.F32):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        if t == GGMLType.F32 or arr.ndim == 1 or arr.shape[-1] % 256 != 0:
            w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                         GGMLType.F32)
        else:
            w.add_tensor(name, quantize(arr, t).tobytes(),
                         tuple(reversed(arr.shape)), t)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    q8 = GGMLType.Q8_0
    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.02), q8)
    emit("output_norm.weight", np.ones(n_embd))
    emit("output.weight", rand(vocab_size, n_embd), q8)
    kv_dim = n_kv_heads * head_dim
    qd = n_heads * head_dim
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", np.ones(n_embd))
        emit(b + "attn_q.weight", rand(qd, n_embd), q8)
        emit(b + "attn_q.bias", rand(qd, scale=0.01))
        emit(b + "attn_k.weight", rand(kv_dim, n_embd), q8)
        emit(b + "attn_k.bias", rand(kv_dim, scale=0.01))
        emit(b + "attn_v.weight", rand(kv_dim, n_embd), q8)
        emit(b + "attn_v.bias", rand(kv_dim, scale=0.01))
        emit(b + "attn_output.weight", rand(n_embd, qd), q8)
        emit(b + "attn_output.bias", rand(n_embd, scale=0.01))
        emit(b + "attn_sinks.weight", rand(n_heads, scale=1.0))
        emit(b + "attn_post_norm.weight", np.ones(n_embd))
        emit(b + "ffn_gate_inp.weight", rand(n_expert, n_embd))
        emit(b + "ffn_gate_inp.bias", rand(n_expert, scale=0.01))
        emit(b + "ffn_gate_exps.weight", rand(n_expert, n_ff_exp, n_embd), eft)
        emit(b + "ffn_gate_exps.bias", rand(n_expert, n_ff_exp, scale=0.01))
        emit(b + "ffn_up_exps.weight", rand(n_expert, n_ff_exp, n_embd), eft)
        emit(b + "ffn_up_exps.bias", rand(n_expert, n_ff_exp, scale=0.01))
        emit(b + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff_exp), eft)
        emit(b + "ffn_down_exps.bias", rand(n_expert, n_embd, scale=0.01))
    w.write(path)
    return path


# ---------------------------------------------------------------------------
# fast synthetic quantized models (bench fixtures)
# ---------------------------------------------------------------------------

# fp16 scale-field offsets inside a block, per type (layouts per reference
# ggml/src/ggml-common.h; validated against quant/dequant.py parsers)
_SCALE_FIELDS = {
    GGMLType.Q4_0: ((0, "f16"),),
    GGMLType.Q8_0: ((0, "f16"),),
    GGMLType.Q4_K: ((0, "f16"), (2, "f16")),
    GGMLType.Q5_K: ((0, "f16"), (2, "f16")),
    GGMLType.Q6_K: ((208, "f16"),),
    GGMLType.IQ2_XS: ((0, "f16"),),
    GGMLType.IQ3_S: ((0, "f16"),),
}


_RAND_POOL: np.ndarray | None = None


def synth_quant_bytes(rng, n_elements: int, ftype: GGMLType) -> bytes:
    """Random-but-valid packed quantized data, WITHOUT running the (slow)
    quantizer: payload bits come from a shared random pool (every bit
    pattern is decodable for these formats), the fp16 block scales are
    overwritten with small sane values. Orders of magnitude faster than
    quantize() — only usable where weight VALUES don't matter (throughput
    benches)."""
    from .gguf.constants import GGML_BLOCK_LAYOUT

    global _RAND_POOL
    if _RAND_POOL is None:
        _RAND_POOL = np.random.default_rng(1234).integers(
            0, 256, size=1 << 24, dtype=np.uint8)  # 16 MB shared entropy

    lay = GGML_BLOCK_LAYOUT[ftype]
    nb = n_elements // lay.block_size
    total = nb * lay.type_size
    reps = -(-total // _RAND_POOL.size)
    buf = np.tile(_RAND_POOL, reps)[:total].reshape(nb, lay.type_size)
    scale = np.full(nb, rng.uniform(0.002, 0.02), np.float16)
    for off, kind in _SCALE_FIELDS[ftype]:
        buf[:, off : off + 2] = scale.view(np.uint8).reshape(nb, 2)
    if ftype == GGMLType.Q6_K:  # int8 scales field: keep moderate
        buf[:, 192:208] = buf[:, 192:208] % 31 + 1
    return buf.tobytes()


def make_bench_llama_gguf(
    path: str,
    n_layers: int = 32,
    n_embd: int = 4096,
    n_heads: int = 32,
    n_kv_heads: int = 8,
    n_ff: int = 14336,
    vocab_size: int = 128256,
    n_ctx: int = 8192,
    ftype: str = "q4_k",
    seed: int = 0,
) -> str:
    """Llama-3-8B-shaped (by default) GGUF with synthetic packed quantized
    weights — bench fixture for the BASELINE.json north-star config when real
    checkpoints are unavailable (VERDICT round-1 item 1). Q4_K_M-style mix:
    Q4_K everywhere, Q6_K for output/ffn_down (reference llama_tensor_get_type
    role heuristics, src/llama-quant.cpp:424)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "llama")
    w.add(Keys.General.NAME, "bench-llama-synthetic")
    w.add("llama.block_count", np.uint32(n_layers))
    w.add("llama.context_length", np.uint32(n_ctx))
    w.add("llama.embedding_length", np.uint32(n_embd))
    w.add("llama.feed_forward_length", np.uint32(n_ff))
    w.add("llama.attention.head_count", np.uint32(n_heads))
    w.add("llama.attention.head_count_kv", np.uint32(n_kv_heads))
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 500000.0)
    w.add("llama.rope.dimension_count", np.uint32(head_dim))
    w.add("llama.vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(min(vocab_size, 512))
    vocab[Keys.Tokenizer.TOKENS] = (
        vocab[Keys.Tokenizer.TOKENS]
        + [f"▁tk{i}" for i in range(vocab_size - len(vocab[Keys.Tokenizer.TOKENS]))])
    vocab[Keys.Tokenizer.SCORES] = np.full(vocab_size, -100.0, np.float32)
    vocab[Keys.Tokenizer.TOKEN_TYPE] = np.concatenate([
        np.asarray(vocab[Keys.Tokenizer.TOKEN_TYPE], np.int32),
        np.ones(vocab_size - len(vocab[Keys.Tokenizer.TOKEN_TYPE]), np.int32)])
    w.add_all(vocab)

    t_main = {"q4_k": GGMLType.Q4_K, "q8_0": GGMLType.Q8_0,
              "iq3_s": GGMLType.IQ3_S, "iq2_xs": GGMLType.IQ2_XS,
              "q6_k": GGMLType.Q6_K}[ftype]
    t_heavy = GGMLType.Q6_K if ftype == "q4_k" else t_main

    def emit_q(name, rows, cols, t):
        w.add_tensor(name, synth_quant_bytes(rng, rows * cols, t),
                     (cols, rows), t)

    def emit_f(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    emit_q("token_embd.weight", vocab_size, n_embd, t_main)
    emit_f("output_norm.weight", np.ones(n_embd))
    emit_q("output.weight", vocab_size, n_embd, t_heavy)
    kv_dim = n_kv_heads * head_dim
    for i in range(n_layers):
        b = f"blk.{i}."
        emit_f(b + "attn_norm.weight", np.ones(n_embd))
        emit_q(b + "attn_q.weight", n_embd, n_embd, t_main)
        emit_q(b + "attn_k.weight", kv_dim, n_embd, t_main)
        emit_q(b + "attn_v.weight", kv_dim, n_embd, t_heavy)
        emit_q(b + "attn_output.weight", n_embd, n_embd, t_main)
        emit_f(b + "ffn_norm.weight", np.ones(n_embd))
        emit_q(b + "ffn_gate.weight", n_ff, n_embd, t_main)
        emit_q(b + "ffn_up.weight", n_ff, n_embd, t_main)
        emit_q(b + "ffn_down.weight", n_embd, n_ff, t_heavy)
    w.write(path)
    return path


def make_tiny_wavtokenizer_gguf(path: str, n_codes: int = 64, n_embd: int = 32,
                                posnet_embd: int = 32, convnext_embd: int = 32,
                                n_ff: int = 64, n_out: int = 34,
                                n_convnext: int = 2, seed: int = 0) -> str:
    """Tiny WavTokenizer decoder (reference src/models/wavtokenizer-dec.cpp
    tensor inventory: conv1d stem, 6-layer posnet 0,1=res 2=attn 3,4=res
    5=norm, convnext stack, spectral head)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    a = "wavtokenizer-dec"
    w.add(Keys.General.ARCHITECTURE, a)
    w.add(Keys.General.NAME, "tiny-wavtok")
    w.add(f"{a}.vocab_size", np.uint32(n_codes))
    w.add(f"{a}.embedding_length", np.uint32(n_embd))
    w.add(f"{a}.feed_forward_length", np.uint32(n_ff))
    w.add(f"{a}.posnet.embedding_length", np.uint32(posnet_embd))
    w.add(f"{a}.posnet.block_count", np.uint32(6))
    w.add(f"{a}.convnext.embedding_length", np.uint32(convnext_embd))
    w.add(f"{a}.convnext.block_count", np.uint32(n_convnext))
    w.add(f"{a}.attention.layer_norm_epsilon", 1e-6)
    w.add(f"{a}.attention.group_norm_epsilon", 1e-6)
    w.add(f"{a}.attention.group_norm_groups", np.uint32(4))
    # minimal vocab so the reader doesn't choke
    w.add(Keys.Tokenizer.MODEL, "none")

    def emit(name, *shape, ones=False):
        arr = (np.ones(shape, np.float32) if ones
               else (rng.standard_normal(shape) * 0.1).astype(np.float32))
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    E, P, C = n_embd, posnet_embd, convnext_embd
    emit("token_embd.weight", n_codes, E)
    emit("conv1d.weight", P, E, 7)
    emit("conv1d.bias", P)
    for i in (0, 1, 3, 4):
        b = f"posnet.{i}."
        emit(b + "norm1.weight", P, ones=True)
        emit(b + "norm1.bias", P)
        emit(b + "conv1.weight", P, P, 3)
        emit(b + "conv1.bias", P)
        emit(b + "norm2.weight", P, ones=True)
        emit(b + "norm2.bias", P)
        emit(b + "conv2.weight", P, P, 3)
        emit(b + "conv2.bias", P)
    b = "posnet.2."
    emit(b + "attn_norm.weight", P, ones=True)
    emit(b + "attn_norm.bias", P)
    for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
        emit(b + nm + ".weight", P, P, 1)
        emit(b + nm + ".bias", P)
    emit("posnet.5.attn_norm.weight", P, ones=True)
    emit("posnet.5.attn_norm.bias", P)
    emit("token_embd_norm.weight", P, ones=True)
    emit("token_embd_norm.bias", P)
    for i in range(n_convnext):
        b = f"convnext.{i}."
        emit(b + "dw.weight", C, 1, 7)
        emit(b + "dw.bias", C)
        emit(b + "norm.weight", C, ones=True)
        emit(b + "norm.bias", C)
        emit(b + "pw1.weight", n_ff, C)
        emit(b + "pw1.bias", n_ff)
        emit(b + "pw2.weight", C, n_ff)
        emit(b + "pw2.bias", C)
        emit(b + "gamma.weight", C, ones=True)
    emit("output_norm.weight", C, ones=True)
    emit("output_norm.bias", C)
    emit("output.weight", n_out, C)
    emit("output.bias", n_out)
    w.write(path)
    return path


def make_tiny_eagle3_gguf(
    path: str,
    target_layers=(0, 1, 2),
    n_embd_tgt: int = 64,
    n_embd: int = 64,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    n_ff: int = 128,
    vocab_size: int = 300,
    seed: int = 11,
    own_head: bool = True,
    embd_vocab: int | None = None,
) -> str:
    """Random-weight EAGLE3 draft GGUF (reference src/models/eagle3.cpp
    tensor inventory): fc fusion over 3 target layers + ONE decoder layer
    whose q/k/v take 2*n_embd inputs. vocab_size is the DRAFT (output)
    vocab; embd_vocab (default: same) sizes token_embd, which embeds
    TARGET-vocab ids (reference eagle3.cpp:72-77)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "eagle3")
    w.add(Keys.General.NAME, "tiny-eagle3")
    w.add("eagle3.block_count", np.uint32(1))
    w.add("eagle3.context_length", np.uint32(256))
    w.add("eagle3.embedding_length", np.uint32(n_embd))
    w.add("eagle3.feed_forward_length", np.uint32(n_ff))
    w.add("eagle3.attention.head_count", np.uint32(n_heads))
    w.add("eagle3.attention.head_count_kv", np.uint32(n_kv_heads))
    w.add("eagle3.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("eagle3.rope.freq_base", 10000.0)
    w.add("eagle3.rope.dimension_count", np.uint32(head_dim))
    w.add("eagle3.vocab_size", np.uint32(vocab_size))
    w.add("eagle3.target_layers",
          np.asarray(target_layers, dtype=np.int32))
    w.add("eagle3.target_hidden_size", np.uint32(n_embd_tgt))

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_inp = len(target_layers) * n_embd_tgt
    kv_dim = n_kv_heads * head_dim
    emit("fc.weight", rand(n_embd, n_inp))
    b = "blk.0."
    emit(b + "attn_norm.weight", np.ones(n_embd))
    emit(b + "attn_norm_2.weight", np.ones(n_embd))
    emit(b + "attn_q.weight", rand(n_embd, 2 * n_embd))
    emit(b + "attn_k.weight", rand(kv_dim, 2 * n_embd))
    emit(b + "attn_v.weight", rand(kv_dim, 2 * n_embd))
    emit(b + "attn_output.weight", rand(n_embd, n_embd))
    emit(b + "ffn_norm.weight", np.ones(n_embd))
    emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
    emit(b + "ffn_up.weight", rand(n_ff, n_embd))
    emit(b + "ffn_down.weight", rand(n_embd, n_ff))
    emit("output_norm.weight", np.ones(n_embd))
    if own_head:
        emit("token_embd.weight",
             rand(embd_vocab or vocab_size, n_embd, scale=0.02))
        emit("output.weight", rand(vocab_size, n_embd))
    w.write(path)
    return path


def make_tiny_dflash_gguf(
    path: str,
    target_layers=(0, 1),
    n_embd_tgt: int = 64,
    n_embd: int = 64,
    n_layers: int = 2,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    n_ff: int = 128,
    vocab_size: int = 300,
    block_size: int = 8,
    mask_token_id: int = 3,
    seed: int = 13,
) -> str:
    """Random-weight DFlash block-diffusion drafter GGUF (reference
    src/models/dflash.cpp load_arch_tensors, legacy non-DSV4 variant):
    fc encoder over the extracted target layers + a small llama-style
    stack with per-head qk rmsnorm; token_embd/output borrowed from the
    target at run time."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_heads
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "dflash")
    w.add(Keys.General.NAME, "tiny-dflash")
    w.add("dflash.block_count", np.uint32(n_layers))
    w.add("dflash.context_length", np.uint32(256))
    w.add("dflash.embedding_length", np.uint32(n_embd))
    w.add("dflash.feed_forward_length", np.uint32(n_ff))
    w.add("dflash.attention.head_count", np.uint32(n_heads))
    w.add("dflash.attention.head_count_kv", np.uint32(n_kv_heads))
    w.add("dflash.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("dflash.rope.freq_base", 10000.0)
    w.add("dflash.rope.dimension_count", np.uint32(head_dim))
    w.add("dflash.vocab_size", np.uint32(vocab_size))
    w.add("dflash.target_layers", np.asarray(target_layers, dtype=np.int32))
    w.add("dflash.block_size", np.uint32(block_size))
    w.add("tokenizer.ggml.mask_token_id", np.uint32(mask_token_id))

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    kv_dim = n_kv_heads * head_dim
    emit("fc.weight", rand(n_embd, len(target_layers) * n_embd_tgt))
    emit("enc.output_norm.weight", np.ones(n_embd))
    emit("output_norm.weight", np.ones(n_embd))
    for il in range(n_layers):
        b = f"blk.{il}."
        emit(b + "attn_norm.weight", np.ones(n_embd))
        emit(b + "attn_q.weight", rand(n_heads * head_dim, n_embd))
        emit(b + "attn_k.weight", rand(kv_dim, n_embd))
        emit(b + "attn_v.weight", rand(kv_dim, n_embd))
        emit(b + "attn_output.weight", rand(n_embd, n_heads * head_dim))
        emit(b + "attn_q_norm.weight", np.ones(head_dim))
        emit(b + "attn_k_norm.weight", np.ones(head_dim))
        emit(b + "ffn_norm.weight", np.ones(n_embd))
        emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
        emit(b + "ffn_up.weight", rand(n_ff, n_embd))
        emit(b + "ffn_down.weight", rand(n_embd, n_ff))
    w.write(path)
    return path


def make_tiny_rwkv_hybrid_gguf(
    path: str,
    arch: str = "rwkv6qwen2",
    vocab_size: int = 256,
    n_layers: int = 2,
    n_embd: int = 64,
    head_size: int = 16,
    n_kv_heads: int = 2,
    n_ff: int = 128,
    seed: int = 0,
) -> str:
    """Random-weight qrwkv hybrid GGUF: rwkv6qwen2 (reference
    src/models/rwkv6qwen2.cpp load_arch_tensors) or arwkv7
    (src/models/arwkv7.cpp) — rwkv time mix + qwen2 silu-GLU FFN."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, f"tiny-{arch}")
    H = n_embd // head_size
    w.add(f"{arch}.block_count", np.uint32(n_layers))
    w.add(f"{arch}.context_length", np.uint32(1 << 20))
    w.add(f"{arch}.embedding_length", np.uint32(n_embd))
    w.add(f"{arch}.feed_forward_length", np.uint32(n_ff))
    w.add(f"{arch}.wkv.head_size", np.uint32(head_size))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.head_count", np.uint32(H))
    w.add(f"{arch}.attention.head_count_kv", np.uint32(n_kv_heads))
    w.add(f"{arch}.token_shift_count", np.uint32(1))
    w.add(f"{arch}.vocab_size", np.uint32(vocab_size))
    vocab = tiny_spm_vocab(vocab_size)
    for k in (Keys.Tokenizer.TOKENS, Keys.Tokenizer.SCORES,
              Keys.Tokenizer.TOKEN_TYPE):
        vocab[k] = vocab[k][:vocab_size]
    w.add_all(vocab)

    def emit(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    def rand(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    kv_size = n_kv_heads * head_size
    rk = 8
    emit("token_embd.weight", rand(vocab_size, n_embd, scale=0.05))
    emit("output_norm.weight", 1 + rand(n_embd, scale=0.02))
    emit("output.weight", rand(vocab_size, n_embd))
    for i in range(n_layers):
        b = f"blk.{i}."
        emit(b + "attn_norm.weight", 1 + rand(n_embd, scale=0.02))
        if arch == "rwkv6qwen2":
            emit(b + "time_mix_w1.weight", rand(5 * rk, n_embd))
            emit(b + "time_mix_w2.weight", rand(5, n_embd, rk))
            emit(b + "time_mix_lerp_x.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_lerp_fused.weight",
                 rand(5, 1, 1, n_embd, scale=0.3))
            # no time_mix_first -> is_qrwkv branch
            emit(b + "time_mix_decay.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_decay_w1.weight", rand(rk, n_embd))
            emit(b + "time_mix_decay_w2.weight", rand(n_embd, rk))
            emit(b + "time_mix_key.weight", rand(kv_size, n_embd))
            emit(b + "time_mix_key.bias", rand(kv_size, scale=0.05))
            emit(b + "time_mix_value.weight", rand(kv_size, n_embd))
            emit(b + "time_mix_value.bias", rand(kv_size, scale=0.05))
            emit(b + "time_mix_receptance.weight", rand(n_embd, n_embd))
            emit(b + "time_mix_receptance.bias", rand(n_embd, scale=0.05))
            emit(b + "time_mix_gate.weight", rand(n_embd, n_embd))
        else:  # arwkv7
            emit(b + "time_mix_lerp_fused.weight",
                 rand(6, 1, 1, n_embd, scale=0.3))
            emit(b + "time_mix_w0.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_w1.weight", rand(rk, n_embd))
            emit(b + "time_mix_w2.weight", rand(n_embd, rk))
            emit(b + "time_mix_a0.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_a1.weight", rand(rk, n_embd))
            emit(b + "time_mix_a2.weight", rand(n_embd, rk))
            emit(b + "time_mix_v0.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_v1.weight", rand(rk, n_embd))
            emit(b + "time_mix_v2.weight", rand(n_embd, rk))
            emit(b + "time_mix_g1.weight", rand(rk, n_embd))
            emit(b + "time_mix_g2.weight", rand(n_embd, rk))
            emit(b + "time_mix_k_k.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_k_a.weight", rand(n_embd, scale=0.3))
            emit(b + "time_mix_r_k.weight", rand(H, head_size, scale=0.3))
            emit(b + "time_mix_key.weight", rand(n_embd, n_embd))
            emit(b + "time_mix_value.weight", rand(n_embd, n_embd))
            emit(b + "time_mix_receptance.weight", rand(n_embd, n_embd))
            # no time_mix_ln -> no group-norm tail
        emit(b + "time_mix_output.weight", rand(n_embd, n_embd))
        emit(b + "ffn_norm.weight", 1 + rand(n_embd, scale=0.02))
        emit(b + "ffn_gate.weight", rand(n_ff, n_embd))
        emit(b + "ffn_up.weight", rand(n_ff, n_embd))
        emit(b + "ffn_down.weight", rand(n_embd, n_ff))
    w.write(path)
    return path
