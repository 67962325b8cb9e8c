"""Model hyperparameters parsed from GGUF metadata.

Analog of reference src/llama-hparams.h + per-arch load_arch_hparams
(e.g. src/models/llama.cpp:3-33). One dataclass covers the decoder families;
arch-specific defaults are applied by the registry (models/registry.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from ..gguf.constants import Keys
from ..ops.rope import ROPE_TYPE_NEOX, ROPE_TYPE_NORM


@dataclass
class ModelConfig:
    arch: str
    name: str = ""
    vocab_size: int = 0
    n_embd: int = 0
    n_layers: int = 0
    n_heads: int = 0
    n_kv_heads: int = 0
    head_dim_k: int = 0
    head_dim_v: int = 0
    n_ff: int = 0
    n_ctx_train: int = 0

    rms_eps: float = 1e-5
    norm_eps: float = 1e-5
    use_rms_norm: bool = True

    rope_type: int = ROPE_TYPE_NORM
    rope_dims: int = 0
    rope_freq_base: float = 10000.0
    rope_freq_scale: float = 1.0
    rope_ext_factor: float = 0.0
    rope_attn_factor: float = 1.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    rope_orig_ctx: int = 0

    act: str = "silu"
    glu: bool = True  # gated FFN (SwiGLU/GeGLU)
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    logit_scale: float = 1.0
    attn_scale: float = 0.0  # 0 -> 1/sqrt(head_dim_k)
    embd_scale: float = 1.0  # gemma: sqrt(n_embd)

    qk_norm: bool = False  # qwen3/gemma3 per-head rmsnorm on q/k
    attn_bias: bool = False
    post_norms: bool = False  # gemma: post-attention/post-ffn norms
    parallel_residual: bool = False  # gptneox/phi2: x + attn(n(x)) + ffn(n(x))
    norm_after: bool = False  # olmo2: x + norm(attn(x)), no pre-norm
    residual_scale: float = 1.0  # granite
    shared_parallel_norm: bool = False  # phi2: one norm feeds both branches
    alibi_bias: float = 0.0  # bloom/mpt max_alibi_bias (0 = rope/none)

    sliding_window: int = 0
    swa_pattern: int = 0  # every Nth layer is full-attention (gemma3: 6)

    n_expert: int = 0
    n_expert_used: int = 0
    # router probability function (reference llama-graph.cpp:1961-1977):
    # softmax | sigmoid | softmax_weight (top-k on logits, then softmax over
    # the selected k — gpt-oss) | sqrt_softplus
    expert_gating: str = "softmax"
    moe_act: str = ""  # "" -> cfg.act/glu; "swiglu_oai" -> clamped oai glu
    expert_weights_norm: bool = False
    expert_weights_scale: float = 1.0
    n_ff_exp: int = 0
    n_expert_shared: int = 0
    moe_every: int = 1  # layers where MoE applies (1 = all)

    tie_embeddings: bool = False
    compute_dtype: Any = None  # jnp dtype for activations (set by loader)
    extra: dict[str, Any] = field(default_factory=dict)

    # ------------------------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.head_dim_k

    @property
    def gqa_groups(self) -> int:
        return self.n_heads // max(self.n_kv_heads, 1)

    def is_swa_layer(self, il: int) -> bool:
        if self.sliding_window <= 0:
            return False
        arr = self.extra.get("is_swa_layers")  # explicit per-layer array
        if arr is not None:
            return bool(arr[il])
        if self.swa_pattern <= 0:
            return True
        if self.extra.get("swa_first_global"):  # modernbert: il%p==0 global
            return il % self.swa_pattern != 0
        return (il + 1) % self.swa_pattern != 0

    @classmethod
    def from_gguf(cls, md: dict[str, Any]) -> "ModelConfig":
        arch = md.get(Keys.General.ARCHITECTURE, "llama")
        a = {"arch": arch}

        def g(tmpl: str, default=None):
            v = md.get(tmpl.format(arch=arch), default)
            try:
                import numpy as np

                if isinstance(v, np.generic):
                    return v.item()
            except Exception:
                pass
            return v

        def as_int(v, default=0):
            # per-layer arrays (hybrid archs store head_count_kv per layer,
            # 0 on recurrent layers): take the attention layers' value
            if isinstance(v, (list, tuple)):
                return int(max(v)) if v else default
            try:
                import numpy as _np

                if isinstance(v, _np.ndarray):
                    return int(v.max()) if v.size else default
            except Exception:
                pass
            return int(v) if v is not None else default

        K = Keys.LLM
        n_embd = as_int(g(K.EMBEDDING_LENGTH, 0))
        n_heads = as_int(g(K.ATTN_HEAD_COUNT, 0))
        n_kv = as_int(g(K.ATTN_HEAD_COUNT_KV, n_heads), n_heads)
        head_k = int(g(K.ATTN_KEY_LENGTH, n_embd // max(n_heads, 1)))
        head_v = int(g(K.ATTN_VALUE_LENGTH, head_k))
        tokens = md.get(Keys.Tokenizer.TOKENS, [])
        vocab = int(g(K.VOCAB_SIZE, len(tokens)))
        cfg = cls(
            arch=arch,
            name=str(md.get(Keys.General.NAME, "")),
            vocab_size=vocab,
            n_embd=n_embd,
            n_layers=int(g(K.BLOCK_COUNT, 0)),
            n_heads=n_heads,
            n_kv_heads=n_kv,
            head_dim_k=head_k,
            head_dim_v=head_v,
            n_ff=int(g(K.FEED_FORWARD_LENGTH, 0)),
            n_ctx_train=int(g(K.CONTEXT_LENGTH, 0)),
            rms_eps=float(g(K.ATTN_LAYERNORM_RMS_EPS, 1e-5)),
            norm_eps=float(g(K.ATTN_LAYERNORM_EPS, 1e-5)),
            rope_dims=int(g(K.ROPE_DIMENSION_COUNT, head_k)),
            rope_freq_base=float(g(K.ROPE_FREQ_BASE, 10000.0)),
            sliding_window=int(g(K.ATTN_SLIDING_WINDOW, 0)),
            n_expert=int(g(K.EXPERT_COUNT, 0)),
            n_expert_used=int(g(K.EXPERT_USED_COUNT, 0)),
            n_ff_exp=int(g(K.EXPERT_FFN_LENGTH, 0)),
            n_expert_shared=int(g(K.EXPERT_SHARED_COUNT, 0)),
            logit_scale=float(g(K.LOGIT_SCALE, 1.0)),
            attn_logit_softcap=float(g(K.ATTN_LOGIT_SOFTCAP, 0.0)),
            final_logit_softcap=float(g(K.FINAL_LOGIT_SOFTCAP, 0.0)),
        )
        scaling = g(K.ROPE_SCALING_TYPE)
        factor = g(K.ROPE_SCALING_FACTOR)
        if scaling == "linear" and factor:
            cfg.rope_freq_scale = 1.0 / float(factor)
        elif scaling == "yarn" and factor:
            cfg.rope_freq_scale = 1.0 / float(factor)
            cfg.rope_ext_factor = 1.0
            cfg.rope_orig_ctx = int(g(K.ROPE_SCALING_ORIG_CTX, cfg.n_ctx_train))
            cfg.rope_attn_factor = float(g(K.ROPE_SCALING_ATTN_FACTOR, 1.0))
            cfg.rope_beta_fast = float(g(K.ROPE_SCALING_BETA_FAST, 32.0))
            cfg.rope_beta_slow = float(g(K.ROPE_SCALING_BETA_SLOW, 1.0))
        return cfg

    def with_(self, **kw) -> "ModelConfig":
        return replace(self, **kw)
