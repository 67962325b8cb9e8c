"""CLIP/SigLIP-family ViT vision encoder in JAX.

Analog of the reference clip graph (tools/mtmd/clip.cpp): patch-conv
embedding, class token + learned positions, pre-LN, N bidirectional
transformer blocks, feature-layer selection, and the LLaVA MLP projector
(mm.0 / mm.2). Weight names follow the reference mmproj GGUF layout
(tools/mtmd/clip-impl.h:102-146).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp


@dataclass
class VisionConfig:
    image_size: int = 336
    patch_size: int = 14
    n_embd: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    n_ff: int = 4096
    eps: float = 1e-5
    projector: str = "mlp"  # llava mlp
    n_embd_out: int = 4096  # LLM embedding width
    feature_layer: int = -2  # llava takes the penultimate block's output
    use_cls: bool = True
    drop_cls: bool = True  # llava "default" select strategy
    act: str = "quick_gelu"  # CLIP; siglip uses gelu_tanh
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _act(cfg: VisionConfig, x):
    if cfg.act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=True)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y


def patch_embed(params, cfg: VisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, H, W, 3] (already normalized) -> [B, n_patches, E].

    The patch conv is a stride-p convolution == matmul over flattened
    patches; weight stored [E, 3, p, p] (HF conv layout)."""
    B, H, W, _ = pixels.shape
    p = cfg.patch_size
    nh, nw = H // p, W // p
    x = pixels.reshape(B, nh, p, nw, p, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(B, nh * nw, 3 * p * p)  # [B, N, 3*p*p] (c, ph, pw) order
    w = params["patch_embd"].reshape(cfg.n_embd, 3 * p * p)  # [E, 3*p*p]
    out = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
    if "patch_bias" in params:
        out = out + params["patch_bias"]
    return out


def clip_forward(params, cfg: VisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """-> image embedding tokens [B, n_out_tokens, n_embd_out] (after the
    feature-layer select + projector)."""
    x = patch_embed(params, cfg, pixels)  # [B, N, E]
    B = x.shape[0]
    if cfg.use_cls and "class_embd" in params:
        cls = jnp.broadcast_to(params["class_embd"], (B, 1, cfg.n_embd))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embd"][None, : x.shape[1]]
    if "pre_ln" in params:
        x = _ln(x, params["pre_ln"], params.get("pre_ln_bias"), cfg.eps)

    # HF vision_feature_layer indexes hidden_states (embeddings + 1/block):
    # -2 == output of block n_layers-1, i.e. run n_layers-1 blocks
    if cfg.feature_layer < 0:
        n_run = cfg.n_layers + cfg.feature_layer + 1
    else:
        n_run = cfg.feature_layer
    H = cfg.n_heads
    D = cfg.n_embd // H
    for il in range(n_run):
        lw = params["layers"][il]
        h = _ln(x, lw.get("ln1"), lw.get("ln1_bias"), cfg.eps)
        q = jnp.dot(h, lw["attn_q"].T) + lw.get("attn_q_bias", 0.0)
        k = jnp.dot(h, lw["attn_k"].T) + lw.get("attn_k_bias", 0.0)
        v = jnp.dot(h, lw["attn_v"].T) + lw.get("attn_v_bias", 0.0)
        N = h.shape[1]
        q = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) / D ** 0.5
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                          preferred_element_type=jnp.float32)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, N, cfg.n_embd)
        attn = jnp.dot(attn, lw["attn_out"].T) + lw.get("attn_out_bias", 0.0)
        x = x + attn
        h = _ln(x, lw.get("ln2"), lw.get("ln2_bias"), cfg.eps)
        f = jnp.dot(h, lw["ffn_up"].T) + lw.get("ffn_up_bias", 0.0)
        f = _act(cfg, f)
        f = jnp.dot(f, lw["ffn_down"].T) + lw.get("ffn_down_bias", 0.0)
        x = x + f

    if cfg.use_cls and cfg.drop_cls:
        x = x[:, 1:]
    return apply_projector(cfg, params, x)


def apply_projector(cfg: "VisionConfig", params, x):
    """Vision-feature projector dispatch -> [B, n_tokens, n_embd_llm]
    (reference tools/mtmd/models/{llava,siglip,internvl}.cpp projector
    tails; tensor names per clip-impl.h)."""
    if cfg.projector == "mlp":
        x = jnp.dot(x, params["mm_0"].T) + params.get("mm_0_bias", 0.0)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, params["mm_2"].T) + params.get("mm_2_bias", 0.0)
    elif cfg.projector == "mlp_norm":
        # llava-variant with layernorms (reference models/llava.cpp:175-194)
        x = jnp.dot(x, params["mm_0"].T) + params.get("mm_0_bias", 0.0)
        x = _ln(x, params["mm_1"], params.get("mm_1_bias"), cfg.eps)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, params["mm_3"].T) + params.get("mm_3_bias", 0.0)
        x = _ln(x, params["mm_4"], params.get("mm_4_bias"), cfg.eps)
    elif cfg.projector == "linear":
        x = jnp.dot(x, params["mm_0"].T) + params.get("mm_0_bias", 0.0)
    elif cfg.projector == "gemma3":
        # reference models/siglip.cpp:18-40: avg-pool k x k over the patch
        # grid, rms-norm (soft_emb_norm), project with mm_input_proj
        B, N, E = x.shape
        side = int(N ** 0.5)
        k = int(cfg.extra.get("proj_scale_factor", 4) or 4)
        g = x.reshape(B, side, side, E)
        g = g.reshape(B, side // k, k, side // k, k, E).mean(axis=(2, 4))
        x = g.reshape(B, (side // k) ** 2, E)
        ss = jnp.sqrt(jnp.mean(x.astype(jnp.float32) ** 2, -1,
                               keepdims=True) + cfg.eps)
        x = x / ss * params["mm_soft_emb_norm"]
        x = jnp.dot(x, params["mm_input_proj"])
    elif cfg.projector in ("idefics3", "internvl"):
        # pixel shuffle (models/siglip.cpp:41-46, internvl.cpp:24-41) then
        # fc (idefics3) or LN + 2-layer GELU MLP (internvl)
        B, N, E = x.shape
        side = int(N ** 0.5)
        s = int(cfg.extra.get("proj_scale_factor", 2) or 2)
        g = x.reshape(B, side, side, E)  # [B, h, w, E] row-major patches
        if cfg.projector == "internvl":
            # internvl.cpp: width-dim shuffle first, then height
            g = g.reshape(B, side, side // s, s * E)
            g = g.transpose(0, 2, 1, 3).reshape(
                B, side // s, side // s, s * s * E)
            g = g.transpose(0, 2, 1, 3)
        else:
            # build_patch_merge_permute: rows of s*E, then columns
            g = g.reshape(B, side, side // s, s * E)
            g = g.transpose(0, 2, 1, 3).reshape(
                B, side // s, side // s, s * s * E)
            g = g.transpose(0, 2, 1, 3)
        x = g.reshape(B, (side // s) ** 2, s * s * E)
        if cfg.projector == "idefics3":
            x = jnp.dot(x, params["mm_fc"].T)
        else:
            x = _ln(x, params["mm_0"], params.get("mm_0_bias"), 1e-5)
            x = jnp.dot(x, params["mm_1"].T) + params.get("mm_1_bias", 0.0)
            x = jax.nn.gelu(x, approximate=False)
            x = jnp.dot(x, params["mm_3"].T) + params.get("mm_3_bias", 0.0)
    elif cfg.projector == "lfm2":
        # LFM2-VL (reference models/siglip.cpp:47-68): idefics3-style pixel
        # unshuffle, optional LayerNorm, then GELU MLP (mm_1 -> mm_2)
        B, N, E = x.shape
        side = int(N ** 0.5)
        s = int(cfg.extra.get("proj_scale_factor", 2) or 2)
        g = x.reshape(B, side, side, E)
        g = g.reshape(B, side, side // s, s * E)
        g = g.transpose(0, 2, 1, 3).reshape(B, side // s, side // s,
                                            s * s * E)
        g = g.transpose(0, 2, 1, 3)
        x = g.reshape(B, (side // s) ** 2, s * s * E)
        if "mm_input_norm" in params:
            x = _ln(x, params["mm_input_norm"],
                    params.get("mm_input_norm_bias"), 1e-5)
        x = jnp.dot(x, params["mm_1"].T) + params.get("mm_1_bias", 0.0)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, params["mm_2"].T) + params.get("mm_2_bias", 0.0)
    elif cfg.projector == "janus_pro":
        # Janus-Pro aligner (models/siglip.cpp:69-76): plain GELU MLP
        x = jnp.dot(x, params["mm_0"].T) + params.get("mm_0_bias", 0.0)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, params["mm_1"].T) + params.get("mm_1_bias", 0.0)
    else:  # pragma: no cover
        raise NotImplementedError(f"projector {cfg.projector!r}")
    return x


def normalize_image(arr, cfg: VisionConfig):
    """uint8/float [H, W, 3] -> normalized float32 with CLIP mean/std."""
    import numpy as np

    a = np.asarray(arr, np.float32)
    if a.max() > 1.5:
        a = a / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    return (a - mean) / std


def preprocess_image(img, cfg: VisionConfig):
    """PIL image / array -> [image_size, image_size, 3] normalized (resize
    shortest side + center crop, CLIPImageProcessor semantics)."""
    import numpy as np
    from PIL import Image

    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    img = img.convert("RGB")
    s = cfg.image_size
    w, h = img.size
    scale = s / min(w, h)
    img = img.resize((max(s, round(w * scale)), max(s, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left, top = (w - s) // 2, (h - s) // 2
    img = img.crop((left, top, left + s, top + s))
    return normalize_image(np.asarray(img), cfg)
