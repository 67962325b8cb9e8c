"""Llama-4 vision tower (ViT + pixel-shuffle adapter).

TPU analog of the reference's llama4 clip graph
(tools/mtmd/models/llama4.cpp, PROJECTOR_TYPE_LLAMA4): unfold-conv patch
linear, [CLS] appended at the END, learned position embeddings, pre/post
LayerNorms around a biased-attention ViT whose 2D rope rotates INTERLEAVED
complex pairs — first half of the pairs take the X (column) angles, second
half the Y (row) angles, both at (coord + 1), with the CLS row unrotated
(HF Llama4VisionRotaryEmbedding) — then the Llama4VisionPixelShuffleMLP
(pixel shuffle + double-GELU MLP2, llama4.cpp:54-88) and the final
Llama4MultiModalProjector linear.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Llama4VisionConfig:
    embed_dim: int = 1408
    n_layers: int = 34
    n_heads: int = 16
    patch_size: int = 14
    rope_theta: float = 10000.0
    pixel_shuffle_ratio: float = 0.5
    out_hidden: int = 4096
    eps: float = 1e-5
    image_size: int = 336
    image_mean: tuple = (0.5, 0.5, 0.5)
    image_std: tuple = (0.5, 0.5, 0.5)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rope_angles(side: int, hd: int, theta: float) -> np.ndarray:
    """[side*side + 1, hd/2] complex-pair angles (CLS row = 0)."""
    fd = hd // 2
    rope_freq = 1.0 / (theta ** (np.arange(0, fd, 2)[: fd // 2] / fd))
    p = np.arange(side * side)
    fx = (p % side + 1)[:, None] * rope_freq[None]   # [S, fd/2]
    fy = (p // side + 1)[:, None] * rope_freq[None]
    ang = np.concatenate([fx, fy], axis=-1)          # [S, hd/2]
    return np.concatenate([ang, np.zeros((1, hd // 2), ang.dtype)], 0)


def vit_forward(params, cfg: Llama4VisionConfig, patches: jnp.ndarray
                ) -> jnp.ndarray:
    """patches [S, C*ps*ps] (torch Unfold layout), square S -> projected
    image embeddings [S * ratio^2, out]."""
    E, H = cfg.embed_dim, cfg.n_heads
    hd = E // H
    S = patches.shape[0]
    side = int(S ** 0.5)
    assert side * side == S, "llama4 only supports square patch grids"

    x = patches.astype(jnp.float32) @ params["patch_embd"].T  # [S, E]
    x = jnp.concatenate([x, params["class_embd"][None]], axis=0)
    x = x + params["pos_embd"]
    x = _ln(x, params["pre_ln"], params["pre_ln_bias"], cfg.eps)

    ang = _rope_angles(side, hd, cfg.rope_theta)
    cos = jnp.asarray(np.cos(ang), jnp.float32)[:, None, :]  # [S+1, 1, hd/2]
    sin = jnp.asarray(np.sin(ang), jnp.float32)[:, None, :]

    def rope(v):  # [S+1, H, hd] interleaved complex pairs
        v2 = v.reshape(S + 1, H, hd // 2, 2)
        r0 = v2[..., 0] * cos - v2[..., 1] * sin
        r1 = v2[..., 0] * sin + v2[..., 1] * cos
        return jnp.stack([r0, r1], axis=-1).reshape(S + 1, H, hd)

    for lw in params["layers"]:
        h = _ln(x, lw["ln1"], lw["ln1_bias"], cfg.eps)
        q = rope((h @ lw["attn_q"].T + lw["attn_q_bias"]).reshape(-1, H, hd))
        k = rope((h @ lw["attn_k"].T + lw["attn_k_bias"]).reshape(-1, H, hd))
        v = (h @ lw["attn_v"].T + lw["attn_v_bias"]).reshape(-1, H, hd)
        scores = jnp.einsum("shd,thd->hst", q, k) / hd ** 0.5
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", p, v).reshape(-1, E)
        x = x + (attn @ lw["attn_out"].T + lw["attn_out_bias"])
        h = _ln(x, lw["ln2"], lw["ln2_bias"], cfg.eps)
        f = jax.nn.gelu(h @ lw["ffn_up"].T + lw["ffn_up_bias"],
                        approximate=False)
        x = x + (f @ lw["ffn_down"].T + lw["ffn_down_bias"])

    x = _ln(x, params["post_ln"], params["post_ln_bias"], cfg.eps)
    x = x[:-1]  # drop CLS

    # pixel shuffle (HF modeling_llama4.pixel_shuffle, ratio r < 1)
    r = cfg.pixel_shuffle_ratio
    g = x.reshape(side, side, E)
    g = g.reshape(side, int(side * r), int(E / r))
    g = g.transpose(1, 0, 2)
    g = g.reshape(int(side * r), int(side * r), int(E / (r * r)))
    g = g.transpose(1, 0, 2)
    x = g.reshape(-1, int(E / (r * r)))

    # Llama4VisionMLP2: gelu(fc1) -> gelu(fc2), no bias (llama4.cpp:82-88)
    x = jax.nn.gelu(x @ params["mm_mlp_1"].T, approximate=False)
    x = jax.nn.gelu(x @ params["mm_mlp_2"].T, approximate=False)
    if "mm_proj" in params:  # Llama4MultiModalProjector
        x = x @ params["mm_proj"].T
    return x


# ---------------------------------------------------------------------------
# conversion + loading (mmproj GGUF, clip arch with llama4 projector)
# ---------------------------------------------------------------------------


def convert_hf_llama4_vision(model, out_path: str) -> str:
    """HF Llama4VisionModel (or a full Llama4ForConditionalGeneration) ->
    mmproj GGUF (projector "llama4"; tensor names per clip-impl.h)."""
    from ..gguf.constants import GGMLType, Keys
    from ..gguf.writer import GGUFWriter

    vc = getattr(model.config, "vision_config", model.config)
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items()}
    vt = next((p for p in ("model.vision_model.", "vision_model.")
               if any(k.startswith(p) for k in sd)), "")

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "clip")
    w.add("clip.projector_type", "llama4")
    w.add("clip.vision.embedding_length", np.uint32(vc.hidden_size))
    w.add("clip.vision.block_count", np.uint32(vc.num_hidden_layers))
    w.add("clip.vision.attention.head_count",
          np.uint32(vc.num_attention_heads))
    w.add("clip.vision.patch_size", np.uint32(vc.patch_size))
    w.add("clip.vision.image_size", np.uint32(vc.image_size))
    w.add("clip.vision.image_mean", [0.5, 0.5, 0.5])
    w.add("clip.vision.image_std", [0.5, 0.5, 0.5])
    w.add("clip.vision.rope.freq_base", float(vc.rope_theta))
    # n_merge = 1/ratio (reference hparams.n_merge drives the shuffle)
    w.add("clip.vision.spatial_merge_size",
          np.uint32(round(1.0 / vc.pixel_shuffle_ratio)))
    w.add("clip.vision.projection_dim", np.uint32(vc.projector_output_dim))

    def E(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    E("v.patch_embd.weight", sd[vt + "patch_embedding.linear.weight"])
    E("v.class_embd", sd[vt + "class_embedding"])
    E("v.position_embd.weight", sd[vt + "positional_embedding_vlm"])
    E("v.pre_ln.weight", sd[vt + "layernorm_pre.weight"])
    E("v.pre_ln.bias", sd[vt + "layernorm_pre.bias"])
    E("v.post_ln.weight", sd[vt + "layernorm_post.weight"])
    E("v.post_ln.bias", sd[vt + "layernorm_post.bias"])
    for i in range(vc.num_hidden_layers):
        p, b = f"{vt}model.layers.{i}.", f"v.blk.{i}."
        E(b + "ln1.weight", sd[p + "input_layernorm.weight"])
        E(b + "ln1.bias", sd[p + "input_layernorm.bias"])
        E(b + "ln2.weight", sd[p + "post_attention_layernorm.weight"])
        E(b + "ln2.bias", sd[p + "post_attention_layernorm.bias"])
        for src, dst in (("self_attn.q_proj", "attn_q"),
                         ("self_attn.k_proj", "attn_k"),
                         ("self_attn.v_proj", "attn_v"),
                         ("self_attn.o_proj", "attn_out"),
                         ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down")):
            E(b + dst + ".weight", sd[p + src + ".weight"])
            E(b + dst + ".bias", sd[p + src + ".bias"])
    E("mm.model.mlp.1.weight", sd[vt + "vision_adapter.mlp.fc1.weight"])
    E("mm.model.mlp.2.weight", sd[vt + "vision_adapter.mlp.fc2.weight"])
    mm = next((p for p in ("model.multi_modal_projector.",
                           "multi_modal_projector.")
               if any(k.startswith(p) for k in sd)), None)
    if mm:
        E("mm.model.fc.weight", sd[mm + "linear_1.weight"])
    w.write(out_path)
    return out_path


def load_llama4_mmproj(path: str):
    """-> (params pytree, Llama4VisionConfig)."""
    from ..gguf.reader import read_gguf

    f = read_gguf(path)
    md = f.metadata
    assert md.get("clip.projector_type") == "llama4", "not a llama4 mmproj"

    def T(name):
        info = f.tensors[name]
        return jnp.asarray(
            np.asarray(info.data).view(np.float32).reshape(info.shape))

    depth = int(md["clip.vision.block_count"])
    cfg = Llama4VisionConfig(
        embed_dim=int(md["clip.vision.embedding_length"]),
        n_layers=depth,
        n_heads=int(md["clip.vision.attention.head_count"]),
        patch_size=int(md["clip.vision.patch_size"]),
        rope_theta=float(md.get("clip.vision.rope.freq_base", 10000.0)),
        pixel_shuffle_ratio=1.0 / int(
            md.get("clip.vision.spatial_merge_size", 2)),
        out_hidden=int(md["clip.vision.projection_dim"]),
        image_size=int(md.get("clip.vision.image_size", 336)),
        image_mean=tuple(md.get("clip.vision.image_mean", (0.5, 0.5, 0.5))),
        image_std=tuple(md.get("clip.vision.image_std", (0.5, 0.5, 0.5))),
    )
    params = {
        "patch_embd": T("v.patch_embd.weight"),
        "class_embd": T("v.class_embd"),
        "pos_embd": T("v.position_embd.weight"),
        "pre_ln": T("v.pre_ln.weight"), "pre_ln_bias": T("v.pre_ln.bias"),
        "post_ln": T("v.post_ln.weight"),
        "post_ln_bias": T("v.post_ln.bias"),
        "mm_mlp_1": T("mm.model.mlp.1.weight"),
        "mm_mlp_2": T("mm.model.mlp.2.weight"),
        "layers": [],
    }
    if "mm.model.fc.weight" in f.tensors:
        params["mm_proj"] = T("mm.model.fc.weight")
    for i in range(depth):
        b = f"v.blk.{i}."
        lw = {}
        for dst in ("ln1", "ln2", "attn_q", "attn_k", "attn_v", "attn_out",
                    "ffn_up", "ffn_down"):
            lw[dst] = T(b + dst + ".weight")
            lw[dst + "_bias"] = T(b + dst + ".bias")
        params["layers"].append(lw)
    return params, cfg
