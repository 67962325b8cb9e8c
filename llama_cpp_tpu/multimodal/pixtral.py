"""Pixtral / Mistral-Small-3.1 vision tower.

TPU analog of the reference's pixtral clip graph
(tools/mtmd/models/pixtral.cpp, PROJECTOR_TYPE_PIXTRAL "pixtral"): RMSNorm
pre-LN ViT with per-axis 2D rotary (h rows take the even frequency slots, w
columns the odd ones — HF PixtralRotaryEmbedding), gated MLP, block-diagonal
attention across images, optional Mistral-3.1 patch merger (RMS input norm +
k x k unfold + merging linear, pixtral.cpp:28-48), the GELU multimodal
projector (mm.1/mm.2), and the [IMG_BREAK] row arrangement
(pixtral.cpp:61-81).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PixtralVisionConfig:
    embed_dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    head_dim: int = 64
    patch_size: int = 16
    act: str = "gelu"  # MLP gate activation (hparams.ffn_op)
    rope_theta: float = 10000.0
    out_hidden: int = 4096
    n_merge: int = 0  # mistral-3.1 patch merger kernel (0 = absent)
    eps: float = 1e-5
    image_size: int = 1024
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w


def pos_2d(sizes) -> np.ndarray:
    """(h, w) per patch row across images, raster order per image."""
    out = []
    for h, w in np.asarray(sizes):
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w)).reshape(-1)
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w)).reshape(-1)
        out.append(np.stack([hp, wp], -1))
    return np.concatenate(out, 0)  # [S, 2]


def vit_forward(params, cfg: PixtralVisionConfig, patches: jnp.ndarray,
                sizes) -> jnp.ndarray:
    """patches [S, C*ps*ps] (conv im2col layout: C-major, then pixel rows),
    sizes = [(h_patches, w_patches), ...] per image -> [S', out_hidden]
    (S' = S when no merger, S / n_merge^2 with it)."""
    E, H, hd = cfg.embed_dim, cfg.n_heads, cfg.head_dim
    S = patches.shape[0]
    sizes = np.asarray(sizes)

    x = patches.astype(jnp.float32) @ params["patch_embd"].T  # [S, E]
    x = _rms(x, params["pre_ln"], cfg.eps)

    # 2D rope (HF PixtralRotaryEmbedding): angle vector interleaves the
    # h- and w- products over alternating frequency slots
    ids = pos_2d(sizes)
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2) / hd))  # [hd/2]
    ang = np.zeros((S, hd // 2), np.float32)
    ang[:, 0::2] = ids[:, :1] * freqs[0::2][None]
    ang[:, 1::2] = ids[:, 1:] * freqs[1::2][None]
    cos = jnp.asarray(np.cos(ang))[:, None, :]  # [S, 1, hd/2]
    sin = jnp.asarray(np.sin(ang))[:, None, :]

    def rope2d(v):  # [S, H, hd], NEOX halves
        v0, v1 = v[..., : hd // 2], v[..., hd // 2:]
        return jnp.concatenate([v0 * cos - v1 * sin, v0 * sin + v1 * cos],
                               axis=-1)

    # block-diagonal mask across images
    img = np.repeat(np.arange(len(sizes)), sizes[:, 0] * sizes[:, 1])
    mask = jnp.asarray(img[:, None] == img[None, :])

    gate_act = jax.nn.silu if cfg.act == "silu" else (
        lambda v: jax.nn.gelu(v, approximate=False))

    for lw in params["layers"]:
        h = _rms(x, lw["attn_norm"], cfg.eps)
        q = rope2d((h @ lw["attn_q"].T).reshape(S, H, hd))
        k = rope2d((h @ lw["attn_k"].T).reshape(S, H, hd))
        v = (h @ lw["attn_v"].T).reshape(S, H, hd)
        scores = jnp.einsum("shd,thd->hst", q, k) / hd ** 0.5
        scores = jnp.where(mask[None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", p, v).reshape(S, H * hd)
        x = x + attn @ lw["attn_out"].T
        h = _rms(x, lw["ffn_norm"], cfg.eps)
        up = gate_act(h @ lw["ffn_gate"].T) * (h @ lw["ffn_up"].T)
        x = x + up @ lw["ffn_down"].T

    if cfg.n_merge and "mm_patch_merger" in params:
        # mistral-3.1 patch merger (pixtral.cpp:28-48): RMS input norm,
        # k x k unfold per image grid (C-major features), merging linear
        k = cfg.n_merge
        x = _rms(x, params["mm_input_norm"], 1e-6)
        parts, off = [], 0
        for h_, w_ in sizes:
            g = x[off:off + h_ * w_].reshape(h_, w_, E)
            g = g.reshape(h_ // k, k, w_ // k, k, E)
            # unfold feature order: [E, kh, kw] (channel-major)
            g = g.transpose(0, 2, 4, 1, 3).reshape(-1, E * k * k)
            parts.append(g)
            off += h_ * w_
        x = jnp.concatenate(parts, 0) @ params["mm_patch_merger"].T

    # LlavaMultiModalProjector, always GELU (pixtral.cpp:50-58)
    x = x @ params["mm_1"].T + params.get("mm_1_bias", 0.0)
    x = jax.nn.gelu(x, approximate=False)
    return x @ params["mm_2"].T + params.get("mm_2_bias", 0.0)


def arrange_with_img_break(emb: jnp.ndarray, p_x: int, p_y: int,
                           tok: jnp.ndarray) -> jnp.ndarray:
    """Append the [IMG_BREAK] embedding after every output row except the
    last (pixtral.cpp:61-81). emb [p_y*p_x, E] -> [p_y*p_x + p_y - 1, E]."""
    e = emb.reshape(p_y, p_x, -1)
    brk = jnp.broadcast_to(tok, (p_y, 1, e.shape[-1]))
    out = jnp.concatenate([e, brk], axis=1).reshape(p_y * (p_x + 1), -1)
    return out[: p_y * p_x + p_y - 1]


# ---------------------------------------------------------------------------
# conversion + loading (mmproj GGUF, clip arch with pixtral projector)
# ---------------------------------------------------------------------------


def extract_patches(pixel_values: np.ndarray, ps: int) -> np.ndarray:
    """[C, H, W] image -> [h*w, C*ps*ps] patch rows (conv im2col layout)."""
    C, Hp, Wp = pixel_values.shape
    h, w = Hp // ps, Wp // ps
    g = pixel_values.reshape(C, h, ps, w, ps)
    return np.ascontiguousarray(
        g.transpose(1, 3, 0, 2, 4)).reshape(h * w, C * ps * ps)


def convert_hf_pixtral_vision(model, out_path: str) -> str:
    """HF LlavaForConditionalGeneration / Mistral3ForConditionalGeneration
    (pixtral vision tower) -> mmproj GGUF (projector "pixtral")."""
    from ..gguf.constants import GGMLType, Keys
    from ..gguf.writer import GGUFWriter

    vc = model.config.vision_config
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items()}
    vt = next(p for p in ("model.vision_tower.", "vision_tower.")
              if any(k.startswith(p) for k in sd))
    mm = next(p for p in ("model.multi_modal_projector.",
                          "multi_modal_projector.")
              if any(k.startswith(p) for k in sd))

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "clip")
    w.add("clip.projector_type", "pixtral")
    w.add("clip.vision.embedding_length", np.uint32(vc.hidden_size))
    w.add("clip.vision.block_count", np.uint32(vc.num_hidden_layers))
    w.add("clip.vision.attention.head_count",
          np.uint32(vc.num_attention_heads))
    w.add("clip.vision.attention.key_length", np.uint32(vc.head_dim))
    w.add("clip.vision.patch_size", np.uint32(vc.patch_size))
    w.add("clip.vision.rope.freq_base", float(vc.rope_theta))
    w.add("clip.vision.feed_forward_length", np.uint32(vc.intermediate_size))
    w.add("clip.use_silu", vc.hidden_act == "silu")
    w.add("clip.vision.image_size", np.uint32(vc.image_size))
    # pixtral/mistral processor normalization constants
    w.add("clip.vision.image_mean", [0.48145466, 0.4578275, 0.40821073])
    w.add("clip.vision.image_std", [0.26862954, 0.26130258, 0.27577711])
    w.add("clip.vision.projection_dim",
          np.uint32(model.config.text_config.hidden_size))
    merge = int(getattr(model.config, "spatial_merge_size", 0) or 0)
    if mm + "patch_merger.merging_layer.weight" in sd and merge:
        w.add("clip.vision.spatial_merge_size", np.uint32(merge))

    def E(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    pc = sd[vt + "patch_conv.weight"]  # [E, C, ps, ps]
    E("v.patch_embd.weight", pc.reshape(pc.shape[0], -1))
    E("v.pre_ln.weight", sd[vt + "ln_pre.weight"])
    for i in range(vc.num_hidden_layers):
        p, b = f"{vt}transformer.layers.{i}.", f"v.blk.{i}."
        E(b + "ln1.weight", sd[p + "attention_norm.weight"])
        E(b + "ln2.weight", sd[p + "ffn_norm.weight"])
        for src, dst in (("attention.q_proj", "attn_q"),
                         ("attention.k_proj", "attn_k"),
                         ("attention.v_proj", "attn_v"),
                         ("attention.o_proj", "attn_out"),
                         ("feed_forward.gate_proj", "ffn_gate"),
                         ("feed_forward.up_proj", "ffn_up"),
                         ("feed_forward.down_proj", "ffn_down")):
            E(b + dst + ".weight", sd[p + src + ".weight"])
    if mm + "patch_merger.merging_layer.weight" in sd:
        E("mm.input_norm.weight", sd[mm + "norm.weight"])
        E("mm.patch_merger.weight",
          sd[mm + "patch_merger.merging_layer.weight"])
    E("mm.1.weight", sd[mm + "linear_1.weight"])
    if mm + "linear_1.bias" in sd:
        E("mm.1.bias", sd[mm + "linear_1.bias"])
    E("mm.2.weight", sd[mm + "linear_2.weight"])
    if mm + "linear_2.bias" in sd:
        E("mm.2.bias", sd[mm + "linear_2.bias"])
    w.write(out_path)
    return out_path


def load_pixtral_mmproj(path: str):
    """-> (params pytree, PixtralVisionConfig)."""
    from ..gguf.reader import read_gguf

    f = read_gguf(path)
    md = f.metadata
    assert md.get("clip.projector_type") == "pixtral", "not a pixtral mmproj"

    def T(name):
        info = f.tensors[name]
        return jnp.asarray(
            np.asarray(info.data).view(np.float32).reshape(info.shape))

    depth = int(md["clip.vision.block_count"])
    E = int(md["clip.vision.embedding_length"])
    H = int(md["clip.vision.attention.head_count"])
    cfg = PixtralVisionConfig(
        embed_dim=E,
        n_layers=depth,
        n_heads=H,
        head_dim=int(md.get("clip.vision.attention.key_length", E // H)),
        patch_size=int(md["clip.vision.patch_size"]),
        act="silu" if md.get("clip.use_silu") else "gelu",
        rope_theta=float(md.get("clip.vision.rope.freq_base", 10000.0)),
        out_hidden=int(md["clip.vision.projection_dim"]),
        n_merge=int(md.get("clip.vision.spatial_merge_size", 0)),
        image_size=int(md.get("clip.vision.image_size", 1024)),
        image_mean=tuple(md.get("clip.vision.image_mean",
                                (0.48145466, 0.4578275, 0.40821073))),
        image_std=tuple(md.get("clip.vision.image_std",
                               (0.26862954, 0.26130258, 0.27577711))),
    )
    params = {
        "patch_embd": T("v.patch_embd.weight"),
        "pre_ln": T("v.pre_ln.weight"),
        "mm_1": T("mm.1.weight"), "mm_2": T("mm.2.weight"),
        "layers": [],
    }
    for opt_name, key in (("mm.1.bias", "mm_1_bias"),
                          ("mm.2.bias", "mm_2_bias"),
                          ("mm.input_norm.weight", "mm_input_norm"),
                          ("mm.patch_merger.weight", "mm_patch_merger"),
                          ("v.token_embd.img_break", "img_break")):
        if opt_name in f.tensors:
            params[key] = T(opt_name)
    for i in range(depth):
        b = f"v.blk.{i}."
        params["layers"].append({
            "attn_norm": T(b + "ln1.weight"),
            "ffn_norm": T(b + "ln2.weight"),
            "attn_q": T(b + "attn_q.weight"),
            "attn_k": T(b + "attn_k.weight"),
            "attn_v": T(b + "attn_v.weight"),
            "attn_out": T(b + "attn_out.weight"),
            "ffn_gate": T(b + "ffn_gate.weight"),
            "ffn_up": T(b + "ffn_up.weight"),
            "ffn_down": T(b + "ffn_down.weight"),
        })
    return params, cfg
