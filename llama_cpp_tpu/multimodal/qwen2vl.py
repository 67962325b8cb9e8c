"""Qwen2-VL vision tower (ViT + 2x2 patch merger).

TPU analog of the reference's qwen2vl clip graph (tools/mtmd/clip.cpp
PROJECTOR_TYPE_QWEN2VL "qwen2vl_merger"): patch linear (folded Conv3d),
blocks with fused qkv + 2D rotary over (h, w) patch grids, quick-gelu MLP,
and the 4-to-1 merger MLP projecting into the text embedding space.
Patch rows arrive in the HF processor's merge-window ordering, so the
merger groups 4 consecutive rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Qwen2VLVisionConfig:
    embed_dim: int = 1280
    n_layers: int = 32
    n_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    out_hidden: int = 3584
    eps: float = 1e-6
    theta: float = 10000.0


def rot_pos_ids(grid_thw, merge: int) -> np.ndarray:
    """(h, w) position per patch row in merge-window order
    (HF Qwen2VisionTransformerPretrainedModel.rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hp = hp.reshape(h // merge, merge, w // merge, merge)
        hp = hp.transpose(0, 2, 1, 3).reshape(-1)
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wp = wp.reshape(h // merge, merge, w // merge, merge)
        wp = wp.transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([hp, wp], axis=-1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)  # [S, 2]


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * w + (b if b is not None else 0.0)


def vit_forward(params, cfg: Qwen2VLVisionConfig, patches: jnp.ndarray,
                grid_thw) -> jnp.ndarray:
    """patches [S, C*tp*ps*ps] (HF pixel_values layout) -> [S/merge^2, out]."""
    E = cfg.embed_dim
    H = cfg.n_heads
    hd = E // H
    S = patches.shape[0]

    x = patches.astype(jnp.float32) @ params["patch_embd"].T  # [S, E]

    # 2D rotary: half-angle vector = [h_pos * invf, w_pos * invf]
    ids = rot_pos_ids(np.asarray(grid_thw), cfg.spatial_merge_size)
    invf = 1.0 / (cfg.theta ** (np.arange(0, hd // 2, 2) / (hd // 2)))
    ang = np.concatenate(
        [ids[:, :1] * invf[None], ids[:, 1:] * invf[None]], axis=-1)
    cos = jnp.asarray(np.cos(ang), jnp.float32)[:, None, :]  # [S, 1, hd/2]
    sin = jnp.asarray(np.sin(ang), jnp.float32)[:, None, :]

    def rope2d(v):  # [S, H, hd]
        v0, v1 = v[..., : hd // 2], v[..., hd // 2 :]
        return jnp.concatenate([v0 * cos - v1 * sin, v0 * sin + v1 * cos],
                               axis=-1)

    for lw in params["layers"]:
        h = _ln(x, lw["ln1"], lw.get("ln1_bias"), cfg.eps)
        qkv = h @ lw["attn_qkv"].T + lw["attn_qkv_bias"]
        q, k, v = jnp.split(qkv.reshape(S, 3, H, hd), 3, axis=1)
        q = rope2d(q[:, 0])
        k = rope2d(k[:, 0])
        v = v[:, 0]
        scores = jnp.einsum("shd,thd->hst", q, k) / hd ** 0.5
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", p, v).reshape(S, E)
        x = x + (attn @ lw["attn_out"].T + lw["attn_out_bias"])
        h = _ln(x, lw["ln2"], lw.get("ln2_bias"), cfg.eps)
        up = h @ lw["ffn_up"].T + lw["ffn_up_bias"]
        up = up * jax.nn.sigmoid(1.702 * up)  # quick_gelu
        x = x + (up @ lw["ffn_down"].T + lw["ffn_down_bias"])

    # merger: LN then fold merge^2 consecutive rows, 2-layer MLP
    m2 = cfg.spatial_merge_size ** 2
    h = _ln(x, params["merger_ln"], params.get("merger_ln_bias"), cfg.eps)
    h = h.reshape(S // m2, m2 * E)
    h = h @ params["mm_0"].T + params["mm_0_bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["mm_2"].T + params["mm_2_bias"]  # [S/m2, out]


# ---------------------------------------------------------------------------
# conversion + loading (mmproj GGUF, clip arch with qwen2vl_merger projector)
# ---------------------------------------------------------------------------


def convert_hf_qwen2vl_vision(model, out_path: str) -> str:
    """HF Qwen2VLForConditionalGeneration -> vision mmproj GGUF."""
    from ..gguf.constants import Keys
    from ..gguf.writer import GGUFWriter
    from ..gguf.constants import GGMLType

    vc = model.config.vision_config
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items() if "visual" in k}
    pfx = "model.visual." if any(k.startswith("model.visual.") for k in sd) \
        else "visual."
    embed_dim = getattr(vc, "embed_dim", getattr(vc, "hidden_size", 0))

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "clip")
    w.add("clip.projector_type", "qwen2vl_merger")
    w.add("clip.vision.embedding_length", np.uint32(embed_dim))
    w.add("clip.vision.block_count", np.uint32(vc.depth))
    w.add("clip.vision.attention.head_count", np.uint32(vc.num_heads))
    w.add("clip.vision.patch_size", np.uint32(vc.patch_size))
    w.add("clip.vision.temporal_patch_size", np.uint32(vc.temporal_patch_size))
    w.add("clip.vision.spatial_merge_size", np.uint32(vc.spatial_merge_size))
    w.add("clip.vision.projection_dim",
          np.uint32(getattr(vc, "hidden_size", model.config.hidden_size)))

    def E(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    pe = sd[pfx + "patch_embed.proj.weight"]  # [E, C, tp, ps, ps]
    E("v.patch_embd.weight", pe.reshape(pe.shape[0], -1))
    for i in range(vc.depth):
        p, b = f"{pfx}blocks.{i}.", f"v.blk.{i}."
        E(b + "ln1.weight", sd[p + "norm1.weight"])
        E(b + "ln1.bias", sd[p + "norm1.bias"])
        E(b + "ln2.weight", sd[p + "norm2.weight"])
        E(b + "ln2.bias", sd[p + "norm2.bias"])
        E(b + "attn_qkv.weight", sd[p + "attn.qkv.weight"])
        E(b + "attn_qkv.bias", sd[p + "attn.qkv.bias"])
        E(b + "attn_out.weight", sd[p + "attn.proj.weight"])
        E(b + "attn_out.bias", sd[p + "attn.proj.bias"])
        E(b + "ffn_up.weight", sd[p + "mlp.fc1.weight"])
        E(b + "ffn_up.bias", sd[p + "mlp.fc1.bias"])
        E(b + "ffn_down.weight", sd[p + "mlp.fc2.weight"])
        E(b + "ffn_down.bias", sd[p + "mlp.fc2.bias"])
    E("v.merger_ln.weight", sd[pfx + "merger.ln_q.weight"])
    E("v.merger_ln.bias", sd[pfx + "merger.ln_q.bias"])
    E("mm.0.weight", sd[pfx + "merger.mlp.0.weight"])
    E("mm.0.bias", sd[pfx + "merger.mlp.0.bias"])
    E("mm.2.weight", sd[pfx + "merger.mlp.2.weight"])
    E("mm.2.bias", sd[pfx + "merger.mlp.2.bias"])
    w.write(out_path)
    return out_path


def load_qwen2vl_mmproj(path: str):
    """-> (params pytree, Qwen2VLVisionConfig)."""
    from ..gguf.reader import read_gguf

    f = read_gguf(path)
    md = f.metadata
    assert md.get("clip.projector_type") == "qwen2vl_merger", "not a qwen2vl mmproj"

    def T(name):
        info = f.tensors[name]
        return jnp.asarray(
            np.asarray(info.data).view(np.float32).reshape(info.shape))

    depth = int(md["clip.vision.block_count"])
    cfg = Qwen2VLVisionConfig(
        embed_dim=int(md["clip.vision.embedding_length"]),
        n_layers=depth,
        n_heads=int(md["clip.vision.attention.head_count"]),
        patch_size=int(md["clip.vision.patch_size"]),
        temporal_patch_size=int(md.get("clip.vision.temporal_patch_size", 2)),
        spatial_merge_size=int(md.get("clip.vision.spatial_merge_size", 2)),
        out_hidden=int(md["clip.vision.projection_dim"]),
    )
    params = {
        "patch_embd": T("v.patch_embd.weight"),
        "merger_ln": T("v.merger_ln.weight"),
        "merger_ln_bias": T("v.merger_ln.bias"),
        "mm_0": T("mm.0.weight"), "mm_0_bias": T("mm.0.bias"),
        "mm_2": T("mm.2.weight"), "mm_2_bias": T("mm.2.bias"),
        "layers": [],
    }
    for i in range(depth):
        b = f"v.blk.{i}."
        params["layers"].append({
            "ln1": T(b + "ln1.weight"), "ln1_bias": T(b + "ln1.bias"),
            "ln2": T(b + "ln2.weight"), "ln2_bias": T(b + "ln2.bias"),
            "attn_qkv": T(b + "attn_qkv.weight"),
            "attn_qkv_bias": T(b + "attn_qkv.bias"),
            "attn_out": T(b + "attn_out.weight"),
            "attn_out_bias": T(b + "attn_out.bias"),
            "ffn_up": T(b + "ffn_up.weight"),
            "ffn_up_bias": T(b + "ffn_up.bias"),
            "ffn_down": T(b + "ffn_down.weight"),
            "ffn_down_bias": T(b + "ffn_down.bias"),
        })
    return params, cfg
