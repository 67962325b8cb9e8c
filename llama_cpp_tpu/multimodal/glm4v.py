"""GLM-4V vision tower.

TPU analog of the reference's glm4v clip graph
(tools/mtmd/models/glm4v.cpp, PROJECTOR_TYPE_GLM4V): conv3d patch embed +
post-conv RMSNorm, learned position embeddings sampled with BICUBIC
grid_sample at the patch coordinates (HF Glm4vVisionEmbeddings:
align_corners=False, border padding), RMS ViT blocks with fused qkv + 2D
rope + SiLU-gated MLP, post-RMSNorm, a spatial-merge DOWNSAMPLE conv
(glm4v.cpp:86-99), then the GLM projector: fc -> LayerNorm -> GELU ->
gated FFN (glm4v.cpp:101-117).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .qwen2vl import rot_pos_ids


@dataclass
class Glm4vVisionConfig:
    embed_dim: int = 1536
    n_layers: int = 24
    n_heads: int = 12
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden: int = 4096
    eps: float = 1e-5
    theta: float = 10000.0
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w


def _cubic_weights(t: np.ndarray, A: float = -0.75):
    """Cubic-convolution weights for offsets [-1, 0, 1, 2] (the kernel
    torch uses for bicubic grid_sample)."""
    w0 = A * (t + 1) ** 3 - 5 * A * (t + 1) ** 2 + 8 * A * (t + 1) - 4 * A
    w1 = (A + 2) * t ** 3 - (A + 3) * t ** 2 + 1
    tt = 1 - t
    w2 = (A + 2) * tt ** 3 - (A + 3) * tt ** 2 + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)  # [..., 4]


def _grid_sample_bicubic(table2d: np.ndarray, gx: np.ndarray,
                         gy: np.ndarray) -> np.ndarray:
    """torch.F.grid_sample(mode=bicubic, align_corners=False,
    padding_mode=border) transcription. table2d [H, W, C]; gx/gy in
    [-1, 1]; returns [N, C]."""
    H, W, _ = table2d.shape
    x = ((gx + 1) * W - 1) / 2.0
    y = ((gy + 1) * H - 1) / 2.0
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    wx = _cubic_weights((x - x0).astype(np.float64))  # [N, 4]
    wy = _cubic_weights((y - y0).astype(np.float64))
    out = 0.0
    for j in range(4):
        row = np.clip(y0 + j - 1, 0, H - 1)
        acc = 0.0
        for i in range(4):
            col = np.clip(x0 + i - 1, 0, W - 1)
            acc = acc + wx[:, i, None] * table2d[row, col]
        out = out + wy[:, j, None] * acc
    return out


def vit_forward(params, cfg: Glm4vVisionConfig, patches: jnp.ndarray,
                grid_thw) -> jnp.ndarray:
    """patches [S, C*tp*ps*ps] (merge-window row order) -> [S/m^2, out]."""
    E, H = cfg.embed_dim, cfg.n_heads
    hd = E // H
    S = patches.shape[0]
    m = cfg.spatial_merge_size

    x = patches.astype(jnp.float32) @ params["patch_embd"].T
    if "patch_embd_bias" in params:
        x = x + params["patch_embd_bias"]
    x = _rms(x, params["post_conv_norm"], cfg.eps)

    # learned pos embd: bicubic grid_sample of the [side, side, E] table at
    # each patch's (h+0.5)/grid_h-normalized coordinate
    ids = rot_pos_ids(np.asarray(grid_thw), m)  # [S, 2] merge-window order
    sizes = np.asarray(grid_thw)
    th = np.repeat(sizes[:, 1], sizes[:, 0] * sizes[:, 1] * sizes[:, 2])
    tw = np.repeat(sizes[:, 2], sizes[:, 0] * sizes[:, 1] * sizes[:, 2])
    gy = ((ids[:, 0] + 0.5) / th) * 2 - 1
    gx = ((ids[:, 1] + 0.5) / tw) * 2 - 1
    table = np.asarray(params["pos_embd"], np.float32)
    side = int(len(table) ** 0.5)
    pe = _grid_sample_bicubic(table.reshape(side, side, E), gx, gy)
    x = x + jnp.asarray(pe.astype(np.float32))

    invf = 1.0 / (cfg.theta ** (np.arange(0, hd // 2, 2) / (hd // 2)))
    ang = np.concatenate(
        [ids[:, :1] * invf[None], ids[:, 1:] * invf[None]], axis=-1)
    cos = jnp.asarray(np.cos(ang), jnp.float32)[:, None, :]
    sin = jnp.asarray(np.sin(ang), jnp.float32)[:, None, :]

    def rope2d(v):
        v0, v1 = v[..., : hd // 2], v[..., hd // 2:]
        return jnp.concatenate([v0 * cos - v1 * sin, v0 * sin + v1 * cos],
                               axis=-1)

    img = np.repeat(np.arange(len(sizes)),
                    sizes[:, 0] * sizes[:, 1] * sizes[:, 2])
    mask = jnp.asarray(img[:, None] == img[None, :])

    for lw in params["layers"]:
        h = _rms(x, lw["ln1"], cfg.eps)
        qkv = h @ lw["attn_qkv"].T
        if "attn_qkv_bias" in lw:
            qkv = qkv + lw["attn_qkv_bias"]
        q, k, v = jnp.split(qkv.reshape(S, 3, H, hd), 3, axis=1)
        q = rope2d(q[:, 0])
        k = rope2d(k[:, 0])
        v = v[:, 0]
        scores = jnp.einsum("shd,thd->hst", q, k) / hd ** 0.5
        scores = jnp.where(mask[None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", p, v).reshape(S, E)
        x = x + attn @ lw["attn_out"].T
        h = _rms(x, lw["ln2"], cfg.eps)
        up = jax.nn.silu(h @ lw["ffn_gate"].T) * (h @ lw["ffn_up"].T)
        x = x + up @ lw["ffn_down"].T

    x = _rms(x, params["post_norm"], cfg.eps)

    # spatial-merge downsample conv: rows are merge-window ordered, so each
    # consecutive m^2 block is one output cell; conv weight [out, E, m, m]
    cell = x.reshape(-1, m * m, E)  # [cells, m*m, E] rows raster within cell
    cell = cell.reshape(-1, m, m, E).transpose(0, 3, 1, 2).reshape(
        -1, E * m * m)
    x = cell @ params["downsample"].T + params["downsample_bias"]

    # GLM projector (glm4v.cpp:101-117): fc -> LN -> gelu_erf -> gated FFN
    x = x @ params["mm_fc"].T
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    x = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * params["mm_post_norm"] \
        + params.get("mm_post_norm_bias", 0.0)
    x = jax.nn.gelu(x, approximate=False)
    up = jax.nn.silu(x @ params["mm_gate"].T) * (x @ params["mm_up"].T)
    return up @ params["mm_down"].T


# ---------------------------------------------------------------------------
# conversion + loading
# ---------------------------------------------------------------------------


def convert_hf_glm4v_vision(model, out_path: str) -> str:
    """HF Glm4vForConditionalGeneration -> mmproj GGUF (projector "glm4v";
    mm tensor names per clip-impl.h:130-143 / clip.cpp GLM4V loader)."""
    from ..gguf.constants import GGMLType, Keys
    from ..gguf.writer import GGUFWriter

    vc = model.config.vision_config
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items() if "visual" in k}
    pfx = "model.visual." if any(k.startswith("model.visual.") for k in sd) \
        else "visual."

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "clip")
    w.add("clip.projector_type", "glm4v")
    w.add("clip.vision.embedding_length", np.uint32(vc.hidden_size))
    w.add("clip.vision.block_count", np.uint32(vc.depth))
    w.add("clip.vision.attention.head_count", np.uint32(vc.num_heads))
    w.add("clip.vision.patch_size", np.uint32(vc.patch_size))
    w.add("clip.vision.temporal_patch_size", np.uint32(vc.temporal_patch_size))
    w.add("clip.vision.spatial_merge_size", np.uint32(vc.spatial_merge_size))
    w.add("clip.vision.attention.layer_norm_epsilon", float(vc.rms_norm_eps))
    w.add("clip.vision.projection_dim", np.uint32(vc.out_hidden_size))

    def E(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    pe = sd[pfx + "patch_embed.proj.weight"]
    E("v.patch_embd.weight", pe.reshape(pe.shape[0], -1))
    if pfx + "patch_embed.proj.bias" in sd:
        E("v.patch_embd.bias", sd[pfx + "patch_embed.proj.bias"])
    E("v.patch_norm.weight", sd[pfx + "post_conv_layernorm.weight"])
    E("v.position_embd.weight",
      sd[pfx + "embeddings.position_embedding.weight"])
    E("v.post_ln.weight", sd[pfx + "post_layernorm.weight"])
    ds = sd[pfx + "downsample.weight"]  # [out, E, m, m]
    E("mm.patch_merger.weight", ds.reshape(ds.shape[0], -1))
    E("mm.patch_merger.bias", sd[pfx + "downsample.bias"])
    for i in range(vc.depth):
        p, b = f"{pfx}blocks.{i}.", f"v.blk.{i}."
        E(b + "ln1.weight", sd[p + "norm1.weight"])
        E(b + "ln2.weight", sd[p + "norm2.weight"])
        E(b + "attn_qkv.weight", sd[p + "attn.qkv.weight"])
        if p + "attn.qkv.bias" in sd:
            E(b + "attn_qkv.bias", sd[p + "attn.qkv.bias"])
        E(b + "attn_out.weight", sd[p + "attn.proj.weight"])
        E(b + "ffn_gate.weight", sd[p + "mlp.gate_proj.weight"])
        E(b + "ffn_up.weight", sd[p + "mlp.up_proj.weight"])
        E(b + "ffn_down.weight", sd[p + "mlp.down_proj.weight"])
    E("mm.model.fc.weight", sd[pfx + "merger.proj.weight"])
    E("mm.post_norm.weight", sd[pfx + "merger.post_projection_norm.weight"])
    E("mm.post_norm.bias", sd[pfx + "merger.post_projection_norm.bias"])
    E("mm.gate.weight", sd[pfx + "merger.gate_proj.weight"])
    E("mm.up.weight", sd[pfx + "merger.up_proj.weight"])
    E("mm.down.weight", sd[pfx + "merger.down_proj.weight"])
    w.write(out_path)
    return out_path


def load_glm4v_mmproj(path: str):
    """-> (params pytree, Glm4vVisionConfig)."""
    from ..gguf.reader import read_gguf

    f = read_gguf(path)
    md = f.metadata
    assert md.get("clip.projector_type") == "glm4v", "not a glm4v mmproj"

    def T(name):
        info = f.tensors[name]
        return jnp.asarray(
            np.asarray(info.data).view(np.float32).reshape(info.shape))

    depth = int(md["clip.vision.block_count"])
    cfg = Glm4vVisionConfig(
        embed_dim=int(md["clip.vision.embedding_length"]),
        n_layers=depth,
        n_heads=int(md["clip.vision.attention.head_count"]),
        patch_size=int(md["clip.vision.patch_size"]),
        temporal_patch_size=int(md.get("clip.vision.temporal_patch_size", 2)),
        spatial_merge_size=int(md.get("clip.vision.spatial_merge_size", 2)),
        out_hidden=int(md["clip.vision.projection_dim"]),
        eps=float(md.get("clip.vision.attention.layer_norm_epsilon", 1e-5)),
    )
    params = {
        "patch_embd": T("v.patch_embd.weight"),
        "post_conv_norm": T("v.patch_norm.weight"),
        "pos_embd": T("v.position_embd.weight"),
        "post_norm": T("v.post_ln.weight"),
        "downsample": T("mm.patch_merger.weight"),
        "downsample_bias": T("mm.patch_merger.bias"),
        "mm_fc": T("mm.model.fc.weight"),
        "mm_post_norm": T("mm.post_norm.weight"),
        "mm_post_norm_bias": T("mm.post_norm.bias"),
        "mm_gate": T("mm.gate.weight"),
        "mm_up": T("mm.up.weight"),
        "mm_down": T("mm.down.weight"),
        "layers": [],
    }
    if "v.patch_embd.bias" in f.tensors:
        params["patch_embd_bias"] = T("v.patch_embd.bias")
    for i in range(depth):
        b = f"v.blk.{i}."
        lw = {
            "ln1": T(b + "ln1.weight"),
            "ln2": T(b + "ln2.weight"),
            "attn_qkv": T(b + "attn_qkv.weight"),
            "attn_out": T(b + "attn_out.weight"),
            "ffn_gate": T(b + "ffn_gate.weight"),
            "ffn_up": T(b + "ffn_up.weight"),
            "ffn_down": T(b + "ffn_down.weight"),
        }
        if b + "attn_qkv.bias" in f.tensors:
            lw["attn_qkv_bias"] = T(b + "attn_qkv.bias")
        params["layers"].append(lw)
    return params, cfg
