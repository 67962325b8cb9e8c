"""Qwen2-VL / Qwen2.5-VL vision towers (ViT + 2x2 patch merger).

TPU analog of the reference's qwen2vl-family clip graphs
(tools/mtmd/models/qwen2vl.cpp, PROJECTOR_TYPE_QWEN2VL "qwen2vl_merger" and
PROJECTOR_TYPE_QWEN25VL "qwen2.5vl_merger"): patch linear (folded Conv3d),
blocks with fused qkv + 2D rotary over (h, w) patch grids, and the 4-to-1
merger MLP projecting into the text embedding space. Qwen2.5-VL swaps the
LayerNorms for RMSNorm, the quick-gelu MLP for a SiLU-gated one, and runs
WINDOW attention: merge-unit cells are reordered window-major, every layer
except each n_wa_pattern-th attends only within its window
(qwen2vl.cpp:37-83), and the merger output is restored to raster order.
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
    # qwen2.5-vl (PROJECTOR_TYPE_QWEN25VL "qwen2.5vl_merger",
    # clip-impl.h:468): RMSNorm blocks, gated SiLU MLP, and window
    # attention — all layers except `fullatt_idx` attend only within
    # window_size x window_size pixel windows of reordered patches
    rms_norm: bool = False
    gated_mlp: bool = False
    window_size: int = 0
    fullatt_idx: tuple = ()
    # Qwen2VLImageProcessor normalization (OpenAI CLIP constants)
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)


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


def _norm(cfg, x, w, b):
    if cfg.rms_norm:
        xf = x.astype(jnp.float32)
        return xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, -1, keepdims=True) + cfg.eps) * w
    return _ln(x, w, b, cfg.eps)


def window_index(grid_thw, merge: int, window_size: int, patch_size: int):
    """Transcription of HF Qwen2_5_VisionTransformer.get_window_index:
    window-major reordering of merge-unit cells + per-window segment ids.
    Returns (index [S/merge^2], seg_ids [S] int32 window id per patch row,
    img_ids [S] int32 image id per patch row)."""
    vw = window_size // merge // patch_size
    idx_parts, seg_parts, img_parts = [], [], []
    base = 0
    seg_base = 0
    for im, (t, h, w) in enumerate(np.asarray(grid_thw)):
        lh, lw = h // merge, w // merge
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h, pad_w = (-lh) % vw, (-lw) % vw
        nh, nw = (lh + pad_h) // vw, (lw + pad_w) // vw
        ip = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        ip[:, :lh, :lw] = index
        ip = ip.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
        ip = ip.reshape(t * nh * nw, vw * vw)
        valid = ip != -100
        flat = ip.reshape(-1)
        keep = flat[flat != -100]
        idx_parts.append(keep + base)
        # window id per kept merge-cell, expanded to patch rows later
        wid = np.repeat(np.arange(ip.shape[0]) + seg_base, valid.sum(1))
        seg_parts.append(wid)
        img_parts.append(np.full(len(keep), im, np.int64))
        base += t * lh * lw
        seg_base += ip.shape[0]
    index = np.concatenate(idx_parts)
    m2 = merge * merge
    seg = np.repeat(np.concatenate(seg_parts), m2)
    img = np.repeat(np.concatenate(img_parts), m2)
    return index, seg.astype(np.int32), img.astype(np.int32)


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
    m2 = cfg.spatial_merge_size ** 2

    # qwen2.5-vl: reorder merge-unit cells window-major; window layers
    # attend within their window segment, full layers within their image
    masks = None
    rev = None
    if cfg.window_size:
        widx, seg, img = window_index(
            np.asarray(grid_thw), cfg.spatial_merge_size, cfg.window_size,
            cfg.patch_size)
        rowp = (widx[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
        x = x[rowp]
        ids = ids[rowp]
        full = jnp.asarray(img[:, None] == img[None, :])
        win = jnp.asarray(seg[:, None] == seg[None, :])
        masks = {True: full, False: win}
        rev = np.argsort(widx, kind="stable")

    invf = 1.0 / (cfg.theta ** (np.arange(0, hd // 2, 2) / (hd // 2)))
    ang = np.concatenate(
        [ids[:, :1] * invf[None], ids[:, 1:] * invf[None]], axis=-1)
    cos = jnp.asarray(np.cos(ang), jnp.float32)[:, None, :]  # [S, 1, hd/2]
    sin = jnp.asarray(np.sin(ang), jnp.float32)[:, None, :]

    def rope2d(v):  # [S, H, hd]
        v0, v1 = v[..., : hd // 2], v[..., hd // 2 :]
        return jnp.concatenate([v0 * cos - v1 * sin, v0 * sin + v1 * cos],
                               axis=-1)

    for il, lw in enumerate(params["layers"]):
        h = _norm(cfg, x, lw["ln1"], lw.get("ln1_bias"))
        qkv = h @ lw["attn_qkv"].T + lw["attn_qkv_bias"]
        q, k, v = jnp.split(qkv.reshape(S, 3, H, hd), 3, axis=1)
        q = rope2d(q[:, 0])
        k = rope2d(k[:, 0])
        v = v[:, 0]
        scores = jnp.einsum("shd,thd->hst", q, k) / hd ** 0.5
        if masks is not None:
            m = masks[il in cfg.fullatt_idx]
            scores = jnp.where(m[None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", p, v).reshape(S, E)
        x = x + (attn @ lw["attn_out"].T + lw["attn_out_bias"])
        h = _norm(cfg, x, lw["ln2"], lw.get("ln2_bias"))
        if cfg.gated_mlp:  # qwen2.5-vl SiLU-gated MLP
            up = jax.nn.silu(h @ lw["ffn_gate"].T + lw["ffn_gate_bias"]) * (
                h @ lw["ffn_up"].T + lw["ffn_up_bias"])
        else:
            up = h @ lw["ffn_up"].T + lw["ffn_up_bias"]
            up = up * jax.nn.sigmoid(1.702 * up)  # quick_gelu
        x = x + (up @ lw["ffn_down"].T + lw["ffn_down_bias"])

    # merger: norm then fold merge^2 consecutive rows, 2-layer MLP
    h = _norm(cfg, x, params["merger_ln"], params.get("merger_ln_bias"))
    h = h.reshape(S // m2, m2 * E)
    h = h @ params["mm_0"].T + params["mm_0_bias"]
    h = jax.nn.gelu(h, approximate=False)
    out = h @ params["mm_2"].T + params["mm_2_bias"]  # [S/m2, out]
    if rev is not None:  # undo the window-major cell reordering
        out = out[rev]
    return out


# ---------------------------------------------------------------------------
# qwen3vl (deepstack) vision tower — tools/mtmd/models/qwen3vl.cpp
# ---------------------------------------------------------------------------


@dataclass
class Qwen3VLVisionConfig:
    embed_dim: int = 1152
    n_layers: int = 27
    n_heads: int = 16
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden: int = 3584
    n_pos_embd: int = 2304  # learned table, bilinearly resized per grid
    deepstack_idx: tuple = (8, 16, 24)
    eps: float = 1e-6
    theta: float = 10000.0
    image_mean: tuple = (0.5, 0.5, 0.5)
    image_std: tuple = (0.5, 0.5, 0.5)


def _interp_pos_embd(table: np.ndarray, grid_thw, merge: int) -> np.ndarray:
    """Bilinear interpolation of the learned [side*side, E] position table
    onto each grid, emitted in merge-window row order (HF
    fast_pos_embed_interpolate transcription)."""
    side = int(len(table) ** 0.5)
    outs = []
    for t, h, w in np.asarray(grid_thw):
        hi = np.linspace(0, side - 1, h)
        wi = np.linspace(0, side - 1, w)
        hf_, wf = hi.astype(np.int32), wi.astype(np.int32)
        hc = np.minimum(hf_ + 1, side - 1)
        wc = np.minimum(wf + 1, side - 1)
        dh, dw = (hi - hf_)[:, None, None], (wi - wf)[None, :, None]
        pe = (table[hf_[:, None] * side + wf[None, :]] * (1 - dh) * (1 - dw)
              + table[hf_[:, None] * side + wc[None, :]] * (1 - dh) * dw
              + table[hc[:, None] * side + wf[None, :]] * dh * (1 - dw)
              + table[hc[:, None] * side + wc[None, :]] * dh * dw)
        pe = np.tile(pe.reshape(h * w, -1), (t, 1)).reshape(
            t, h // merge, merge, w // merge, merge, -1)
        outs.append(np.ascontiguousarray(
            pe.transpose(0, 1, 3, 2, 4, 5)).reshape(t * h * w, -1))
    return np.concatenate(outs, 0).astype(np.float32)


def qwen3vl_forward(params, cfg: Qwen3VLVisionConfig, patches: jnp.ndarray,
                    grid_thw):
    """patches [S, C*tp*ps*ps] (merge-window row order) ->
    (merged [S/m^2, out], deepstack features [S/m^2, out*n_ds]) — the
    reference concatenates deepstack taps along the feature dim
    (qwen3vl.cpp:152-160); LN blocks, biased fused qkv, 2D rope, gelu-tanh
    MLP, per-tap postshuffle-norm mergers."""
    E, H = cfg.embed_dim, cfg.n_heads
    hd = E // H
    S = patches.shape[0]
    m2 = cfg.spatial_merge_size ** 2

    x = patches.astype(jnp.float32) @ params["patch_embd"].T \
        + params["patch_embd_bias"]
    x = x + jnp.asarray(
        _interp_pos_embd(np.asarray(params["pos_embd"]), grid_thw,
                         cfg.spatial_merge_size))

    ids = rot_pos_ids(np.asarray(grid_thw), cfg.spatial_merge_size)
    invf = 1.0 / (cfg.theta ** (np.arange(0, hd // 2, 2) / (hd // 2)))
    ang = np.concatenate(
        [ids[:, :1] * invf[None], ids[:, 1:] * invf[None]], axis=-1)
    cos = jnp.asarray(np.cos(ang), jnp.float32)[:, None, :]
    sin = jnp.asarray(np.sin(ang), jnp.float32)[:, None, :]

    def rope2d(v):
        v0, v1 = v[..., : hd // 2], v[..., hd // 2:]
        return jnp.concatenate([v0 * cos - v1 * sin, v0 * sin + v1 * cos],
                               axis=-1)

    sizes = np.asarray(grid_thw)
    img = np.repeat(np.arange(len(sizes)),
                    sizes[:, 0] * sizes[:, 1] * sizes[:, 2])
    mask = jnp.asarray(img[:, None] == img[None, :])

    def merger(prefix, h, postshuffle):
        if postshuffle:  # deepstack taps: LN over the merged E*m^2 rows
            h = h.reshape(S // m2, m2 * E)
            h = _ln(h, params[prefix + "_norm"], params[prefix + "_norm_bias"],
                    cfg.eps)
        else:  # final merger: LN on E then fold (qwen3vl merger.norm)
            h = _ln(h, params[prefix + "_norm"], params[prefix + "_norm_bias"],
                    cfg.eps)
            h = h.reshape(S // m2, m2 * E)
        h = h @ params[prefix + "_fc1"].T + params[prefix + "_fc1_bias"]
        h = jax.nn.gelu(h, approximate=True)
        return h @ params[prefix + "_fc2"].T + params[prefix + "_fc2_bias"]

    deepstack = []
    for il, lw in enumerate(params["layers"]):
        h = _ln(x, lw["ln1"], lw.get("ln1_bias"), cfg.eps)
        qkv = h @ lw["attn_qkv"].T + lw["attn_qkv_bias"]
        q, k, v = jnp.split(qkv.reshape(S, 3, H, hd), 3, axis=1)
        q = rope2d(q[:, 0])
        k = rope2d(k[:, 0])
        v = v[:, 0]
        scores = jnp.einsum("shd,thd->hst", q, k) / hd ** 0.5
        scores = jnp.where(mask[None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", p, v).reshape(S, E)
        x = x + (attn @ lw["attn_out"].T + lw["attn_out_bias"])
        h = _ln(x, lw["ln2"], lw.get("ln2_bias"), cfg.eps)
        up = h @ lw["ffn_up"].T + lw["ffn_up_bias"]
        up = jax.nn.gelu(up, approximate=True)  # gelu_pytorch_tanh
        x = x + (up @ lw["ffn_down"].T + lw["ffn_down_bias"])
        if il in cfg.deepstack_idx:
            deepstack.append(merger(f"ds{il}", x, postshuffle=True))

    out = merger("mm", x, postshuffle=False)
    ds = jnp.concatenate(deepstack, axis=-1) if deepstack else None
    return out, ds


def convert_hf_qwen3vl_vision(model, out_path: str) -> str:
    """HF Qwen3VLForConditionalGeneration -> vision mmproj GGUF
    (projector "qwen3vl_merger"; deepstack tensors per clip-impl.h:150-152)."""
    from ..gguf.constants import GGMLType, Keys
    from ..gguf.writer import GGUFWriter

    vc = model.config.vision_config
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items() if "visual" in k}
    pfx = "model.visual." if any(k.startswith("model.visual.") for k in sd) \
        else "visual."

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "clip")
    w.add("clip.projector_type", "qwen3vl_merger")
    w.add("clip.vision.embedding_length", np.uint32(vc.hidden_size))
    w.add("clip.vision.block_count", np.uint32(vc.depth))
    w.add("clip.vision.attention.head_count", np.uint32(vc.num_heads))
    w.add("clip.vision.patch_size", np.uint32(vc.patch_size))
    w.add("clip.vision.temporal_patch_size", np.uint32(vc.temporal_patch_size))
    w.add("clip.vision.spatial_merge_size", np.uint32(vc.spatial_merge_size))
    w.add("clip.vision.num_position_embeddings",
          np.uint32(vc.num_position_embeddings))
    w.add("clip.vision.deepstack_visual_indexes",
          [np.uint32(i) for i in vc.deepstack_visual_indexes])
    w.add("clip.vision.projection_dim", np.uint32(vc.out_hidden_size))

    def E(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    pe = sd[pfx + "patch_embed.proj.weight"]
    E("v.patch_embd.weight", pe.reshape(pe.shape[0], -1))
    E("v.patch_embd.bias", sd[pfx + "patch_embed.proj.bias"])
    E("v.position_embd.weight", sd[pfx + "pos_embed.weight"])
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
        E(b + "ffn_up.weight", sd[p + "mlp.linear_fc1.weight"])
        E(b + "ffn_up.bias", sd[p + "mlp.linear_fc1.bias"])
        E(b + "ffn_down.weight", sd[p + "mlp.linear_fc2.weight"])
        E(b + "ffn_down.bias", sd[p + "mlp.linear_fc2.bias"])
    for j, il in enumerate(vc.deepstack_visual_indexes):
        dp = f"{pfx}deepstack_merger_list.{j}."
        E(f"v.deepstack.{il}.norm.weight", sd[dp + "norm.weight"])
        E(f"v.deepstack.{il}.norm.bias", sd[dp + "norm.bias"])
        E(f"v.deepstack.{il}.fc1.weight", sd[dp + "linear_fc1.weight"])
        E(f"v.deepstack.{il}.fc1.bias", sd[dp + "linear_fc1.bias"])
        E(f"v.deepstack.{il}.fc2.weight", sd[dp + "linear_fc2.weight"])
        E(f"v.deepstack.{il}.fc2.bias", sd[dp + "linear_fc2.bias"])
    E("v.merger_ln.weight", sd[pfx + "merger.norm.weight"])
    E("v.merger_ln.bias", sd[pfx + "merger.norm.bias"])
    E("mm.0.weight", sd[pfx + "merger.linear_fc1.weight"])
    E("mm.0.bias", sd[pfx + "merger.linear_fc1.bias"])
    E("mm.2.weight", sd[pfx + "merger.linear_fc2.weight"])
    E("mm.2.bias", sd[pfx + "merger.linear_fc2.bias"])
    w.write(out_path)
    return out_path


def load_qwen3vl_mmproj(path: str):
    """-> (params pytree, Qwen3VLVisionConfig)."""
    from ..gguf.reader import read_gguf

    f = read_gguf(path)
    md = f.metadata
    assert md.get("clip.projector_type") == "qwen3vl_merger", \
        "not a qwen3vl mmproj"

    def T(name):
        info = f.tensors[name]
        return jnp.asarray(
            np.asarray(info.data).view(np.float32).reshape(info.shape))

    depth = int(md["clip.vision.block_count"])
    ds_idx = tuple(int(i) for i in
                   md.get("clip.vision.deepstack_visual_indexes", ()))
    cfg = Qwen3VLVisionConfig(
        embed_dim=int(md["clip.vision.embedding_length"]),
        n_layers=depth,
        n_heads=int(md["clip.vision.attention.head_count"]),
        patch_size=int(md["clip.vision.patch_size"]),
        temporal_patch_size=int(md.get("clip.vision.temporal_patch_size", 2)),
        spatial_merge_size=int(md.get("clip.vision.spatial_merge_size", 2)),
        out_hidden=int(md["clip.vision.projection_dim"]),
        n_pos_embd=int(md.get("clip.vision.num_position_embeddings", 2304)),
        deepstack_idx=ds_idx,
    )
    params = {
        "patch_embd": T("v.patch_embd.weight"),
        "patch_embd_bias": T("v.patch_embd.bias"),
        "pos_embd": T("v.position_embd.weight"),
        "mm_norm": T("v.merger_ln.weight"),
        "mm_norm_bias": T("v.merger_ln.bias"),
        "mm_fc1": T("mm.0.weight"), "mm_fc1_bias": T("mm.0.bias"),
        "mm_fc2": T("mm.2.weight"), "mm_fc2_bias": T("mm.2.bias"),
        "layers": [],
    }
    for il in ds_idx:
        b = f"v.deepstack.{il}."
        params[f"ds{il}_norm"] = T(b + "norm.weight")
        params[f"ds{il}_norm_bias"] = T(b + "norm.bias")
        params[f"ds{il}_fc1"] = T(b + "fc1.weight")
        params[f"ds{il}_fc1_bias"] = T(b + "fc1.bias")
        params[f"ds{il}_fc2"] = T(b + "fc2.weight")
        params[f"ds{il}_fc2_bias"] = T(b + "fc2.bias")
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


def convert_hf_qwen25vl_vision(model, out_path: str) -> str:
    """HF Qwen2_5_VLForConditionalGeneration -> vision mmproj GGUF
    (projector "qwen2.5vl_merger", clip-impl.h:468: RMSNorm blocks, gated
    SiLU MLP, window attention with full-attention block indexes)."""
    from ..gguf.constants import GGMLType, Keys
    from ..gguf.writer import GGUFWriter

    vc = model.config.vision_config
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items() if "visual" in k}
    pfx = "model.visual." if any(k.startswith("model.visual.") for k in sd) \
        else "visual."

    w = GGUFWriter()
    w.add(Keys.General.ARCHITECTURE, "clip")
    w.add("clip.projector_type", "qwen2.5vl_merger")
    w.add("clip.vision.embedding_length", np.uint32(vc.hidden_size))
    w.add("clip.vision.block_count", np.uint32(vc.depth))
    w.add("clip.vision.attention.head_count", np.uint32(vc.num_heads))
    w.add("clip.vision.patch_size", np.uint32(vc.patch_size))
    w.add("clip.vision.temporal_patch_size", np.uint32(vc.temporal_patch_size))
    w.add("clip.vision.spatial_merge_size", np.uint32(vc.spatial_merge_size))
    # reference keys (clip-impl.h:68,71): full attention every n_wa_pattern
    # layers ((il+1) % n == 0), window extent in pixels
    fa = list(vc.fullatt_block_indexes)
    pattern = fa[0] + 1 if fa else 0
    assert all((i + 1) % pattern == 0 for i in fa), fa
    w.add("clip.vision.n_wa_pattern", np.uint32(pattern))
    w.add("clip.vision.window_size", np.uint32(vc.window_size))
    w.add("clip.vision.projection_dim", np.uint32(vc.out_hidden_size))

    def E(name, arr):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    pe = sd[pfx + "patch_embed.proj.weight"]  # [E, C, tp, ps, ps]
    E("v.patch_embd.weight", pe.reshape(pe.shape[0], -1))
    for i in range(vc.depth):
        p, b = f"{pfx}blocks.{i}.", f"v.blk.{i}."
        E(b + "ln1.weight", sd[p + "norm1.weight"])
        E(b + "ln2.weight", sd[p + "norm2.weight"])
        E(b + "attn_qkv.weight", sd[p + "attn.qkv.weight"])
        E(b + "attn_qkv.bias", sd[p + "attn.qkv.bias"])
        E(b + "attn_out.weight", sd[p + "attn.proj.weight"])
        E(b + "attn_out.bias", sd[p + "attn.proj.bias"])
        E(b + "ffn_gate.weight", sd[p + "mlp.gate_proj.weight"])
        E(b + "ffn_gate.bias", sd[p + "mlp.gate_proj.bias"])
        E(b + "ffn_up.weight", sd[p + "mlp.up_proj.weight"])
        E(b + "ffn_up.bias", sd[p + "mlp.up_proj.bias"])
        E(b + "ffn_down.weight", sd[p + "mlp.down_proj.weight"])
        E(b + "ffn_down.bias", sd[p + "mlp.down_proj.bias"])
    E("v.merger_ln.weight", sd[pfx + "merger.ln_q.weight"])
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
    proj = md.get("clip.projector_type")
    assert proj in ("qwen2vl_merger", "qwen2.5vl_merger"), \
        "not a qwen2vl-family mmproj"

    def T(name):
        info = f.tensors[name]
        return jnp.asarray(
            np.asarray(info.data).view(np.float32).reshape(info.shape))

    depth = int(md["clip.vision.block_count"])
    q25 = proj == "qwen2.5vl_merger"
    pattern = int(md.get("clip.vision.n_wa_pattern", 0))
    fullatt = [il for il in range(depth)
               if pattern and (il + 1) % pattern == 0]
    cfg = Qwen2VLVisionConfig(
        embed_dim=int(md["clip.vision.embedding_length"]),
        n_layers=depth,
        n_heads=int(md["clip.vision.attention.head_count"]),
        patch_size=int(md["clip.vision.patch_size"]),
        temporal_patch_size=int(md.get("clip.vision.temporal_patch_size", 2)),
        spatial_merge_size=int(md.get("clip.vision.spatial_merge_size", 2)),
        out_hidden=int(md["clip.vision.projection_dim"]),
        rms_norm=q25,
        gated_mlp=q25,
        window_size=(int(md.get("clip.vision.window_size", 112))
                     if q25 else 0),
        fullatt_idx=tuple(fullatt),
    )

    def opt(name):
        return T(name) if name in f.tensors else None

    params = {
        "patch_embd": T("v.patch_embd.weight"),
        "merger_ln": T("v.merger_ln.weight"),
        "mm_0": T("mm.0.weight"), "mm_0_bias": T("mm.0.bias"),
        "mm_2": T("mm.2.weight"), "mm_2_bias": T("mm.2.bias"),
        "layers": [],
    }
    if "v.merger_ln.bias" in f.tensors:
        params["merger_ln_bias"] = T("v.merger_ln.bias")
    for i in range(depth):
        b = f"v.blk.{i}."
        lw = {
            "ln1": T(b + "ln1.weight"),
            "ln2": T(b + "ln2.weight"),
            "attn_qkv": T(b + "attn_qkv.weight"),
            "attn_qkv_bias": T(b + "attn_qkv.bias"),
            "attn_out": T(b + "attn_out.weight"),
            "attn_out_bias": T(b + "attn_out.bias"),
            "ffn_up": T(b + "ffn_up.weight"),
            "ffn_up_bias": T(b + "ffn_up.bias"),
            "ffn_down": T(b + "ffn_down.weight"),
            "ffn_down_bias": T(b + "ffn_down.bias"),
        }
        for tname, key in (("ln1.bias", "ln1_bias"), ("ln2.bias", "ln2_bias"),
                           ("ffn_gate.weight", "ffn_gate"),
                           ("ffn_gate.bias", "ffn_gate_bias")):
            v = opt(b + tname)
            if v is not None:
                lw[key] = v
        params["layers"].append(lw)
    return params, cfg
