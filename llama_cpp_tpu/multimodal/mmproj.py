"""mmproj GGUF files: vision encoder + projector weights.

Format parity with the reference (tools/mtmd/clip-impl.h tensor names,
clip.vision.* metadata keys), so mmproj files are interchangeable."""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import read_gguf
from ..gguf.writer import GGUFWriter
from ..quant.dequant import dequantize_tensor
from .clip import VisionConfig

_LAYER_MAP = {
    "attn_q.weight": "attn_q", "attn_q.bias": "attn_q_bias",
    "attn_k.weight": "attn_k", "attn_k.bias": "attn_k_bias",
    "attn_v.weight": "attn_v", "attn_v.bias": "attn_v_bias",
    "attn_out.weight": "attn_out", "attn_out.bias": "attn_out_bias",
    "ln1.weight": "ln1", "ln1.bias": "ln1_bias",
    "ln2.weight": "ln2", "ln2.bias": "ln2_bias",
    "ffn_up.weight": "ffn_up", "ffn_up.bias": "ffn_up_bias",
    "ffn_down.weight": "ffn_down", "ffn_down.bias": "ffn_down_bias",
}

_GLOBAL_MAP = {
    "v.class_embd": "class_embd",
    "v.patch_embd.weight": "patch_embd",
    "v.patch_embd.bias": "patch_bias",
    "v.position_embd.weight": "position_embd",
    "v.pre_ln.weight": "pre_ln",
    "v.pre_ln.bias": "pre_ln_bias",
    "v.post_ln.weight": "post_ln",
    "v.post_ln.bias": "post_ln_bias",
    "mm.0.weight": "mm_0",
    "mm.0.bias": "mm_0_bias",
    "mm.1.weight": "mm_1",  # internvl / mlp_norm stacks
    "mm.1.bias": "mm_1_bias",
    "mm.2.weight": "mm_2",
    "mm.2.bias": "mm_2_bias",
    "mm.3.weight": "mm_3",
    "mm.3.bias": "mm_3_bias",
    "mm.4.weight": "mm_4",
    "mm.4.bias": "mm_4_bias",
    # gemma3 (clip-impl.h:141-142) / idefics3 (:143)
    "mm.input_projection.weight": "mm_input_proj",
    "mm.soft_emb_norm.weight": "mm_soft_emb_norm",
    "mm.model.fc.weight": "mm_fc",
    # lfm2 optional input norm (clip-impl.h:139-140)
    "mm.input_norm.weight": "mm_input_norm",
    "mm.input_norm.bias": "mm_input_norm_bias",
}


def convert_hf_vision_to_mmproj(
    vision_model,  # transformers CLIPVisionModel (.vision_model)
    projector,  # llava multi_modal_projector (linear_1, linear_2) or None
    out_path: str,
    n_embd_out: int,
    feature_layer: int = -2,
) -> str:
    vm = getattr(vision_model, "vision_model", vision_model)
    vcfg = vm.config
    w = GGUFWriter()
    w.add("general.architecture", "clip")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.projector_type", "mlp")
    P = "clip.vision."
    w.add(P + "image_size", np.uint32(vcfg.image_size))
    w.add(P + "patch_size", np.uint32(vcfg.patch_size))
    w.add(P + "embedding_length", np.uint32(vcfg.hidden_size))
    w.add(P + "feed_forward_length", np.uint32(vcfg.intermediate_size))
    w.add(P + "block_count", np.uint32(vcfg.num_hidden_layers))
    w.add(P + "attention.head_count", np.uint32(vcfg.num_attention_heads))
    w.add(P + "attention.layer_norm_epsilon", float(vcfg.layer_norm_eps))
    w.add(P + "projection_dim", np.uint32(n_embd_out))
    w.add(P + "feature_layer", np.int32(feature_layer))
    w.add(P + "image_mean", [0.48145466, 0.4578275, 0.40821073])
    w.add(P + "image_std", [0.26862954, 0.26130258, 0.27577711])

    sd = {k: v.detach().cpu().float().numpy() for k, v in vm.state_dict().items()}

    def E(name, arr):
        arr = np.ascontiguousarray(arr, np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)), GGMLType.F32)

    E("v.class_embd", sd["embeddings.class_embedding"])
    E("v.patch_embd.weight", sd["embeddings.patch_embedding.weight"])
    if "embeddings.patch_embedding.bias" in sd:
        E("v.patch_embd.bias", sd["embeddings.patch_embedding.bias"])
    E("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    E("v.pre_ln.weight", sd["pre_layrnorm.weight"])
    E("v.pre_ln.bias", sd["pre_layrnorm.bias"])
    E("v.post_ln.weight", sd["post_layernorm.weight"])
    E("v.post_ln.bias", sd["post_layernorm.bias"])
    for i in range(vcfg.num_hidden_layers):
        p, b = f"encoder.layers.{i}.", f"v.blk.{i}."
        for hf, gg in (("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
                       ("self_attn.v_proj", "attn_v"), ("self_attn.out_proj", "attn_out"),
                       ("layer_norm1", "ln1"), ("layer_norm2", "ln2"),
                       ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down")):
            E(b + gg + ".weight", sd[p + hf + ".weight"])
            if p + hf + ".bias" in sd:
                E(b + gg + ".bias", sd[p + hf + ".bias"])
    if projector is not None:
        psd = {k: v.detach().cpu().float().numpy()
               for k, v in projector.state_dict().items()}
        E("mm.0.weight", psd["linear_1.weight"])
        E("mm.0.bias", psd["linear_1.bias"])
        E("mm.2.weight", psd["linear_2.weight"])
        E("mm.2.bias", psd["linear_2.bias"])
    w.write(out_path)
    return out_path


def load_mmproj(path: str):
    """-> (VisionConfig, params pytree) from a reference-layout mmproj GGUF."""
    import jax.numpy as jnp

    f = read_gguf(path)
    md = f.metadata
    P = "clip.vision."
    cfg = VisionConfig(
        image_size=int(md.get(P + "image_size", 336)),
        patch_size=int(md.get(P + "patch_size", 14)),
        n_embd=int(md.get(P + "embedding_length", 1024)),
        n_ff=int(md.get(P + "feed_forward_length", 4096)),
        n_layers=int(md.get(P + "block_count", 24)),
        n_heads=int(md.get(P + "attention.head_count", 16)),
        eps=float(md.get(P + "attention.layer_norm_epsilon", 1e-5)),
        n_embd_out=int(md.get(P + "projection_dim", 4096)),
        feature_layer=int(md.get(P + "feature_layer", -2)),
        projector=str(md.get("clip.projector_type", "mlp")),
    )
    if md.get(P + "image_mean") is not None:
        cfg.image_mean = tuple(float(x) for x in md[P + "image_mean"])
        cfg.image_std = tuple(float(x) for x in md[P + "image_std"])
    sf = md.get(P + "projector.scale_factor")  # clip-impl.h:60
    if sf is not None:
        cfg.extra["proj_scale_factor"] = int(sf)
    if cfg.projector in ("gemma3", "idefics3", "internvl", "lfm2",
                         "janus_pro"):
        # siglip towers: no CLS token (gemma3/idefics3); internvl keeps a
        # CLS it drops before the shuffle (internvl.cpp:6-23)
        cfg.use_cls = cfg.projector == "internvl"
        cfg.drop_cls = True
        cfg.feature_layer = int(md.get(P + "feature_layer", cfg.n_layers))
        cfg.act = "gelu_tanh"
    params = {"layers": [dict() for _ in range(cfg.n_layers)]}
    for name, info in f.tensors.items():
        arr = dequantize_tensor(np.asarray(info.data), info.dtype, info.shape)
        if name in _GLOBAL_MAP:
            params[_GLOBAL_MAP[name]] = jnp.asarray(arr, jnp.float32)
        elif name.startswith("v.blk."):
            parts = name.split(".", 3)
            il, suffix = int(parts[2]), parts[3]
            key = _LAYER_MAP.get(suffix)
            if key is not None and il < cfg.n_layers:
                params["layers"][il][key] = jnp.asarray(arr, jnp.float32)
    return cfg, params
