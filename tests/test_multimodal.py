"""Multimodal pipeline parity: tiny HF LLaVA (CLIP tower + llama LM) vs our
mmproj + embedding-splice decode (reference tools/mtmd analog)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_tpu.convert.hf_to_gguf import convert_hf_model
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.multimodal import MtmdModel, convert_hf_vision_to_mmproj
from llama_cpp_tpu.multimodal.mtmd import Chunk, prefill_chunks
from llama_cpp_tpu.runtime.context import Context


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    d = tmp_path_factory.mktemp("mm")
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=24,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=140, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=139, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_seq_length=4,
    )
    torch.manual_seed(33)
    hf = transformers.LlavaForConditionalGeneration(cfg).eval()

    lm_path = str(d / "lm.gguf")
    lang = (hf.model.language_model if hasattr(hf.model, "language_model")
            else hf.language_model)
    lm = transformers.LlamaForCausalLM(text_cfg)
    lm.model.load_state_dict(lang.state_dict())
    lm.lm_head.load_state_dict({"weight": hf.lm_head.weight})
    convert_hf_model(lm.eval(), lm_path, ftype="f32")
    mm_path = str(d / "mmproj.gguf")
    vt = hf.model.vision_tower if hasattr(hf.model, "vision_tower") else hf.vision_tower
    proj = (hf.model.multi_modal_projector
            if hasattr(hf.model, "multi_modal_projector")
            else hf.multi_modal_projector)
    convert_hf_vision_to_mmproj(vt, proj, mm_path,
                                n_embd_out=48, feature_layer=-2)
    return hf, cfg, lm_path, mm_path


def test_vision_tower_matches_hf(tiny_llava):
    hf, cfg, _, mm_path = tiny_llava
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    mtmd = MtmdModel(mm_path)
    ours = mtmd.encode_pixels(pixels)  # [1, 4, 48]

    with torch.no_grad():
        pv = torch.tensor(pixels.transpose(0, 3, 1, 2))
        ref = hf.get_image_features(
            pixel_values=pv, vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.reshape(1, -1, 48).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_llava_end_to_end_logits(tiny_llava):
    hf, cfg, lm_path, mm_path = tiny_llava
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    img_tok = cfg.image_token_index
    ids = [5, 9, img_tok, img_tok, img_tok, img_tok, 20, 31]

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
        ).logits[0].numpy()

    model = load_model(lm_path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    mtmd = MtmdModel(mm_path)
    img_embeds = mtmd.encode_pixels(pixels)[0]  # [4, 48]

    chunks = [
        Chunk("text", tokens=[5, 9]),
        Chunk("image", embeds=img_embeds),
        Chunk("text", tokens=[20, 31]),
    ]
    # collect logits for every position: prefill then compare the last row,
    # plus a full-sequence decode for all positions
    from llama_cpp_tpu.ops.qtensor import embed_lookup

    embeds = np.concatenate([
        np.asarray(embed_lookup(model.params["token_embd"],
                                jnp.asarray([5, 9]), dtype=jnp.float32)),
        img_embeds,
        np.asarray(embed_lookup(model.params["token_embd"],
                                jnp.asarray([20, 31]), dtype=jnp.float32)),
    ])
    last = ctx.prefill_embeds(embeds)
    np.testing.assert_allclose(last, ref[-1], rtol=3e-4, atol=3e-4)

    # greedy continuation must match HF generate
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
            max_new_tokens=5, do_sample=False,
        )[0].tolist()
    ours = [int(np.argmax(last))]
    for _ in range(4):
        lg = ctx.decode_one(ours[-1])
        ours.append(int(np.argmax(lg)))
    assert ours == gen[len(ids):]

    # prefill_chunks convenience wrapper produces the same logits
    ctx2 = Context(model, n_ctx=32, n_seqs=1, kv_dtype=jnp.float32)
    last2 = prefill_chunks(ctx2, mtmd, chunks)
    np.testing.assert_allclose(last2, last, rtol=1e-5, atol=1e-5)


def test_qwen2vl_vision_tower(tmp_path):
    """Qwen2-VL ViT + merger vs the HF visual forward (2D rotary,
    merge-window patch ordering, quick-gelu MLP)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLForConditionalGeneration)
    from llama_cpp_tpu.multimodal.qwen2vl import (
        convert_hf_qwen2vl_vision, load_qwen2vl_mmproj, vit_forward)

    vc = dict(depth=2, embed_dim=32, hidden_size=48, mlp_ratio=2,
              num_heads=4, patch_size=4, temporal_patch_size=2,
              spatial_merge_size=2, in_channels=3)
    cfg = Qwen2VLConfig(
        vocab_size=120, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vision_config=vc,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        pad_token_id=0,
    )
    torch.manual_seed(100)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "q2vl.mmproj.gguf")
    convert_hf_qwen2vl_vision(hf, path)

    grid = np.array([[1, 4, 4]])  # 16 patches -> 4 merged embeddings
    S = 16
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((S, 3 * 2 * 4 * 4)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.visual(torch.tensor(patches),
                              grid_thw=torch.tensor(grid)).numpy()
    params, vcfg = load_qwen2vl_mmproj(path)
    ours = np.asarray(vit_forward(params, vcfg, jnp.asarray(patches), grid))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_qwen25vl_vision_tower(tmp_path):
    """Qwen2.5-VL ViT vs the HF visual forward: RMSNorm blocks, SiLU-gated
    MLP, and WINDOW attention (window-major cell reorder + per-window
    masks on non-full layers, raster order restored after the merger)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration)
    from llama_cpp_tpu.multimodal.qwen2vl import (
        convert_hf_qwen25vl_vision, load_qwen2vl_mmproj, vit_forward)

    vc = dict(depth=4, hidden_size=32, out_hidden_size=48,
              intermediate_size=64, num_heads=4, patch_size=4,
              temporal_patch_size=2, spatial_merge_size=2, in_channels=3,
              window_size=16, fullatt_block_indexes=[1, 3])
    cfg = Qwen2_5_VLConfig(
        vocab_size=120, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vision_config=vc,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        pad_token_id=0,
    )
    torch.manual_seed(7)
    hf = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "q25vl.mmproj.gguf")
    convert_hf_qwen25vl_vision(hf, path)

    # 8x8 patch grid -> 4x4 merge cells -> 2x2 windows of 2x2 cells:
    # exercises the window reorder, per-window masks AND full-attn layers
    grid = np.array([[1, 8, 8]])
    S = 64
    rng = np.random.default_rng(5)
    patches = rng.standard_normal((S, 3 * 2 * 4 * 4)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.visual(torch.tensor(patches),
                              grid_thw=torch.tensor(grid)).numpy()
    params, vcfg = load_qwen2vl_mmproj(path)
    assert vcfg.window_size == 16 and vcfg.fullatt_idx == (1, 3)
    ours = np.asarray(vit_forward(params, vcfg, jnp.asarray(patches), grid))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_pixtral_mistral3_vision(tmp_path):
    """Pixtral tower + Mistral-3.1 patch merger + GELU projector vs HF
    get_image_features: per-axis 2D rope (even/odd frequency slots),
    RMSNorm pre-LN ViT, block-diagonal multi-image attention, k x k unfold
    merger (reference tools/mtmd/models/pixtral.cpp)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration
    from transformers.models.pixtral import PixtralVisionConfig
    from llama_cpp_tpu.multimodal.pixtral import (
        convert_hf_pixtral_vision, extract_patches, load_pixtral_mmproj,
        vit_forward)

    vc = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, head_dim=8, patch_size=4, image_size=64,
        hidden_act="silu")
    cfg = Mistral3Config(
        vision_config=vc,
        text_config=dict(vocab_size=120, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2),
        spatial_merge_size=2, vision_feature_layer=-1,
        image_token_index=10, multimodal_projector_bias=False,
    )
    torch.manual_seed(3)
    hf = Mistral3ForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "pixtral.mmproj.gguf")
    convert_hf_pixtral_vision(hf, path)

    rng = np.random.default_rng(4)
    pixels = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    sizes = torch.tensor([[16, 16], [16, 16]])
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pixels), sizes)
        if isinstance(ref, (tuple, list)):  # per-image feature chunks
            ref = torch.cat(list(ref), dim=0)
        ref = ref.numpy()

    params, pcfg = load_pixtral_mmproj(path)
    assert pcfg.n_merge == 2 and pcfg.act == "silu"
    patches = np.concatenate([extract_patches(p, 4) for p in pixels])
    ours = np.asarray(vit_forward(params, pcfg, jnp.asarray(patches),
                                  [(4, 4), (4, 4)]))
    np.testing.assert_allclose(ours, ref.reshape(-1, ref.shape[-1]),
                               rtol=1e-3, atol=1e-3)


def test_mtmd_pixtral_cli_splice(tmp_path):
    """MtmdModel dispatches on clip.projector_type: a pixtral mmproj loads
    through the pixtral tower and splices into a text model via
    prefill_chunks (linear positions are correct for this family)."""
    import numpy as np
    import torch
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration
    from transformers.models.pixtral import PixtralVisionConfig
    from llama_cpp_tpu.multimodal.mtmd import (MtmdModel, prefill_chunks,
                                               tokenize_chunks)
    from llama_cpp_tpu.multimodal.pixtral import convert_hf_pixtral_vision
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    vc = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, head_dim=8, patch_size=4, image_size=32,
        hidden_act="silu")
    cfg = Mistral3Config(
        vision_config=vc,
        text_config=dict(vocab_size=120, hidden_size=64,
                         intermediate_size=96, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2),
        spatial_merge_size=2, vision_feature_layer=-1,
        image_token_index=10, multimodal_projector_bias=False,
    )
    torch.manual_seed(3)
    hf = Mistral3ForConditionalGeneration(cfg).eval()
    mp = str(tmp_path / "pix.mmproj.gguf")
    convert_hf_pixtral_vision(hf, mp)

    lm = str(tmp_path / "lm.gguf")
    make_tiny_llama_gguf(lm, vocab_size=128, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    model = load_model(lm, prefer_quant=False)
    ctx = Context(model, n_ctx=128, n_seqs=1)

    mtmd = MtmdModel(mp)
    assert mtmd.proj == "pixtral"
    img = (np.random.default_rng(0).integers(
        0, 255, (24, 24, 3)).astype(np.uint8))
    emb = mtmd.encode(img)
    assert emb.shape[-1] == 64 and np.isfinite(emb).all()
    chunks = tokenize_chunks(model.tokenizer, "hi <__media__> there", [emb])
    logits = prefill_chunks(ctx, mtmd, chunks)
    assert np.isfinite(np.asarray(logits)).all()


def test_llama4_vision_tower(tmp_path):
    """Llama-4 vision tower vs HF Llama4VisionModel: unfold-conv patches,
    CLS appended last, learned pos embd, pre/post LN, interleaved-complex
    2D rope at (coord+1), pixel shuffle + double-GELU adapter (reference
    tools/mtmd/models/llama4.cpp)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import Llama4VisionModel
    from transformers.models.llama4 import Llama4VisionConfig
    from llama_cpp_tpu.multimodal.llama4 import (
        convert_hf_llama4_vision, load_llama4_mmproj, vit_forward)
    from llama_cpp_tpu.multimodal.pixtral import extract_patches

    vc = Llama4VisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, patch_size=4, image_size=16,
        pixel_shuffle_ratio=0.5, projector_input_dim=48,
        projector_output_dim=48, vision_output_dim=48)
    torch.manual_seed(9)
    hf = Llama4VisionModel(vc).eval()
    path = str(tmp_path / "l4.mmproj.gguf")
    convert_hf_llama4_vision(hf, path)

    rng = np.random.default_rng(6)
    pixels = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(pixels)).last_hidden_state[0].numpy()

    params, lcfg = load_llama4_mmproj(path)
    assert lcfg.pixel_shuffle_ratio == 0.5
    patches = extract_patches(pixels[0], 4)
    ours = np.asarray(vit_forward(params, lcfg, jnp.asarray(patches)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_qwen2vl_full_pipeline(tmp_path):
    """Full qwen2-vl image pipeline: vision tower embeddings spliced into the
    text stream with M-RoPE t/h/w positions must match the HF forward with
    pixel_values end to end."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLForConditionalGeneration)
    from llama_cpp_tpu.convert.hf_to_gguf import convert_hf_model
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.models.transformer import AttnInputs, forward
    from llama_cpp_tpu.multimodal.qwen2vl import (
        convert_hf_qwen2vl_vision, load_qwen2vl_mmproj, vit_forward)
    from llama_cpp_tpu.multimodal.mtmd import qwen2vl_mrope_positions
    from llama_cpp_tpu.runtime.kv_cache import KVCache
    from llama_cpp_tpu.ops.qtensor import embed_lookup

    vc = dict(depth=2, embed_dim=32, hidden_size=48, mlp_ratio=2,
              num_heads=4, patch_size=4, temporal_patch_size=2,
              spatial_merge_size=2, in_channels=3)
    cfg = Qwen2VLConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vision_config=vc,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=140, vision_start_token_id=141,
        vision_end_token_id=142, pad_token_id=0,
    )
    torch.manual_seed(101)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    tpath = str(tmp_path / "q2vl.gguf")
    vpath = str(tmp_path / "q2vl.mmproj.gguf")
    convert_hf_model(hf, tpath, ftype="f32")
    convert_hf_qwen2vl_vision(hf, vpath)

    grid = np.array([[1, 4, 4]])  # -> 4 merged image embeddings
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((16, 3 * 2 * 4 * 4)).astype(np.float32)
    pre = [3, 17, 141]           # text + vision_start
    img = [140] * 4              # image pads (merged count)
    post = [142, 9, 11]          # vision_end + text
    ids = pre + img + post
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits[0].numpy()

    m = load_model(tpath, prefer_quant=False, dense_dtype=jnp.float32)
    vparams, vcfg = load_qwen2vl_mmproj(vpath)
    img_embd = vit_forward(vparams, vcfg, jnp.asarray(patches), grid)

    embeds = np.array(embed_lookup(m.params["token_embd"],
                                   jnp.asarray([ids]), jnp.float32))
    embeds[0, len(pre):len(pre) + 4] = np.asarray(img_embd)
    pos3 = qwen2vl_mrope_positions(
        [("text", len(pre)), ("image", (1, 4, 4)), ("text", len(post))])
    N = len(ids)
    kv = KVCache.create(2, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim_k,
                        m.cfg.head_dim_v, dtype=jnp.float32)
    # causal/slots use the sequence index (HF masks by token order; mrope
    # streams only drive the rotation)
    inputs = AttnInputs(
        seq_idx=jnp.zeros(1, jnp.int32),
        slots=jnp.arange(N, dtype=jnp.int32)[None, :],
        positions=jnp.arange(N, dtype=jnp.int32)[None, :],
        mrope_positions=jnp.asarray(pos3)[:, None, :],
    )
    logits, _ = forward(m.params, m.cfg, jnp.asarray([ids], jnp.int32),
                        inputs, kv, inputs_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_qwen2vl_mtmd_serving(tmp_path):
    """qwen2vl image serving through the PRODUCT path (MtmdModel +
    prefill_chunks + decode_one): M-RoPE streams drive the rotation while
    cache slots/causal mask stay row-major, and the per-seq rope delta
    carries text continuation past the image (HF get_rope_index)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLForConditionalGeneration)
    from llama_cpp_tpu.convert.hf_to_gguf import convert_hf_model
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.multimodal.mtmd import (MtmdModel, prefill_chunks,
                                               tokenize_chunks)
    from llama_cpp_tpu.multimodal.qwen2vl import (
        convert_hf_qwen2vl_vision, vit_forward)
    from llama_cpp_tpu.runtime.context import Context

    vc = dict(depth=2, embed_dim=32, hidden_size=48, mlp_ratio=2,
              num_heads=4, patch_size=4, temporal_patch_size=2,
              spatial_merge_size=2, in_channels=3)
    cfg = Qwen2VLConfig(
        vocab_size=150, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vision_config=vc,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=140, vision_start_token_id=141,
        vision_end_token_id=142, pad_token_id=0,
    )
    torch.manual_seed(101)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    tpath = str(tmp_path / "q2vl.gguf")
    vpath = str(tmp_path / "q2vl.mmproj.gguf")
    convert_hf_model(hf, tpath, ftype="f32")
    convert_hf_qwen2vl_vision(hf, vpath)

    grid = np.array([[1, 4, 4]])
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((16, 3 * 2 * 4 * 4)).astype(np.float32)
    pre = [3, 17, 141]
    img = [140] * 4
    post = [142, 9, 11]
    ids = pre + img + post
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits[0].numpy()

    m = load_model(tpath, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(m, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    mtmd = MtmdModel(vpath)
    emb = np.asarray(vit_forward(mtmd.params, mtmd.cfg,
                                 jnp.asarray(patches), grid), np.float32)

    # build chunks manually (the tokenizer here is a test vocab, so text
    # chunks carry the exact reference ids)
    from llama_cpp_tpu.multimodal.mtmd import Chunk

    chunks = [Chunk("text", tokens=pre),
              Chunk("image", embeds=emb, grid=(1, 4, 4)),
              Chunk("text", tokens=post)]
    logits = prefill_chunks(ctx, mtmd, chunks)
    np.testing.assert_allclose(np.asarray(logits), ref[-1],
                               rtol=2e-3, atol=2e-3)
    assert int(ctx.mrope_delta[0]) == -2  # 4 image rows -> extent 2

    # text continuation past the image must use rope pos = row + delta
    nxt = 7
    with torch.no_grad():
        ref2 = hf(input_ids=torch.tensor([ids + [nxt]]),
                  pixel_values=torch.tensor(patches),
                  image_grid_thw=torch.tensor(grid)).logits[0, -1].numpy()
    got2 = ctx.decode_one(nxt)
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=2e-3, atol=2e-3)


def test_qwen3vl_vision_tower(tmp_path):
    """Qwen3-VL deepstack ViT vs HF Qwen3VLVisionModel: biased patch embed,
    bilinearly interpolated learned positions (merge-window order), LN
    blocks with gelu-tanh MLP, per-tap postshuffle-norm deepstack mergers,
    pre-shuffle-norm final merger (reference tools/mtmd/models/
    qwen3vl.cpp)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLVisionConfig as HFVC)
    from transformers.models.qwen3_vl.modeling_qwen3_vl import (
        Qwen3VLVisionModel)
    from llama_cpp_tpu.multimodal.qwen2vl import (
        convert_hf_qwen3vl_vision, load_qwen3vl_mmproj, qwen3vl_forward)

    vc = HFVC(depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
              patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
              num_position_embeddings=16, out_hidden_size=48,
              deepstack_visual_indexes=[1, 3])
    torch.manual_seed(12)
    hf = Qwen3VLVisionModel(vc).eval()

    class _Shim:  # converter expects .config.vision_config + visual prefix
        config = type("C", (), {"vision_config": vc})

        def state_dict(self):
            return {"visual." + k: v for k, v in hf.state_dict().items()}

    path = str(tmp_path / "q3vl.mmproj.gguf")
    convert_hf_qwen3vl_vision(_Shim(), path)

    grid = np.array([[1, 8, 8]])
    S = 64
    rng = np.random.default_rng(8)
    patches = rng.standard_normal((S, 3 * 2 * 4 * 4)).astype(np.float32)
    with torch.no_grad():
        ref, ref_ds = hf(torch.tensor(patches), grid_thw=torch.tensor(grid))
    params, qcfg = load_qwen3vl_mmproj(path)
    assert qcfg.deepstack_idx == (1, 3)
    ours, ours_ds = qwen3vl_forward(params, qcfg, jnp.asarray(patches), grid)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-3, atol=1e-3)
    ref_cat = torch.cat(list(ref_ds), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(ours_ds), ref_cat,
                               rtol=1e-3, atol=1e-3)


def test_qwen3vl_mtmd_serving(tmp_path):
    """qwen3vl image serving through the product path: deepstack-wide
    embeds (image rows carry [E | taps], text rows zero-padded), IMROPE
    position streams, HF-forward parity incl. continuation."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import Qwen3VLForConditionalGeneration
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLConfig)
    from llama_cpp_tpu.convert.hf_to_gguf import convert_hf_model
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.multimodal.mtmd import (Chunk, MtmdModel,
                                               prefill_chunks)
    from llama_cpp_tpu.multimodal.qwen2vl import (
        convert_hf_qwen3vl_vision, load_qwen3vl_mmproj, qwen3vl_forward)
    from llama_cpp_tpu.runtime.context import Context

    vc = dict(depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
              patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
              num_position_embeddings=16, out_hidden_size=48,
              deepstack_visual_indexes=[1])
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=150, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
        ),
        vision_config=vc,
        image_token_id=140, vision_start_token_id=141,
        vision_end_token_id=142,
    )
    torch.manual_seed(23)
    hf = Qwen3VLForConditionalGeneration(cfg).eval()
    tpath = str(tmp_path / "q3vl.gguf")
    vpath = str(tmp_path / "q3vl.mmproj.gguf")
    convert_hf_model(hf, tpath, ftype="f32")
    convert_hf_qwen3vl_vision(hf, vpath)

    grid = np.array([[1, 4, 4]])
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((16, 3 * 2 * 4 * 4)).astype(np.float32)
    pre = [3, 17, 141]
    img = [140] * 4
    post = [142, 9, 11]
    ids = pre + img + post
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits[0].numpy()

    m = load_model(tpath, prefer_quant=False, dense_dtype=jnp.float32)
    assert int(m.cfg.extra.get("n_deepstack", 0)) == 1
    ctx = Context(m, n_ctx=64, n_seqs=1, kv_dtype=jnp.float32)
    mtmd = MtmdModel(vpath)
    out, ds = qwen3vl_forward(mtmd.params, mtmd.cfg, jnp.asarray(patches),
                              grid)
    emb = np.concatenate([np.asarray(out), np.asarray(ds)], -1)
    chunks = [Chunk("text", tokens=pre),
              Chunk("image", embeds=emb.astype(np.float32), grid=(1, 4, 4)),
              Chunk("text", tokens=post)]
    logits = prefill_chunks(ctx, mtmd, chunks)
    np.testing.assert_allclose(np.asarray(logits), ref[-1],
                               rtol=2e-3, atol=2e-3)

    nxt = 7
    with torch.no_grad():
        ref2 = hf(input_ids=torch.tensor([ids + [nxt]]),
                  pixel_values=torch.tensor(patches),
                  image_grid_thw=torch.tensor(grid)).logits[0, -1].numpy()
    got2 = ctx.decode_one(nxt)
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=2e-3, atol=2e-3)


def test_lfm2_and_janus_projectors():
    """LFM2-VL projector (pixel unshuffle + LN + GELU MLP) vs the HF
    Lfm2VlMultiModalProjector on the same tower features; Janus-Pro plain
    GELU aligner (reference models/siglip.cpp:47-76)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import Lfm2VlConfig
    from transformers.models.lfm2_vl.modeling_lfm2_vl import (
        Lfm2VlMultiModalProjector)

    from llama_cpp_tpu.multimodal.clip import VisionConfig, apply_projector

    cfg_hf = Lfm2VlConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=4, intermediate_size=64,
                           patch_size=4),
        text_config=dict(vocab_size=64, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2,
                         block_multiple_of=8),
        downsample_factor=2, projector_hidden_size=40, projector_bias=True,
    )
    torch.manual_seed(4)
    proj = Lfm2VlMultiModalProjector(cfg_hf).eval()
    side = 6
    feats = torch.randn(1, side, side, 32)
    with torch.no_grad():
        ref = proj(feats).numpy()

    cfg = VisionConfig(projector="lfm2", n_embd=32)
    cfg.extra["proj_scale_factor"] = 2
    params = {
        "mm_input_norm": jnp.asarray(proj.layer_norm.weight.detach().numpy()),
        "mm_input_norm_bias": jnp.asarray(
            proj.layer_norm.bias.detach().numpy()),
        "mm_1": jnp.asarray(proj.linear_1.weight.detach().numpy()),
        "mm_1_bias": jnp.asarray(proj.linear_1.bias.detach().numpy()),
        "mm_2": jnp.asarray(proj.linear_2.weight.detach().numpy()),
        "mm_2_bias": jnp.asarray(proj.linear_2.bias.detach().numpy()),
    }
    ours = np.asarray(apply_projector(
        cfg, params, jnp.asarray(feats.numpy().reshape(1, side * side, 32))))
    np.testing.assert_allclose(ours.reshape(-1, ours.shape[-1]),
                               ref.reshape(-1, ref.shape[-1]),
                               rtol=1e-4, atol=1e-4)

    # janus_pro: plain 2-layer GELU MLP
    cfg_j = VisionConfig(projector="janus_pro", n_embd=32)
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((40, 32)).astype(np.float32) * 0.1
    w1 = rng.standard_normal((48, 40)).astype(np.float32) * 0.1
    x = rng.standard_normal((1, 9, 32)).astype(np.float32)
    got = np.asarray(apply_projector(
        cfg_j, {"mm_0": jnp.asarray(w0), "mm_1": jnp.asarray(w1)},
        jnp.asarray(x)))
    import scipy.special as _sc  # erf gelu oracle

    h = x @ w0.T
    want = (0.5 * h * (1 + _sc.erf(h / np.sqrt(2)))) @ w1.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_glm4v_vision_tower(tmp_path):
    """GLM-4V ViT vs HF Glm4vVisionModel: post-conv RMSNorm, BICUBIC
    grid-sampled learned positions, RMS blocks with SiLU-gated MLP,
    spatial-merge downsample conv, GLM projector (fc -> LN -> GELU ->
    gated FFN) — reference tools/mtmd/models/glm4v.cpp."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers.models.glm4v.configuration_glm4v import (
        Glm4vVisionConfig as HFVC)
    from transformers.models.glm4v.modeling_glm4v import Glm4vVisionModel
    from llama_cpp_tpu.multimodal.glm4v import (convert_hf_glm4v_vision,
                                                load_glm4v_mmproj,
                                                vit_forward)

    vc = HFVC(depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
              patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
              image_size=16, out_hidden_size=48, attention_bias=True)
    torch.manual_seed(15)
    hf = Glm4vVisionModel(vc).eval()

    class _Shim:
        config = type("C", (), {"vision_config": vc})

        def state_dict(self):
            return {"visual." + k: v for k, v in hf.state_dict().items()}

    path = str(tmp_path / "glm4v.mmproj.gguf")
    convert_hf_glm4v_vision(_Shim(), path)

    grid = np.array([[1, 8, 8]])
    rng = np.random.default_rng(3)
    patches = rng.standard_normal((64, 3 * 2 * 4 * 4)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(patches), grid_thw=torch.tensor(grid)).numpy()
    params, gcfg = load_glm4v_mmproj(path)
    ours = np.asarray(vit_forward(params, gcfg, jnp.asarray(patches), grid))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_gemma3_projector_matches_hf():
    """apply_projector("gemma3") vs the HF Gemma3MultiModalProjector on the
    same tower features (avg-pool + soft-emb rmsnorm + input projection;
    reference tools/mtmd/models/siglip.cpp:18-40)."""
    import torch
    import transformers

    from llama_cpp_tpu.multimodal.clip import VisionConfig, apply_projector

    vc = transformers.SiglipVisionConfig(
        hidden_size=64, image_size=64, patch_size=8, layer_norm_eps=1e-6)
    cfg_hf = transformers.Gemma3Config(
        vision_config=vc,
        text_config=transformers.Gemma3TextConfig(hidden_size=48),
        mm_tokens_per_image=4)  # tokens_per_side 2 -> kernel 4
    from transformers.models.gemma3.modeling_gemma3 import \
        Gemma3MultiModalProjector

    torch.manual_seed(0)
    proj = Gemma3MultiModalProjector(cfg_hf)
    with torch.no_grad():
        proj.mm_input_projection_weight.normal_(0, 0.08)
        proj.mm_soft_emb_norm.weight.normal_(0, 0.1)
    feats = torch.randn(1, 64, 64)  # [B, N=8x8 patches, E]
    with torch.no_grad():
        want = proj(feats).numpy()

    cfg = VisionConfig(n_embd=64, eps=1e-6, projector="gemma3",
                       extra={"proj_scale_factor": 4})
    params = {
        # gemma rmsnorm applies (1 + w); the GGUF converter folds the +1
        "mm_soft_emb_norm": 1.0 + proj.mm_soft_emb_norm.weight.detach().numpy(),
        "mm_input_proj": proj.mm_input_projection_weight.detach().numpy(),
    }
    got = np.asarray(apply_projector(cfg, params, jnp.asarray(feats.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_idefics3_projector_matches_hf():
    """apply_projector("idefics3") vs HF Idefics3Connector (pixel shuffle +
    modality projection; reference models/siglip.cpp:41-46)."""
    import torch
    import transformers
    from transformers.models.idefics3.modeling_idefics3 import \
        Idefics3Connector

    from llama_cpp_tpu.multimodal.clip import VisionConfig, apply_projector

    cfg_hf = transformers.Idefics3Config(
        scale_factor=2,
        vision_config=transformers.Idefics3VisionConfig(hidden_size=32),
        text_config=transformers.LlamaConfig(hidden_size=24),
    )
    torch.manual_seed(1)
    conn = Idefics3Connector(cfg_hf)
    feats = torch.randn(1, 36, 32)  # 6x6 patch grid
    with torch.no_grad():
        want = conn(feats).numpy()

    cfg = VisionConfig(n_embd=32, projector="idefics3",
                       extra={"proj_scale_factor": 2})
    params = {"mm_fc": conn.modality_projection.proj.weight.detach().numpy()}
    got = np.asarray(apply_projector(cfg, params, jnp.asarray(feats.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_internvl_projector_matches_hf():
    """apply_projector("internvl") vs HF pixel_shuffle + multimodal
    projector (reference models/internvl.cpp:24-50)."""
    import torch
    import transformers
    from transformers.models.internvl.modeling_internvl import (
        InternVLModel, InternVLMultiModalProjector)

    from llama_cpp_tpu.multimodal.clip import VisionConfig, apply_projector

    cfg_hf = transformers.InternVLConfig(
        vision_config=transformers.InternVLVisionConfig(hidden_size=32),
        text_config=transformers.Qwen2Config(hidden_size=24),
        downsample_ratio=0.5, projector_hidden_act="gelu",
    )
    torch.manual_seed(2)
    proj = InternVLMultiModalProjector(cfg_hf)
    feats = torch.randn(1, 36, 32)  # 6x6 grid
    with torch.no_grad():
        shuffled = InternVLModel.pixel_shuffle(None, feats.view(1, 6, 6, 32),
                                               scale_factor=0.5)
        want = proj(shuffled.reshape(1, 9, 128)).numpy()

    cfg = VisionConfig(n_embd=32, projector="internvl",
                       extra={"proj_scale_factor": 2})
    sd = {k: v.detach().numpy() for k, v in proj.state_dict().items()}
    params = {
        "mm_0": sd["layer_norm.weight"], "mm_0_bias": sd["layer_norm.bias"],
        "mm_1": sd["linear_1.weight"], "mm_1_bias": sd["linear_1.bias"],
        "mm_3": sd["linear_2.weight"], "mm_3_bias": sd["linear_2.bias"],
    }
    got = np.asarray(apply_projector(cfg, params, jnp.asarray(feats.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
