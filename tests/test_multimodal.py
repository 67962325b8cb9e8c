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
