"""mtmd audio branch (reference tools/mtmd/mtmd-audio.cpp +
models/whisper-enc.cpp): log-mel preprocessing vs the HF
WhisperFeatureExtractor oracle, whisper encoder tower vs a random-init HF
WhisperEncoder, and projector math. No downloads — HF models are built
from configs with random weights."""

import numpy as np
import pytest

from llama_cpp_tpu.multimodal.audio import (AudioConfig, log_mel_spectrogram,
                                            mel_filterbank,
                                            whisper_encoder_forward)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    fb_hf = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    ).T  # -> [n_mel, n_bins]
    fb = mel_filterbank(80, n_fft=400, sample_rate=16000)
    assert fb.shape == fb_hf.shape
    np.testing.assert_allclose(fb, fb_hf, atol=1e-6)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80, sampling_rate=16000)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)  # 2 s
    ref = fe(wav, sampling_rate=16000, return_tensors="np",
             padding="max_length").input_features[0]  # [80, 3000]
    got = log_mel_spectrogram(wav, n_mel=80)
    assert len(got) == 1
    assert got[0].shape == ref.shape
    np.testing.assert_allclose(got[0], ref, atol=2e-4)


def test_log_mel_chunking():
    wav = np.zeros(16000 * 61, np.float32)  # 61 s -> 3 chunks
    got = log_mel_spectrogram(wav, n_mel=128)
    assert len(got) == 3
    assert all(c.shape == (128, 3000) for c in got)


def _hf_whisper_encoder(n_mel=80, d=64, layers=2, heads=4, ff=128):
    from transformers.models.whisper.modeling_whisper import (WhisperConfig,
                                                              WhisperEncoder)

    cfg = WhisperConfig(
        num_mel_bins=n_mel, d_model=d, encoder_layers=layers,
        encoder_attention_heads=heads, encoder_ffn_dim=ff,
        max_source_positions=1500,
    )
    torch.manual_seed(0)
    enc = WhisperEncoder(cfg)
    enc.eval()
    return enc


def _params_from_hf(enc):
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = {
        "conv1": jnp.asarray(sd["conv1.weight"]),
        "conv1_bias": jnp.asarray(sd["conv1.bias"]),
        "conv2": jnp.asarray(sd["conv2.weight"]),
        "conv2_bias": jnp.asarray(sd["conv2.bias"]),
        "position_embd": jnp.asarray(sd["embed_positions.weight"]),
        "post_ln": jnp.asarray(sd["layer_norm.weight"]),
        "post_ln_bias": jnp.asarray(sd["layer_norm.bias"]),
        "layers": [],
    }
    n_layers = enc.config.encoder_layers
    for i in range(n_layers):
        p = f"layers.{i}."
        params["layers"].append({
            "attn_q": jnp.asarray(sd[p + "self_attn.q_proj.weight"]),
            "attn_q_bias": jnp.asarray(sd[p + "self_attn.q_proj.bias"]),
            "attn_k": jnp.asarray(sd[p + "self_attn.k_proj.weight"]),
            "attn_v": jnp.asarray(sd[p + "self_attn.v_proj.weight"]),
            "attn_v_bias": jnp.asarray(sd[p + "self_attn.v_proj.bias"]),
            "attn_out": jnp.asarray(sd[p + "self_attn.out_proj.weight"]),
            "attn_out_bias": jnp.asarray(sd[p + "self_attn.out_proj.bias"]),
            "ln1": jnp.asarray(sd[p + "self_attn_layer_norm.weight"]),
            "ln1_bias": jnp.asarray(sd[p + "self_attn_layer_norm.bias"]),
            "ln2": jnp.asarray(sd[p + "final_layer_norm.weight"]),
            "ln2_bias": jnp.asarray(sd[p + "final_layer_norm.bias"]),
            "ffn_up": jnp.asarray(sd[p + "fc1.weight"]),
            "ffn_up_bias": jnp.asarray(sd[p + "fc1.bias"]),
            "ffn_down": jnp.asarray(sd[p + "fc2.weight"]),
            "ffn_down_bias": jnp.asarray(sd[p + "fc2.bias"]),
        })
    return params


def test_whisper_encoder_matches_hf_oracle():
    enc = _hf_whisper_encoder()
    params = _params_from_hf(enc)
    # voxtral-style projector disabled: compare the raw tower via a
    # pass-through linear "qwen2a" fc = identity after 2x pooling is NOT
    # the tower output, so test the tower by grafting an identity fc
    import jax.numpy as jnp

    d = enc.config.d_model
    cfg = AudioConfig(n_mel=80, n_embd=d, n_layers=2, n_heads=4, n_ff=128,
                      projector="qwen2a", stack_factor=1)
    params["mm_fc"] = jnp.eye(d, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((80, 3000)).astype(np.float32)  # HF wants 30 s
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel)[None]).last_hidden_state[0].numpy()
    got = np.asarray(whisper_encoder_forward(params, cfg, mel))
    # qwen2a pools pairs: compare against pooled reference
    ref_pooled = ref[: len(ref) // 2 * 2].reshape(-1, 2, d).mean(1)
    assert got.shape == ref_pooled.shape
    np.testing.assert_allclose(got, ref_pooled, atol=2e-4)


def test_ultravox_projector_shapes_and_math():
    import jax.numpy as jnp

    d, s, out = 32, 4, 48
    cfg = AudioConfig(n_mel=8, n_embd=d, n_layers=0, n_heads=4, n_ff=16,
                      projector="ultravox", stack_factor=s, n_embd_out=out)
    rng = np.random.default_rng(2)
    params = {
        "conv1": jnp.asarray(rng.standard_normal((d, 8, 3)), jnp.float32) * 0.1,
        "conv1_bias": jnp.zeros(d),
        "conv2": jnp.asarray(rng.standard_normal((d, d, 3)), jnp.float32) * 0.1,
        "conv2_bias": jnp.zeros(d),
        "position_embd": jnp.zeros((1500, d)),
        "layers": [],
        "mm_norm_pre": jnp.ones(d * s),
        "mm_norm_mid": jnp.ones(2 * out),
        "mm_1": jnp.asarray(rng.standard_normal((4 * out, d * s)), jnp.float32) * 0.05,
        "mm_2": jnp.asarray(rng.standard_normal((out, 2 * out)), jnp.float32) * 0.05,
    }
    mel = rng.standard_normal((8, 100)).astype(np.float32)
    got = np.asarray(whisper_encoder_forward(params, cfg, mel))
    # 100 frames -> conv stride 2 -> 50 -> stack 4 -> ceil(50/4)=13 rows
    assert got.shape == (13, out)
    assert np.isfinite(got).all()

    # swiglu_swapped semantics: y = x[:half] * silu(x[half:])
    x = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    half = x[:2] * (x[2:] / (1 + np.exp(-x[2:])))
    from llama_cpp_tpu.multimodal.audio import _rms_norm  # noqa: F401

    xs = jnp.asarray(x)[None]
    y = xs[..., :2] * (jnp.asarray(x)[2:] * jax_sigmoid(x[2:]))
    np.testing.assert_allclose(np.asarray(y)[0], half, rtol=1e-6)


def jax_sigmoid(v):
    import jax

    return np.asarray(jax.nn.sigmoid(np.asarray(v, np.float32)))


def test_mmproj_roundtrip(tmp_path):
    """convert_hf_whisper_to_mmproj → load_audio_mmproj → identical
    forward output."""
    from llama_cpp_tpu.multimodal.audio import (convert_hf_whisper_to_mmproj,
                                                load_audio_mmproj)

    enc = _hf_whisper_encoder()
    path = str(tmp_path / "mmproj-audio.gguf")

    class Proj(torch.nn.Module):
        def __init__(self):
            super().__init__()
            d = enc.config.d_model
            self.ln_pre = torch.nn.LayerNorm(d * 4, elementwise_affine=True)
            self.linear_1 = torch.nn.Linear(d * 4, 2 * 24, bias=False)
            self.ln_mid = torch.nn.LayerNorm(12, elementwise_affine=True)
            self.linear_2 = torch.nn.Linear(12, 16, bias=False)

    torch.manual_seed(1)
    convert_hf_whisper_to_mmproj(enc, Proj(), path, "ultravox",
                                 n_embd_out=16, stack_factor=4)
    cfg, params = load_audio_mmproj(path)
    assert cfg.projector == "ultravox"
    assert cfg.stack_factor == 4
    assert cfg.n_embd == enc.config.d_model
    assert len(params["layers"]) == 2
    ref_params = _params_from_hf(enc)
    np.testing.assert_allclose(np.asarray(params["conv1"]),
                               np.asarray(ref_params["conv1"]), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(params["layers"][1]["ffn_down"]),
        np.asarray(ref_params["layers"][1]["ffn_down"]), atol=1e-7)
    assert "mm_1" in params and "mm_norm_pre" in params


def test_audio_end_to_end_prefill(tmp_path):
    """audio PCM -> mel -> whisper tower -> ultravox projector -> spliced
    into a tiny LLM prefill with finite logits (reference mtmd audio path:
    mtmd.cpp tokenize + encode + decode)."""
    import jax.numpy as jnp

    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.multimodal.audio import convert_hf_whisper_to_mmproj
    from llama_cpp_tpu.multimodal.mtmd import (Chunk, MtmdModel,
                                               prefill_chunks)
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    lm_path = str(tmp_path / "lm.gguf")
    make_tiny_llama_gguf(lm_path, vocab_size=300, n_layers=1, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128)

    enc = _hf_whisper_encoder(n_mel=80, d=64, layers=1, heads=4, ff=128)

    class Proj(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_pre = torch.nn.LayerNorm(64 * 8, elementwise_affine=True)
            self.linear_1 = torch.nn.Linear(64 * 8, 2 * 64, bias=False)
            self.ln_mid = torch.nn.LayerNorm(64, elementwise_affine=True)
            self.linear_2 = torch.nn.Linear(64, 64, bias=False)

    torch.manual_seed(3)
    mm_path = str(tmp_path / "mmproj.gguf")
    convert_hf_whisper_to_mmproj(enc, Proj(), mm_path, "ultravox",
                                 n_embd_out=64, stack_factor=8)

    # MtmdModel requires a vision-config header to exist; audio-only files
    # still load (audio tower detected via clip.has_audio_encoder)
    mtmd = MtmdModel(mm_path)
    assert mtmd.audio_cfg is not None

    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(16000) * 0.05).astype(np.float32)  # 1 s
    a_embeds = mtmd.encode_audio(wav)
    assert a_embeds.shape[1] == 64 and np.isfinite(a_embeds).all()
    # 30 s chunk -> 1500 tower frames -> stack 8 -> 188 rows
    assert a_embeds.shape[0] == 188

    model = load_model(lm_path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=256, n_seqs=1, kv_dtype=jnp.float32)
    chunks = [
        Chunk("text", tokens=[5, 9]),
        Chunk("audio", embeds=a_embeds[:32]),
        Chunk("text", tokens=[20]),
    ]
    last = prefill_chunks(ctx, mtmd, chunks)
    assert last.shape == (300,) and np.isfinite(last).all()
