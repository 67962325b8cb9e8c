"""Audio branch of mtmd: whisper-style log-mel preprocessing, the whisper
encoder tower, and the audio projectors.

Analog of the reference tools/mtmd/mtmd-audio.cpp (mel filterbank +
log-mel, 30 s chunking) and tools/mtmd/models/whisper-enc.cpp (conv1d x2 →
transformer → projector: ULTRAVOX stack+swiglu, QWEN2A fc, VOXTRAL
stack+gelu-mlp). GGUF tensor names follow clip-impl.h (a.*, mm.a.*) so
reference mmproj audio files load directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_LEN_S = 30  # whisper fixed chunk


# ---------------------------------------------------------------------------
# mel preprocessing (host side, numpy — reference mtmd-audio.cpp)


def mel_filterbank(n_mel: int, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE,
                   fmax: float = 0.0) -> np.ndarray:
    """Slaney-scale mel filterbank [n_mel, n_fft//2+1] with area
    normalization (reference fill_mel_filterbank_matrix,
    mtmd-audio.cpp:36-120)."""
    if fmax <= 0:
        fmax = 0.5 * sample_rate
    min_log_hz = 1000.0
    lin_slope = 3 / 200.0
    log_step = np.log(6.4) / 27.0
    min_log_mel = min_log_hz * lin_slope

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        return np.where(f < min_log_hz, f * lin_slope,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / log_step)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        return np.where(m < min_log_mel, m / lin_slope,
                        min_log_hz * np.exp((m - min_log_mel) * log_step))

    n_bins = n_fft // 2 + 1
    fft_freqs = np.arange(n_bins) * (sample_rate / n_fft)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mel + 2)
    hz_pts = mel_to_hz(mel_pts)
    out = np.zeros((n_mel, n_bins), np.float64)
    for m in range(n_mel):
        f_left, f_center, f_right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        enorm = 2.0 / max(1e-30, f_right - f_left)
        up = (fft_freqs - f_left) / max(1e-30, f_center - f_left)
        down = (f_right - fft_freqs) / max(1e-30, f_right - f_center)
        out[m] = np.maximum(0.0, np.minimum(up, down)) * enorm
    return out.astype(np.float32)


def log_mel_spectrogram(samples: np.ndarray, n_mel: int = 128,
                        chunk: bool = True) -> list[np.ndarray]:
    """float32 mono 16 kHz PCM → list of [n_mel, 3000] whisper log-mel
    chunks (30 s each, zero-padded). Matches WhisperFeatureExtractor:
    hann window, |STFT|^2, mel, log10 clamp at 1e-10, dynamic-range clamp
    to max-8, (x+4)/4 (reference log_mel_spectrogram,
    mtmd-audio.cpp:368-525)."""
    samples = np.asarray(samples, np.float32)
    chunk_n = SAMPLE_RATE * CHUNK_LEN_S
    chunks = []
    if not chunk:
        spans = [samples]
    else:
        spans = [samples[i: i + chunk_n]
                 for i in range(0, max(len(samples), 1), chunk_n)]
    fb = mel_filterbank(n_mel)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)  # periodic hann
    for span in spans:
        x = np.zeros(chunk_n, np.float64)
        x[: len(span)] = span[:chunk_n]
        # whisper frames: reflect-pad n_fft//2 both sides, centered frames
        pad = N_FFT // 2
        xp = np.pad(x, (pad, pad), mode="reflect")
        n_frames = chunk_n // HOP  # 3000
        idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
        frames = xp[idx] * window
        spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # [T, n_bins]
        mel = spec @ fb.T  # [T, n_mel]
        logm = np.log10(np.maximum(mel, 1e-10))
        logm = np.maximum(logm, logm.max() - 8.0)
        logm = (logm + 4.0) / 4.0
        chunks.append(logm.T.astype(np.float32))  # [n_mel, T]
    return chunks


# ---------------------------------------------------------------------------
# whisper encoder tower + projectors (JAX)


@dataclass
class AudioConfig:
    n_mel: int = 128
    n_embd: int = 1280
    n_layers: int = 32
    n_heads: int = 20
    n_ff: int = 5120
    eps: float = 1e-5
    projector: str = "ultravox"  # ultravox | qwen2a | voxtral
    stack_factor: int = 8
    n_embd_out: int = 4096


def _gelu_erf(x):
    import jax

    return jax.nn.gelu(x, approximate=False)


def _conv1d_same(x, w, b, stride: int):
    """x [T, C_in], w [C_out, C_in, K] (HF Conv1d layout), 'same' padding
    for K=3 (pad 1)."""
    import jax

    K = w.shape[2]
    pad = (K - 1) // 2
    out = jax.lax.conv_general_dilated(
        x[None],  # [1, T, C_in]
        w.transpose(2, 1, 0),  # [K, C_in, C_out]
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    return out + b


def _rms_norm(x, w, eps=1e-6):
    import jax
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w


def whisper_encoder_forward(params, cfg: AudioConfig, mel) -> "jnp.ndarray":
    """mel [n_mel, T] → projected audio embedding tokens [N, n_embd_out]
    (reference clip_graph_whisper_enc::build, models/whisper-enc.cpp)."""
    import jax
    import jax.numpy as jnp

    from .clip import _ln

    x = jnp.asarray(mel, jnp.float32).T  # [T, n_mel]
    x = _gelu_erf(_conv1d_same(x, params["conv1"], params["conv1_bias"], 1))
    x = _gelu_erf(_conv1d_same(x, params["conv2"], params["conv2_bias"], 2))
    n_pos = x.shape[0]
    x = x + params["position_embd"][:n_pos]

    H, D = cfg.n_heads, cfg.n_embd // cfg.n_heads
    for lw in params["layers"]:
        h = _ln(x, lw["ln1"], lw.get("ln1_bias"), cfg.eps)
        q = jnp.dot(h, lw["attn_q"].T) + lw.get("attn_q_bias", 0.0)
        k = jnp.dot(h, lw["attn_k"].T)  # whisper: no k bias
        v = jnp.dot(h, lw["attn_v"].T) + lw.get("attn_v_bias", 0.0)
        N = h.shape[0]
        q = q.reshape(N, H, D).transpose(1, 0, 2)
        k = k.reshape(N, H, D).transpose(1, 0, 2)
        v = v.reshape(N, H, D).transpose(1, 0, 2)
        scores = jnp.einsum("hnd,hmd->hnm", q, k,
                            preferred_element_type=jnp.float32) / D ** 0.5
        attn = jnp.einsum("hnm,hmd->hnd", jax.nn.softmax(scores, -1), v,
                          preferred_element_type=jnp.float32)
        attn = attn.transpose(1, 0, 2).reshape(N, cfg.n_embd)
        x = x + jnp.dot(attn, lw["attn_out"].T) + lw.get("attn_out_bias", 0.0)
        h = _ln(x, lw["ln2"], lw.get("ln2_bias"), cfg.eps)
        f = _gelu_erf(jnp.dot(h, lw["ffn_up"].T) + lw.get("ffn_up_bias", 0.0))
        x = x + jnp.dot(f, lw["ffn_down"].T) + lw.get("ffn_down_bias", 0.0)

    if "post_ln" in params:
        x = _ln(x, params["post_ln"], params.get("post_ln_bias"), cfg.eps)

    # projector
    if cfg.projector in ("ultravox", "voxtral") and cfg.stack_factor > 1:
        # StackAudioFrames: pad to a multiple, reshape [N/s, E*s]
        s = cfg.stack_factor
        N = x.shape[0]
        n_pad = (-N) % s
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        x = x.reshape(-1, cfg.n_embd * s)
    if cfg.projector == "ultravox":
        x = _rms_norm(x, params["mm_norm_pre"])
        x = jnp.dot(x, params["mm_1"].T)
        # swiglu_swapped: silu(second half) * first half
        half = x.shape[-1] // 2
        x = x[..., :half] * jax.nn.silu(x[..., half:])
        x = _rms_norm(x, params["mm_norm_mid"])
        x = jnp.dot(x, params["mm_2"].T)
    elif cfg.projector == "qwen2a":
        # qwen2-audio: avg-pool pairs of frames then fc
        N = x.shape[0] // 2 * 2
        x = x[:N].reshape(-1, 2, cfg.n_embd).mean(axis=1)
        x = jnp.dot(x, params["mm_fc"].T) + params.get("mm_fc_bias", 0.0)
    elif cfg.projector == "voxtral":
        x = jnp.dot(x, params["mm_1"].T) + params.get("mm_1_bias", 0.0)
        x = _gelu_erf(x)
        x = jnp.dot(x, params["mm_2"].T) + params.get("mm_2_bias", 0.0)
    else:  # pragma: no cover
        raise NotImplementedError(f"audio projector {cfg.projector!r}")
    return x


# ---------------------------------------------------------------------------
# GGUF I/O (clip-impl.h a.* / mm.a.* names)

_A_GLOBAL = {
    "a.conv1d.1.weight": "conv1", "a.conv1d.1.bias": "conv1_bias",
    "a.conv1d.2.weight": "conv2", "a.conv1d.2.bias": "conv2_bias",
    "a.position_embd.weight": "position_embd",
    "a.post_ln.weight": "post_ln", "a.post_ln.bias": "post_ln_bias",
    "mm.a.mlp.1.weight": "mm_1", "mm.a.mlp.1.bias": "mm_1_bias",
    "mm.a.mlp.2.weight": "mm_2", "mm.a.mlp.2.bias": "mm_2_bias",
    "mm.a.fc.weight": "mm_fc", "mm.a.fc.bias": "mm_fc_bias",
    "mm.a.norm_pre.weight": "mm_norm_pre",
    "mm.a.norm_mid.weight": "mm_norm_mid",
}


def load_audio_mmproj(path: str):
    """-> (AudioConfig, params) from a reference-layout mmproj GGUF with an
    audio tower. Shares the file with a vision tower when both exist."""
    import jax.numpy as jnp

    from ..gguf.reader import read_gguf
    from ..quant.dequant import dequantize_tensor
    from .mmproj import _LAYER_MAP

    f = read_gguf(path)
    md = f.metadata
    P = "clip.audio."
    cfg = AudioConfig(
        n_mel=int(md.get(P + "num_mel_bins", 128)),
        n_embd=int(md.get(P + "embedding_length", 1280)),
        n_ff=int(md.get(P + "feed_forward_length", 5120)),
        n_layers=int(md.get(P + "block_count", 32)),
        n_heads=int(md.get(P + "attention.head_count", 20)),
        eps=float(md.get(P + "attention.layer_norm_epsilon", 1e-5)),
        n_embd_out=int(md.get(P + "projection_dim", 4096)),
        projector=str(md.get("clip.audio.projector_type",
                             md.get("clip.projector_type", "ultravox"))),
        stack_factor=int(md.get(P + "projector.stack_factor", 8)),
    )
    params = {"layers": [dict() for _ in range(cfg.n_layers)]}
    for name, info in f.tensors.items():
        if not (name.startswith("a.") or name.startswith("mm.a.")):
            continue
        arr = dequantize_tensor(np.asarray(info.data), info.dtype, info.shape)
        if name in _A_GLOBAL:
            params[_A_GLOBAL[name]] = jnp.asarray(arr, jnp.float32)
        elif name.startswith("a.blk."):
            parts = name.split(".", 3)
            il, suffix = int(parts[2]), parts[3]
            key = _LAYER_MAP.get(suffix)
            if key is not None and il < cfg.n_layers:
                params["layers"][il][key] = jnp.asarray(arr, jnp.float32)
    return cfg, params


def convert_hf_whisper_to_mmproj(encoder, projector, out_path: str,
                                 projector_type: str, n_embd_out: int,
                                 stack_factor: int = 8) -> str:
    """HF WhisperEncoder (+ projector module) → mmproj GGUF with reference
    tensor names. `projector` is the ultravox/qwen2-audio/voxtral
    multi_modal_projector (or a plain state-dict-bearing module)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    ecfg = encoder.config
    w = GGUFWriter()
    w.add("general.architecture", "clip")
    w.add("clip.has_audio_encoder", True)
    w.add("clip.audio.projector_type", projector_type)
    P = "clip.audio."
    w.add(P + "num_mel_bins", np.uint32(ecfg.num_mel_bins))
    w.add(P + "embedding_length", np.uint32(ecfg.d_model))
    w.add(P + "feed_forward_length", np.uint32(ecfg.encoder_ffn_dim))
    w.add(P + "block_count", np.uint32(ecfg.encoder_layers))
    w.add(P + "attention.head_count", np.uint32(ecfg.encoder_attention_heads))
    w.add(P + "attention.layer_norm_epsilon", 1e-5)
    w.add(P + "projection_dim", np.uint32(n_embd_out))
    if projector_type in ("ultravox", "voxtral"):
        w.add(P + "projector.stack_factor", np.uint32(stack_factor))

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in encoder.state_dict().items()}

    def E(name, arr):
        arr = np.ascontiguousarray(arr, np.float32)
        w.add_tensor(name, arr.tobytes(), tuple(reversed(arr.shape)),
                     GGMLType.F32)

    E("a.conv1d.1.weight", sd["conv1.weight"])
    E("a.conv1d.1.bias", sd["conv1.bias"])
    E("a.conv1d.2.weight", sd["conv2.weight"])
    E("a.conv1d.2.bias", sd["conv2.bias"])
    E("a.position_embd.weight", sd["embed_positions.weight"])
    E("a.post_ln.weight", sd["layer_norm.weight"])
    E("a.post_ln.bias", sd["layer_norm.bias"])
    for i in range(ecfg.encoder_layers):
        p, b = f"layers.{i}.", f"a.blk.{i}."
        pairs = (("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
                 ("self_attn.v_proj", "attn_v"),
                 ("self_attn.out_proj", "attn_out"),
                 ("self_attn_layer_norm", "ln1"), ("final_layer_norm", "ln2"),
                 ("fc1", "ffn_up"), ("fc2", "ffn_down"))
        for hf, gg in pairs:
            E(b + gg + ".weight", sd[p + hf + ".weight"])
            if p + hf + ".bias" in sd:
                E(b + gg + ".bias", sd[p + hf + ".bias"])
    if projector is not None:
        psd = {k: v.detach().cpu().float().numpy()
               for k, v in projector.state_dict().items()}
        if projector_type == "qwen2a":
            E("mm.a.fc.weight", psd["linear.weight"])
            E("mm.a.fc.bias", psd["linear.bias"])
        else:  # ultravox naming: ln_pre/linear_1/ln_mid/linear_2
            name_map = {
                "ln_pre.weight": "mm.a.norm_pre.weight",
                "ln_mid.weight": "mm.a.norm_mid.weight",
                "linear_1.weight": "mm.a.mlp.1.weight",
                "linear_2.weight": "mm.a.mlp.2.weight",
                "linear_1.bias": "mm.a.mlp.1.bias",
                "linear_2.bias": "mm.a.mlp.2.bias",
            }
            for k, v in psd.items():
                if k in name_map:
                    E(name_map[k], v)
    w.write(out_path)
    return out_path
