"""TTS pipeline (reference tools/tts, OuteTTS + WavTokenizer decoder):
vocoder forward, iSTFT synthesis, WAV writer, and the end-to-end
text -> codes -> audio path."""

import struct

import numpy as np

from llama_cpp_tpu.models.wavtokenizer import load_vocoder, vocoder_decode
from llama_cpp_tpu.tools.tts import (
    embd_to_audio,
    outetts_prompt,
    synthesize,
    write_wav,
)
from llama_cpp_tpu.testing import make_tiny_llama_gguf, make_tiny_wavtokenizer_gguf


def test_vocoder_decode_shapes(tmp_path):
    p = str(tmp_path / "voc.gguf")
    make_tiny_wavtokenizer_gguf(p)
    voc = load_vocoder(p)
    codes = np.array([1, 5, 9, 3, 2, 60, 33, 7], np.int32)
    embd = vocoder_decode(voc, codes)
    assert embd.shape == (8, 34)
    assert np.isfinite(embd).all()


def test_embd_to_audio_and_wav(tmp_path):
    rng = np.random.default_rng(0)
    embd = rng.standard_normal((16, 34)).astype(np.float32)
    audio = embd_to_audio(embd, n_fft=64, hop=16)
    assert audio.shape == (256,)
    assert np.isfinite(audio).all()
    wav = str(tmp_path / "out.wav")
    write_wav(wav, audio, sample_rate=8000)
    raw = open(wav, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    n = struct.unpack("<I", raw[40:44])[0]
    assert n == 2 * len(audio)


def test_tts_end_to_end(tmp_path):
    """Backbone LM -> code tokens -> vocoder -> PCM (greedy, tiny models)."""
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context

    bp = str(tmp_path / "backbone.gguf")
    make_tiny_llama_gguf(bp, vocab_size=300, n_layers=1, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    model = load_model(bp, prefer_quant=False)
    ctx = Context(model, n_ctx=128, n_seqs=1)

    vp = str(tmp_path / "voc.gguf")
    make_tiny_wavtokenizer_gguf(vp)
    voc = load_vocoder(vp)

    audio = synthesize(ctx, voc, "hello world", max_frames=12,
                       code_offset=200, temp=0.0)
    # every generated token in [200, 264) becomes one 320-sample hop
    assert audio.dtype == np.float32
    assert len(audio) % 320 == 0
    assert np.isfinite(audio).all()


def test_outetts_prompt_format():
    p = outetts_prompt("Hello World")
    assert p.startswith("<|im_start|>")
    assert "hello<|text_sep|>world" in p
    assert p.endswith("<|audio_start|>\n")
