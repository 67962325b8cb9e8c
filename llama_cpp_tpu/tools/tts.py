"""llama-tts analog (reference tools/tts/tts.cpp, OuteTTS + WavTokenizer):
backbone LM turns text into audio-code tokens; the WavTokenizer decoder
(models/wavtokenizer.py) maps codes to spectral coefficients; a host iSTFT
(magnitude/phase overlap-add, the embd_to_audio scheme of the reference
tool) produces PCM written as a WAV file.
"""

from __future__ import annotations

import struct

import numpy as np


def embd_to_audio(embd: np.ndarray, n_fft: int = 1280, hop: int = 320
                  ) -> np.ndarray:
    """Spectral frames [T, n_embd] -> PCM [T*hop] f32. The head emits
    log-magnitude and phase halves per frame; frames are synthesized with
    irfft and Hann-window overlap-add (reference tts tool embd_to_audio)."""
    n_frames, n_embd = embd.shape
    half = n_embd // 2
    n_bins = n_fft // 2 + 1
    mag = np.exp(np.clip(embd[:, :half], -30, 12))[:, :n_bins]
    phase = embd[:, half:][:, :n_bins]
    if mag.shape[1] < n_bins:  # head narrower than the FFT: zero-pad bins
        pad = n_bins - mag.shape[1]
        mag = np.pad(mag, ((0, 0), (0, pad)))
        phase = np.pad(phase, ((0, 0), (0, pad)))
    spec = mag * (np.cos(phase) + 1j * np.sin(phase))  # [T, n_bins]
    frames = np.fft.irfft(spec, n=n_fft, axis=1)  # [T, n_fft]

    win = np.hanning(n_fft + 1)[:-1].astype(np.float64)
    out_len = n_frames * hop
    audio = np.zeros(out_len + n_fft, np.float64)
    norm = np.zeros(out_len + n_fft, np.float64)
    for t in range(n_frames):
        o = t * hop
        audio[o : o + n_fft] += frames[t] * win
        norm[o : o + n_fft] += win * win
    audio = audio[n_fft // 2 : n_fft // 2 + out_len]
    norm = norm[n_fft // 2 : n_fft // 2 + out_len]
    return (audio / np.maximum(norm, 1e-8)).astype(np.float32)


def write_wav(path: str, audio: np.ndarray, sample_rate: int = 24000):
    """16-bit mono PCM WAV."""
    pcm = np.clip(audio, -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def outetts_prompt(text: str) -> str:
    """OuteTTS v0.2 prompt format (reference tts tool prompt assembly)."""
    words = "<|text_sep|>".join(w.lower() for w in text.split())
    return ("<|im_start|>\n<|text_start|>" + words
            + "<|text_end|>\n<|audio_start|>\n")


def synthesize(backbone_ctx, vocoder: dict, text: str,
               max_frames: int = 512, code_offset: int = 151672,
               temp: float = 0.7) -> np.ndarray:
    """-> PCM f32. Generates audio-code tokens with the backbone, strips
    non-code tokens, decodes through the vocoder + iSTFT."""
    from ..models.wavtokenizer import vocoder_decode
    from ..sampling.samplers import SamplerChain, SamplingParams

    tok = backbone_ctx.model.tokenizer
    ids = tok.encode(outetts_prompt(text), add_special=True,
                     parse_special=True)
    chain = SamplerChain.from_params(SamplingParams(temp=temp, top_k=40))
    out = backbone_ctx.generate(ids, max_new_tokens=max_frames,
                                sampler=chain)
    n_codes = int(vocoder["params"]["token_embd.weight"].shape[0])
    codes = [t - code_offset for t in out if 0 <= t - code_offset < n_codes]
    if not codes:
        return np.zeros(0, np.float32)
    embd = vocoder_decode(vocoder, np.asarray(codes, np.int32))
    return embd_to_audio(embd)


def main(argv=None):
    import argparse

    from ..models.loader import load_model
    from ..models.wavtokenizer import load_vocoder
    from ..runtime.context import Context

    ap = argparse.ArgumentParser("llama-tts (TPU)")
    ap.add_argument("-m", "--model", required=True, help="backbone GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer decoder GGUF")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("-n", "--max-frames", type=int, default=512)
    ap.add_argument("--code-offset", type=int, default=151672,
                    help="first audio-code token id in the backbone vocab")
    ap.add_argument("--temp", type=float, default=0.7)
    ap.add_argument("--sample-rate", type=int, default=24000)
    from .args import apply_env_and_preset

    args = apply_env_and_preset(ap, argv)

    model = load_model(args.model)
    ctx = Context(model, n_ctx=4096, n_seqs=1)
    voc = load_vocoder(args.model_vocoder)
    audio = synthesize(ctx, voc, args.prompt, max_frames=args.max_frames,
                       code_offset=args.code_offset, temp=args.temp)
    write_wav(args.output, audio, args.sample_rate)
    print(f"wrote {args.output}: {len(audio)} samples "
          f"({len(audio)/args.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
