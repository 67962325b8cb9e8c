"""Multimodal runtime: image -> embedding chunks -> decode splicing.

Analog of the reference mtmd API (tools/mtmd/mtmd.h): tokenize mixed
text/image inputs into chunks; image chunks encode through the vision tower
and enter the decode batch as input embeddings at their positions."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import embed_lookup
from .clip import VisionConfig, clip_forward, preprocess_image
from .mmproj import load_mmproj


@dataclass
class Chunk:
    kind: str  # "text" | "image" | "audio"
    tokens: list | None = None
    embeds: np.ndarray | None = None  # [n, n_embd_llm]


class MtmdModel:
    def __init__(self, mmproj_path: str):
        self.cfg, self.params = load_mmproj(mmproj_path)
        # audio tower shares the mmproj file (reference: one clip_ctx per
        # modality, clip.has_audio_encoder)
        self.audio_cfg = None
        self.audio_params = None
        from ..gguf.reader import read_gguf

        md = read_gguf(mmproj_path).metadata
        if md.get("clip.has_audio_encoder"):
            from .audio import load_audio_mmproj

            self.audio_cfg, self.audio_params = load_audio_mmproj(mmproj_path)

    def encode_audio(self, samples: np.ndarray) -> np.ndarray:
        """16 kHz mono PCM -> [n_tokens, n_embd_llm] f32 (all 30 s chunks
        concatenated; reference mtmd.cpp audio path)."""
        from .audio import log_mel_spectrogram, whisper_encoder_forward

        if self.audio_cfg is None:
            raise ValueError("mmproj has no audio encoder")
        outs = []
        for mel in log_mel_spectrogram(samples, n_mel=self.audio_cfg.n_mel):
            out = whisper_encoder_forward(self.audio_params, self.audio_cfg,
                                          jnp.asarray(mel))
            outs.append(np.asarray(out, np.float32))
        return np.concatenate(outs, axis=0)

    @property
    def n_image_tokens(self) -> int:
        n = self.cfg.n_patches
        return n if not (self.cfg.use_cls and not self.cfg.drop_cls) else n

    def encode(self, image) -> np.ndarray:
        """image: PIL / array -> [n_tokens, n_embd_llm] f32."""
        px = preprocess_image(image, self.cfg)
        return self.encode_pixels(px[None])[0]

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """pixels [B, S, S, 3] normalized -> [B, n_tokens, n_embd_llm]."""
        out = clip_forward(self.params, self.cfg, jnp.asarray(pixels, jnp.float32))
        return np.asarray(out, np.float32)


def tokenize_chunks(tokenizer, text: str, images: list,
                    marker: str = "<__media__>") -> list[Chunk]:
    """Split text on media markers into text/image chunks
    (mtmd_tokenize analog)."""
    parts = text.split(marker)
    if len(parts) - 1 != len(images):
        raise ValueError(
            f"{len(parts) - 1} media markers but {len(images)} images")
    chunks: list[Chunk] = []
    for i, part in enumerate(parts):
        if part:
            ids = tokenizer.encode(part, add_special=i == 0, parse_special=True)
            chunks.append(Chunk("text", tokens=ids))
        if i < len(images):
            chunks.append(Chunk("image", embeds=images[i]))
    return chunks


def prefill_chunks(ctx, mtmd: MtmdModel | None, chunks: list[Chunk],
                   seq: int = 0) -> np.ndarray:
    """Feed mixed chunks into the context; returns last-position logits.

    Text chunks embed via the LLM's token table; image chunks are encoded
    embeddings. Everything concatenates into one embedding prefill."""
    model = ctx.model
    embeds = []
    for ch in chunks:
        if ch.kind == "text":
            e = np.asarray(embed_lookup(
                model.params["token_embd"],
                jnp.asarray(ch.tokens, jnp.int32), dtype=jnp.float32))
        else:
            e = ch.embeds if ch.embeds is not None else None
            if e is None:
                raise ValueError("image chunk missing embeddings")
        embeds.append(np.asarray(e, np.float32))
    full = np.concatenate(embeds, axis=0)  # [N, E]
    return ctx.prefill_embeds(full, seq=seq)


def qwen2vl_mrope_positions(segments, merge: int = 2):
    """[3, N] t/h/w position streams for a spliced sequence (transcription of
    HF Qwen2VLModel.get_rope_index). `segments` is a list of either
    ("text", n_tokens) or ("image", (t, h, w)) with raw grid dims."""
    import numpy as np

    cols = []
    st = 0
    for kind, v in segments:
        if kind == "text":
            n = int(v)
            cols.append(np.broadcast_to(np.arange(st, st + n), (3, n)))
            st = st + n
        else:
            t, h, w = (int(x) for x in v)
            gh, gw = h // merge, w // merge
            ti = np.repeat(np.arange(t), gh * gw)
            hi = np.tile(np.repeat(np.arange(gh), gw), t)
            wi = np.tile(np.arange(gw), t * gh)
            cols.append(np.stack([ti, hi, wi]) + st)
            st = st + max(t, gh, gw)
    out = np.concatenate(cols, axis=1)
    return out.astype(np.int32)
