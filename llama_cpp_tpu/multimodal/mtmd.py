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


def _image_hw(image) -> tuple:
    """(height, width) of a PIL image or HWC array."""
    try:  # PIL: .size is (w, h)
        from PIL import Image

        if isinstance(image, Image.Image):
            return image.size[1], image.size[0]
    except ImportError:  # pragma: no cover
        pass
    return np.asarray(image).shape[:2]


@dataclass
class Chunk:
    kind: str  # "text" | "image" | "audio"
    tokens: list | None = None
    embeds: np.ndarray | None = None  # [n, n_embd_llm]
    grid: tuple | None = None  # (t, h, w) raw patch grid (mrope families)


class MtmdModel:
    def __init__(self, mmproj_path: str):
        from ..gguf.reader import read_gguf

        md = read_gguf(mmproj_path).metadata
        self.proj = str(md.get("clip.projector_type", "mlp"))
        if self.proj == "pixtral":
            from .pixtral import load_pixtral_mmproj

            self.params, self.cfg = load_pixtral_mmproj(mmproj_path)
        elif self.proj == "llama4":
            from .llama4 import load_llama4_mmproj

            self.params, self.cfg = load_llama4_mmproj(mmproj_path)
        elif self.proj in ("qwen2vl_merger", "qwen2.5vl_merger"):
            from .qwen2vl import load_qwen2vl_mmproj

            self.params, self.cfg = load_qwen2vl_mmproj(mmproj_path)
        elif self.proj == "qwen3vl_merger":
            from .qwen2vl import load_qwen3vl_mmproj

            self.params, self.cfg = load_qwen3vl_mmproj(mmproj_path)
        elif self.proj == "glm4v":
            from .glm4v import load_glm4v_mmproj

            self.params, self.cfg = load_glm4v_mmproj(mmproj_path)
        else:
            self.cfg, self.params = load_mmproj(mmproj_path)
        # audio tower shares the mmproj file (reference: one clip_ctx per
        # modality, clip.has_audio_encoder)
        self.audio_cfg = None
        self.audio_params = None
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
        if self.proj == "pixtral":
            return self._encode_pixtral(image)
        if self.proj == "llama4":
            return self._encode_llama4(image)
        if self.proj in ("qwen2vl_merger", "qwen2.5vl_merger",
                         "qwen3vl_merger", "glm4v"):
            return self._encode_qwen2vl(image)
        px = preprocess_image(image, self.cfg)
        return self.encode_pixels(px[None])[0]

    def _resize_chw(self, image, side_h: int, side_w: int) -> np.ndarray:
        """PIL / array -> normalized [3, H, W] f32."""
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        image = image.convert("RGB").resize((side_w, side_h), Image.BICUBIC)
        a = np.asarray(image, np.float32) / 255.0
        mean = np.asarray(self.cfg.image_mean, np.float32)
        std = np.asarray(self.cfg.image_std, np.float32)
        return np.ascontiguousarray(((a - mean) / std).transpose(2, 0, 1))

    def _encode_pixtral(self, image) -> np.ndarray:
        """Longest side capped at image_size, snapped to patch*merge
        multiples (mtmd pixtral preprocessing), [IMG_BREAK] rows appended
        when the token embedding is present."""
        import jax.numpy as jnp

        from .pixtral import arrange_with_img_break, extract_patches
        from .pixtral import vit_forward as pixtral_forward

        cfg = self.cfg
        ps = cfg.patch_size
        unit = ps * max(cfg.n_merge, 1)
        h0, w0 = _image_hw(image)
        scale = min(1.0, cfg.image_size / max(h0, w0))
        gh = max(1, round(h0 * scale / unit)) * (unit // ps)
        gw = max(1, round(w0 * scale / unit)) * (unit // ps)
        px = self._resize_chw(image, gh * ps, gw * ps)
        patches = extract_patches(px, ps)
        out = pixtral_forward(self.params, cfg, jnp.asarray(patches),
                              [(gh, gw)])
        if "img_break" in self.params:
            k = max(cfg.n_merge, 1)
            out = arrange_with_img_break(out, gw // k, gh // k,
                                         self.params["img_break"])
        return np.asarray(out, np.float32)

    def _encode_llama4(self, image) -> np.ndarray:
        import jax.numpy as jnp

        from .llama4 import vit_forward as llama4_forward
        from .pixtral import extract_patches

        cfg = self.cfg
        px = self._resize_chw(image, cfg.image_size, cfg.image_size)
        patches = extract_patches(px, cfg.patch_size)
        out = llama4_forward(self.params, cfg, jnp.asarray(patches))
        return np.asarray(out, np.float32)

    def _encode_qwen2vl(self, image) -> np.ndarray:
        """Snap to patch*merge multiples (capped near 1024px), temporal-dup
        patches, merge-window row ordering (HF Qwen2VLImageProcessor)."""
        import jax.numpy as jnp

        from .qwen2vl import vit_forward as qwen_forward

        cfg = self.cfg
        ps, mg = cfg.patch_size, cfg.spatial_merge_size
        unit = ps * mg
        h0, w0 = _image_hw(image)
        scale = min(1.0, 1024 / max(h0, w0))
        gh = max(mg, round(h0 * scale / unit) * mg)
        gw = max(mg, round(w0 * scale / unit) * mg)
        px = self._resize_chw(image, gh * ps, gw * ps)  # [3, H, W]
        # [grid_h, grid_w, C, tp, ps, ps] rows in merge-window order
        C = px.shape[0]
        g = px.reshape(C, gh, ps, gw, ps).transpose(1, 3, 0, 2, 4)
        g = np.repeat(g[:, :, :, None], cfg.temporal_patch_size, axis=3)
        g = g.reshape(gh // mg, mg, gw // mg, mg, -1).transpose(0, 2, 1, 3, 4)
        patches = g.reshape(gh * gw, -1)
        if self.proj == "glm4v":
            from .glm4v import vit_forward as glm4v_forward

            out = glm4v_forward(self.params, cfg, jnp.asarray(patches),
                                [(1, gh, gw)])
        elif self.proj == "qwen3vl_merger":
            from .qwen2vl import qwen3vl_forward

            out, ds = qwen3vl_forward(self.params, cfg,
                                      jnp.asarray(patches), [(1, gh, gw)])
            if ds is not None:  # wide rows: [out | deepstack taps]
                out = jnp.concatenate([out, ds], axis=-1)
        else:
            out = qwen_forward(self.params, cfg, jnp.asarray(patches),
                               [(1, gh, gw)])
        # (embeds, raw patch grid): the grid rides along so prefill_chunks
        # can compute the M-RoPE position streams
        return np.asarray(out, np.float32), (1, gh, gw)

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
            im = images[i]
            if isinstance(im, tuple):  # (embeds, raw patch grid)
                chunks.append(Chunk("image", embeds=im[0], grid=im[1]))
            else:
                chunks.append(Chunk("image", embeds=im))
    return chunks


def prefill_chunks(ctx, mtmd: MtmdModel | None, chunks: list[Chunk],
                   seq: int = 0) -> np.ndarray:
    """Feed mixed chunks into the context; returns last-position logits.

    Text chunks embed via the LLM's token table; image chunks are encoded
    embeddings. Everything concatenates into one embedding prefill."""
    model = ctx.model
    mrope = None
    if (ctx.cfg.extra.get("mrope_sections")
            and any(c.kind == "image" for c in chunks)):
        # qwen2vl-family: image rows carry per-stream t/h/w rope positions
        # (HF get_rope_index); cache slots + causal masking stay row-major,
        # only the rotation reads the streams. After the prefill the
        # context records the rope-vs-row delta for text continuation.
        merge = getattr(mtmd.cfg, "spatial_merge_size", 2) if mtmd else 2
        segs = []
        for ch in chunks:
            if ch.kind == "text":
                segs.append(("text", len(ch.tokens)))
            else:
                if ch.grid is None:
                    raise ValueError(
                        "mrope image chunk missing its patch grid")
                segs.append(("image", ch.grid))
        mrope = qwen2vl_mrope_positions(segs, merge=merge)
        # continue from the sequence's current rope position
        mrope = mrope + int(ctx.seq_len[seq] + ctx.mrope_delta[seq])
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
    # qwen3vl deepstack: image rows are [E | taps]-wide; text rows widen
    # with zero tap slices (the forward adds slice il to layer il's output)
    width = max(e.shape[-1] for e in embeds)
    for i, e in enumerate(embeds):
        if e.shape[-1] < width:
            pad = np.zeros((e.shape[0], width - e.shape[-1]), np.float32)
            embeds[i] = np.concatenate([e, pad], axis=-1)
    full = np.concatenate(embeds, axis=0)  # [N, E or (1+n_ds)*E]
    return ctx.prefill_embeds(full, seq=seq, mrope=mrope)


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
