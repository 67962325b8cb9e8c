"""Rotary position embeddings: NORM (adjacent pairs) and NEOX (half-split)
styles plus YaRN scaling.

Semantics parity: reference ggml GGML_OP_ROPE (ggml/src/ggml-cpu/ops.cpp
ggml_compute_forward_rope_f32, ggml_rope_yarn corrections). GGUF llama weights
are stored permuted for NORM-style rope; NEOX style is used by most newer
archs (qwen, gemma, ...). YaRN follows the ggml_rope_yarn ramp/mscale math.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

ROPE_TYPE_NONE = -1
ROPE_TYPE_NORM = 0
ROPE_TYPE_NEOX = 2


@dataclass(frozen=True)
class RopeParams:
    rope_type: int = ROPE_TYPE_NORM
    n_dims: int = 0  # rotated dims (<= head_dim)
    freq_base: float = 10000.0
    freq_scale: float = 1.0  # 1/scaling_factor for linear scaling
    ext_factor: float = 0.0  # YaRN extrapolation mix (0 = off)
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    orig_ctx: int = 0  # original training context for YaRN
    # optional per-pair frequency divisors [n_dims/2] (ggml freq_factors:
    # rope_yarn(theta_base / ff) — longrope / gemma4 proportional rope)
    freq_factors: object = None


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    # inverse of: 2pi * x^(-2d/D) * L = n_rot  (ggml rope_yarn_corr_dim)
    return (
        n_dims
        * math.log(n_ctx_orig / (n_rot * 2 * math.pi))
        / (2 * math.log(base))
    )


def rope_freqs_and_scale(p: RopeParams, head_dim: int):
    """Per-pair inverse frequencies [n_dims/2] and the YaRN magnitude scale.

    Returns (inv_freq_interp, inv_freq_extrap, ramp_mix, mscale): the applied
    frequency is mix(interp, extrap) per ggml_rope_yarn.
    """
    n_dims = p.n_dims or head_dim
    half = n_dims // 2
    # theta for pair i: base^(-2i/n_dims)
    exponent = jnp.arange(half, dtype=jnp.float32) * (2.0 / n_dims)
    theta_extrap = jnp.power(jnp.float32(p.freq_base), -exponent)
    if p.freq_factors is not None:
        theta_extrap = theta_extrap / jnp.asarray(
            p.freq_factors, jnp.float32)[:half]
    theta_interp = p.freq_scale * theta_extrap
    mscale = p.attn_factor
    if p.ext_factor != 0.0 and p.orig_ctx > 0:
        lo = _yarn_corr_dim(n_dims, p.orig_ctx, p.beta_fast, p.freq_base)
        hi = _yarn_corr_dim(n_dims, p.orig_ctx, p.beta_slow, p.freq_base)
        lo = max(0.0, math.floor(lo))
        hi = min(n_dims - 1, math.ceil(hi))
        i = jnp.arange(half, dtype=jnp.float32) * 2.0
        denom = max(hi - lo, 0.001)
        ramp = jnp.clip((i - lo) / denom, 0.0, 1.0)
        ramp_mix = (1.0 - ramp) * p.ext_factor
        mscale = p.attn_factor * (1.0 + 0.1 * math.log(1.0 / p.freq_scale))
    else:
        ramp_mix = jnp.zeros((half,), dtype=jnp.float32)
    return theta_interp, theta_extrap, ramp_mix, jnp.float32(mscale)


def apply_rope(
    x: jnp.ndarray,  # [..., seq, n_heads, head_dim]
    positions: jnp.ndarray,  # [..., seq]
    p: RopeParams,
) -> jnp.ndarray:
    """Rotate the first p.n_dims dims of each head."""
    head_dim = x.shape[-1]
    n_dims = p.n_dims or head_dim
    half = n_dims // 2
    theta_i, theta_e, ramp_mix, mscale = rope_freqs_and_scale(p, head_dim)
    # effective theta per ggml rope_yarn: interp*(1-mix) + extrap*mix
    inv_freq = theta_i * (1.0 - ramp_mix) + theta_e * ramp_mix  # [half]
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., seq, half]
    cos = (jnp.cos(angles) * mscale)[..., None, :]  # [..., seq, 1, half]
    sin = (jnp.sin(angles) * mscale)[..., None, :]

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if p.rope_type == ROPE_TYPE_NEOX:
        x0 = xf[..., :half]
        x1 = xf[..., half:n_dims]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.concatenate([r0, r1], axis=-1)
    else:  # NORM: adjacent pairs
        xr = xf[..., :n_dims].reshape(*xf.shape[:-1], half, 2)
        x0 = xr[..., 0]
        x1 = xr[..., 1]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.stack([r0, r1], axis=-1).reshape(*xf.shape[:-1], n_dims)
    if n_dims < head_dim:
        rotated = jnp.concatenate([rotated, xf[..., n_dims:]], axis=-1)
    return rotated.astype(orig_dtype)


def apply_mrope(
    x: jnp.ndarray,  # [..., seq, n_heads, head_dim]
    positions3: jnp.ndarray,  # [3, ..., seq] (t, h, w position streams)
    sections: tuple[int, ...],  # frequency-pair counts per stream
    p: RopeParams,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Multimodal rope (reference ggml GGML_ROPE_TYPE_MROPE /
    ggml_rope_multi; HF qwen2-vl apply_multimodal_rotary_pos_emb): each
    frequency pair takes its angle from one of the t/h/w position streams,
    partitioned by `sections`. NEOX (half-split) rotation layout.

    interleaved=True is GGML_ROPE_TYPE_IMROPE (qwen3vl family,
    ggml-cpu/ops.cpp:5898-5907): pair s uses stream h when s%3==1 (while
    s < 3*sections[1]), w when s%3==2, t when s%3==0, else the 4th stream."""
    head_dim = x.shape[-1]
    n_dims = p.n_dims or head_dim
    half = n_dims // 2
    theta_i, theta_e, ramp_mix, mscale = rope_freqs_and_scale(p, head_dim)
    inv_freq = theta_i * (1.0 - ramp_mix) + theta_e * ramp_mix  # [half]

    n_streams = int(positions3.shape[0])
    # stream selector per frequency pair
    if interleaved:
        if n_streams < 4:
            # the reference's 4th ("extra") stream is ZERO for text tokens
            # (llama-graph.cpp:138) — sectors routed there stay unrotated
            zero = jnp.zeros((4 - n_streams,) + positions3.shape[1:],
                             positions3.dtype)
            positions3 = jnp.concatenate([positions3, zero], axis=0)
        sel = []
        for s in range(half):
            if s % 3 == 1 and s < 3 * sections[1]:
                sel.append(1)
            elif s % 3 == 2 and s < 3 * sections[2]:
                sel.append(2)
            elif s % 3 == 0 and s < 3 * sections[0]:
                sel.append(0)
            else:
                sel.append(3)
    else:
        sel = []
        for si, n in enumerate(sections):
            sel += [min(si, n_streams - 1)] * n
        sel += [0] * (half - len(sel))
    sel = jnp.asarray(sel[:half], jnp.int32)  # [half]

    # angles per stream then gather: [3, ..., seq, half] -> [..., seq, half]
    ang = positions3[..., None].astype(jnp.float32) * inv_freq
    angles = jnp.take_along_axis(
        jnp.moveaxis(ang, 0, -1),  # [..., seq, half, 3]
        jnp.broadcast_to(sel[:, None], ang.shape[1:] + (1,)), axis=-1,
    )[..., 0]
    cos = (jnp.cos(angles) * mscale)[..., None, :]
    sin = (jnp.sin(angles) * mscale)[..., None, :]

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., :half]
    x1 = xf[..., half:n_dims]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    rotated = jnp.concatenate([r0, r1], axis=-1)
    if n_dims < head_dim:
        rotated = jnp.concatenate([rotated, xf[..., n_dims:]], axis=-1)
    return rotated.astype(orig_dtype)
