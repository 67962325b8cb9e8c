"""Memory auto-fit: pre-estimate model + context HBM and adjust n_ctx/n_seqs.

Analog of reference common/fit.cpp (common_fit_params, common/fit.h:19-33):
estimate per-device bytes for weights, KV cache, and activation workspace,
then clamp the requested geometry to the device's free memory before any
allocation happens.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax


@dataclass
class FitReport:
    bytes_weights: int
    bytes_kv: int
    bytes_work: int
    bytes_free: int
    n_ctx: int
    n_seqs: int
    fits: bool

    def __str__(self):
        g = 1 << 30
        return (f"weights {self.bytes_weights/g:.2f} GiB + "
                f"kv {self.bytes_kv/g:.2f} GiB + work {self.bytes_work/g:.2f}"
                f" GiB vs free {self.bytes_free/g:.2f} GiB -> "
                f"{'OK' if self.fits else 'DOES NOT FIT'} "
                f"(n_ctx={self.n_ctx}, n_seqs={self.n_seqs})")


def device_free_bytes(device=None) -> int:
    """Free HBM on the target device (best effort; 0.9*total fallback)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        used = stats.get("bytes_in_use", 0)
        if limit:
            return int(limit - used)
    except Exception:
        pass
    return 16 * (1 << 30)  # v5e default HBM


def weights_bytes(params) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )


def kv_bytes_per_token(cfg, kv_dtype_size: int = 2, quantized: bool = False) -> int:
    per = cfg.n_kv_heads * (cfg.head_dim_k + cfg.head_dim_v)
    if quantized:
        return cfg.n_layers * (per + cfg.n_kv_heads * 2 * 4)  # int8 + f32 scales
    return cfg.n_layers * per * kv_dtype_size


def fit_context(
    model,
    n_ctx: int,
    n_seqs: int = 1,
    quantized_kv: bool = False,
    n_ubatch: int = 512,
    tp: int = 1,
    free_bytes: int | None = None,
) -> FitReport:
    """Clamp (n_ctx, n_seqs) so weights + KV + workspace fit. Mirrors the
    reference policy: keep n_seqs, shrink n_ctx (power-of-2 steps) first."""
    cfg = model.cfg
    bw = weights_bytes(model.params) // max(tp, 1)
    free = free_bytes if free_bytes is not None else device_free_bytes()
    # activation workspace: ubatch * n_embd * ~24 transient f32 tensors
    work = n_ubatch * cfg.n_embd * 4 * 24 + cfg.vocab_size * n_ubatch * 4
    per_tok = kv_bytes_per_token(cfg, quantized=quantized_kv) // max(tp, 1)

    ctx = n_ctx
    while ctx > 256 and bw + per_tok * ctx * n_seqs + work > free:
        ctx //= 2
    kv = per_tok * ctx * n_seqs
    return FitReport(
        bytes_weights=bw, bytes_kv=kv, bytes_work=work, bytes_free=free,
        n_ctx=ctx, n_seqs=n_seqs, fits=bw + kv + work <= free,
    )
