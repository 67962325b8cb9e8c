"""Pallas flash attention over the slot-table KV cache.

TPU replacement for the reference's FLASH_ATTN_EXT kernel family (CUDA
fattn.cu tile/vec/MMA variants chosen at runtime, ggml/src/ggml-cuda/fattn.cu:
331-358): one online-softmax kernel serves prefill and decode, GQA/MQA,
sliding-window masks, gemma-style logit softcaps, gpt-oss attention sinks, and
int8-quantized KV (type_k/type_v analog, include/llama.h:379).

Layout contract (chosen so no transposes happen inside the kernel):
  q        [B, Hkv, R, D]    R = gqa_groups * T query rows, bf16/f32
  k, v     [B, Hkv, S, D]    the KV cache slot axis S streamed in bs tiles
  row_pos  [B, R, 1] int32   rope position per q row (-1 = padding row)
  col_pos  [B, 1, S] int32   position per KV slot  (-1 = empty slot)
  sinks    [Hkv, R, 1] f32   optional per-row attention-sink logit
  k_scale  [B, Hkv, 1, S]    optional per-slot int8 scales; applied as a
  v_scale  [B, Hkv, 1, S]    lane-broadcast on the scores / P matrix, so the
                             int8 payload feeds the MXU without per-element
                             dequant (s = (q @ kq^T) * ks;  o = (p * vs) @ vq).

The mask is derived from positions only: valid = col_pos >= 0, causal =
col_pos <= row_pos, window = col_pos > row_pos - w. Rows whose columns are all
masked (padding) produce garbage that callers discard; masked-but-later-valid
rows self-heal through the online-softmax rescale (alpha underflows to 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e30
LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fa_kernel(
    lim_ref,
    q_ref,
    k_ref,
    v_ref,
    rp_ref,
    cp_ref,
    *rest,
    sm_scale: float,
    window: int,
    softcap: float,
    quantized: bool,
    has_sinks: bool,
    bs: int,
    dv: int,
):
    idx = 0
    ks_ref = vs_ref = sinks_ref = None
    if quantized:
        ks_ref, vs_ref = rest[idx], rest[idx + 1]
        idx += 2
    if has_sinks:
        sinks_ref = rest[idx]
        idx += 1
    out_ref, m_ref, l_ref, acc_ref = rest[idx], rest[idx + 1], rest[idx + 2], rest[idx + 3]

    s_idx = pl.program_id(3)
    n_s = pl.num_programs(3)
    br = q_ref.shape[2]

    @pl.when(s_idx == 0)
    def _init():
        if has_sinks:
            # sink = an extra always-on logit per row: m0 = sink, l0 = e^0 = 1
            m_ref[...] = jnp.broadcast_to(
                sinks_ref[0].astype(jnp.float32), (br, LANES)
            )
            l_ref[...] = jnp.ones_like(l_ref)
        else:
            m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # causal block-skip: KV tiles past this row-block's live limit were never
    # DMA'd (their index_map re-references block lim-1), so computing on them
    # would double-count — the strict s_idx < lim gate is a correctness
    # requirement. The nested jnp.any(mask) gate additionally skips
    # fully-masked live tiles (window left edge, empty slots) and keeps dead
    # steps free of even the VPU mask work.
    live = s_idx < lim_ref[pl.program_id(0), pl.program_id(2)]

    @pl.when(live)
    def _tile():
        rp = rp_ref[0]  # [br, 1] int32
        cp = cp_ref[0]  # [1, bs] int32
        mask = (cp >= 0) & (cp <= rp)
        if window > 0:
            mask = mask & (cp > rp - window)

        @pl.when(jnp.any(mask))
        def _inner():
            _fa_tile(q_ref, k_ref, v_ref, ks_ref, vs_ref,
                     m_ref, l_ref, acc_ref, mask,
                     sm_scale=sm_scale, softcap=softcap,
                     quantized=quantized, bs=bs, dv=dv)

    def _to_dv(stat128):  # [br, 128] lane-replicated stat -> [br, Dv]
        if dv >= LANES:
            return pltpu.repeat(stat128, dv // LANES, axis=1)
        return stat128[:, :dv]

    @pl.when(s_idx == n_s - 1)
    def _store():
        l = l_ref[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out_ref[0, 0] = (acc_ref[...] * _to_dv(l_inv)).astype(out_ref.dtype)


def _fa_tile(q_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref, l_ref, acc_ref, mask,
             *, sm_scale, softcap, quantized, bs, dv):
    q = q_ref[0, 0]  # [br, D]
    k = k_ref[0, 0]  # [bs, D]
    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [br, bs]
    if quantized:
        s = s * ks_ref[0, 0].astype(jnp.float32)  # [1, bs] col scales
    s = s * sm_scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    s = jnp.where(mask, s, MASK_VALUE)

    m_prev = m_ref[...]  # [br, 128] (all lanes equal)
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [br, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # [br, 128]
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - pltpu.repeat(m_next, bs // LANES, axis=1))
    l_curr = jnp.sum(p, axis=1, keepdims=True)  # [br, 1]
    l_ref[...] = alpha * l_prev + l_curr
    m_ref[...] = m_next

    if quantized:
        p = p * vs_ref[0, 0].astype(jnp.float32)  # fold v scales in P cols
    v = v_ref[0, 0]
    o_curr = jnp.dot(
        p.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [br, Dv]

    def _to_dv(stat128):  # [br, 128] lane-replicated stat -> [br, Dv]
        if dv >= LANES:
            return pltpu.repeat(stat128, dv // LANES, axis=1)
        return stat128[:, :dv]

    acc_ref[...] = acc_ref[...] * _to_dv(alpha) + o_curr


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "window", "softcap", "block_r", "block_s", "interpret",
        "ring",
    ),
)
def flash_attention(
    q: jnp.ndarray,  # [B, Hkv, R, D]
    k: jnp.ndarray,  # [B, Hkv, S, D]
    v: jnp.ndarray,  # [B, Hkv, S, Dv]
    row_pos: jnp.ndarray,  # [B, R] int32
    col_pos: jnp.ndarray,  # [B, S] int32
    sinks: jnp.ndarray | None = None,  # [Hkv, R] f32
    k_scale: jnp.ndarray | None = None,  # [B, Hkv, S] f32
    v_scale: jnp.ndarray | None = None,
    *,
    sm_scale: float,
    window: int = 0,
    softcap: float = 0.0,
    block_r: int = 0,
    block_s: int = 0,
    interpret: bool = False,
    ring: bool = False,
) -> jnp.ndarray:
    """-> [B, Hkv, R, Dv] f32. Requires D, Dv multiples of 128 and S a
    multiple of 128 (Context sizes the slot table accordingly). `ring` marks
    a wrapped slot table (slot != position order) — disables the causal
    tile clamp, keeping only the in-kernel mask skip."""
    B, Hkv, R, D = q.shape
    S = k.shape[2]
    Dv = v.shape[3]
    assert (D % LANES == 0 or D in (32, 64)) and S % LANES == 0, (D, S)
    assert Dv % LANES == 0 or Dv in (32, 64), Dv

    br = block_r or (256 if R % 256 == 0 and R >= 1024
         else min(128, _round_up(R, 16)))
    Rp = _round_up(R, br)
    bs = block_s or next(b for b in (512, 256, 128) if S % b == 0)

    if Rp != R:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
        row_pos = jnp.pad(row_pos, ((0, 0), (0, Rp - R)), constant_values=-1)
        if sinks is not None:
            sinks = jnp.pad(sinks, ((0, 0), (0, Rp - R)))

    rp3 = row_pos.reshape(B, Rp, 1)
    cp3 = col_pos.reshape(B, 1, S)

    quantized = k_scale is not None
    has_sinks = sinks is not None

    # per-(batch, row-block) live KV-tile count: causally, no column past the
    # block's max row position can be live, so tiles beyond it are neither
    # DMA'd (index_map clamps to the last live block -> copy elided) nor
    # computed (kernel gates on s_idx < lim)
    if ring:  # wrapped slots: any tile may hold live columns
        lim = jnp.full((B, Rp // br), S // bs, jnp.int32)
    else:
        rmax = row_pos.reshape(B, Rp // br, br).max(axis=-1)  # [B, nr]
        lim = jnp.clip(rmax // bs + 1, 1, S // bs).astype(jnp.int32)

    grid = (B, Hkv, Rp // br, S // bs)

    def kv_map(b, h, r, s, lim):
        return (b, h, jnp.minimum(s, lim[b, r] - 1), 0)

    def cp_map(b, h, r, s, lim):
        return (b, 0, jnp.minimum(s, lim[b, r] - 1))

    def sc_map(b, h, r, s, lim):
        return (b, h, 0, jnp.minimum(s, lim[b, r] - 1))

    in_specs = [
        pl.BlockSpec((1, 1, br, D), lambda b, h, r, s, lim: (b, h, r, 0)),
        pl.BlockSpec((1, 1, bs, D), kv_map),
        pl.BlockSpec((1, 1, bs, Dv), kv_map),
        pl.BlockSpec((1, br, 1), lambda b, h, r, s, lim: (b, r, 0)),
        pl.BlockSpec((1, 1, bs), cp_map),
    ]
    args = [q, k, v, rp3, cp3]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, 1, bs), sc_map))
        in_specs.append(pl.BlockSpec((1, 1, 1, bs), sc_map))
        args.append(k_scale.reshape(B, Hkv, 1, S))
        args.append(v_scale.reshape(B, Hkv, 1, S))
    if has_sinks:
        in_specs.append(pl.BlockSpec((1, br, 1), lambda b, h, r, s, lim: (h, r, 0)))
        args.append(sinks.reshape(Hkv, Rp, 1).astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, br, Dv), lambda b, h, r, s, lim: (b, h, r, 0)),
        scratch_shapes=[
            pltpu.VMEM((br, LANES), jnp.float32),
            pltpu.VMEM((br, LANES), jnp.float32),
            pltpu.VMEM((br, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fa_kernel,
            sm_scale=float(sm_scale),
            window=int(window),
            softcap=float(softcap),
            quantized=quantized,
            has_sinks=has_sinks,
            bs=bs,
            dv=Dv,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Rp, Dv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * Rp * S * (D + Dv),
            bytes_accessed=(
                B * Hkv * (Rp * D * 2 + S * (D + Dv) * k.dtype.itemsize + Rp * Dv * 4)
            ),
            transcendentals=B * Hkv * Rp * S,
        ),
        interpret=interpret,
    )(lim, *args)
    return out[:, :, :R]


# ---------------------------------------------------------------------------
# paged variant: KV tiles resolved through a scalar-prefetched page table
# ---------------------------------------------------------------------------
#
# The grid folds ALL KV heads into one step (grid = B x row-blocks x pages,
# loop over Hkv inside the kernel) instead of a per-head grid axis. TPU
# Pallas grids execute sequentially on the TensorCore, so at decode shapes
# (R = gqa a handful of rows) a per-head grid is pure per-step latency:
# 8 heads x 5 live pages = 40 steps of ~6 us overhead each dwarfs the
# ~0.2 ms/layer the bytes actually cost. Folding heads cuts steps 8x and
# makes each K/V DMA Hkv x page x D (~1 MB) instead of 128 KB, and the
# position mask is computed once per page instead of once per (head, page).


def _allheads_update(q_ref, kget, vget, ksget, vsget, mask,
                     m_ref, l_ref, acc_ref, *,
                     sm_scale, softcap, quantized, bs, dv):
    """One online-softmax tile update for every KV head (static unroll).
    kget(h)/vget(h) -> [bs, D]/[bs, Dv]; ksget(h)/vsget(h) -> [bs] scales."""
    n_h = q_ref.shape[1]
    for h in range(n_h):
        q = q_ref[0, h]  # [br, D]
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), kget(h).astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [br, bs]
        if quantized:
            s = s * ksget(h)[None, :].astype(jnp.float32)
        s = s * sm_scale
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_ref[h]  # [br, 128]
        l_prev = l_ref[h]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - pltpu.repeat(m_next, bs // LANES, axis=1))
        l_ref[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[h] = m_next

        if quantized:
            p = p * vsget(h)[None, :].astype(jnp.float32)
        o_curr = jnp.dot(
            p.astype(jnp.bfloat16),
            vget(h).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)  # [br, Dv]

        def _to_dv(stat128):
            if dv >= LANES:
                return pltpu.repeat(stat128, dv // LANES, axis=1)
            return stat128[:, :dv]

        acc_ref[h] = acc_ref[h] * _to_dv(alpha) + o_curr


def _fa_kernel_allheads(
    lim_ref,
    q_ref,  # [1, Hkv, br, D]
    k_ref,  # [Hkv, 1, page, D]
    v_ref,  # [Hkv, 1, page, Dv]
    rp_ref,  # [1, br, 1]
    cp_ref,  # [1, 1, page]
    *rest,
    sm_scale: float,
    window: int,
    softcap: float,
    quantized: bool,
    has_sinks: bool,
    bs: int,
    dv: int,
    wbs: int = 0,  # decode-window tail width (0 = no window operands)
):
    idx = 0
    ks_ref = vs_ref = sinks_ref = None
    wk_ref = wv_ref = wp_ref = wks_ref = wvs_ref = None
    if quantized:
        ks_ref, vs_ref = rest[idx], rest[idx + 1]  # [Hkv, 1, 1, page]
        idx += 2
    if has_sinks:
        sinks_ref = rest[idx]  # [Hkv, br, 1]
        idx += 1
    if wbs:
        wk_ref, wv_ref = rest[idx], rest[idx + 1]  # [1, Hkv, W, D]
        wp_ref = rest[idx + 2]  # [1, 1, W]
        idx += 3
        if quantized:
            wks_ref, wvs_ref = rest[idx], rest[idx + 1]  # [1, Hkv, 1, W]
            idx += 2
    out_ref, m_ref, l_ref, acc_ref = (
        rest[idx], rest[idx + 1], rest[idx + 2], rest[idx + 3])

    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _init():
        if has_sinks:
            m_ref[...] = jnp.broadcast_to(
                sinks_ref[...].astype(jnp.float32), m_ref.shape)
            l_ref[...] = jnp.ones_like(l_ref)
        else:
            m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # page steps: s_idx < lim <= n_pages; with a window tail the final grid
    # step (s_idx == n_s - 1 == n_pages) is never a live page step
    live = s_idx < lim_ref[pl.program_id(0), pl.program_id(1)]
    rp = rp_ref[0]  # [br, 1]

    @pl.when(live)
    def _tile():
        cp = cp_ref[0]  # [1, page]
        mask = (cp >= 0) & (cp <= rp)
        if window > 0:
            mask = mask & (cp > rp - window)

        @pl.when(jnp.any(mask))
        def _inner():
            _allheads_update(
                q_ref, lambda h: k_ref[h, 0], lambda h: v_ref[h, 0],
                lambda h: ks_ref[h, 0, 0] if quantized else None,
                lambda h: vs_ref[h, 0, 0] if quantized else None,
                mask, m_ref, l_ref, acc_ref,
                sm_scale=sm_scale, softcap=softcap, quantized=quantized,
                bs=bs, dv=dv)

    if wbs:
        @pl.when(s_idx == n_s - 1)
        def _wtile():
            wp = wp_ref[0]  # [1, W]
            wmask = (wp >= 0) & (wp <= rp)
            if window > 0:
                wmask = wmask & (wp > rp - window)

            @pl.when(jnp.any(wmask))
            def _winner():
                _allheads_update(
                    q_ref, lambda h: wk_ref[0, h], lambda h: wv_ref[0, h],
                    lambda h: wks_ref[0, h, 0] if quantized else None,
                    lambda h: wvs_ref[0, h, 0] if quantized else None,
                    wmask, m_ref, l_ref, acc_ref,
                    sm_scale=sm_scale, softcap=softcap, quantized=quantized,
                    bs=wbs, dv=dv)

    def _to_dv(stat128):
        if dv >= LANES:
            return pltpu.repeat(stat128, dv // LANES, axis=1)
        return stat128[:, :dv]

    @pl.when(s_idx == n_s - 1)
    def _store():
        n_h = q_ref.shape[1]
        for h in range(n_h):
            l = l_ref[h]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out_ref[0, h] = (acc_ref[h] * _to_dv(l_inv)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "window", "softcap", "page", "interpret"),
)
def flash_attention_paged(
    q: jnp.ndarray,  # [B, Hkv, R, D]
    k4: jnp.ndarray,  # [Hkv, P, page, D] page pool (this layer's)
    v4: jnp.ndarray,  # [Hkv, P, page, Dv]
    row_pos: jnp.ndarray,  # [B, R] int32
    pos3: jnp.ndarray,  # [P, 1, page] int32 per-row position labels
    table_b: jnp.ndarray,  # [B, MP] int32 page ids per batch row
    sinks: jnp.ndarray | None = None,  # [Hkv, R] f32
    k_scale4: jnp.ndarray | None = None,  # [Hkv, P, 1, page] f32
    v_scale4: jnp.ndarray | None = None,
    wk: jnp.ndarray | None = None,  # [B, Hkv, W, D] decode-window tail
    wv: jnp.ndarray | None = None,  # [B, Hkv, W, Dv]
    wpos: jnp.ndarray | None = None,  # [B, W] int32 (-1 = unfilled)
    wks: jnp.ndarray | None = None,  # [B, Hkv, W] f32
    wvs: jnp.ndarray | None = None,
    *,
    sm_scale: float,
    window: int = 0,
    softcap: float = 0.0,
    page: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention straight off the paged pool (runtime/paged_kv.py):
    the KV tile for grid step s of batch row b is page table_b[b, s] — the
    page table rides scalar prefetch and drives the K/V index_maps, so no
    gathered per-sequence KV copy is ever materialized (the paged analog of
    the reference reading the unified cell buffer in place). KV tile size ==
    page size. -> [B, Hkv, R, Dv] f32."""
    Hkv, P_, page_, D = k4.shape
    Dv = v4.shape[3]
    B, _, R, _ = q.shape
    MP = table_b.shape[1]
    assert page % LANES == 0

    br = min(128, _round_up(R, 16))
    Rp = _round_up(R, br)
    if Rp != R:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
        row_pos = jnp.pad(row_pos, ((0, 0), (0, Rp - R)), constant_values=-1)
        if sinks is not None:
            sinks = jnp.pad(sinks, ((0, 0), (0, Rp - R)))

    rp3 = row_pos.reshape(B, Rp, 1)
    quantized = k_scale4 is not None
    has_sinks = sinks is not None
    windowed = wk is not None
    W = wk.shape[2] if windowed else 0

    # page table entries are position-ordered (table[b, j] covers positions
    # [j*page, (j+1)*page)), so the causal live-tile clamp applies unchanged
    rmax = row_pos.reshape(B, Rp // br, br).max(axis=-1)
    lim = jnp.clip(rmax // page + 1, 1, MP).astype(jnp.int32)

    # fold all KV heads into one grid step when the K+V page tile fits VMEM
    # (double-buffered); otherwise fall back to a per-head grid axis
    kv_tile = Hkv * page * (D + Dv) * k4.dtype.itemsize
    fold = kv_tile <= 4 * 1024 * 1024
    assert not windowed or fold, "decode-window tail requires the fold path"
    assert W % LANES == 0 or W == 0, W

    if fold:
        # with a decode window, one extra grid step processes the window
        # tail (the rows of the chunk in flight, not yet spliced into pages)
        grid = (B, Rp // br, MP + (1 if windowed else 0))

        def kv_map(b, r, s, lim, tab):
            return (0, tab[b, jnp.minimum(s, lim[b, r] - 1)], 0, 0)

        kv_spec = pl.BlockSpec((Hkv, 1, page, D), kv_map)
        vv_spec = pl.BlockSpec((Hkv, 1, page, Dv), kv_map)
        ks_spec = pl.BlockSpec((Hkv, 1, 1, page), kv_map)

        def cp_map(b, r, s, lim, tab):
            return (tab[b, jnp.minimum(s, lim[b, r] - 1)], 0, 0)

        in_specs = [
            pl.BlockSpec((1, Hkv, br, D), lambda b, r, s, lim, tab: (b, 0, r, 0)),
            kv_spec,
            vv_spec,
            pl.BlockSpec((1, br, 1), lambda b, r, s, lim, tab: (b, r, 0)),
            pl.BlockSpec((1, 1, page), cp_map),
        ]
        args = [q, k4, v4, rp3, pos3]
        if quantized:
            in_specs.append(ks_spec)
            in_specs.append(ks_spec)
            args.append(k_scale4)
            args.append(v_scale4)
        if has_sinks:
            in_specs.append(
                pl.BlockSpec((Hkv, br, 1), lambda b, r, s, lim, tab: (0, r, 0)))
            args.append(sinks.reshape(Hkv, Rp, 1).astype(jnp.float32))
        if windowed:
            wmap = lambda b, r, s, lim, tab: (b, 0, 0, 0)  # noqa: E731
            in_specs.append(pl.BlockSpec((1, Hkv, W, D), wmap))
            in_specs.append(pl.BlockSpec((1, Hkv, W, Dv), wmap))
            in_specs.append(pl.BlockSpec(
                (1, 1, W), lambda b, r, s, lim, tab: (b, 0, 0)))
            args += [wk, wv, wpos.reshape(B, 1, W)]
            if quantized:
                in_specs.append(pl.BlockSpec((1, Hkv, 1, W), wmap))
                in_specs.append(pl.BlockSpec((1, Hkv, 1, W), wmap))
                args += [wks.reshape(B, Hkv, 1, W),
                         wvs.reshape(B, Hkv, 1, W)]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, Hkv, br, Dv), lambda b, r, s, lim, tab: (b, 0, r, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv, br, LANES), jnp.float32),
                pltpu.VMEM((Hkv, br, LANES), jnp.float32),
                pltpu.VMEM((Hkv, br, Dv), jnp.float32),
            ],
        )

        def body(lim_ref, tab_ref, *refs):
            _fa_kernel_allheads(
                lim_ref, *refs,
                sm_scale=float(sm_scale), window=int(window),
                softcap=float(softcap), quantized=quantized,
                has_sinks=has_sinks, bs=page, dv=Dv, wbs=W)

        dims = ("parallel", "parallel", "arbitrary")
    else:
        grid = (B, Hkv, Rp // br, MP)

        def kv_map(b, h, r, s, lim, tab):
            return (h, tab[b, jnp.minimum(s, lim[b, r] - 1)], 0, 0)

        kv_spec = pl.BlockSpec((1, 1, page, D), kv_map)
        vv_spec = pl.BlockSpec((1, 1, page, Dv), kv_map)
        ks_spec = pl.BlockSpec((1, 1, 1, page), kv_map)

        def cp_map(b, h, r, s, lim, tab):
            return (tab[b, jnp.minimum(s, lim[b, r] - 1)], 0, 0)

        in_specs = [
            pl.BlockSpec((1, 1, br, D), lambda b, h, r, s, lim, tab: (b, h, r, 0)),
            kv_spec,
            vv_spec,
            pl.BlockSpec((1, br, 1), lambda b, h, r, s, lim, tab: (b, r, 0)),
            pl.BlockSpec((1, 1, page), cp_map),
        ]
        args = [q, k4, v4, rp3, pos3]
        if quantized:
            in_specs.append(ks_spec)
            in_specs.append(ks_spec)
            args.append(k_scale4)
            args.append(v_scale4)
        if has_sinks:
            in_specs.append(
                pl.BlockSpec((1, br, 1), lambda b, h, r, s, lim, tab: (h, r, 0)))
            args.append(sinks.reshape(Hkv, Rp, 1).astype(jnp.float32))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, br, Dv), lambda b, h, r, s, lim, tab: (b, h, r, 0)),
            scratch_shapes=[
                pltpu.VMEM((br, LANES), jnp.float32),
                pltpu.VMEM((br, LANES), jnp.float32),
                pltpu.VMEM((br, Dv), jnp.float32),
            ],
        )

        def body(lim_ref, tab_ref, *refs):
            _fa_kernel(lim_ref, *refs,
                       sm_scale=float(sm_scale), window=int(window),
                       softcap=float(softcap), quantized=quantized,
                       has_sinks=has_sinks, bs=page, dv=Dv)

        dims = ("parallel", "parallel", "parallel", "arbitrary")

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Rp, Dv), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * Rp * MP * page * (D + Dv),
            bytes_accessed=(
                B * Hkv * (Rp * D * 2
                           + MP * page * (D + Dv) * k4.dtype.itemsize
                           + Rp * Dv * 4)
            ),
            transcendentals=B * Hkv * Rp * MP * page,
        ),
        interpret=interpret,
    )(lim, table_b, *args)
    return out[:, :, :R]


def mha_flash_paged(
    q: jnp.ndarray,  # [B, T, H, Dk]
    kvc,  # PagedKVCache
    li: int,
    seq_idx: jnp.ndarray,  # [B]
    positions: jnp.ndarray,  # [B, T]
    *,
    sm_scale: float,
    window: int = 0,
    softcap: float = 0.0,
    sinks: jnp.ndarray | None = None,  # [H]
    interpret: bool = False,
) -> jnp.ndarray:
    """GQA fold + pool views for the paged kernel -> [B, T, H*Dv].
    Accepts a runtime.decode_window.DecodeWindow facade: its window rows
    ride as the kernel's tail tile, the pool stays read-only."""
    win = getattr(kvc, "win", None)
    pool = kvc.pool if win is not None else kvc
    B, T, H, Dk = q.shape
    Hkv = pool.k[0].shape[0]
    Dv = pool.v[0].shape[2]
    G = H // Hkv
    page, P = pool.page, pool.n_pages
    # per-layer pool arrays: pool.k[li] is a plain buffer reference (a
    # stacked [L, ...] pool would materialize a pool-slice copy per layer
    # per step here — r4 trace, ~27 us x 2 x n_layers/token)
    k4 = pool.k[li].reshape(Hkv, P, page, Dk)
    v4 = pool.v[li].reshape(Hkv, P, page, Dv)
    pos3 = pool.pos.reshape(P, 1, page)
    table_b = pool.table[seq_idx]
    ks = vs = None
    if pool.quantized:
        ks = pool.k_scale[li].reshape(Hkv, P, 1, page)
        vs = pool.v_scale[li].reshape(Hkv, P, 1, page)
    wkw = wvw = wposw = wksw = wvsw = None
    if win is not None:
        wkw, wvw, wposw = win.wk[li], win.wv[li], win.wpos
        if pool.quantized:
            wksw, wvsw = win.wks[li], win.wvs[li]
    qr = (q.reshape(B, T, Hkv, G, Dk).transpose(0, 2, 3, 1, 4)
          .reshape(B, Hkv, G * T, Dk))
    row_pos = jnp.tile(positions, (1, G))
    sink_rows = None
    if sinks is not None:
        sink_rows = jnp.repeat(sinks.reshape(Hkv, G), T, axis=1)  # [Hkv, G*T]
    out = flash_attention_paged(
        qr, k4, v4, row_pos, pos3, table_b,
        sinks=sink_rows, k_scale4=ks, v_scale4=vs,
        wk=wkw, wv=wvw, wpos=wposw, wks=wksw, wvs=wvsw,
        sm_scale=sm_scale, window=window, softcap=softcap,
        page=page, interpret=interpret,
    )  # [B, Hkv, G*T, Dv]
    return (out.reshape(B, Hkv, G, T, Dv).transpose(0, 3, 1, 2, 4)
            .reshape(B, T, H * Dv))


# ---------------------------------------------------------------------------
# dispatch from the model graph
# ---------------------------------------------------------------------------

_FORCE: bool | None = None  # tests set True to run in interpret mode on CPU


def set_force_flash(on: bool | None):
    global _FORCE
    _FORCE = on


def flash_supported(head_dim_k: int, head_dim_v: int, n_slots: int) -> bool:
    if _FORCE is False:
        return False
    backend_ok = _FORCE is True or jax.default_backend() == "tpu"
    dim_ok = (head_dim_k % LANES == 0 or head_dim_k in (32, 64)) and (
        head_dim_v % LANES == 0 or head_dim_v in (32, 64))
    return backend_ok and dim_ok and n_slots % LANES == 0


def mha_flash(
    q: jnp.ndarray,  # [B, T, H, Dk]
    k_seq: jnp.ndarray,  # [B, Hkv, S, Dk] (int8 if quantized)
    v_seq: jnp.ndarray,  # [B, Hkv, S, Dv]
    positions: jnp.ndarray,  # [B, T]
    slot_pos: jnp.ndarray,  # [B, S]
    *,
    sm_scale: float,
    window: int = 0,
    softcap: float = 0.0,
    sinks: jnp.ndarray | None = None,  # [H] per-q-head
    k_scale: jnp.ndarray | None = None,  # [B, Hkv, S]
    v_scale: jnp.ndarray | None = None,
    interpret: bool = False,
    ring: bool = False,
) -> jnp.ndarray:
    """GQA wrapper: folds the group axis into q rows -> [B, T, H*Dv]."""
    B, T, H, Dk = q.shape
    Hkv = k_seq.shape[1]
    Dv = v_seq.shape[3]
    G = H // Hkv
    # head h_q = h_kv * G + g; row r = g * T + t
    qr = q.reshape(B, T, Hkv, G, Dk).transpose(0, 2, 3, 1, 4).reshape(B, Hkv, G * T, Dk)
    row_pos = jnp.tile(positions, (1, G))  # [B, G*T], row g*T+t -> positions[t]
    sink_rows = None
    if sinks is not None:
        sink_rows = jnp.repeat(sinks.reshape(Hkv, G), T, axis=1)  # [Hkv, G*T]
    out = flash_attention(
        qr,
        k_seq,
        v_seq,
        row_pos,
        slot_pos,
        sinks=sink_rows,
        k_scale=k_scale,
        v_scale=v_scale,
        sm_scale=sm_scale,
        window=window,
        softcap=softcap,
        interpret=interpret,
        ring=ring,
    )  # [B, Hkv, G*T, Dv]
    return (
        out.reshape(B, Hkv, G, T, Dv).transpose(0, 3, 1, 2, 4).reshape(B, T, H * Dv)
    )
