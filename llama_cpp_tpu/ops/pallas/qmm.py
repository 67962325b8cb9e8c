"""Fused dequantize-and-GEMM Pallas kernel over canonical block-scaled planes.

TPU replacement for the reference's quantized GEMM/GEMV kernel family (CUDA
mmq.cu / mmvq.cu, CPU repack GEMM): int8 weight planes stream HBM->VMEM,
dequantize on the VPU inside the kernel, and feed the MXU — HBM traffic stays
at quantized size with no bf16 weight materialization round-trip.

Layout: weights are stored TRANSPOSED, q [K, O] with scales [K//g, O], so the
per-group scale expansion is a sublane broadcast + free leading-dim reshape
(lane-dim element-repeat is not a native TPU op). The min/offset term of
affine formats (Q4_1/Q4_K/...) reduces to (x @ B) @ mins with B the constant
0/1 group-summing matrix, built from iota on the fly — both terms run on the
MXU. One kernel serves all 27 ggml formats thanks to load-time
canonicalization (quant/repack.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _expand_scales(sc: jnp.ndarray, group: int) -> jnp.ndarray:
    """[K//g, O] -> [K, O]: broadcast each scale row across its g sublanes."""
    kg, o = sc.shape
    return jnp.broadcast_to(sc[:, None, :], (kg, group, o)).reshape(kg * group, o)


def _group_sum_matrix(k: int, group: int) -> jnp.ndarray:
    """Constant [K, K//g] 0/1 matrix: (x @ B)[n, G] = sum of x group G."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k // group), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k // group), 1)
    return (row // group == col).astype(jnp.float32)


def _eff(sc_ref, d, group: int, sgroup: int) -> jnp.ndarray:
    """Effective f32 per-group scales for a tile: flat f32 plane, or int8
    sub-scales x broadcast superblock d (hierarchical K-quant factoring —
    4x fewer scale bytes streamed; products are exact so results are
    bit-identical to the flat plane). `d` is this k tile's superblock rows
    [rows, to] (the d operand rides the grid reshaped to
    [tiles, rows, O] with block (1, rows, to) — its per-tile row count is
    1-8, below Mosaic's 8-sublane block minimum, and dynamic sublane
    slices must be 8-aligned, so a leading grid-mapped axis is the only
    layout that block-maps cleanly)."""
    if d is None:
        return sc_ref[:, :].astype(jnp.float32)
    return sc_ref[:, :].astype(jnp.float32) * _expand_scales(
        d.astype(jnp.float32), sgroup // group)


def _qmm_kernel(x_ref, q_ref, sc_ref, out_ref, *, group: int):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    w = q_ref[:, :].astype(jnp.float32) * _expand_scales(sc_ref[:, :], group)
    out_ref[:, :] += jnp.dot(
        x_ref[:, :].astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _qmm_min_kernel(x_ref, q_ref, sc_ref, mn_ref, out_ref, *, group: int):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    w = q_ref[:, :].astype(jnp.float32) * _expand_scales(sc_ref[:, :], group)
    x = x_ref[:, :]
    out_ref[:, :] += jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    xf = x.astype(jnp.float32)
    xg = jnp.dot(xf, _group_sum_matrix(xf.shape[1], group),
                 preferred_element_type=jnp.float32)  # [N, K/g]
    out_ref[:, :] += jnp.dot(xg, mn_ref[:, :], preferred_element_type=jnp.float32)


def _qmm_kernel_u(*refs, group: int, sgroup: int, hier: bool, mins: bool,
                  dot_dtype=jnp.bfloat16):
    """Unified flat-int8 decode GEMV kernel.
    refs: x, q, sc, [d], [mn, [dm]], out. d/dm ride as [K//tk, rk, O]
    with block (1, rk, to) — this k tile's rows are d_ref[0]."""
    x_ref, q_ref, sc_ref = refs[0], refs[1], refs[2]
    i = 3
    d_ref = None
    if hier:
        d_ref = refs[i]
        i += 1
    mn_ref = dm_ref = None
    if mins:
        mn_ref = refs[i]
        i += 1
        if hier:
            dm_ref = refs[i]
            i += 1
    out_ref = refs[i]
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    d_t = d_ref[0] if hier else None
    sch = _eff(sc_ref, d_t, group, sgroup)
    w = q_ref[:, :].astype(jnp.float32) * _expand_scales(sch, group)
    x = x_ref[:, :]
    out_ref[:, :] += jnp.dot(
        x.astype(dot_dtype), w.astype(dot_dtype),
        preferred_element_type=jnp.float32,
    )
    if mins:
        dm_t = dm_ref[0] if hier else None
        mnf = _eff(mn_ref, dm_t, group, sgroup)
        xg = jnp.dot(x.astype(jnp.float32),
                     _group_sum_matrix(x.shape[1], group),
                     preferred_element_type=jnp.float32)
        out_ref[:, :] += jnp.dot(xg, mnf, preferred_element_type=jnp.float32)


def _pick_tile(dim: int, targets) -> int:
    for t in targets:
        if dim % t == 0:
            return t
    return dim


# decode (GEMV) weight-tile budget: measured on v5e (scripts/bench_qmm.py),
# per-grid-step HBM streaming peaks when the weight tile is ~1-2 MB with the
# O (lane) extent as wide as possible — wide tiles keep every DMA row long.
_GEMV_TILE_BYTES = 2 * 1024 * 1024


def _pick_tiles_gemv(K: int, O: int, kbytes: float) -> tuple[int, int]:
    """(tile_o, tile_k) for the memory-bound decode GEMV: tk=512 K-steps and
    the widest O divisor (multiple of 128) whose q tile stays under budget.
    kbytes = weight bytes per K element per output column (0.5 packed, 1 int8).
    """
    tk = 512 if K % 512 == 0 else _pick_tile(K, (2048, 1024, 256, 128))
    cap = max(int(_GEMV_TILE_BYTES / (tk * kbytes)), 128)
    if O <= cap:
        return O, tk
    best = 128
    for to in range(cap - cap % 128, 127, -128):
        if O % to == 0:
            best = to
            break
    return best, tk


@functools.partial(
    jax.jit, static_argnames=("group", "sgroup", "interpret", "tile_n",
                              "tile_o", "tile_k")
)
def qmm_planes(
    x: jnp.ndarray,  # [N, K] (N multiple of 8)
    qT: jnp.ndarray,  # [K, O] int8
    scalesT: jnp.ndarray,  # [K//group, O] f32 (or int8 sub-scales with d)
    minsT: jnp.ndarray | None = None,
    dT: jnp.ndarray | None = None,  # [K//sgroup, O] f32 superblock scales
    dminT: jnp.ndarray | None = None,
    *,
    group: int,
    sgroup: int = 256,
    interpret: bool = False,
    tile_n: int = 0,
    tile_o: int = 0,
    tile_k: int = 0,
) -> jnp.ndarray:
    N, K = x.shape
    O = qT.shape[1]
    hier = dT is not None
    tn = tile_n or _pick_tile(N, (256, 128, 64, 32, 16, 8))
    if tile_o and tile_k:
        to, tk = tile_o, tile_k
    else:
        to, tk = _pick_tiles_gemv(K, O, 1.0)
        to, tk = tile_o or to, tile_k or tk
    grid = (N // tn, O // to, K // tk)
    dot_dtype = jnp.bfloat16  # matches the bf16 prefill scratch bit-for-bit
    in_specs = [
        pl.BlockSpec((tn, tk), lambda i, j, k: (i, k)),
        pl.BlockSpec((tk, to), lambda i, j, k: (k, j)),
        pl.BlockSpec((tk // group, to), lambda i, j, k: (k, j)),
    ]
    args = [x, qT, scalesT]
    if hier:
        assert tk % sgroup == 0, (tk, sgroup)
        rk = tk // sgroup
        d3 = dT.reshape(K // tk, rk, O)
        in_specs.append(
            pl.BlockSpec((1, rk, to), lambda i, j, k: (k, 0, j)))
        args.append(d3)
    if minsT is not None:
        in_specs.append(pl.BlockSpec((tk // group, to), lambda i, j, k: (k, j)))
        args.append(minsT)
        if hier:
            in_specs.append(
                pl.BlockSpec((1, rk, to), lambda i, j, k: (k, 0, j)))
            args.append(dminT.reshape(K // tk, rk, O))
    sc_b = 1 if hier else 4
    return pl.pallas_call(
        functools.partial(_qmm_kernel_u, group=group, sgroup=sgroup,
                          hier=hier, mins=minsT is not None,
                          dot_dtype=dot_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, to), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * O * K,
            bytes_accessed=N * K * 2 + O * K + O * (K // group) * sc_b + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _qmm4_kernel(xe_ref, xo_ref, q_ref, sl_ref, sh_ref, out_ref, *, group: int,
                 dot_dtype=jnp.bfloat16):
    # nibble-packed weights stay PACKED: no interleave/data movement on the
    # [tk/2, to] weight tile. Half-split pairing (row k lo, row k + K/2 hi)
    # makes the activation split x[:, :K/2] / x[:, K/2:] a free contiguous
    # slice; the lo/hi halves carry DIFFERENT scale rows (sl/sh views of the
    # same scales plane at offset block index).
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    q32 = q_ref[:, :].astype(jnp.int32)  # Mosaic lacks i8 shifts; widen
    w_lo = (q32 & 0xF).astype(jnp.float32) * _expand_scales(sl_ref[:, :], group)
    w_hi = ((q32 >> 4) & 0xF).astype(jnp.float32) * _expand_scales(
        sh_ref[:, :], group)
    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(dot_dtype), w_lo.astype(dot_dtype),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(dot_dtype), w_hi.astype(dot_dtype),
        preferred_element_type=jnp.float32,
    )


def _qmm4_min_kernel(xe_ref, xo_ref, q_ref, sl_ref, sh_ref, ml_ref, mh_ref,
                     out_ref, *, group: int, dot_dtype=jnp.bfloat16):
    _qmm4_kernel(xe_ref, xo_ref, q_ref, sl_ref, sh_ref, out_ref, group=group,
                 dot_dtype=dot_dtype)
    # affine mins term per half: group sums of each half's x rows
    gs = _group_sum_matrix(xe_ref.shape[1], group)
    xg_lo = jnp.dot(xe_ref[:, :].astype(jnp.float32), gs,
                    preferred_element_type=jnp.float32)
    xg_hi = jnp.dot(xo_ref[:, :].astype(jnp.float32), gs,
                    preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg_lo, ml_ref[:, :],
                             preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg_hi, mh_ref[:, :],
                             preferred_element_type=jnp.float32)


def _lohi_specs(rows, to, nkt, prefill=False):
    """lo/hi BlockSpec pair for a half-split scale-plane view: the hi half's
    rows sit nkt block-rows later in the same array."""
    if prefill:
        return [pl.BlockSpec((rows, to), lambda j, i, k: (k, j)),
                pl.BlockSpec((rows, to), lambda j, i, k: (nkt + k, j))]
    return [pl.BlockSpec((rows, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((rows, to), lambda i, j, k: (nkt + k, j))]


def _lohi_specs3(rows, to, nkt, prefill=False):
    """lo/hi BlockSpec pair for a grid-mapped hier plane [2*nkt, rows, O]:
    block (1, rows, to); the hi half's tile sits nkt leading blocks later.
    (rows is 1-8 — below the 8-sublane block minimum and dynamic sublane
    slices must be 8-aligned, so the leading grid-mapped axis is the only
    clean layout.)"""
    if prefill:
        return [pl.BlockSpec((1, rows, to), lambda j, i, k: (k, 0, j)),
                pl.BlockSpec((1, rows, to), lambda j, i, k: (nkt + k, 0, j))]
    return [pl.BlockSpec((1, rows, to), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, rows, to), lambda i, j, k: (nkt + k, 0, j))]


def _halfsplit_specs(tn, to, tk, group, sgroup, nkt, with_mins, hier, K,
                     prefill=False):
    """in_specs for (xe, xo, q, sc_lo, sc_hi, [d_lo, d_hi],
    [mn_lo, mn_hi, [dm_lo, dm_hi]]) with the half-split pairing. The hier
    d/dm operands ride reshaped to [2*nkt, rh, O] (see _lohi_specs3)."""
    th = tk // 2
    if prefill:
        specs = [
            pl.BlockSpec((tn, th), lambda j, i, k: (i, k)),
            pl.BlockSpec((tn, th), lambda j, i, k: (i, k)),
            pl.BlockSpec((th, to), lambda j, i, k: (k, j)),
        ]
    else:
        specs = [
            pl.BlockSpec((tn, th), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, th), lambda i, j, k: (i, k)),
            pl.BlockSpec((th, to), lambda i, j, k: (k, j)),
        ]
    specs += _lohi_specs(th // group, to, nkt, prefill)
    if hier:
        assert th % sgroup == 0, (th, sgroup)
        specs += _lohi_specs3(th // sgroup, to, nkt, prefill)
    if with_mins:
        specs += _lohi_specs(th // group, to, nkt, prefill)
        if hier:
            specs += _lohi_specs3(th // sgroup, to, nkt, prefill)
    return specs


def _halfsplit_args(xe, xo, qp, sc, d, mn, dm, nkt, rh, O):
    args = [xe, xo, qp, sc, sc]
    if d is not None:
        d3 = d.reshape(2 * nkt, rh, O)
        args += [d3, d3]
    if mn is not None:
        args += [mn, mn]
        if d is not None:
            dm3 = dm.reshape(2 * nkt, rh, O)
            args += [dm3, dm3]
    return args


def _qmm4_kernel_u(*refs, group: int, sgroup: int, hier: bool, mins: bool,
                   dot_dtype=jnp.bfloat16):
    """Unified nibble-packed decode GEMV kernel (half-split pairing).
    refs: xe, xo, q, sc_lo, sc_hi, [d_lo, d_hi],
    [mn_lo, mn_hi, [dm_lo, dm_hi]], out. d/dm ride as [2*nkt, rh, O] with
    block (1, rh, to) — this tile's rows are ref[0] (see _lohi_specs3)."""
    xe_ref, xo_ref, q_ref = refs[0], refs[1], refs[2]
    i = 3
    sl_ref, sh_ref = refs[i], refs[i + 1]
    i += 2
    dl_ref = dh_ref = None
    if hier:
        dl_ref, dh_ref = refs[i], refs[i + 1]
        i += 2
    ml_ref = mh_ref = dml_ref = dmh_ref = None
    if mins:
        ml_ref, mh_ref = refs[i], refs[i + 1]
        i += 2
        if hier:
            dml_ref, dmh_ref = refs[i], refs[i + 1]
            i += 2
    out_ref = refs[i]
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    d_lo = dl_ref[0] if hier else None
    d_hi = dh_ref[0] if hier else None
    q32 = q_ref[:, :].astype(jnp.int32)  # Mosaic lacks i8 shifts; widen
    sch_lo = _eff(sl_ref, d_lo, group, sgroup)
    sch_hi = _eff(sh_ref, d_hi, group, sgroup)
    w_lo = (q32 & 0xF).astype(jnp.float32) * _expand_scales(sch_lo, group)
    w_hi = ((q32 >> 4) & 0xF).astype(jnp.float32) * _expand_scales(sch_hi, group)
    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(dot_dtype), w_lo.astype(dot_dtype),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(dot_dtype), w_hi.astype(dot_dtype),
        preferred_element_type=jnp.float32,
    )
    if mins:
        dm_lo = dml_ref[0] if hier else None
        dm_hi = dmh_ref[0] if hier else None
        gs = _group_sum_matrix(xe_ref.shape[1], group)
        xg_lo = jnp.dot(xe_ref[:, :].astype(jnp.float32), gs,
                        preferred_element_type=jnp.float32)
        xg_hi = jnp.dot(xo_ref[:, :].astype(jnp.float32), gs,
                        preferred_element_type=jnp.float32)
        out_ref[:, :] += jnp.dot(xg_lo, _eff(ml_ref, dm_lo, group, sgroup),
                                 preferred_element_type=jnp.float32)
        out_ref[:, :] += jnp.dot(xg_hi, _eff(mh_ref, dm_hi, group, sgroup),
                                 preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("group", "sgroup", "interpret"))
def qmm4_planes(
    x: jnp.ndarray,  # [N, K]
    qp: jnp.ndarray,  # [K//2, O] int8-viewed nibble pairs (row k lo, k+K/2 hi)
    scalesT: jnp.ndarray,  # [K//group, O] f32 (or int8 sub-scales with dT)
    minsT: jnp.ndarray | None = None,
    dT: jnp.ndarray | None = None,  # [K//sgroup, O] f32 superblock scales
    dminT: jnp.ndarray | None = None,
    *,
    group: int,
    sgroup: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused nibble-packed dequant GEMM: weight HBM traffic is HALF the
    int8-plane kernel's — the speed-of-light path for 4-bit formats (mmq
    q4 analog; VERDICT r1: push decode toward the packed-bits roofline)."""
    N, K = x.shape
    O = qp.shape[1]
    hier = dT is not None
    tn = _pick_tile(N, (256, 128, 64, 32, 16, 8))
    to, tk = _pick_tiles_gemv(K, O, 0.5)
    grid = (N // tn, O // to, K // tk)
    nkt = K // tk
    # XLA:CPU (interpret mode) lacks bf16 dot thunks; stay f32 there
    dot_dtype = jnp.float32 if interpret else jnp.bfloat16
    # contiguous half-split (free slices; see QuantTensor.packed)
    xe = x[:, : K // 2]
    xo = x[:, K // 2:]
    in_specs = _halfsplit_specs(tn, to, tk, group, sgroup, nkt,
                                minsT is not None, hier, K)
    args = _halfsplit_args(xe, xo, qp, scalesT, dT, minsT, dminT,
                           nkt, (tk // 2) // sgroup if hier else 1, O)
    sc_b = 1 if hier else 4
    return pl.pallas_call(
        functools.partial(_qmm4_kernel_u, group=group, sgroup=sgroup,
                          hier=hier, mins=minsT is not None,
                          dot_dtype=dot_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, to), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * O * K,
            bytes_accessed=N * K * 2 + O * K // 2 + O * (K // group) * sc_b + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _qmm_prefill_kernel(x_ref, q_ref, sc_ref, out_ref, wbuf, *, group: int,
                        tk: int):
    """Dequant-hoisted prefill variant: grid (O/to, N/tn, K/tk) keeps the
    N-loop INSIDE each column block, so the weight tile is dequantized once
    into VMEM scratch (at i==0) and re-used by every N tile — the VPU
    dequant cost amortizes over N/tn instead of being paid per N tile,
    which is what capped pp-shape MFU at ~25% (VERDICT r2 item 2; the
    reference's mmq.cu plays the same role for CUDA prefill)."""
    i = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        w = q_ref[:, :].astype(jnp.float32) * _expand_scales(sc_ref[:, :], group)
        wbuf[pl.ds(kt * tk, tk), :] = w.astype(jnp.bfloat16)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += jnp.dot(
        x_ref[:, :].astype(jnp.bfloat16),
        wbuf[pl.ds(kt * tk, tk), :],
        preferred_element_type=jnp.float32,
    )


def _qmm_prefill_min_kernel(x_ref, q_ref, sc_ref, mn_ref, out_ref, wbuf, *,
                            group: int, tk: int):
    _qmm_prefill_kernel(x_ref, q_ref, sc_ref, out_ref, wbuf, group=group,
                        tk=tk)
    xf = x_ref[:, :].astype(jnp.float32)
    xg = jnp.dot(xf, _group_sum_matrix(xf.shape[1], group),
                 preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg, mn_ref[:, :], preferred_element_type=jnp.float32)


def _qmm_prefill_kernel_u(*refs, group: int, sgroup: int, hier: bool,
                          mins: bool, tk: int):
    """Unified flat-int8 dequant-hoisted prefill kernel.
    refs: x, q, sc, [d], [mn, [dm]], out, wbuf. d/dm ride as
    [K//tk, rk, O] with block (1, rk, to) — this tile's rows are ref[0]."""
    x_ref, q_ref, sc_ref = refs[0], refs[1], refs[2]
    i = 3
    d_ref = None
    if hier:
        d_ref = refs[i]
        i += 1
    mn_ref = dm_ref = None
    if mins:
        mn_ref = refs[i]
        i += 1
        if hier:
            dm_ref = refs[i]
            i += 1
    out_ref, wbuf = refs[i], refs[i + 1]
    i_id = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(i_id == 0)
    def _():
        d_t = d_ref[0] if hier else None
        sch = _eff(sc_ref, d_t, group, sgroup)
        w = q_ref[:, :].astype(jnp.float32) * _expand_scales(sch, group)
        wbuf[pl.ds(kt * tk, tk), :] = w.astype(jnp.bfloat16)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += jnp.dot(
        x_ref[:, :].astype(jnp.bfloat16),
        wbuf[pl.ds(kt * tk, tk), :],
        preferred_element_type=jnp.float32,
    )
    if mins:
        dm_t = dm_ref[0] if hier else None
        mnf = _eff(mn_ref, dm_t, group, sgroup)
        xf = x_ref[:, :].astype(jnp.float32)
        xg = jnp.dot(xf, _group_sum_matrix(xf.shape[1], group),
                     preferred_element_type=jnp.float32)
        out_ref[:, :] += jnp.dot(xg, mnf, preferred_element_type=jnp.float32)


def _qmm4_prefill_kernel_u(*refs, group: int, sgroup: int, hier: bool,
                           mins: bool, tk: int, dot_dtype=jnp.bfloat16):
    """Unified nibble-packed dequant-hoisted prefill kernel (half-split).
    refs: xe, xo, q, sc_lo, sc_hi, [d_lo, d_hi],
    [mn_lo, mn_hi, [dm_lo, dm_hi]], out, wlo, whi. d/dm ride as
    [2*nkt, rh, O] with block (1, rh, to) (see _lohi_specs3)."""
    xe_ref, xo_ref, q_ref = refs[0], refs[1], refs[2]
    i = 3
    sl_ref, sh_ref = refs[i], refs[i + 1]
    i += 2
    dl_ref = dh_ref = None
    if hier:
        dl_ref, dh_ref = refs[i], refs[i + 1]
        i += 2
    ml_ref = mh_ref = dml_ref = dmh_ref = None
    if mins:
        ml_ref, mh_ref = refs[i], refs[i + 1]
        i += 2
        if hier:
            dml_ref, dmh_ref = refs[i], refs[i + 1]
            i += 2
    out_ref, wlo, whi = refs[i], refs[i + 1], refs[i + 2]
    i_id = pl.program_id(1)
    kt = pl.program_id(2)
    th = tk // 2

    @pl.when(i_id == 0)
    def _():
        d_lo = dl_ref[0] if hier else None
        d_hi = dh_ref[0] if hier else None
        q32 = q_ref[:, :].astype(jnp.int32)
        sch_lo = _eff(sl_ref, d_lo, group, sgroup)
        sch_hi = _eff(sh_ref, d_hi, group, sgroup)
        wlo[pl.ds(kt * th, th), :] = (
            (q32 & 0xF).astype(jnp.float32)
            * _expand_scales(sch_lo, group)).astype(wlo.dtype)
        whi[pl.ds(kt * th, th), :] = (
            ((q32 >> 4) & 0xF).astype(jnp.float32)
            * _expand_scales(sch_hi, group)).astype(whi.dtype)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(dot_dtype),
        wlo[pl.ds(kt * th, th), :],
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(dot_dtype),
        whi[pl.ds(kt * th, th), :],
        preferred_element_type=jnp.float32,
    )
    if mins:
        dm_lo = dml_ref[0] if hier else None
        dm_hi = dmh_ref[0] if hier else None
        gs = _group_sum_matrix(xe_ref.shape[1], group)
        xg_lo = jnp.dot(xe_ref[:, :].astype(jnp.float32), gs,
                        preferred_element_type=jnp.float32)
        xg_hi = jnp.dot(xo_ref[:, :].astype(jnp.float32), gs,
                        preferred_element_type=jnp.float32)
        out_ref[:, :] += jnp.dot(xg_lo, _eff(ml_ref, dm_lo, group, sgroup),
                                 preferred_element_type=jnp.float32)
        out_ref[:, :] += jnp.dot(xg_hi, _eff(mh_ref, dm_hi, group, sgroup),
                                 preferred_element_type=jnp.float32)


def _qmm4_prefill_kernel(xe_ref, xo_ref, q_ref, sl_ref, sh_ref, out_ref,
                         wlo, whi, *, group: int, tk: int,
                         dot_dtype=jnp.bfloat16):
    """Nibble-packed prefill variant: unpack lo/hi planes once per column
    block into two bf16 scratch halves (same half-split K pairing as
    _qmm4_kernel, so results are bit-identical to the decode kernel)."""
    i = pl.program_id(1)
    kt = pl.program_id(2)
    th = tk // 2

    @pl.when(i == 0)
    def _():
        q32 = q_ref[:, :].astype(jnp.int32)
        wlo[pl.ds(kt * th, th), :] = (
            (q32 & 0xF).astype(jnp.float32)
            * _expand_scales(sl_ref[:, :], group)).astype(wlo.dtype)
        whi[pl.ds(kt * th, th), :] = (
            ((q32 >> 4) & 0xF).astype(jnp.float32)
            * _expand_scales(sh_ref[:, :], group)).astype(whi.dtype)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(dot_dtype),
        wlo[pl.ds(kt * th, th), :],
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(dot_dtype),
        whi[pl.ds(kt * th, th), :],
        preferred_element_type=jnp.float32,
    )


def _qmm4_prefill_min_kernel(xe_ref, xo_ref, q_ref, sl_ref, sh_ref, ml_ref,
                             mh_ref, out_ref, wlo, whi, *, group: int, tk: int,
                             dot_dtype=jnp.bfloat16):
    _qmm4_prefill_kernel(xe_ref, xo_ref, q_ref, sl_ref, sh_ref, out_ref,
                         wlo, whi, group=group, tk=tk, dot_dtype=dot_dtype)
    gs = _group_sum_matrix(xe_ref.shape[1], group)
    xg_lo = jnp.dot(xe_ref[:, :].astype(jnp.float32), gs,
                    preferred_element_type=jnp.float32)
    xg_hi = jnp.dot(xo_ref[:, :].astype(jnp.float32), gs,
                    preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg_lo, ml_ref[:, :],
                             preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg_hi, mh_ref[:, :],
                             preferred_element_type=jnp.float32)


# VMEM budget for the dequantized column-block scratch (v5e VMEM ~= 16 MiB;
# leave room for double-buffered x/q tiles and the f32 out tile)
_PREFILL_SCRATCH_BYTES = 8 * 1024 * 1024
# fused kernels see N tiles of at least this many rows before the
# dequant-hoisted grid pays off (several i steps amortize one dequant).
# ALSO a correctness bound: the decode-GEMV tile policy targets few-row
# shapes — at N >= 256 its f32 weight tiles blow the 16 MiB scoped-VMEM
# limit (r5: jit(step) at [256, 28672] failed AOT compile), so mid-size
# row counts must route to the scratch-bounded prefill variants
PREFILL_MIN_N = 64


@functools.partial(
    jax.jit, static_argnames=("group", "sgroup", "interpret", "tile_n",
                              "tile_o", "tile_k")
)
def qmm_planes_prefill(
    x: jnp.ndarray,  # [N, K] (N multiple of tile_n)
    qT: jnp.ndarray,  # [K, O] int8
    scalesT: jnp.ndarray,  # [K//group, O] f32 (or int8 sub-scales with dT)
    minsT: jnp.ndarray | None = None,
    dT: jnp.ndarray | None = None,
    dminT: jnp.ndarray | None = None,
    *,
    group: int,
    sgroup: int = 256,
    interpret: bool = False,
    tile_n: int = 0,
    tile_o: int = 0,
    tile_k: int = 0,
) -> jnp.ndarray:
    N, K = x.shape
    O = qT.shape[1]
    hier = dT is not None
    tn = tile_n or _pick_tile(N, (512, 256, 128, 64, 32, 16, 8))
    to = tile_o or _pick_tile(O, (256, 128, 512))
    tk = tile_k or _pick_tile(K, (1024, 512, 2048, 256))
    grid = (O // to, N // tn, K // tk)
    in_specs = [
        pl.BlockSpec((tn, tk), lambda j, i, k: (i, k)),
        pl.BlockSpec((tk, to), lambda j, i, k: (k, j)),
        pl.BlockSpec((tk // group, to), lambda j, i, k: (k, j)),
    ]
    args = [x, qT, scalesT]
    if hier:
        assert tk % sgroup == 0, (tk, sgroup)
        rk = tk // sgroup
        in_specs.append(
            pl.BlockSpec((1, rk, to), lambda j, i, k: (k, 0, j)))
        args.append(dT.reshape(K // tk, rk, O))
    if minsT is not None:
        in_specs.append(pl.BlockSpec((tk // group, to), lambda j, i, k: (k, j)))
        args.append(minsT)
        if hier:
            in_specs.append(
                pl.BlockSpec((1, rk, to), lambda j, i, k: (k, 0, j)))
            args.append(dminT.reshape(K // tk, rk, O))
    sc_b = 1 if hier else 4
    return pl.pallas_call(
        functools.partial(_qmm_prefill_kernel_u, group=group, sgroup=sgroup,
                          hier=hier, mins=minsT is not None, tk=tk),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, to), lambda j, i, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, to), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * O * K,
            bytes_accessed=N * K * 2 + O * K + O * (K // group) * sc_b + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("group", "sgroup", "interpret",
                                             "tile_n", "tile_o", "tile_k"))
def qmm4_planes_prefill(
    x: jnp.ndarray,  # [N, K]
    qp: jnp.ndarray,  # [K//2, O] nibble pairs
    scalesT: jnp.ndarray,  # [K//group, O] f32 (or int8 sub-scales with dT)
    minsT: jnp.ndarray | None = None,
    dT: jnp.ndarray | None = None,
    dminT: jnp.ndarray | None = None,
    *,
    group: int,
    sgroup: int = 256,
    interpret: bool = False,
    tile_n: int = 0,
    tile_o: int = 0,
    tile_k: int = 0,
) -> jnp.ndarray:
    N, K = x.shape
    O = qp.shape[1]
    hier = dT is not None
    tn = tile_n or _pick_tile(N, (512, 256, 128, 64, 32, 16, 8))
    to = tile_o or _pick_tile(O, (256, 128, 512))
    tk = tile_k or _pick_tile(K, (1024, 512, 2048, 256))
    grid = (O // to, N // tn, K // tk)
    nkt = K // tk
    dot_dtype = jnp.float32 if interpret else jnp.bfloat16
    xe = x[:, : K // 2]
    xo = x[:, K // 2:]
    in_specs = _halfsplit_specs(tn, to, tk, group, sgroup, nkt,
                                minsT is not None, hier, K, prefill=True)
    args = _halfsplit_args(xe, xo, qp, scalesT, dT, minsT, dminT,
                           nkt, (tk // 2) // sgroup if hier else 1, O)
    sc_b = 1 if hier else 4
    return pl.pallas_call(
        functools.partial(_qmm4_prefill_kernel_u, group=group, sgroup=sgroup,
                          hier=hier, mins=minsT is not None, tk=tk,
                          dot_dtype=dot_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, to), lambda j, i, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K // 2, to), dot_dtype),
                        pltpu.VMEM((K // 2, to), dot_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * O * K,
            bytes_accessed=N * K * 2 + O * K // 2 + O * (K // group) * sc_b + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _qmm_id_kernel(ids_ref, x_ref, q_ref, sc_ref, out_ref, *, group: int):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    w = q_ref[0].astype(jnp.float32) * _expand_scales(sc_ref[0], group)
    out_ref[:, :] += jnp.dot(
        x_ref[:, :].astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _qmm_id_min_kernel(ids_ref, x_ref, q_ref, sc_ref, mn_ref, out_ref, *,
                       group: int):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    w = q_ref[0].astype(jnp.float32) * _expand_scales(sc_ref[0], group)
    x = x_ref[:, :]
    out_ref[:, :] += jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    xf = x.astype(jnp.float32)
    xg = jnp.dot(xf, _group_sum_matrix(xf.shape[1], group),
                 preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg, mn_ref[0], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def qmm_planes_expert(
    x: jnp.ndarray,  # [R, 8, K] — row r's activation replicated over sublanes
    ids: jnp.ndarray,  # [R] int32 expert id per row
    qT: jnp.ndarray,  # [E, K, O] int8 transposed expert planes
    scalesT: jnp.ndarray,  # [E, K//g, O]
    minsT: jnp.ndarray | None = None,
    *,
    group: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Indexed-expert fused dequant GEMM (GGML_OP_MUL_MAT_ID / mmid analog):
    each grid row streams ONLY its selected expert's planes from HBM — the
    expert id arrives via scalar prefetch and drives the weight index_map.
    -> [R, O] f32 (row r = x[r] @ W[ids[r]]^T)."""
    R, _, K = x.shape
    E, _, O = qT.shape
    to = _pick_tile(O, (512, 256, 128))
    tk = _pick_tile(K, (2048, 1024, 512, 256))
    grid = (R, O // to, K // tk)
    kern = _qmm_id_min_kernel if minsT is not None else _qmm_id_kernel
    in_specs = [
        pl.BlockSpec((1, 8, tk), lambda i, j, k, ids: (i, 0, k)),
        pl.BlockSpec((1, tk, to), lambda i, j, k, ids: (ids[i], k, j)),
        pl.BlockSpec((1, tk // group, to), lambda i, j, k, ids: (ids[i], k, j)),
    ]
    args = [x, qT, scalesT]
    if minsT is not None:
        in_specs.append(
            pl.BlockSpec((1, tk // group, to), lambda i, j, k, ids: (ids[i], k, j)))
        args.append(minsT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, to), lambda i, j, k, ids: (i, 0, j)),
    )

    def wrap(kern_fn):
        def body(ids_ref, *refs):
            # refs: x(1,8,tk), q(1,tk,to), sc(1,tk//g,to)[, mn], out(1,8,to)
            if minsT is not None:
                x_ref, q_ref, sc_ref, mn_ref, out_ref = refs
                kern_fn(ids_ref, x_ref.at[0], q_ref, sc_ref, mn_ref,
                        out_ref.at[0], group=group)
            else:
                x_ref, q_ref, sc_ref, out_ref = refs
                kern_fn(ids_ref, x_ref.at[0], q_ref, sc_ref, out_ref.at[0],
                        group=group)
        return body

    out = pl.pallas_call(
        wrap(_qmm_id_min_kernel if minsT is not None else _qmm_id_kernel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 8, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(ids, *args)
    return out[:, 0]


def qmm(x: jnp.ndarray, qt, interpret: bool = False) -> jnp.ndarray:
    """y = x @ W^T for a transposed-plane QuantTensor. Pads N to sublanes."""
    assert qt.transposed and qt.q.ndim == 2
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    N = x2.shape[0]
    Np = max(_round_up(N, 8), 8)
    if Np != N:
        x2 = jnp.pad(x2, ((0, Np - N), (0, 0)))
    O = qt.q.shape[1]
    to = _pick_tile(O, (256, 128, 512))
    # scratch = K*to bf16 either way (one [K,to] buffer, or two [K/2,to])
    if Np >= PREFILL_MIN_N and K * to * 2 <= _PREFILL_SCRATCH_BYTES:
        fn = qmm4_planes_prefill if qt.packed else qmm_planes_prefill
    else:
        fn = qmm4_planes if qt.packed else qmm_planes
    if qt.hier:
        out = fn(
            x2, qt.q, qt.scales, qt.mins, qt.d, qt.dmin,
            group=qt.group, sgroup=qt.sgroup, interpret=interpret,
        )
    else:
        out = fn(
            x2,
            qt.q,
            qt.scales.astype(jnp.float32),
            None if qt.mins is None else qt.mins.astype(jnp.float32),
            group=qt.group,
            interpret=interpret,
        )
    out = out[:N]
    if qt.out_dim and qt.out_dim != O:
        out = out[:, : qt.out_dim]
    return out.reshape(*lead, qt.out_features)


# at or above this many activation rows the plain XLA dequant->bf16-dot
# path beats the fused in-kernel-dequant GEMMs (r5 on-chip ablation,
# scripts/bench_prefill.py: at N=2048 XLA reaches 87-146% of the fused
# kernel's best across the 8B projections — the MXU runs unthrottled and
# the one-shot dequant is amortized over the whole ubatch). Below it the
# dequant round-trip through HBM dominates and the fused kernels win.
XLA_PREFILL_MIN_N = 1024


def pallas_qmm_dispatch(x, qt):
    """matmul() hook: fused kernel when the layout/shape is tileable."""
    if not qt.transposed or qt.q.ndim != 2:
        return None
    K, O = qt.q.shape
    if qt.packed:
        K *= 2
    if x.size // K >= XLA_PREFILL_MIN_N:
        return None  # large prefill ubatch: matmul()'s dequant+dot path
    if qt.hier and K % 512 != 0:
        return None  # hier d-blocks need tk >= 512 (load gates on this too)
    if K % 256 != 0 or O % 128 != 0 or (K // qt.group) % 8 != 0:
        return None
    return qmm(x, qt)
