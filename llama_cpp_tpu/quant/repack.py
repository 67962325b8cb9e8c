"""Load-time repacking of ggml block formats into TPU-canonical planes.

Every ggml quant format is losslessly expressible as
    value[j] = q[j] * scale[j // g] + min[j // g]
with q int8 and group size g in {8, 16, 32}. At load we repack each weight
into separate q / scale / min planes (the TPU analog of the reference's
runtime weight repacking, ggml/src/ggml-cpu/repack.cpp:52-316): scales live
contiguously so Pallas kernels keep them in VMEM, and a single block-scaled
int8 GEMM kernel serves all formats instead of per-format bit-twiddling.

`extract_planes(raw, dtype, n)` -> (q int8 [n], scales f32 [n//g], mins or
None, g). Plane extraction reuses the bit-parsing of dequant.py; equality
q*sc+mn == dequantize() is enforced by tests.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import QK_K, GGMLType
from . import dequant as D


def _nb(raw, dtype, n):
    return D._blocks(raw, dtype, n)


def _expand(sc: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(sc, dtype=np.float32).reshape(-1)


# each extractor returns (q int8 flat [n], scales [n//g], mins [n//g]|None, g)


def planes_q4_0(raw, n):
    b = _nb(raw, GGMLType.Q4_0, n)
    d = D._f16(b[:, 0:2])
    lo, hi = D._nibbles(b[:, 2:18])
    q = (np.concatenate([lo, hi], axis=1) - 8).astype(np.int8)
    return q.reshape(-1), _expand(d), None, 32


def planes_q4_1(raw, n):
    b = _nb(raw, GGMLType.Q4_1, n)
    d = D._f16(b[:, 0:2])
    m = D._f16(b[:, 2:4])
    lo, hi = D._nibbles(b[:, 4:20])
    q = np.concatenate([lo, hi], axis=1).astype(np.int8)
    return q.reshape(-1), _expand(d), _expand(m), 32


def planes_q5_0(raw, n):
    b = _nb(raw, GGMLType.Q5_0, n)
    d = D._f16(b[:, 0:2])
    xh0, xh1 = D._q5_high_bits(b[:, 2:6])
    lo, hi = D._nibbles(b[:, 6:22])
    q = (np.concatenate([lo | xh0, hi | xh1], axis=1) - 16).astype(np.int8)
    return q.reshape(-1), _expand(d), None, 32


def planes_q5_1(raw, n):
    b = _nb(raw, GGMLType.Q5_1, n)
    d = D._f16(b[:, 0:2])
    m = D._f16(b[:, 2:4])
    xh0, xh1 = D._q5_high_bits(b[:, 4:8])
    lo, hi = D._nibbles(b[:, 8:24])
    q = np.concatenate([lo | xh0, hi | xh1], axis=1).astype(np.int8)
    return q.reshape(-1), _expand(d), _expand(m), 32


def planes_q8_0(raw, n):
    b = _nb(raw, GGMLType.Q8_0, n)
    d = D._f16(b[:, 0:2])
    q = b[:, 2:34].view(np.int8)
    return q.reshape(-1).copy(), _expand(d), None, 32


def planes_q4_K(raw, n):
    b = _nb(raw, GGMLType.Q4_K, n)
    d = D._f16(b[:, 0:2])
    dmin = D._f16(b[:, 2:4])
    sc, mn = D._k4_scale_min(b[:, 4:16])
    qs = b[:, 16:144].reshape(-1, 4, 32)
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    q = np.stack([lo, hi], axis=2).reshape(-1, 8, 32)
    scales = (d * sc).astype(np.float32)  # [nb,8]
    mins = (-(dmin * mn)).astype(np.float32)
    return q.reshape(-1), scales.reshape(-1), mins.reshape(-1), 32


def planes_q5_K(raw, n):
    b = _nb(raw, GGMLType.Q5_K, n)
    d = D._f16(b[:, 0:2])
    dmin = D._f16(b[:, 2:4])
    sc, mn = D._k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48].astype(np.int32)
    qs = b[:, 48:176].reshape(-1, 4, 32)
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    jj = np.arange(4)
    u1 = (1 << (2 * jj)).astype(np.int32)
    u2 = (2 << (2 * jj)).astype(np.int32)
    hb_lo = ((qh[:, None, :] & u1[None, :, None]) != 0).astype(np.int32) * 16
    hb_hi = ((qh[:, None, :] & u2[None, :, None]) != 0).astype(np.int32) * 16
    q = np.stack([lo + hb_lo, hi + hb_hi], axis=2).reshape(-1, 8, 32).astype(np.int8)
    scales = (d * sc).astype(np.float32)
    mins = (-(dmin * mn)).astype(np.float32)
    return q.reshape(-1), scales.reshape(-1), mins.reshape(-1), 32


def planes_q6_K(raw, n):
    b = _nb(raw, GGMLType.Q6_K, n)
    ql = b[:, 0:128].reshape(-1, 2, 2, 32).astype(np.int32)
    qh = b[:, 128:192].reshape(-1, 2, 32).astype(np.int32)
    sc = b[:, 192:208].view(np.int8).reshape(-1, 16).astype(np.float32)
    d = D._f16(b[:, 208:210])
    q1 = (ql[:, :, 0] & 0xF) | (((qh >> 0) & 3) << 4)
    q2 = (ql[:, :, 1] & 0xF) | (((qh >> 2) & 3) << 4)
    q3 = (ql[:, :, 0] >> 4) | (((qh >> 4) & 3) << 4)
    q4 = (ql[:, :, 1] >> 4) | (((qh >> 6) & 3) << 4)
    q = (np.stack([q1, q2, q3, q4], axis=2) - 32).astype(np.int8)  # [nb,2,4,32]
    scales = (d * sc).astype(np.float32)  # [nb,1]*[nb,16] -> [nb,16] per-16 groups
    return q.reshape(-1), scales.reshape(-1), None, 16


def planes_q2_K(raw, n):
    b = _nb(raw, GGMLType.Q2_K, n)
    scales = b[:, 0:16].astype(np.int32)
    qs = b[:, 16:80].reshape(-1, 2, 32).astype(np.int32)
    d = D._f16(b[:, 80:82])
    dmin = D._f16(b[:, 82:84])
    shifts = (np.arange(4) * 2).astype(np.int32)
    q = (qs[:, :, None, :] >> shifts[None, None, :, None]) & 3
    q = q.reshape(-1, 2, 4, 2, 16).astype(np.int8)
    sc = scales.reshape(-1, 2, 4, 2)
    dl = (d[:, :, None, None] * (sc & 0xF)).astype(np.float32)
    ml = (-(dmin[:, :, None, None] * (sc >> 4))).astype(np.float32)
    return q.reshape(-1), dl.reshape(-1), ml.reshape(-1), 16


def planes_q3_K(raw, n):
    b = _nb(raw, GGMLType.Q3_K, n)
    hmask = b[:, 0:32].astype(np.int32)
    qs = b[:, 32:96].reshape(-1, 2, 32).astype(np.int32)
    scales6 = D._q3_scales(b[:, 96:108]).astype(np.float32)
    d = D._f16(b[:, 108:110])
    shifts = (np.arange(4) * 2).astype(np.int32)
    low = (qs[:, :, None, :] >> shifts[None, None, :, None]) & 3
    mbit = (np.arange(8).reshape(2, 4))[None, :, :, None]
    high = (hmask[:, None, None, :] >> mbit) & 1
    q = (low - np.where(high != 0, 0, 4)).reshape(-1, 2, 4, 2, 16).astype(np.int8)
    sc = scales6.reshape(-1, 2, 4, 2) - 32.0
    scales = (d[:, :, None, None] * sc).astype(np.float32)
    return q.reshape(-1), scales.reshape(-1), None, 16


def planes_iq4_nl(raw, n):
    b = _nb(raw, GGMLType.IQ4_NL, n)
    d = D._f16(b[:, 0:2])
    lo, hi = D._nibbles(b[:, 2:18])
    q = D.KVALUES_IQ4NL[np.concatenate([lo, hi], axis=1)]
    return q.reshape(-1), _expand(d), None, 32


def planes_iq4_xs(raw, n):
    b = _nb(raw, GGMLType.IQ4_XS, n)
    d = D._f16(b[:, 0:2])
    scales_h = np.ascontiguousarray(b[:, 2:4]).view(np.uint16).astype(np.int32)
    scales_l = b[:, 4:8].astype(np.int32)
    qs = b[:, 8:136].reshape(-1, 8, 16)
    ib = np.arange(8)
    ls_l = (scales_l[:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
    ls_h = (scales_h >> (2 * ib)[None, :]) & 3
    ls = (ls_l | (ls_h << 4)) - 32
    lo = D.KVALUES_IQ4NL[qs & 0xF]
    hi = D.KVALUES_IQ4NL[qs >> 4]
    q = np.concatenate([lo, hi], axis=2).astype(np.int8)
    scales = (d * ls.astype(np.float32)).astype(np.float32)
    return q.reshape(-1), scales.reshape(-1), None, 32


def planes_mxfp4(raw, n):
    b = _nb(raw, GGMLType.MXFP4, n)
    d = D._e8m0_half(b[:, 0:1])
    lo, hi = D._nibbles(b[:, 1:17])
    q = D.KVALUES_FP4[np.concatenate([lo, hi], axis=1)]
    return q.reshape(-1), _expand(d), None, 32


def planes_q8_K(raw, n):
    b = _nb(raw, GGMLType.Q8_K, n)
    d = b[:, 0:4].view(np.float32)
    q = b[:, 4 : 4 + QK_K].view(np.int8)
    return q.reshape(-1).copy(), np.repeat(_expand(d), QK_K // 32), None, 32


def planes_iq2_xxs(raw, n):
    b = _nb(raw, GGMLType.IQ2_XXS, n)
    d = D._f16(b[:, 0:2])
    data = np.ascontiguousarray(b[:, 2:66]).view(np.uint32).reshape(-1, 8, 2)
    aux0 = data[:, :, 0]
    aux1 = data[:, :, 1].astype(np.uint64)
    db = d * ((0.5 + (aux1 >> 28).astype(np.float32)) * 0.25)
    idx = aux0[:, :, None] >> (np.arange(4, dtype=np.uint32) * 8)[None, None, :] & 0xFF
    grid = D.IQ2XXS_GRID[idx].astype(np.int16)  # [nb,8,4,8]
    sidx = (aux1[:, :, None] >> (7 * np.arange(4, dtype=np.uint64))[None, None, :]) & 127
    signs = np.where(
        (D.KSIGNS_IQ2XS[sidx.astype(np.int32)][..., None]
         & D.KMASK_IQ2XS[None, None, None, :]) != 0, -1, 1
    ).astype(np.int16)
    q = (grid * signs).astype(np.int8)
    return q.reshape(-1), db.astype(np.float32).reshape(-1), None, 32


def planes_iq2_xs(raw, n):
    b = _nb(raw, GGMLType.IQ2_XS, n)
    d = D._f16(b[:, 0:2])
    qs = np.ascontiguousarray(b[:, 2:66]).view(np.uint16).reshape(-1, 8, 4)
    scales = b[:, 66:74].astype(np.int32)
    db = np.stack(
        [(scales & 0xF).astype(np.float32), (scales >> 4).astype(np.float32)], axis=2
    )
    db = d[:, :, None] * (0.5 + db) * 0.25  # [nb,8,2] per-16 scale
    grid = D.IQ2XS_GRID[(qs & 511).astype(np.int32)].astype(np.int16)
    sbyte = D.KSIGNS_IQ2XS[(qs >> 9).astype(np.int32)]
    signs = np.where(
        (sbyte[..., None] & D.KMASK_IQ2XS[None, None, None, :]) != 0, -1, 1
    ).astype(np.int16)
    q = (grid * signs).astype(np.int8)
    return q.reshape(-1), db.astype(np.float32).reshape(-1), None, 16


def planes_iq2_s(raw, n):
    b = _nb(raw, GGMLType.IQ2_S, n)
    d = D._f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(-1, 8, 4).astype(np.int32)
    signs_b = b[:, 34:66].reshape(-1, 8, 4).astype(np.int32)
    qh = b[:, 66:74].astype(np.int32)
    scales = b[:, 74:82].astype(np.int32)
    db = np.stack(
        [(scales & 0xF).astype(np.float32), (scales >> 4).astype(np.float32)], axis=2
    )
    db = d[:, :, None] * (0.5 + db) * 0.25
    shift = (8 - 2 * np.arange(4))[None, None, :]
    idx = qs | ((qh[:, :, None] << shift) & 0x300)
    grid = D.IQ2S_GRID[idx].astype(np.int16)
    signs = np.where(
        (signs_b[:, :, :, None] & D.KMASK_IQ2XS[None, None, None, :]) != 0, -1, 1
    ).astype(np.int16)
    q = (grid * signs).astype(np.int8)
    return q.reshape(-1), db.astype(np.float32).reshape(-1), None, 16


def planes_iq3_xxs(raw, n):
    b = _nb(raw, GGMLType.IQ3_XXS, n)
    d = D._f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(-1, 8, 8).astype(np.int32)
    aux = np.ascontiguousarray(b[:, 66:98]).view(np.uint32).reshape(-1, 8)
    db = d * ((0.5 + (aux >> 28).astype(np.float32)) * 0.5)
    grid = D.IQ3XXS_GRID[qs].astype(np.int16).reshape(-1, 8, 4, 8)
    sidx = (
        aux[:, :, None].astype(np.uint64)
        >> (7 * np.arange(4, dtype=np.uint64))[None, None, :]
    ) & 127
    signs = np.where(
        (D.KSIGNS_IQ2XS[sidx.astype(np.int32)][..., None]
         & D.KMASK_IQ2XS[None, None, None, :]) != 0, -1, 1
    ).astype(np.int16)
    q = (grid * signs).astype(np.int8)
    return q.reshape(-1), db.astype(np.float32).reshape(-1), None, 32


def planes_iq3_s(raw, n):
    b = _nb(raw, GGMLType.IQ3_S, n)
    d = D._f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(-1, 8, 8).astype(np.int32)
    qh = b[:, 66:74].astype(np.int32)
    signs_b = b[:, 74:106].reshape(-1, 8, 4).astype(np.int32)
    scales = b[:, 106:110].astype(np.int32)
    ib = np.arange(8)
    ls = (scales[:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
    db = d * (1 + 2 * ls).astype(np.float32)
    k = np.arange(8)
    shift = 8 - k
    idx = qs | ((qh[:, :, None] << shift[None, None, :]) & 256)
    grid = D.IQ3S_GRID[idx].astype(np.int16).reshape(-1, 8, 4, 8)
    signs = np.where(
        (signs_b[:, :, :, None] & D.KMASK_IQ2XS[None, None, None, :]) != 0, -1, 1
    ).astype(np.int16)
    q = (grid * signs).astype(np.int8)
    return q.reshape(-1), db.astype(np.float32).reshape(-1), None, 32


def planes_iq1_s(raw, n):
    b = _nb(raw, GGMLType.IQ1_S, n)
    d = D._f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(-1, 8, 4).astype(np.int32)
    qh = np.ascontiguousarray(b[:, 34:50]).view(np.uint16).reshape(-1, 8).astype(np.int32)
    dl = d * (2 * ((qh >> 12) & 7) + 1).astype(np.float32)  # [nb,8]
    delta = np.where((qh & 0x8000) != 0, -D.IQ1S_DELTA, D.IQ1S_DELTA).astype(np.float32)
    shift = 3 * np.arange(4)
    idx = qs | (((qh[:, :, None] >> shift[None, None, :]) & 7) << 8)
    q = D.IQ1S_GRID[idx]  # [nb,8,4,8] int8
    mins = (dl * delta).astype(np.float32)
    return q.reshape(-1), dl.astype(np.float32).reshape(-1), mins.reshape(-1), 32


def planes_tq2_0(raw, n):
    b = _nb(raw, GGMLType.TQ2_0, n)
    nb = len(b)
    qs = b[:, 0:64].reshape(nb, 2, 32).astype(np.int32)
    d = D._f16(b[:, 64:66])
    shifts = (np.arange(4) * 2).astype(np.int32)
    q = (((qs[:, :, None, :] >> shifts[None, None, :, None]) & 3) - 1).astype(np.int8)
    scales = np.repeat(_expand(d), QK_K // 32)
    return q.reshape(-1), scales, None, 32


_PLANES = {
    GGMLType.Q4_0: planes_q4_0,
    GGMLType.Q4_1: planes_q4_1,
    GGMLType.Q5_0: planes_q5_0,
    GGMLType.Q5_1: planes_q5_1,
    GGMLType.Q8_0: planes_q8_0,
    GGMLType.Q8_K: planes_q8_K,
    GGMLType.Q2_K: planes_q2_K,
    GGMLType.Q3_K: planes_q3_K,
    GGMLType.Q4_K: planes_q4_K,
    GGMLType.Q5_K: planes_q5_K,
    GGMLType.Q6_K: planes_q6_K,
    GGMLType.IQ4_NL: planes_iq4_nl,
    GGMLType.IQ4_XS: planes_iq4_xs,
    GGMLType.MXFP4: planes_mxfp4,
    GGMLType.IQ2_XXS: planes_iq2_xxs,
    GGMLType.IQ2_XS: planes_iq2_xs,
    GGMLType.IQ2_S: planes_iq2_s,
    GGMLType.IQ3_XXS: planes_iq3_xxs,
    GGMLType.IQ3_S: planes_iq3_s,
    GGMLType.IQ1_S: planes_iq1_s,
    GGMLType.TQ2_0: planes_tq2_0,
}

PLANE_TYPES = frozenset(_PLANES)


def extract_planes(raw, dtype: GGMLType, n: int):
    """-> (q int8 [n], scales f32 [n//g], mins f32 [n//g] | None, g).

    Uses the multithreaded C++ codec (native/gguf_native.cpp) when available
    — bitwise-identical to the numpy path (tests/test_native.py)."""
    try:
        from ..native import extract_planes_native

        out = extract_planes_native(np.asarray(raw), int(dtype), n)
        if out is not None:
            return out
    except Exception:  # pragma: no cover - native layer is optional
        pass
    fn = _PLANES.get(dtype)
    if fn is None:
        raise NotImplementedError(f"extract_planes: {dtype.name}")
    return fn(raw, n)


# ---------------------------------------------------------------------------
# hierarchical (superblock-factored) extraction: K-quant scales are
# d(fp16, per 256) x small-int sub-scale (ggml-common.h:327-376); storing the
# factors instead of the f32 product cuts scale-plane HBM bytes 4x. dmin is
# returned pre-negated so min_eff = subm * dm (a pure product, matching the
# flat planes' mins = -(dmin * m) bit for bit).
# ---------------------------------------------------------------------------


def hier_q4_K(raw, n):
    b = _nb(raw, GGMLType.Q4_K, n)
    d = D._f16(b[:, 0:2]).astype(np.float32).reshape(-1)
    dmin = D._f16(b[:, 2:4]).astype(np.float32).reshape(-1)
    sc, mn = D._k4_scale_min(b[:, 4:16])
    qs = b[:, 16:144].reshape(-1, 4, 32)
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    q = np.stack([lo, hi], axis=2).reshape(-1, 8, 32)
    return (q.reshape(-1), sc.astype(np.int8).reshape(-1), d,
            mn.astype(np.int8).reshape(-1), -dmin, 32)


def hier_q5_K(raw, n):
    q, sc, mn, g = planes_q5_K(raw, n)  # reuse bit parse, re-derive factors
    b = _nb(raw, GGMLType.Q5_K, n)
    d = D._f16(b[:, 0:2]).astype(np.float32).reshape(-1)
    dmin = D._f16(b[:, 2:4]).astype(np.float32).reshape(-1)
    sc6, mn6 = D._k4_scale_min(b[:, 4:16])
    return (q, sc6.astype(np.int8).reshape(-1), d,
            mn6.astype(np.int8).reshape(-1), -dmin, 32)


def hier_q6_K(raw, n):
    q, _, _, g = planes_q6_K(raw, n)
    b = _nb(raw, GGMLType.Q6_K, n)
    sc = b[:, 192:208].view(np.int8).reshape(-1, 16)
    d = D._f16(b[:, 208:210]).astype(np.float32).reshape(-1)
    return q, sc.reshape(-1).copy(), d, None, None, 16


def hier_q2_K(raw, n):
    q, _, _, g = planes_q2_K(raw, n)
    b = _nb(raw, GGMLType.Q2_K, n)
    scales = b[:, 0:16]
    d = D._f16(b[:, 80:82]).astype(np.float32).reshape(-1)
    dmin = D._f16(b[:, 82:84]).astype(np.float32).reshape(-1)
    return (q, (scales & 0xF).astype(np.int8).reshape(-1), d,
            (scales >> 4).astype(np.int8).reshape(-1), -dmin, 16)


def hier_q3_K(raw, n):
    q, _, _, g = planes_q3_K(raw, n)
    b = _nb(raw, GGMLType.Q3_K, n)
    sc = (D._q3_scales(b[:, 96:108]).astype(np.int16) - 32).astype(np.int8)
    d = D._f16(b[:, 108:110]).astype(np.float32).reshape(-1)
    return q, sc.reshape(-1), d, None, None, 16


def hier_iq4_xs(raw, n):
    q, _, _, g = planes_iq4_xs(raw, n)
    b = _nb(raw, GGMLType.IQ4_XS, n)
    d = D._f16(b[:, 0:2]).astype(np.float32).reshape(-1)
    scales_h = np.ascontiguousarray(b[:, 2:4]).view(np.uint16).astype(np.int32)
    scales_l = b[:, 4:8].astype(np.int32)
    ib = np.arange(8)
    ls_l = (scales_l[:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
    ls_h = (scales_h >> (2 * ib)[None, :]) & 3
    ls = ((ls_l | (ls_h << 4)) - 32).astype(np.int8)
    return q, ls.reshape(-1), d, None, None, 32


_HIER = {
    GGMLType.Q2_K: hier_q2_K,
    GGMLType.Q3_K: hier_q3_K,
    GGMLType.Q4_K: hier_q4_K,
    GGMLType.Q5_K: hier_q5_K,
    GGMLType.Q6_K: hier_q6_K,
    GGMLType.IQ4_XS: hier_iq4_xs,
}

HIER_TYPES = frozenset(_HIER)
SUPERBLOCK = 256


def extract_planes_hier(raw, dtype: GGMLType, n: int):
    """-> (q int8 [n], sub int8 [n//g], d f32 [n//256],
           subm int8 [n//g] | None, dm f32 [n//256] | None, g)
    with effective scale = sub * d-expanded, min = subm * dm-expanded."""
    fn = _HIER.get(dtype)
    if fn is None:
        raise NotImplementedError(f"extract_planes_hier: {dtype.name}")
    return fn(raw, n)
