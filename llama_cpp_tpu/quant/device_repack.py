"""On-device (TPU) GGUF block -> canonical plane extraction.

The host loader (quant/repack.py) parses ggml block formats with numpy — on
a 1-core host that costs ~10 s/GB. Here the raw block BYTES are uploaded to
the device and the same bit-twiddling runs as a jitted XLA program: the host
does a single memcpy per tensor and the chip (HBM-bandwidth-bound) does the
unpack, transpose and nibble re-pack.  This is the TPU analog of the
reference's threaded mmap+repack load path (src/llama-mmap.cpp:445-470,
ggml-cpu/repack.cpp) — except the "threads" are VPU lanes.

Every extractor mirrors its numpy twin in quant/repack.py bit-for-bit
(tests/test_device_repack.py asserts equality), producing the TRANSPOSED
plane layout [K, O] (+ optional 4-bit nibble re-pack) directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGML_BLOCK_LAYOUT, GGMLType

# formats with a device extractor: GGMLType -> (fn, group, static pack4 offset
# or None when the format can't nibble-pack)
_PACK_OFF = {
    GGMLType.Q4_0: 8,   # q in [-8, 7]
    GGMLType.Q4_1: 0,   # q in [0, 15]
    GGMLType.Q4_K: 0,
    GGMLType.Q2_K: 0,   # q in [0, 3]
    GGMLType.Q3_K: 4,   # q in [-4, 3]
}


def _f16(b2: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., 2] little-endian -> f32 [...]."""
    return jax.lax.bitcast_convert_type(b2, jnp.float16).astype(jnp.float32)


def _i32(b: jnp.ndarray) -> jnp.ndarray:
    return b.astype(jnp.int32)


def _x_q4_0(b):
    d = _f16(b[:, 0:2])[:, None]
    qs = _i32(b[:, 2:18])
    q = jnp.concatenate([qs & 0xF, qs >> 4], axis=1) - 8
    return q, jnp.broadcast_to(d, (d.shape[0], 1)), None, 32


def _x_q4_1(b):
    d = _f16(b[:, 0:2])[:, None]
    m = _f16(b[:, 2:4])[:, None]
    qs = _i32(b[:, 4:20])
    q = jnp.concatenate([qs & 0xF, qs >> 4], axis=1)
    return q, d, m, 32


def _q5_high(qh_bytes):
    qh = jax.lax.bitcast_convert_type(qh_bytes, jnp.uint32).astype(jnp.int32)
    qh = qh[:, None] if qh.ndim == 1 else qh  # [nb, 1]
    j = jnp.arange(16, dtype=jnp.int32)[None, :]
    xh0 = ((qh >> j) << 4) & 0x10
    xh1 = (qh >> (j + 12)) & 0x10
    return xh0, xh1


def _x_q5_0(b):
    d = _f16(b[:, 0:2])[:, None]
    xh0, xh1 = _q5_high(b[:, 2:6])
    qs = _i32(b[:, 6:22])
    q = jnp.concatenate([(qs & 0xF) | xh0, (qs >> 4) | xh1], axis=1) - 16
    return q, d, None, 32


def _x_q5_1(b):
    d = _f16(b[:, 0:2])[:, None]
    m = _f16(b[:, 2:4])[:, None]
    xh0, xh1 = _q5_high(b[:, 4:8])
    qs = _i32(b[:, 8:24])
    q = jnp.concatenate([(qs & 0xF) | xh0, (qs >> 4) | xh1], axis=1)
    return q, d, m, 32


def _x_q8_0(b):
    d = _f16(b[:, 0:2])[:, None]
    q = b[:, 2:34].astype(jnp.int8).astype(jnp.int32)
    q = jnp.where(q > 127, q - 256, q)  # uint8 view -> signed
    return q, d, None, 32


def _k4_scale_min(s12):
    q = _i32(s12)
    sc_lo = q[:, 0:4] & 63
    m_lo = q[:, 4:8] & 63
    sc_hi = (q[:, 8:12] & 0xF) | ((q[:, 0:4] >> 6) << 4)
    m_hi = (q[:, 8:12] >> 4) | ((q[:, 4:8] >> 6) << 4)
    return (jnp.concatenate([sc_lo, sc_hi], axis=1),
            jnp.concatenate([m_lo, m_hi], axis=1))


def _x_q4_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _k4_scale_min(b[:, 4:16])  # [nb, 8]
    qs = _i32(b[:, 16:144]).reshape(-1, 4, 32)
    q = jnp.stack([qs & 0xF, qs >> 4], axis=2).reshape(-1, 8 * 32)
    scales = d[:, None] * sc.astype(jnp.float32)
    mins = -(dmin[:, None] * mn.astype(jnp.float32))
    return q, scales, mins, 32


def _h_q4_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _k4_scale_min(b[:, 4:16])
    qs = _i32(b[:, 16:144]).reshape(-1, 4, 32)
    q = jnp.stack([qs & 0xF, qs >> 4], axis=2).reshape(-1, 8 * 32)
    return q, sc, d[:, None], mn, -dmin[:, None], 32


def _x_q5_K(b):
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _k4_scale_min(b[:, 4:16])
    qh = _i32(b[:, 16:48])  # [nb, 32]
    qs = _i32(b[:, 48:176]).reshape(-1, 4, 32)
    jj = jnp.arange(4, dtype=jnp.int32)
    u1 = (1 << (2 * jj)).astype(jnp.int32)[None, :, None]
    u2 = (2 << (2 * jj)).astype(jnp.int32)[None, :, None]
    hb_lo = ((qh[:, None, :] & u1) != 0).astype(jnp.int32) * 16
    hb_hi = ((qh[:, None, :] & u2) != 0).astype(jnp.int32) * 16
    q = jnp.stack([(qs & 0xF) + hb_lo, (qs >> 4) + hb_hi], axis=2)
    scales = d[:, None] * sc.astype(jnp.float32)
    mins = -(dmin[:, None] * mn.astype(jnp.float32))
    return q.reshape(-1, 8 * 32), scales, mins, 32


def _h_q5_K(b):
    q, _, _, g = _x_q5_K(b)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _k4_scale_min(b[:, 4:16])
    return q, sc, d[:, None], mn, -dmin[:, None], 32


def _x_q6_K(b):
    ql = _i32(b[:, 0:128]).reshape(-1, 2, 2, 32)
    qh = _i32(b[:, 128:192]).reshape(-1, 2, 32)
    sc8 = b[:, 192:208].astype(jnp.int32)
    sc = jnp.where(sc8 > 127, sc8 - 256, sc8).astype(jnp.float32)  # int8 view
    d = _f16(b[:, 208:210])
    q1 = (ql[:, :, 0] & 0xF) | (((qh >> 0) & 3) << 4)
    q2 = (ql[:, :, 1] & 0xF) | (((qh >> 2) & 3) << 4)
    q3 = (ql[:, :, 0] >> 4) | (((qh >> 4) & 3) << 4)
    q4 = (ql[:, :, 1] >> 4) | (((qh >> 6) & 3) << 4)
    q = jnp.stack([q1, q2, q3, q4], axis=2) - 32  # [nb, 2, 4, 32]
    scales = d[:, None] * sc.reshape(-1, 16)
    return q.reshape(-1, 256), scales, None, 16


def _h_q6_K(b):
    q, _, _, g = _x_q6_K(b)
    sc8 = b[:, 192:208].astype(jnp.int32)
    sc = jnp.where(sc8 > 127, sc8 - 256, sc8)
    d = _f16(b[:, 208:210])
    return q, sc, d[:, None], None, None, 16


def _x_q2_K(b):
    scales = _i32(b[:, 0:16])
    qs = _i32(b[:, 16:80]).reshape(-1, 2, 32)
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    shifts = (jnp.arange(4, dtype=jnp.int32) * 2)[None, None, :, None]
    q = (qs[:, :, None, :] >> shifts) & 3  # [nb, 2, 4, 32]
    sc = scales.reshape(-1, 2, 4, 2)
    dl = d[:, None, None, None] * (sc & 0xF).astype(jnp.float32)
    ml = -(dmin[:, None, None, None] * (sc >> 4).astype(jnp.float32))
    return (q.reshape(-1, 256), dl.reshape(-1, 16), ml.reshape(-1, 16), 16)


def _h_q2_K(b):
    q, _, _, g = _x_q2_K(b)
    scales = _i32(b[:, 0:16])
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    return (q, (scales & 0xF).reshape(-1, 16), d[:, None],
            (scales >> 4).reshape(-1, 16), -dmin[:, None], 16)


def _q3_scales(s12):
    """12-byte 6-bit scale unpack (reference ggml-quants.c q3_K)."""
    q = _i32(s12)
    j = jnp.arange(4, dtype=jnp.int32)[None, :]
    lo0 = q[:, 0:4] & 0xF
    lo1 = q[:, 4:8] & 0xF
    hi0 = q[:, 0:4] >> 4
    hi1 = q[:, 4:8] >> 4
    b8 = q[:, 8:12]
    sc0 = lo0 | (((b8 >> 0) & 3) << 4)
    sc1 = lo1 | (((b8 >> 2) & 3) << 4)
    sc2 = hi0 | (((b8 >> 4) & 3) << 4)
    sc3 = hi1 | (((b8 >> 6) & 3) << 4)
    del j
    return jnp.concatenate([sc0, sc1, sc2, sc3], axis=1)  # [nb, 16]


def _x_q3_K(b):
    hmask = _i32(b[:, 0:32])
    qs = _i32(b[:, 32:96]).reshape(-1, 2, 32)
    scales6 = _q3_scales(b[:, 96:108]).astype(jnp.float32)
    d = _f16(b[:, 108:110])
    shifts = (jnp.arange(4, dtype=jnp.int32) * 2)[None, None, :, None]
    low = (qs[:, :, None, :] >> shifts) & 3
    mbit = jnp.arange(8, dtype=jnp.int32).reshape(1, 2, 4, 1)
    high = (hmask[:, None, None, :] >> mbit) & 1
    q = low - jnp.where(high != 0, 0, 4)
    sc = scales6.reshape(-1, 16) - 32.0
    scales = d[:, None] * sc
    return q.reshape(-1, 256), scales, None, 16


def _h_q3_K(b):
    q, _, _, g = _x_q3_K(b)
    sc = _q3_scales(b[:, 96:108]) - 32
    d = _f16(b[:, 108:110])
    return q, sc.reshape(-1, 16), d[:, None], None, None, 16


_EXTRACT = {
    GGMLType.Q4_0: _x_q4_0,
    GGMLType.Q4_1: _x_q4_1,
    GGMLType.Q5_0: _x_q5_0,
    GGMLType.Q5_1: _x_q5_1,
    GGMLType.Q8_0: _x_q8_0,
    GGMLType.Q2_K: _x_q2_K,
    GGMLType.Q3_K: _x_q3_K,
    GGMLType.Q4_K: _x_q4_K,
    GGMLType.Q5_K: _x_q5_K,
    GGMLType.Q6_K: _x_q6_K,
}

_GROUP = {t: (16 if t in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q6_K) else 32)
          for t in _EXTRACT}

# superblock-factored extractors (scale bytes /4; see qtensor.QuantTensor.d)
_EXTRACT_H = {
    GGMLType.Q2_K: _h_q2_K,
    GGMLType.Q3_K: _h_q3_K,
    GGMLType.Q4_K: _h_q4_K,
    GGMLType.Q5_K: _h_q5_K,
    GGMLType.Q6_K: _h_q6_K,
}

DEVICE_QUANT_TYPES = frozenset(_EXTRACT)
DEVICE_DENSE_TYPES = frozenset(
    {GGMLType.F32, GGMLType.F16, GGMLType.BF16} | DEVICE_QUANT_TYPES)


def _hier_pack4(dtype: GGMLType, shape: tuple, pack4: bool) -> bool:
    """Static (host-side) packing predicate for the hier extractor. MUST
    stay host-computable: returning it from the jit would force a
    device->host sync per tensor, which over the high-latency host link
    serializes every transfer behind the previous extract (the round-4
    175 s load regression — see scripts/profile_load.py)."""
    return bool(pack4 and dtype in _PACK_OFF and shape[1] % 512 == 0)


@functools.partial(
    jax.jit, static_argnames=("dtype", "shape", "pack4"),
)
def _extract_hier_jit(raw: jnp.ndarray, *, dtype: GGMLType, shape: tuple,
                      pack4: bool):
    """Device-side superblock-factored extraction (transposed 2-D planes):
    -> (qT [K, O] int8 (or packed [K/2, O]), subT int8 [K/g, O],
        dT f32 [K/256, O], submT | None, dmT | None)."""
    layout = GGML_BLOCK_LAYOUT[dtype]
    O, K = shape
    n = O * K
    nb = n // layout.block_size
    b = raw[: nb * layout.type_size].reshape(nb, layout.type_size)
    q, sub, d, subm, dm = _EXTRACT_H[dtype](b)[:5]
    g = _GROUP[dtype]
    qT = q.reshape(O, K).astype(jnp.int8).T
    subT = sub.reshape(O, K // g).astype(jnp.int8).T
    dT = jnp.broadcast_to(d.reshape(nb, 1), (nb, 1)).reshape(O, K // 256).T
    submT = None if subm is None else subm.reshape(O, K // g).astype(jnp.int8).T
    dmT = None if dm is None else dm.reshape(O, K // 256).T
    if _hier_pack4(dtype, shape, pack4):
        off = _PACK_OFF[dtype]
        u = (qT + off).astype(jnp.uint8) if off else qT.astype(jnp.uint8)
        half = u.shape[0] // 2  # half-split pairing
        qT = jax.lax.bitcast_convert_type(
            (u[:half] | (u[half:] << 4)).astype(jnp.uint8), jnp.int8)
        if off:
            submT = subT
            dmT = -float(off) * dT
    return qT, subT, dT, submT, dmT


@functools.partial(
    jax.jit,
    static_argnames=("dtype", "shape", "transpose", "pack4", "out_sc_dtype"),
)
def _extract_jit(raw: jnp.ndarray, *, dtype: GGMLType, shape: tuple,
                 transpose: bool, pack4: bool, out_sc_dtype=jnp.float32):
    layout = GGML_BLOCK_LAYOUT[dtype]
    n = 1
    for s in shape:
        n *= s
    nb = n // layout.block_size
    b = raw[: nb * layout.type_size].reshape(nb, layout.type_size)
    q, sc, mn, g = _EXTRACT[dtype](b)
    # [nb, block] -> flat row-major over `shape` -> planes
    K = shape[-1]
    lead = shape[:-1]
    O = n // K
    q = q.reshape(O, K).astype(jnp.int8)
    sc = sc.reshape(O, K // g).astype(out_sc_dtype)
    mn = None if mn is None else mn.reshape(O, K // g).astype(out_sc_dtype)
    if not transpose:
        if len(lead) != 1:
            q = q.reshape(*lead, K)
            sc = sc.reshape(*lead, K // g)
            mn = None if mn is None else mn.reshape(*lead, K // g)
        return q, sc, mn
    qT = q.T  # [K, O]
    scT = sc.T
    mnT = None if mn is None else mn.T
    if pack4:
        off = _PACK_OFF[dtype]
        u = (qT + off).astype(jnp.uint8) if off else qT.astype(jnp.uint8)
        half = u.shape[0] // 2  # half-split pairing (see qtensor.QuantTensor)
        packed = (u[:half] | (u[half:] << 4)).astype(jnp.uint8)
        qT = jax.lax.bitcast_convert_type(packed, jnp.int8)
        if off:
            base = mnT if mnT is not None else 0.0
            mnT = (base - off * scT.astype(jnp.float32)).astype(out_sc_dtype)
    return qT, scT, mnT


@functools.partial(jax.jit, static_argnames=("dtype", "shape", "out_dtype"))
def _dense_jit(raw: jnp.ndarray, *, dtype: GGMLType, shape: tuple, out_dtype):
    if dtype == GGMLType.F32:
        w = jax.lax.bitcast_convert_type(raw.reshape(-1, 4), jnp.float32)
    elif dtype == GGMLType.F16:
        w = jax.lax.bitcast_convert_type(raw.reshape(-1, 2), jnp.float16)
    else:  # BF16
        w = jax.lax.bitcast_convert_type(raw.reshape(-1, 2), jnp.bfloat16)
    return w.reshape(shape).astype(out_dtype)


def precompile_extractors(gguf_file, *, prefer_quant: bool, dense_dtype):
    """Compile the extract programs for every distinct (dtype, shape) in the
    file's tensor index on a background thread, ahead of the transfer
    stream. Compiles are host-CPU work; the stream is link-bandwidth work —
    overlapping them hides the cold-cache compile cost (~1 s per program).
    Returns the started thread (join before touching the params pytree)."""
    import threading

    from ..ops.qtensor import _PACK4

    if jax.default_backend() != "tpu":
        t = threading.Thread(target=lambda: None)
        t.start()
        return t

    seen = set()
    jobs = []
    for name, info in gguf_file.tensors.items():
        dense = len(info.shape) == 1
        try:
            dtype = GGMLType(info.dtype)
        except ValueError:
            continue
        shape = tuple(info.shape)
        quant_ok = (prefer_quant and not dense and dtype in DEVICE_QUANT_TYPES
                    and shape[-1] % 256 == 0)
        transpose = not dense and len(shape) >= 2 and "embd" not in name
        if quant_ok and transpose and len(shape) == 2 \
                and shape[-1] % 512 == 0 and dtype in _EXTRACT_H:
            key = ("h", dtype, shape)
            fn, kw = _extract_hier_jit, dict(dtype=dtype, shape=shape,
                                             pack4=_PACK4)
        elif quant_ok:
            do_pack = (_PACK4 and transpose and len(shape) == 2
                       and dtype in _PACK_OFF and shape[-1] % 2 == 0)
            key = ("x", dtype, shape, transpose, do_pack)
            fn, kw = _extract_jit, dict(dtype=dtype, shape=shape,
                                        transpose=transpose, pack4=do_pack)
        elif dtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            key = ("d", dtype, shape)
            fn, kw = _dense_jit, dict(dtype=dtype, shape=shape,
                                      out_dtype=jnp.float32 if dense
                                      else dense_dtype)
        else:
            continue
        if key in seen:
            continue
        seen.add(key)
        layout = GGML_BLOCK_LAYOUT.get(dtype)
        if layout is not None:
            n = 1
            for s in shape:
                n *= s
            nbytes = n // layout.block_size * layout.type_size
        else:
            nbytes = 0
        jobs.append((fn, nbytes, kw))

    def run():
        for fn, nbytes, kw in jobs:
            try:
                spec = jax.ShapeDtypeStruct((nbytes,), jnp.uint8)
                fn.lower(spec, **kw).compile()
            except Exception:  # best-effort: stream compiles lazily anyway
                pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def device_load_weight(raw: np.ndarray, ggml_dtype: GGMLType,
                       shape: tuple[int, ...], *, prefer_quant: bool,
                       dense_dtype, transpose: bool, pack4: bool):
    """GGUF raw bytes -> device Weight with ALL unpacking on the TPU.

    Returns None when this format/shape needs the host path (IQ grids,
    non-256-multiple rows, dense fallback of quant formats).
    """
    from ..ops.qtensor import QuantTensor

    if jax.default_backend() != "tpu":
        return None
    dtype = GGMLType(ggml_dtype)
    quant_ok = (prefer_quant and dtype in DEVICE_QUANT_TYPES
                and shape[-1] % 256 == 0)
    if (quant_ok and transpose and len(shape) == 2
            and shape[-1] % 512 == 0 and dtype in _EXTRACT_H):
        raw_d = jax.device_put(np.frombuffer(raw, dtype=np.uint8))
        q, sub, d, subm, dm = _extract_hier_jit(
            raw_d, dtype=dtype, shape=tuple(shape), pack4=pack4)
        return QuantTensor(q=q, scales=sub, mins=subm, group=_GROUP[dtype],
                           ggml_type=int(dtype), transposed=True,
                           packed=_hier_pack4(dtype, tuple(shape), pack4),
                           d=d, dmin=dm, sgroup=256)
    if quant_ok:
        do_pack = (pack4 and transpose and len(shape) == 2
                   and dtype in _PACK_OFF and shape[-1] % 2 == 0)
        raw_d = jax.device_put(np.frombuffer(raw, dtype=np.uint8))
        q, sc, mn = _extract_jit(raw_d, dtype=dtype, shape=tuple(shape),
                                 transpose=transpose, pack4=do_pack)
        g = _GROUP[dtype]
        return QuantTensor(q=q, scales=sc, mins=mn, group=g,
                           ggml_type=int(dtype), transposed=transpose,
                           packed=do_pack)
    if dtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        raw_d = jax.device_put(np.frombuffer(raw, dtype=np.uint8))
        return _dense_jit(raw_d, dtype=dtype, shape=tuple(shape),
                          out_dtype=dense_dtype)
    return None
