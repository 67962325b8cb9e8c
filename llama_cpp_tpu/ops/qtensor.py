"""Device-side quantized tensor: canonical block-scaled int8 planes as a JAX
pytree, plus the matmul dispatch.

This replaces ggml's block structs on the compute path. A weight W[out, in]
is stored as q(int8)[out, in], scales[out, in//g] (+ mins) — produced once at
load by quant/repack.py. The matmul route is chosen per call:
  * dense path: x @ W.T in bf16 (W already dense)
  * dequant path: XLA dequantizes the planes into a transient bf16 tile and
    lets the fusion pipeline feed the MXU (correctness-first route)
  * pallas path: fused block-scaled GEMM kernel (ops/pallas/qmm.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..quant.repack import HIER_TYPES, PLANE_TYPES, extract_planes
from ..quant.dequant import dequantize_tensor


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """Block-scaled planes for a 2-D (or stacked 3-D expert) weight.

    Non-transposed: q [..., out, in], scales [..., out, in//g].
    Transposed (matmul weights; the TPU-friendly layout — scale groups run
    along sublanes so in-kernel expansion is a free broadcast+reshape):
    q [..., in, out], scales [..., in//g, out].
    """

    q: jnp.ndarray
    scales: jnp.ndarray
    mins: jnp.ndarray | None
    group: int  # static: elements per scale group
    ggml_type: int  # static: original storage dtype (for introspection)
    transposed: bool = False  # static
    packed: bool = False  # static: q holds two 4-bit rows per byte (uint8,
    #   [in/2, out]; row k in the low nibble, row k + in/2 high — the
    #   HALF-SPLIT pairing keeps the matmul's activation split x[:, :K/2] /
    #   x[:, K/2:] a free contiguous slice, where an even/odd pairing would
    #   need a lane-shuffle gather per GEMV, ~17 us each on v5e) — halves
    #   weight HBM traffic for 4-bit formats; any value offset folds into mins
    out_dim: int = 0  # static: true output width when the O axis is padded
    #   to a tile-friendly multiple (vocab heads); 0 = unpadded
    # hierarchical scales (K-quant superblocks, ggml-common.h:327-376): the
    # f32 per-group scale factorizes as d(per-256 superblock) x int sub-scale
    # — storing sub int8 + d f32 cuts scale bytes 4x vs flat f32 (the decode
    # step is HBM-bound, so bytes are tok/s). When d is not None: scales is
    # int8 sub-scales, effective scale = sub * d-expanded; mins (if present)
    # is int8 sub-mins with dmin pre-NEGATED so min_eff = subm * dmin.
    d: jnp.ndarray | None = None  # [..., in//sgroup, out] f32 (transposed)
    dmin: jnp.ndarray | None = None
    sgroup: int = 256  # static: elements per superblock row

    def tree_flatten(self):
        children = (self.q, self.scales, self.mins, self.d, self.dmin)
        return children, (self.group, self.ggml_type, self.transposed,
                          self.packed, self.out_dim, self.sgroup)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scales, mins = children[:3]
        d, dmin = (children[3], children[4]) if len(children) > 3 else (None, None)
        return cls(q=q, scales=scales, mins=mins, group=aux[0], ggml_type=aux[1],
                   transposed=aux[2], packed=aux[3] if len(aux) > 3 else False,
                   out_dim=aux[4] if len(aux) > 4 else 0,
                   d=d, dmin=dmin,
                   sgroup=aux[5] if len(aux) > 5 else 256)

    @property
    def hier(self) -> bool:
        return self.d is not None

    def eff_scales(self, dtype=jnp.float32) -> jnp.ndarray:
        """Effective per-group f32 scales [..., in//g, out] (transposed)."""
        if self.d is None:
            return self.scales.astype(dtype)
        r = self.sgroup // self.group
        dx = jnp.repeat(self.d.astype(jnp.float32), r, axis=-2)
        return (self.scales.astype(jnp.float32) * dx).astype(dtype)

    def eff_mins(self, dtype=jnp.float32) -> jnp.ndarray | None:
        if self.mins is None:
            return None
        if self.d is None:
            return self.mins.astype(dtype)
        r = self.sgroup // self.group
        dmx = jnp.repeat(self.dmin.astype(jnp.float32), r, axis=-2)
        return (self.mins.astype(jnp.float32) * dmx).astype(dtype)

    def flatten_scales(self) -> "QuantTensor":
        """Equivalent flat-f32-scales tensor (for consumers that reshape or
        slice scale planes along the group axis)."""
        if self.d is None:
            return self
        return QuantTensor(
            q=self.q, scales=self.eff_scales(), mins=self.eff_mins(),
            group=self.group, ggml_type=self.ggml_type,
            transposed=self.transposed, packed=self.packed,
            out_dim=self.out_dim)

    @property
    def shape(self):
        return self.q.shape

    @property
    def out_features(self):
        if self.out_dim:
            return self.out_dim
        return self.q.shape[-1] if self.transposed else self.q.shape[-2]

    @property
    def in_features(self):
        k = self.q.shape[-2] if self.transposed else self.q.shape[-1]
        return k * 2 if self.packed else k

    def unpack_q(self) -> jnp.ndarray:
        """Packed nibbles -> int8 rows [..., in, out] (transposed layout):
        low nibbles are rows [0, in/2), high nibbles rows [in/2, in)."""
        assert self.packed
        lo = (self.q & 0xF).astype(jnp.int8)
        hi = ((self.q >> 4) & 0xF).astype(jnp.int8)
        return jnp.concatenate([lo, hi], axis=-2)

    def dequant(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        """Dequantize to storage orientation: [out, in], or [in, out] when
        transposed (use with dot(x, w) directly)."""
        g = self.group
        scales = self.eff_scales()
        mins = self.eff_mins()
        if self.transposed:
            qsrc = self.unpack_q() if self.packed else self.q
            *lead, k, out = qsrc.shape
            qf = qsrc.astype(jnp.float32).reshape(*lead, k // g, g, out)
            w = qf * scales[..., None, :]
            if mins is not None:
                w = w + mins[..., None, :]
            w = w.reshape(*lead, k, out)
            if self.out_dim and self.out_dim != out:
                w = w[..., : self.out_dim]
            return w.astype(dtype)
        *lead, out, k = self.q.shape
        qf = self.q.astype(jnp.float32).reshape(*lead, out, k // g, g)
        w = qf * scales[..., None]
        if mins is not None:
            w = w + mins[..., None]
        return w.reshape(*lead, out, k).astype(dtype)

    def take_rows(self, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
        """Gather + dequantize rows (embedding lookup; row-major only)."""
        assert not self.transposed, "take_rows requires row-major planes"
        assert self.d is None, "take_rows requires flat scales"
        g = self.group
        q = jnp.take(self.q, ids, axis=0).astype(jnp.float32)  # [..., k]
        sc = jnp.take(self.scales, ids, axis=0).astype(jnp.float32)
        k = q.shape[-1]
        w = q.reshape(*q.shape[:-1], k // g, g) * sc[..., None]
        if self.mins is not None:
            mn = jnp.take(self.mins, ids, axis=0).astype(jnp.float32)
            w = w + mn[..., None]
        return w.reshape(*q.shape).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class LoraWeight:
    """Base weight + low-rank delta applied at matmul time
    (build_lora_mm analog, reference src/llama-graph.h:1018):
    y = x@base^T + scale * (x@a^T)@b^T with a [r, in], b [out, r]."""

    base: "QuantTensor | jnp.ndarray"
    a: jnp.ndarray
    b: jnp.ndarray
    scale: float  # static: adapter_scale * alpha / rank

    def tree_flatten(self):
        return (self.base, self.a, self.b), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(base=children[0], a=children[1], b=children[2], scale=aux[0])


Weight = QuantTensor | LoraWeight | jnp.ndarray


def load_weight(
    raw: np.ndarray,
    ggml_dtype: GGMLType,
    shape: tuple[int, ...],
    prefer_quant: bool = True,
    dense_dtype=jnp.bfloat16,
    transpose: bool = False,
) -> Weight:
    """Host-side: GGUF raw bytes -> device weight (planes or dense).

    transpose=True stores planes in the TPU matmul layout (load-time repack,
    the analog of ggml-cpu repack.cpp interleaving)."""
    n = int(np.prod(shape))
    if (prefer_quant and transpose and len(shape) == 2
            and shape[-1] % 512 == 0 and ggml_dtype in HIER_TYPES):
        # superblock-factored scales: int8 sub-scales + f32 per-256 d
        # (4x smaller scale planes; bit-identical effective scales)
        from ..quant.repack import extract_planes_hier

        q, sub, d, subm, dm, g = extract_planes_hier(raw, ggml_dtype, n)
        O, K = shape
        q = q.reshape(O, K)
        sub = sub.reshape(O, K // g)
        d = d.reshape(O, K // 256)
        subm = None if subm is None else subm.reshape(O, K // g)
        dm = None if dm is None else dm.reshape(O, K // 256)

        def _t(a):
            if a is None:
                return None
            if a.ndim == 2:
                from ..native import transpose2d

                out = transpose2d(a)
                if out is not None:
                    return out
            return np.ascontiguousarray(np.swapaxes(a, -1, -2))

        q, sub, d, subm, dm = _t(q), _t(sub), _t(d), _t(subm), _t(dm)
        packed = False
        if _PACK4:
            lo, hi = int(q.min()), int(q.max())
            if hi - lo <= 15 and q.shape[0] % 2 == 0 and (
                    lo >= 0 or subm is None):
                off = -lo if lo < 0 or hi > 15 else 0
                u = (q.astype(np.int16) + off).astype(np.uint8)
                half = u.shape[0] // 2
                q = (u[:half] | (u[half:] << 4)).astype(np.uint8).view(np.int8)
                if off:
                    # fold the value offset into the (absent) mins in the
                    # factored domain: min_eff = sub * (-off*d)
                    subm = sub.copy()
                    dm = (-float(off) * d).astype(np.float32)
                packed = True
        return QuantTensor(
            q=jnp.asarray(q),
            scales=jnp.asarray(sub),
            mins=None if subm is None else jnp.asarray(subm),
            group=g,
            ggml_type=int(ggml_dtype),
            transposed=True,
            packed=packed,
            d=jnp.asarray(d),
            dmin=None if dm is None else jnp.asarray(dm),
            sgroup=256,
        )
    if prefer_quant and ggml_dtype in PLANE_TYPES and shape[-1] % 256 == 0:
        q, sc, mn, g = extract_planes(raw, ggml_dtype, n)
        q = q.reshape(shape)
        sc = sc.reshape(*shape[:-1], shape[-1] // g)
        mn = None if mn is None else mn.reshape(*shape[:-1], shape[-1] // g)
        if transpose:
            def _t(a):
                if a is None:
                    return None
                if a.ndim == 2:  # threaded native transpose when available
                    from ..native import transpose2d

                    out = transpose2d(a)
                    if out is not None:
                        return out
                return np.ascontiguousarray(np.swapaxes(a, -1, -2))

            q, sc, mn = _t(q), _t(sc), _t(mn)
        packed = False
        if transpose and q.ndim == 2 and _PACK4:
            # 4-bit nibble packing (Q4_0/Q4_1/Q4_K/Q2_K-class): halves the
            # weight bytes the decode step streams from HBM; any value
            # offset folds into the affine mins term
            lo, hi = int(q.min()), int(q.max())
            if hi - lo <= 15 and q.shape[0] % 2 == 0:
                off = -lo if lo < 0 or hi > 15 else 0
                u = (q.astype(np.int16) + off).astype(np.uint8)
                # int8 view: Mosaic lacks uint8 casts; nibble masks recover
                # the unsigned values after the shift. Half-split pairing:
                # row k low nibble, row k + K/2 high.
                half = u.shape[0] // 2
                q = (u[:half] | (u[half:] << 4)).astype(np.uint8).view(np.int8)
                if off:
                    base = mn if mn is not None else 0.0
                    mn = (base - off * sc.astype(np.float32)).astype(np.float32)
                packed = True
        return QuantTensor(
            q=jnp.asarray(q),
            scales=jnp.asarray(sc),
            mins=None if mn is None else jnp.asarray(mn),
            group=g,
            ggml_type=int(ggml_dtype),
            transposed=transpose,
            packed=packed,
        )
    # dense fallback always stays [out, in] (matmul uses w.T)
    w = dequantize_tensor(raw, ggml_dtype, shape)
    return jnp.asarray(w).astype(dense_dtype)


# ---------------------------------------------------------------------------
# matmul dispatch
# ---------------------------------------------------------------------------

_USE_PALLAS: bool | None = None  # resolved lazily (TPU backend only)
_PALLAS_QMM = None
import os as _os

_PACK4 = _os.environ.get("LLAMA_TPU_PACK4", "1") != "0"


def set_pallas_qmm(fn):
    global _USE_PALLAS, _PALLAS_QMM
    _PALLAS_QMM = fn
    _USE_PALLAS = fn is not None


def _resolve_pallas() -> bool:
    global _USE_PALLAS, _PALLAS_QMM
    if _USE_PALLAS is None:
        try:
            if jax.default_backend() == "tpu":
                from .pallas.qmm import pallas_qmm_dispatch

                _PALLAS_QMM = pallas_qmm_dispatch
                _USE_PALLAS = True
            else:
                _USE_PALLAS = False
        except Exception:  # pragma: no cover - kernel import failure
            _USE_PALLAS = False
    return _USE_PALLAS


def matmul(x: jnp.ndarray, w: Weight, dtype=None) -> jnp.ndarray:
    """y = x @ W.T with W in [out, in] layout (ggml mul_mat convention)."""
    out_dtype = dtype or x.dtype
    if isinstance(w, LoraWeight):
        y = matmul(x, w.base, dtype=jnp.float32)
        h = jnp.dot(x.astype(jnp.bfloat16), w.a.T,
                    preferred_element_type=jnp.float32)
        delta = jnp.dot(h.astype(jnp.bfloat16), w.b.T,
                        preferred_element_type=jnp.float32)
        return (y + w.scale * delta).astype(out_dtype)
    if isinstance(w, QuantTensor):
        if _resolve_pallas() and _PALLAS_QMM is not None:
            y = _PALLAS_QMM(x, w)
            if y is not None:
                return y.astype(out_dtype)
        mdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
        wd = w.dequant(mdt)
        if not w.transposed:
            wd = wd.T
        return jnp.dot(
            x.astype(mdt), wd, preferred_element_type=jnp.float32
        ).astype(out_dtype)
    return jnp.dot(
        x.astype(w.dtype) if w.dtype == jnp.bfloat16 else x,
        w.T,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def embed_lookup(table: Weight, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    if isinstance(table, QuantTensor):
        return table.take_rows(ids, dtype)
    return jnp.take(table, ids, axis=0).astype(dtype)


def pad_out_features(qt: QuantTensor, multiple: int = 4096) -> QuantTensor:
    """Zero-pad a 2-D transposed plane's O axis to a tile-friendly multiple.

    Vocab-sized heads (e.g. 128256) have no wide multiple-of-128 divisors, so
    the GEMV tiling degrades to thin tiles; padding restores full-width DMA
    rows (scripts/bench_qmm.py). Pad columns dequantize to 0 and matmul/qmm
    slice them away via out_dim."""
    assert qt.transposed and qt.q.ndim == 2
    o = qt.q.shape[1]
    o_pad = (o + multiple - 1) // multiple * multiple
    if o_pad == o:
        return qt
    pad = ((0, 0), (0, o_pad - o))
    return QuantTensor(
        q=jnp.pad(qt.q, pad),
        scales=jnp.pad(qt.scales, pad),
        mins=None if qt.mins is None else jnp.pad(qt.mins, pad),
        group=qt.group, ggml_type=qt.ggml_type, transposed=True,
        packed=qt.packed, out_dim=o,
        d=None if qt.d is None else jnp.pad(qt.d, pad),
        dmin=None if qt.dmin is None else jnp.pad(qt.dmin, pad),
        sgroup=qt.sgroup,
    )
