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
from ..quant.repack import PLANE_TYPES, extract_planes
from ..quant.dequant import dequantize_tensor


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """Block-scaled planes for a 2-D (or stacked 3-D expert) weight."""

    q: jnp.ndarray  # int8 [..., out, in]
    scales: jnp.ndarray  # f32/bf16 [..., out, in//g]
    mins: jnp.ndarray | None  # like scales, or None
    group: int  # static: elements per scale group
    ggml_type: int  # static: original storage dtype (for introspection)

    def tree_flatten(self):
        children = (self.q, self.scales, self.mins)
        return children, (self.group, self.ggml_type)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scales, mins = children
        return cls(q=q, scales=scales, mins=mins, group=aux[0], ggml_type=aux[1])

    @property
    def shape(self):
        return self.q.shape

    @property
    def out_features(self):
        return self.q.shape[-2]

    @property
    def in_features(self):
        return self.q.shape[-1]

    def dequant(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        *lead, out, k = self.q.shape
        g = self.group
        qf = self.q.astype(jnp.float32).reshape(*lead, out, k // g, g)
        w = qf * self.scales.astype(jnp.float32)[..., None]
        if self.mins is not None:
            w = w + self.mins.astype(jnp.float32)[..., None]
        return w.reshape(*lead, out, k).astype(dtype)

    def take_rows(self, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
        """Gather + dequantize rows (embedding lookup)."""
        g = self.group
        q = jnp.take(self.q, ids, axis=0).astype(jnp.float32)  # [..., k]
        sc = jnp.take(self.scales, ids, axis=0).astype(jnp.float32)
        k = q.shape[-1]
        w = q.reshape(*q.shape[:-1], k // g, g) * sc[..., None]
        if self.mins is not None:
            mn = jnp.take(self.mins, ids, axis=0).astype(jnp.float32)
            w = w + mn[..., None]
        return w.reshape(*q.shape).astype(dtype)


Weight = QuantTensor | jnp.ndarray


def load_weight(
    raw: np.ndarray,
    ggml_dtype: GGMLType,
    shape: tuple[int, ...],
    prefer_quant: bool = True,
    dense_dtype=jnp.bfloat16,
) -> Weight:
    """Host-side: GGUF raw bytes -> device weight (planes or dense)."""
    n = int(np.prod(shape))
    if prefer_quant and ggml_dtype in PLANE_TYPES and shape[-1] % 256 == 0:
        q, sc, mn, g = extract_planes(raw, ggml_dtype, n)
        return QuantTensor(
            q=jnp.asarray(q.reshape(shape)),
            scales=jnp.asarray(sc.reshape(*shape[:-1], shape[-1] // g)),
            mins=None if mn is None else jnp.asarray(mn.reshape(*shape[:-1], shape[-1] // g)),
            group=g,
            ggml_type=int(ggml_dtype),
        )
    w = dequantize_tensor(raw, ggml_dtype, shape)
    return jnp.asarray(w).astype(dense_dtype)


# ---------------------------------------------------------------------------
# matmul dispatch
# ---------------------------------------------------------------------------

_USE_PALLAS = False  # flipped on by ops/pallas when kernels are registered
_PALLAS_QMM = None


def set_pallas_qmm(fn):
    global _USE_PALLAS, _PALLAS_QMM
    _PALLAS_QMM = fn
    _USE_PALLAS = fn is not None


def matmul(x: jnp.ndarray, w: Weight, dtype=None) -> jnp.ndarray:
    """y = x @ W.T with W in [out, in] layout (ggml mul_mat convention)."""
    out_dtype = dtype or x.dtype
    if isinstance(w, QuantTensor):
        if _USE_PALLAS and _PALLAS_QMM is not None:
            y = _PALLAS_QMM(x, w)
            return y.astype(out_dtype)
        wd = w.dequant(jnp.bfloat16)
        return jnp.dot(
            x.astype(jnp.bfloat16), wd.T, preferred_element_type=jnp.float32
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
