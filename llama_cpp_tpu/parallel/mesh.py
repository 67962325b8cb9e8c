"""Device mesh + sharding rules.

This single module replaces the reference's entire distribution stratum
(SURVEY.md section 2.3): layer-split, meta-backend tensor-parallel with NCCL/
butterfly allreduce (ggml/src/ggml-backend-meta.cpp, ggml-cuda allreduce), and
the RPC multi-host fabric — with one jax.sharding.Mesh over ICI/DCN. Weights
and KV get NamedShardings; XLA inserts the all-gather/reduce-scatter/
all-reduce collectives the reference hand-builds.

Axes:
  dp — data/batch (sequences; continuous-batching rows)
  tp — tensor parallel (attention heads / ffn hidden / vocab)
(pp is expressed as layer-stage sharding over dp×tp submeshes in a later
round; ep maps experts over tp.)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qtensor import QuantTensor


def make_mesh(dp: int = 1, tp: int | None = None, devices=None,
              pp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if tp is None:
        tp = len(devices) // (dp * pp)
    if dp * tp * pp > len(devices):
        raise ValueError(
            f"mesh {pp}x{dp}x{tp} needs {dp*tp*pp} devices, "
            f"have {len(devices)}")
    if pp > 1:
        arr = np.array(devices[: pp * dp * tp]).reshape(pp, dp, tp)
        return Mesh(arr, ("pp", "dp", "tp"))
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# ---------------------------------------------------------------------------
# Weight sharding rules — the analog of llama_meta_device_get_split_state
# (reference src/llama-model.cpp:668-709): per-tensor-role split axis.
# Specs are for the [out, in] (row-major numpy) weight layout.
# ---------------------------------------------------------------------------

_ROW_SHARD = {  # shard output dim (column-parallel in Megatron terms)
    "attn_q", "attn_k", "attn_v", "ffn_gate", "ffn_up", "output",
    "ffn_gate_shexp", "ffn_up_shexp", "attn_qkv", "attn_qk", "ffn_gateup",
    "attn_q_b", "attn_kv_b",
}
_COL_SHARD = {  # shard input dim (row-parallel: outputs partial, XLA all-reduces)
    "attn_output", "ffn_down", "ffn_down_shexp",
}
_EXPERT_SHARD = {"ffn_gate_exps", "ffn_up_exps", "ffn_down_exps"}  # experts over tp
_VOCAB_SHARD = {"token_embd"}


def weight_pspec(key: str, ndim: int) -> P:
    if key in _ROW_SHARD:
        return P("tp", None) if ndim == 2 else P("tp")
    if key in _COL_SHARD:
        return P(None, "tp") if ndim == 2 else P(None)
    if key in _EXPERT_SHARD:
        return P("tp", None, None)
    if key in _VOCAB_SHARD:
        return P("tp", None) if ndim == 2 else P(None)
    return P()  # replicated (norms, biases, small tensors)


def _shard_leaf(mesh: Mesh, spec: P, x):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _qt_specs(key: str, qt: QuantTensor) -> tuple[P, P]:
    wspec = weight_pspec(key, qt.q.ndim)
    if qt.transposed and qt.q.ndim >= 2:
        # transposed planes swap the sharded dim: [in, out] layout
        parts = list(wspec)
        parts += [None] * (qt.q.ndim - len(parts))
        parts[-1], parts[-2] = parts[-2], parts[-1]
        wspec = P(*parts)
    return wspec, wspec


def shard_params(params: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Apply NamedShardings to a loaded weight pytree."""

    def place(key: str, w):
        if isinstance(w, QuantTensor):
            wspec, sspec = _qt_specs(key, w)
            return QuantTensor(
                q=_shard_leaf(mesh, wspec, w.q),
                scales=_shard_leaf(mesh, sspec, w.scales),
                mins=None if w.mins is None else _shard_leaf(mesh, sspec, w.mins),
                group=w.group,
                ggml_type=w.ggml_type,
                transposed=w.transposed,
                packed=w.packed,
                d=None if w.d is None else _shard_leaf(mesh, sspec, w.d),
                dmin=None if w.dmin is None else _shard_leaf(mesh, sspec, w.dmin),
                sgroup=w.sgroup,
                out_dim=w.out_dim,
            )
        spec = weight_pspec(key, getattr(w, "ndim", 0))
        return _shard_leaf(mesh, spec, w)

    out = {k: (v if k == "layers" else place(k, v)) for k, v in params.items()}
    out["layers"] = [
        {k: place(k, v) for k, v in lw.items()} for lw in params["layers"]
    ]
    return out


def kv_pspec() -> P:
    # [n_layers, n_seqs, n_kv_heads, n_slots, head_dim]: seqs over dp, heads
    # over tp (GQA co-location, zero comms during attention)
    return P(None, "dp", "tp", None, None)


def shard_kv(kv, mesh: Mesh):
    from ..runtime.kv_cache import KVCache

    # shard heads over tp only when they divide (GQA co-location);
    # otherwise replicate the head axis
    tp = mesh.shape.get("tp", 1)
    head_ax = "tp" if kv.k.shape[2] % max(tp, 1) == 0 else None
    spec = NamedSharding(mesh, P(None, "dp", head_ax, None, None))
    pos_spec = NamedSharding(mesh, P("dp", None))
    sc_spec = NamedSharding(mesh, P(None, "dp", head_ax, None))
    return KVCache(
        k=jax.device_put(kv.k, spec),
        v=jax.device_put(kv.v, spec),
        pos=jax.device_put(kv.pos, pos_spec),
        k_scale=None if kv.k_scale is None else jax.device_put(kv.k_scale, sc_spec),
        v_scale=None if kv.v_scale is None else jax.device_put(kv.v_scale, sc_spec),
    )


def shard_paged_kv(kv, mesh: Mesh):
    """Paged pool sharding: KV heads over tp (GQA co-location — the paged
    flash kernel then reads only local heads); the pool's page axis is shared
    by every sequence, so it stays unsharded. pos/table are small int32
    metadata, replicated."""
    from dataclasses import replace as _rp

    tp = mesh.shape.get("tp", 1)
    head_ax = "tp" if kv.k[0].shape[0] % max(tp, 1) == 0 else None
    spec = NamedSharding(mesh, P(head_ax, None, None))
    sc_spec = NamedSharding(mesh, P(head_ax, None))
    rep = NamedSharding(mesh, P())
    return _rp(
        kv,
        k=tuple(jax.device_put(b, spec) for b in kv.k),
        v=tuple(jax.device_put(b, spec) for b in kv.v),
        pos=jax.device_put(kv.pos, rep),
        table=jax.device_put(kv.table, rep),
        k_scale=None if kv.k_scale is None
        else tuple(jax.device_put(b, sc_spec) for b in kv.k_scale),
        v_scale=None if kv.v_scale is None
        else tuple(jax.device_put(b, sc_spec) for b in kv.v_scale),
    )


def shard_memory(kv, mesh: Mesh):
    """Dispatch over the memory classes (Context._make_memory results)."""
    from ..runtime.kv_cache import KVCache
    from ..runtime.paged_kv import PagedKVCache

    if isinstance(kv, PagedKVCache):
        return shard_paged_kv(kv, mesh)
    if isinstance(kv, KVCache):
        return shard_kv(kv, mesh)
    if hasattr(kv, "full") and hasattr(kv, "swa"):  # ISWACache
        from dataclasses import replace as _rp

        return _rp(kv, full=shard_memory(kv.full, mesh),
                   swa=shard_memory(kv.swa, mesh))
    if hasattr(kv, "kv") and hasattr(kv, "idx"):  # DSAMemory
        from dataclasses import replace as _rp

        return _rp(kv, kv=shard_memory(kv.kv, mesh),
                   idx=shard_memory(kv.idx, mesh))
    # recurrent/hybrid states: replicate (tiny vs KV)
    return jax.device_put(kv, NamedSharding(mesh, P()))
