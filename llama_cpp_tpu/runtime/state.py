"""Context/sequence state serialization (session files).

Analog of reference llama_state_save_file/load_file and llama_state_seq_*
(include/llama.h:829-923, impl src/llama-context.cpp:3021-3213): whole-context
snapshots and per-sequence extraction for slot migration. Format: a single
.npz blob (zip of npy arrays) + a JSON header carrying the model fingerprint
and shape contract — the TPU-side answer to the reference's versioned binary
session format (magic/version include/llama.h:41-49).

Whole-context state is generic over every memory type (unified KV, iSWA,
recurrent, hybrid, DSA) by snapshotting the memory pytree's leaves; per-
sequence state dispatches on the memory class, mirroring the reference's
per-memory-type state_write_data implementations.
"""

from __future__ import annotations

import io
import json

import jax
import jax.numpy as jnp
import numpy as np

STATE_MAGIC = "tpu-llm-state"
STATE_VERSION = 3


def _pack(arr) -> np.ndarray:
    """Device array -> npz-safe numpy (bf16 saved as uint16 bit pattern)."""
    a = np.asarray(arr)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16)
    return a


def _unpack(a: np.ndarray, dtype) -> jnp.ndarray:
    if dtype == jnp.bfloat16 and a.dtype == np.uint16:
        a = a.view(jnp.bfloat16)
    return jnp.asarray(a, dtype)


def _fingerprint(ctx) -> dict:
    cfg = ctx.cfg
    return {
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
        "n_kv_heads": cfg.n_kv_heads,
        "head_dim_k": cfg.head_dim_k,
        "head_dim_v": cfg.head_dim_v,
        "quantized": bool(ctx.kv.quantized),
    }


# ---------------------------------------------------------------------------
# whole-context state: generic pytree snapshot (any memory type)
# ---------------------------------------------------------------------------

def save_state(ctx, path: str, extra: dict | None = None) -> int:
    """Snapshot the full context (all sequences, any memory type). Returns
    bytes written. `extra` rides along in the header (e.g. the prompt-cache
    token list)."""
    leaves, treedef = jax.tree_util.tree_flatten(ctx.kv)
    arrays = {f"leaf_{i}": _pack(lf) for i, lf in enumerate(leaves)}
    arrays["seq_len"] = np.asarray(ctx.seq_len)
    header = {
        "magic": STATE_MAGIC,
        "version": STATE_VERSION,
        "model": _fingerprint(ctx),
        "n_ctx": ctx.n_ctx,
        "n_seqs": ctx.n_seqs,
        "n_slots": ctx.n_slots,
        "memory": type(ctx.kv).__name__,
        "n_leaves": len(leaves),
        "extra": extra or {},
    }
    buf = io.BytesIO()
    np.savez_compressed(buf, header=np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8), **arrays)
    data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_state(ctx, path: str) -> dict:
    """Restore a snapshot written by save_state into a compatible context.
    Returns the header's `extra` dict."""
    z = np.load(path)
    header = json.loads(bytes(z["header"]).decode())
    if header.get("magic") != STATE_MAGIC:
        raise ValueError("not a tpu-llm state file")
    if header.get("version") > STATE_VERSION:
        raise ValueError(f"state version {header['version']} too new")
    if header["model"] != _fingerprint(ctx):
        raise ValueError(
            f"state/model mismatch: {header['model']} vs {_fingerprint(ctx)}"
        )
    if header["n_slots"] != ctx.n_slots or header["n_seqs"] != ctx.n_seqs:
        raise ValueError("context geometry mismatch (n_slots/n_seqs)")
    if header.get("memory") != type(ctx.kv).__name__:
        raise ValueError("memory type mismatch "
                         f"({header.get('memory')} vs {type(ctx.kv).__name__})")
    leaves, treedef = jax.tree_util.tree_flatten(ctx.kv)
    if header["n_leaves"] != len(leaves):
        raise ValueError("memory structure mismatch (leaf count)")
    new_leaves = []
    for i, cur in enumerate(leaves):
        a = z[f"leaf_{i}"]
        if tuple(a.shape) != tuple(cur.shape):
            raise ValueError(f"state leaf {i} shape mismatch "
                             f"{a.shape} vs {cur.shape}")
        new_leaves.append(_unpack(a, cur.dtype))
    ctx.kv = jax.tree_util.tree_unflatten(treedef, new_leaves)
    ctx.seq_len[:] = z["seq_len"]
    if ctx.alloc is not None:
        _rebuild_allocator(ctx)
    return header.get("extra", {})


def _rebuild_allocator(ctx):
    """Re-derive host page-allocator state from a restored device table."""
    alloc = ctx.alloc
    kvp = ctx.kv
    if hasattr(kvp, "full"):      # iSWA
        kvp = kvp.full
    elif hasattr(kvp, "rs"):      # hybrid
        kvp = kvp.kv
    table = np.asarray(kvp.table)
    alloc.table = table.copy()
    used = set()
    for s in range(table.shape[0]):
        n = 0
        for j in range(table.shape[1]):
            if table[s, j] != alloc.trash:
                n = j + 1
                used.add(int(table[s, j]))
        alloc.count[s] = n
    alloc.free = [p for p in range(alloc.n_pages - 2, -1, -1)
                  if p not in used]
    alloc.dirty = False


# ---------------------------------------------------------------------------
# per-sequence state (slot save/restore + migration)
# ---------------------------------------------------------------------------

def _kv_rows(kvc, seq: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (slot indices ordered by position, their positions) for one seq."""
    pos = np.asarray(kvc.seq_pos(seq) if hasattr(kvc, "seq_pos")
                     else kvc.pos[seq])
    idx = np.nonzero(pos >= 0)[0]
    order = np.argsort(pos[idx], kind="stable")
    idx = idx[order]
    return idx, pos[idx]


def _kv_extract(kvc, seq: int, prefix: str) -> dict:
    """KVCache rows of one sequence, ordered by position."""
    idx, positions = _kv_rows(kvc, seq)
    out = {
        prefix + "positions": positions,
        prefix + "k": _pack(kvc.k[:, seq][:, :, idx]),  # [L, H, n, Dk]
        prefix + "v": _pack(kvc.v[:, seq][:, :, idx]),
    }
    if kvc.quantized:
        out[prefix + "k_scale"] = np.asarray(kvc.k_scale[:, seq][:, :, idx])
        out[prefix + "v_scale"] = np.asarray(kvc.v_scale[:, seq][:, :, idx])
    return out


def _kv_inject(kvc, seq: int, z, prefix: str):
    """Scatter saved rows into `seq` of a (cleared) KVCache; slots derive
    from positions via the cache's slot policy (identity or ring)."""
    from dataclasses import replace

    positions = np.asarray(z[prefix + "positions"])
    cap = kvc.n_slots - 1
    if getattr(kvc, "ring", False):
        host_slots = positions % cap
        # ring caches only retain the window's worth of rows: keep the last
        # occupant of each wrapped slot (positions are sorted ascending)
        keep = {}
        for j, s in enumerate(host_slots):
            keep[int(s)] = j
        sel = np.asarray(sorted(keep.values()), dtype=np.int64)
        positions = positions[sel]
        host_slots = host_slots[sel]
    else:
        host_slots = np.minimum(positions, cap - 1)
        sel = None
    slots = jnp.asarray(host_slots, jnp.int32)

    def take(name):
        a = z[prefix + name]
        return a if sel is None else a[:, :, sel]

    # int seq + slots array are both advanced indices -> they broadcast and
    # move to front: kv.k.at[:, seq, :, slots] takes values [n, L, H, D]
    new = replace(
        kvc,
        k=kvc.k.at[:, seq, :, slots].set(
            jnp.moveaxis(_unpack(take("k"), kvc.k.dtype), 2, 0)),
        v=kvc.v.at[:, seq, :, slots].set(
            jnp.moveaxis(_unpack(take("v"), kvc.v.dtype), 2, 0)),
        pos=kvc.pos.at[seq, slots].set(jnp.asarray(positions, jnp.int32)),
    )
    if kvc.quantized:
        new = replace(
            new,
            k_scale=kvc.k_scale.at[:, seq, :, slots].set(
                jnp.moveaxis(jnp.asarray(take("k_scale")), 2, 0)),
            v_scale=kvc.v_scale.at[:, seq, :, slots].set(
                jnp.moveaxis(jnp.asarray(take("v_scale")), 2, 0)),
        )
    return new


def _rs_extract(rs, seq: int, prefix: str) -> dict:
    return {
        prefix + "conv": _pack(rs.conv[:, seq]),
        prefix + "ssm": _pack(rs.ssm[:, seq]),
    }


def _rs_inject(rs, seq: int, z, prefix: str):
    from dataclasses import replace

    return replace(
        rs,
        conv=rs.conv.at[:, seq].set(_unpack(z[prefix + "conv"], rs.conv.dtype)),
        ssm=rs.ssm.at[:, seq].set(_unpack(z[prefix + "ssm"], rs.ssm.dtype)),
    )


def _paged_extract(ctx, seq: int, prefix: str, kvc=None) -> dict:
    """Paged pool rows of one sequence, ordered by position."""
    kvc = ctx.kv if kvc is None else kvc
    pages = ctx.alloc.seq_pages(seq)
    rows = (pages[:, None] * kvc.page
            + np.arange(kvc.page)[None, :]).reshape(-1)
    pos = np.asarray(kvc.pos)[rows]
    occ = np.nonzero(pos >= 0)[0]
    occ = occ[np.argsort(pos[occ], kind="stable")]
    rows = rows[occ]
    out = {
        prefix + "positions": pos[occ],
        prefix + "k": _pack(jnp.stack([kl[:, rows] for kl in kvc.k])),
        prefix + "v": _pack(jnp.stack([vl[:, rows] for vl in kvc.v])),
    }  # [L, H, n, Dk]
    if kvc.quantized:
        out[prefix + "k_scale"] = np.asarray(
            jnp.stack([s[:, rows] for s in kvc.k_scale]))
        out[prefix + "v_scale"] = np.asarray(
            jnp.stack([s[:, rows] for s in kvc.v_scale]))
    return out


def _paged_inject(ctx, seq: int, z, prefix: str, kvc=None):
    from dataclasses import replace

    nested = kvc is not None
    positions = np.asarray(z[prefix + "positions"])
    if positions.size:
        ctx.alloc.ensure(seq, int(positions.max()) + 1)
        ctx._sync_table()
    # _sync_table may have rebuilt the pytree: re-fetch the paged cache
    if not nested:
        kvc = ctx.kv
    elif hasattr(ctx.kv, "full"):   # iSWA full half
        kvc = ctx.kv.full
    else:                           # hybrid attention half
        kvc = ctx.kv.kv
    pg = ctx.alloc.table[seq, positions // kvc.page]
    slots = jnp.asarray(pg * kvc.page + positions % kvc.page, jnp.int32)
    k_in = _unpack(z[prefix + "k"], kvc.k[0].dtype)  # [L, H, n, Dk]
    v_in = _unpack(z[prefix + "v"], kvc.v[0].dtype)
    new = replace(
        kvc,
        k=tuple(kl.at[:, slots].set(k_in[il])
                for il, kl in enumerate(kvc.k)),
        v=tuple(vl.at[:, slots].set(v_in[il])
                for il, vl in enumerate(kvc.v)),
        pos=kvc.pos.at[slots].set(jnp.asarray(positions, jnp.int32)),
    )
    if kvc.quantized:
        ks_in = jnp.asarray(z[prefix + "k_scale"])
        vs_in = jnp.asarray(z[prefix + "v_scale"])
        new = replace(
            new,
            k_scale=tuple(s.at[:, slots].set(ks_in[il])
                          for il, s in enumerate(kvc.k_scale)),
            v_scale=tuple(s.at[:, slots].set(vs_in[il])
                          for il, s in enumerate(kvc.v_scale)),
        )
    return new


def _seq_parts(kv) -> list[tuple[str, object, str]]:
    """-> [(kind, sub-memory, npz key prefix)] for the memory object.
    kind is 'kv', 'rs', or 'paged'; mirrors the per-type state writers of
    the reference (src/llama-kv-cache*.cpp, llama-memory-*.cpp)."""
    from .kv_cache import ISWACache, KVCache
    from .memory import DSAMemory, HybridMemory, RecurrentState
    from .paged_kv import PagedKVCache

    if isinstance(kv, PagedKVCache):
        return [("paged", kv, "")]
    if isinstance(kv, KVCache):
        return [("kv", kv, "")]
    if isinstance(kv, ISWACache):
        kf = "paged" if isinstance(kv.full, PagedKVCache) else "kv"
        return [(kf, kv.full, "full_"), ("kv", kv.swa, "swa_")]
    if isinstance(kv, RecurrentState):
        return [("rs", kv, "rs_")]
    if isinstance(kv, HybridMemory):
        kf = "paged" if isinstance(kv.kv, PagedKVCache) else "kv"
        return [(kf, kv.kv, "kv_"), ("rs", kv.rs, "rs_")]
    if isinstance(kv, DSAMemory):
        return [("kv", kv.kv, "kv_"), ("kv", kv.idx, "idx_")]
    raise ValueError(f"per-sequence state unsupported for {type(kv).__name__}")


def _seq_rebuild(kv, parts: list):
    """Inverse of _seq_parts: reassemble the memory object from new parts."""
    from dataclasses import replace

    from .kv_cache import ISWACache, KVCache
    from .memory import DSAMemory, HybridMemory, RecurrentState
    from .paged_kv import PagedKVCache

    if isinstance(kv, (KVCache, PagedKVCache)):
        return parts[0]
    if isinstance(kv, ISWACache):
        return replace(kv, full=parts[0], swa=parts[1])
    if isinstance(kv, RecurrentState):
        return parts[0]
    if isinstance(kv, HybridMemory):
        return replace(kv, kv=parts[0], rs=parts[1])
    if isinstance(kv, DSAMemory):
        return replace(kv, kv=parts[0], idx=parts[1])
    raise AssertionError


def save_seq_state(ctx, seq: int) -> bytes:
    """Extract one sequence's memory as a portable blob (positions + rows),
    independent of the source context's slot-table size. Supports unified,
    iSWA, recurrent, hybrid, and DSA memory."""
    arrays: dict = {}
    for kind, sub, prefix in _seq_parts(ctx.kv):
        if kind == "paged":
            arrays.update(_paged_extract(ctx, seq, prefix,
                                         kvc=None if sub is ctx.kv else sub))
        elif kind == "kv":
            arrays.update(_kv_extract(sub, seq, prefix))
        else:
            arrays.update(_rs_extract(sub, seq, prefix))
    header = {"magic": STATE_MAGIC, "version": STATE_VERSION,
              "model": _fingerprint(ctx),
              "memory": type(ctx.kv).__name__,
              "seq_len": int(ctx.seq_len[seq])}
    buf = io.BytesIO()
    np.savez_compressed(buf, header=np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8), **arrays)
    return buf.getvalue()


def load_seq_state(ctx, seq: int, blob: bytes) -> int:
    """Scatter a saved sequence into `seq` of this context. Returns the
    number of restored cells (attention rows, or 1 for recurrent state)."""
    z = np.load(io.BytesIO(blob))
    header = json.loads(bytes(z["header"]).decode())
    if header.get("magic") != STATE_MAGIC:
        raise ValueError("not a tpu-llm sequence state blob")
    if header["model"] != _fingerprint(ctx):
        raise ValueError("sequence state/model mismatch")
    if header.get("memory", "KVCache") != type(ctx.kv).__name__:
        raise ValueError("sequence state memory-type mismatch")
    if header["seq_len"] > ctx.n_ctx:
        raise ValueError("sequence longer than target context")
    ctx.seq_rm(seq)
    n = 0
    parts = []
    for kind, sub, prefix in _seq_parts(ctx.kv):
        if kind == "paged":
            parts.append(_paged_inject(
                ctx, seq, z, prefix, kvc=None if sub is ctx.kv else sub))
            n = max(n, int(np.asarray(z[prefix + "positions"]).size))
        elif kind == "kv":
            parts.append(_kv_inject(sub, seq, z, prefix))
            n = max(n, int(np.asarray(z[prefix + "positions"]).size))
        else:
            parts.append(_rs_inject(sub, seq, z, prefix))
            n = max(n, 1)
    ctx.kv = _seq_rebuild(ctx.kv, parts)
    ctx.seq_len[seq] = header["seq_len"]
    return n
