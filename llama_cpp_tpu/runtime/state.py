"""Context/sequence state serialization (session files).

Analog of reference llama_state_save_file/load_file and llama_state_seq_*
(include/llama.h:829-923, impl src/llama-context.cpp:3021-3213): whole-context
snapshots and per-sequence extraction for slot migration. Format: a single
.npz blob (zip of npy arrays) + a JSON header carrying the model fingerprint
and shape contract — the TPU-side answer to the reference's versioned binary
session format (magic/version include/llama.h:41-49).
"""

from __future__ import annotations

import io
import json
import zlib

import jax.numpy as jnp
import numpy as np

STATE_MAGIC = "tpu-llm-state"
STATE_VERSION = 2


def _pack(arr: jnp.ndarray) -> np.ndarray:
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
# whole-context state
# ---------------------------------------------------------------------------

def save_state(ctx, path: str, extra: dict | None = None) -> int:
    """Snapshot the full context (all sequences). Returns bytes written.
    `extra` rides along in the header (e.g. the prompt-cache token list)."""
    arrays = {
        "k": _pack(ctx.kv.k),
        "v": _pack(ctx.kv.v),
        "pos": np.asarray(ctx.kv.pos),
        "seq_len": np.asarray(ctx.seq_len),
    }
    if ctx.kv.quantized:
        arrays["k_scale"] = np.asarray(ctx.kv.k_scale)
        arrays["v_scale"] = np.asarray(ctx.kv.v_scale)
    header = {
        "magic": STATE_MAGIC,
        "version": STATE_VERSION,
        "model": _fingerprint(ctx),
        "n_ctx": ctx.n_ctx,
        "n_seqs": ctx.n_seqs,
        "n_slots": ctx.n_slots,
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
    from dataclasses import replace

    kv = replace(
        ctx.kv,
        k=_unpack(z["k"], ctx.kv.k.dtype),
        v=_unpack(z["v"], ctx.kv.v.dtype),
        pos=jnp.asarray(z["pos"], jnp.int32),
        k_scale=jnp.asarray(z["k_scale"]) if "k_scale" in z else None,
        v_scale=jnp.asarray(z["v_scale"]) if "v_scale" in z else None,
    )
    ctx.kv = kv
    ctx.seq_len[:] = z["seq_len"]
    return header.get("extra", {})


# ---------------------------------------------------------------------------
# per-sequence state (slot save/restore + migration)
# ---------------------------------------------------------------------------

def save_seq_state(ctx, seq: int) -> bytes:
    """Extract one sequence's KV as a portable blob (positions + rows),
    independent of the source context's slot-table size."""
    pos = np.asarray(ctx.kv.pos[seq])
    idx = np.nonzero(pos >= 0)[0]
    order = np.argsort(pos[idx], kind="stable")
    idx = idx[order]
    arrays = {
        "positions": pos[idx],
        "k": _pack(ctx.kv.k[:, seq][:, :, idx]),  # [L, H, n, Dk]
        "v": _pack(ctx.kv.v[:, seq][:, :, idx]),
    }
    if ctx.kv.quantized:
        arrays["k_scale"] = np.asarray(ctx.kv.k_scale[:, seq][:, :, idx])
        arrays["v_scale"] = np.asarray(ctx.kv.v_scale[:, seq][:, :, idx])
    header = {"magic": STATE_MAGIC, "version": STATE_VERSION,
              "model": _fingerprint(ctx), "seq_len": int(ctx.seq_len[seq])}
    buf = io.BytesIO()
    np.savez_compressed(buf, header=np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8), **arrays)
    return buf.getvalue()


def load_seq_state(ctx, seq: int, blob: bytes) -> int:
    """Scatter a saved sequence into `seq` of this context (slot = position
    identity layout). Returns the number of restored cells."""
    z = np.load(io.BytesIO(blob))
    header = json.loads(bytes(z["header"]).decode())
    if header.get("magic") != STATE_MAGIC:
        raise ValueError("not a tpu-llm sequence state blob")
    if header["model"] != _fingerprint(ctx):
        raise ValueError("sequence state/model mismatch")
    positions = z["positions"]
    if positions.size and int(positions.max()) >= ctx.n_ctx:
        raise ValueError("sequence longer than target context")
    ctx.seq_rm(seq)
    kv = ctx.kv
    slots = jnp.asarray(positions, jnp.int32)
    # int seq + slots array are both advanced indices -> they broadcast and
    # move to front: kv.k.at[:, seq, :, slots] takes values [n, L, H, D]
    from dataclasses import replace

    new = replace(
        kv,
        k=kv.k.at[:, seq, :, slots].set(
            jnp.moveaxis(_unpack(z["k"], kv.k.dtype), 2, 0)),
        v=kv.v.at[:, seq, :, slots].set(
            jnp.moveaxis(_unpack(z["v"], kv.v.dtype), 2, 0)),
        pos=kv.pos.at[seq, slots].set(jnp.asarray(positions, jnp.int32)),
    )
    if ctx.kv.quantized:
        new = replace(
            new,
            k_scale=kv.k_scale.at[:, seq, :, slots].set(
                jnp.moveaxis(jnp.asarray(z["k_scale"]), 2, 0)),
            v_scale=kv.v_scale.at[:, seq, :, slots].set(
                jnp.moveaxis(jnp.asarray(z["v_scale"]), 2, 0)),
        )
    ctx.kv = new
    ctx.seq_len[seq] = header["seq_len"]
    return int(positions.size)
