"""Windowed decode: keep the paged KV pool READ-ONLY inside the decode scan.

Why: the on-device decode loop (Context._gen_chunk_fn / decode_steps_greedy)
carries the KV cache through `lax.scan` and dus-writes one row per layer per
token. XLA's memory-space assignment round-trips the updated pools through
alternate memory (sliced prefetch -> dus -> copy back): the r5 HLO shows 15
of 64 pool buffers plus every scale plane copied once per scan iteration,
~2.4 GB/token on a 40k-token pool — the measured 2.75 ms/tok gap between a
40960-token pool (71.9 tok/s) and a 5120-token one (89.5 tok/s) at B=1
d2048. An aliased in-place Pallas writer was tried first and benched SLOWER
(59.9 tok/s: per-call overhead exceeds the copies it saves — r5 A/B).

The structural fix mirrors what the hardware wants: buffers that are written
every iteration should be small. The scan carries only a per-chunk KV
*window* (<= 128 rows per sequence, a few MB across layers); the pool rides
as a loop constant, so nothing pool-sized is ever cloned. Attention reads
pool pages + the window tail in ONE kernel pass (flash_attention_paged's
window operands — same online softmax, window processed as the final KV
tile). After the scan, the window is spliced into the pool once per chunk
(donated buffers -> in-place, cost amortized over `chunk` tokens).

Rows are stored in the window EXACTLY as the pool stores them (int8 +
per-row scale when the pool is quantized), so windowed decode is
numerically identical to the stepwise path up to online-softmax tile order.

Reference analog: llama.cpp streams decode through the unified cache's cell
buffer in place (SET_ROWS, src/llama-kv-cache.h:205-212); CUDA avoids the
copy problem entirely because ggml buffers are mutable. Under XLA's
functional semantics this window/splice split is the TPU-native equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from .kv_cache import _quant_rows
from .paged_kv import PagedKVCache

WINDOW = 128  # rows per sequence; one flash KV tile (must be % 128)


@jax.tree_util.register_pytree_node_class
@dataclass
class KVWindow:
    """Per-chunk KV rows not yet in the pool (the scan carry).

    wk, wv:     tuples of L arrays [B, Hkv, W, D] (pool dtype)
    wks, wvs:   tuples of L arrays [B, Hkv, W] f32 (quantized pools only)
    wpos:       [B, W] int32 position labels (-1 = unfilled/padding)
    fill:       int32 scalar — next write index (scan iteration counter;
                identical across sequences and layers by construction)
    """

    wk: tuple
    wv: tuple
    wks: tuple | None
    wvs: tuple | None
    wpos: jnp.ndarray
    fill: jnp.ndarray

    def tree_flatten(self):
        return (self.wk, self.wv, self.wks, self.wvs, self.wpos,
                self.fill), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def width(self) -> int:
        return self.wpos.shape[1]

    def advance(self) -> "KVWindow":
        return replace(self, fill=self.fill + 1)


def make_window(pool: PagedKVCache, batch: int, width: int = WINDOW
                ) -> KVWindow:
    L = pool.n_layers
    Hkv, _, Dk = pool.k[0].shape
    Dv = pool.v[0].shape[2]
    kd = pool.k[0].dtype
    q = pool.quantized
    return KVWindow(
        wk=tuple(jnp.zeros((batch, Hkv, width, Dk), kd) for _ in range(L)),
        wv=tuple(jnp.zeros((batch, Hkv, width, Dv), kd) for _ in range(L)),
        wks=tuple(jnp.zeros((batch, Hkv, width), jnp.float32)
                  for _ in range(L)) if q else None,
        wvs=tuple(jnp.zeros((batch, Hkv, width), jnp.float32)
                  for _ in range(L)) if q else None,
        wpos=jnp.full((batch, width), -1, jnp.int32),
        fill=jnp.int32(0),
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class DecodeWindow:
    """PagedKVCache facade for the decode scan: write_layer appends to the
    window, reads see pool + window. Quacks like the pool for
    models/transformer.attention_block (table / layer_view / gather_seq)."""

    pool: PagedKVCache
    win: KVWindow
    seq_ids: jnp.ndarray  # [B] pool sequence row per window batch row

    ring = False

    def tree_flatten(self):
        return (self.pool, self.win, self.seq_ids), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- pool facade -----------------------------------------------------
    @property
    def table(self):
        return self.pool.table

    @property
    def pos(self):
        return self.pool.pos

    @property
    def page(self) -> int:
        return self.pool.page

    @property
    def n_layers(self) -> int:
        return self.pool.n_layers

    @property
    def n_pages(self) -> int:
        return self.pool.n_pages

    @property
    def n_slots(self) -> int:
        return self.pool.n_slots

    @property
    def trash_slot(self) -> int:
        return self.pool.trash_slot

    @property
    def quantized(self) -> bool:
        return self.pool.quantized

    def layer_view(self, il: int):
        return self, il

    # -- write: append to the window -------------------------------------
    def write_layer(self, il, seq_idx, positions, k_new, v_new,
                    update_pos=None, contiguous: bool = False
                    ) -> "DecodeWindow":
        """Decode-step write (T == 1): one row per sequence lands at window
        column `fill`. k_new/v_new [B, Hkv, D]; positions [B]."""
        win = self.win
        B = win.wpos.shape[0]
        assert k_new.shape[0] == B, (k_new.shape, B)
        fill = win.fill

        def put(bufs, rows):  # rows [B, H, D] -> bufs[il] [B, H, W, D]
            upd = rows.astype(bufs[il].dtype)[:, :, None, :]
            new_l = jax.lax.dynamic_update_slice(bufs[il], upd,
                                                 (0, 0, fill, 0))
            return bufs[:il] + (new_l,) + bufs[il + 1:]

        def put_scale(bufs, s):  # s [B, H] -> bufs[il] [B, H, W]
            new_l = jax.lax.dynamic_update_slice(
                bufs[il], s.astype(jnp.float32)[:, :, None], (0, 0, fill))
            return bufs[:il] + (new_l,) + bufs[il + 1:]

        if self.pool.quantized:
            k_q, k_s = _quant_rows(k_new)
            v_q, v_s = _quant_rows(v_new)
            win = replace(win, wk=put(win.wk, k_q), wv=put(win.wv, v_q),
                          wks=put_scale(win.wks, k_s),
                          wvs=put_scale(win.wvs, v_s))
        else:
            win = replace(win, wk=put(win.wk, k_new), wv=put(win.wv, v_new))
        if update_pos if update_pos is not None else il == 0:
            win = replace(win, wpos=jax.lax.dynamic_update_slice(
                win.wpos, positions.astype(jnp.int32)[:, None], (0, fill)))
        return replace(self, win=win)

    def advance(self) -> "DecodeWindow":
        return replace(self, win=self.win.advance())

    # -- reads ------------------------------------------------------------
    def window_dequant(self, il: int, dtype=jnp.bfloat16):
        """-> (k [B, Hkv, W, Dk], v [B, Hkv, W, Dv]) dequantized."""
        w = self.win
        if self.pool.quantized:
            k = w.wk[il].astype(dtype) * w.wks[il][..., None].astype(dtype)
            v = w.wv[il].astype(dtype) * w.wvs[il][..., None].astype(dtype)
            return k, v
        return w.wk[il], w.wv[il]

    def gather_seq(self, layer: int, seq_idx: jnp.ndarray,
                   dtype=jnp.bfloat16):
        """Dense einsum-fallback view: pool slots then window columns.
        seq_idx must be the window's own batch order (the decode scan always
        passes its seq_ids through AttnInputs unchanged)."""
        kp, vp, sp = self.pool.gather_seq(layer, seq_idx, dtype=dtype)
        kw, vw = self.window_dequant(layer, dtype=dtype)
        k = jnp.concatenate([kp, kw.astype(kp.dtype)], axis=2)
        v = jnp.concatenate([vp, vw.astype(vp.dtype)], axis=2)
        return k, v, jnp.concatenate([sp, self.win.wpos], axis=1)

    def seq_slot_pos(self, seq_idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [self.pool.seq_slot_pos(seq_idx), self.win.wpos], axis=1)


def splice_window(pool: PagedKVCache, win: KVWindow, seq_ids: jnp.ndarray
                  ) -> PagedKVCache:
    """Write every window row into the pool (positions < 0 -> trash row).
    Runs OUTSIDE the scan with donated pool buffers — one in-place scatter
    per layer per chunk."""
    B, W = win.wpos.shape
    seq_flat = jnp.repeat(seq_ids, W)
    posf = win.wpos.reshape(-1)
    slots = pool.slot_of(seq_flat, posf)  # [B*W]

    Hkv = pool.k[0].shape[0]

    def rows(buf):  # [B, Hkv, W, D] -> [Hkv, B*W, D]
        d = buf.shape[3]
        return buf.transpose(1, 0, 2, 3).reshape(Hkv, B * W, d)

    def srows(buf):  # [B, Hkv, W] -> [Hkv, B*W]
        return buf.transpose(1, 0, 2).reshape(Hkv, B * W)

    k = tuple(pool.k[il].at[:, slots].set(rows(win.wk[il]))
              for il in range(pool.n_layers))
    v = tuple(pool.v[il].at[:, slots].set(rows(win.wv[il]))
              for il in range(pool.n_layers))
    new = replace(pool, k=k, v=v)
    if pool.quantized:
        new = replace(
            new,
            k_scale=tuple(pool.k_scale[il].at[:, slots].set(srows(win.wks[il]))
                          for il in range(pool.n_layers)),
            v_scale=tuple(pool.v_scale[il].at[:, slots].set(srows(win.wvs[il]))
                          for il in range(pool.n_layers)))
    # trash rows: duplicate indices race, but trash content is never read
    # live (pos label stays whatever lands there; mask uses labels only for
    # real pages — set trash label last to -1 for determinism)
    newpos = new.pos.at[slots].set(posf)
    newpos = newpos.at[pool.trash_slot].set(-1)
    return replace(new, pos=newpos)
