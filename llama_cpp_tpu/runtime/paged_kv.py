"""Paged KV cache: a shared page pool + per-sequence page tables.

TPU-native analog of the reference's unified KV cache cell pool
(src/llama-kv-cache.h:196 find_slot allocates cells shared across streams;
SET_ROWS index builders :205-212 scatter-write into them). Design per
SURVEY.md §7 design-stance row 5:

- one fixed page pool per layer, `k/v: [L, Hkv, n_pages*page, D]` — HBM is
  bounded by the pool size (total live tokens), not n_seqs × n_ctx;
- an int32 page table `[n_seqs, max_pages]` maps (seq, pos // page) -> page
  id; unallocated entries point at the reserved trash page, which also
  absorbs padding writes (slot -1 analog);
- page allocation/free is host-side bookkeeping in `PageAllocator` (the
  find_slot analog — the reference's cell search is host code too); the
  device only ever sees the table as a small int32 array inside the pytree;
- the flash-attention kernel walks a sequence's pages directly via a
  scalar-prefetched table (ops/pallas/flash_attn.flash_attention_paged), so
  batched decode reads the pool in place — no per-step gathered KV copy.

Because table[s, j] covers positions [j*page, (j+1)*page), a sequence's
virtual slot axis is position-ordered: slot_of(pos) = table[s, pos//page] *
page + pos % page. Sequence ops (rm/cp/shift) are table + pos-label updates
plus page-granular copies.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import _quant_rows


class KVCacheFull(RuntimeError):
    """Pool exhausted (reference llama_decode FAILED_PREPARE analog)."""


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    """Page-pool KV storage.

    k, v:      tuple of L arrays [Hkv, S_pool, D] (int8 if quantized;
               S_pool = n_pages * page). PER-LAYER arrays, not one stacked
               [L, ...] buffer: every decode layer reads its pool with a
               static index, and `stacked[il]` in XLA materializes an
               ~pool-slice copy per layer per step (r4 trace: ~27 us x 2 x
               32 layers/token); a tuple element is just a buffer reference
    pos:       [S_pool] int32 position label per pool row (-1 = empty)
    table:     [n_seqs, max_pages] int32 page id per (seq, pos // page)
    k_scale:   tuple of L arrays [Hkv, S_pool] f32 int8 row scales (quantized)
    """

    k: tuple
    v: tuple
    pos: jnp.ndarray
    table: jnp.ndarray
    k_scale: tuple | None = None
    v_scale: tuple | None = None
    page: int = 512

    ring = False  # interface parity with KVCache (paged pools never wrap)

    def tree_flatten(self):
        return (self.k, self.v, self.pos, self.table, self.k_scale,
                self.v_scale), (self.page,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, page=aux[0])

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        n_layers: int,
        n_seqs: int,
        n_pages: int,  # incl. the reserved trash page (last id)
        max_pages: int,  # table width = per-seq virtual capacity / page
        n_kv_heads: int,
        head_dim_k: int,
        head_dim_v: int | None = None,
        dtype=jnp.bfloat16,
        quantized: bool = False,
        page: int = 512,
    ) -> "PagedKVCache":
        head_dim_v = head_dim_v or head_dim_k
        kd = jnp.int8 if quantized else dtype
        s_pool = n_pages * page
        L = n_layers
        return cls(
            k=tuple(jnp.zeros((n_kv_heads, s_pool, head_dim_k), kd)
                    for _ in range(L)),
            v=tuple(jnp.zeros((n_kv_heads, s_pool, head_dim_v), kd)
                    for _ in range(L)),
            pos=jnp.full((s_pool,), -1, jnp.int32),
            table=jnp.full((n_seqs, max_pages), n_pages - 1, jnp.int32),
            k_scale=tuple(jnp.zeros((n_kv_heads, s_pool), jnp.float32)
                          for _ in range(L)) if quantized else None,
            v_scale=tuple(jnp.zeros((n_kv_heads, s_pool), jnp.float32)
                          for _ in range(L)) if quantized else None,
            page=page,
        )

    # ------------------------------------------------------------------
    @property
    def n_layers(self) -> int:
        return len(self.k)

    @property
    def n_pages(self) -> int:
        return self.k[0].shape[1] // self.page

    @property
    def max_pages(self) -> int:
        return self.table.shape[1]

    @property
    def n_slots(self) -> int:
        """Virtual per-sequence slot count (position-ordered view)."""
        return self.max_pages * self.page

    @property
    def trash_slot(self) -> int:
        return self.k[0].shape[1] - 1  # last row of the trash page

    @property
    def quantized(self) -> bool:
        return self.k[0].dtype == jnp.int8

    def layer_view(self, il: int):
        return self, il

    # ------------------------------------------------------------------
    def slot_of(self, seq_idx: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        """(seq, position) -> pool row. Invalid positions -> trash row."""
        pg = jnp.clip(positions // self.page, 0, self.max_pages - 1)
        pid = self.table[seq_idx, pg]
        slot = pid * self.page + positions % self.page
        return jnp.where(positions >= 0, slot, self.trash_slot).astype(jnp.int32)

    # -- write ----------------------------------------------------------
    def write_layer(self, il, seq_idx, positions, k_new, v_new,
                    update_pos=None, contiguous: bool = False) -> "PagedKVCache":
        """Position-addressed write (SET_ROWS analog). `contiguous` is
        advisory only — pages make runs non-contiguous in the pool."""
        slots = self.slot_of(seq_idx, positions)
        single = int(slots.shape[0]) == 1

        def upd_l(bufs, new_l):  # replace one tuple element (static il)
            return bufs[:il] + (new_l,) + bufs[il + 1:]

        def put(bufs, rows):  # rows [N, H, D]; bufs[il] [Hkv, S_pool, D]
            buf = bufs[il]
            if single:
                upd = rows[0].astype(buf.dtype)[:, None]  # [H, 1, D]
                new_l = jax.lax.dynamic_update_slice(buf, upd, (0, slots[0], 0))
            else:
                # buf[:, slots] keeps dims in place -> [H, N, D]
                new_l = buf.at[:, slots].set(
                    rows.astype(buf.dtype).swapaxes(0, 1))
            return upd_l(bufs, new_l)

        def put_scale(bufs, s):  # s [N, H]; bufs[il] [Hkv, S_pool]
            buf = bufs[il]
            if single:
                new_l = jax.lax.dynamic_update_slice(
                    buf, s[0].astype(buf.dtype)[:, None], (0, slots[0]))
            else:
                new_l = buf.at[:, slots].set(s.swapaxes(0, 1))
            return upd_l(bufs, new_l)

        if self.quantized:
            k_q, k_s = _quant_rows(k_new)
            v_q, v_s = _quant_rows(v_new)
            new = replace(self, k=put(self.k, k_q), v=put(self.v, v_q),
                          k_scale=put_scale(self.k_scale, k_s),
                          v_scale=put_scale(self.v_scale, v_s))
        else:
            new = replace(self, k=put(self.k, k_new), v=put(self.v, v_new))
        if update_pos if update_pos is not None else il == 0:
            if single:
                newpos = jax.lax.dynamic_update_slice(
                    self.pos, positions.astype(self.pos.dtype), (slots[0],))
            else:
                newpos = self.pos.at[slots].set(positions.astype(jnp.int32))
            new = replace(new, pos=newpos)
        return new

    # -- read -----------------------------------------------------------
    def read(self, layer: int, dtype=jnp.bfloat16):
        """-> (k, v) [Hkv, S_pool, D] dequantized pool view."""
        if self.quantized:
            k = self.k[layer].astype(dtype) * self.k_scale[layer][..., None].astype(dtype)
            v = self.v[layer].astype(dtype) * self.v_scale[layer][..., None].astype(dtype)
            return k, v
        return self.k[layer], self.v[layer]

    def table_for(self, seq_idx: jnp.ndarray) -> jnp.ndarray:
        return self.table[seq_idx]  # [B, max_pages]

    def seq_slot_pos(self, seq_idx: jnp.ndarray) -> jnp.ndarray:
        """-> [B, n_slots] position label per virtual slot."""
        tb = self.table[seq_idx]
        return self.pos.reshape(self.n_pages, self.page)[tb].reshape(
            tb.shape[0], -1)

    def gather_seq(self, layer: int, seq_idx: jnp.ndarray, dtype=jnp.bfloat16):
        """Dense per-sequence view for the einsum fallback path:
        -> (k [B, Hkv, S, Dk], v [B, Hkv, S, Dv], slot_pos [B, S])."""
        B = seq_idx.shape[0]
        tb = self.table[seq_idx]  # [B, MP]
        H = self.k[0].shape[0]

        def view(buf, d):
            b4 = buf[layer].reshape(H, self.n_pages, self.page, d)
            return (b4[:, tb].transpose(1, 0, 2, 3, 4)
                    .reshape(B, H, -1, d))

        k = view(self.k, self.k[0].shape[2])
        v = view(self.v, self.v[0].shape[2])
        if self.quantized:
            def sview(buf):
                b3 = buf[layer].reshape(H, self.n_pages, self.page)
                return b3[:, tb].transpose(1, 0, 2, 3).reshape(B, H, -1)

            k = k.astype(dtype) * sview(self.k_scale)[..., None].astype(dtype)
            v = v.astype(dtype) * sview(self.v_scale)[..., None].astype(dtype)
        return k, v, self.seq_slot_pos(seq_idx)

    # -- sequence ops ---------------------------------------------------
    def _seq_rows(self, seq: int) -> jnp.ndarray:
        """All pool rows of a sequence's pages (incl. trash rows for
        unallocated entries) -> [max_pages * page] int32."""
        pages = self.table[seq]  # [MP]
        return (pages[:, None] * self.page
                + jnp.arange(self.page, dtype=jnp.int32)[None, :]).reshape(-1)

    def seq_rm(self, seq: int, p0: int = 0, p1: int = 1 << 30) -> "PagedKVCache":
        rows = self._seq_rows(seq)
        vals = self.pos[rows]
        new = jnp.where((vals >= p0) & (vals < p1), -1, vals)
        return replace(self, pos=self.pos.at[rows].set(new))

    def copy_pages(self, src_pages: jnp.ndarray, dst_pages: jnp.ndarray
                   ) -> "PagedKVCache":
        """Page-granular content copy (seq_cp support; table row updates are
        the caller's host-side job)."""
        H = self.k[0].shape[0]

        def cp(buf):  # [H, S_pool, D]
            d = buf.shape[2]
            b4 = buf.reshape(H, self.n_pages, self.page, d)
            b4 = b4.at[:, dst_pages].set(b4[:, src_pages])
            return b4.reshape(buf.shape)

        def cp3(buf):  # [H, S_pool]
            b3 = buf.reshape(H, self.n_pages, self.page)
            b3 = b3.at[:, dst_pages].set(b3[:, src_pages])
            return b3.reshape(buf.shape)

        pos2 = self.pos.reshape(self.n_pages, self.page)
        pos2 = pos2.at[dst_pages].set(pos2[src_pages])
        return replace(
            self,
            k=tuple(cp(b) for b in self.k),
            v=tuple(cp(b) for b in self.v),
            pos=pos2.reshape(-1),
            k_scale=None if self.k_scale is None
            else tuple(cp3(b) for b in self.k_scale),
            v_scale=None if self.v_scale is None
            else tuple(cp3(b) for b in self.v_scale),
        )

    def seq_add(self, seq: int, p0: int, p1: int, delta: int) -> "PagedKVCache":
        """Shift position labels (self-extend support). NOTE: labels move but
        rows stay in their pages, so slot_of no longer resolves shifted
        positions — use shift_seq (which relocates rows) for context shift."""
        rows = self._seq_rows(seq)
        vals = self.pos[rows]
        mask = (vals >= p0) & (vals < p1)
        return replace(self, pos=self.pos.at[rows].set(
            jnp.where(mask, vals + delta, vals)))

    def seq_len(self, seq: int) -> jnp.ndarray:
        rows = self._seq_rows(seq)
        return jnp.sum(self.pos[rows] >= 0)

    # -- context shift (build_rope_shift analog) -------------------------
    def shift_seq(self, cfg, seq: int, n_keep, n_discard) -> "PagedKVCache":
        """Drop positions [n_keep, n_keep+n_discard), slide the rest down,
        re-rotate moved K rows by -n_discard. Works on the sequence's
        position-ordered virtual row list; page frees happen host-side."""
        from ..models.transformer import _rope_params
        from ..ops.rope import ROPE_TYPE_NONE, apply_rope

        S = self.n_slots
        rows = self._seq_rows(seq)  # [S] position-ordered pool rows
        virt = jnp.arange(S, dtype=jnp.int32)
        moved = virt >= n_keep
        src_virt = jnp.where(moved, jnp.minimum(virt + n_discard, S - 1), virt)
        src_rows = rows[src_virt]

        old_pos = self.pos[rows]
        src_pos = self.pos[src_rows]
        new_pos = jnp.where(
            moved & (src_pos >= 0) & (virt + n_discard < S),
            src_pos - n_discard,
            jnp.where(moved, -1, old_pos),
        )
        delta = jnp.where(moved & (new_pos >= 0), -n_discard, 0)  # [S]

        mla = "kv_lora_rank" in cfg.extra
        n_rot = cfg.rope_dims
        k_out, v_out, ks_out, vs_out = [], [], [], []
        for il in range(self.n_layers):
            k_new = self.k[il][:, src_rows]  # [H, S, Dk]
            v_new = self.v[il][:, src_rows]
            if self.quantized:  # dequant -> rotate -> requant (K only)
                k_new = (k_new.astype(jnp.float32)
                         * self.k_scale[il][:, src_rows][..., None])
            if cfg.rope_type != ROPE_TYPE_NONE:
                # MLA caches rope only the TAIL rope_dims of each head (the
                # k_pe channel, reference build_rope_shift on MLA caches);
                # standard caches rope the head's leading rope_dims
                rp = _rope_params(cfg, il)
                x = k_new.transpose(1, 0, 2)  # [S, H, D]
                if mla:
                    from dataclasses import replace as _rp

                    tail = apply_rope(x[..., -n_rot:], delta,
                                      _rp(rp, n_dims=n_rot))
                    x = jnp.concatenate([x[..., :-n_rot], tail], axis=-1)
                else:
                    x = apply_rope(x, delta, rp)
                k_new = x.transpose(1, 0, 2)
            k_new = jnp.where((new_pos >= 0)[None, :, None], k_new, 0)

            if self.quantized:
                k_q, k_s = _quant_rows(k_new)  # [H, S, D] -> q + [H, S]
                k_out.append(self.k[il].at[:, rows].set(k_q))
                v_out.append(self.v[il].at[:, rows].set(v_new))
                ks_out.append(self.k_scale[il].at[:, rows].set(k_s))
                vs_out.append(self.v_scale[il].at[:, rows].set(
                    self.v_scale[il][:, src_rows]))
            else:
                k_out.append(self.k[il].at[:, rows].set(
                    k_new.astype(self.k[il].dtype)))
                v_out.append(self.v[il].at[:, rows].set(
                    v_new.astype(self.v[il].dtype)))
        return replace(
            self,
            k=tuple(k_out),
            v=tuple(v_out),
            pos=self.pos.at[rows].set(new_pos),
            k_scale=tuple(ks_out) if self.quantized else None,
            v_scale=tuple(vs_out) if self.quantized else None,
        )


# ---------------------------------------------------------------------------
# host-side page allocator (find_slot analog)
# ---------------------------------------------------------------------------


class PageAllocator:
    """Host bookkeeping for the page pool: free list + per-seq page counts.
    The authoritative table lives here as numpy; Context mirrors it into the
    device pytree whenever it changes."""

    def __init__(self, n_seqs: int, n_pages: int, max_pages: int, page: int):
        self.page = page
        self.n_pages = n_pages
        self.trash = n_pages - 1
        self.max_pages = max_pages
        # LIFO free list (most-recently-freed first: warm pages get reused)
        self.free: list[int] = list(range(n_pages - 2, -1, -1))
        self.table = np.full((n_seqs, max_pages), self.trash, np.int32)
        self.count = np.zeros(n_seqs, np.int64)
        self.dirty = False  # device table out of date

    @property
    def n_free(self) -> int:
        return len(self.free)

    def pages_for(self, n_tokens: int) -> int:
        return -(-max(n_tokens, 0) // self.page)

    def ensure(self, seq: int, n_tokens: int) -> None:
        """Allocate pages so positions [0, n_tokens) resolve. Raises
        KVCacheFull when the pool is exhausted."""
        need = min(self.pages_for(n_tokens), self.max_pages)
        while self.count[seq] < need:
            if not self.free:
                raise KVCacheFull(
                    f"KV page pool exhausted ({self.n_pages - 1} pages of "
                    f"{self.page} tokens; seq {seq} needs {need})")
            p = self.free.pop()
            self.table[seq, self.count[seq]] = p
            self.count[seq] += 1
            self.dirty = True

    def trim(self, seq: int, n_tokens: int) -> None:
        """Free pages beyond ceil(n_tokens / page)."""
        keep = self.pages_for(n_tokens)
        while self.count[seq] > keep:
            self.count[seq] -= 1
            j = int(self.count[seq])
            self.free.append(int(self.table[seq, j]))
            self.table[seq, j] = self.trash
            self.dirty = True

    def seq_pages(self, seq: int) -> np.ndarray:
        return self.table[seq, : int(self.count[seq])].copy()
