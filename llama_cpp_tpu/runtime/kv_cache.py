"""KV cache as a JAX pytree.

Design (SURVEY.md section 7 design stance): fixed-shape slot arrays with an
explicit per-slot position tensor. Writes are scatter ops (the XLA analog of
ggml's GGML_OP_SET_ROWS non-contiguous KV writes, src/llama-kv-cache.h:180) and
attention masks are derived from `pos` (slot -> position, -1 = empty), so
sequence ops (rm/cp/shift) are pure tensor updates and the decode step keeps a
single static shape for XLA. Optional int8 quantized storage mirrors
llama.cpp's type_k/type_v q8_0 KV (include/llama.h:379).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """Per-model KV storage: [n_layers, n_seqs, n_kv_heads, n_slots, head_dim].

    The head axis precedes the slot axis so the Pallas flash-attention kernel
    (ops/pallas/flash_attn.py) streams [S, D] tiles per head with no
    transposes."""

    k: jnp.ndarray
    v: jnp.ndarray
    pos: jnp.ndarray  # [n_seqs, n_slots] int32, -1 = empty
    k_scale: jnp.ndarray | None = None  # [L, n_seqs, H, slots] for int8 KV
    v_scale: jnp.ndarray | None = None
    ring: bool = False  # iSWA window cache: slot = pos % capacity

    def tree_flatten(self):
        return (self.k, self.v, self.pos, self.k_scale, self.v_scale), (self.ring,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, ring=aux[0])

    # -- slot policy (replaces host-side slot computation) ---------------
    @property
    def capacity(self) -> int:
        return self.n_slots - 1  # last slot is the padding trash slot

    def slot_of(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Position -> slot (ring layers wrap; invalid -> trash slot)."""
        cap = self.capacity
        s = positions % cap if self.ring else jnp.minimum(positions, cap - 1)
        return jnp.where(positions >= 0, s, self.n_slots - 1).astype(jnp.int32)

    def layer_view(self, il: int):
        """-> (cache, local layer index) — identity for the unified cache."""
        return self, il

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        n_layers: int,
        n_seqs: int,
        n_slots: int,
        n_kv_heads: int,
        head_dim_k: int,
        head_dim_v: int | None = None,
        dtype=jnp.bfloat16,
        quantized: bool = False,
        ring: bool = False,
    ) -> "KVCache":
        head_dim_v = head_dim_v or head_dim_k
        kd = jnp.int8 if quantized else dtype
        shape_k = (n_layers, n_seqs, n_kv_heads, n_slots, head_dim_k)
        shape_v = (n_layers, n_seqs, n_kv_heads, n_slots, head_dim_v)
        return cls(
            k=jnp.zeros(shape_k, dtype=kd),
            v=jnp.zeros(shape_v, dtype=kd),
            pos=jnp.full((n_seqs, n_slots), -1, dtype=jnp.int32),
            k_scale=jnp.zeros(shape_k[:4], jnp.float32) if quantized else None,
            v_scale=jnp.zeros(shape_v[:4], jnp.float32) if quantized else None,
            ring=ring,
        )

    @property
    def n_slots(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    # -- write ----------------------------------------------------------
    def write_layer(self, il, seq_idx, positions, k_new, v_new,
                    update_pos=None, contiguous: bool = False) -> "KVCache":
        """Position-addressed write: the cache derives its own slots
        (full table: slot=pos; ring: slot=pos%capacity). `contiguous` asserts
        the rows are one sequence's consecutive positions (prefill), enabling
        a dynamic-update-slice instead of a scatter."""
        return self.write(il, seq_idx, self.slot_of(positions), k_new, v_new,
                          positions, update_pos=update_pos,
                          contiguous=contiguous and not self.ring)

    def write(
        self,
        layer: int,
        seq_idx: jnp.ndarray,  # [B*T] int32
        slots: jnp.ndarray,  # [B*T] int32
        k_new: jnp.ndarray,  # [B*T, H, Dk]
        v_new: jnp.ndarray,  # [B*T, H, Dv]
        positions: jnp.ndarray,  # [B*T] int32
        update_pos: bool | None = None,  # default: only on layer 0
        contiguous: bool = False,  # caller-asserted single-seq position run
    ) -> "KVCache":
        single = int(seq_idx.shape[0]) == 1  # decode fast path: dus > scatter
        contig = contiguous and not single

        def put(buf, rows):
            # rows [N, H, D]; buf [L, S, H, slots, D]
            if single:
                upd = rows[0].astype(buf.dtype)[None, None, :, None]  # [1,1,H,1,D]
                return jax.lax.dynamic_update_slice(
                    buf, upd,
                    (layer, seq_idx[0], 0, slots[0], 0))
            if contig:
                upd = rows.astype(buf.dtype).transpose(1, 0, 2)[None, None]
                return jax.lax.dynamic_update_slice(
                    buf, upd, (layer, seq_idx[0], 0, slots[0], 0))
            return buf.at[layer, seq_idx, :, slots].set(rows.astype(buf.dtype))

        def put_scale(buf, s):
            # s [N, H]; buf [L, S, H, slots]
            if single:
                return jax.lax.dynamic_update_slice(
                    buf, s[0].astype(buf.dtype)[None, None, :, None],
                    (layer, seq_idx[0], 0, slots[0]))
            if contig:
                return jax.lax.dynamic_update_slice(
                    buf, s.astype(buf.dtype).T[None, None],
                    (layer, seq_idx[0], 0, slots[0]))
            return buf.at[layer, seq_idx, :, slots].set(s)

        if self.quantized:
            k_q, k_s = _quant_rows(k_new)
            v_q, v_s = _quant_rows(v_new)
            new = replace(self, k=put(self.k, k_q), v=put(self.v, v_q),
                          k_scale=put_scale(self.k_scale, k_s),
                          v_scale=put_scale(self.v_scale, v_s))
        else:
            new = replace(self, k=put(self.k, k_new), v=put(self.v, v_new))
        if update_pos if update_pos is not None else layer == 0:
            if single or contig:
                newpos = jax.lax.dynamic_update_slice(
                    self.pos, positions[None].astype(self.pos.dtype),
                    (seq_idx[0], slots[0]))
            else:
                newpos = self.pos.at[seq_idx, slots].set(positions)
            new = replace(new, pos=newpos)
        return new

    # -- read -----------------------------------------------------------
    def read(self, layer: int, dtype=jnp.bfloat16):
        """-> (k, v) [n_seqs, H, n_slots, D] dequantized."""
        if self.quantized:
            k = self.k[layer].astype(dtype) * self.k_scale[layer][..., None].astype(dtype)
            v = self.v[layer].astype(dtype) * self.v_scale[layer][..., None].astype(dtype)
            return k, v
        return self.k[layer], self.v[layer]

    # -- sequence ops (analog of llama_memory seq_rm/cp/add) -------------
    def seq_rm(self, seq: int, p0: int = 0, p1: int = 1 << 30) -> "KVCache":
        mask = (self.pos[seq] >= p0) & (self.pos[seq] < p1)
        return replace(self, pos=self.pos.at[seq].set(jnp.where(mask, -1, self.pos[seq])))

    def seq_cp(self, dst: int, src: int) -> "KVCache":
        return replace(
            self,
            k=self.k.at[:, dst].set(self.k[:, src]),
            v=self.v.at[:, dst].set(self.v[:, src]),
            pos=self.pos.at[dst].set(self.pos[src]),
            k_scale=None if self.k_scale is None else self.k_scale.at[:, dst].set(self.k_scale[:, src]),
            v_scale=None if self.v_scale is None else self.v_scale.at[:, dst].set(self.v_scale[:, src]),
        )

    def seq_add(self, seq: int, p0: int, p1: int, delta: int) -> "KVCache":
        """Shift positions (context-shift / self-extend support). The RoPE
        re-rotation is applied lazily at attention time via pos deltas in the
        reference; here pos shifts feed the mask and rope shift is handled by
        the runtime re-rotating K rows (runtime/context.py)."""
        p = self.pos[seq]
        mask = (p >= p0) & (p < p1)
        return replace(self, pos=self.pos.at[seq].set(jnp.where(mask, p + delta, p)))

    def seq_len(self, seq: int) -> jnp.ndarray:
        return jnp.sum(self.pos[seq] >= 0)

    # -- context shift (reference build_rope_shift, llama-kv-cache.h:297) --
    def shift_seq(self, cfg, seq: int, n_keep, n_discard) -> "KVCache":
        """Drop positions [n_keep, n_keep+n_discard) of `seq`, slide the rest
        down by n_discard, and re-rotate moved K rows by -n_discard so RoPE
        stays consistent (slot = position identity layout). n_keep/n_discard
        are traced scalars; one compiled program serves all shifts."""
        from dataclasses import replace as _replace

        from ..models.transformer import _rope_params
        from ..ops.rope import ROPE_TYPE_NONE, apply_rope

        S = self.n_slots
        slot_ids = jnp.arange(S, dtype=jnp.int32)
        moved = slot_ids >= n_keep
        src = jnp.where(moved, jnp.minimum(slot_ids + n_discard, S - 1), slot_ids)

        old_pos = self.pos[seq]
        src_pos = old_pos[src]
        new_pos = jnp.where(
            moved & (src_pos >= 0) & (slot_ids + n_discard < S),
            src_pos - n_discard,
            jnp.where(moved, -1, old_pos),
        )
        delta = jnp.where(moved & (new_pos >= 0), -n_discard, 0)  # [S]

        k_seq = self.k[:, seq]  # [L, H, S, D]
        v_seq = self.v[:, seq]
        k_new = k_seq[:, :, src]
        v_new = v_seq[:, :, src]
        if self.quantized:  # dequant -> rotate -> requant (K only)
            k_new = k_new.astype(jnp.float32) * self.k_scale[:, seq][:, :, src][..., None]
        if cfg.rope_type != ROPE_TYPE_NONE:
            # MLA caches rope only the TAIL rope_dims of each head (the k_pe
            # channel); standard caches rope the leading rope_dims
            mla = "kv_lora_rank" in cfg.extra
            n_rot = cfg.rope_dims
            rows = []
            for il in range(k_new.shape[0]):
                # per-layer rope params (SWA layers may use a local freq base)
                rp = _rope_params(cfg, il)
                x = k_new[il].transpose(1, 0, 2)  # [S, H, D]
                if mla:
                    tail = apply_rope(x[..., -n_rot:], delta,
                                      _replace(rp, n_dims=n_rot))
                    x = jnp.concatenate([x[..., :-n_rot], tail], axis=-1)
                else:
                    x = apply_rope(x, delta, rp)
                rows.append(x.transpose(1, 0, 2))
            k_new = jnp.stack(rows)
        k_new = jnp.where((new_pos >= 0)[None, None, :, None], k_new, 0)

        if self.quantized:
            k_q, k_s = _quant_rows(k_new)
            new = _replace(
                self,
                k=self.k.at[:, seq].set(k_q),
                v=self.v.at[:, seq].set(v_new),
                pos=self.pos.at[seq].set(new_pos),
                k_scale=self.k_scale.at[:, seq].set(k_s),
                v_scale=self.v_scale.at[:, seq].set(self.v_scale[:, seq][:, :, src]),
            )
            return new
        return _replace(
            self,
            k=self.k.at[:, seq].set(k_new.astype(self.k.dtype)),
            v=self.v.at[:, seq].set(v_new.astype(self.v.dtype)),
            pos=self.pos.at[seq].set(new_pos),
        )


def _quant_rows(x: jnp.ndarray):
    """Per-head-row int8 quantization (q8_0-style, group = head_dim)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclass
class ISWACache:
    """Two-tier KV memory for interleaved SWA models (reference
    llama_kv_cache_iswa, src/llama-kv-cache-iswa.h): full-attention layers
    keep the whole context, sliding-window layers keep a small ring sized to
    the window — memory stays O(window) for most layers."""

    full: KVCache
    swa: KVCache
    is_swa: tuple  # static: per-model-layer bool
    full_idx: tuple  # static: model layer -> sub-cache layer index
    swa_idx: tuple

    def tree_flatten(self):
        return (self.full, self.swa), (self.is_swa, self.full_idx, self.swa_idx)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @classmethod
    def build(cls, cfg, n_seqs: int, n_slots_full: int, n_slots_swa: int,
              dtype=jnp.bfloat16, quantized: bool = False) -> "ISWACache":
        is_swa = tuple(cfg.is_swa_layer(i) for i in range(cfg.n_layers))
        # cross-layer KV sharing (gemma3n/gemma4): shared layers attend over
        # an owned layer's lines and never write — allocate nothing for them
        # (reference llama-kv-cache.cpp map_layer_ids reuse path)
        reuse = cfg.extra.get("kv_reuse")
        fi, si = [], []
        nf = ns = 0
        for il, s in enumerate(is_swa):
            if reuse is not None and int(reuse[il]) >= 0:
                # alias the source layer's line so layer_view(il) resolves
                # for ANY layer (reference map_layer_ids[il] = map[il_reuse])
                src = int(reuse[il])
                fi.append(fi[src]); si.append(si[src])
                continue
            if s:
                si.append(ns); fi.append(-1); ns += 1
            else:
                fi.append(nf); si.append(-1); nf += 1
        # gemma4: SWA layers may run narrower heads (head_dim_{k,v}_swa)
        dk_swa = int(cfg.extra.get("head_dim_k_swa", cfg.head_dim_k))
        dv_swa = int(cfg.extra.get("head_dim_v_swa", cfg.head_dim_v))
        mk = lambda n_l, n_s, ring, dk, dv: KVCache.create(
            max(n_l, 1), n_seqs, n_s, cfg.n_kv_heads, dk,
            dv, dtype=dtype, quantized=quantized, ring=ring)
        return cls(
            full=mk(nf, n_slots_full, False, cfg.head_dim_k, cfg.head_dim_v),
            swa=mk(ns, n_slots_swa, True, dk_swa, dv_swa),
            is_swa=is_swa,
            full_idx=tuple(fi),
            swa_idx=tuple(si),
        )

    # -- per-layer routing ----------------------------------------------
    def layer_view(self, il: int):
        if self.is_swa[il]:
            return self.swa, self.swa_idx[il]
        return self.full, self.full_idx[il]

    def write_layer(self, il, seq_idx, positions, k_new, v_new,
                    update_pos=None, contiguous: bool = False) -> "ISWACache":
        # each sub-cache keeps its own pos table; update it on that cache's
        # first layer (redundant writes elsewhere are skipped)
        if self.is_swa[il]:
            li = self.swa_idx[il]
            up = update_pos if update_pos is not None else li == 0
            return replace(self, swa=self.swa.write_layer(
                li, seq_idx, positions, k_new, v_new, update_pos=up,
                contiguous=contiguous))
        li = self.full_idx[il]
        up = update_pos if update_pos is not None else li == 0
        return replace(self, full=self.full.write_layer(
            li, seq_idx, positions, k_new, v_new, update_pos=up,
            contiguous=contiguous))

    # -- shared surface ---------------------------------------------------
    @property
    def quantized(self) -> bool:
        return self.full.quantized

    @property
    def n_slots(self) -> int:
        return self.full.n_slots

    @property
    def pos(self):
        return self.full.pos

    def seq_rm(self, seq, p0: int = 0, p1: int = 1 << 30) -> "ISWACache":
        return replace(self, full=self.full.seq_rm(seq, p0, p1),
                       swa=self.swa.seq_rm(seq, p0, p1))

    def seq_cp(self, dst, src) -> "ISWACache":
        return replace(self, full=self.full.seq_cp(dst, src),
                       swa=self.swa.seq_cp(dst, src))

    def seq_add(self, seq, p0, p1, delta) -> "ISWACache":
        return replace(self, full=self.full.seq_add(seq, p0, p1, delta),
                       swa=self.swa.seq_add(seq, p0, p1, delta))
