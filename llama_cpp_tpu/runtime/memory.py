"""Recurrent state memory for SSM/linear-attention models.

Analog of reference llama_memory_recurrent (src/llama-memory-recurrent.cpp):
fixed-size per-sequence state slots instead of a KV ring. Two tensors per
layer: the rolling conv window and the SSM (or wkv) state matrix. Sequence
ops are pure tensor updates; partial-range removal (seq_rm with p0>0) is
unsupported, matching the reference's recurrent-memory restriction — rollback
needs snapshots, not cell eviction.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class RecurrentState:
    """conv: [L, n_seqs, d_conv-1, d_inner]; ssm: [L, n_seqs, d_state, d_inner]."""

    conv: jnp.ndarray
    ssm: jnp.ndarray

    def tree_flatten(self):
        return (self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers: int, n_seqs: int, d_conv: int, d_inner: int,
               d_state: int, dtype=jnp.float32,
               conv_channels: int | None = None) -> "RecurrentState":
        # mamba2 convolves over x|B|C (conv_channels > d_inner)
        return cls(
            conv=jnp.zeros((n_layers, n_seqs, max(d_conv - 1, 0),
                            conv_channels or d_inner), dtype),
            ssm=jnp.zeros((n_layers, n_seqs, d_state, d_inner), jnp.float32),
        )

    # -- interface shared with KVCache (duck-typed by Context) ----------
    @property
    def quantized(self) -> bool:
        return False

    @property
    def n_slots(self) -> int:  # recurrent memory has one state per sequence
        return 1

    def get(self, layer: int, seq_idx: jnp.ndarray):
        """-> (conv [B, d_conv-1, d_inner], ssm [B, d_state, d_inner])."""
        return self.conv[layer][seq_idx], self.ssm[layer][seq_idx]

    def put(self, layer: int, seq_idx: jnp.ndarray, conv_new, ssm_new):
        return replace(
            self,
            conv=self.conv.at[layer, seq_idx].set(conv_new.astype(self.conv.dtype)),
            ssm=self.ssm.at[layer, seq_idx].set(ssm_new.astype(self.ssm.dtype)),
        )

    def seq_rm(self, seq: int, p0: int = 0, p1: int = 1 << 30) -> "RecurrentState":
        if p0 > 0:
            raise NotImplementedError(
                "recurrent memory cannot evict a position range "
                "(reference llama-memory-recurrent.cpp seq_rm restriction)"
            )
        return replace(
            self,
            conv=self.conv.at[:, seq].set(0.0),
            ssm=self.ssm.at[:, seq].set(0.0),
        )

    def seq_cp(self, dst: int, src: int) -> "RecurrentState":
        return replace(
            self,
            conv=self.conv.at[:, dst].set(self.conv[:, src]),
            ssm=self.ssm.at[:, dst].set(self.ssm[:, src]),
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridMemory:
    """Attention KV + recurrent state for hybrid models (Jamba/FalconH1/
    Granite-hybrid; reference llama_memory_hybrid, src/llama-memory-hybrid
    .cpp). Attention layers address .kv, SSM layers address .rs; per-layer
    slices for the other family stay unused."""

    kv: "object"  # KVCache
    rs: RecurrentState

    def tree_flatten(self):
        return (self.kv, self.rs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def pos(self):
        return self.kv.pos

    @property
    def quantized(self) -> bool:
        return self.kv.quantized

    @property
    def n_slots(self) -> int:
        return self.kv.n_slots

    def seq_rm(self, seq: int, p0: int = 0, p1: int = 1 << 30) -> "HybridMemory":
        return replace(self, kv=self.kv.seq_rm(seq, p0, p1),
                       rs=self.rs.seq_rm(seq, p0, p1))

    def seq_cp(self, dst: int, src: int) -> "HybridMemory":
        return replace(self, kv=self.kv.seq_cp(dst, src),
                       rs=self.rs.seq_cp(dst, src))


@jax.tree_util.register_pytree_node_class
@dataclass
class DSAMemory:
    """MLA KV + lightning-indexer key cache for DeepSeek sparse attention
    (reference llama_kv_cache_dsa, src/llama-kv-cache-dsa.h: two KV cache
    instances — model keys and indexer keys)."""

    kv: "object"   # main KVCache
    idx: "object"  # indexer KVCache (1 head, indexer key dim; v unused)

    def tree_flatten(self):
        return (self.kv, self.idx), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def pos(self):
        return self.kv.pos

    @property
    def quantized(self) -> bool:
        return self.kv.quantized

    @property
    def n_slots(self) -> int:
        return self.kv.n_slots

    def seq_rm(self, seq: int, p0: int = 0, p1: int = 1 << 30) -> "DSAMemory":
        return replace(self, kv=self.kv.seq_rm(seq, p0, p1),
                       idx=self.idx.seq_rm(seq, p0, p1))

    def seq_cp(self, dst: int, src: int) -> "DSAMemory":
        return replace(self, kv=self.kv.seq_cp(dst, src),
                       idx=self.idx.seq_cp(dst, src))


@jax.tree_util.register_pytree_node_class
@dataclass
class DSV4Memory:
    """DeepSeek-V4 memory (reference llama_kv_cache_dsv4): a raw latent
    cache (k == v, one head) plus per-token COMPRESSOR-ACTIVATION caches
    for the CSA/HCA compressors and the lightning indexer. The reference
    keeps ratio-sized ring states with rollback planes; we keep the full
    activation history (slot == pos) and rebuild compressed rows inside
    the traced step — same committed rows, no host bookkeeping."""

    raw: "object"   # KVCache, 1 head, head_dim latent (k == v)
    comp: "object"  # KVCache: k = compressor kv acts, v = score acts
    lid: "object"   # KVCache: indexer compressor acts (CSA layers)

    def tree_flatten(self):
        return (self.raw, self.comp, self.lid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def pos(self):
        return self.raw.pos

    @property
    def quantized(self) -> bool:
        return self.raw.quantized

    @property
    def n_slots(self) -> int:
        return self.raw.n_slots

    def seq_rm(self, seq: int, p0: int = 0, p1: int = 1 << 30) -> "DSV4Memory":
        return replace(self, raw=self.raw.seq_rm(seq, p0, p1),
                       comp=self.comp.seq_rm(seq, p0, p1),
                       lid=self.lid.seq_rm(seq, p0, p1))

    def seq_cp(self, dst: int, src: int) -> "DSV4Memory":
        return replace(self, raw=self.raw.seq_cp(dst, src),
                       comp=self.comp.seq_cp(dst, src),
                       lid=self.lid.seq_cp(dst, src))
