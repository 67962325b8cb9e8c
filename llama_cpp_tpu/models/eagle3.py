"""EAGLE3 speculative draft model (reference src/models/eagle3.cpp +
common/speculative.cpp:395-800 'draft-eagle3').

Architecture: a feature-fusion `fc` [3*n_embd_tgt -> n_embd] over hidden
states extracted from three target layers, plus ONE llama-style decoder
layer whose attention input is the concatenation of two normed streams —
token embedding (attn_norm) and fused target feature g (attn_norm_2) — so
wq/wk/wv take 2*n_embd inputs. The decoder's pre-output-norm residual is
the next position's g (autoregressive feature chaining).

Input convention (reference speculative.cpp:397-400): at memory position P
the decoder consumes the pair (token[P+1], g[P]) with RoPE at P; its logits
predict token[P+2].

TPU shape: the decoder step is one jitted fn over bucketed [1, T] rows
(the draft model is a single layer — dispatch cost, not FLOPs, dominates,
so rows are batched wherever the host loop allows).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import rms_norm
from ..ops.qtensor import embed_lookup, matmul
from .transformer import AttnInputs, attention_block, ffn_block


def eagle3_encode(params: dict[str, Any], cfg, feats: jnp.ndarray) -> jnp.ndarray:
    """Feature fusion (the reference's LLM_GRAPH_TYPE_ENCODER graph):
    [*, 3*n_embd_tgt] target features -> [*, n_embd] g embeddings."""
    x = feats.astype(jnp.bfloat16)
    if cfg.extra.get("norm_before_fc") and "enc_output_norm" in params:
        x = rms_norm(x, params["enc_output_norm"], cfg.rms_eps).astype(x.dtype)
    return matmul(x, params["fc"])


def eagle3_decode(
    params: dict[str, Any],
    cfg,
    tokens: jnp.ndarray,  # [B, T] int32 (t_{P+1} ids)
    g: jnp.ndarray,  # [B, T, n_embd] fused features (g_P rows)
    kv,  # single-layer KVCache
    inputs: AttnInputs,  # positions = P, slots = P (identity)
    tok_embd,  # draft's own or target's token_embd weight
    out_w,  # draft's own or target's lm head
):
    """One decoder step -> (draft logits [B*T, draft_vocab], prenorm hidden
    [B, T, n_embd] = g for position P+1, updated kv)."""
    lw = params["layers"][0]
    emb = embed_lookup(tok_embd, tokens, dtype=jnp.bfloat16)
    e_n = rms_norm(emb, lw["attn_norm"], cfg.rms_eps).astype(emb.dtype)
    g = g.astype(emb.dtype)
    g_n = rms_norm(g, lw["attn_norm_2"], cfg.rms_eps).astype(emb.dtype)
    # norm_before_residual (Redhat speculators): residual takes the NORMED g
    inp_sa = g_n if cfg.extra.get("norm_before_residual") else g
    h = jnp.concatenate([e_n, g_n], axis=-1)  # [B, T, 2*n_embd]
    attn, kv = attention_block(cfg, lw, h, inputs, kv, 0, update_pos=True)
    ffn_inp = attn.astype(jnp.float32) + inp_sa.astype(jnp.float32)
    cur = rms_norm(ffn_inp, lw["ffn_norm"], cfg.rms_eps).astype(emb.dtype)
    ff = ffn_block(cfg, lw, cur, 0)
    h_out = ff.astype(jnp.float32) + ffn_inp  # prenorm state -> next g
    x = rms_norm(h_out, params["output_norm"], cfg.rms_eps).astype(emb.dtype)
    logits = matmul(x.reshape(-1, x.shape[-1]), out_w, dtype=jnp.float32)
    return logits, h_out, kv


class Eagle3Speculator:
    """Speculator-protocol adapter (runtime/speculative.py) with feature
    plumbing: the caller feeds target hidden-state captures via process();
    draft() then runs the seed + greedy chain. Per-seq deferred-boundary
    state mirrors reference speculative.cpp:411-421."""

    needs_features = True

    def __init__(self, draft_model, target_model, n_ctx: int = 2048):
        from ..runtime.kv_cache import KVCache

        self.cfg = draft_model.cfg
        self.params = draft_model.params
        cfg = self.cfg
        ids = cfg.extra["target_layers"]
        assert len(ids) == 3, f"EAGLE3 needs 3 extract layers, got {ids}"
        self.target_layers = tuple(int(i) for i in ids)
        self.tok_embd = self.params.get("token_embd")
        if self.tok_embd is None:
            self.tok_embd = target_model.params["token_embd"]
        self.out_w = self.params.get("output")
        if self.out_w is None:
            self.out_w = target_model.params.get(
                "output", target_model.params["token_embd"])
        d2t = self.params.get("d2t")
        self.d2t = None if d2t is None else np.asarray(d2t)
        self.n_ctx = n_ctx
        n_slots = n_ctx + 8  # last slot = padding trash (Context convention)
        self.kv = KVCache.create(
            1, 1, n_slots, cfg.n_kv_heads, cfg.head_dim_k, cfg.head_dim_v)
        self._kv0 = self.kv
        self.trash = n_slots - 1
        # deferred boundary: the (g, pos) pair whose token arrives later
        self.pending_g = None  # [n_embd] f32
        self.pending_pos = -1
        self._steps: dict[int, Any] = {}

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.kv = self._kv0
        self.pending_g = None
        self.pending_pos = -1

    def _step(self, T: int):
        fn = self._steps.get(T)
        if fn is None:
            cfg, tok_embd, out_w = self.cfg, self.tok_embd, self.out_w

            @partial(jax.jit, donate_argnums=(3,))
            def fn(params, tokens, g, kv, slots, positions):
                inputs = AttnInputs(
                    seq_idx=jnp.zeros(1, jnp.int32), slots=slots,
                    positions=positions)
                return eagle3_decode(
                    params, cfg, tokens, g, kv, inputs, tok_embd, out_w)

            self._steps[T] = fn
        return fn

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def _run(self, toks: np.ndarray, g: jnp.ndarray, positions: np.ndarray):
        """Bucketed [1, T] decoder dispatch -> (logits rows, h rows)."""
        T = len(toks)
        Tb = self._bucket(T)
        tp = np.zeros(Tb, np.int32)
        pp = np.full(Tb, -1, np.int32)
        tp[:T] = toks
        pp[:T] = positions
        slots = np.where(pp >= 0, np.minimum(pp, self.n_ctx - 1),
                         self.trash).astype(np.int32)
        gp = jnp.zeros((1, Tb, g.shape[-1]), jnp.float32)
        gp = gp.at[0, :T].set(g.astype(jnp.float32))
        logits, h, self.kv = self._step(Tb)(
            self.params, jnp.asarray(tp)[None, :], gp, self.kv,
            jnp.asarray(slots)[None, :], jnp.asarray(pp)[None, :])
        return logits[:T], h[0, :T]

    # ------------------------------------------------------------------
    def process(self, tokens: list[int], feats, pos0: int) -> None:
        """Feed target capture: feats[k] is the target's extracted hidden
        concat at sequence position pos0+k; tokens[k] is the token AT that
        position, and tokens must carry one extra trailing id (the token at
        pos0+len(feats)) so every pair (token[k+1], g[k]) is complete except
        the last, which becomes the deferred boundary."""
        n = feats.shape[0] if hasattr(feats, "shape") else len(feats)
        if n == 0:
            return
        assert len(tokens) >= n, "need token at each feature row"
        g = eagle3_encode(self.params, self.cfg, jnp.asarray(feats))
        # drop stale drafted KV at/after the first position we rewrite
        if int(np.asarray(self.kv.pos[0]).max(initial=-1)) >= pos0:
            self._seq_rm(pos0)
        # cross-ubatch bridge (speculative.cpp:752-764): the previous call's
        # deferred pair completes with THIS chunk's first token
        if self.pending_g is not None and self.pending_pos + 1 == pos0:
            self._run(np.asarray(tokens[:1], np.int32),
                      self.pending_g[None, :],
                      np.asarray([self.pending_pos]))
        if n > 1:
            self._run(np.asarray(tokens[1:n], np.int32), g[: n - 1],
                      pos0 + np.arange(n - 1))
        self.pending_g = g[n - 1]
        self.pending_pos = pos0 + n - 1

    def _seq_rm(self, p0: int) -> None:
        from dataclasses import replace

        pos = self.kv.pos
        self.kv = replace(self.kv, pos=jnp.where(pos >= p0, -1, pos))

    def draft(self, tokens: list[int], n: int) -> list[int]:
        if self.pending_g is None or self.pending_pos < 0 or n <= 0:
            return []
        if self.pending_pos != len(tokens) - 2:
            return []  # stale boundary (a non-captured step ran); wait for
            # the next verify process() to refresh the feature chain
        if self.pending_pos + n + 1 >= self.n_ctx:
            return []
        # seed: complete the deferred pair with the target's freshest token
        self._seq_rm(self.pending_pos)
        cur = tokens[-1]
        g = self.pending_g[None, :]
        pos = self.pending_pos
        out: list[int] = []
        for _ in range(n):
            logits, h = self._run(
                np.asarray([cur], np.int32), g, np.asarray([pos]))
            t = int(np.argmax(logits[0]))
            if self.d2t is not None:
                t = int(self.d2t[t])
            out.append(t)
            cur = t
            g = h
            pos += 1
        return out
