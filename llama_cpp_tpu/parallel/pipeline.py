"""Pipeline parallelism: GPipe-style stage executor over a mesh axis.

Analog of the reference's scheduler pipeline parallelism (ggml-backend.cpp
n_copies=4 event machinery, SURVEY.md §2.3): layers split into S stages, each
stage's weights resident on its own devices; microbatch activations rotate
stage-to-stage with jax.lax.ppermute so all stages compute concurrently after
the fill phase. TPU-idiomatic: one shard_map, activations never leave the
ICI ring, the schedule is a static unrolled loop (M + S - 1 ticks).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,  # (stage_params, x) -> y   (same shape)
    stage_params,  # pytree; every leaf has leading dim n_stages
    x: jnp.ndarray,  # [n_micro, mb, ...] microbatched input
    mesh: Mesh,
    axis: str = "pp",
) -> jnp.ndarray:
    """Run x through all S stages in pipeline order; returns [n_micro, mb, ...].

    stage_params leaves are sharded on their leading (stage) axis; inside the
    shard_map each device sees only its own stage's slice.
    """
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[axis]
    M = x.shape[0]

    def body(params_local, x_all):
        # params_local leaves: [1, ...] (this stage's slice)
        params_me = jax.tree_util.tree_map(lambda a: a[0], params_local)
        sid = jax.lax.axis_index(axis)
        mb_shape = x_all.shape[1:]

        carry = jnp.zeros(mb_shape, x_all.dtype)  # activation arriving at me
        out = jnp.zeros_like(x_all)
        perm_fwd = [(i, (i + 1) % S) for i in range(S)]

        for t in range(M + S - 1):
            # stage sid works on microbatch m = t - sid this tick
            m = t - sid
            active = (m >= 0) & (m < M)
            inp = jnp.where(
                sid == 0,
                x_all[jnp.clip(t, 0, M - 1)],  # stage 0 reads fresh input
                carry,
            )
            h = stage_fn(params_me, inp)
            h = jnp.where(active, h, 0.0)
            # last stage banks its finished microbatch
            bank = (sid == S - 1) & active
            out = jax.lax.cond(
                bank,
                lambda o: o.at[jnp.clip(m, 0, M - 1)].set(h),
                lambda o: o,
                out,
            )
            if t < M + S - 2:
                carry = jax.lax.ppermute(h, axis, perm_fwd)
        # only the last stage holds real outputs; share them along the ring
        return jax.lax.psum(jnp.where(sid == S - 1, out, 0.0), axis)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_rep=False,
    )
    return fn(stage_params, x)


def stack_stage_params(per_stage: list) -> object:
    """List of per-stage pytrees -> one pytree with a leading stage axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)


# ---------------------------------------------------------------------------
# serving integration: the dense layer stack as a GPipe pipeline
# ---------------------------------------------------------------------------


def stack_layer_stages(layers: list, n_stages: int):
    """params["layers"] (L homogeneous dicts) -> one pytree with leaves
    [S, K, ...] (S stages of K layers each). The layer dicts must share one
    key set and per-key shapes — plain dense decoders only."""
    L = len(layers)
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible into {n_stages} stages")
    keys = set(layers[0].keys())
    for lw in layers[1:]:
        if set(lw.keys()) != keys:
            raise ValueError("pipeline parallelism needs homogeneous layers"
                             f" (key mismatch: {set(lw.keys()) ^ keys})")
    K = L // n_stages
    stages = []
    for s in range(n_stages):
        group = layers[s * K: (s + 1) * K]
        stages.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *group))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)


def shard_layer_stages(stages, mesh: Mesh, axis: str = "pp"):
    """Place each stage's slice on its pipeline rank (dim0 over `axis`)."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), stages)


def pipeline_layer_stack(
    cfg,
    stages,  # leaves [S, K, ...] sharded dim0 over `axis`
    x: jnp.ndarray,  # [B, T, E] embedded input
    inputs,  # AttnInputs (seq_idx [B], slots/positions [B, T])
    kv,  # KVCache: k/v [L, ...] sharded dim0 over `axis`; pos replicated
    mesh: Mesh,
    axis: str = "pp",
):
    """Run the transformer layer stack through the GPipe schedule, KV
    threaded as per-stage state. The serving analog of the reference's
    scheduler pipelining (ggml-backend.cpp:1804 n_copies event machinery):
    T is split into M microbatches; stage s owns layers [s*K, (s+1)*K) and
    their KV lines; activations rotate stage-to-stage over ICI with
    lax.ppermute. Position-addressed KV makes inactive fill/drain ticks
    harmless — their writes are routed to the trash slot.

    Causality across microbatches holds because chunk m is processed by
    every stage before chunk m+1 arrives there, so earlier chunks' KV rows
    are already resident. -> (y [B, T, E], kv')."""
    from dataclasses import replace

    from ..models.transformer import (AttnInputs, attention_block, ffn_block,
                                      norm)
    from ..runtime.kv_cache import KVCache
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[axis]
    B, T, E = x.shape
    L = kv.k.shape[0]
    K = L // S
    # microbatch split along T: GPipe keeps all stages busy when M >= S;
    # decode (T == 1) degrades to fill-drain (still correct, latency-bound)
    M = S if (T % S == 0 and T // S >= 8) else 1
    mb = T // M
    trash = kv.n_slots - 1

    x_mb = x.reshape(B, M, mb, E).swapaxes(0, 1)  # [M, B, mb, E]
    slots_mb = inputs.slots.reshape(B, M, mb).swapaxes(0, 1)
    pos_mb = inputs.positions.reshape(B, M, mb).swapaxes(0, 1)
    quant = kv.k_scale is not None

    def body(st, k_loc, v_loc, ks_loc, vs_loc, pos, x_all, slots_all,
             pos_all, seq_idx):
        params_me = jax.tree_util.tree_map(lambda a: a[0], st)  # [K, ...]
        sid = jax.lax.axis_index(axis)
        carry = jnp.zeros(x_all.shape[1:], x_all.dtype)
        out = jnp.zeros_like(x_all)
        perm = [(i, (i + 1) % S) for i in range(S)]
        for t in range(M + S - 1):
            m = t - sid
            active = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            h = jnp.where(sid == 0, x_all[jnp.clip(t, 0, M - 1)], carry)
            mb_inputs = AttnInputs(
                seq_idx=seq_idx,
                slots=jnp.where(active, slots_all[mi], trash),
                positions=jnp.where(active, pos_all[mi], -1),
            )
            kvc = KVCache(k=k_loc, v=v_loc, pos=pos,
                          k_scale=ks_loc, v_scale=vs_loc)
            for kk in range(K):
                lw = jax.tree_util.tree_map(lambda a, _k=kk: a[_k],
                                            params_me)
                hn = norm(cfg, h, lw, "attn_norm")
                attn, kvc = attention_block(cfg, lw, hn, mb_inputs, kvc, kk,
                                            update_pos=kk == 0)
                h = h + attn
                hn = norm(cfg, h, lw, "ffn_norm")
                ff = ffn_block(cfg, lw, hn, kk)
                h = h + ff
            k_loc, v_loc, pos = kvc.k, kvc.v, kvc.pos
            ks_loc, vs_loc = kvc.k_scale, kvc.v_scale
            h = jnp.where(active, h, 0.0).astype(x_all.dtype)
            bank = (sid == S - 1) & active
            out = out.at[mi].set(jnp.where(bank, h, out[mi]))
            if t < M + S - 2:
                carry = jax.lax.ppermute(h, axis, perm)
        y = jax.lax.psum(jnp.where(sid == S - 1, out, 0.0), axis)
        return y, k_loc, v_loc, ks_loc, vs_loc, pos

    pp, rep = P(axis), P()
    scale_spec = pp if quant else rep  # None leaves vanish from the pytree
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: pp, stages),
                  pp, pp, scale_spec, scale_spec, rep, rep, rep, rep, rep),
        out_specs=(rep, pp, pp, scale_spec, scale_spec, rep),
        check_rep=False,
    )
    y, k2, v2, ks2, vs2, pos2 = fn(
        stages, kv.k, kv.v, kv.k_scale, kv.v_scale, kv.pos,
        x_mb, slots_mb, pos_mb, inputs.seq_idx)
    kv2 = replace(kv, k=k2, v=v2, k_scale=ks2, v_scale=vs2, pos=pos2)
    return y.swapaxes(0, 1).reshape(B, T, E), kv2
