"""Expert parallelism: capacity-based all-to-all token dispatch.

The reference only *places* expert weights (`--n-cpu-moe`, SURVEY §2.3 row
"Expert parallelism: placement only"); this module goes further and runs MoE
FFNs with experts sharded over a mesh axis and tokens exchanged via ICI
all-to-all — the standard TPU MoE dispatch (shard_map + jax.lax.all_to_all):

  1. tokens are sharded over the `ep` axis; each device owns E/P experts;
  2. every (token, slot) pair is routed to the device owning its expert,
     into a fixed-capacity send buffer [P, C, ...] (static shapes for XLA;
     pairs beyond capacity are dropped, the classic capacity-factor trade);
  3. one all_to_all moves pairs to their owners, a grouped (sort +
     ragged_dot) FFN runs over the received pairs with the LOCAL expert
     shard, and a second all_to_all returns outputs;
  4. the source device combines returned outputs with the gate weights —
     pair (dest, rank) bookkeeping makes the return a pure gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qtensor import QuantTensor


def _dequant_local(w, dtype=jnp.bfloat16):
    """Local expert shard -> [E_local, in, out] for ragged_dot."""
    from ..models.transformer import _dequant_all_experts

    return _dequant_all_experts(w, dtype)


def _grouped_ffn(xs, counts, gate_w, up_w, down_w, act, moe_act: str):
    """Sorted pairs [M, E] + per-local-expert counts -> FFN outputs [M, E]."""
    from ..models.transformer import swiglu_oai

    mdt = xs.dtype

    def emm(w, h):
        wd = _dequant_local(w, mdt)
        return jax.lax.ragged_dot(h, wd, counts,
                                  preferred_element_type=jnp.float32)

    g = emm(gate_w, xs)
    u = emm(up_w, xs)
    h = swiglu_oai(g, u) if moe_act == "swiglu_oai" else act(g) * u
    return emm(down_w, h.astype(mdt))


def ep_moe(
    mesh: Mesh,
    axis: str,
    x: jnp.ndarray,  # [N, E] tokens, sharded over `axis`
    topi: jnp.ndarray,  # [N, k] int32
    topw: jnp.ndarray,  # [N, k] f32
    gate_w,  # [n_exp, ...] expert weights, sharded over `axis` on dim 0
    up_w,
    down_w,
    *,
    n_expert: int,
    act,
    moe_act: str = "",
    capacity_factor: float = 2.0,
) -> jnp.ndarray:
    """-> [N, E] f32, sharded over `axis` like x."""
    p = mesh.shape[axis]
    e_local = n_expert // p
    n_tok, emb = x.shape
    k = topi.shape[1]
    nl = n_tok // p  # local tokens per device
    cap = max(8, int(-(-nl * k // p) * capacity_factor))

    def wspec(w):
        nd = w.q.ndim if isinstance(w, QuantTensor) else w.ndim
        spec = P(axis, *([None] * (nd - 1)))
        if isinstance(w, QuantTensor):
            return QuantTensor(q=spec, scales=spec,
                               mins=None if w.mins is None else spec,
                               group=w.group, ggml_type=w.ggml_type,
                               transposed=w.transposed,
                               d=None if w.d is None else spec,
                               dmin=None if w.dmin is None else spec,
                               sgroup=w.sgroup)
        return spec

    def local(x_l, topi_l, topw_l, gw, uw, dw):
        # ---- dispatch bookkeeping (per source device) ----
        m = nl * k
        e_flat = topi_l.reshape(m)
        dest = e_flat // e_local  # owning device per pair
        # rank of each pair within its destination group (stable order)
        order = jnp.argsort(dest)
        start = jnp.cumsum(jnp.bincount(dest, length=p)) - jnp.bincount(
            dest, length=p)
        rank = jnp.zeros(m, jnp.int32).at[order].set(
            jnp.arange(m, dtype=jnp.int32) - start[dest[order]].astype(jnp.int32))
        ok = rank < cap  # beyond-capacity pairs dropped

        x_pairs = x_l[jnp.arange(m) // k]  # [m, E]
        # dropped pairs scatter into a trash slot (index cap) so their
        # duplicate writes can never clobber a kept pair at rank cap-1
        slot = jnp.where(ok, rank, cap)
        send_x = jnp.zeros((p, cap + 1, emb), x_l.dtype).at[
            dest, slot].set(x_pairs)[:, :cap]
        send_e = jnp.zeros((p, cap + 1), jnp.int32).at[
            dest, slot].set(e_flat % e_local)[:, :cap]
        send_v = jnp.zeros((p, cap + 1), bool).at[
            dest, slot].set(ok)[:, :cap]

        # ---- all-to-all: pairs travel to their expert's owner ----
        recv_x = jax.lax.all_to_all(send_x, axis, 0, 0, tiled=True)
        recv_e = jax.lax.all_to_all(send_e, axis, 0, 0, tiled=True)
        recv_v = jax.lax.all_to_all(send_v, axis, 0, 0, tiled=True)

        # ---- local grouped FFN over received pairs ----
        rm = p * cap
        rx = recv_x.reshape(rm, emb)
        re = jnp.where(recv_v.reshape(rm), recv_e.reshape(rm), 0)
        rx = jnp.where(recv_v.reshape(rm)[:, None], rx, 0)
        ro = jnp.argsort(re)
        counts = jnp.bincount(re, length=e_local).astype(jnp.int32)
        ys = _grouped_ffn(rx[ro].astype(jnp.bfloat16), counts, gw, uw, dw,
                          act, moe_act)
        y = jnp.zeros_like(ys).at[ro].set(ys).reshape(p, cap, emb)

        # ---- return trip + combine on the source device ----
        y_back = jax.lax.all_to_all(y, axis, 0, 0, tiled=True)  # [p, cap, E]
        y_pairs = y_back[dest, jnp.minimum(rank, cap - 1)]  # [m, E]
        y_pairs = jnp.where(ok[:, None], y_pairs, 0)
        out = jnp.sum(
            y_pairs.reshape(nl, k, emb) * topw_l[:, :, None], axis=1)
        return out.astype(jnp.float32)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  wspec(gate_w), wspec(up_w), wspec(down_w)),
        out_specs=P(axis, None),
    )
    return fn(x, topi, topw.astype(jnp.float32), gate_w, up_w, down_w)
