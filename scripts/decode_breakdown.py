"""Per-component decode-step attribution, measured by timing sub-graphs
directly on the chip (VERDICT r4 item 1: a committed table attributing every
ms of the B=1 step). jax.profiler traces hang over the tunneled backend, so
this times jitted sub-graphs instead: the full step, the GEMV-only chain,
attention-only, the vocab head, and the sampling/carry glue by difference.

Usage: python scripts/decode_breakdown.py [B] [depth]
Writes a markdown table to stdout (redirect into docs/decode_profile.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9


def _sync(out):
    """Host-read sync: block_until_ready alone can return early while a
    remote compile/execute is still in flight on the relay backend."""
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "ravel")][-1]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def best_of(fn, *args, n=5):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


_FLOOR = None


def floor_s():
    """Dispatch + host-readback round-trip (measured ~25 ms over the axon
    tunnel): subtracted from every isolated sub-graph timing; chained-op
    bodies amortize what remains."""
    global _FLOOR
    if _FLOOR is None:
        x = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def null(x):
            return x * 1.0000001

        _FLOOR = best_of(null, x, n=8)
        print(f"# dispatch+readback floor: {_FLOOR*1e3:.1f} ms",
              file=sys.stderr, flush=True)
    return _FLOOR


def plane_bytes(w):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(w)
               if hasattr(x, "nbytes"))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.ops.qtensor import matmul
    from llama_cpp_tpu.runtime.context import Context

    t0 = time.time()
    model = load_model("/tmp/bench_llama3_8b_q4km.gguf")
    jax.block_until_ready(model.params)
    print(f"# load: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    cfg = model.cfg
    params = model.params
    L = cfg.n_layers

    ctx = Context(model, n_ctx=4096, n_seqs=max(B, 1), n_ubatch=512,
                  quantized_kv=True, kv_total=max(B, 1) * 4096 + 512)
    for s in range(B):
        ctx.alloc.ensure(s, depth + 1024)
    ctx._sync_table()
    ctx.seq_len[:B] = depth

    rows = []

    # ---- 1. full step: on-device chunked scan (B=1) or batched scan ----
    chunk = 128
    if B == 1:
        fn = ctx._gen_chunk_fn(chunk, True, 0.0, 0)
        key = jax.random.PRNGKey(0)
        kv, toks = fn(params, ctx.kv, jnp.int32(1), jnp.int32(depth),
                      jnp.int32(0), key)
        _sync(toks)
        state = {"kv": kv, "pos": depth + chunk}

        def step():
            kv2, tk = fn(params, state["kv"], jnp.int32(2),
                         jnp.int32(state["pos"]), jnp.int32(0), key)
            state["kv"] = kv2
            state["pos"] += chunk
            return tk
        t_full = (best_of(step, n=4) - floor_s()) / chunk
    else:
        seqs = np.arange(B)
        toks0 = np.full(B, 17)
        ctx.decode_steps_greedy(toks0, seqs, chunk)
        ctx.seq_len[:B] = depth

        def step():
            out = ctx.decode_steps_greedy(toks0, seqs, chunk)
            ctx.seq_len[:B] = depth
            return out
        t_full = (best_of(step, n=3) - floor_s()) / chunk
    print(f"# full step: {t_full*1e3:.3f} ms/tok", file=sys.stderr, flush=True)

    # ---- 2. GEMV-only chain: all layers' projections, serialized ----
    @jax.jit
    def gemv_chain(layers, x):
        for lw in layers:
            y = jnp.zeros((B, cfg.n_embd), jnp.float32)
            if "attn_qk" in lw:
                qk = matmul(x, lw["attn_qk"])
                y = y + qk[..., : cfg.n_embd].astype(jnp.float32)
            if "attn_v" in lw:
                v = matmul(x, lw["attn_v"])
                y = y + jnp.pad(v, ((0, 0), (0, cfg.n_embd - v.shape[-1])))
            o = matmul(x, lw["attn_output"])
            y = y + o
            gu = matmul(x, lw["ffn_gateup"])
            h = (gu[..., : gu.shape[-1] // 2]).astype(x.dtype)
            d = matmul(h, lw["ffn_down"])
            y = y + d
            x = (x + 1e-6 * y).astype(x.dtype)  # serialize layers
        return x

    x0 = jnp.ones((B, cfg.n_embd), jnp.bfloat16) * 0.01
    t_gemv = best_of(gemv_chain, params["layers"], x0) - floor_s()
    w_bytes = sum(
        plane_bytes(lw[k]) for lw in params["layers"]
        for k in ("attn_qk", "attn_v", "attn_output", "ffn_gateup",
                  "ffn_down") if k in lw)
    rows.append((f"layer GEMVs (qk+v+o+gateup+down x{L})", t_gemv,
                 w_bytes / HBM_BW))

    # per-projection: 8 back-to-back dependent calls amortize dispatch walls
    for k in ("attn_qk", "attn_v", "attn_output", "ffn_gateup", "ffn_down"):
        if k not in params["layers"][0]:
            continue
        w0 = params["layers"][0][k]
        kin = w0.q.shape[0] * (2 if w0.packed else 1)
        xk = jnp.ones((B, kin), jnp.bfloat16) * 0.01

        @jax.jit
        def one(w, xk):
            y = matmul(xk, w)
            for _ in range(31):
                y = matmul(xk + 1e-9 * y[..., :1].astype(xk.dtype)
                           * jnp.ones_like(xk), w)
            return y
        t1 = (best_of(one, w0, xk) - floor_s()) / 32
        rows.append((f"&nbsp;&nbsp;single {k} (x1; x{L} = "
                     f"{t1*L*1e3:.2f} ms)", t1, plane_bytes(w0) / HBM_BW))

    # ---- 3. vocab head + argmax ----
    head = params.get("output", params["token_embd"])

    @jax.jit
    def head_fn8(head, x):
        t = jnp.zeros((B,), jnp.int32)
        for _ in range(8):
            t = jnp.argmax(matmul(
                x + 1e-9 * t.astype(x.dtype)[..., None], head,
                dtype=jnp.float32), axis=-1).astype(jnp.int32)
        return t

    xh = jnp.ones((B, cfg.n_embd), jnp.bfloat16) * 0.01
    t_head = (best_of(head_fn8, head, xh) - floor_s()) / 8
    rows.append(("vocab head GEMV + argmax", t_head,
                 plane_bytes(head) / HBM_BW))

    # ---- 4. attention-only: paged flash over all layers at depth ----
    from llama_cpp_tpu.ops.pallas.flash_attn import mha_flash_paged

    H, Hkv, Dk, Dv = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim_k, cfg.head_dim_v
    q0 = jnp.ones((B, 1, H, Dk), jnp.bfloat16) * 0.01
    sidx = jnp.arange(B, dtype=jnp.int32)
    pos = jnp.full((B, 1), depth, jnp.int32)

    @jax.jit
    def attn_chain(kvc, q):
        acc = jnp.zeros((B, 1, H * Dv), jnp.float32)
        for il in range(L):
            o = mha_flash_paged(q, kvc, il, sidx, pos,
                                sm_scale=1.0 / np.sqrt(Dk))
            acc = acc + o
            q = q + 1e-9 * acc.reshape(B, 1, H, Dv).astype(q.dtype)
        return acc

    kv_live = state["kv"] if B == 1 else ctx.kv  # full-step donated ctx.kv
    try:
        t_attn = best_of(attn_chain, kv_live, q0) - floor_s()
        kv_b = (L * 2 * Hkv * depth * B * (Dk + 4)
                * (1 if kv_live.quantized else 2))
        rows.append((f"paged flash attention x{L} @ d{depth}", t_attn,
                     kv_b / HBM_BW))
    except Exception as e:  # signature drift: report, don't die
        print(f"# attn-only failed: {e}", file=sys.stderr)
        t_attn = float("nan")

    # ---- 5. table ----
    total_attr = t_gemv + t_head + (t_attn if t_attn == t_attn else 0)
    agg = B / t_full
    print(f"\n## B={B} decode step @ depth {depth} "
          f"(step: {t_full*1e3:.3f} ms = {t_full/B*1e3:.3f} ms/tok, "
          f"{agg:.1f} tok/s aggregate)\n")
    print("| component | ms | % of step | HBM floor ms |")
    print("|---|---|---|---|")
    for name, t, floor in rows:
        print(f"| {name} | {t*1e3:.3f} | {t/t_full*100:.1f}% "
              f"| {floor*1e3:.3f} |")
    glue = t_full - total_attr
    print(f"| glue (norms/rope/KV-window/sampling/scan carry) "
          f"| {glue*1e3:.3f} | {glue/t_full*100:.1f}% | ~0 |")
    w_all = sum(plane_bytes(lw[k]) for lw in params["layers"] for k in lw) \
        + plane_bytes(head) + plane_bytes(params["token_embd"])
    floor = w_all / HBM_BW
    print(f"\nweights on device: {w_all/1e9:.2f} GB -> byte roofline "
          f"{floor*1e3:.3f} ms/tok ({1/floor:.1f} tok/s); "
          f"step at {t_full/floor*100:.0f}% of floor "
          f"(roofline_frac {floor/t_full:.3f})")


if __name__ == "__main__":
    main()
