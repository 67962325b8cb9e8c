"""On-chip prefill ablation (VERDICT r5 item 2): where do pp2048's ms go,
and which GEMM strategy reaches the MXU's speed of light?

For each 8B-shaped projection (K, O) and row count N:
  - `auto`      : qmm() dispatch as the product runs it today
  - `tn128/256` : qmm4_planes_prefill with forced smaller N tiles (more
                  i-steps amortizing each column block's in-VMEM dequant)
  - `xla`       : dequantize the whole plane to bf16 in HBM, then a plain
                  XLA dot — weight bytes 3x but the MXU runs unthrottled
Plus the flash-attention prefill share and the end-to-end pp2048 rate.

Usage: python scripts/bench_prefill.py [case ...]
cases: gemm attn full
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 MXU peak FLOP/s


def _sync(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "ravel")][-1]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def best_of(fn, *args, n=4):
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
    global _FLOOR
    if _FLOOR is None:
        x = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def null(x):
            return x * 1.0000001

        _FLOOR = best_of(null, x, n=8)
    return _FLOOR


def main():
    cases = set(sys.argv[1:]) or {"gemm", "attn", "full"}
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.ops.pallas.qmm import qmm4_planes_prefill
    from llama_cpp_tpu.ops.qtensor import matmul
    from llama_cpp_tpu.runtime.context import Context

    model = load_model("/tmp/bench_llama3_8b_q4km.gguf")
    cfg = model.cfg
    lw = model.params["layers"][0]
    print(f"# dispatch floor {floor_s()*1e3:.1f} ms", flush=True)

    if "gemm" in cases:
        print("\n| proj | K x O | N | variant | ms | TFLOP/s | MFU |")
        print("|---|---|---|---|---|---|---|")
        for name in ("attn_qk", "attn_output", "ffn_gateup", "ffn_down"):
            if name not in lw:
                continue
            w = lw[name]
            K = w.q.shape[0] * (2 if w.packed else 1)
            O = w.q.shape[1]
            for N in (512, 2048):
                x = jnp.asarray(
                    np.random.default_rng(0).standard_normal((N, K)) * 0.03,
                    jnp.bfloat16)
                flops = 2 * N * K * O

                variants = {}

                @jax.jit
                def auto(w, x):
                    y = matmul(x, w)
                    for _ in range(7):
                        y = matmul(x + 1e-9 * y[:, :1].astype(x.dtype), w)
                    return y
                variants["auto"] = (auto, (w, x), 8)

                if w.packed and w.hier:
                    for tn in (128, 256):
                        @jax.jit
                        def forced(w, x, tn=tn):
                            y = qmm4_planes_prefill(
                                x, w.q, w.scales, w.mins, w.d, w.dmin,
                                group=w.group, sgroup=w.sgroup, tile_n=tn)
                            for _ in range(7):
                                y = qmm4_planes_prefill(
                                    x + 1e-9 * y[:, :1].astype(x.dtype),
                                    w.q, w.scales, w.mins, w.d, w.dmin,
                                    group=w.group, sgroup=w.sgroup, tile_n=tn)
                            return y
                        variants[f"tn{tn}"] = (forced, (w, x), 8)

                @jax.jit
                def xla_deq(w, x):
                    wb = w.dequant(jnp.bfloat16)
                    wt = wb.T if wb.shape[0] == O else wb
                    wt = wt.astype(jnp.bfloat16)
                    y = jnp.dot(x, wt, preferred_element_type=jnp.float32)
                    for _ in range(7):
                        y = jnp.dot(x + 1e-9 * y[:, :1].astype(x.dtype), wt,
                                    preferred_element_type=jnp.float32)
                    return y
                variants["xla"] = (xla_deq, (w, x), 8)

                @jax.jit
                def xla_hot(wt, x):
                    # bf16 weights already resident: pure MXU ceiling probe
                    y = jnp.dot(x, wt, preferred_element_type=jnp.float32)
                    for _ in range(7):
                        y = jnp.dot(x + 1e-9 * y[:, :1].astype(x.dtype), wt,
                                    preferred_element_type=jnp.float32)
                    return y
                wb = w.dequant(jnp.bfloat16)
                wt_host = (wb.T if wb.shape[0] == O else wb).astype(jnp.bfloat16)
                variants["bf16"] = (xla_hot, (wt_host, x), 8)

                for vn, (f, a, reps) in variants.items():
                    try:
                        t = (best_of(f, *a) - floor_s()) / reps
                    except Exception as e:
                        print(f"| {name} | {K}x{O} | {N} | {vn} | FAIL "
                              f"{str(e)[:40]} | | |")
                        continue
                    tf = flops / t / 1e12
                    print(f"| {name} | {K}x{O} | {N} | {vn} | {t*1e3:.3f} "
                          f"| {tf:.1f} | {tf*1e12/PEAK*100:.0f}% |",
                          flush=True)

    if "attn" in cases:
        # flash-attention prefill share: 4 x 512-row causal ubatches @ 8B
        from llama_cpp_tpu.ops.pallas.flash_attn import mha_flash_paged

        ctx = Context(model, n_ctx=4096, n_seqs=1, n_ubatch=512,
                      quantized_kv=True, kv_total=4608)
        ctx.alloc.ensure(0, 2560)
        ctx._sync_table()
        H, Hkv = cfg.n_heads, cfg.n_kv_heads
        Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
        L = cfg.n_layers
        tot = 0.0
        for u in range(4):
            T = 512
            q0 = jnp.ones((1, T, H, Dk), jnp.bfloat16) * 0.01
            pos = jnp.arange(u * T, (u + 1) * T, dtype=jnp.int32)[None]
            sidx = jnp.zeros((1,), jnp.int32)

            @jax.jit
            def attn_chain(kvc, q):
                acc = jnp.zeros((1, T, H * Dv), jnp.float32)
                for il in range(L):
                    o = mha_flash_paged(q, kvc, il, sidx, pos,
                                        sm_scale=1.0 / np.sqrt(Dk))
                    acc = acc + o
                    q = q + 1e-9 * acc.reshape(1, T, H, Dv).astype(q.dtype)
                return acc

            t = best_of(attn_chain, ctx.kv, q0) - floor_s()
            tot += t
            print(f"# flash prefill ubatch {u} (rows {u*T}..{(u+1)*T}): "
                  f"{t*1e3:.1f} ms", flush=True)
        print(f"# flash prefill total over pp2048: {tot*1e3:.1f} ms", flush=True)

    if "full" in cases:
        for ub in (512, 1024, 2048):
            ctx = Context(model, n_ctx=4096, n_seqs=1, n_ubatch=ub,
                          quantized_kv=True, kv_total=4608)
            toks = list(np.random.default_rng(0).integers(10, 100000, 2048))
            ctx.prefill(toks[:ub], seq=0)  # warm compile
            ctx.seq_rm(0)
            ctx.alloc.trim(0, 0)
            t0 = time.perf_counter()
            ctx.prefill(toks, seq=0)
            dt = time.perf_counter() - t0
            print(f"# pp2048 @ n_ubatch={ub}: {2048/dt:.1f} tok/s "
                  f"({dt*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
