"""Decompose the B=1 decode step cost on the 8B bench fixture (VERDICT r2
item 1): where do 19.2 ms/token go when the byte roofline says 9.4?

Each component is an isolated chained-dependency loop on the real chip.
Run stages selectively: python scripts/profile_decode.py [stage ...]
stages: full gemm head attn kvw glue hlo layers16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r):
    """Force completion: block_until_ready is a NO-OP on the axon relay
    backend — only a host read truly waits for the device."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, n=5, warm=2):
    for _ in range(warm):
        r = fn(*args)
    _sync(r)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        _sync(r)
        best = min(best, time.perf_counter() - t0)
    return best


_FLOOR = None


def floor_s():
    """Dispatch + host-readback round-trip floor, subtracted from chains."""
    global _FLOOR
    if _FLOOR is None:
        x = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def null(x):
            return x * 1.0000001

        _FLOOR = timeit(null, x, n=10)
    return _FLOOR


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    stages = set(sys.argv[1:]) or {"full", "gemm", "head", "attn", "kvw",
                                   "glue"}
    from llama_cpp_tpu.models.loader import Model, load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.ops.qtensor import matmul

    path = "/tmp/bench_llama3_8b_q4km.gguf"
    t0 = time.time()
    model = load_model(path)
    log(f"load: {time.time()-t0:.1f}s")
    cfg = model.cfg
    w_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(model.params)
                  if hasattr(x, "nbytes"))
    log(f"weight bytes: {w_bytes/1e9:.2f} GB -> roofline "
        f"{w_bytes/819e9*1e3:.2f} ms/tok (weights only)")

    ctx = Context(model, n_ctx=4096, n_seqs=1, n_ubatch=512,
                  quantized_kv=True, kv_total=8192)
    rng = np.random.default_rng(0)
    if stages & {"full", "attn"}:
        log("prefill 2048 ...")
        ctx.prefill(list(rng.integers(10, 100000, 2048)), seq=0)
        log("prefill done")
    else:
        # page-table state only (kv writes at pos 2048 need live pages)
        ctx.alloc.ensure(0, 2050)
        ctx._sync_table()
        ctx.seq_len[0] = 2048
    log(f"dispatch+readback floor: {floor_s()*1e3:.2f} ms")
    layers = model.params["layers"]
    keys = [k for k in ("attn_qkv", "attn_output", "ffn_gateup", "ffn_down")
            if k in layers[0]]

    if "full" in stages:
        chunk = 32
        fn = ctx._gen_chunk_fn(chunk, True, 0.0, 0)
        key = jax.random.PRNGKey(0)
        log("compiling full gen chunk ...")
        kv, toks = fn(model.params, ctx.kv, jnp.int32(1), jnp.int32(2048),
                      jnp.int32(0), key)
        _sync(toks)
        log("compiled")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            kv, toks = fn(model.params, kv, jnp.int32(2), jnp.int32(2080),
                          jnp.int32(0), key)
            _sync(toks)
            best = min(best, time.perf_counter() - t0)
        ctx.kv = kv
        full_ms = best / chunk * 1e3
        log(f"full step (32L): {full_ms:.2f} ms/tok = {1e3/full_ms:.1f} tok/s")

    if "gemm" in stages:
        log("compiling qmm chain ...")

        @jax.jit
        def qmm_chain(layers, x):
            acc = jnp.float32(0)
            for lw in layers:
                for k in keys:
                    y = matmul(x + acc * 0, lw[k])
                    acc = y.ravel()[0]
            return acc

        x = jnp.ones((1, cfg.n_embd), jnp.bfloat16)
        t = timeit(qmm_chain, layers, x) - floor_s()
        log(f"qmm chain (4x32 GEMMs): {t*1e3:.2f} ms "
            f"({t*1e3/32*1e3:.0f} us/layer)")

        @jax.jit
        def one(x, w):
            return matmul(x, w)

        for k in keys:
            w = layers[0][k]
            t1 = timeit(one, x, w, n=10)
            nb = sum(getattr(a, "nbytes", 0) for a in
                     jax.tree_util.tree_leaves(w))
            log(f"  {k}: {t1*1e6:.0f} us, {nb/1e6:.1f} MB -> "
                f"{nb/t1/1e9:.0f} GB/s")

    if "head" in stages:
        out_w = model.params.get("output", model.params["token_embd"])

        @jax.jit
        def head(x, out_w):
            return jnp.argmax(matmul(x, out_w, dtype=jnp.float32))

        xh = jnp.ones((1, cfg.n_embd), jnp.bfloat16)
        t = timeit(head, xh, out_w, n=10)
        nb = sum(getattr(a, "nbytes", 0) for a in jax.tree_util.tree_leaves(out_w))
        log(f"lm_head+argmax: {t*1e3:.2f} ms ({nb/1e6:.0f} MB -> "
            f"{nb/t/1e9:.0f} GB/s)")

    if "attn" in stages:
        from llama_cpp_tpu.ops.pallas.flash_attn import mha_flash_paged
        seq_idx = jnp.zeros(1, jnp.int32)
        positions = jnp.full((1, 1), 2048, jnp.int32)

        @jax.jit
        def attn_chain(kvc, q):
            acc = jnp.float32(0)
            for il in range(cfg.n_layers):
                o = mha_flash_paged(q + acc * 0, kvc, il, seq_idx, positions,
                                    sm_scale=0.088)
                acc = o.ravel()[0]
            return acc

        q = jnp.ones((1, 1, cfg.n_heads, cfg.head_dim_k), jnp.bfloat16)
        t = timeit(attn_chain, ctx.kv, q) - floor_s()
        log(f"attn chain (32x paged flash @d2048): {t*1e3:.2f} ms "
            f"({t/32*1e6:.0f} us/layer)")

    if "kvw" in stages:
        @jax.jit
        def kv_write_chain(kvc, k, v):
            for il in range(cfg.n_layers):
                kvc = kvc.write_layer(il, jnp.zeros(1, jnp.int32),
                                      jnp.full(1, 2048, jnp.int32), k, v,
                                      update_pos=il == 0)
            return kvc

        k1 = jnp.ones((1, cfg.n_kv_heads, cfg.head_dim_k), jnp.bfloat16)
        v1 = jnp.ones((1, cfg.n_kv_heads, cfg.head_dim_v), jnp.bfloat16)
        kv2 = kv_write_chain(ctx.kv, k1, v1)
        _sync(kv2.pos)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            kv2 = kv_write_chain(kv2, k1, v1)
            _sync(kv2.pos)
            best = min(best, time.perf_counter() - t0)
        log(f"kv write chain (32x): {(best - floor_s())*1e3:.2f} ms")

    if "glue" in stages:
        from llama_cpp_tpu.ops.basic import rms_norm
        from llama_cpp_tpu.ops.rope import RopeParams, apply_rope
        positions = jnp.full((1, 1), 2048, jnp.int32)
        rp = RopeParams(rope_type=0, n_dims=cfg.head_dim_k,
                        freq_base=cfg.rope_freq_base, freq_scale=1.0)
        wnorm = layers[0]["attn_norm"]
        q = jnp.ones((1, 1, cfg.n_heads, cfg.head_dim_k), jnp.bfloat16)

        @jax.jit
        def glue_chain(x, q):
            acc = jnp.float32(0)
            for il in range(cfg.n_layers):
                h = rms_norm(x + acc * 0, wnorm, 1e-5)
                h2 = rms_norm(x + h.ravel()[0] * 0, wnorm, 1e-5)
                qq = apply_rope(q + h2.ravel()[0] * 0, positions, rp)
                acc = qq.ravel()[0]
            return acc

        t = timeit(glue_chain, jnp.ones((1, 1, cfg.n_embd), jnp.bfloat16), q)
        log(f"glue chain (2 rmsnorm + 1 rope x32): {t*1e3:.2f} ms")

    log("done")


if __name__ == "__main__":
    main()
