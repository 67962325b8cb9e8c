"""Driver benchmark: the BASELINE.json north-star config.

Llama-3-8B-shaped Q4_K_M (synthetic packed weights — real checkpoints are
not downloadable in this environment), int8 KV, measured on the axes the
reference publishes (tools/llama-bench pp/tg, llama-batched-bench B-grid):

  - pp2048 prompt throughput (1 chip)
  - tg128 @ depth 2048, B=1 (on-device decode loop)
  - batched decode B=8 and B=32 @ 512-token prefilled depth (paged KV pool)

Each decode metric also reports % of the v5e HBM roofline computed from the
ACTUAL bytes resident/moved per token (device weight planes + KV rows read),
per VERDICT round-1 item 1. The headline JSON line is the B=1 decode rate;
sub-metrics ride along in the same object.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HBM_BW = 819e9  # TPU v5e HBM bandwidth, bytes/s


def device_bytes(tree) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom
    import numpy as np

    # xprof capture (reference eval-callback/perf tooling analog): set
    # LLAMA_PROFILE_DIR to write a TensorBoard-loadable trace of the run
    prof_dir = os.environ.get("LLAMA_PROFILE_DIR")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)

    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.testing import make_bench_llama_gguf

    path = os.path.join(tempfile.gettempdir(), "bench_llama3_8b_q4km.gguf")
    if not os.path.exists(path):
        t0 = time.time()
        make_bench_llama_gguf(path)
        print(f"# built 8B Q4_K_M fixture in {time.time()-t0:.0f}s",
              file=sys.stderr)

    t0 = time.time()
    model = load_model(path)
    t_load = time.time() - t0
    cfg = model.cfg
    w_bytes = device_bytes(model.params)

    # per-token KV read bytes at a given depth (int8 KV + f32 row scales)
    def kv_bytes(depth):
        return (cfg.n_layers * 2 * cfg.n_kv_heads * depth
                * (cfg.head_dim_k + 4))

    ctx = Context(model, n_ctx=4096, n_seqs=32, n_ubatch=512,
                  quantized_kv=True, kv_total=40960)
    rng = np.random.default_rng(0)
    prompt2048 = list(rng.integers(10, 100000, 2048))

    # ---- pp2048 ----
    ctx.prefill(prompt2048[:512], seq=0)  # warm compile
    ctx.seq_rm(0)
    t0 = time.perf_counter()
    ctx.prefill(prompt2048, seq=0)
    t_pp = time.perf_counter() - t0
    pp_tps = 2048 / t_pp

    # ---- tg128 @ d2048, B=1 (on-device chunked decode loop) ----
    chunk = 128
    fn = ctx._gen_chunk_fn(chunk, True, 0.0, 0)
    key = jrandom.PRNGKey(0)
    pos = 2048
    kv, toks = fn(model.params, ctx.kv, jnp.int32(1), jnp.int32(pos),
                  jnp.int32(0), key)  # compile + warm
    np.asarray(toks)  # host transfer: block_until_ready alone can return
    ctx.kv = kv       # early while the remote compile is still in flight
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        kv, toks = fn(model.params, kv, jnp.int32(2), jnp.int32(pos + chunk),
                      jnp.int32(0), key)
        toks.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    tg1_tps = chunk / best
    ctx.kv = kv
    b1_bytes = w_bytes + kv_bytes(2048 + chunk)
    tg1_roofline = tg1_tps * b1_bytes / HBM_BW

    # ---- batched decode B=8 / B=32 @ 512-token depth ----
    ctx.seq_rm(0)
    prompt512 = list(rng.integers(10, 100000, 512))
    for s in range(32):
        ctx.prefill(prompt512, seq=s)

    def bench_batch(B, n_steps=32):
        # serving decode path: on-device batched greedy scan — one dispatch
        # per n_steps tokens, B int32s per token cross the host link
        seqs = np.arange(B)
        toks = np.asarray(rng.integers(10, 100000, B))
        out = ctx.decode_steps_greedy(toks, seqs, n_steps)  # warm compile
        t0 = time.perf_counter()
        out = ctx.decode_steps_greedy(out[:, -1], seqs, n_steps)
        dt = time.perf_counter() - t0
        agg = B * n_steps / dt
        depth = int(ctx.seq_len[0])
        step_bytes = w_bytes + B * kv_bytes(depth)
        return agg, agg / B * step_bytes / HBM_BW

    tg8_tps, tg8_roof = bench_batch(8)
    tg32_tps, tg32_roof = bench_batch(32)

    print(json.dumps({
        "metric": "llama3-8B-shaped Q4_K_M tg128@d2048 B=1 (1 chip, int8 KV)",
        "value": round(tg1_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tg1_roofline, 3),  # fraction of v5e HBM roofline
        "detail": {
            "pp2048_tok_s": round(pp_tps, 1),
            "tg128_d2048_B1_tok_s": round(tg1_tps, 2),
            "tg_B8_d512_agg_tok_s": round(tg8_tps, 2),
            "tg_B32_d512_agg_tok_s": round(tg32_tps, 2),
            "roofline_frac_B1": round(tg1_roofline, 3),
            "roofline_frac_B8": round(tg8_roof, 3),
            "roofline_frac_B32": round(tg32_roof, 3),
            "device_weight_bytes": w_bytes,
            "model_load_s": round(t_load, 1),
            "kv": "paged int8, page=512, pool=40960 tokens",
            "hbm_bw_assumed_GBs": 819,
        },
    }))
    if prof_dir:
        jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
