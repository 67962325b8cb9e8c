"""Capture an xprof trace of the B=1 decode step and print the per-op time
table (VERDICT r4 item 1: committed profile evidence — where every ms goes).

Usage: python scripts/trace_decode.py [outdir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_trace"
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context

    path = "/tmp/bench_llama3_8b_q4km.gguf"
    t0 = time.time()
    model = load_model(path)
    print(f"load: {time.time()-t0:.1f}s", flush=True)

    ctx = Context(model, n_ctx=4096, n_seqs=1, n_ubatch=512,
                  quantized_kv=True, kv_total=8192)
    # page-table state only: timing needs live pages, not real KV content
    ctx.alloc.ensure(0, 2100)
    ctx._sync_table()
    ctx.seq_len[0] = 2048

    chunk = 32
    fn = ctx._gen_chunk_fn(chunk, True, 0.0, 0)
    key = jax.random.PRNGKey(0)
    kv, toks = fn(model.params, ctx.kv, jnp.int32(1), jnp.int32(2048),
                  jnp.int32(0), key)
    toks.block_until_ready()
    print("compiled", flush=True)

    jax.profiler.start_trace(outdir)
    kv, toks = fn(model.params, kv, jnp.int32(2), jnp.int32(2080),
                  jnp.int32(0), key)
    toks.block_until_ready()
    jax.profiler.stop_trace()
    print("traced", flush=True)

    # summarize the xplane: per-op self time on the device
    xs = sorted(glob.glob(os.path.join(outdir, "**/*.xplane.pb"),
                          recursive=True))
    if not xs:
        print("no xplane captured")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xs[-1]], "framework_op_stats", {})
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data.decode()
                                           if isinstance(data, bytes) else data)))
    rows = [r for r in rows if r.get("host_or_device", "").lower() != "host"]
    key_f = "total_self_time_in_us" if rows and "total_self_time_in_us" in rows[0] \
        else None
    if key_f is None and rows:
        print("columns:", list(rows[0].keys()))
        key_f = next(k for k in rows[0] if "self_time" in k)
    rows.sort(key=lambda r: -float(r.get(key_f, 0) or 0))
    tot = sum(float(r.get(key_f, 0) or 0) for r in rows)
    print(f"\ndevice total: {tot/1e3:.2f} ms for {chunk} tokens "
          f"= {tot/1e3/chunk:.3f} ms/tok")
    print(f"{'op':60s} {'ms':>9s} {'%':>6s}")
    for r in rows[:40]:
        t = float(r.get(key_f, 0) or 0)
        name = (r.get("operation") or r.get("op_name", "?"))[:60]
        print(f"{name:60s} {t/1e3:9.3f} {100*t/tot:6.1f}")


if __name__ == "__main__":
    main()
