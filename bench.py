"""Driver benchmark: one JSON line with the headline metric.

Round-1 metric: single-chip greedy decode throughput (tok/s) on a synthetic
1.1B-param llama-arch model stored q8_0 (canonical-plane path on device).
Axes follow the reference's llama-bench tg metric (tools/llama-bench). The
vs_baseline field is the ratio to the DGX Spark gpt-oss-20B tg32 figure from
BASELINE.md (83.43 t/s) — the closest published per-device decode anchor —
until real Llama-3-8B Q4_K_M weights are benchable.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    path = os.path.join(tempfile.gettempdir(), "bench_llama_1b_q8.gguf")
    if not os.path.exists(path):
        make_tiny_llama_gguf(
            path,
            vocab_size=32000,
            n_layers=16,
            n_embd=2048,
            n_heads=32,
            n_kv_heads=8,
            n_ff=6144,
            ftype="q8_0",
            n_ctx=2048,
            seed=7,
        )

    model = load_model(path)
    ctx = Context(model, n_ctx=1024, n_seqs=1)

    prompt = list(np.random.default_rng(0).integers(10, 30000, 128))

    # warmup: compile prefill + the on-device scan chunk
    ctx.generate_ondevice(prompt, max_new_tokens=33, chunk=32)
    ctx.seq_rm(0)

    n_decode = 64
    ctx.perf.t_decode_ms = 0.0
    ctx.perf.n_decode = 0
    out = ctx.generate_ondevice(prompt, max_new_tokens=n_decode + 1, chunk=32)
    tps = ctx.perf.n_decode / (ctx.perf.t_decode_ms / 1e3)

    print(
        json.dumps(
            {
                "metric": "synthetic-llama-1.1B q8_0 greedy decode tg64 (1 chip)",
                "value": round(tps, 2),
                "unit": "tok/s",
                "vs_baseline": round(tps / 83.43, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
