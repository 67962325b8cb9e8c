"""Profile model load: one line per phase (VERDICT r4 item 3 asked for a
per-phase breakdown of the 175 s before optimizing it).

Phases instrumented by monkeypatching the loader's helpers:
  - gguf read (mmap + metadata)
  - host bytes -> np.asarray per tensor (mmap fault + memcpy)
  - jax.device_put of raw bytes (host->device link)
  - extract jit compile vs run (device repack programs)
  - fusion/concat (qk/gateup on-device concatenation)
  - everything else (python walk, tokenizer, ...)

Usage: python scripts/profile_load.py [path]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

T = defaultdict(float)
N = defaultdict(int)


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[name] += time.perf_counter() - t0
        N[name] += 1
        return out
    return wrap


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_llama3_8b_q4km.gguf"

    from llama_cpp_tpu.quant import device_repack as dr
    from llama_cpp_tpu.models import loader as L

    real_put = jax.device_put

    def put(x, *a, **k):
        t0 = time.perf_counter()
        out = real_put(x, *a, **k)
        jax.block_until_ready(out)
        T["device_put(raw)"] += time.perf_counter() - t0
        N["device_put(raw)"] += 1
        T["device_put_bytes"] += getattr(x, "nbytes", 0)
        return out

    dr.jax.device_put = put
    # time extract jits with an explicit block so compile+run are visible
    for nm in ("_extract_hier_jit", "_extract_jit", "_dense_jit"):
        real = getattr(dr, nm)

        def mk(real, nm):
            def wrap(*a, **k):
                t0 = time.perf_counter()
                out = real(*a, **k)
                jax.block_until_ready(out)
                T[nm] += time.perf_counter() - t0
                N[nm] += 1
                return out
            return wrap
        setattr(dr, nm, mk(real, nm))

    L.read_gguf = timed("read_gguf", L.read_gguf)
    real_asarray = np.asarray

    t0 = time.perf_counter()
    model = L.load_model(path)
    jax.block_until_ready(model.params)
    total = time.perf_counter() - t0

    print(f"\ntotal load: {total:.1f}s")
    acct = 0.0
    for k in sorted(T, key=lambda k: -T[k]):
        if k.endswith("_bytes"):
            continue
        print(f"  {k:24s} {T[k]:8.1f}s  x{N[k]}")
        acct += T[k]
    gb = T.get("device_put_bytes", 0) / 1e9
    if gb:
        print(f"  device_put volume: {gb:.2f} GB "
              f"({gb / max(T['device_put(raw)'], 1e-9):.2f} GB/s)")
    print(f"  unaccounted (python walk, tokenizer, fusion): "
          f"{total - acct:.1f}s")


if __name__ == "__main__":
    main()
