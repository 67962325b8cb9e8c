"""Prefill GEMM MFU decomposition (VERDICT r2 item 2): where do the
~75% of MXU cycles go at pp shapes? Times the fused dequant GEMM at
N=512/1024/2048 against the bf16 MXU peak, plus a pure-bf16 dot control
(is it the dequant, the tiling, or XLA glue?).

Usage: python scripts/profile_prefill.py [tn_sweep]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r):
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from llama_cpp_tpu.ops.pallas.qmm import (
        qmm4_planes, qmm4_planes_prefill, qmm_planes, qmm_planes_prefill)

    rng = np.random.default_rng(0)
    # llama-8B ffn_gateup shape: K=4096, O=28672 (gate+up fused)
    K, O, group = 4096, 28672, 32
    qT = jnp.asarray(rng.integers(-127, 127, (K, O)), jnp.int8)
    sc = jnp.asarray(rng.standard_normal((K // group, O)) * 0.01, jnp.float32)
    qp = jnp.asarray(rng.integers(-128, 127, (K // 2, O)), jnp.int8)
    sc4 = jnp.asarray(rng.standard_normal((K // (group // 2) // 2, O)) * 0.01,
                      jnp.float32)
    wb = jnp.asarray(rng.standard_normal((K, O)) * 0.01, jnp.bfloat16)

    peak = 197e12  # v5e bf16 MXU peak FLOP/s
    for N in (512, 1024, 2048):
        x = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
        fl = 2 * N * K * O

        t = timeit(lambda x: qmm_planes(x, qT, sc, group=group), x)
        log(f"N={N} qmm_planes int8: {t*1e3:.2f} ms = {fl/t/1e12:.1f} TF/s "
            f"({fl/t/peak*100:.0f}% MFU)")

        t = timeit(lambda x: qmm_planes_prefill(x, qT, sc, group=group), x)
        log(f"N={N} qmm_prefill int8: {t*1e3:.2f} ms = {fl/t/1e12:.1f} TF/s "
            f"({fl/t/peak*100:.0f}% MFU)")

        t = timeit(lambda x: qmm4_planes(x, qp, sc4, group=group), x)
        log(f"N={N} qmm4_planes int4: {t*1e3:.2f} ms = {fl/t/1e12:.1f} TF/s "
            f"({fl/t/peak*100:.0f}% MFU)")

        t = timeit(lambda x: qmm4_planes_prefill(x, qp, sc4, group=group), x)
        log(f"N={N} qmm4_prefill int4: {t*1e3:.2f} ms = {fl/t/1e12:.1f} TF/s "
            f"({fl/t/peak*100:.0f}% MFU)")

        bf = jax.jit(lambda x, w: jnp.dot(x, w,
                                          preferred_element_type=jnp.float32))
        t = timeit(bf, x, wb)
        log(f"N={N} XLA bf16 dot:   {t*1e3:.2f} ms = {fl/t/1e12:.1f} TF/s "
            f"({fl/t/peak*100:.0f}% MFU)")

    if "tn_sweep" in sys.argv:
        N = 2048
        x = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
        fl = 2 * N * K * O
        for tn in (128, 256, 512, 1024):
            for tk in (512, 1024, 2048):
                t = timeit(lambda x, tn=tn, tk=tk: qmm_planes(
                    x, qT, sc, group=group, tile_n=tn, tile_k=tk), x)
                log(f"  tn={tn} tk={tk}: {t*1e3:.2f} ms "
                    f"({fl/t/peak*100:.0f}% MFU)")

    log("done")


if __name__ == "__main__":
    main()
