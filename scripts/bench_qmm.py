"""On-chip qmm GEMV bandwidth microbench (VERDICT r3 item 1).

Isolates the fused dequant-GEMV kernel's achieved HBM bandwidth from the
model chain: each case is a 32x chained loop over ONE weight inside a single
jit (dispatch floor subtracted), reported as GB/s of quantized bytes
streamed. A pure-stream kernel (sum of the same tiles, no dequant/dot)
gives the achievable ceiling through the same grid.

Usage: python scripts/bench_qmm.py [case ...]
cases: stream qmm4 qmm8 tiles
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


_FLOOR = None


def floor_s():
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


def chain(fn, x, *ws, nbytes=88_100_000):
    """Chained applications of fn(x, *ws) via lax.scan (one compile of the
    body; chain sized so ~8 GB stream >> the ~29 ms dispatch floor noise)."""
    reps = max(64, min(2048, int(8e9 / max(nbytes, 1))))

    @jax.jit
    def run(x, *ws):
        def body(acc, _):
            y = fn(x + acc * 0, *ws)
            return y.ravel()[0], ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    t = timeit(run, x, *ws, n=3, warm=1) - floor_s()
    return t / reps


def _stream_kernel(q_ref, sc_ref, mn_ref, out_ref):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += (
        q_ref[0:8, :].astype(jnp.float32)
        + sc_ref[0:8, :].astype(jnp.float32)
        + mn_ref[0:8, :].astype(jnp.float32)
    )


def stream_planes(x, qp, sc, mn, *, group):
    """Reads the same tiles as qmm4_planes but only sums 8 rows of each:
    pure HBM-stream ceiling for this grid/tiling."""
    K2, O = qp.shape
    to = 512 if O % 512 == 0 else 256
    tk2 = 1024 if K2 % 1024 == 0 else 512
    g2 = group // 2
    grid = (1, O // to, K2 // tk2)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk2, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((tk2 // g2, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((tk2 // g2, to), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((8, to), lambda i, j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((8, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, sc, mn)


def _expand_scales(sc, group):
    kg, o = sc.shape
    return jnp.broadcast_to(sc[:, None, :], (kg, group, o)).reshape(kg * group, o)


def _qmm4_fp_kernel(xe_ref, xo_ref, q_ref, sc_ref, mn_ref, out_ref, *, group):
    """Float-domain nibble unpack: byte -> bf16 exactly, hi = floor(u/16),
    lo = u - 16*hi; no integer widening or shifts."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    f = q_ref[:, :].astype(jnp.float32)  # int8 -> f32 exact
    u = jnp.where(f < 0, f + 256.0, f)  # unsigned byte value
    hi = jnp.floor(u * 0.0625)
    lo = u - 16.0 * hi
    sch = _expand_scales(sc_ref[:, :].astype(jnp.float32), group // 2)
    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(jnp.bfloat16), (lo * sch).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(jnp.bfloat16), (hi * sch).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    xs = xe_ref[:, :].astype(jnp.float32) + xo_ref[:, :].astype(jnp.float32)
    from llama_cpp_tpu.ops.pallas.qmm import _group_sum_matrix
    xg = jnp.dot(xs, _group_sum_matrix(xs.shape[1], group // 2),
                 preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg, mn_ref[:, :], preferred_element_type=jnp.float32)


def _qmm4_i16_kernel(xe_ref, xo_ref, q_ref, sc_ref, mn_ref, out_ref, *, group):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    q16 = q_ref[:, :].astype(jnp.int16)
    sch = _expand_scales(sc_ref[:, :].astype(jnp.float32), group // 2)
    w_lo = (q16 & 0xF).astype(jnp.float32) * sch
    w_hi = ((q16 >> 4) & 0xF).astype(jnp.float32) * sch
    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(jnp.bfloat16), w_lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(jnp.bfloat16), w_hi.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    xs = xe_ref[:, :].astype(jnp.float32) + xo_ref[:, :].astype(jnp.float32)
    from llama_cpp_tpu.ops.pallas.qmm import _group_sum_matrix
    xg = jnp.dot(xs, _group_sum_matrix(xs.shape[1], group // 2),
                 preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg, mn_ref[:, :], preferred_element_type=jnp.float32)


def _variant_call(kern, x, qp, sc, mn, *, group):
    N, K = x.shape
    O = qp.shape[1]
    tn, to, tk = 8, 512, 2048
    grid = (N // tn, O // to, K // tk)
    xe, xo = x[:, 0::2], x[:, 1::2]
    return pl.pallas_call(
        functools.partial(kern, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tk // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, tk // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((tk // 2, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((tk // group, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((tk // group, to), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xe, xo, qp, sc, mn)


def main():
    cases = set(sys.argv[1:]) or {"stream", "qmm4", "qmm8", "tiles"}
    if "4d" in cases:
        floor_s()
        shapes4d()
        log("done")
        return
    from llama_cpp_tpu.ops.pallas.qmm import qmm4_planes, qmm_planes

    rng = np.random.default_rng(0)
    K, O = 4096, 28672  # ffn_gateup shape: the big one
    group = 32
    qp = jnp.asarray(rng.integers(0, 255, (K // 2, O), np.uint8).view(np.int8))
    sc = jnp.asarray(rng.normal(size=(K // group, O)).astype(np.float32))
    mn = jnp.asarray(rng.normal(size=(K // group, O)).astype(np.float32))
    x = jnp.ones((8, K), jnp.bfloat16)
    nbytes = qp.nbytes + sc.nbytes + mn.nbytes
    log(f"weight bytes (packed q + f32 sc + f32 mn): {nbytes/1e6:.1f} MB")
    log(f"dispatch floor: {floor_s()*1e3:.2f} ms")

    if "stream" in cases:
        t = chain(functools.partial(stream_planes, group=group), x, qp, sc, mn)
        log(f"stream ceiling: {t*1e6:.0f} us -> {nbytes/t/1e9:.0f} GB/s")

    if "qmm4" in cases:
        t = chain(functools.partial(qmm4_planes, group=group), x, qp, sc, mn)
        log(f"qmm4_planes (current): {t*1e6:.0f} us -> {nbytes/t/1e9:.0f} GB/s")
        t = chain(functools.partial(qmm4_planes, group=group), x, qp, sc)
        log(f"qmm4_planes no-mins: {t*1e6:.0f} us -> "
            f"{(qp.nbytes+sc.nbytes)/t/1e9:.0f} GB/s")

    if "qmm8" in cases:
        q8 = jnp.asarray(rng.integers(-127, 127, (K, O), np.int8))
        sc8 = jnp.asarray(rng.normal(size=(K // group, O)).astype(np.float32))
        t = chain(functools.partial(qmm_planes, group=group), x, q8, sc8)
        nb8 = q8.nbytes + sc8.nbytes
        log(f"qmm_planes int8: {t*1e6:.0f} us -> {nb8/t/1e9:.0f} GB/s")

    if "fp" in cases:
        t = chain(functools.partial(_variant_call, _qmm4_fp_kernel,
                                    group=group), x, qp, sc, mn)
        log(f"qmm4 fp-unpack: {t*1e6:.0f} us -> {nbytes/t/1e9:.0f} GB/s")

    if "tiles" in cases:
        for tn, to, tk in [(8, 2048, 2048), (8, 4096, 1024), (8, 4096, 2048),
                           (8, 2048, 4096), (8, 7168, 1024), (8, 1792, 4096),
                           (8, 3584, 2048), (8, 7168, 512)]:
            if O % to or K % tk:
                continue
            try:
                t = chain(
                    functools.partial(qmm_tiled, group=group, tn=tn, to=to,
                                      tk=tk), x, qp, sc, mn)
                log(f"qmm4 tiles n{tn} o{to} k{tk}: {t*1e6:.0f} us -> "
                    f"{nbytes/t/1e9:.0f} GB/s")
            except Exception as e:  # noqa: BLE001
                log(f"qmm4 tiles n{tn} o{to} k{tk}: FAIL {type(e).__name__}")

    if "shapes" in cases:
        # the four decode GEMV shapes + lm_head, packed, best-tile search
        for name, k, o in [("qkv", 4096, 6144), ("attno", 4096, 4096),
                           ("gateup", 4096, 28672), ("down", 14336, 4096)]:
            qp2 = jnp.asarray(
                rng.integers(0, 255, (k // 2, o), np.uint8).view(np.int8))
            sc2 = jnp.asarray(rng.normal(size=(k // group, o)).astype(np.float32))
            mn2 = jnp.asarray(rng.normal(size=(k // group, o)).astype(np.float32))
            x2 = jnp.ones((8, k), jnp.bfloat16)
            nb = qp2.nbytes + sc2.nbytes + mn2.nbytes
            for to, tk in [(o, 512), (o, 1024), (o // 2, 1024),
                           (o // 4, 512), (o // 4, 1024)]:
                if o % to or k % tk or (tk // 2) * to > 4 * 1024 * 1024:
                    continue
                try:
                    t = chain(functools.partial(qmm_tiled, group=group, tn=8,
                                                to=to, tk=tk), x2, qp2, sc2,
                              mn2, nbytes=nb)
                    log(f"{name} K{k} O{o} to{to} tk{tk}: {t*1e6:.0f} us -> "
                        f"{nb/t/1e9:.0f} GB/s")
                except Exception as e:  # noqa: BLE001
                    log(f"{name} K{k} O{o} to{to} tk{tk}: FAIL {type(e).__name__}")

    log("done")


def qmm_tiled(x, qp, sc, mn, *, group, tn, to, tk):
    from llama_cpp_tpu.ops.pallas.qmm import _qmm4_min_kernel

    N, K = x.shape
    O = qp.shape[1]
    grid = (N // tn, O // to, K // tk)
    xe, xo = x[:, 0::2], x[:, 1::2]
    return pl.pallas_call(
        functools.partial(_qmm4_min_kernel, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tk // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, tk // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((tk // 2, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((tk // group, to), lambda i, j, k: (k, j)),
            pl.BlockSpec((tk // group, to), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tn, to), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xe, xo, qp, sc, mn)




def _qmm4_tiled4d_kernel(xe_ref, xo_ref, q_ref, sc_ref, mn_ref, out_ref, *,
                         group):
    from llama_cpp_tpu.ops.pallas.qmm import _group_sum_matrix
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    q32 = q_ref[0, 0].astype(jnp.int32)
    sch = _expand_scales(sc_ref[0, 0].astype(jnp.float32), group // 2)
    w_lo = (q32 & 0xF).astype(jnp.float32) * sch
    w_hi = ((q32 >> 4) & 0xF).astype(jnp.float32) * sch
    out_ref[:, :] += jnp.dot(
        xe_ref[:, :].astype(jnp.bfloat16), w_lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(
        xo_ref[:, :].astype(jnp.bfloat16), w_hi.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    xs = xe_ref[:, :].astype(jnp.float32) + xo_ref[:, :].astype(jnp.float32)
    xg = jnp.dot(xs, _group_sum_matrix(xs.shape[1], group // 2),
                 preferred_element_type=jnp.float32)
    out_ref[:, :] += jnp.dot(xg, mn_ref[0, 0], preferred_element_type=jnp.float32)


def qmm_tiled4d(x, q4, sc4, mn4, *, group, to, tk):
    """q4 [K/tk, O/to, tk/2, to]: every grid block contiguous in HBM."""
    N, K = x.shape
    nk, no = q4.shape[0], q4.shape[1]
    O = no * to
    grid = (N // 8, no, nk)
    xe, xo = x[:, 0::2], x[:, 1::2]
    return pl.pallas_call(
        functools.partial(_qmm4_tiled4d_kernel, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tk // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((8, tk // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((1, 1, tk // 2, to), lambda i, j, k: (k, j, 0, 0)),
            pl.BlockSpec((1, 1, tk // group, to), lambda i, j, k: (k, j, 0, 0)),
            pl.BlockSpec((1, 1, tk // group, to), lambda i, j, k: (k, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, to), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xe, xo, q4, sc4, mn4)


def shapes4d():
    rng = np.random.default_rng(0)
    group = 32
    for name, k, o in [("qkv", 4096, 6144), ("attno", 4096, 4096),
                       ("gateup", 4096, 28672), ("down", 14336, 4096),
                       ("head", 4096, 21376 * 6)]:
        for to, tk in [(2048, 1024), (4096, 512), (4096, 1024), (o, 512),
                       (2048, 2048)]:
            if o % to or k % tk or (tk // 2) * to > 3 * 1024 * 1024:
                continue
            nk, no = k // tk, o // to
            q4 = jnp.asarray(rng.integers(
                0, 255, (nk, no, tk // 2, to), np.uint8).view(np.int8))
            sc4 = jnp.asarray(rng.normal(
                size=(nk, no, tk // group, to)).astype(np.float32))
            mn4 = jnp.asarray(rng.normal(
                size=(nk, no, tk // group, to)).astype(np.float32))
            x2 = jnp.ones((8, k), jnp.bfloat16)
            nb = q4.nbytes + sc4.nbytes + mn4.nbytes
            try:
                t = chain(functools.partial(qmm_tiled4d, group=group, to=to,
                                            tk=tk), x2, q4, sc4, mn4, nbytes=nb)
                log(f"4d {name} K{k} O{o} to{to} tk{tk}: {t*1e6:.0f} us -> "
                    f"{nb/t/1e9:.0f} GB/s")
            except Exception as e:  # noqa: BLE001
                log(f"4d {name} K{k} O{o} to{to} tk{tk}: FAIL {type(e).__name__}")
            del q4, sc4, mn4


if __name__ == "__main__":
    main()
