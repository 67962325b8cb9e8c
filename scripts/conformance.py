#!/usr/bin/env python
"""On-chip kernel conformance sweep — the test-backend-ops analog (reference
tests/test-backend-ops.cpp: every op x shape x dtype computed on the backend
under test and compared to the CPU oracle with per-op NMSE thresholds;
SURVEY.md §4 "TPU-build implication (a)").

Runs every Pallas kernel ON THE ACTUAL BACKEND (TPU when available) against
an XLA float32 reference across a shape/feature sweep and writes a CSV to
docs/conformance.csv. Exit code 1 if any case exceeds its threshold.

Usage: python scripts/conformance.py [--quick] [--out docs/conformance.csv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def nmse(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.mean(want**2) + 1e-12
    return float(np.mean((got - want) ** 2) / denom)


def ref_attention(q, k, v, row_pos, col_pos, scale, window=0, softcap=0.0,
                  sinks=None, k_scale=None, v_scale=None):
    """f64 numpy online-softmax reference."""
    q = np.asarray(q, np.float64)
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    if k_scale is not None:
        k = k * np.asarray(k_scale, np.float64)[..., None]
        v = v * np.asarray(v_scale, np.float64)[..., None]
    B, H, R, D = q.shape
    s = np.einsum("bhrd,bhsd->bhrs", q, k) * scale
    if softcap:
        s = softcap * np.tanh(s / softcap)
    rp = np.asarray(row_pos)[:, None, :, None]
    cp = np.asarray(col_pos)[:, None, None, :]
    mask = (cp >= 0) & (cp <= rp)
    if window > 0:
        mask &= cp > rp - window
    s = np.where(mask, s, -1e30)
    m = s.max(axis=-1, keepdims=True)
    if sinks is not None:
        m = np.maximum(m, np.asarray(sinks, np.float64)[None, :, :, None])
    p = np.exp(s - m)
    denom = p.sum(-1, keepdims=True)
    if sinks is not None:
        denom = denom + np.exp(np.asarray(sinks, np.float64)[None, :, :, None] - m)
    p = p / np.maximum(denom, 1e-30)
    return np.einsum("bhrs,bhsd->bhrd", p, v)


def sweep_flash(rows, quick=False):
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.flash_attn import flash_attention

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(0)
    cases = []
    dims = [(128, 128), (64, 64), (256, 256)] if not quick else [(128, 128)]
    for D, Dv in dims:
        for S in ([512, 1024] if not quick else [512]):
            for B, R in [(1, 8), (4, 16)]:
                for feat in ["plain", "window", "softcap", "sinks", "int8"]:
                    cases.append((B, 8 if D <= 128 else 4, R, D, Dv, S, feat))
    for B, H, R, D, Dv, S, feat in cases:
        q = rng.standard_normal((B, H, R, D)).astype(np.float32)
        k = rng.standard_normal((B, H, S, D)).astype(np.float32)
        v = rng.standard_normal((B, H, S, Dv)).astype(np.float32)
        depth = S - 7
        row_pos = np.tile(np.arange(depth - R, depth, dtype=np.int32), (B, 1))
        col_pos = np.tile(
            np.where(np.arange(S) < depth, np.arange(S), -1).astype(np.int32),
            (B, 1))
        scale = 1.0 / D**0.5
        kw = dict(sm_scale=scale)
        sinks = ks = vs = None
        if feat == "window":
            kw["window"] = S // 4
        elif feat == "softcap":
            kw["softcap"] = 30.0
        elif feat == "sinks":
            sinks = rng.standard_normal((H, R)).astype(np.float32)
        elif feat == "int8":
            ks = (np.abs(k).max(-1) / 127.0).astype(np.float32)
            vs = (np.abs(v).max(-1) / 127.0).astype(np.float32)
            k = np.round(k / ks[..., None]).astype(np.int8)
            v = np.round(v / vs[..., None]).astype(np.int8)
        got = flash_attention(
            jnp.asarray(q, jnp.bfloat16 if feat != "int8" else jnp.bfloat16),
            jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(row_pos), jnp.asarray(col_pos),
            sinks=None if sinks is None else jnp.asarray(sinks),
            k_scale=None if ks is None else jnp.asarray(ks),
            v_scale=None if vs is None else jnp.asarray(vs),
            interpret=interp, **kw)
        want = ref_attention(q.astype(np.float32) if feat != "int8" else q,
                             k, v, row_pos, col_pos, scale,
                             window=kw.get("window", 0),
                             softcap=kw.get("softcap", 0.0),
                             sinks=sinks, k_scale=ks, v_scale=vs)
        e = nmse(np.asarray(got), want)
        thr = 5e-3  # bf16 q + bf16 MXU accumulation
        rows.append(("flash_attn", f"B{B}H{H}R{R}D{D}S{S}-{feat}", e, e < thr))


def sweep_flash_paged(rows, quick=False):
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.flash_attn import flash_attention_paged

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(1)
    page = 256
    for B, H, R, D, npages, mp in ([(2, 4, 8, 128, 9, 4)] if quick else
                                   [(2, 4, 8, 128, 9, 4), (1, 8, 16, 128, 17, 8),
                                    (4, 2, 8, 256, 17, 4)]):
        # build a pool where each seq's pages are scattered (non-contiguous)
        k4 = rng.standard_normal((H, npages, page, D)).astype(np.float32)
        v4 = rng.standard_normal((H, npages, page, D)).astype(np.float32)
        pos2 = np.full((npages, page), -1, np.int32)
        table = np.full((B, mp), npages - 1, np.int32)
        perm = rng.permutation(npages - 1)
        depth = int(page * 2.5)
        pi = 0
        for b in range(B):
            for j in range(-(-depth // page)):
                pg = int(perm[pi]); pi += 1
                table[b, j] = pg
                n = min(page, depth - j * page)
                pos2[pg, :n] = np.arange(j * page, j * page + n)
        q = rng.standard_normal((B, H, R, D)).astype(np.float32)
        row_pos = np.tile(np.arange(depth - R, depth, dtype=np.int32), (B, 1))
        got = flash_attention_paged(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k4), jnp.asarray(v4),
            jnp.asarray(row_pos), jnp.asarray(pos2.reshape(npages, 1, page)),
            jnp.asarray(table), sm_scale=1.0 / D**0.5, page=page,
            interpret=interp)
        # gather the virtual per-seq view and run the dense reference
        kk = k4[:, table].transpose(1, 0, 2, 3, 4).reshape(B, H, mp * page, D)
        vv = v4[:, table].transpose(1, 0, 2, 3, 4).reshape(B, H, mp * page, D)
        cp = pos2[table].reshape(B, mp * page)
        want = ref_attention(q, kk, vv, row_pos, cp, 1.0 / D**0.5)
        e = nmse(np.asarray(got), want)
        rows.append(("flash_attn_paged", f"B{B}H{H}R{R}D{D}p{page}", e, e < 5e-3))


def sweep_flash_paged_holes(rows, quick=False):
    """Paged flash on REALISTIC pool states (VERDICT r2 weak #5): page
    tables with post-seq_rm holes (freed pages, -1 pos rows mid-sequence is
    not legal, but freed TAIL ranges and re-used pages are), MQA Hkv=1, and
    4k-token depth."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.flash_attn import flash_attention_paged

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(7)
    cases = [(2, 1, 8, 128, 256, 21, 8, 1500),   # MQA + mid-size
             (1, 4, 8, 128, 512, 11, 9, 4096),   # 4k depth
             (2, 2, 16, 256, 256, 21, 6, 1200)]
    if quick:
        cases = cases[:1]
    for B, H, R, D, page, npages, mp, depth in cases:
        k4 = rng.standard_normal((H, npages, page, D)).astype(np.float32)
        v4 = rng.standard_normal((H, npages, page, D)).astype(np.float32)
        pos2 = np.full((npages, page), -1, np.int32)
        table = np.full((B, mp), npages - 1, np.int32)
        perm = rng.permutation(npages - 1)
        pi = 0
        for b in range(B):
            n_pg = -(-depth // page)
            for j in range(n_pg):
                pg = int(perm[pi]); pi += 1
                table[b, j] = pg
                n = min(page, depth - j * page)
                pos2[pg, :n] = np.arange(j * page, j * page + n)
            # hole: simulate seq_rm of a positional RANGE — rows invalidated
            # inside an owned page (find_slot re-use leaves -1 pos rows)
            hole_pg = int(table[b, n_pg // 2])
            pos2[hole_pg, page // 4: page // 2] = -1
        q = rng.standard_normal((B, H, R, D)).astype(np.float32)
        row_pos = np.tile(np.arange(depth - R, depth, dtype=np.int32), (B, 1))
        got = flash_attention_paged(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k4), jnp.asarray(v4),
            jnp.asarray(row_pos), jnp.asarray(pos2.reshape(npages, 1, page)),
            jnp.asarray(table), sm_scale=1.0 / D**0.5, page=page,
            interpret=interp)
        kk = k4[:, table].transpose(1, 0, 2, 3, 4).reshape(B, H, mp * page, D)
        vv = v4[:, table].transpose(1, 0, 2, 3, 4).reshape(B, H, mp * page, D)
        cp = pos2[table].reshape(B, mp * page)
        want = ref_attention(q, kk, vv, row_pos, cp, 1.0 / D**0.5)
        e = nmse(np.asarray(got), want)
        rows.append(("flash_attn_paged_holes",
                     f"B{B}H{H}R{R}D{D}p{page}d{depth}", e, e < 5e-3))


def _pack_halfsplit(u):
    """[K, O] uint8 nibbles -> [K/2, O] packed: row k low, row k + K/2 high
    (the ops/qtensor.QuantTensor packed pairing)."""
    half = u.shape[0] // 2
    return (u[:half] | (u[half:] << 4)).astype(np.uint8)


def _hier_factor(rng, K, O, g, lo, hi, sgroup=256):
    """Synth hierarchical scales: int8 sub x f32 per-superblock d, plus the
    equivalent flat f32 plane for the oracle."""
    sub = rng.integers(1, 64, size=(K // g, O)).astype(np.int8)
    d = rng.uniform(lo, hi, size=(K // sgroup, O)).astype(np.float32)
    flat = sub.astype(np.float32) * np.repeat(d, sgroup // g, axis=0)
    return sub, d, flat


def sweep_flash_paged_variants(rows, quick=False):
    """Paged flash branch coverage the product actually ships: int8 KV with
    per-row scales (the serving default), the MLA absorbed-latent shape
    (Hkv=1, Dk=576, Dv=512 — reference deepseek2 MLA cache layout), and the
    non-fold branch (KV page tile > the fold VMEM budget forces the
    per-head grid, flash_attn.py `fold`)."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.flash_attn import flash_attention_paged

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(11)
    #       label            B  H   R  Dk   Dv  page np mp depth  int8
    cases = [("int8-fold",    2, 8,  8, 128, 128, 256, 13, 6, 1200, True),
             ("int8-nonfold", 1, 16, 8, 256, 256, 1024, 7, 4, 3000, True),
             ("bf16-nonfold", 1, 8, 16, 256, 256, 1024, 7, 4, 3000, False),
             ("mla-576",      2, 1, 16, 576, 512, 256, 17, 8, 1800, False),
             ("mla-576-int8", 2, 1, 16, 576, 512, 256, 17, 8, 1800, True)]
    if quick:
        cases = cases[:2]
    for label, B, H, R, Dk, Dv, page, npages, mp, depth, int8 in cases:
        assert B * -(-depth // page) <= npages - 1, (label, "pool too small")
        k4 = rng.standard_normal((H, npages, page, Dk)).astype(np.float32)
        v4 = rng.standard_normal((H, npages, page, Dv)).astype(np.float32)
        ks = vs = None
        if int8:
            ks = (np.abs(k4).max(-1) / 127.0).astype(np.float32)
            vs = (np.abs(v4).max(-1) / 127.0).astype(np.float32)
            k4 = np.round(k4 / ks[..., None]).astype(np.int8)
            v4 = np.round(v4 / vs[..., None]).astype(np.int8)
        pos2 = np.full((npages, page), -1, np.int32)
        table = np.full((B, mp), npages - 1, np.int32)
        perm = rng.permutation(npages - 1)
        pi = 0
        for b in range(B):
            for j in range(-(-depth // page)):
                pg = int(perm[pi]); pi += 1
                table[b, j] = pg
                n = min(page, depth - j * page)
                pos2[pg, :n] = np.arange(j * page, j * page + n)
        q = rng.standard_normal((B, H, R, Dk)).astype(np.float32)
        row_pos = np.tile(np.arange(depth - R, depth, dtype=np.int32), (B, 1))
        got = flash_attention_paged(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k4), jnp.asarray(v4),
            jnp.asarray(row_pos), jnp.asarray(pos2.reshape(npages, 1, page)),
            jnp.asarray(table),
            k_scale4=None if ks is None
            else jnp.asarray(ks.reshape(H, npages, 1, page)),
            v_scale4=None if vs is None
            else jnp.asarray(vs.reshape(H, npages, 1, page)),
            sm_scale=1.0 / Dk**0.5, page=page, interpret=interp)
        kk = k4[:, table].transpose(1, 0, 2, 3, 4).reshape(B, H, mp * page, Dk)
        vv = v4[:, table].transpose(1, 0, 2, 3, 4).reshape(B, H, mp * page, Dv)
        cp = pos2[table].reshape(B, mp * page)
        kse = vse = None
        if int8:
            kse = ks[:, table].transpose(1, 0, 2, 3).reshape(B, H, mp * page)
            vse = vs[:, table].transpose(1, 0, 2, 3).reshape(B, H, mp * page)
        want = ref_attention(q, kk, vv, row_pos, cp, 1.0 / Dk**0.5,
                             k_scale=kse, v_scale=vse)
        e = nmse(np.asarray(got), want)
        rows.append(("flash_attn_paged", label, e, e < 5e-3))


def sweep_qmm4(rows, quick=False):
    """Nibble-packed int4 kernel — the kernel the headline bench ships
    (VERDICT r2 weak #4: previously interpret-validated only). Covers the
    half-split packing and the hierarchical (int8 sub-scales x superblock d)
    variants for decode and prefill grids."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.qmm import qmm4_planes, qmm4_planes_prefill

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(5)
    shapes = [(8, 512, 512, 32), (8, 1024, 256, 32), (16, 512, 256, 16),
              (8, 4096, 1024, 32), (8, 2048, 512, 32)]
    if quick:
        shapes = shapes[:1]
    for N, K, O, g in shapes:
        for mins in (False, True):
            for hier in ((False, True) if K % 512 == 0 else (False,)):
                u = rng.integers(0, 16, size=(K, O)).astype(np.uint8)
                packed = _pack_halfsplit(u)
                x = rng.standard_normal((N, K)).astype(np.float32)
                if hier:
                    sub, d, sc_flat = _hier_factor(rng, K, O, g, 0.001, 0.002)
                    mn_args: tuple = (None, None, None)
                    mn_flat = None
                    if mins:
                        subm, dm, mn_flat = _hier_factor(
                            rng, K, O, g, -0.01, -0.002)
                        mn_args = (jnp.asarray(subm), jnp.asarray(d),
                                   jnp.asarray(dm))
                    got = qmm4_planes(
                        jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed),
                        jnp.asarray(sub), mn_args[0], jnp.asarray(d),
                        mn_args[2], group=g, interpret=interp)
                    w = np.repeat(sc_flat, g, axis=0) * u
                    if mn_flat is not None:
                        w = w + np.repeat(mn_flat, g, axis=0)
                else:
                    sc = rng.uniform(0.005, 0.02, size=(K // g, O)).astype(
                        np.float32)
                    mn = (rng.uniform(-0.1, 0.0, size=(K // g, O)).astype(
                        np.float32) if mins else None)
                    got = qmm4_planes(
                        jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed),
                        jnp.asarray(sc),
                        None if mn is None else jnp.asarray(mn),
                        group=g, interpret=interp)
                    w = np.repeat(sc, g, axis=0) * u
                    if mn is not None:
                        w = w + np.repeat(mn, g, axis=0)
                want = x @ w
                e = nmse(np.asarray(got), want)
                rows.append((
                    "qmm4_planes",
                    f"N{N}K{K}O{O}g{g}{'m' if mins else ''}"
                    f"{'h' if hier else ''}", e, e < 5e-3))
    # prefill-shaped dequant-hoisted variant (flat + hier)
    for N, K, O, g in ([(512, 1024, 512, 32)] if quick
                       else [(512, 1024, 512, 32), (1024, 4096, 512, 32)]):
        for hier in (False, True):
            u = rng.integers(0, 16, size=(K, O)).astype(np.uint8)
            packed = _pack_halfsplit(u)
            x = rng.standard_normal((N, K)).astype(np.float32)
            if hier:
                sub, d, sc_flat = _hier_factor(rng, K, O, g, 0.001, 0.002)
                got = qmm4_planes_prefill(
                    jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed),
                    jnp.asarray(sub), None, jnp.asarray(d),
                    group=g, interpret=interp)
            else:
                sc_flat = rng.uniform(0.005, 0.02, size=(K // g, O)).astype(
                    np.float32)
                got = qmm4_planes_prefill(
                    jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed),
                    jnp.asarray(sc_flat), None, group=g, interpret=interp)
            want = x @ (np.repeat(sc_flat, g, axis=0) * u)
            e = nmse(np.asarray(got), want)
            rows.append(("qmm4_prefill",
                         f"N{N}K{K}O{O}g{g}{'h' if hier else ''}",
                         e, e < 5e-3))


def sweep_qmm_prefill(rows, quick=False):
    """Prefill-shaped (dequant-hoisted) int8 GEMM grids at pp row counts."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.qmm import qmm_planes_prefill

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(6)
    shapes = [(512, 1024, 512, 32), (1024, 512, 256, 32), (512, 512, 256, 16)]
    if quick:
        shapes = shapes[:1]
    for N, K, O, g in shapes:
        for mins in (False, True):
            q = rng.integers(-8, 8, size=(K, O)).astype(np.int8)
            sc = rng.uniform(0.005, 0.02, size=(K // g, O)).astype(np.float32)
            mn = (rng.uniform(-0.05, 0.05, size=(K // g, O)).astype(np.float32)
                  if mins else None)
            x = rng.standard_normal((N, K)).astype(np.float32)
            got = qmm_planes_prefill(
                jnp.asarray(x, jnp.bfloat16), jnp.asarray(q), jnp.asarray(sc),
                None if mn is None else jnp.asarray(mn), group=g,
                interpret=interp)
            w = np.repeat(sc, g, axis=0) * q
            if mn is not None:
                w = w + np.repeat(mn, g, axis=0)
            want = x @ w
            e = nmse(np.asarray(got), want)
            rows.append(("qmm_prefill",
                         f"N{N}K{K}O{O}g{g}{'m' if mins else ''}",
                         e, e < 5e-3))
    # hierarchical-scales prefill (Q6_K-style group 16, no mins)
    for N, K, O, g in ([(512, 1024, 256, 16)] if quick
                       else [(512, 1024, 256, 16), (1024, 4096, 512, 16)]):
        q = rng.integers(-32, 32, size=(K, O)).astype(np.int8)
        sub, d, sc_flat = _hier_factor(rng, K, O, g, 0.0005, 0.001)
        x = rng.standard_normal((N, K)).astype(np.float32)
        got = qmm_planes_prefill(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(q), jnp.asarray(sub),
            None, jnp.asarray(d), group=g, interpret=interp)
        want = x @ (np.repeat(sc_flat, g, axis=0) * q)
        e = nmse(np.asarray(got), want)
        rows.append(("qmm_prefill", f"N{N}K{K}O{O}g{g}h", e, e < 5e-3))


def sweep_qmm(rows, quick=False):
    import jax
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.qmm import qmm_planes, qmm_planes_expert

    interp = jax.default_backend() not in ("tpu",)
    rng = np.random.default_rng(2)
    shapes = [(8, 512, 512, 32), (64, 1024, 512, 32), (8, 512, 256, 16),
              (8, 2048, 1024, 32), (16, 4096, 512, 32)]
    if quick:
        shapes = shapes[:1]
    for N, K, O, g in shapes:
        for mins in (False, True):
            q = rng.integers(-8, 8, size=(K, O)).astype(np.int8)
            sc = rng.uniform(0.005, 0.02, size=(K // g, O)).astype(np.float32)
            mn = (rng.uniform(-0.05, 0.05, size=(K // g, O)).astype(np.float32)
                  if mins else None)
            x = rng.standard_normal((N, K)).astype(np.float32)
            got = qmm_planes(jnp.asarray(x, jnp.bfloat16), jnp.asarray(q),
                             jnp.asarray(sc),
                             None if mn is None else jnp.asarray(mn),
                             group=g, interpret=interp)
            w = np.repeat(sc, g, axis=0) * q
            if mn is not None:
                w = w + np.repeat(mn, g, axis=0)
            want = x @ w
            e = nmse(np.asarray(got), want)
            rows.append(("qmm_planes", f"N{N}K{K}O{O}g{g}{'m' if mins else ''}",
                         e, e < 5e-3))
    # hierarchical-scales decode GEMV (Q6_K-style group 16; the real 8B
    # v/attn_output shapes stream through this path)
    for N, K, O, g in ([(8, 512, 256, 16)] if quick
                       else [(8, 512, 256, 16), (8, 4096, 1024, 16),
                             (8, 14336, 512, 16), (8, 1024, 512, 16),
                             (16, 2048, 256, 16), (8, 4096, 4096, 32)]):
        q = rng.integers(-32, 32, size=(K, O)).astype(np.int8)
        sub, d, sc_flat = _hier_factor(rng, K, O, g, 0.0005, 0.001)
        x = rng.standard_normal((N, K)).astype(np.float32)
        got = qmm_planes(jnp.asarray(x, jnp.bfloat16), jnp.asarray(q),
                         jnp.asarray(sub), None, jnp.asarray(d),
                         group=g, interpret=interp)
        want = x @ (np.repeat(sc_flat, g, axis=0) * q)
        e = nmse(np.asarray(got), want)
        rows.append(("qmm_planes", f"N{N}K{K}O{O}g{g}h", e, e < 5e-3))
    # indexed-expert kernel
    E, K, O, g, Rr = 8, 512, 256, 32, 16
    q = rng.integers(-8, 8, size=(E, K, O)).astype(np.int8)
    sc = rng.uniform(0.005, 0.02, size=(E, K // g, O)).astype(np.float32)
    ids = rng.integers(0, E, size=Rr).astype(np.int32)
    x = rng.standard_normal((Rr, K)).astype(np.float32)
    x8 = np.broadcast_to(x[:, None], (Rr, 8, K))
    got = qmm_planes_expert(jnp.asarray(x8, jnp.bfloat16), jnp.asarray(ids),
                            jnp.asarray(q), jnp.asarray(sc), None, group=g,
                            interpret=interp)
    want = np.stack([x[i] @ (np.repeat(sc[e], g, axis=0) * q[e])
                     for i, e in enumerate(ids)])
    e = nmse(np.asarray(got), want)
    rows.append(("qmm_planes_expert", f"E{E}R{Rr}K{K}O{O}", e, e < 5e-3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="docs/conformance.csv")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    rows: list = []
    sweep_flash(rows, args.quick)
    sweep_flash_paged(rows, args.quick)
    sweep_flash_paged_holes(rows, args.quick)
    sweep_flash_paged_variants(rows, args.quick)
    sweep_qmm(rows, args.quick)
    sweep_qmm4(rows, args.quick)
    sweep_qmm_prefill(rows, args.quick)

    n_fail = sum(1 for r in rows if not r[3])
    lines = ["kernel,config,backend,nmse,pass"]
    for kern, cfgs, e, ok in rows:
        lines.append(f"{kern},{cfgs},{backend},{e:.3e},{'PASS' if ok else 'FAIL'}")
    out = "\n".join(lines) + "\n"
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out)
    print(out)
    print(f"# {len(rows)} cases on backend={backend}, {n_fail} failures")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
