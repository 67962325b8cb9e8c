"""Pallas flash-attention conformance vs the dense XLA reference.

Analog of reference tests/test-backend-ops.cpp FLASH_ATTN_EXT cases: every
kernel feature (GQA, causal, SWA window, softcap, sinks, int8 KV, padding)
is checked against a straightforward dense softmax implementation, in
interpret mode on the CPU oracle platform.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama_cpp_tpu.ops.pallas.flash_attn import flash_attention, mha_flash


def dense_ref(q, k, v, row_pos, col_pos, *, sm_scale, window=0, softcap=0.0,
              sinks=None, k_scale=None, v_scale=None):
    """[B,Hkv,R,D] grouped-layout dense attention in f64-ish numpy."""
    q = np.asarray(q, np.float32)
    k = np.asarray(k, np.float32)
    v = np.asarray(v, np.float32)
    if k_scale is not None:
        k = k * np.asarray(k_scale, np.float32)[:, :, :, None]
        v = v * np.asarray(v_scale, np.float32)[:, :, :, None]
    B, H, R, D = q.shape
    S = k.shape[2]
    out = np.zeros((B, H, R, v.shape[3]), np.float32)
    for b in range(B):
        for h in range(H):
            s = (q[b, h] @ k[b, h].T) * sm_scale  # [R, S]
            if softcap:
                s = softcap * np.tanh(s / softcap)
            mask = (col_pos[b][None, :] >= 0) & (
                col_pos[b][None, :] <= row_pos[b][:, None]
            )
            if window > 0:
                mask &= col_pos[b][None, :] > row_pos[b][:, None] - window
            s = np.where(mask, s, -np.inf)
            if sinks is not None:
                s = np.concatenate(
                    [s, np.broadcast_to(sinks[h][:, None], (R, 1))], axis=1
                )
            m = np.max(s, axis=1, keepdims=True)
            m = np.where(np.isfinite(m), m, 0.0)
            e = np.exp(s - m)
            denom = e.sum(axis=1, keepdims=True)
            p = np.where(denom > 0, e / np.maximum(denom, 1e-30), 0.0)
            if sinks is not None:
                p = p[:, :S]
            out[b, h] = p @ v[b, h]
    return out


def make_case(B=2, Hkv=2, R=16, S=256, D=128, Dv=128, fill=170, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, Hkv, R, D), dtype=np.float32)
    k = rng.standard_normal((B, Hkv, S, D), dtype=np.float32)
    v = rng.standard_normal((B, Hkv, S, Dv), dtype=np.float32)
    col_pos = np.full((B, S), -1, np.int32)
    col_pos[:, :fill] = np.arange(fill)
    row_pos = rng.integers(0, fill, size=(B, R)).astype(np.int32)
    return q, k, v, row_pos, col_pos


def run_both(q, k, v, rp, cp, **kw):
    out = flash_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(k, jnp.bfloat16) if kw.get("k_scale") is None else jnp.asarray(k, jnp.int8),
        jnp.asarray(v, jnp.bfloat16) if kw.get("v_scale") is None else jnp.asarray(v, jnp.int8),
        jnp.asarray(rp),
        jnp.asarray(cp),
        sinks=None if kw.get("sinks") is None else jnp.asarray(kw["sinks"]),
        k_scale=None if kw.get("k_scale") is None else jnp.asarray(kw["k_scale"]),
        v_scale=None if kw.get("v_scale") is None else jnp.asarray(kw["v_scale"]),
        sm_scale=kw["sm_scale"],
        window=kw.get("window", 0),
        softcap=kw.get("softcap", 0.0),
        interpret=True,
    )
    ref = dense_ref(q, k, v, rp, cp, **kw)
    return np.asarray(out), ref


def assert_close(got, ref, tol=3e-2):
    # bf16 matmuls: compare with a relative-scale tolerance
    denom = np.maximum(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got / denom, ref / denom, atol=tol)


def test_causal_gqa_basic():
    q, k, v, rp, cp = make_case()
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.088)
    assert_close(got, ref)


def test_sliding_window():
    q, k, v, rp, cp = make_case(fill=200, seed=1)
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.1, window=64)
    assert_close(got, ref)


def test_softcap():
    q, k, v, rp, cp = make_case(seed=2)
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.5, softcap=30.0)
    assert_close(got, ref)


def test_attention_sinks():
    q, k, v, rp, cp = make_case(seed=3)
    sinks = np.random.default_rng(3).standard_normal((2, 16)).astype(np.float32)
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.12, sinks=sinks)
    assert_close(got, ref)


def test_quantized_kv():
    rng = np.random.default_rng(4)
    q, k, v, rp, cp = make_case(seed=4)
    # int8-quantize k/v per slot row
    def quant(x):
        amax = np.abs(x).max(axis=-1, keepdims=True)
        sc = amax / 127.0
        qv = np.round(x / np.maximum(sc, 1e-12)).astype(np.int8)
        return qv, sc[..., 0].astype(np.float32)

    kq, ks = quant(k)
    vq, vs = quant(v)
    got, ref = run_both(q, kq, vq, rp, cp, sm_scale=0.088, k_scale=ks, v_scale=vs)
    assert_close(got, ref)


def test_padding_rows_ignored():
    q, k, v, rp, cp = make_case(R=16, seed=5)
    rp[:, 10:] = -1  # pad rows; outputs for those rows are undefined
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.1)
    assert_close(got[:, :, :10], ref[:, :, :10])
    assert np.all(np.isfinite(got))


def test_decode_single_row():
    q, k, v, rp, cp = make_case(R=4, S=512, fill=300, seed=6)
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.088)
    assert_close(got, ref)


def test_mha_wrapper_matches_einsum_path():
    """End-to-end: forced-flash forward == einsum-fallback forward."""
    from llama_cpp_tpu.ops.pallas import flash_attn as fa

    rng = np.random.default_rng(7)
    B, T, H, Hkv, D = 2, 4, 8, 2, 128
    S, fill = 256, 100
    q = rng.standard_normal((B, T, H, D), dtype=np.float32)
    k = rng.standard_normal((B, Hkv, S, D), dtype=np.float32)
    v = rng.standard_normal((B, Hkv, S, D), dtype=np.float32)
    cp = np.full((B, S), -1, np.int32)
    cp[:, :fill] = np.arange(fill)
    positions = np.tile(np.arange(fill - T, fill, dtype=np.int32), (B, 1))

    out = np.asarray(
        mha_flash(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), jnp.asarray(positions),
            jnp.asarray(cp), sm_scale=0.088, interpret=True,
        )
    )
    # grouped dense reference: head hq = hkv*G + g, row r = g*T + t
    G = H // Hkv
    qr = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 3, 1, 4).reshape(B, Hkv, G * T, D)
    rp = np.tile(positions, (1, G))
    ref = dense_ref(qr, k, v, rp, cp, sm_scale=0.088)
    ref = ref.reshape(B, Hkv, G, T, D).transpose(0, 3, 1, 2, 4).reshape(B, T, H * D)
    assert_close(out, ref)


def test_head_dim_64():
    q, k, v, rp, cp = make_case(D=64, Dv=64, seed=8)
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.125)
    assert_close(got, ref)


def test_head_dim_64_with_sinks_and_window():
    """gpt-oss shape: d=64 + sinks + sliding window."""
    q, k, v, rp, cp = make_case(D=64, Dv=64, fill=200, seed=9)
    sinks = np.random.default_rng(9).standard_normal((2, 16)).astype(np.float32)
    got, ref = run_both(q, k, v, rp, cp, sm_scale=0.125, window=64, sinks=sinks)
    assert_close(got, ref)


def test_paged_window_tail():
    """Decode-window tail (runtime/decode_window.py): pool pages + window
    rows in one kernel pass == dense reference over the concatenation.
    Covers the windowed scan decode's attention read (both KV dtypes)."""
    from llama_cpp_tpu.ops.pallas.flash_attn import flash_attention_paged

    rng = np.random.default_rng(3)
    B, Hkv, G, Dk, Dv = 2, 4, 2, 128, 128
    page, P, W = 128, 8, 128

    for quant in (False, True):
        if quant:
            k4 = rng.integers(-80, 80, (Hkv, P, page, Dk)).astype(np.int8)
            v4 = rng.integers(-80, 80, (Hkv, P, page, Dv)).astype(np.int8)
            ks4 = rng.random((Hkv, P, 1, page)).astype(np.float32) * 0.02
            vs4 = rng.random((Hkv, P, 1, page)).astype(np.float32) * 0.02
            wk = rng.integers(-80, 80, (B, Hkv, W, Dk)).astype(np.int8)
            wv = rng.integers(-80, 80, (B, Hkv, W, Dv)).astype(np.int8)
            wks = rng.random((B, Hkv, W)).astype(np.float32) * 0.02
            wvs = rng.random((B, Hkv, W)).astype(np.float32) * 0.02
        else:
            k4 = rng.standard_normal((Hkv, P, page, Dk)).astype(np.float32) * 0.3
            v4 = rng.standard_normal((Hkv, P, page, Dv)).astype(np.float32) * 0.3
            ks4 = vs4 = wks = wvs = None
            wk = rng.standard_normal((B, Hkv, W, Dk)).astype(np.float32) * 0.3
            wv = rng.standard_normal((B, Hkv, W, Dv)).astype(np.float32) * 0.3
        # seq 0: pages 0,1 depth 200; seq 1: pages 2,3 depth 150
        table = np.array([[0, 1, P - 1, P - 1], [2, 3, P - 1, P - 1]], np.int32)
        pos = np.full((P, 1, page), -1, np.int32)
        pos[0, 0, :] = np.arange(128)
        pos[1, 0, :72] = np.arange(128, 200)
        pos[2, 0, :] = np.arange(128)
        pos[3, 0, :22] = np.arange(128, 150)
        depth = np.array([200, 150])
        fill = 5  # 5 in-flight chunk rows per sequence
        wpos = np.full((B, W), -1, np.int32)
        for b in range(B):
            wpos[b, :fill] = depth[b] + np.arange(fill)
        q = rng.standard_normal((B, Hkv, G, Dk)).astype(np.float32) * 0.5
        row_pos = np.stack(
            [np.full(G, depth[b] + fill - 1) for b in range(B)]).astype(np.int32)

        out = np.asarray(flash_attention_paged(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k4), jnp.asarray(v4),
            jnp.asarray(row_pos), jnp.asarray(pos), jnp.asarray(table),
            k_scale4=None if not quant else jnp.asarray(ks4),
            v_scale4=None if not quant else jnp.asarray(vs4),
            wk=jnp.asarray(wk), wv=jnp.asarray(wv), wpos=jnp.asarray(wpos),
            wks=None if not quant else jnp.asarray(wks),
            wvs=None if not quant else jnp.asarray(wvs),
            sm_scale=1 / np.sqrt(Dk), page=page, interpret=True))

        for b in range(B):
            tb = table[b]
            kk = k4[:, tb].reshape(Hkv, -1, Dk).astype(np.float32)
            vv = v4[:, tb].reshape(Hkv, -1, Dv).astype(np.float32)
            if quant:
                kk = kk * ks4[:, tb].reshape(Hkv, -1)[:, :, None]
                vv = vv * vs4[:, tb].reshape(Hkv, -1)[:, :, None]
            kwd = wk[b].astype(np.float32)
            vwd = wv[b].astype(np.float32)
            if quant:
                kwd = kwd * wks[b][:, :, None]
                vwd = vwd * wvs[b][:, :, None]
            kk = np.concatenate([kk, kwd], axis=1)
            vv = np.concatenate([vv, vwd], axis=1)
            cp = np.concatenate([pos[tb].reshape(-1), wpos[b]])
            ref = dense_ref(q[b][None], kk[None], vv[None],
                            row_pos[b][None], cp[None],
                            sm_scale=1 / np.sqrt(Dk))[0]
            assert np.abs(out[b] - ref).max() < 0.03 * np.abs(ref).max() + 1e-3
