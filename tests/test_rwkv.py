"""RWKV6: wkv recurrence correctness (scan vs naive loop oracle) and
decode==prefill consistency through the token-shift/wkv state."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.models.rwkv import wkv6_scan
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import make_tiny_rwkv6_gguf


def test_wkv6_scan_matches_naive_loop():
    """Associative-scan evaluation vs direct transcription of the reference
    kernel loop (ggml/src/ggml-cpu/ops.cpp rwkv_wkv6)."""
    rng = np.random.default_rng(0)
    B, T, H, hs = 2, 7, 3, 4
    r, k, v = (rng.standard_normal((B, T, H, hs)).astype(np.float32) for _ in range(3))
    w = np.exp(-np.exp(rng.standard_normal((B, T, H, hs)).astype(np.float32)))
    u = rng.standard_normal((H, hs)).astype(np.float32)
    s0 = rng.standard_normal((B, H, hs, hs)).astype(np.float32)

    y, sT = wkv6_scan(jnp.asarray(s0), jnp.asarray(r), jnp.asarray(k),
                      jnp.asarray(v), jnp.asarray(w), jnp.asarray(u))

    y_ref = np.zeros((B, T, H, hs), np.float32)
    s = s0.copy()
    for b in range(B):
        st = s0[b].copy()
        for t in range(T):
            for h in range(H):
                for i in range(hs):
                    kv = k[b, t, h, i] * v[b, t, h]  # [j]
                    y_ref[b, t, h] += r[b, t, h, i] * (kv * u[h, i] + st[h, i])
                    st[h, i] = st[h, i] * w[b, t, h, i] + kv
        s[b] = st
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sT), s, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rwkv") / "tiny.gguf")
    make_tiny_rwkv6_gguf(p)
    return load_model(p, prefer_quant=False)


def test_rwkv6_decode_matches_prefill(model):
    tokens = [3, 17, 42, 7, 99, 12]
    ctx = Context(model, n_ctx=64, n_seqs=1)
    pre = ctx.prefill(tokens)

    ctx2 = Context(model, n_ctx=64, n_seqs=1)
    for t in tokens[:-1]:
        ctx2.decode_one(t)
    step = ctx2.decode_one(tokens[-1])
    np.testing.assert_allclose(step, pre, rtol=3e-4, atol=3e-4)


def test_rwkv6_generation_and_seq_isolation(model):
    ctx = Context(model, n_ctx=64, n_seqs=2)
    out_a = ctx.generate([5, 9, 23], max_new_tokens=8, seq=0)
    out_b = ctx.generate([7, 7, 7], max_new_tokens=8, seq=1)
    ctx2 = Context(model, n_ctx=64, n_seqs=2)
    out_b2 = ctx2.generate([7, 7, 7], max_new_tokens=8, seq=1)
    assert out_b == out_b2  # seq 0 state must not leak into seq 1
    assert len(out_a) == 8


def test_wkv7_scan_matches_reference_loop():
    """wkv7_scan vs a direct transcription of the reference CPU kernel loop
    (ggml/src/ggml-cpu/ops.cpp ggml_compute_forward_rwkv_wkv7_f32)."""
    import numpy as np
    import jax.numpy as jnp
    from llama_cpp_tpu.models.rwkv import wkv7_scan

    rng = np.random.default_rng(3)
    B, T, H, D = 2, 5, 2, 8
    r, w, k, v, a, b = (rng.standard_normal((B, T, H, D)).astype(np.float32)
                        for _ in range(6))
    w = np.exp(-np.exp(w))  # decay in (0, 1)
    s0 = rng.standard_normal((B, H, D, D)).astype(np.float32)

    out_ref = np.zeros((B, T, H, D), np.float32)
    S = s0.copy()
    for t in range(T):
        for bb in range(B):
            for h in range(H):
                for i in range(D):
                    sa = float(np.dot(a[bb, t, h], S[bb, h, i]))
                    for j in range(D):
                        S[bb, h, i, j] = (S[bb, h, i, j] * w[bb, t, h, j]
                                          + v[bb, t, h, i] * k[bb, t, h, j]
                                          + sa * b[bb, t, h, j])
                    out_ref[bb, t, h, i] = float(np.dot(S[bb, h, i], r[bb, t, h]))

    y, sT = wkv7_scan(jnp.asarray(s0), *map(jnp.asarray, (r, w, k, v, a, b)))
    np.testing.assert_allclose(np.asarray(y), out_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), S, rtol=1e-5, atol=1e-5)


def test_rwkv7_decode_matches_prefill(tmp_path):
    from llama_cpp_tpu.testing import make_tiny_rwkv7_gguf
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    import numpy as np
    import jax.numpy as jnp

    path = str(tmp_path / "r7.gguf")
    make_tiny_rwkv7_gguf(path, n_layers=3, n_embd=32, head_size=8, seed=5)
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    assert m.cfg.extra["rwkv"] and "time_mix_w0" in m.params["layers"][0]
    assert "time_mix_v1" in m.params["layers"][1]  # value residual from L0
    tokens = [3, 17, 42, 7, 9, 11]

    ctx = Context(m, n_ctx=32, n_seqs=1)
    pre = ctx.decode(np.asarray(tokens)[None, :], np.asarray([0]),
                     np.arange(len(tokens))[None, :], np.arange(len(tokens)))

    ctx2 = Context(m, n_ctx=32, n_seqs=1)
    outs = []
    for i, t in enumerate(tokens):
        outs.append(ctx2.decode(np.asarray([[t]]), np.asarray([0]),
                                np.asarray([[i]]), np.asarray([0]))[0])
        ctx2.seq_len[0] = i + 1
    np.testing.assert_allclose(np.stack(outs), pre, rtol=2e-4, atol=2e-4)


def test_rwkv7_ungated_variant(tmp_path):
    from llama_cpp_tpu.testing import make_tiny_rwkv7_gguf
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    import numpy as np
    import jax.numpy as jnp

    path = str(tmp_path / "r7u.gguf")
    make_tiny_rwkv7_gguf(path, n_layers=2, n_embd=32, head_size=8, seed=6,
                         gated=False)
    m = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(m, n_ctx=32, n_seqs=1)
    out = ctx.generate([3, 5, 9], max_new_tokens=4)
    assert len(out) == 4
