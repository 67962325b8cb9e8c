"""Pallas fused dequant-GEMM conformance vs the XLA dequant reference
(the analog of reference tests/test-backend-ops.cpp per-op NMSE checks),
run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.gguf import GGMLType
from llama_cpp_tpu.ops.qtensor import QuantTensor, load_weight
from llama_cpp_tpu.ops.pallas.qmm import qmm
from llama_cpp_tpu.quant import quantize


def make_qt(qtype, O, K, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((O, K)) * 0.1).astype(np.float32)
    raw = quantize(w, qtype)
    qt = load_weight(raw, qtype, (O, K), prefer_quant=True, transpose=True)
    assert isinstance(qt, QuantTensor) and qt.transposed
    return qt


@pytest.mark.parametrize(
    "qtype,O,K,N",
    [
        (GGMLType.Q8_0, 256, 256, 8),
        (GGMLType.Q8_0, 512, 512, 16),
        (GGMLType.Q4_0, 256, 512, 8),
        (GGMLType.Q4_K, 256, 256, 8),  # has mins
        (GGMLType.Q6_K, 256, 512, 32),  # group 16
        (GGMLType.Q4_1, 128, 256, 8),  # mins, group 32
    ],
    ids=lambda v: str(v),
)
def test_qmm_matches_dequant_path(qtype, O, K, N):
    qt = make_qt(qtype, O, K)
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((N, K)) * 0.5).astype(np.float32))

    ref = jnp.dot(
        x.astype(jnp.bfloat16), qt.dequant(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    got = qmm(x.astype(jnp.bfloat16), qt, interpret=True)
    nmse = float(jnp.mean((got - ref) ** 2) / (jnp.mean(ref**2) + 1e-12))
    assert nmse < 1e-4, nmse


def test_qmm_pads_odd_rows():
    qt = make_qt(GGMLType.Q8_0, 256, 256)
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.standard_normal((3, 256))).astype(np.float32))
    ref = jnp.dot(x.astype(jnp.bfloat16), qt.dequant(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    got = qmm(x.astype(jnp.bfloat16), qt, interpret=True)
    assert got.shape == (3, 256)
    nmse = float(jnp.mean((got - ref) ** 2) / (jnp.mean(ref**2) + 1e-12))
    assert nmse < 1e-4


def test_qmm_planes_expert_indexed():
    """Indexed-expert GEMM (GGML_OP_MUL_MAT_ID analog): scalar-prefetched
    expert ids drive the weight index_map; vs dense per-row reference."""
    import numpy as np

    import jax.numpy as jnp
    from llama_cpp_tpu.ops.pallas.qmm import qmm_planes_expert

    rng = np.random.default_rng(0)
    E, K, O, R, g = 4, 512, 256, 6, 32
    q = rng.integers(-127, 127, (E, K, O)).astype(np.int8)
    sc = (rng.standard_normal((E, K // g, O)) * 0.02).astype(np.float32)
    mn = (rng.standard_normal((E, K // g, O)) * 0.01).astype(np.float32)
    x = rng.standard_normal((R, K)).astype(np.float32)
    ids = rng.integers(0, E, R).astype(np.int32)
    x8 = np.broadcast_to(x[:, None], (R, 8, K)).copy()

    wde = q.astype(np.float32) * np.repeat(sc, g, axis=1)
    for mins in (None, mn):
        out = qmm_planes_expert(
            jnp.asarray(x8, jnp.bfloat16), jnp.asarray(ids), jnp.asarray(q),
            jnp.asarray(sc), None if mins is None else jnp.asarray(mins),
            group=g, interpret=True)
        wref = wde if mins is None else wde + np.repeat(mn, g, axis=1)
        ref = np.stack([x[r] @ wref[ids[r]] for r in range(R)])
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        assert err < 5e-3, err


def test_qmm4_packed_matches_dense():
    """int4 nibble-packed kernel (qmm4_planes): y == x @ dequant(W)."""
    import numpy as np
    import jax.numpy as jnp

    from llama_cpp_tpu.ops.pallas.qmm import qmm4_planes

    rng = np.random.default_rng(5)
    N, K, O, g = 8, 512, 256, 32
    u = rng.integers(0, 16, size=(K, O)).astype(np.uint8)
    sc = rng.uniform(0.005, 0.02, size=(K // g, O)).astype(np.float32)
    mn = rng.uniform(-0.1, 0.0, size=(K // g, O)).astype(np.float32)
    # half-split pairing: row k low nibble, row k + K/2 high
    packed = (u[: K // 2] | (u[K // 2:] << 4)).astype(np.uint8)
    x = rng.standard_normal((N, K)).astype(np.float32)
    got = np.asarray(qmm4_planes(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed), jnp.asarray(sc),
        jnp.asarray(mn), group=g, interpret=True))
    w = np.repeat(sc, g, axis=0) * u + np.repeat(mn, g, axis=0)
    want = x @ w
    denom = np.mean(want**2) + 1e-12
    assert np.mean((got - want) ** 2) / denom < 5e-3


def test_load_weight_packs_q4():
    """load_weight nibble-packs 4-bit formats; dequant matches the int8
    plane dequant exactly (offset folded into mins)."""
    import numpy as np
    import jax.numpy as jnp

    from llama_cpp_tpu.gguf.constants import GGMLType
    from llama_cpp_tpu.ops.qtensor import load_weight
    from llama_cpp_tpu.quant.quantize import quantize

    rng = np.random.default_rng(6)
    w = rng.standard_normal((64, 512)).astype(np.float32)
    for t in (GGMLType.Q4_0, GGMLType.Q4_K):
        raw = np.frombuffer(quantize(w, t).tobytes(), dtype=np.uint8)
        qt_p = load_weight(raw, t, (64, 512), transpose=True)
        assert qt_p.packed, t
        assert qt_p.q.dtype == jnp.int8 and qt_p.q.shape == (256, 64)
        import llama_cpp_tpu.ops.qtensor as qtm

        old = qtm._PACK4
        qtm._PACK4 = False
        try:
            qt_i = load_weight(raw, t, (64, 512), transpose=True)
        finally:
            qtm._PACK4 = old
        np.testing.assert_allclose(
            np.asarray(qt_p.dequant(jnp.float32)),
            np.asarray(qt_i.dequant(jnp.float32)), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "qtype,O,K",
    [
        (GGMLType.Q8_0, 256, 512),
        (GGMLType.Q4_K, 256, 256),   # mins; nibble-packed at load
        (GGMLType.Q6_K, 256, 512),   # group 16
    ],
    ids=lambda v: str(v),
)
def test_qmm_prefill_matches_decode_kernel(qtype, O, K):
    """Dequant-hoisted prefill grid (qmm_planes_prefill / qmm4_planes_prefill)
    is numerically identical to the decode kernel: same dequant math, only
    the loop order + scratch reuse differ. N=512 engages the prefill path
    via qmm()'s dispatch threshold."""
    from llama_cpp_tpu.ops.pallas import qmm as qmm_mod

    qt = make_qt(qtype, O, K)
    rng = np.random.default_rng(7)
    N = qmm_mod.PREFILL_MIN_N
    x = jnp.asarray((rng.standard_normal((N, K)) * 0.5), jnp.bfloat16)

    sc = qt.scales if qt.hier else qt.scales.astype(jnp.float32)
    mn = qt.mins if qt.hier or qt.mins is None else qt.mins.astype(jnp.float32)
    kw = dict(group=qt.group, interpret=True)
    if qt.hier:
        kw.update(dT=qt.d, dminT=qt.dmin, sgroup=qt.sgroup)
    if qt.packed:
        ref = qmm_mod.qmm4_planes(x, qt.q, sc, mn, **kw)
        got = qmm_mod.qmm4_planes_prefill(x, qt.q, sc, mn, **kw)
    else:
        ref = qmm_mod.qmm_planes(x, qt.q, sc, mn, **kw)
        got = qmm_mod.qmm_planes_prefill(x, qt.q, sc, mn, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # and the public entry dispatches to the prefill variant at this N
    full = qmm(x, qt, interpret=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(got),
                               rtol=2e-3, atol=2e-3)
