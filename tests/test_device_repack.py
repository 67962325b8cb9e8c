"""On-device plane extraction (quant/device_repack.py) must be bit-identical
to the host numpy path (quant/repack.py) for every supported format, in all
layout modes (row-major, transposed, nibble-packed)."""

import numpy as np
import pytest

from llama_cpp_tpu.gguf.constants import GGML_BLOCK_LAYOUT, GGMLType
from llama_cpp_tpu.ops.qtensor import load_weight
from llama_cpp_tpu.quant.device_repack import (
    DEVICE_QUANT_TYPES, _PACK_OFF, _dense_jit, _extract_jit,
)

SHAPE = (8, 512)  # [out, in]


def _synth_raw(dtype: GGMLType, n: int, seed=0) -> np.ndarray:
    from llama_cpp_tpu.quant import quantize

    rng = np.random.default_rng(seed)
    data = rng.standard_normal(n).astype(np.float32)
    return np.frombuffer(quantize(data, dtype), dtype=np.uint8)


@pytest.mark.parametrize("dtype", sorted(DEVICE_QUANT_TYPES))
@pytest.mark.parametrize("transpose", [False, True])
def test_device_matches_host(dtype, transpose):
    n = int(np.prod(SHAPE))
    raw = _synth_raw(GGMLType(dtype), n)
    host = load_weight(raw, dtype, SHAPE, prefer_quant=True,
                       transpose=transpose)
    pack = transpose and GGMLType(dtype) in _PACK_OFF
    if host.hier:
        # hierarchical host planes: compare the DEVICE hier extractor
        from llama_cpp_tpu.quant.device_repack import (_extract_hier_jit,
                                                        _hier_pack4)

        q, sub, d, subm, dm = _extract_hier_jit(
            raw, dtype=GGMLType(dtype), shape=SHAPE, pack4=True)
        # the packed flag is host-static (a device round trip per tensor
        # would serialize the load stream — r4's 175 s load regression)
        assert host.packed == _hier_pack4(GGMLType(dtype), SHAPE, True)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(host.q))
        np.testing.assert_array_equal(np.asarray(sub), np.asarray(host.scales))
        np.testing.assert_allclose(np.asarray(d), np.asarray(host.d), rtol=1e-6)
        if host.mins is None:
            assert subm is None
        else:
            np.testing.assert_array_equal(np.asarray(subm),
                                          np.asarray(host.mins))
            np.testing.assert_allclose(np.asarray(dm), np.asarray(host.dmin),
                                       rtol=1e-6, atol=1e-7)
        return
    q, sc, mn = _extract_jit(raw, dtype=GGMLType(dtype), shape=SHAPE,
                             transpose=transpose, pack4=pack)
    assert host.packed == pack
    np.testing.assert_array_equal(np.asarray(q), np.asarray(host.q))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(host.scales),
                               rtol=1e-6)
    if host.mins is None:
        assert mn is None
    else:
        np.testing.assert_allclose(np.asarray(mn), np.asarray(host.mins),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("dtype,np_dt", [
    (GGMLType.F32, np.float32),
    (GGMLType.F16, np.float16),
])
def test_device_dense(dtype, np_dt):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    host = rng.standard_normal(SHAPE).astype(np_dt)
    raw = np.frombuffer(host.tobytes(), dtype=np.uint8)
    dev = _dense_jit(raw, dtype=dtype, shape=SHAPE, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(dev),
                                  host.astype(np.float32))
