"""Native C++ loader codecs must be bitwise-identical to the numpy path
(conformance harness in the spirit of reference tests/test-backend-ops.cpp:
every native kernel validated against the reference implementation)."""

import numpy as np
import pytest

from llama_cpp_tpu.gguf.constants import GGMLType
from llama_cpp_tpu.native import (
    extract_planes_native,
    get_lib,
    native_supported,
    transpose2d,
)
from llama_cpp_tpu.quant import repack
from llama_cpp_tpu.quant.quantize import quantize

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native lib/g++")

NATIVE_TYPES = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.MXFP4,
]


@pytest.mark.parametrize("t", NATIVE_TYPES, ids=lambda t: t.name)
def test_native_planes_bitwise_equal(t):
    assert native_supported(int(t))
    rng = np.random.default_rng(int(t))
    n = 256 * 64
    try:
        x = (rng.standard_normal(n) * 3).astype(np.float32)
        raw = quantize(x.reshape(64, 256), t)
    except NotImplementedError:
        # no quantizer for this type: parse random (structurally valid) bytes
        from llama_cpp_tpu.gguf.constants import type_size_bytes

        raw = rng.integers(0, 256, type_size_bytes(t, n), dtype=np.uint8)
        # keep f16 scale fields finite-ish: zero the exponent's top bit
        raw = (raw & 0xBF) | 0x10

    q_py, sc_py, mn_py, g_py = repack._PLANES[t](raw, n)
    out = extract_planes_native(np.asarray(raw), int(t), n)
    assert out is not None
    q_c, sc_c, mn_c, g_c = out

    assert g_c == g_py
    np.testing.assert_array_equal(q_c, q_py)
    np.testing.assert_array_equal(sc_c.view(np.uint32), np.asarray(sc_py, np.float32).view(np.uint32))
    if mn_py is None:
        assert mn_c is None
    else:
        np.testing.assert_array_equal(
            mn_c.view(np.uint32), np.asarray(mn_py, np.float32).view(np.uint32))


@pytest.mark.parametrize("dtype", [np.int8, np.float32])
def test_native_transpose(dtype):
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((300, 513)) * 10).astype(dtype)
    out = transpose2d(a)
    assert out is not None
    np.testing.assert_array_equal(out, a.T)


def test_native_f16():
    import ctypes

    lib = get_lib()
    rng = np.random.default_rng(1)
    h = rng.standard_normal(10000).astype(np.float16)
    # include specials
    h[:4] = [np.float16(0), np.float16(-0.0), np.float16(6e-8), np.float16(65504)]
    dst = np.empty(h.size, np.float32)
    lib.gnat_f16_to_f32(h.ctypes.data_as(ctypes.c_void_p),
                        dst.ctypes.data_as(ctypes.c_void_p), h.size, 4)
    np.testing.assert_array_equal(dst.view(np.uint32),
                                  h.astype(np.float32).view(np.uint32))
