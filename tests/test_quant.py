"""Quantization codec tests (analog of reference tests/test-quantize-fns.cpp):

1. quantize->dequantize round-trip error bounds per type (same thresholds idea
   as the reference's total_quantization_error limits)
2. bit-exact dequant parity against the reference gguf-py numpy oracle
3. bit-exact quantize parity for formats the oracle implements
"""

import numpy as np
import pytest

from llama_cpp_tpu.gguf import GGMLType
from llama_cpp_tpu.quant import dequantize, quantize
from llama_cpp_tpu.quant.dequant import _DEQUANT

# max RMSE (normalized) per type for synthetic smooth data; mirrors
# reference test-quantize-fns.cpp MAX_QUANTIZATION_TOTAL_ERROR tiers
ROUNDTRIP_TYPES = {
    GGMLType.Q4_0: 0.063,
    GGMLType.Q4_1: 0.064,
    GGMLType.Q5_0: 0.034,
    GGMLType.Q5_1: 0.032,
    GGMLType.Q8_0: 0.0042,
    GGMLType.Q2_K: 0.27,
    GGMLType.Q3_K: 0.15,
    GGMLType.Q4_K: 0.056,
    GGMLType.Q5_K: 0.030,
    GGMLType.Q6_K: 0.015,
    GGMLType.MXFP4: 0.11,
    GGMLType.IQ4_NL: 0.073,
    # IQ codebook encoders (original numpy search, quant/quantize.py):
    # bounds mirror the reference MAX_QUANTIZATION_TOTAL_ERROR tiers
    # (0.0075/0.0040 at n=4096 on the same cos data ~ rel 0.34/0.18)
    GGMLType.IQ2_XS: 0.33,
    GGMLType.IQ3_S: 0.14,
    GGMLType.IQ4_XS: 0.065,
}

N = 256 * 8


def synthetic(n: int) -> np.ndarray:
    # same flavor as reference generate_data(): 0.1 + 2*cos(i + offset)
    i = np.arange(n, dtype=np.float32)
    return 0.1 + 2.0 * np.cos(i + 0.3)


@pytest.mark.parametrize("qtype", sorted(ROUNDTRIP_TYPES, key=lambda t: t.name))
def test_roundtrip_error(qtype):
    x = synthetic(N)
    packed = quantize(x, qtype)
    y = dequantize(packed, qtype, N)
    rmse = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x * x))
    assert rmse < ROUNDTRIP_TYPES[qtype], f"{qtype.name}: rmse {rmse:.6f}"


@pytest.mark.parametrize("qtype", sorted(ROUNDTRIP_TYPES, key=lambda t: t.name))
def test_dequant_matches_oracle_on_our_blocks(gguf_py, qtype):
    """Our dequant vs reference gguf-py dequant, on blocks we quantized."""
    qt = getattr(gguf_py.GGMLQuantizationType, qtype.name)
    from gguf.quants import _type_traits  # type: ignore

    if qt not in _type_traits:
        pytest.skip(f"oracle lacks {qtype.name}")
    x = synthetic(N) * np.linspace(0.1, 3.0, N).astype(np.float32)
    packed = quantize(x, qtype)
    ours = dequantize(packed, qtype, N)
    theirs = _type_traits[qt].dequantize(packed.reshape(1, -1)).reshape(-1)
    np.testing.assert_array_equal(ours, theirs.astype(np.float32))


@pytest.mark.parametrize(
    "qtype",
    [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0],
)
def test_quantize_bitexact_vs_oracle(gguf_py, qtype):
    from gguf.quants import _type_traits  # type: ignore

    qt = getattr(gguf_py.GGMLQuantizationType, qtype.name)
    x = synthetic(N).reshape(8, -1)
    ours = quantize(x, qtype)
    theirs = _type_traits[qt].quantize(x).reshape(-1)
    np.testing.assert_array_equal(ours, theirs)


# exotic dequant-only formats: random valid blocks, oracle parity
EXOTIC = [
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    GGMLType.IQ4_XS,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
    GGMLType.NVFP4,
    GGMLType.Q8_K,
]


@pytest.mark.parametrize("qtype", EXOTIC, ids=lambda t: t.name)
def test_exotic_dequant_matches_oracle(gguf_py, qtype):
    from llama_cpp_tpu.gguf.constants import GGML_BLOCK_LAYOUT
    from gguf.quants import _type_traits  # type: ignore

    qt = getattr(gguf_py.GGMLQuantizationType, qtype.name)
    if qt not in _type_traits:
        pytest.skip(f"oracle lacks {qtype.name}")
    layout = GGML_BLOCK_LAYOUT[qtype]
    rng = np.random.default_rng(42)
    nb = 16
    raw = rng.integers(0, 256, (nb, layout.type_size), dtype=np.uint8)
    # clamp fp16 scale fields to sane finite values to avoid NaN/Inf compares:
    # write a small positive fp16 into the leading scale bytes where applicable
    d = np.full(nb, 0.37, dtype=np.float16).view(np.uint8).reshape(nb, 2)
    if qtype in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                 GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S):
        raw[:, 0:2] = d
    elif qtype == GGMLType.TQ1_0:
        raw[:, 52:54] = d
    elif qtype == GGMLType.TQ2_0:
        raw[:, 64:66] = d
    elif qtype == GGMLType.Q8_K:
        raw[:, 0:4] = np.full(nb, 0.37, dtype=np.float32).view(np.uint8).reshape(nb, 4)
    n = nb * layout.block_size
    ours = dequantize(raw.reshape(-1), qtype, n)
    theirs = _type_traits[qt].dequantize(raw.reshape(1, -1)).reshape(-1)
    np.testing.assert_allclose(ours, theirs.astype(np.float32), rtol=0, atol=0)


def test_f16_bf16_paths():
    x = np.linspace(-3, 3, 64).astype(np.float32)
    for t in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
        packed = quantize(x, t)
        y = dequantize(packed, t, 64)
        atol = {GGMLType.F16: 2e-3, GGMLType.BF16: 2e-2, GGMLType.F32: 0}[t]
        np.testing.assert_allclose(x, y, atol=atol)


def test_all_declared_dequants_run():
    from llama_cpp_tpu.gguf.constants import GGML_BLOCK_LAYOUT

    rng = np.random.default_rng(7)
    for qtype, fn in _DEQUANT.items():
        layout = GGML_BLOCK_LAYOUT[qtype]
        raw = rng.integers(0, 256, 4 * layout.type_size, dtype=np.uint8)
        out = fn(raw, 4 * layout.block_size)
        assert out.shape == (4 * layout.block_size,)
        assert out.dtype == np.float32
