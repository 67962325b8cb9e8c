"""Plane repacking must reproduce dequantize() exactly: q*sc+mn == dequant."""

import numpy as np
import pytest

from llama_cpp_tpu.gguf import GGMLType
from llama_cpp_tpu.gguf.constants import GGML_BLOCK_LAYOUT
from llama_cpp_tpu.quant import dequantize, quantize
from llama_cpp_tpu.quant.repack import PLANE_TYPES, extract_planes

N = 256 * 8


def _blocks_for(qtype, rng):
    """Valid packed data: quantize random floats where we have a quantizer,
    else random bytes with the fp16 scale field pinned to a finite value."""
    from llama_cpp_tpu.quant.quantize import _QUANT

    if qtype in _QUANT:
        x = (0.1 + 2.0 * np.cos(np.arange(N) + 0.3)).astype(np.float32)
        return quantize(x, qtype)
    layout = GGML_BLOCK_LAYOUT[qtype]
    nb = N // layout.block_size
    raw = rng.integers(0, 256, (nb, layout.type_size), dtype=np.uint8)
    d = np.full(nb, 0.37, dtype=np.float16).view(np.uint8).reshape(nb, 2)
    if qtype == GGMLType.TQ2_0:
        raw[:, 64:66] = d
    elif qtype == GGMLType.Q8_K:
        raw[:, 0:4] = np.full(nb, 0.37, dtype=np.float32).view(np.uint8).reshape(nb, 4)
    else:
        raw[:, 0:2] = d
    return raw.reshape(-1)


@pytest.mark.parametrize("qtype", sorted(PLANE_TYPES, key=lambda t: t.name), ids=lambda t: t.name)
def test_planes_reproduce_dequant(qtype):
    rng = np.random.default_rng(3)
    raw = _blocks_for(qtype, rng)
    ref = dequantize(raw, qtype, N)
    q, sc, mn, g = extract_planes(raw, qtype, N)
    assert q.dtype == np.int8 and q.shape == (N,)
    assert sc.shape == (N // g,)
    rec = q.astype(np.float32).reshape(-1, g) * sc[:, None]
    if mn is not None:
        rec = rec + mn[:, None]
    np.testing.assert_allclose(rec.reshape(-1), ref, rtol=1e-6, atol=1e-6)
