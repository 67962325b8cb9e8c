"""GGUF writer->reader round-trip tests (analog of reference tests/test-gguf.cpp)."""

import numpy as np
import pytest

from llama_cpp_tpu.gguf import GGMLType, GGUFWriter, read_gguf
from llama_cpp_tpu.gguf.constants import GGML_BLOCK_LAYOUT, type_size_bytes


def test_roundtrip_metadata_and_tensors(tmp_path):
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.name", "unit-test")
    w.add("llama.block_count", 2)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("test.bool_t", True)
    w.add("test.bool_f", False)
    w.add("test.neg", -5)
    w.add("test.i64", np.int64(-(2**40)))
    w.add("test.str_array", ["a", "bb", "ccc"])
    w.add("test.f32_array", np.arange(5, dtype=np.float32))
    w.add("test.i32_array", np.array([-1, 2, -3], dtype=np.int32))

    rng = np.random.default_rng(0)
    t0 = rng.standard_normal((4, 8)).astype(np.float32)
    t1 = rng.standard_normal((3, 2, 8)).astype(np.float32)
    w.add_array_tensor("tensor.0", t0)
    w.add_array_tensor("tensor.1", t1)
    raw = rng.integers(0, 255, type_size_bytes(GGMLType.Q4_0, 64), dtype=np.uint8)
    w.add_tensor("tensor.q", raw.tobytes(), (64,), GGMLType.Q4_0)

    path = str(tmp_path / "test.gguf")
    w.write(path)

    f = read_gguf(path)
    assert f.version == 3
    assert f.metadata["general.architecture"] == "llama"
    assert f.metadata["llama.block_count"] == 2
    assert f.metadata["test.bool_t"] is True
    assert f.metadata["test.bool_f"] is False
    assert f.metadata["test.neg"] == -5
    assert f.metadata["test.i64"] == -(2**40)
    assert f.metadata["test.str_array"] == ["a", "bb", "ccc"]
    np.testing.assert_array_equal(f.metadata["test.f32_array"], np.arange(5, dtype=np.float32))
    np.testing.assert_array_equal(f.metadata["test.i32_array"], [-1, 2, -3])

    assert f.tensors["tensor.0"].ne == (8, 4)
    assert f.tensors["tensor.0"].shape == (4, 8)
    got0 = np.frombuffer(f.tensor_bytes("tensor.0"), dtype=np.float32).reshape(4, 8)
    np.testing.assert_array_equal(got0, t0)
    got1 = np.frombuffer(f.tensor_bytes("tensor.1"), dtype=np.float32).reshape(3, 2, 8)
    np.testing.assert_array_equal(got1, t1)
    np.testing.assert_array_equal(np.asarray(f.tensor_bytes("tensor.q")), raw)

    # alignment invariant
    for t in f.tensors.values():
        assert t.offset % f.alignment == 0


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        read_gguf(str(p))


def test_block_layout_sizes_match_reference_oracle(gguf_py):
    """Every quant type's (block_size, type_size) must match the reference."""
    ours = {t.name: (l.block_size, l.type_size) for t, l in GGML_BLOCK_LAYOUT.items()}
    for name, (bs, ts) in ours.items():
        if name == "Q8_1":
            # gguf-py's table is stale (40 bytes, fp32 d/s); the C struct in
            # ggml-common.h is 36 (2xfp16 + 32). Q8_1 never appears in files.
            continue
        qt = getattr(gguf_py.GGMLQuantizationType, name, None)
        if qt is None or qt not in gguf_py.GGML_QUANT_SIZES:
            continue
        ref_bs, ref_ts = gguf_py.GGML_QUANT_SIZES[qt]
        assert (bs, ts) == (ref_bs, ref_ts), name


def test_split_files(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((4, 4)).astype(np.float32)
    b = rng.standard_normal((2, 4)).astype(np.float32)
    w1 = GGUFWriter()
    w1.add("general.architecture", "llama")
    w1.add("split.no", np.uint16(0))
    w1.add("split.count", np.uint16(2))
    w1.add_array_tensor("a", a)
    w1.write(str(tmp_path / "m-00001-of-00002.gguf"))
    w2 = GGUFWriter()
    w2.add("split.no", np.uint16(1))
    w2.add("split.count", np.uint16(2))
    w2.add_array_tensor("b", b)
    w2.write(str(tmp_path / "m-00002-of-00002.gguf"))

    f = read_gguf(str(tmp_path / "m-00001-of-00002.gguf"))
    assert set(f.tensors) == {"a", "b"}
    assert f.metadata["general.architecture"] == "llama"
