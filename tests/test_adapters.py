"""LoRA adapters + control vectors (reference src/llama-adapter.cpp,
tools/export-lora). Runtime application must equal weight merging."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.gguf.constants import GGMLType
from llama_cpp_tpu.gguf.writer import GGUFWriter
from llama_cpp_tpu.models.adapters import (
    LoraAdapter,
    apply_control_vector,
    apply_lora,
    load_control_vector,
    load_lora,
    remove_control_vector,
    remove_lora,
)
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import make_tiny_llama_gguf

PROMPT = [4, 9, 23, 9, 77, 42]


@pytest.fixture(scope="module")
def base_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lora") / "base.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=128,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    return p


def write_lora_gguf(path, pairs, alpha=16.0):
    """pairs: {gguf_base_name: (A [r, in], B [out, r])}"""
    w = GGUFWriter()
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", float(alpha))
    for base, (a, b) in pairs.items():
        w.add_tensor(base + ".lora_a", a.astype(np.float32).tobytes(),
                     tuple(reversed(a.shape)), GGMLType.F32)
        w.add_tensor(base + ".lora_b", b.astype(np.float32).tobytes(),
                     tuple(reversed(b.shape)), GGMLType.F32)
    w.write(path)
    return path


def make_adapter(tmp_path, rank=4, alpha=8.0, seed=0):
    rng = np.random.default_rng(seed)
    pairs = {}
    for il in range(2):
        for nm, (out_d, in_d) in (("attn_q", (128, 128)), ("ffn_down", (128, 256))):
            a = rng.standard_normal((rank, in_d)).astype(np.float32) * 0.05
            b = rng.standard_normal((out_d, rank)).astype(np.float32) * 0.05
            pairs[f"blk.{il}.{nm}.weight"] = (a, b)
    return write_lora_gguf(str(tmp_path / "adapter.gguf"), pairs, alpha)


def logits_of(model, prompt=PROMPT):
    ctx = Context(model, n_ctx=64, n_seqs=1)
    return ctx.prefill(prompt)


def test_lora_runtime_equals_merged(base_path, tmp_path):
    lpath = make_adapter(tmp_path)
    adapter = load_lora(lpath)
    assert adapter.n_tensors == 4 and adapter.rank == 4

    # runtime application
    m = load_model(base_path, prefer_quant=False)
    n = apply_lora(m, adapter, scale=1.0)
    assert n == 4
    rt = logits_of(m)

    # manual merge on a fresh (unfused) model
    m2 = load_model(base_path, prefer_quant=False, fuse=False)
    s = adapter.alpha / adapter.rank
    for (kind, il, wk), (a, b) in adapter.tensors.items():
        w = m2.params["layers"][il][wk]
        delta = jnp.asarray(s * (b @ a), w.dtype)
        m2.params["layers"][il][wk] = w + delta
    merged = logits_of(m2)
    np.testing.assert_allclose(rt, merged, rtol=5e-2, atol=5e-2)
    assert np.mean(np.abs(rt - merged)) / (np.mean(np.abs(merged)) + 1e-9) < 0.01


def test_lora_remove_restores_base(base_path, tmp_path):
    lpath = make_adapter(tmp_path)
    m = load_model(base_path, prefer_quant=False)
    base_logits = logits_of(m)
    apply_lora(m, load_lora(lpath), scale=1.0)
    with_lora = logits_of(m)
    assert not np.allclose(with_lora, base_logits)
    assert remove_lora(m) == 4
    np.testing.assert_allclose(logits_of(m), base_logits)


def test_export_lora_merge(base_path, tmp_path):
    from llama_cpp_tpu.tools.export_lora import merge_lora

    lpath = make_adapter(tmp_path)
    out = str(tmp_path / "merged.gguf")
    n = merge_lora(base_path, lpath, out, scale=1.0)
    assert n == 4

    m_rt = load_model(base_path, prefer_quant=False)
    apply_lora(m_rt, load_lora(lpath), scale=1.0)
    rt = logits_of(m_rt)
    merged = logits_of(load_model(out, prefer_quant=False))
    assert np.mean(np.abs(rt - merged)) / (np.mean(np.abs(merged)) + 1e-9) < 0.01


def test_control_vector(base_path, tmp_path):
    w = GGUFWriter()
    w.add("general.type", "adapter")
    w.add("adapter.type", "control_vector")
    rng = np.random.default_rng(3)
    for il in (1, 2):  # reference numbers cvec layers from 1
        d = rng.standard_normal(128).astype(np.float32) * 0.5
        w.add_tensor(f"direction.{il}", d.tobytes(), (128,), GGMLType.F32)
    cpath = str(tmp_path / "cvec.gguf")
    w.write(cpath)

    m = load_model(base_path, prefer_quant=False)
    base_logits = logits_of(m)
    cvec = load_control_vector(cpath, m.cfg.n_layers, m.cfg.n_embd)
    assert cvec.shape == (2, 128) and np.abs(cvec).sum() > 0

    apply_control_vector(m, cvec, strength=1.0)
    steered = logits_of(m)
    assert not np.allclose(steered, base_logits)

    remove_control_vector(m)
    np.testing.assert_allclose(logits_of(m), base_logits)


def test_cvector_generator_end_to_end(base_path, tmp_path):
    """PCA control-vector generation -> loadable, steering GGUF
    (reference tools/cvector-generator)."""
    from llama_cpp_tpu.tools.cvector_generator import (
        collect_layer_means,
        pca_directions,
        write_control_vector,
    )

    m = load_model(base_path, prefer_quant=False, fuse=False)
    pos = collect_layer_means(m, ["aa bb cc", "dd ee", "ff gg hh ii"])
    neg = collect_layer_means(m, ["zz yy", "xx ww vv", "uu tt"])
    assert pos.shape == (3, 2, 128) and np.abs(pos).sum() > 0
    dirs = pca_directions(pos, neg)
    assert dirs.shape == (2, 128)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, rtol=1e-4)

    cpath = str(tmp_path / "gen_cvec.gguf")
    write_control_vector(cpath, dirs)
    cv = load_control_vector(cpath, m.cfg.n_layers, m.cfg.n_embd)
    np.testing.assert_allclose(cv, dirs, rtol=1e-6)

    base_logits = logits_of(m)
    apply_control_vector(m, cv, strength=4.0)
    assert not np.allclose(logits_of(m), base_logits)
