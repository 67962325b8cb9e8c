"""Tool-level tests: quantize (e2e requant), imatrix collection, gguf-split,
perplexity harness sanity, CLI arg parsing."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.gguf import read_gguf
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.testing import make_tiny_llama_gguf
from llama_cpp_tpu.tools.gguf_split import merge, split
from llama_cpp_tpu.tools.imatrix import collect_imatrix
from llama_cpp_tpu.tools.perplexity import perplexity
from llama_cpp_tpu.tools.quantize_tool import quantize_model


@pytest.fixture(scope="module")
def f32_model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tools") / "m.gguf")
    make_tiny_llama_gguf(path, vocab_size=300, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=256, ftype="f32")
    return path


def test_quantize_roundtrip(f32_model_path, tmp_path):
    dst = str(tmp_path / "q8.gguf")
    stats = quantize_model(f32_model_path, dst, "q8_0")
    assert stats["out_bytes"] < stats["in_bytes"]
    # requantized model must still run and agree approximately
    m32 = load_model(f32_model_path, prefer_quant=False, dense_dtype=jnp.float32)
    m8 = load_model(dst)
    c32 = Context(m32, n_ctx=32)
    c8 = Context(m8, n_ctx=32)
    l32 = c32.prefill([1, 5, 9])
    l8 = c8.prefill([1, 5, 9])
    rel = np.mean(np.abs(l32 - l8)) / (np.mean(np.abs(l32)) + 1e-9)
    assert rel < 0.05, rel


def test_quantize_k_quant_with_heuristics(f32_model_path, tmp_path):
    dst = str(tmp_path / "q4k.gguf")
    stats = quantize_model(f32_model_path, dst, "q4_k_m")
    f = read_gguf(dst)
    # norm stays f32; ffn_down (n_ff=256-divisible) quantized
    assert f.tensors["blk.0.attn_norm.weight"].dtype.name == "F32"
    assert f.tensors["blk.0.ffn_down.weight"].dtype.name in ("Q4_K", "Q6_K")
    # token_embd n_embd=64 not 256-divisible -> f32
    assert f.tensors["token_embd.weight"].dtype.name == "F32"


def test_imatrix_collection_and_weighted_quant(f32_model_path, tmp_path):
    model = load_model(f32_model_path, prefer_quant=False, dense_dtype=jnp.float32)
    tokens = list(np.random.default_rng(0).integers(3, 290, 64))
    coll = collect_imatrix(model, tokens, n_ctx=32)
    result = coll.result()
    assert "blk.0.ffn_down.weight" in result
    assert result["blk.0.ffn_down.weight"].shape == (256,)
    assert (result["blk.0.ffn_down.weight"] >= 0).all()
    # weighted quantization path runs
    dst = str(tmp_path / "q4k_im.gguf")
    quantize_model(f32_model_path, dst, "q4_k_m", imatrix=result)
    assert read_gguf(dst).tensors["blk.0.ffn_down.weight"].dtype.name in ("Q4_K", "Q6_K")


def test_gguf_split_merge(f32_model_path, tmp_path):
    prefix = str(tmp_path / "shard")
    paths = split(f32_model_path, prefix, max_tensors=5)
    assert len(paths) > 1
    f = read_gguf(paths[0])  # reader follows shards
    orig = read_gguf(f32_model_path)
    assert set(f.tensors) == set(orig.tensors)
    merged = str(tmp_path / "merged.gguf")
    merge(paths[0], merged)
    fm = read_gguf(merged)
    assert set(fm.tensors) == set(orig.tensors)
    np.testing.assert_array_equal(
        np.asarray(fm.tensors["token_embd.weight"].data),
        np.asarray(orig.tensors["token_embd.weight"].data),
    )


def test_perplexity_harness(f32_model_path):
    model = load_model(f32_model_path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=32, n_ubatch=16)
    tokens = list(np.random.default_rng(1).integers(3, 290, 96))
    res = perplexity(ctx, tokens=tokens, n_ctx=32)
    assert res.ppl > 1.0
    assert res.n_tokens > 0
    assert np.isfinite(res.ppl)


def test_cli_parser():
    from llama_cpp_tpu.tools.cli import build_parser

    args = build_parser().parse_args(["-m", "x.gguf", "-p", "hi", "--temp", "0"])
    assert args.model == "x.gguf" and args.temp == 0.0


def test_multiple_choice_and_winogrande(tmp_path):
    import jax.numpy as jnp

    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.testing import make_tiny_llama_gguf
    from llama_cpp_tpu.tools.perplexity import (
        multiple_choice_score,
        winogrande_score,
    )

    p = str(tmp_path / "mc.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=1, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    ctx = Context(load_model(p, prefer_quant=False), n_ctx=64, n_seqs=1)
    tasks = [
        {"context": "ab cd", "endings": ["x", "yz", "qq", "w"], "label": 1},
        {"context": "hello", "endings": ["a", "b", "c", "d"], "label": 0},
    ]
    res = multiple_choice_score(ctx, tasks)
    assert res["n_tasks"] == 2 and 0.0 <= res["accuracy"] <= 1.0

    wtasks = [{"sentence": "the cat _ sat", "option1": "a", "option2": "bb",
               "answer": 2}]
    res = winogrande_score(ctx, wtasks)
    assert res["n_tasks"] == 1


def test_memory_fit(tmp_path):
    import jax.numpy as jnp

    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.fit import fit_context, weights_bytes
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    p = str(tmp_path / "fit.gguf")
    make_tiny_llama_gguf(p, vocab_size=256, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    m = load_model(p, prefer_quant=False)
    assert weights_bytes(m.params) > 0

    rep = fit_context(m, n_ctx=4096, n_seqs=1, free_bytes=1 << 30)
    assert rep.fits and rep.n_ctx == 4096

    # tiny budget forces a clamp
    tight = weights_bytes(m.params) + 3_000_000
    rep2 = fit_context(m, n_ctx=65536, n_seqs=4, free_bytes=tight)
    assert rep2.n_ctx < 65536


def test_env_and_preset_args(tmp_path, monkeypatch):
    import argparse

    from llama_cpp_tpu.tools.args import apply_env_and_preset, env_name

    assert env_name("--ctx-size") == "LLAMA_ARG_CTX_SIZE"

    def parser():
        ap = argparse.ArgumentParser()
        ap.add_argument("-c", "--ctx-size", type=int, default=2048)
        ap.add_argument("--temp", type=float, default=0.8)
        ap.add_argument("--kv-quant", action="store_true")
        return ap

    # env mirror
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "512")
    monkeypatch.setenv("LLAMA_ARG_KV_QUANT", "1")
    a = apply_env_and_preset(parser(), [])
    assert a.ctx_size == 512 and a.kv_quant is True

    # preset file; explicit flag still wins
    pf = tmp_path / "p.json"
    pf.write_text('{"temp": 0.1, "ctx_size": 1024}')
    monkeypatch.delenv("LLAMA_ARG_CTX_SIZE")
    a = apply_env_and_preset(parser(), ["--preset", str(pf), "--temp", "0.5"])
    assert a.ctx_size == 1024 and a.temp == 0.5


def test_logging_setup(tmp_path, capsys):
    """common/log analog: verbosity thresholds, level letters, file sink."""
    import io

    from llama_cpp_tpu.utils.logging import get_logger, setup_logging

    buf = io.StringIO()
    setup_logging(verbosity=0, colors="off", stream=buf,
                  logfile=str(tmp_path / "log.txt"), timestamps=False)
    log = get_logger("test")
    log.debug("hidden at info level")
    log.info("hello %d", 42)
    log.error("boom")
    out = buf.getvalue()
    assert "hello 42" in out and "boom" in out
    assert "hidden" not in out
    assert out.splitlines()[0].startswith("I test:")
    assert "E test: boom" in out
    ftxt = (tmp_path / "log.txt").read_text()
    assert "hello 42" in ftxt

    buf2 = io.StringIO()
    setup_logging(verbosity=-1, colors="on", stream=buf2)
    log.info("quiet")
    log.error("loud")
    out2 = buf2.getvalue()
    assert "quiet" not in out2 and "loud" in out2
    assert "\033[31m" in out2  # error colored red
    setup_logging(verbosity=0, colors="off")  # reset for other tests


def test_eval_callback_dump(tmp_path, capsys):
    """eval-callback analog: per-op tensor dump with corner elision + sum
    (reference examples/eval-callback + common/debug.cpp)."""
    from llama_cpp_tpu.testing import make_tiny_llama_gguf
    from llama_cpp_tpu.tools.eval_callback import (format_tensor,
                                                   run_eval_callback)

    txt = format_tensor(np.arange(24, dtype=np.float32).reshape(2, 12), n=2)
    assert "..." in txt and "sum = 276" in txt

    p = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(p, vocab_size=128, n_layers=2, n_embd=32,
                         n_heads=2, n_kv_heads=2, n_ff=64, ftype="f32")
    import io

    out = io.StringIO()
    caps = run_eval_callback(p, [3, 5, 7], keys={"l_in", "l_out"}, n=2,
                             out=out)
    assert caps and all(k in ("l_in", "l_out") for _, k, _a in caps)
    # layer ids 0..n_layers-1 plus the pre-output-norm row (id n_layers,
    # the reference's embeddings-nextn extraction point)
    assert {il for il, _, _ in caps} == {0, 1, 2}
    s = out.getvalue()
    assert "blk.0.l_in" in s and "sum =" in s


def test_tokenize_tool(tmp_path, capsys):
    """llama-tokenize analog: ids + pieces + count, vocab-only load."""
    from llama_cpp_tpu.testing import make_tiny_llama_gguf
    from llama_cpp_tpu.tools.tokenize import main as tok_main

    p = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(p, vocab_size=128, n_layers=1, n_embd=32,
                         n_heads=2, n_kv_heads=2, n_ff=64, ftype="f32")
    ids = tok_main(["-m", p, "-p", "ab", "--show-count"])
    out = capsys.readouterr().out
    assert ids and f"Total number of tokens: {len(ids)}" in out
    assert "->" in out
    ids2 = tok_main(["-m", p, "-p", "ab", "--ids"])
    out2 = capsys.readouterr().out
    assert out2.strip().startswith("[") and str(ids2[0]) in out2
