"""EAGLE3 speculative decoding (reference common/speculative.cpp
'draft-eagle3' + src/models/eagle3.cpp).

The spec-decoding contract: greedy output through the EAGLE3 drafting path
must be token-identical to plain greedy decode — acceptance is a pure
optimization. Also checks the feature plumbing end-to-end: target layer-
input capture (decode aux), fc fusion, deferred-boundary bookkeeping."""

import numpy as np
import pytest

from llama_cpp_tpu.models.eagle3 import Eagle3Speculator
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.runtime.speculative import speculative_generate
from llama_cpp_tpu.testing import make_tiny_eagle3_gguf, make_tiny_llama_gguf

PROMPT = [5, 9, 23, 9, 23, 9, 23, 42]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("eagle3")
    tp = str(d / "target.gguf")
    dp = str(d / "draft.gguf")
    make_tiny_llama_gguf(tp, vocab_size=256, n_layers=3, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    # extract layers 0/2/3: 3 == n_layers exercises the pre-output-norm
    # (embeddings_nextn) row
    make_tiny_eagle3_gguf(dp, target_layers=(0, 2, 3), n_embd_tgt=64,
                          n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128,
                          vocab_size=256)
    tgt = load_model(tp, prefer_quant=False)
    dft = load_model(dp, prefer_quant=False)
    return tgt, dft


def test_eagle3_loads(pair):
    tgt, dft = pair
    assert dft.cfg.arch == "eagle3"
    assert dft.cfg.extra["target_layers"] == (0, 2, 3)
    assert "fc" in dft.params
    lw = dft.params["layers"][0]
    assert "attn_norm_2" in lw


def test_aux_capture_shapes(pair):
    tgt, _ = pair
    ctx = Context(tgt, n_ctx=64, n_seqs=1)
    ctx.set_aux_capture((0, 2, 3))
    toks = np.asarray([[5, 9, 23]], np.int32)
    pos = np.asarray([[0, 1, 2]], np.int32)
    logits, feats = ctx.decode(toks, np.asarray([0]), pos,
                               np.asarray([2]), aux=True)
    assert logits.shape == (1, tgt.cfg.vocab_size)
    assert feats.shape == (1, 3, 3 * tgt.cfg.n_embd)
    # layer-0 input is the raw embedding stream: finite, non-zero
    f0 = np.asarray(feats[0, :, : tgt.cfg.n_embd])
    assert np.isfinite(f0).all() and np.abs(f0).max() > 0


def test_eagle3_greedy_identical(pair):
    tgt, dft = pair
    ref = Context(tgt, n_ctx=128, n_seqs=1).generate(
        PROMPT, max_new_tokens=20)

    ctx = Context(tgt, n_ctx=128, n_seqs=1)
    spec = Eagle3Speculator(dft, tgt, n_ctx=128)
    out, stats = speculative_generate(ctx, spec, PROMPT,
                                      max_new_tokens=20, n_draft=4)
    assert out == ref, f"{out} != {ref}"
    assert stats["n_draft"] > 0  # the drafting path actually ran
    assert stats["n_steps"] > 0


def test_eagle3_d2t_vocab_map(tmp_path):
    """A d2t-mapped draft (smaller draft vocab) still yields identical
    greedy output: drafted ids are target-vocab ids via the map."""
    tp = str(tmp_path / "t.gguf")
    dp = str(tmp_path / "d.gguf")
    make_tiny_llama_gguf(tp, vocab_size=256, n_layers=2, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128, ftype="f32")
    make_tiny_eagle3_gguf(dp, target_layers=(0, 1, 2), n_embd_tgt=64,
                          n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128,
                          vocab_size=128, embd_vocab=256)
    # append a d2t tensor mapping draft ids -> even target ids
    from llama_cpp_tpu.gguf.reader import read_gguf

    f = read_gguf(dp)
    from llama_cpp_tpu.gguf.constants import GGMLType
    from llama_cpp_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter()
    for k, v in f.metadata.items():
        w.add(k, v)
    for name, info in f.tensors.items():
        w.add_tensor(name, np.asarray(info.data).tobytes(),
                     tuple(reversed(info.shape)), info.dtype)
    d2t = (np.arange(128, dtype=np.int64) * 2) % 256
    w.add_tensor("d2t", d2t.tobytes(), (128,), GGMLType.I64)
    w.write(dp)

    tgt = load_model(tp, prefer_quant=False)
    dft = load_model(dp, prefer_quant=False)
    assert dft.params.get("d2t") is not None

    ref = Context(tgt, n_ctx=128, n_seqs=1).generate(PROMPT, max_new_tokens=12)
    ctx = Context(tgt, n_ctx=128, n_seqs=1)
    spec = Eagle3Speculator(dft, tgt, n_ctx=128)
    out, stats = speculative_generate(ctx, spec, PROMPT,
                                      max_new_tokens=12, n_draft=3)
    assert out == ref


def test_eagle3_through_scheduler(pair):
    """EAGLE3 drafting through the continuous-batching scheduler yields
    greedy output identical to a scheduler without speculation, and the
    draft counters move."""
    import threading

    from llama_cpp_tpu.models.eagle3 import Eagle3Speculator
    from llama_cpp_tpu.sampling.samplers import SamplingParams
    from llama_cpp_tpu.server.scheduler import GenTask, Scheduler

    tgt, dft = pair

    def serve(spec):
        ctx = Context(tgt, n_ctx=128, n_seqs=2)
        factory = (lambda i: Eagle3Speculator(dft, tgt, n_ctx=128)) if spec \
            else None
        sched = Scheduler(ctx, spec_factory=factory, n_draft=4)
        sched.start()
        outs = {}
        evs = []
        try:
            for rid, prompt in (("a", PROMPT), ("b", [7, 3, 88, 11, 6])):
                ev = threading.Event()
                evs.append(ev)

                def done(res, rid=rid, ev=ev):
                    outs[rid] = res["tokens"]
                    ev.set()

                sched.submit(GenTask(prompt_ids=prompt,
                                     params=SamplingParams(temp=0.0),
                                     max_tokens=12, done_cb=done))
            for ev in evs:
                assert ev.wait(timeout=300), "generation timed out"
        finally:
            sched.stop()
        return outs, dict(sched.metrics)

    ref, _ = serve(False)
    got, metrics = serve(True)
    assert ref == got
    assert metrics["draft_tokens_total"] > 0
