"""Tokenizer golden parity against the reference's committed vocab fixtures
(reference tests/CMakeLists.txt:122-136 wiring of test-tokenizer-0 over
models/ggml-vocab-*.gguf with .inp/.out pairs). Each case tokenizes with
add_special=false, parse_special=false (test-tokenizer-0.cpp:196) and must
match the reference token ids exactly."""

import os

import pytest

from llama_cpp_tpu.gguf.reader import read_gguf
from llama_cpp_tpu.tokenizer import Tokenizer

FIXDIR = "/root/reference/models"

SEP = "__ggml_vocab_test__"


def _families():
    if not os.path.isdir(FIXDIR):
        return []
    out = []
    for f in sorted(os.listdir(FIXDIR)):
        if f.startswith("ggml-vocab-") and f.endswith(".gguf"):
            base = os.path.join(FIXDIR, f)
            if os.path.exists(base + ".inp") and os.path.exists(base + ".out"):
                out.append(f[len("ggml-vocab-"):-len(".gguf")])
    return out


def _load_cases(base):
    with open(base + ".inp", encoding="utf-8") as f:
        raw = f.read()
    inputs = raw.split(SEP + "\n")
    # trailing separator leaves an empty tail entry
    inputs = [s[:-1] if s.endswith("\n") else s for s in inputs]
    if inputs and inputs[-1] == "":
        inputs.pop()
    with open(base + ".out", encoding="utf-8") as f:
        outs = [[int(t) for t in line.split()] for line in f.read().splitlines()]
    assert len(inputs) == len(outs), (len(inputs), len(outs))
    return list(zip(inputs, outs))


@pytest.mark.parametrize("family", _families())
def test_golden_vocab(family):
    base = os.path.join(FIXDIR, f"ggml-vocab-{family}.gguf")
    r = read_gguf(base)
    try:
        tok = Tokenizer.from_gguf(r.metadata)
    except ValueError as e:
        pytest.skip(f"unsupported vocab: {e}")
    fails = []
    cases = _load_cases(base)
    for text, want in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            fails.append((text, want, got))
    assert not fails, (
        f"{family}: {len(fails)}/{len(cases)} mismatches; first: "
        f"{fails[0]!r}")
