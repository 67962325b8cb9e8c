"""Tokenizer parity tests against the reference's golden vocab fixtures
(models/ggml-vocab-*.gguf + .inp/.out pairs, as used by test-tokenizer-0).
add_special=False, parse_special=False matches the reference test harness.
"""

import glob
import os

import pytest

from llama_cpp_tpu.gguf import read_gguf
from llama_cpp_tpu.tokenizer import Tokenizer
from llama_cpp_tpu.tokenizer.vocab import Vocab

FIXTURE_DIR = "/root/reference/models"

# fixtures our tokenizer families should pass exactly
FIXTURES = [
    "llama-spm",
    "phi-3",
    "gpt-2",
    "mpt",
    "starcoder",
    "refact",
    "deepseek-llm",
    "deepseek-coder",
    "falcon",
    "bert-bge",
]


def load_cases(name):
    inp = open(f"{FIXTURE_DIR}/ggml-vocab-{name}.gguf.inp", encoding="utf-8").read()
    out = open(f"{FIXTURE_DIR}/ggml-vocab-{name}.gguf.out", encoding="utf-8").read()
    texts = inp.split("\n__ggml_vocab_test__\n")
    expected = [
        [int(t) for t in line.split()] for line in out.split("\n")
    ]
    return list(zip(texts, expected))


@pytest.mark.parametrize("name", FIXTURES)
def test_golden_tokenization(name):
    path = f"{FIXTURE_DIR}/ggml-vocab-{name}.gguf"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    f = read_gguf(path)
    tok = Tokenizer.from_gguf(f.metadata)
    cases = load_cases(name)
    bad = []
    for text, expect in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != expect:
            bad.append((text, expect, got))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


@pytest.mark.parametrize("name", ["llama-spm", "gpt-2", "deepseek-llm"])
def test_decode_roundtrip(name):
    path = f"{FIXTURE_DIR}/ggml-vocab-{name}.gguf"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    f = read_gguf(path)
    tok = Tokenizer.from_gguf(f.metadata)
    for text in ["Hello world", "  leading spaces", "tab\tnewline\n", "números àéîõü"]:
        ids = tok.encode(text, add_special=False, parse_special=False)
        back = tok.decode(ids)
        assert back == text, (name, text, ids, back)


def test_special_token_partition():
    v = Vocab(
        model="gpt2",
        tokens=["a", "b", "<s>", "</s>", "ab"],
        merges=["a b"],
        bos_id=2,
        eos_id=3,
        add_bos=False,
    )
    import numpy as np

    v.token_types = np.array([1, 1, 3, 3, 1], dtype=np.int32)
    v.finalize()
    tok = Tokenizer(v)
    ids = tok.encode("<s>ab</s>", add_special=False, parse_special=True)
    # "<s>", merged "ab", "</s>"
    assert ids == [2, 4, 3]
    # with parse_special=False the special text goes through BPE and falls back
    ids2 = tok.encode("ab", add_special=False, parse_special=False)
    assert ids2 == [4]


def test_eog_detection():
    path = f"{FIXTURE_DIR}/ggml-vocab-llama-spm.gguf"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    f = read_gguf(path)
    tok = Tokenizer.from_gguf(f.metadata)
    assert tok.is_eog(tok.eos_id)
    assert not tok.is_eog(100)


def test_plamo2_viterbi_and_byte_fallback():
    """PLaMo-2 tokenizer (reference llm_tokenizer_plamo2, src/llama-vocab
    .cpp:1351): unigram-score Viterbi with UTF-8 byte-token fallback."""
    import numpy as np

    from llama_cpp_tpu.tokenizer import PLaMo2Tokenizer
    from llama_cpp_tpu.tokenizer.vocab import Vocab

    tokens = [f"<0x{i:02X}>" for i in range(256)]
    types = [6] * 256  # BYTE
    extra = [("ab", 1.0), ("abc", 5.0), ("c", 0.5), ("d", 0.1), ("こん", 2.0)]
    for t, _ in extra:
        tokens.append(t)
        types.append(1)
    scores = [0.0] * 256 + [s for _, s in extra]
    v = Vocab(model="plamo2", tokens=tokens,
              scores=np.asarray(scores, dtype=np.float32),
              token_types=np.asarray(types, dtype=np.int32))
    tk = PLaMo2Tokenizer(v)
    # "abc" as one high-score token beats "ab"+"c"
    assert tk.encode_fragment("abc") == [257]
    assert tk.encode_fragment("abcd") == [257, 259]
    # unknown char falls back to UTF-8 byte tokens
    got = tk.encode_fragment("aZ")
    # 'a' unknown alone -> byte; Z -> byte
    assert got == [ord("a"), ord("Z")]
    # multibyte known token
    assert tk.encode_fragment("こん") == [260]
    # multibyte unknown char -> one byte token per UTF-8 byte
    assert tk.encode_fragment("猫") == list("猫".encode("utf-8"))
    # decode round-trips
    assert tk.decode_piece(257) == b"abc"
    assert tk.decode_piece(ord("Z")) == b"Z"
