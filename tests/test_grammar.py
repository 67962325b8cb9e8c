"""GBNF grammar tests (analog of reference tests/test-grammar-parser.cpp and
test-grammar-integration.cpp)."""

import numpy as np
import pytest

from llama_cpp_tpu.sampling.grammar import GBNFParser, GrammarParseError


def parse(text):
    return GBNFParser().parse(text)


def test_simple_literal():
    g = parse('root ::= "ab"')
    assert g.would_accept("ab")
    assert g.would_accept("a")
    assert not g.would_accept("b")
    assert not g.would_accept("abc")


def test_alternates():
    g = parse('root ::= "cat" | "dog"')
    assert g.would_accept("cat")
    assert g.would_accept("dog")
    assert not g.would_accept("cow")


def test_char_ranges():
    g = parse("root ::= [a-z]")
    assert g.would_accept("q")
    assert not g.would_accept("Q")
    g2 = parse("root ::= [^a-z]")
    assert g2.would_accept("Q")
    assert not g2.would_accept("q")


def test_star_repetition():
    g = parse('root ::= "a"* "b"')
    for s in ("b", "ab", "aaab"):
        assert g.would_accept(s), s
    assert not g.would_accept("ba")


def test_plus_and_optional():
    g = parse('root ::= "a"+ "b"?')
    assert g.would_accept("a")
    assert g.would_accept("aab")
    assert not g.would_accept("b")


def test_rule_refs_and_recursion():
    g = parse(
        """
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+ | "(" expr ")"
"""
    )
    for s in ("1", "1+2", "12+(3+4)", "(1)"):
        assert g.would_accept(s), s
    assert not g.would_accept("+1")
    # would_accept checks prefix validity; "1+" is a valid prefix
    assert g.would_accept("1+") is True


def test_bounded_repetition():
    g = parse('root ::= "a"{2,3}')
    assert not g.would_accept("aaaa")
    assert g.would_accept("aa")
    assert g.would_accept("aaa")


def test_accept_advances_state():
    g = parse('root ::= "yes" | "no"')
    assert g.accept_text("y")
    assert g.would_accept("es")
    assert not g.would_accept("o")


def test_is_complete():
    g = parse('root ::= "hi"')
    assert not g.is_complete()
    g.accept_text("hi")
    assert g.is_complete()


def test_missing_root_raises():
    with pytest.raises(GrammarParseError):
        parse('start ::= "x"')


def test_undefined_rule_raises():
    with pytest.raises(GrammarParseError):
        parse("root ::= missing")


def test_json_like_grammar():
    g = parse(
        r"""
root ::= object
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}"
value ::= object | array | string | number | "true" | "false" | "null"
array ::= "[" ws ( value ("," ws value)* )? "]"
string ::= "\"" [^"]* "\""
number ::= "-"? [0-9]+ ("." [0-9]+)?
ws ::= [ \t\n]*
"""
    )
    assert g.would_accept('{"a": 1}')
    assert g.would_accept('{"a": [1, 2], "b": {"c": "d"}}')
    assert not g.would_accept("[1]")
    assert not g.would_accept('{"a" 1}')


def test_lazy_trigger_token():
    """Lazy grammar (include/llama.h:1415-1422): dormant until a trigger
    token fires, then constrains from that token onward."""
    from llama_cpp_tpu.sampling.grammar import GrammarSampler

    class FakeTok:
        pieces = {0: "x", 1: "<tool>", 2: "a", 3: "b", 4: "</eog>"}

        def piece(self, t):
            return self.pieces[t]

        def is_eog(self, t):
            return t == 4

    g = 'root ::= "<tool>" "a" "b"'
    gs = GrammarSampler(g, FakeTok(), lazy=True, trigger_tokens=(1,))
    logits = np.zeros(5, dtype=np.float32)
    # dormant: nothing masked
    out = gs.filter_logits(logits.copy())
    assert np.isfinite(out).all()
    gs.accept(0)  # free text, still dormant
    assert gs.awaiting
    gs.accept(1)  # trigger token -> grammar fed "<tool>"
    assert not gs.awaiting
    out = gs.filter_logits(logits.copy())
    assert np.isfinite(out[2]) and np.isneginf(out[3])  # only "a" legal now


def test_lazy_trigger_pattern_capture_group():
    from llama_cpp_tpu.sampling.grammar import GrammarSampler

    class FakeTok:
        pieces = {0: "I think ", 1: "<call>", 2: "a", 3: "b", 4: ""}

        def piece(self, t):
            return self.pieces[t]

        def is_eog(self, t):
            return t == 4

    g = 'root ::= "<call>ab"'
    gs = GrammarSampler(
        g, FakeTok(), lazy=True,
        trigger_patterns=(r".*?(<call>[\s\S]*)",))
    gs.accept(0)
    assert gs.awaiting
    gs.accept(1)  # buffer "I think <call>" matches; grammar fed "<call>"
    assert not gs.awaiting
    logits = np.zeros(5, dtype=np.float32)
    out = gs.filter_logits(logits.copy())
    assert np.isfinite(out[2]) and np.isneginf(out[3])
