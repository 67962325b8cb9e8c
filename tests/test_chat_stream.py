"""Streaming PEG chat parsing (reference common/peg-parser.cpp +
chat-peg-parser.cpp + common_chat_msg_diff). Invariants tested:

- accumulated streamed deltas == one-shot final parse, for every format,
  regardless of chunk boundaries (char-by-char worst case);
- no partial tool-call marker ever leaks into content deltas;
- tool-call argument deltas concatenate to the exact argument JSON;
- partial JSON scanner semantics (NEED_MORE_INPUT vs FAIL).
"""

import json

import pytest

from llama_cpp_tpu.server import peg
from llama_cpp_tpu.server.chat_parser import (ParsedMsg, StreamingChatParser,
                                              compute_diffs, detect_format)


def drive(fmt: str, text: str, chunk: int = 1):
    """Feed text in `chunk`-sized pieces; return (accumulated, final_msg)."""
    p = StreamingChatParser(fmt)
    acc = {"content": "", "reasoning": "", "tools": {}}

    def absorb(diffs):
        for d in diffs:
            acc["content"] += d.get("content", "")
            acc["reasoning"] += d.get("reasoning_content", "")
            for tc in d.get("tool_calls", []):
                e = acc["tools"].setdefault(tc["index"], {"name": "", "args": ""})
                fn = tc.get("function", {})
                if fn.get("name"):
                    e["name"] = fn["name"]
                e["args"] += fn.get("arguments", "")

    for i in range(0, len(text), chunk):
        absorb(p.put(text[i : i + chunk]))
    absorb(p.finish())
    return acc, p.result


# ---------------------------------------------------------------------------
# peg primitives


def test_lit_partial_prefix():
    st, _ = peg.parse(peg.lit("<tool_call>"), "<tool", at_end=False)
    assert st == peg.PARTIAL
    st, _ = peg.parse(peg.lit("<tool_call>"), "<tool", at_end=True)
    assert st == peg.FAIL
    st, _ = peg.parse(peg.lit("<tool_call>"), "<tool_call>", at_end=False)
    assert st == peg.OK


def test_until_withholds_marker_prefix():
    # "hello <to" could be content + the start of "<tool_call>"
    g = peg.tag("content", peg.until("<tool_call>"))
    st, root = peg.parse(g, "hello <to", at_end=False)
    assert st == peg.PARTIAL
    assert root.children[0].text == "hello "
    st, root = peg.parse(g, "hello <to", at_end=True)
    assert st == peg.OK
    assert root.children[0].text == "hello <to"


def test_json_scan_partial():
    assert peg._scan_json('{"a": [1, 2', 0, False)[0] == peg.PARTIAL
    assert peg._scan_json('{"a": [1, 2', 0, True)[0] == peg.FAIL
    st, end = peg._scan_json('{"a": 1} tail', 0, False)
    assert st == peg.OK and end == 8
    assert peg._scan_json('"unterminated', 0, False)[0] == peg.PARTIAL
    st, end = peg._scan_json('"with \\" quote"', 0, True)
    assert st == peg.OK and end == 15


# ---------------------------------------------------------------------------
# formats, streamed char-by-char


HERMES = (
    "<think>plan the call</think>Let me check.\n"
    '<tool_call>{"name": "get_weather", "arguments": {"city": "Paris", '
    '"units": "C"}}</tool_call>\nDone.'
)


@pytest.mark.parametrize("chunk", [1, 3, 7, 1000])
def test_hermes_stream(chunk):
    acc, msg = drive("hermes", HERMES, chunk)
    assert acc["reasoning"] == "plan the call"
    assert "tool_call" not in acc["content"] and "<" not in acc["content"].replace("", "")
    assert acc["tools"][0]["name"] == "get_weather"
    assert json.loads(acc["tools"][0]["args"]) == {"city": "Paris", "units": "C"}
    assert len(msg.tool_calls) == 1
    assert msg.tool_calls[0].name == "get_weather"


def test_hermes_args_stream_incrementally():
    """Argument deltas must start flowing BEFORE the call completes."""
    p = StreamingChatParser("hermes")
    text = '<tool_call>{"name": "search", "arguments": {"q": "a very long query string"}}'
    got_args_early = False
    for i in range(0, len(text), 4):
        diffs = p.put(text[i : i + 4])
        for d in diffs:
            for tc in d.get("tool_calls", []):
                if tc.get("function", {}).get("arguments") and i < len(text) - 8:
                    got_args_early = True
    p.finish()
    assert got_args_early
    assert p.result.tool_calls[0].name == "search"


def test_llama3_bare_json():
    text = '{"name": "lookup", "parameters": {"key": "x"}}'
    acc, msg = drive("llama3", text, 2)
    assert msg.tool_calls and msg.tool_calls[0].name == "lookup"
    assert json.loads(acc["tools"][0]["args"] or msg.tool_calls[0].arguments)


def test_llama3_python_tag():
    text = '<|python_tag|>{"name": "run", "parameters": {"code": "1+1"}}<|eom_id|>'
    _, msg = drive("llama3", text, 5)
    assert msg.tool_calls[0].name == "run"


def test_llama3_plain_content():
    _, msg = drive("llama3", "Just a normal answer.", 3)
    assert msg.content == "Just a normal answer."
    assert not msg.tool_calls


def test_functionary_segments():
    text = '>>>get_time\n{"tz": "UTC"}\n>>>get_date\n{"fmt": "iso"}'
    acc, msg = drive("functionary", text, 1)
    assert [t.name for t in msg.tool_calls] == ["get_time", "get_date"]
    assert json.loads(msg.tool_calls[0].arguments) == {"tz": "UTC"}
    assert acc["tools"][1]["name"] == "get_date"


def test_functionary_function_block():
    text = 'ok<function=calc>{"expr": "2*3"}</function>'
    _, msg = drive("functionary", text, 2)
    assert msg.tool_calls[0].name == "calc"
    assert msg.content.strip() == "ok"


def test_xml_invoke():
    text = (
        "I'll check.<tool_call><invoke name=\"weather\">"
        '<parameter name="city">Tokyo</parameter>'
        '<parameter name="days">3</parameter>'
        "</invoke></tool_call>"
    )
    acc, msg = drive("xml_invoke", text, 1)
    assert msg.tool_calls[0].name == "weather"
    assert json.loads(msg.tool_calls[0].arguments) == {"city": "Tokyo", "days": 3}
    assert "invoke" not in acc["content"]
    assert acc["content"].startswith("I'll check.")


def test_generic_reasoning_stream():
    text = "<think>step one\nstep two</think>The answer is 42."
    acc, msg = drive("generic", text, 1)
    assert acc["reasoning"] == "step one\nstep two"
    assert acc["content"] == "The answer is 42."
    assert msg.reasoning == "step one\nstep two"


def test_stream_equals_oneshot_all_formats():
    cases = [
        ("hermes", HERMES),
        ("llama3", '{"name": "f", "parameters": {}}'),
        ("functionary", '>>>g\n{"a": 1}'),
        ("generic", "<think>r</think>c"),
        ("xml_invoke", '<tool_call><invoke name="t"><parameter name="x">1</parameter></invoke></tool_call>'),
    ]
    for fmt, text in cases:
        one = StreamingChatParser(fmt)
        one.put(text)
        one.finish()
        for chunk in (1, 2, 5):
            p = StreamingChatParser(fmt)
            for i in range(0, len(text), chunk):
                p.put(text[i : i + chunk])
            p.finish()
            assert p.result.content == one.result.content, (fmt, chunk)
            assert p.result.reasoning == one.result.reasoning, (fmt, chunk)
            assert [(t.name, t.arguments) for t in p.result.tool_calls] == [
                (t.name, t.arguments) for t in one.result.tool_calls
            ], (fmt, chunk)


def test_compute_diffs_semantics():
    prev = ParsedMsg(content="he", tool_calls=[])
    new = ParsedMsg(content="hello")
    (d,) = compute_diffs(prev, new)
    assert d == {"content": "llo"}
    # growing last tool call args
    from llama_cpp_tpu.server.chat_parser import ToolCall

    prev = ParsedMsg(tool_calls=[ToolCall(id="i", name="f", arguments='{"a')])
    new = ParsedMsg(tool_calls=[ToolCall(id="i", name="f", arguments='{"a": 1}')])
    (d,) = compute_diffs(prev, new)
    assert d["tool_calls"][0]["function"]["arguments"] == '": 1}'


def test_detect_format():
    assert detect_format("...<tool_call>{{...}}</tool_call>...") == "hermes"
    assert detect_format("<|start_header_id|>assistant") == "llama3"
    assert detect_format('x <invoke name="f">') == "xml_invoke"
    assert detect_format(None) == "generic"
    assert detect_format("{% for m in messages %}") == "generic"
