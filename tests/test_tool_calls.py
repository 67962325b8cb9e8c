"""Tool-call extraction parity (reference common/chat-peg-parser formats)."""

import json

from llama_cpp_tpu.server.tool_calls import parse_tool_calls


def test_hermes_tool_call_block():
    text = 'thinking...\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "Paris"}}\n</tool_call>'
    content, calls = parse_tool_calls(text)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}
    assert "tool_call" not in content


def test_bare_json_object():
    text = '{"name": "search", "arguments": {"q": "llamas"}}'
    content, calls = parse_tool_calls(text)
    assert len(calls) == 1 and calls[0]["function"]["name"] == "search"
    assert content == ""


def test_json_array_of_calls():
    text = '[{"name": "a", "arguments": {}}, {"name": "b", "arguments": {"x": 1}}]'
    _, calls = parse_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_python_tag_llama3():
    text = 'prefix<|python_tag|>{"name": "calc", "arguments": {"e": "1+1"}}<|eom_id|>'
    content, calls = parse_tool_calls(text)
    assert calls and calls[0]["function"]["name"] == "calc"
    assert content == "prefix"


def test_functionary_function_block():
    text = '<function=lookup>{"key": "v"}</function>'
    _, calls = parse_tool_calls(text)
    assert calls[0]["function"]["name"] == "lookup"


def test_plain_text_no_calls():
    content, calls = parse_tool_calls("just a normal answer about { life }")
    assert calls == []
    assert "life" in content
