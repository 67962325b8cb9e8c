"""MCP client manager (reference tools/server/server-mcp.cpp) + webui and
/tools endpoints. Spawns a real MCP server child process speaking JSON-RPC
over stdio NDJSON."""

import json
import sys
import textwrap

import pytest

from llama_cpp_tpu.server.mcp import McpClient, McpError, McpManager

# a minimal MCP server: initialize, tools/list (echo + fail), tools/call
MCP_SERVER = textwrap.dedent(
    """
    import json, sys
    for line in sys.stdin:
        msg = json.loads(line)
        m, mid = msg.get("method"), msg.get("id")
        if m == "initialize":
            out = {"jsonrpc": "2.0", "id": mid, "result": {
                "protocolVersion": "2024-11-05",
                "serverInfo": {"name": "echo-mcp", "version": "0.1"},
                "capabilities": {"tools": {}}}}
        elif m == "notifications/initialized":
            continue
        elif m == "tools/list":
            out = {"jsonrpc": "2.0", "id": mid, "result": {"tools": [
                {"name": "echo", "description": "echo text back",
                 "inputSchema": {"type": "object",
                                 "properties": {"text": {"type": "string"}}}},
                {"name": "fail", "description": "always errors",
                 "inputSchema": {"type": "object"}}]}}
        elif m == "tools/call":
            p = msg["params"]
            if p["name"] == "echo":
                out = {"jsonrpc": "2.0", "id": mid, "result": {
                    "content": [{"type": "text",
                                 "text": "echo: " + p["arguments"]["text"]}]}}
            else:
                out = {"jsonrpc": "2.0", "id": mid, "result": {
                    "content": [{"type": "text", "text": "boom"}],
                    "isError": True}}
        else:
            out = {"jsonrpc": "2.0", "id": mid,
                   "error": {"code": -32601, "message": "no method " + str(m)}}
        sys.stdout.write(json.dumps(out) + "\\n")
        sys.stdout.flush()
    """
)


@pytest.fixture()
def mcp_cmd(tmp_path):
    srv = tmp_path / "mcp_srv.py"
    srv.write_text(MCP_SERVER)
    return f"{sys.executable} {srv}"


def test_mcp_client_lifecycle(mcp_cmd):
    cl = McpClient(mcp_cmd, timeout=10)
    cl.start()
    try:
        assert cl.server_info.get("name") == "echo-mcp"
        assert [t["name"] for t in cl.tools] == ["echo", "fail"]
        r = cl.call("echo", {"text": "hi"})
        assert r["content"][0]["text"] == "echo: hi"
    finally:
        cl.shutdown()


def test_mcp_manager_normalization(mcp_cmd):
    mgr = McpManager()
    mgr.start([mcp_cmd], timeout=10)
    try:
        assert not mgr.empty
        defs = mgr.definitions()
        assert {d["name"] for d in defs} == {"echo", "fail"}
        assert all(d["type"] == "mcp" for d in defs)
        out = mgr.call("echo", {"text": "x"})
        assert out == {"output": "echo: x", "is_error": False}
        out = mgr.call("fail", {})
        assert out["is_error"] is True
        with pytest.raises(McpError):
            mgr.call("nope", {})
    finally:
        mgr.shutdown()


def test_mcp_manager_bad_command():
    mgr = McpManager()
    mgr.start([f"{sys.executable} -c 'import sys; sys.exit(1)'"], timeout=3)
    assert mgr.empty  # failed child skipped, serving continues
    mgr.shutdown()


def test_webui_and_tools_endpoints(mcp_cmd):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    import jax.numpy as jnp
    from llama_cpp_tpu.models.loader import load_model
    from llama_cpp_tpu.runtime.context import Context
    from llama_cpp_tpu.server.app import ServerApp
    from llama_cpp_tpu.server.scheduler import Scheduler
    from llama_cpp_tpu.testing import make_tiny_llama_gguf

    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "tiny.gguf")
    make_tiny_llama_gguf(path, vocab_size=300, n_layers=1, n_embd=64,
                         n_heads=4, n_kv_heads=2, n_ff=128)
    model = load_model(path, prefer_quant=False, dense_dtype=jnp.float32)
    ctx = Context(model, n_ctx=64, n_seqs=1, n_ubatch=16)
    sched = Scheduler(ctx)
    sched.start()
    mgr = McpManager()
    mgr.start([mcp_cmd], timeout=10)

    async def go():
        sapp = ServerApp(sched, model_name="tiny")
        sapp.mcp = mgr
        client = TestClient(TestServer(sapp.app))
        await client.start_server()
        try:
            r = await client.get("/")
            html = await r.text()
            assert r.status == 200 and "llama.cpp-tpu" in html

            r = await client.get("/tools")
            j = await r.json()
            assert {t["name"] for t in j["tools"]} == {"echo", "fail"}

            r = await client.post("/tools/call",
                                  json={"name": "echo",
                                        "arguments": {"text": "y"}})
            assert (await r.json())["output"] == "echo: y"

            r = await client.post("/tools/call", json={"name": "zzz"})
            assert r.status == 400
        finally:
            await client.close()

    try:
        asyncio.new_event_loop().run_until_complete(go())
    finally:
        mgr.shutdown()
        sched.stop()
