"""HTTP server: OpenAI + Anthropic compatible API over the continuous-batching
scheduler.

Endpoint parity with reference llama-server (tools/server/server.cpp:226-291):
/v1/chat/completions, /v1/completions, /v1/embeddings, /v1/models, Anthropic
/v1/messages, /tokenize, /detokenize, /health, /props, /metrics (Prometheus),
/slots. SSE streaming for chat/completions/messages.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any

from aiohttp import web

from ..sampling.samplers import SamplingParams
from .chat import apply_chat_template
from .chat_parser import StreamingChatParser, detect_format
from .scheduler import GenTask, Scheduler


def _sampling_from_request(body: dict[str, Any],
                           model_md: dict | None = None) -> SamplingParams:
    p = SamplingParams()
    if model_md:
        # model-embedded defaults (general.sampling.*, llama-arch.cpp:157)
        # seed per-request knobs; explicit request fields still win below
        p = p.apply_gguf_defaults(model_md)
    p.temp = float(body.get("temperature", p.temp))
    p.top_p = float(body.get("top_p", p.top_p))
    p.top_k = int(body.get("top_k", p.top_k))
    p.min_p = float(body.get("min_p", p.min_p))
    p.typical_p = float(body.get("typical_p", p.typical_p))
    p.penalty_repeat = float(body.get("repeat_penalty", p.penalty_repeat))
    p.penalty_freq = float(body.get("frequency_penalty", 0.0))
    p.penalty_present = float(body.get("presence_penalty", 0.0))
    p.penalty_last_n = int(body.get("repeat_last_n", p.penalty_last_n))
    p.dry_multiplier = float(body.get("dry_multiplier", 0.0))
    p.xtc_probability = float(body.get("xtc_probability", 0.0))
    p.mirostat = int(body.get("mirostat", 0))
    p.mirostat_tau = float(body.get("mirostat_tau", p.mirostat_tau))
    p.mirostat_eta = float(body.get("mirostat_eta", p.mirostat_eta))
    p.adaptive_target = float(body.get("adaptive_target", p.adaptive_target))
    p.adaptive_decay = float(body.get("adaptive_decay", p.adaptive_decay))
    if "seed" in body and body["seed"] is not None:
        p.seed = int(body["seed"]) & 0xFFFFFFFF
    if body.get("reasoning_budget") is not None:
        p.reasoning_budget = int(body["reasoning_budget"])
    if body.get("thinking_budget") is not None:  # alias
        p.reasoning_budget = int(body["thinking_budget"])
    if body.get("logit_bias"):
        p.logit_bias = {int(k): float(v) for k, v in body["logit_bias"].items()}
    return p


class ServerApp:
    def __init__(self, scheduler: Scheduler, model_name: str = "model",
                 slot_save_dir: str | None = None):
        self.sched = scheduler
        self.model_name = model_name
        self.ctx = scheduler.ctx
        self.tok = scheduler.ctx.model.tokenizer
        self.t_start = time.time()
        import tempfile as _tf

        self.slot_save_dir = slot_save_dir or _tf.gettempdir()
        self.mcp = None  # McpManager, set by run_server when --mcp given
        self.app = web.Application()
        r = self.app.router
        r.add_get("/", self.webui)
        r.add_get("/index.html", self.webui)
        r.add_get("/tools", self.tools_list)
        r.add_post("/tools/call", self.tools_call)
        r.add_get("/health", self.health)
        r.add_get("/props", self.props)
        r.add_get("/metrics", self.metrics)
        r.add_get("/v1/models", self.models)
        r.add_get("/slots", self.slots)
        r.add_post("/slots/{id}", self.slot_action)
        r.add_post("/tokenize", self.tokenize)
        r.add_post("/detokenize", self.detokenize)
        r.add_post("/completion", self.completions)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/v1/embeddings", self.embeddings)
        r.add_post("/v1/rerank", self.rerank)
        r.add_post("/rerank", self.rerank)
        r.add_post("/v1/messages", self.anthropic_messages)
        r.add_post("/v1/responses", self.responses)
        r.add_post("/infill", self.infill)

    # -- webui + tools (reference tools/ui + server-tools.cpp) -----------
    async def webui(self, req):
        from .webui import WEBUI_HTML

        return web.Response(text=WEBUI_HTML, content_type="text/html")

    async def tools_list(self, req):
        tools = self.mcp.definitions() if self.mcp is not None else []
        return web.json_response({"tools": tools})

    async def tools_call(self, req):
        body = await req.json()
        name = body.get("name", "")
        args = body.get("arguments", {})
        if self.mcp is None:
            return web.json_response({"error": "no tools configured"},
                                     status=400)
        loop = asyncio.get_running_loop()
        try:
            result = await loop.run_in_executor(
                None, lambda: self.mcp.call(name, args))
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response(result)

    # -- helpers ---------------------------------------------------------
    async def _run_task(self, task: GenTask, stream_q: asyncio.Queue | None = None):
        loop = asyncio.get_running_loop()
        done: asyncio.Future = loop.create_future()

        def on_done(result):
            loop.call_soon_threadsafe(
                lambda: done.set_result(result) if not done.done() else None
            )

        task.done_cb = on_done
        if stream_q is not None:
            def on_delta(d):
                loop.call_soon_threadsafe(stream_q.put_nowait, d)

            task.stream_cb = on_delta
        self.sched.submit(task)
        return done

    def _extract_media(self, messages: list) -> tuple:
        """OpenAI/Anthropic content arrays -> (messages with <__media__>
        markers, decoded PIL images). Accepts image_url parts carrying
        data: URLs or raw base64 (reference server multimodal chat)."""
        import base64
        import io

        images = []
        out = []
        for m in messages:
            c = m.get("content")
            if not isinstance(c, list):
                out.append(m)
                continue
            parts = []
            for part in c:
                t = part.get("type")
                if t in ("text", "input_text"):
                    parts.append(part.get("text", ""))
                elif t in ("image_url", "input_image", "image"):
                    url = part.get("image_url")
                    if isinstance(url, dict):
                        url = url.get("url", "")
                    url = (url or part.get("url", "")
                           or (part.get("source") or {}).get("data", ""))
                    b64 = url.split("base64,", 1)[-1]
                    from PIL import Image

                    images.append(("image", Image.open(io.BytesIO(
                        base64.b64decode(b64)))))
                    parts.append("<__media__>")
                elif t == "input_audio":
                    import wave

                    import numpy as np

                    raw = base64.b64decode(
                        (part.get("input_audio") or {}).get("data", ""))
                    with wave.open(io.BytesIO(raw)) as wf:
                        pcm = np.frombuffer(
                            wf.readframes(wf.getnframes()), np.int16)
                        if wf.getnchannels() > 1:
                            pcm = pcm.reshape(
                                -1, wf.getnchannels()).mean(-1)
                    images.append(("audio",
                                   pcm.astype(np.float32) / 32768.0))
                    parts.append("<__media__>")
            out.append({**m, "content": "".join(parts)})
        return out, images

    async def _encode_chunks(self, prompt: str, images: list) -> tuple:
        """Encode images on the inference thread and split the templated
        prompt into mtmd chunks; returns (chunks, text token ids)."""
        from ..multimodal.mtmd import tokenize_chunks

        mtmd = self.sched.mtmd

        def encode_all():
            return [mtmd.encode(v) if kind == "image"
                    else mtmd.encode_audio(v) for kind, v in images]

        loop = asyncio.get_running_loop()
        encoded = await loop.run_in_executor(
            None, lambda: self.sched.run_sync(encode_all))
        chunks = tokenize_chunks(self.tok, prompt, encoded)
        text_ids = [t for ch in chunks if ch.kind == "text"
                    for t in ch.tokens]
        return chunks, text_ids

    def _prompt_from_chat(self, body: dict) -> str:
        template = body.get("chat_template") or (
            self.tok.vocab.chat_template if self.tok else None
        )
        bos = self.tok.piece(self.tok.bos_id) if self.tok and self.tok.bos_id >= 0 else ""
        eos = self.tok.piece(self.tok.eos_id) if self.tok and self.tok.eos_id >= 0 else ""
        return apply_chat_template(
            body.get("messages", []), template, bos, eos, True, body.get("tools")
        )

    def _make_task(self, body: dict, prompt: str | list[int]) -> GenTask:
        if isinstance(prompt, str):
            ids = self.tok.encode(prompt, add_special=True, parse_special=True)
        else:
            ids = list(prompt)
        max_ctx = self.ctx.n_ctx
        if len(ids) >= max_ctx - 1:
            ids = ids[-(max_ctx - 64) :]
        stop = body.get("stop") or []
        if isinstance(stop, str):
            stop = [stop]
        grammar = body.get("grammar", "")
        if body.get("response_format", {}).get("type") == "json_object" and not grammar:
            from ..sampling.json_schema import JSON_GBNF

            grammar = JSON_GBNF
        if body.get("response_format", {}).get("type") == "json_schema" and not grammar:
            from ..sampling.json_schema import schema_to_gbnf

            schema = body["response_format"].get("json_schema", {}).get("schema", {})
            grammar = schema_to_gbnf(schema)
        return GenTask(
            prompt_ids=ids,
            params=_sampling_from_request(
                body, getattr(self.ctx.model.gguf, "metadata", None)),
            max_tokens=int(
                body.get("max_tokens")
                or body.get("max_completion_tokens")
                or body.get("n_predict")
                or 256
            ),
            stop_strings=list(stop),
            grammar=grammar,
            grammar_lazy=bool(body.get("grammar_lazy", False)),
            grammar_trigger_patterns=tuple(
                body.get("grammar_trigger_patterns", ())),
            grammar_trigger_tokens=tuple(
                body.get("grammar_trigger_tokens", ())),
            cache_prompt=bool(body.get("cache_prompt", True)),
        )

    # -- endpoints -------------------------------------------------------
    async def health(self, req):
        return web.json_response({"status": "ok"})

    async def props(self, req):
        cfg = self.ctx.cfg
        return web.json_response(
            {
                "model": self.model_name,
                "n_ctx": self.ctx.n_ctx,
                "n_slots": self.sched.n_slots,
                "arch": cfg.arch,
                "n_params_layers": cfg.n_layers,
                "vocab_size": cfg.vocab_size,
                "chat_template": (self.tok.vocab.chat_template if self.tok else None)
                or "",
                # reference memory-breakdown reporting (llama-context.cpp:3235)
                "memory_breakdown": self.ctx.memory_breakdown(),
            }
        )

    async def metrics(self, req):
        m = self.sched.metrics
        lines = [
            "# TYPE llamacpp_tpu_requests_total counter",
            f"llamacpp_tpu_requests_total {m['requests_total']}",
            "# TYPE llamacpp_tpu_tokens_predicted_total counter",
            f"llamacpp_tpu_tokens_predicted_total {m['tokens_predicted_total']}",
            "# TYPE llamacpp_tpu_tokens_prompt_total counter",
            f"llamacpp_tpu_tokens_prompt_total {m['tokens_prompt_total']}",
            "# TYPE llamacpp_tpu_busy_slots gauge",
            f"llamacpp_tpu_busy_slots {m['busy_slots']}",
            "# TYPE llamacpp_tpu_uptime_seconds gauge",
            f"llamacpp_tpu_uptime_seconds {time.time() - self.t_start:.1f}",
        ]
        return web.Response(text="\n".join(lines) + "\n", content_type="text/plain")

    async def models(self, req):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.model_name,
                        "object": "model",
                        "created": int(self.t_start),
                        "owned_by": "llama_cpp_tpu",
                    }
                ],
            }
        )

    async def slots(self, req):
        out = []
        for s in self.sched.slots:
            out.append(
                {
                    "id": s.idx,
                    "state": s.state.name,
                    "n_generated": len(s.generated),
                    "task_id": s.task.task_id if s.task else None,
                }
            )
        return web.json_response(out)

    async def slot_action(self, req):
        """POST /slots/{id}?action=save|restore|erase — per-sequence KV state
        files (reference tools/server slot save/restore,
        tools/server/tests/unit/test_slot_save.py)."""
        import os

        from ..runtime.state import load_seq_state, save_seq_state

        sid = int(req.match_info["id"])
        if sid < 0 or sid >= self.sched.n_slots:
            return web.json_response({"error": "invalid slot id"}, status=400)
        action = req.query.get("action", "")
        body = await req.json() if req.can_read_body else {}
        fname = os.path.basename(str(body.get("filename", f"slot{sid}.bin")))
        path = os.path.join(self.slot_save_dir, fname)
        loop = asyncio.get_running_loop()
        if action == "save":
            blob = await loop.run_in_executor(
                None, lambda: self.sched.run_sync(
                    lambda: save_seq_state(self.ctx, sid)))
            with open(path, "wb") as f:
                f.write(blob)
            return web.json_response(
                {"id_slot": sid, "filename": fname, "n_written": len(blob)})
        if action == "restore":
            if not os.path.exists(path):
                return web.json_response({"error": "file not found"}, status=404)
            with open(path, "rb") as f:
                blob = f.read()
            n = await loop.run_in_executor(
                None, lambda: self.sched.run_sync(
                    lambda: load_seq_state(self.ctx, sid, blob)))
            return web.json_response(
                {"id_slot": sid, "filename": fname, "n_restored": n})
        if action == "erase":
            await loop.run_in_executor(
                None, lambda: self.sched.run_sync(
                    lambda: self.ctx.seq_rm(sid)))
            return web.json_response({"id_slot": sid, "erased": True})
        return web.json_response({"error": "unknown action"}, status=400)

    async def tokenize(self, req):
        body = await req.json()
        ids = self.tok.encode(
            body.get("content", ""),
            add_special=bool(body.get("add_special", False)),
            parse_special=bool(body.get("with_pieces", True)),
        )
        return web.json_response({"tokens": ids})

    async def detokenize(self, req):
        body = await req.json()
        return web.json_response({"content": self.tok.decode(body.get("tokens", []))})

    async def embeddings(self, req):
        body = await req.json()
        inputs = body.get("input", "")
        if isinstance(inputs, str):
            inputs = [inputs]
        data = []
        for i, text in enumerate(inputs):
            ids = self.tok.encode(text, add_special=True)
            # run on the scheduler thread (single Context owner)
            vec = await asyncio.get_running_loop().run_in_executor(
                None,
                lambda ids=ids: self.sched.run_sync(
                    lambda: self.ctx.embed(ids[: self.ctx.n_ctx - 1])
                ),
            )
            import numpy as np

            v = vec / (np.linalg.norm(vec) + 1e-12)
            data.append(
                {"object": "embedding", "index": i, "embedding": [float(x) for x in v]}
            )
        return web.json_response(
            {"object": "list", "data": data, "model": self.model_name,
             "usage": {"prompt_tokens": 0, "total_tokens": 0}}
        )

    async def rerank(self, req):
        """Query-document relevance scores (reference /v1/rerank). Without a
        dedicated rank head this scores embedding cosine similarity."""
        body = await req.json()
        query = body.get("query", "")
        docs = body.get("documents", [])
        top_n = int(body.get("top_n", len(docs)))
        loop = asyncio.get_running_loop()

        import numpy as np

        def embed_one(text):
            ids = self.tok.encode(text, add_special=True)[: self.ctx.n_ctx - 1]
            return self.sched.run_sync(lambda: self.ctx.embed(ids))

        qv = await loop.run_in_executor(None, embed_one, query)
        qv = qv / (np.linalg.norm(qv) + 1e-12)
        results = []
        for i, d in enumerate(docs):
            dv = await loop.run_in_executor(None, embed_one, d)
            dv = dv / (np.linalg.norm(dv) + 1e-12)
            results.append({"index": i, "relevance_score": float(qv @ dv)})
        results.sort(key=lambda r: -r["relevance_score"])
        return web.json_response(
            {"model": self.model_name, "object": "list",
             "results": results[:top_n],
             "usage": {"prompt_tokens": 0, "total_tokens": 0}}
        )

    async def completions(self, req):
        body = await req.json()
        prompt = body.get("prompt", "")
        task = self._make_task(body, prompt)
        rid = f"cmpl-{uuid.uuid4().hex[:20]}"
        if body.get("stream"):
            return await self._stream_openai(req, task, rid, chat=False)
        done = await self._run_task(task)
        result = await done
        return web.json_response(
            {
                "id": rid,
                "object": "text_completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [
                    {
                        "text": result["text"],
                        "index": 0,
                        "logprobs": None,
                        "finish_reason": result["finish_reason"],
                    }
                ],
                "usage": {
                    "prompt_tokens": result["n_prompt"],
                    "completion_tokens": result["n_generated"],
                    "total_tokens": result["n_prompt"] + result["n_generated"],
                },
            }
        )

    def _chat_parse_format(self, body: dict) -> str:
        """Stream-parse format for this request: tool-call grammar sniffed
        from the chat template when tools are declared, else content+think."""
        if not body.get("tools"):
            return "generic"
        template = body.get("chat_template") or (
            self.tok.vocab.chat_template if self.tok else None
        )
        return detect_format(template)

    async def chat_completions(self, req):
        body = await req.json()
        messages, images = self._extract_media(body.get("messages", []))
        if images:
            if self.sched.mtmd is None:
                return web.json_response(
                    {"error": "server started without --mmproj"}, status=400)
            body = {**body, "messages": messages}
            prompt = self._prompt_from_chat(body)
            chunks, text_ids = await self._encode_chunks(prompt, images)
            task = self._make_task(body, text_ids)
            task.chunks = chunks
        else:
            prompt = self._prompt_from_chat(body)
            task = self._make_task(body, prompt)
        rid = f"chatcmpl-{uuid.uuid4().hex[:20]}"
        fmt = self._chat_parse_format(body)
        if body.get("stream"):
            return await self._stream_openai(req, task, rid, chat=True,
                                             fmt=fmt)
        done = await self._run_task(task)
        result = await done
        finish = result["finish_reason"]
        parser = StreamingChatParser(fmt)
        parser.put(result["text"])
        parser.finish()
        parsed = parser.result
        message = {"role": "assistant", "content": parsed.content or None}
        if parsed.reasoning:
            message["reasoning_content"] = parsed.reasoning
        calls = [
            {"id": t.id, "type": "function",
             "function": {"name": t.name, "arguments": t.arguments}}
            for t in parsed.tool_calls
        ]
        if not calls and body.get("tools"):
            from .tool_calls import parse_tool_calls

            content, calls = parse_tool_calls(result["text"])
            if calls:
                message["content"] = content or None
        if calls:
            message["tool_calls"] = calls
            finish = "tool_calls"
        if message["content"] is None and not calls and not parsed.reasoning:
            message["content"] = result["text"]
        return web.json_response(
            {
                "id": rid,
                "object": "chat.completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "message": message,
                        "finish_reason": finish,
                    }
                ],
                "usage": {
                    "prompt_tokens": result["n_prompt"],
                    "completion_tokens": result["n_generated"],
                    "total_tokens": result["n_prompt"] + result["n_generated"],
                },
            }
        )

    async def responses(self, req):
        """OpenAI Responses API (reference tools/server routes
        post_responses_oai): `input` is a string or message list; the reply
        wraps the text in a message output item."""
        body = await req.json()
        inp = body.get("input", "")
        messages = []
        if body.get("instructions"):
            messages.append({"role": "system",
                             "content": body["instructions"]})
        if isinstance(inp, str):
            messages.append({"role": "user", "content": inp})
        else:
            for m in inp:
                content = m.get("content")
                if isinstance(content, list):  # typed content parts
                    content = "".join(
                        c.get("text", "") for c in content
                        if c.get("type") in ("input_text", "output_text", "text"))
                messages.append({"role": m.get("role", "user"),
                                 "content": content})
        chat_body = dict(body)
        chat_body["messages"] = messages
        if "max_output_tokens" in body:
            chat_body["max_tokens"] = body["max_output_tokens"]
        prompt = self._prompt_from_chat(chat_body)
        task = self._make_task(chat_body, prompt)
        rid = f"resp_{uuid.uuid4().hex[:20]}"
        done = await self._run_task(task)
        result = await done
        return web.json_response({
            "id": rid,
            "object": "response",
            "created_at": int(time.time()),
            "model": self.model_name,
            "status": "completed",
            "output": [{
                "type": "message",
                "id": f"msg_{uuid.uuid4().hex[:16]}",
                "role": "assistant",
                "status": "completed",
                "content": [{"type": "output_text", "text": result["text"],
                             "annotations": []}],
            }],
            "output_text": result["text"],
            "usage": {
                "input_tokens": result["n_prompt"],
                "output_tokens": result["n_generated"],
                "total_tokens": result["n_prompt"] + result["n_generated"],
            },
        })

    async def _stream_openai(self, req, task: GenTask, rid: str, chat: bool,
                             fmt: str = "generic"):
        q: asyncio.Queue = asyncio.Queue()
        done = await self._run_task(task, stream_q=q)
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            }
        )
        await resp.prepare(req)

        def sse(obj) -> bytes:
            return f"data: {json.dumps(obj)}\n\n".encode()

        obj_type = "chat.completion.chunk" if chat else "text_completion"
        # streaming-diff parser (reference chat-peg-parser + compute_diffs):
        # re-parses the accumulated text each token and yields structured
        # content / reasoning_content / tool_calls deltas
        parser = StreamingChatParser(fmt) if chat else None

        def chunk_for(choice) -> bytes:
            return sse({"id": rid, "object": obj_type,
                        "created": int(time.time()),
                        "model": self.model_name, "choices": [choice]})

        async def emit(d, final: bool = False):
            if not chat:
                await resp.write(chunk_for(
                    {"index": 0, "text": d["delta"], "finish_reason": None}))
                return
            diffs = parser.finish() if final else parser.put(d["delta"])
            for delta in diffs:
                await resp.write(chunk_for(
                    {"index": 0, "delta": delta, "finish_reason": None}))

        if chat:
            await resp.write(chunk_for(
                {"index": 0, "delta": {"role": "assistant"},
                 "finish_reason": None}))
        while True:
            get = asyncio.ensure_future(q.get())
            fin = asyncio.ensure_future(asyncio.wait_for(asyncio.shield(done), None))
            dp, pending = await asyncio.wait(
                {get, fin}, return_when=asyncio.FIRST_COMPLETED
            )
            if get in dp:
                await emit(get.result())
                if fin in dp:
                    # drain remaining deltas before finishing
                    while not q.empty():
                        await emit(q.get_nowait())
                    break
                for p in pending:
                    p.cancel()
            else:
                for p in pending:
                    p.cancel()
                break
        result = await done
        finish = result["finish_reason"]
        if chat:
            await emit(None, final=True)
            if parser.result.tool_calls:
                finish = "tool_calls"
        final_choice = (
            {"index": 0, "delta": {}, "finish_reason": finish}
            if chat
            else {"index": 0, "text": "", "finish_reason": finish}
        )
        await resp.write(
            sse(
                {
                    "id": rid,
                    "object": obj_type,
                    "created": int(time.time()),
                    "model": self.model_name,
                    "choices": [final_choice],
                    "usage": {
                        "prompt_tokens": result["n_prompt"],
                        "completion_tokens": result["n_generated"],
                        "total_tokens": result["n_prompt"] + result["n_generated"],
                    },
                }
            )
        )
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    # -- Anthropic /v1/messages -----------------------------------------
    async def anthropic_messages(self, req):
        body = await req.json()
        messages = list(body.get("messages", []))
        if body.get("system"):
            messages.insert(0, {"role": "system", "content": body["system"]})
        # anthropic image blocks ({"type": "image", "source": {...}})
        messages, images = self._extract_media(messages)
        template = self.tok.vocab.chat_template if self.tok else None
        prompt = apply_chat_template(messages, template, "", "", True)
        params = {
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 0.95),
            "top_k": body.get("top_k", 40),
            "max_tokens": body.get("max_tokens", 256),
            "stop": body.get("stop_sequences", []),
        }
        if images:
            if self.sched.mtmd is None:
                return web.json_response(
                    {"error": "server started without --mmproj"}, status=400)
            chunks, text_ids = await self._encode_chunks(prompt, images)
            task = self._make_task(params, text_ids)
            task.chunks = chunks
        else:
            task = self._make_task(params, prompt)
        rid = f"msg_{uuid.uuid4().hex[:24]}"
        done = await self._run_task(task)
        result = await done
        stop_reason = {
            "stop": "end_turn",
            "length": "max_tokens",
            "cancelled": "end_turn",
        }.get(result["finish_reason"], "end_turn")
        return web.json_response(
            {
                "id": rid,
                "type": "message",
                "role": "assistant",
                "model": self.model_name,
                "content": [{"type": "text", "text": result["text"]}],
                "stop_reason": stop_reason,
                "stop_sequence": None,
                "usage": {
                    "input_tokens": result["n_prompt"],
                    "output_tokens": result["n_generated"],
                },
            }
        )

    async def infill(self, req):
        body = await req.json()
        prefix = body.get("input_prefix", "")
        suffix = body.get("input_suffix", "")
        # FIM token layout depends on model; use common llama-style markers
        prompt = f"<|fim_prefix|>{prefix}<|fim_suffix|>{suffix}<|fim_middle|>"
        task = self._make_task(body, prompt)
        done = await self._run_task(task)
        result = await done
        return web.json_response(
            {"content": result["text"], "stop": result["finish_reason"] == "stop"}
        )


def run_server(model_path, host="0.0.0.0", port=8080, **ctx_kw):
    """Serve one model, or several via the multi-model router when
    `model_path` is a dict {name: path} (reference server-models.cpp)."""
    import jax.numpy as jnp  # noqa: F401

    from ..models.loader import load_model
    from ..runtime.context import Context

    n_seqs = ctx_kw.pop("n_seqs", 4)
    draft_model = ctx_kw.pop("draft_model", None)
    spec_mode = ctx_kw.pop("spec", "")
    n_draft = ctx_kw.pop("n_draft", 8)
    mcp_cmds = ctx_kw.pop("mcp", None)
    mmproj = ctx_kw.pop("mmproj", None)
    mtmd = None
    if mmproj:
        from ..multimodal.mtmd import MtmdModel

        mtmd = MtmdModel(mmproj)
    mcp_mgr = None
    if mcp_cmds:
        from .mcp import McpManager

        mcp_mgr = McpManager()
        mcp_mgr.start(list(mcp_cmds))

    def make_spec_factory(ctx):
        """Per-slot speculator factory (reference per-slot drafting,
        server-context.cpp:3001; draft model shares one context with one
        draft sequence per target slot)."""
        if draft_model:
            dmodel = load_model(draft_model)
            if dmodel.cfg.arch == "eagle3":
                from ..models.eagle3 import Eagle3Speculator

                return lambda i: Eagle3Speculator(
                    dmodel, ctx.model, n_ctx=ctx.n_ctx)
            if dmodel.cfg.arch == "dflash":
                from ..models.dflash import DflashSpeculator

                return lambda i: DflashSpeculator(
                    dmodel, ctx.model, n_ctx=ctx.n_ctx)
            if dmodel.cfg.arch == "gemma4-assistant":
                from ..models.gemma3n import Gemma4AssistantSpeculator

                return lambda i: Gemma4AssistantSpeculator(dmodel, ctx, seq=i)
            from ..runtime.speculative import DraftModelSpeculator

            dctx = Context(dmodel, n_ctx=ctx.n_ctx, n_seqs=n_seqs)
            return lambda i: DraftModelSpeculator(dctx, seq=i)
        if spec_mode == "ngram":
            from ..runtime.speculative import NgramSpeculator

            return lambda i: NgramSpeculator()
        return None

    if isinstance(model_path, dict) and len(model_path) > 1:
        from .router import ModelRouter

        servers = {}
        for name, path in model_path.items():
            model = load_model(path)
            ctx = Context(model, n_seqs=n_seqs, **ctx_kw)
            sched = Scheduler(ctx)
            sched.start()
            servers[name] = ServerApp(sched, model_name=name)
        web.run_app(ModelRouter(servers).app, host=host, port=port)
        return
    if isinstance(model_path, dict):
        model_path = next(iter(model_path.values()))
    model = load_model(model_path)
    ctx = Context(model, n_seqs=n_seqs, **ctx_kw)
    sched = Scheduler(ctx, spec_factory=make_spec_factory(ctx),
                      n_draft=n_draft, mtmd=mtmd)
    sched.start()
    app = ServerApp(sched, model_name=model.cfg.name or "model")
    app.mcp = mcp_mgr
    web.run_app(app.app, host=host, port=port)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("llama-server")
    ap.add_argument("-m", "--model", action="append", required=True,
                    help="model path, or name=path (repeatable for the "
                    "multi-model router)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-np", "--parallel", type=int, default=4)
    ap.add_argument("--kv-total", type=int, default=0,
                    help="total KV token budget shared by all slots (paged "
                    "pool size; default: parallel * ctx-size)")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8-quantized KV cache (type_k/type_v q8_0 analog)")
    ap.add_argument("--mmproj", default=None,
                    help="vision/audio mmproj GGUF (multimodal chat)")
    ap.add_argument("-md", "--model-draft", default=None,
                    help="draft model for speculative decoding")
    ap.add_argument("--spec", default="", choices=["", "ngram"],
                    help="self-speculation mode (prompt-lookup ngram)")
    ap.add_argument("--draft-max", type=int, default=8,
                    help="max drafted tokens per step")
    ap.add_argument("--mcp", action="append", default=[],
                    help="MCP server command to spawn and expose via /tools "
                    "(repeatable; reference llama-server --mcp)")
    # parallel serving (reference --split-mode/--tensor-split/rpc analogs)
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel ways (0 = all local devices when "
                    "any parallel flag is set)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel ways over batch rows")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline stages (dense models; layers stage-"
                    "resident)")
    ap.add_argument("--ep", action="store_true",
                    help="expert parallelism: shard MoE experts over tp "
                    "with all-to-all dispatch")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host coordinator address host:port "
                    "(jax.distributed; every host runs this same command)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    from ..utils.logging import add_log_args, apply_log_args

    add_log_args(ap)
    from ..tools.args import apply_env_and_preset

    args = apply_env_and_preset(ap, argv)
    apply_log_args(args)

    mesh = None
    if (args.tp or args.dp or args.pp > 1 or args.ep
            or args.coordinator or args.num_hosts):
        from ..parallel.distributed import init_multihost, serving_mesh

        init_multihost(args.coordinator, args.num_hosts, args.host_id)
        mesh = serving_mesh(dp=args.dp, tp=args.tp, pp=args.pp)
    models = {}
    for i, spec in enumerate(args.model):
        if "=" in spec:
            name, path = spec.split("=", 1)
        else:
            name, path = f"model{i}" if i else "model", spec
        models[name] = path
    run_server(models, host=args.host, port=args.port,
               n_ctx=args.ctx_size, n_seqs=args.parallel,
               kv_total=args.kv_total or None,
               quantized_kv=args.kv_quant,
               draft_model=args.model_draft, spec=args.spec,
               n_draft=args.draft_max, mcp=args.mcp,
               mesh=mesh, ep=args.ep, mmproj=args.mmproj)


if __name__ == "__main__":
    main()
