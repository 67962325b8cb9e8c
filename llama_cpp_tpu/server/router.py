"""Multi-model router: one HTTP surface over several model servers.

In-process analog of the reference's multi-model router (tools/server/
server-models.cpp: a parent process routing requests to per-model child
servers by the request's `model` field). On TPU the models share the chip,
so each model gets its own Scheduler/Context and the router dispatches to
the matching ServerApp handler; unknown or missing `model` falls through to
the default (first) model.
"""

from __future__ import annotations

import time

from aiohttp import web

from .app import ServerApp


class ModelRouter:
    def __init__(self, servers: dict[str, "ServerApp"]):
        assert servers, "router needs at least one model"
        self.servers = servers
        self.default = next(iter(servers))
        self.t_start = time.time()
        self.app = web.Application()
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/models", self.models)
        r.add_get("/v1/models", self.models)
        for route in ("/completion", "/v1/completions", "/v1/chat/completions",
                      "/v1/embeddings", "/v1/rerank", "/rerank",
                      "/v1/messages", "/v1/responses", "/infill",
                      "/tokenize", "/detokenize"):
            handler = {
                "/completion": "completions",
                "/v1/completions": "completions",
                "/v1/chat/completions": "chat_completions",
                "/v1/embeddings": "embeddings",
                "/v1/rerank": "rerank",
                "/rerank": "rerank",
                "/v1/messages": "anthropic_messages",
                "/v1/responses": "responses",
                "/infill": "infill",
                "/tokenize": "tokenize",
                "/detokenize": "detokenize",
            }[route]
            r.add_post(route, self._make_dispatch(handler))

    def _pick(self, name: str | None) -> "ServerApp":
        return self.servers.get(name or "", self.servers[self.default])

    def _make_dispatch(self, method: str):
        async def dispatch(req):
            name = None
            if req.can_read_body:
                try:
                    body = await req.json()  # cached; handlers re-read freely
                    name = body.get("model")
                except Exception:
                    pass
            srv = self._pick(name)
            return await getattr(srv, method)(req)

        return dispatch

    async def health(self, req):
        return web.json_response(
            {"status": "ok", "models": sorted(self.servers)})

    async def models(self, req):
        return web.json_response({
            "object": "list",
            "data": [
                {"id": name, "object": "model",
                 "created": int(self.t_start), "owned_by": "llama_cpp_tpu"}
                for name in self.servers
            ],
        })
