"""MoE decode benchmark on a gpt-oss-shaped synthetic model (MXFP4 experts,
attention sinks, interleaved SWA) — exercises the indexed-expert Pallas
kernel end-to-end on the real chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
import jax.numpy as jnp
from llama_cpp_tpu.testing import make_tiny_gpt_oss_gguf
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context

path = "/tmp/goss_mid.gguf"
if not os.path.exists(path):
    # ~0.5B-ish MoE: 12 layers, E=1024, 16 experts (2 used), ff 1536
    make_tiny_gpt_oss_gguf(path, vocab_size=8192, n_layers=12, n_embd=1024,
        n_heads=16, n_kv_heads=4, head_dim=64, n_expert=16, n_expert_used=2,
        n_ff_exp=1536, sliding_window=128)
model = load_model(path)
ctx = Context(model, n_ctx=1024, n_seqs=1)
from llama_cpp_tpu.runtime.kv_cache import ISWACache
print("memory type:", type(ctx.kv).__name__,
      "swa slots:", getattr(getattr(ctx.kv, 'swa', None), 'n_slots', None),
      "full slots:", ctx.kv.n_slots)
prompt = list(np.random.default_rng(0).integers(10, 8000, 256))
t0=time.perf_counter(); ctx.prefill(prompt); t1=time.perf_counter()
print(f"prefill 256 (cold, compile): {t1-t0:.1f}s")
out = ctx.generate_ondevice(prompt[:8], max_new_tokens=33, chunk=32)  # warm decode path
ctx.seq_rm(0)
logits = ctx.prefill(prompt)
import jax.random as jr
fn = ctx._gen_chunk_fn(64, True, 0.0, 0)
kv, toks = fn(model.params, ctx.kv, jnp.int32(1), jnp.int32(len(prompt)), jnp.int32(0), jr.PRNGKey(0))
toks.block_until_ready()
best = 1e9
for _ in range(4):
    ctx.kv = kv
    t0=time.perf_counter()
    kv, toks = fn(model.params, ctx.kv, jnp.int32(2), jnp.int32(len(prompt)+64), jnp.int32(0), jr.PRNGKey(0))
    toks.block_until_ready()
    best = min(best, time.perf_counter()-t0)
print(f"gpt-oss-shaped MoE decode: {64/best:.0f} tok/s (best of 4)")
