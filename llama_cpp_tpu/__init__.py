"""llama_cpp_tpu: a TPU-native quantized-inference engine with the
capabilities of ggml-org/llama.cpp, built from scratch on JAX/XLA/Pallas.

Layer map (mirrors SURVEY.md section 7 design stance):
  gguf/       GGUF reader/writer + format constants
  quant/      block-quant codecs (numpy bit-exact) + TPU repacking
  ops/        JAX/Pallas compute ops (matmul, attention, norms, rope)
  models/     architecture registry + per-arch graph builders
  runtime/    context, KV cache, batching, sampling loop, state I/O
  tokenizer/  SPM / BPE / WPM tokenizers
  sampling/   sampler chains + GBNF grammar
  parallel/   mesh + sharding rules (tp/pp/dp over ICI/DCN)
  server/     OpenAI-compatible HTTP server w/ continuous batching
  tools/      cli, perplexity, quantize, bench, imatrix
  convert/    HF checkpoint -> GGUF
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: model load runs dozens of device-repack
# jits and the decode/prefill programs compile AOT — on TPU environments
# where compiles round-trip a compile service, a cold 8B load is dominated
# by compile time, not bytes (measured: tiny-model load 277 s cold vs 48 s
# warm). The reference's analog is mmap'd model reuse (src/llama-mmap.cpp);
# ours is compiled-program reuse. Opt out with LLAMA_TPU_NO_COMPILE_CACHE=1
# or override via the standard JAX_COMPILATION_CACHE_DIR.
import os as _os

if (not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        and _os.environ.get("LLAMA_TPU_NO_COMPILE_CACHE") != "1"):
    try:
        from pathlib import Path as _Path

        import jax as _jax

        _d = _Path.home() / ".cache" / "llama_cpp_tpu" / "jax_cache"
        _d.mkdir(parents=True, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", str(_d))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
