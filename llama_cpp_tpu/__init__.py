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
