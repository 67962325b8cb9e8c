#!/usr/bin/env bash
# Round-3 on-chip verification battery (run when the TPU tunnel is up):
#  1. kernel conformance sweep (docs/conformance.csv)
#  2. decode profile (per-component chains on the 8B bench fixture)
#  3. the driver benchmark (BENCH axes + roofline fractions)
#  4. CLI greedy smoke on a tiny fixture (flash vs einsum parity)
# Writes logs under /tmp/onchip_r03/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip_r03

echo "== device check =="
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

echo "== conformance ==" | tee /tmp/onchip_r03/conformance.log
timeout 3000 python scripts/conformance.py 2>&1 | tail -5 | tee -a /tmp/onchip_r03/conformance.log

echo "== decode profile =="
timeout 3000 python scripts/profile_decode.py full attn gemm 2>&1 | tee /tmp/onchip_r03/profile.log

echo "== bench =="
timeout 3000 python bench.py 2>&1 | tee /tmp/onchip_r03/bench.log

echo "== cli smoke =="
timeout 600 python - <<'EOF' 2>&1 | tee /tmp/onchip_r03/smoke.log
from llama_cpp_tpu.testing import make_tiny_llama_gguf
make_tiny_llama_gguf('/tmp/onchip_smoke.gguf', vocab_size=512, n_layers=2,
                     n_embd=512, n_heads=4, n_kv_heads=2, n_ff=1024,
                     ftype='q8_0', n_ctx=2048, seed=3)
from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.context import Context
from llama_cpp_tpu.ops.pallas.flash_attn import set_force_flash
m = load_model('/tmp/onchip_smoke.gguf')
a = Context(m, n_ctx=512, n_seqs=1).generate([1, 2, 3], max_new_tokens=16)
set_force_flash(False)
m2 = load_model('/tmp/onchip_smoke.gguf')
b = Context(m2, n_ctx=512, n_seqs=1).generate([1, 2, 3], max_new_tokens=16)
set_force_flash(None)
assert a == b, f"flash vs einsum diverged: {a} vs {b}"
print("smoke ok:", a)
EOF
echo "== done =="
