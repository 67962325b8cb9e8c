#!/usr/bin/env bash
# Fast CI tier (VERDICT r1 item 10): core unit tests + kernel conformance in
# interpret mode, guaranteed CPU (no chip needed), ~11 min on a 1-vCPU box
# (faster with real cores — interpret-mode Pallas dominates).
# Slow tiers: `pytest tests/` (adds HF torch oracles, ~25 min) and
# `python scripts/conformance.py` on a TPU host (on-chip sweep).
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

python -m pytest tests/ -q -x -p no:cacheprovider -m "not slow" \
    --ignore=tests/test_model_parity.py \
    --ignore=tests/test_multimodal.py \
    --ignore=tests/test_tools.py \
    --ignore=tests/test_server.py \
    --ignore=tests/test_state.py \
    --ignore=tests/test_training.py \
    "$@"
echo "CI fast tier green"
