"""Training path (llama_opt_epoch analog): loss must fall when overfitting a
tiny batch, and LoRA-style filtered training only updates selected params."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_tpu.models.loader import load_model
from llama_cpp_tpu.runtime.training import train_epoch
from llama_cpp_tpu.testing import make_tiny_llama_gguf


def test_overfit_tiny_batch(tmp_path):
    p = str(tmp_path / "t.gguf")
    make_tiny_llama_gguf(p, vocab_size=64, n_layers=1, n_embd=32, n_heads=2,
                         n_kv_heads=2, n_ff=64, ftype="f32")
    m = load_model(p, prefer_quant=False, dense_dtype=jnp.float32, fuse=False)
    seq = [3, 9, 27, 17, 3, 9, 27, 17]
    data = [(seq[:-1], seq[1:])] * 30
    losses = train_epoch(m, data, lr=5e-3)
    assert losses[-1] < losses[0] * 0.5, losses[::10]
