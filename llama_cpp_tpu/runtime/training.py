"""Training/finetune support: cross-entropy LM loss + optimizer step.

Analog of reference ggml-opt (ggml/src/ggml-opt.cpp) and llama_opt_epoch
(src/llama-context.cpp:3281-3431): where ggml builds a backward graph with
GGML_OP_OPT_STEP_ADAMW nodes, here jax.grad + optax produce the same program
and XLA schedules it; trainable-param filtering is a pytree mask.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..models.transformer import AttnInputs, forward
from ..runtime.kv_cache import KVCache


def lm_loss(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    targets: jnp.ndarray,  # [B*T] flat next-token ids, negative = ignore
    inputs: AttnInputs,
    kv: KVCache,
) -> jnp.ndarray:
    logits, _ = forward(params, cfg, tokens, inputs, kv)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = targets >= 0
    safe_t = jnp.where(mask, targets, 0)
    nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=-1)[:, 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def make_optimizer(kind: str = "adamw", lr: float = 1e-4, **kw) -> optax.GradientTransformation:
    if kind == "adamw":
        return optax.adamw(lr, **kw)
    if kind == "sgd":
        return optax.sgd(lr, **kw)
    raise ValueError(kind)


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    trainable: Callable[[str], bool] | None = None,
):
    """-> jittable step(params, opt_state, tokens, targets, inputs, kv)
    returning (params, opt_state, loss). Non-array leaves (QuantTensor planes
    are frozen by masking) keep zero updates."""

    def step(params, opt_state, tokens, targets, inputs, kv):
        loss, grads = jax.value_and_grad(lm_loss)(
            params, cfg, tokens, targets, inputs, kv
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_epoch(
    model,
    dataset: list[tuple[list[int], list[int]]],  # (tokens, targets) pairs
    lr: float = 1e-4,
    n_ctx: int = 512,
) -> list[float]:
    """Simple epoch loop (llama_opt_epoch analog) over dense-f32 params."""
    import numpy as np

    cfg = model.cfg
    opt = make_optimizer("adamw", lr)
    params = model.params
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))
    losses = []
    for toks, tgts in dataset:
        n = len(toks)
        kv = KVCache.create(cfg.n_layers, 1, n, cfg.n_kv_heads, cfg.head_dim_k,
                            cfg.head_dim_v, dtype=jnp.float32)
        inputs = AttnInputs(
            seq_idx=jnp.zeros(1, jnp.int32),
            slots=jnp.arange(n, dtype=jnp.int32)[None, :],
            positions=jnp.arange(n, dtype=jnp.int32)[None, :],
        )
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(toks, jnp.int32)[None, :], jnp.asarray(tgts, jnp.int32),
            inputs, kv,
        )
        losses.append(float(loss))
    model.params = params
    return losses
