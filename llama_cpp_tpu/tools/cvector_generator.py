"""cvector-generator: build control vectors by PCA over hidden-state
differences between positive and negative prompts.

Analog of reference tools/cvector-generator (PCA mode): for each layer,
collect the residual-stream mean for each positive/negative prompt pair,
take the difference matrix, and emit its top principal component as
direction.<layer> in a control-vector GGUF (consumable by --control-vector).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter


def collect_layer_means(model, prompts: list[str]) -> np.ndarray:
    """-> [n_prompts, n_layers, n_embd] mean residual per layer."""
    import jax.numpy as jnp

    from ..models import transformer
    from ..models.transformer import AttnInputs
    from ..runtime.kv_cache import KVCache

    cfg = model.cfg
    tok = model.tokenizer
    out = np.zeros((len(prompts), cfg.n_layers, cfg.n_embd), np.float32)

    for pi, text in enumerate(prompts):
        ids = tok.encode(text, add_special=True, parse_special=True)
        n = len(ids)
        acc: dict[int, np.ndarray] = {}

        def tap(il, key, x):
            if key == "l_out":
                acc[il] = np.asarray(x, np.float32).reshape(-1, cfg.n_embd).mean(0)

        transformer.set_activation_tap(tap)
        try:
            kv = KVCache.create(cfg.n_layers, 1, n, cfg.n_kv_heads,
                                cfg.head_dim_k, cfg.head_dim_v)
            inputs = AttnInputs(
                seq_idx=jnp.zeros(1, jnp.int32),
                slots=jnp.arange(n, dtype=jnp.int32)[None, :],
                positions=jnp.arange(n, dtype=jnp.int32)[None, :],
            )
            model.forward_fn(model.params, cfg,
                             jnp.asarray(ids, jnp.int32)[None, :], inputs, kv)
        finally:
            transformer.set_activation_tap(None)
        for il, v in acc.items():
            out[pi, il] = v
    return out


def pca_directions(pos: np.ndarray, neg: np.ndarray) -> np.ndarray:
    """[P, L, E] x2 -> [L, E] top principal component of (pos - neg),
    sign-aligned with the mean difference."""
    diff = pos - neg  # [P, L, E]
    P, L, E = diff.shape
    dirs = np.zeros((L, E), np.float32)
    for il in range(L):
        d = diff[:, il]  # [P, E]
        d = d - d.mean(0)
        if P == 1 or np.allclose(d, 0):
            v = diff[:, il].mean(0)
            n = np.linalg.norm(v)
            dirs[il] = v / n if n > 0 else v
            continue
        # top right-singular vector == top eigvec of covariance
        _, _, vt = np.linalg.svd(d, full_matrices=False)
        v = vt[0]
        if float(v @ diff[:, il].mean(0)) < 0:
            v = -v
        dirs[il] = v
    return dirs


def write_control_vector(path: str, dirs: np.ndarray) -> str:
    w = GGUFWriter()
    w.add("general.architecture", "controlvector")
    w.add("general.type", "adapter")
    w.add("adapter.type", "control_vector")
    w.add("controlvector.layer_count", np.uint32(dirs.shape[0]))
    for il in range(dirs.shape[0]):
        # reference numbers cvec layers from 1 (src/llama-adapter.cpp)
        w.add_tensor(f"direction.{il + 1}",
                     np.ascontiguousarray(dirs[il], np.float32).tobytes(),
                     (dirs.shape[1],), GGMLType.F32)
    w.write(path)
    return path


def main(argv=None):
    from ..models.loader import load_model

    ap = argparse.ArgumentParser("cvector-generator (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", required=True,
                    help="one positive prompt per line")
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    args = ap.parse_args(argv)

    pos_prompts = [l.strip() for l in open(args.positive_file) if l.strip()]
    neg_prompts = [l.strip() for l in open(args.negative_file) if l.strip()]
    n = min(len(pos_prompts), len(neg_prompts))
    model = load_model(args.model, fuse=False)
    pos = collect_layer_means(model, pos_prompts[:n])
    neg = collect_layer_means(model, neg_prompts[:n])
    dirs = pca_directions(pos, neg)
    write_control_vector(args.output, dirs)
    print(f"wrote {dirs.shape[0]} directions -> {args.output}")


if __name__ == "__main__":
    main()
