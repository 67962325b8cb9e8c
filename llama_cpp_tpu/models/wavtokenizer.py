"""WavTokenizer decoder — the TTS vocoder (reference arch wavtokenizer-dec,
src/models/wavtokenizer-dec.cpp): audio-code embeddings -> conv1d stem ->
PosNet (resnet blocks + one self-attention block + group-norm cap) ->
ConvNeXt stack -> spectral head. The host iSTFT (tools/tts.py) turns the
predicted magnitude/phase coefficients into PCM.

Loaded standalone (load_vocoder) — the vocoder is an encoder-style conv net,
not a decoder LM, so it bypasses the llama loader/KV machinery entirely.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import read_gguf
from ..quant.dequant import dequantize_tensor


def _norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _group_norm(x, w, b, groups, eps):
    """x [T, C]; normalize over (T, C/groups) per group like ggml GROUP_NORM
    (whole-tensor per-group statistics for a [T, C, 1] tensor)."""
    t, c = x.shape
    xg = x.reshape(t, groups, c // groups)
    mu = xg.mean(axis=(0, 2), keepdims=True)
    var = xg.var(axis=(0, 2), keepdims=True)
    xg = (xg - mu) / jnp.sqrt(var + eps)
    return xg.reshape(t, c) * w + b


def _conv1d_ph(x, w, b):
    """Same-padded conv1d. x [T, Cin]; w ggml layout [Cout, Cin, K] ->
    y [T, Cout]."""
    cout, cin, k = w.shape
    y = jax.lax.conv_general_dilated(
        x[None], jnp.transpose(w, (2, 1, 0)),  # [K, Cin, Cout]
        window_strides=(1,), padding=((k // 2, k // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y[0] + b


def _conv1d_dw_ph(x, w, b):
    """Depthwise same-padded conv1d. x [T, C]; w [C, 1, K]."""
    c, _, k = w.shape
    y = jax.lax.conv_general_dilated(
        x[None], jnp.transpose(w, (2, 1, 0)),  # [K, 1, C]
        window_strides=(1,), padding=((k // 2, k // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c)
    return y[0] + b


def load_vocoder(path: str) -> dict[str, Any]:
    """GGUF -> {params, hparams} for vocoder_decode."""
    f = read_gguf(path)
    md = f.metadata
    a = "wavtokenizer-dec"
    hp = {
        "n_embd": int(md.get(f"{a}.embedding_length", 512)),
        "n_ff": int(md.get(f"{a}.feed_forward_length", 2304)),
        "posnet_embd": int(md.get(f"{a}.posnet.embedding_length", 768)),
        "posnet_layers": int(md.get(f"{a}.posnet.block_count", 6)),
        "convnext_embd": int(md.get(f"{a}.convnext.embedding_length", 768)),
        "convnext_layers": int(md.get(f"{a}.convnext.block_count", 12)),
        "norm_eps": float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-6)),
        "group_eps": float(md.get(f"{a}.attention.group_norm_epsilon", 1e-6)),
        "groups": int(md.get(f"{a}.attention.group_norm_groups", 32)),
    }
    params: dict[str, Any] = {}
    for name, info in f.tensors.items():
        arr = dequantize_tensor(np.asarray(info.data), info.dtype, info.shape)
        if name.endswith(".bias") or arr.ndim == 1:
            arr = arr.reshape(-1)
        params[name] = jnp.asarray(arr, jnp.float32)
    return {"params": params, "hparams": hp}


def vocoder_decode(voc: dict, codes: np.ndarray) -> np.ndarray:
    """codes [T] int32 -> spectral coefficients [T, n_embd_out] f32
    (reference wavtokenizer-dec graph, result_embd)."""
    p = voc["params"]
    hp = voc["hparams"]
    eps, geps, groups = hp["norm_eps"], hp["group_eps"], hp["groups"]

    x = p["token_embd.weight"][jnp.asarray(codes, jnp.int32)]  # [T, E]
    x = _conv1d_ph(x, p["conv1d.weight"], p["conv1d.bias"])

    for il in range(hp["posnet_layers"]):
        pre = f"posnet.{il}."
        res = x
        if pre + "norm1.weight" in p:  # resnet block (layers 0,1,3,4)
            h = _group_norm(x, p[pre + "norm1.weight"], p[pre + "norm1.bias"],
                            groups, geps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_ph(h, p[pre + "conv1.weight"], p[pre + "conv1.bias"])
            h = _group_norm(h, p[pre + "norm2.weight"], p[pre + "norm2.bias"],
                            groups, geps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_ph(h, p[pre + "conv2.weight"], p[pre + "conv2.bias"])
            x = h + res
        elif pre + "attn_q.weight" in p:  # self-attention block (layer 2)
            h = _group_norm(x, p[pre + "attn_norm.weight"],
                            p[pre + "attn_norm.bias"], groups, geps)
            q = _conv1d_ph(h, p[pre + "attn_q.weight"], p[pre + "attn_q.bias"])
            k = _conv1d_ph(h, p[pre + "attn_k.weight"], p[pre + "attn_k.bias"])
            v = _conv1d_ph(h, p[pre + "attn_v.weight"], p[pre + "attn_v.bias"])
            sc = (q @ k.T) / jnp.sqrt(float(hp["posnet_embd"]))
            att = jax.nn.softmax(sc, axis=-1) @ v
            att = _conv1d_ph(att, p[pre + "attn_output.weight"],
                             p[pre + "attn_output.bias"])
            x = att + res
        else:  # group-norm cap (layer 5; stored under the attn_norm name)
            wn = p.get(pre + "norm.weight", p.get(pre + "attn_norm.weight"))
            bn = p.get(pre + "norm.bias", p.get(pre + "attn_norm.bias"))
            x = _group_norm(x, wn, bn, groups, geps)

    x = _norm(x, p["token_embd_norm.weight"], p["token_embd_norm.bias"], eps)

    for il in range(hp["convnext_layers"]):
        pre = f"convnext.{il}."
        res = x
        h = _conv1d_dw_ph(x, p[pre + "dw.weight"], p[pre + "dw.bias"])
        h = _norm(h, p[pre + "norm.weight"], p[pre + "norm.bias"], eps)
        h = jax.nn.gelu(h @ p[pre + "pw1.weight"].T + p[pre + "pw1.bias"],
                        approximate=False)
        h = h @ p[pre + "pw2.weight"].T + p[pre + "pw2.bias"]
        x = h * p[pre + "gamma.weight"] + res

    x = _norm(x, p["output_norm.weight"], p["output_norm.bias"], eps)
    out = x @ p["output.weight"].T + p["output.bias"]
    return np.asarray(out, dtype=np.float32)
