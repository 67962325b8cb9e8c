"""Sampler chain: llama.cpp-compatible token samplers.

Parity inventory (reference include/llama.h:1339-1496, impl
src/llama-sampler.cpp): greedy, dist, top-k, top-p, min-p, typical, temp,
temp-ext (entropy-dynamic), XTC, top-n-sigma, mirostat v1/v2, penalties
(repeat/freq/presence), DRY, logit-bias, infill; chain composition mirrors
llama_sampler_chain. Host-side numpy implementation (the reference samples on
CPU too); the greedy/dist fast path also has an on-device jit twin used by the
decode loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import numpy as np


@dataclass
class SamplingParams:
    """Mirror of common_params_sampling (reference common/common.h:200-260)."""

    seed: int = 0xFFFFFFFF
    n_prev: int = 64
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    typical_p: float = 1.0
    temp: float = 0.8
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_penalty_last_n: int = -1
    dry_sequence_breakers: tuple[str, ...] = ("\n", ":", '"', "*")
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.10
    top_n_sigma: float = -1.0
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    logit_bias: dict[int, float] = field(default_factory=dict)
    grammar: str = ""

    @property
    def is_greedy(self) -> bool:
        return self.temp <= 0 and self.mirostat == 0


def _softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max()
    e = np.exp(logits - m)
    return e / e.sum()


class Sampler:
    def apply(self, state: "SamplerState", logits: np.ndarray) -> np.ndarray:
        return logits

    def accept(self, state: "SamplerState", token: int) -> None:
        pass

    def reset(self) -> None:
        pass


@dataclass
class SamplerState:
    prev: list[int] = field(default_factory=list)
    rng: np.random.Generator = field(default_factory=lambda: np.random.default_rng(0))
    mu: float = 0.0  # mirostat state


class LogitBias(Sampler):
    def __init__(self, bias: dict[int, float]):
        self.bias = bias

    def apply(self, state, logits):
        for t, b in self.bias.items():
            if 0 <= t < len(logits):
                logits[t] += b
        return logits


class Penalties(Sampler):
    """repeat/freq/presence penalties (llama_sampler_init_penalties)."""

    def __init__(self, last_n: int, repeat: float, freq: float, present: float):
        self.last_n, self.repeat, self.freq, self.present = last_n, repeat, freq, present

    def apply(self, state, logits):
        if self.last_n == 0 or (self.repeat == 1.0 and self.freq == 0 and self.present == 0):
            return logits
        window = state.prev[-self.last_n :] if self.last_n > 0 else state.prev
        if not window:
            return logits
        toks, counts = np.unique(np.asarray(window), return_counts=True)
        sel = logits[toks]
        if self.repeat != 1.0:
            sel = np.where(sel <= 0, sel * self.repeat, sel / self.repeat)
        sel = sel - counts * self.freq - (counts > 0) * self.present
        logits[toks] = sel
        return logits


class Dry(Sampler):
    """DRY sequence-repetition penalty (llama_sampler_init_dry); penalizes
    tokens that would extend a suffix already seen in the context."""

    def __init__(self, multiplier: float, base: float, allowed: int, last_n: int,
                 breaker_ids: frozenset[int] = frozenset()):
        self.multiplier, self.base, self.allowed, self.last_n = multiplier, base, allowed, last_n
        self.breakers = breaker_ids

    def apply(self, state, logits):
        if self.multiplier <= 0:
            return logits
        prev = state.prev if self.last_n < 0 else state.prev[-self.last_n :]
        n = len(prev)
        if n < self.allowed + 1:
            return logits
        # z-algorithm style match: for each token id that follows a maximal
        # repeated suffix of length >= allowed, apply multiplier*base^(len-allowed)
        max_len: dict[int, int] = {}
        for i in range(n - 1):
            if prev[i] in self.breakers:
                continue
            # length of the longest common suffix of prev[:i+1] and prev[:n]
            l = 0
            while (
                l < i + 1
                and l < n
                and prev[i - l] == prev[n - 1 - l]
                and prev[i - l] not in self.breakers
            ):
                l += 1
            if l >= self.allowed and i + 1 < n:
                nxt = prev[i + 1]
                max_len[nxt] = max(max_len.get(nxt, 0), l)
        for tok, l in max_len.items():
            logits[tok] -= self.multiplier * (self.base ** (l - self.allowed))
        return logits

    def accept(self, state, token):
        pass


class TopK(Sampler):
    def __init__(self, k: int):
        self.k = k

    def apply(self, state, logits):
        k = self.k
        if k <= 0 or k >= len(logits):
            return logits
        kth = np.partition(logits, -k)[-k]
        logits[logits < kth] = -np.inf
        return logits


class TopP(Sampler):
    def __init__(self, p: float, min_keep: int = 1):
        self.p, self.min_keep = p, min_keep

    def apply(self, state, logits):
        if self.p >= 1.0:
            return logits
        order = np.argsort(-logits)
        probs = _softmax(logits[order])
        csum = np.cumsum(probs)
        cut = int(np.searchsorted(csum, self.p) + 1)
        cut = max(cut, self.min_keep)
        logits[order[cut:]] = -np.inf
        return logits


class MinP(Sampler):
    def __init__(self, p: float, min_keep: int = 1):
        self.p, self.min_keep = p, min_keep

    def apply(self, state, logits):
        if self.p <= 0:
            return logits
        mx = logits.max()
        # p_i >= p * p_max  <=>  logit_i >= logit_max + log(p)
        thresh = mx + np.log(self.p)
        mask = logits < thresh
        if (~mask).sum() < self.min_keep:
            keep = np.argsort(-logits)[: self.min_keep]
            mask[keep] = False
        logits[mask] = -np.inf
        return logits


class Typical(Sampler):
    def __init__(self, p: float, min_keep: int = 1):
        self.p, self.min_keep = p, min_keep

    def apply(self, state, logits):
        if self.p >= 1.0:
            return logits
        probs = _softmax(logits)
        ent = -np.sum(np.where(probs > 0, probs * np.log(np.maximum(probs, 1e-30)), 0.0))
        shifted = np.abs(-np.log(np.maximum(probs, 1e-30)) - ent)
        order = np.argsort(shifted)
        csum = np.cumsum(probs[order])
        cut = max(int(np.searchsorted(csum, self.p) + 1), self.min_keep)
        drop = order[cut:]
        logits[drop] = -np.inf
        return logits


class Temp(Sampler):
    def __init__(self, t: float):
        self.t = t

    def apply(self, state, logits):
        if self.t > 0:
            logits /= self.t
        return logits


class TempExt(Sampler):
    """Entropy-dynamic temperature (llama_sampler_init_temp_ext)."""

    def __init__(self, t: float, delta: float, exponent: float):
        self.t, self.delta, self.exponent = t, delta, exponent

    def apply(self, state, logits):
        if self.delta <= 0:
            if self.t > 0:
                logits /= self.t
            return logits
        tmin, tmax = max(0.0, self.t - self.delta), self.t + self.delta
        probs = _softmax(logits)
        nz = probs > 0
        ent = -np.sum(probs[nz] * np.log(probs[nz]))
        max_ent = np.log(nz.sum()) if nz.sum() > 1 else 1.0
        norm = ent / max(max_ent, 1e-9)
        dyn = tmin + (tmax - tmin) * (norm**self.exponent)
        logits /= max(dyn, 1e-9)
        return logits


class Xtc(Sampler):
    def __init__(self, probability: float, threshold: float, min_keep: int = 1):
        self.probability, self.threshold, self.min_keep = probability, threshold, min_keep

    def apply(self, state, logits):
        if self.probability <= 0 or self.threshold > 0.5:
            return logits
        if state.rng.random() >= self.probability:
            return logits
        probs = _softmax(logits)
        above = np.nonzero(probs >= self.threshold)[0]
        if len(above) >= 2:
            # remove all above-threshold tokens except the least probable one
            order = above[np.argsort(-probs[above])]
            logits[order[:-1]] = -np.inf
        return logits


class TopNSigma(Sampler):
    def __init__(self, n: float):
        self.n = n

    def apply(self, state, logits):
        if self.n < 0:
            return logits
        finite = logits[np.isfinite(logits)]
        mx, sd = finite.max(), finite.std()
        logits[logits < mx - self.n * sd] = -np.inf
        return logits


class MirostatV2(Sampler):
    def __init__(self, tau: float, eta: float, seed: int):
        self.tau, self.eta = tau, eta
        self._init = 2 * tau

    def apply(self, state, logits):
        if state.mu == 0.0:
            state.mu = self._init
        probs = _softmax(logits)
        surprise = -np.log2(np.maximum(probs, 1e-30))
        mask = surprise > state.mu
        if mask.all():
            mask[np.argmax(probs)] = False
        logits[mask] = -np.inf
        self._last_probs = _softmax(logits)
        return logits

    def accept(self, state, token):
        p = self._last_probs[token] if hasattr(self, "_last_probs") else 1.0
        observed = -np.log2(max(p, 1e-30))
        state.mu -= self.eta * (observed - self.tau)


class SamplerChain:
    """llama_sampler_chain analog: ordered samplers + final pick."""

    def __init__(self, samplers: Sequence[Sampler], params: SamplingParams):
        self.samplers = list(samplers)
        self.params = params
        self.state = SamplerState(
            rng=np.random.default_rng(
                params.seed if params.seed != 0xFFFFFFFF else None
            )
        )
        self.n_sampled = 0

    @classmethod
    def from_params(cls, p: SamplingParams, vocab=None) -> "SamplerChain":
        """Default chain order mirrors common/sampling.cpp."""
        chain: list[Sampler] = []
        if p.logit_bias:
            chain.append(LogitBias(p.logit_bias))
        chain.append(Penalties(p.penalty_last_n, p.penalty_repeat, p.penalty_freq, p.penalty_present))
        if p.dry_multiplier > 0:
            breaker_ids = frozenset()
            if vocab is not None:
                ids = set()
                for s in p.dry_sequence_breakers:
                    tid = vocab.token_to_id.get(s)
                    if tid is not None:
                        ids.add(tid)
                breaker_ids = frozenset(ids)
            chain.append(Dry(p.dry_multiplier, p.dry_base, p.dry_allowed_length,
                             p.dry_penalty_last_n, breaker_ids))
        if p.mirostat == 2:
            chain.append(Temp(p.temp))
            chain.append(MirostatV2(p.mirostat_tau, p.mirostat_eta, p.seed))
            return cls(chain, p)
        if p.is_greedy:
            return cls(chain, p)
        if p.top_n_sigma >= 0:
            chain.append(TopNSigma(p.top_n_sigma))
        chain.append(TopK(p.top_k))
        chain.append(Typical(p.typical_p))
        chain.append(TopP(p.top_p))
        chain.append(MinP(p.min_p))
        chain.append(Xtc(p.xtc_probability, p.xtc_threshold))
        if p.dynatemp_range > 0:
            chain.append(TempExt(p.temp, p.dynatemp_range, p.dynatemp_exponent))
        else:
            chain.append(Temp(p.temp))
        return cls(chain, p)

    def sample(self, logits: np.ndarray) -> int:
        logits = np.asarray(logits, dtype=np.float32).copy()
        for s in self.samplers:
            logits = s.apply(self.state, logits)
        if self.params.is_greedy:
            token = int(np.argmax(logits))
        else:
            probs = _softmax(logits)
            token = int(self.state.rng.choice(len(probs), p=probs))
        self.accept(token)
        return token

    def accept(self, token: int) -> None:
        self.state.prev.append(token)
        if len(self.state.prev) > 4096:
            del self.state.prev[:-2048]
        for s in self.samplers:
            s.accept(self.state, token)
        self.n_sampled += 1

    def reset(self) -> None:
        self.state.prev.clear()
        self.state.mu = 0.0
        for s in self.samplers:
            s.reset()
