"""Sampler chain tests (analog of reference tests/test-sampling.cpp)."""

import numpy as np

from llama_cpp_tpu.sampling.samplers import (
    Dry,
    MinP,
    Penalties,
    SamplerChain,
    SamplerState,
    SamplingParams,
    TopK,
    TopNSigma,
    TopP,
    Typical,
    _softmax,
)


def test_greedy():
    p = SamplingParams(temp=0.0)
    chain = SamplerChain.from_params(p)
    logits = np.array([0.1, 2.0, -1.0, 1.9], dtype=np.float32)
    assert chain.sample(logits) == 1


def test_top_k():
    st = SamplerState()
    logits = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    out = TopK(2).apply(st, logits.copy())
    assert np.isinf(out[:2]).all() and (out[:2] < 0).all()
    assert (out[2:] == logits[2:]).all()


def test_top_p_keeps_mass():
    st = SamplerState()
    logits = np.log(np.array([0.5, 0.3, 0.15, 0.05], dtype=np.float32))
    out = TopP(0.79).apply(st, logits.copy())
    # 0.5 + 0.3 = 0.8 >= 0.79 -> keep the first two
    assert np.isfinite(out[0]) and np.isfinite(out[1])
    assert np.isinf(out[2]) and np.isinf(out[3])


def test_min_p():
    st = SamplerState()
    logits = np.log(np.array([0.6, 0.3, 0.05, 0.05], dtype=np.float32))
    out = MinP(0.2).apply(st, logits.copy())
    # keep tokens with p >= 0.2*0.6 = 0.12
    assert np.isfinite(out[0]) and np.isfinite(out[1])
    assert np.isinf(out[2]) and np.isinf(out[3])


def test_repeat_penalty():
    st = SamplerState(prev=[2, 2, 3])
    logits = np.array([1.0, 1.0, 1.0, -1.0], dtype=np.float32)
    out = Penalties(64, 2.0, 0.0, 0.0).apply(st, logits.copy())
    assert out[2] == 0.5  # positive logit divided
    assert out[3] == -2.0  # negative logit multiplied
    assert out[0] == 1.0


def test_freq_presence():
    st = SamplerState(prev=[1, 1, 1, 2])
    logits = np.zeros(4, dtype=np.float32)
    out = Penalties(64, 1.0, 0.5, 0.25).apply(st, logits.copy())
    assert np.isclose(out[1], -0.5 * 3 - 0.25)
    assert np.isclose(out[2], -0.5 - 0.25)
    assert out[0] == 0.0


def test_dry_penalizes_repetition():
    st = SamplerState(prev=[5, 6, 7, 8, 5, 6, 7])
    logits = np.zeros(10, dtype=np.float32)
    out = Dry(1.0, 1.75, 2, -1).apply(st, logits.copy())
    # context ends with 5,6,7 which previously continued with 8
    assert out[8] < 0
    assert out[9] == 0


def test_top_n_sigma():
    st = SamplerState()
    logits = np.array([10.0, 9.5, 0.0, -5.0], dtype=np.float32)
    out = TopNSigma(1.0).apply(st, logits.copy())
    assert np.isfinite(out[0]) and np.isfinite(out[1])
    assert np.isinf(out[3])


def test_typical_keeps_probable():
    st = SamplerState()
    logits = np.log(np.array([0.97, 0.01, 0.01, 0.01], dtype=np.float32))
    out = Typical(0.5).apply(st, logits.copy())
    assert np.isfinite(out[0])


def test_dist_sampling_statistics():
    p = SamplingParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, seed=42)
    chain = SamplerChain.from_params(p)
    logits = np.log(np.array([0.7, 0.2, 0.1], dtype=np.float32))
    counts = np.zeros(3)
    for _ in range(500):
        t = chain.sample(logits.copy())
        counts[t] += 1
        chain.state.prev.clear()
    freq = counts / counts.sum()
    assert abs(freq[0] - 0.7) < 0.08


def test_chain_determinism():
    p = SamplingParams(temp=0.7, seed=7)
    c1 = SamplerChain.from_params(p)
    c2 = SamplerChain.from_params(p)
    logits = np.random.default_rng(0).standard_normal(100).astype(np.float32)
    s1 = [c1.sample(logits.copy()) for _ in range(10)]
    s2 = [c2.sample(logits.copy()) for _ in range(10)]
    assert s1 == s2


def test_mirostat_runs():
    p = SamplingParams(temp=0.8, mirostat=2, seed=1)
    chain = SamplerChain.from_params(p)
    logits = np.random.default_rng(1).standard_normal(50).astype(np.float32)
    for _ in range(5):
        t = chain.sample(logits.copy())
        assert 0 <= t < 50
    assert chain.state.mu != 0.0


def test_mirostat_v1_runs_and_adapts():
    """Mirostat 1.0 (include/llama.h:1375): truncates to a surprise-bounded
    top-k and adapts mu toward tau."""
    p = SamplingParams(temp=1.0, mirostat=1, mirostat_tau=3.0,
                      mirostat_eta=0.2, seed=7)
    chain = SamplerChain.from_params(p)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(256).astype(np.float32) * 3
    mus = []
    for _ in range(16):
        t = chain.sample(logits.copy())
        assert 0 <= t < 256
        mus.append(chain.state.mu)
    assert mus[0] != 0.0  # mu initialized and adapting
    assert len(set(round(m, 6) for m in mus)) > 1


def test_adaptive_p_targets_probability():
    """Adaptive-p (include/llama.h:1465): picks tokens whose original
    probability sits near the target."""
    from llama_cpp_tpu.sampling.samplers import AdaptiveP

    probs = np.array([0.5, 0.3, 0.12, 0.05, 0.03], dtype=np.float32)
    logits = np.log(probs)
    p = SamplingParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0,
                      adaptive_target=0.3, adaptive_decay=0.9, seed=3)
    chain = SamplerChain.from_params(p)
    counts = np.zeros(5)
    for _ in range(200):
        t = chain.sample(logits.copy())
        counts[t] += 1
    # token 1 (p=0.3) should dominate the picks
    assert counts[1] == counts.max()
    # -inf passthrough: masked logits stay masked
    st = SamplerState()
    ap = AdaptiveP(0.3, 0.9)
    masked = logits.copy()
    masked[4] = -np.inf
    out = ap.apply(st, masked)
    assert np.isneginf(out[4]) and np.isfinite(out[:4]).all()


def test_infill_prefix_merge_and_eog():
    """Infill sampler (include/llama.h:1475): merges common-prefix
    candidates and falls back to EOG when text mass is weak."""
    from llama_cpp_tpu.sampling.samplers import Infill

    class FakeVocab:
        eot_id = 3
        eos_id = 3

        def is_eog(self, t):
            return t == 3

    pieces = {0: "hel", 1: "hello", 2: "world", 3: ""}
    inf = Infill(FakeVocab(), piece_fn=lambda t: pieces[t])
    st = SamplerState()
    # text-dominated: prefix tokens merge into one candidate
    logits = np.log(np.array([0.30, 0.40, 0.29, 0.01], dtype=np.float32))
    out = inf.apply(st, logits.copy())
    probs = _softmax(out)
    # "hel" merged into "hello" (higher p): 0.70 on token 1
    assert np.isneginf(out[0])
    assert abs(probs[1] - 0.70) < 0.02
    # EOG-dominated: only EOG survives
    logits = np.log(np.array([0.05, 0.05, 0.05, 0.85], dtype=np.float32))
    out = inf.apply(st, logits.copy())
    assert np.isfinite(out[3]) and np.isneginf(out[:3]).all()


# ---------------------------------------------------------------------------
# reasoning budget (reference common/reasoning-budget.cpp)


def test_reasoning_budget_state_machine():
    from llama_cpp_tpu.sampling.samplers import ReasoningBudget

    START, END_A, END_B, FORCE = [1, 2], [3], [9, 3], [7, 3]
    rb = ReasoningBudget([START], [END_A, END_B], FORCE, budget=3)
    logits = np.zeros(16, np.float32)

    # IDLE: passthrough, watching for start
    assert np.array_equal(rb.apply(None, logits.copy()), logits)
    rb.accept(None, 1)
    assert rb.state_ == rb.IDLE
    rb.accept(None, 2)  # start seq complete
    assert rb.state_ == rb.COUNTING

    # COUNTING: 3 tokens allowed
    rb.accept(None, 5)
    rb.accept(None, 6)
    assert rb.state_ == rb.COUNTING
    rb.accept(None, 5)  # budget exhausted
    assert rb.state_ == rb.FORCING

    # FORCING: only forced token survives masking
    out = rb.apply(None, logits.copy())
    assert np.isfinite(out[7]) and not np.isfinite(out[5])
    rb.accept(None, 7)
    out = rb.apply(None, logits.copy())
    assert np.isfinite(out[3]) and not np.isfinite(out[7])
    rb.accept(None, 3)
    assert rb.state_ == rb.DONE

    # DONE: passthrough; re-arms on a new start sequence
    assert np.array_equal(rb.apply(None, logits.copy()), logits)
    rb.accept(None, 1)
    rb.accept(None, 2)
    assert rb.state_ == rb.COUNTING


def test_reasoning_budget_natural_end():
    from llama_cpp_tpu.sampling.samplers import ReasoningBudget

    rb = ReasoningBudget([[1]], [[9, 3]], [7], budget=100)
    rb.accept(None, 1)
    assert rb.state_ == rb.COUNTING
    rb.accept(None, 9)
    rb.accept(None, 3)  # natural end sequence
    assert rb.state_ == rb.DONE
    assert rb.end_match == [9, 3]


def test_reasoning_budget_utf8_wait():
    from llama_cpp_tpu.sampling.samplers import ReasoningBudget

    pieces = {5: b"\xe2\x82", 6: b"\xac", 1: b"<t>", 8: b"x"}
    rb = ReasoningBudget([[1]], [[3]], [7], budget=1,
                         piece_bytes=lambda t: pieces.get(t, b""))
    rb.accept(None, 1)
    rb.accept(None, 5)  # budget hits 0 mid-euro-sign
    assert rb.state_ == rb.WAITING_UTF8
    rb.accept(None, 6)  # completes the codepoint
    assert rb.state_ == rb.FORCING


def test_reasoning_budget_in_chain():
    from llama_cpp_tpu.sampling.samplers import (ReasoningBudget,
                                                 SamplerChain,
                                                 SamplingParams)

    p = SamplingParams(temp=0.0)
    chain = SamplerChain.from_params(p)
    chain.samplers.insert(0, ReasoningBudget([[2]], [[3]], [3], budget=1))
    v = 8
    # model "wants" token 5 forever
    logits = np.full(v, -1.0, np.float32)
    logits[5] = 10.0
    assert chain.sample(logits.copy()) == 5  # IDLE
    chain.accept(2)  # prompt/think opener arrives via accept
    assert chain.sample(logits.copy()) == 5  # budget 1: allowed
    assert chain.sample(logits.copy()) == 3  # forced close
    assert chain.sample(logits.copy()) == 5  # DONE passthrough


def test_gguf_embedded_sampling_defaults():
    """general.sampling.* model-embedded defaults (reference
    llama-arch.cpp:157-168): unset fields take the GGUF value; explicit
    fields win."""
    from llama_cpp_tpu.sampling.samplers import SamplingParams

    md = {"general.sampling.temp": 0.3, "general.sampling.top_k": 12,
          "general.sampling.min_p": 0.11,
          "general.sampling.mirostat": 2,
          "general.sampling.mirostat_tau": 4.0}
    p = SamplingParams().apply_gguf_defaults(md)
    assert p.temp == 0.3 and p.top_k == 12 and p.min_p == 0.11
    assert p.mirostat == 2 and p.mirostat_tau == 4.0
    assert p.top_p == SamplingParams().top_p  # untouched

    q = SamplingParams(temp=1.5).apply_gguf_defaults(md, explicit={"temp"})
    assert q.temp == 1.5 and q.top_k == 12
