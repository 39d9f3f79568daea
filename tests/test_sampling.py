"""Unit tests for the on-device sampler (ops/sampling.py).

Parity base: reference ``nanovllm/layers/sampler.py:8-12`` (Gumbel-trick
temperature sampling). Extensions under test: greedy rows (temperature 0)
and per-sequence top-k / top-p filtering (``sample_topk_topp``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.sampling import TOPK_WINDOW, sample, sample_topk_topp

S, V = 4, 97


def _logits(seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (S, V)) * 3.0


def _draw(fn, n=200):
    """Collect per-row sample sets over n keys."""
    out = [set() for _ in range(S)]
    for i in range(n):
        toks = np.asarray(fn(jax.random.PRNGKey(1000 + i)))
        for r in range(S):
            out[r].add(int(toks[r]))
    return out


def test_greedy_rows_are_argmax():
    logits = _logits()
    temps = jnp.zeros(S)
    toks = sample(logits, temps, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks), np.argmax(logits, -1))
    # Filtered variant must agree on greedy rows regardless of k/p.
    toks_f = sample_topk_topp(
        logits, temps, jax.random.PRNGKey(0),
        jnp.full(S, 5, jnp.int32), jnp.full(S, 0.3),
    )
    np.testing.assert_array_equal(np.asarray(toks_f), np.argmax(logits, -1))


def test_topk_restricts_support():
    logits = _logits(1)
    temps = jnp.full(S, 1.5)  # hot: unrestricted sampling roams widely
    ks = jnp.asarray([1, 2, 5, 0], jnp.int32)
    sets = _draw(lambda key: sample_topk_topp(
        logits, temps, key, ks, jnp.ones(S)))
    order = np.argsort(-np.asarray(logits), -1)
    assert sets[0] == {int(order[0, 0])}
    assert sets[1] <= set(order[1, :2].tolist()) and len(sets[1]) == 2
    assert sets[2] <= set(order[2, :5].tolist()) and len(sets[2]) >= 3
    # k=0 disables the limit -> support bounded only by the candidate window.
    assert len(sets[3]) > 5
    assert sets[3] <= set(order[3, :TOPK_WINDOW].tolist())


def test_topp_restricts_to_nucleus():
    logits = _logits(2)
    temps = jnp.ones(S)
    ps = jnp.full(S, 0.5)
    sets = _draw(lambda key: sample_topk_topp(
        logits, temps, key, jnp.zeros(S, jnp.int32), ps))
    probs = np.asarray(jax.nn.softmax(logits, -1), np.float64)
    for r in range(S):
        order = np.argsort(-probs[r])
        cum = np.cumsum(probs[r][order])
        # nucleus = tokens whose preceding cumulative mass < p
        n = int(np.searchsorted(cum, 0.5)) + 1
        assert sets[r] <= set(order[:n].tolist())
    # p=1.0 with k=0 must not restrict beyond the window.
    sets_open = _draw(lambda key: sample_topk_topp(
        logits, temps, key, jnp.zeros(S, jnp.int32), jnp.ones(S)), n=100)
    assert all(len(s) > 3 for s in sets_open)


def test_defaults_match_plain_sampler_distribution():
    """With k=0, p=1 the filtered sampler draws from the same distribution
    (same key -> same Gumbel shape -> identical argmax within the window
    whenever the plain winner is inside the top-TOPK_WINDOW set, which at
    V<=window is always)."""
    logits = _logits(3)[:, : TOPK_WINDOW]  # V == window: supports identical
    temps = jnp.asarray([0.7, 1.0, 1.3, 2.0])
    for i in range(20):
        key = jax.random.PRNGKey(i)
        a = np.asarray(sample(logits, temps, key))
        # Same per-row marginal: compare empirically via frequency on row 0.
        b = np.asarray(sample_topk_topp(
            logits, temps, key, jnp.zeros(S, jnp.int32), jnp.ones(S)))
        assert a.shape == b.shape
    # Frequency check: top-1 token should be the modal sample for both.
    freq_a = np.zeros(TOPK_WINDOW)
    freq_b = np.zeros(TOPK_WINDOW)
    for i in range(300):
        key = jax.random.PRNGKey(i)
        freq_a[int(np.asarray(sample(logits, temps, key))[1])] += 1
        freq_b[int(np.asarray(sample_topk_topp(
            logits, temps, key, jnp.zeros(S, jnp.int32), jnp.ones(S)))[1])] += 1
    assert np.argmax(freq_a) == np.argmax(freq_b) == int(np.argmax(logits[1]))


def test_sampling_params_validation():
    from nanovllm_tpu import SamplingParams

    sp = SamplingParams()
    assert not sp.uses_filtering
    assert SamplingParams(top_k=5).uses_filtering
    assert SamplingParams(top_p=0.9).uses_filtering
    with pytest.raises(AssertionError):
        SamplingParams(top_k=-1)
    with pytest.raises(AssertionError):
        SamplingParams(top_p=0.0)
    with pytest.raises(AssertionError):
        SamplingParams(top_p=1.5)


def test_min_p_masks_low_probability_candidates():
    """vLLM min_p: candidates below min_p * p_max are dropped. min_p=1.0
    leaves only the argmax (sampling becomes greedy); min_p=0 is a no-op."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nanovllm_tpu.ops.sampling import sample_topk_topp

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((6, 128)), jnp.float32)
    temps = jnp.ones((6,), jnp.float32)
    ks = jnp.zeros((6,), jnp.int32)
    ps = jnp.ones((6,), jnp.float32)
    key = jax.random.PRNGKey(1)
    strict = sample_topk_topp(
        logits, temps, key, ks, ps, min_ps=jnp.ones((6,), jnp.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(strict), np.asarray(jnp.argmax(logits, axis=-1))
    )
    # min_p=0 must match the no-min_p call bit-for-bit (same noise stream).
    a = sample_topk_topp(logits, temps, key, ks, ps,
                         min_ps=jnp.zeros((6,), jnp.float32))
    b = sample_topk_topp(logits, temps, key, ks, ps)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
