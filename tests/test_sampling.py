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

# The engine always calls the sampler under jit; eager calls would re-trace
# the exact-path lax.cond branches every invocation (minutes over the
# sampling loops below).
sample_topk_topp = jax.jit(sample_topk_topp)

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
    # k=0 disables the limit entirely (exact full-vocab sampling — the row
    # forces the exact branch, and that must not disturb the k-limited rows
    # above, which stay on their window samples).
    assert len(sets[3]) > 5


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


def test_exact_path_flat_distribution():
    """The r3 window path mis-sampled here: 1000 near-equal logits with
    top_p=0.9 have a ~900-token nucleus, far wider than the 64 window. The
    exact path must (a) reach tokens outside the window and (b) stay inside
    the numpy-oracle nucleus."""
    v = 1000
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 0.01, (S, v)), jnp.float32)
    temps = jnp.ones(S)
    ps = jnp.full(S, 0.9)
    seen = [set() for _ in range(S)]
    for i in range(400):
        toks = np.asarray(sample_topk_topp(
            logits, temps, jax.random.PRNGKey(i),
            jnp.zeros(S, jnp.int32), ps,
        ))
        for r in range(S):
            seen[r].add(int(toks[r]))
    probs = np.asarray(jax.nn.softmax(logits, -1), np.float64)
    for r in range(S):
        order = np.argsort(-probs[r], kind="stable")
        cum = np.cumsum(probs[r][order])
        n = int(np.searchsorted(cum, 0.9)) + 1
        nucleus = set(order[:n].tolist())
        assert seen[r] <= nucleus, r
        # ~300 distinct draws over a ~900-token nucleus: far beyond any
        # 64-token window with overwhelming probability.
        assert len(seen[r]) > TOPK_WINDOW, (r, len(seen[r]))


def test_exact_path_large_top_k():
    """top_k > TOPK_WINDOW was silently clamped in r3; now exact."""
    v = 500
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 0.01, (S, v)), jnp.float32)
    temps = jnp.ones(S)
    ks = jnp.full(S, 200, jnp.int32)
    seen = [set() for _ in range(S)]
    for i in range(400):
        toks = np.asarray(sample_topk_topp(
            logits, temps, jax.random.PRNGKey(i), ks, jnp.ones(S)))
        for r in range(S):
            seen[r].add(int(toks[r]))
    for r in range(S):
        order = np.argsort(-np.asarray(logits[r]), kind="stable")
        allowed = set(order[:200].tolist())
        assert seen[r] <= allowed, r
        assert len(seen[r]) > TOPK_WINDOW, (r, len(seen[r]))


def test_sample_tp_bit_identical_to_gathered():
    """Distributed Gumbel argmax over vocab shards (the plain TP decode path
    drops the [S, V] logits all-gather) must reproduce ``sample`` on the
    gathered logits BIT-identically: each rank slices the same counter-based
    noise stream, and rank-blocked (first-max-rank, lowest-local) combining
    is jnp.argmax's lowest-global-index tie-break."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from nanovllm_tpu.ops.sampling import sample_tp

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("tp",))
    s, v = 6, 256
    logits = jax.random.normal(jax.random.PRNGKey(7), (s, v)) * 2.0
    temps = jnp.asarray([0.0, 0.3, 1.0, 1.7, 0.0, 2.5])
    seeds = jnp.asarray([5, -1, 9, -1, -1, 3], jnp.int32)
    pos = jnp.asarray([3, 0, 11, 2, 8, 1], jnp.int32)
    for i in range(12):
        key = jax.random.PRNGKey(100 + i)
        want = sample(logits, temps, key)
        got = shard_map(
            lambda l: sample_tp(l, temps, key, "tp", v),
            mesh=mesh, in_specs=P(None, "tp"), out_specs=P(None),
            check_rep=False,
        )(logits)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), i)
        want_s = sample(logits, temps, key, seeds, pos)
        got_s = shard_map(
            lambda l: sample_tp(l, temps, key, "tp", v, seeds, pos),
            mesh=mesh, in_specs=P(None, "tp"), out_specs=P(None),
            check_rep=False,
        )(logits)
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_sample_topk_topp_tp_matches_unsharded():
    """Sharded filtered sampling (per-rank top-window + lse partials) must
    reproduce the unsharded sampler: candidate values and noise are
    identical, only the normalizer is logsumexp-of-partials — so with
    well-separated logits (no nucleus-boundary ulp ties) tokens match
    exactly, and greedy rows match unconditionally."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from nanovllm_tpu.ops.sampling import sample_topk_topp_tp

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tp",))
    s, v = 6, 256
    logits = jax.random.normal(jax.random.PRNGKey(11), (s, v)) * 3.0
    temps = jnp.asarray([0.0, 0.8, 1.0, 1.4, 0.0, 1.0])
    ks = jnp.asarray([5, 0, 20, 3, 7, 0], jnp.int32)
    ps = jnp.asarray([1.0, 0.7, 0.9, 1.0, 0.5, 1.0])
    mps = jnp.asarray([0.0, 0.0, 0.05, 0.0, 0.0, 0.0])
    for i in range(10):
        key = jax.random.PRNGKey(200 + i)
        want = sample_topk_topp(logits, temps, key, ks, ps, min_ps=mps)
        got = shard_map(
            lambda l: sample_topk_topp_tp(
                l, temps, key, ks, ps, "tp", v, min_ps=mps),
            mesh=mesh, in_specs=P(None, "tp"), out_specs=P(None),
            check_rep=False,
        )(logits)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), i)


def test_sample_topk_topp_tp_exact_branch():
    """Flat logits with top_p=0.9: the nucleus is far wider than the window,
    so the sharded path must take its gather+sort branch and stay inside the
    numpy-oracle nucleus while reaching far beyond the window."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from nanovllm_tpu.ops.sampling import sample_topk_topp_tp

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tp",))
    s, v = 4, 1024
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(0, 0.01, (s, v)), jnp.float32)
    temps = jnp.ones(s)
    ks = jnp.zeros(s, jnp.int32)
    ps = jnp.full(s, 0.9)
    fn = jax.jit(shard_map(
        lambda l, key: sample_topk_topp_tp(l, temps, key, ks, ps, "tp", v),
        mesh=mesh, in_specs=(P(None, "tp"), P()), out_specs=P(None),
        check_rep=False,
    ))
    seen = [set() for _ in range(s)]
    for i in range(300):
        toks = np.asarray(fn(logits, jax.random.PRNGKey(i)))
        for r in range(s):
            seen[r].add(int(toks[r]))
    probs = np.asarray(jax.nn.softmax(logits, -1), np.float64)
    for r in range(s):
        order = np.argsort(-probs[r], kind="stable")
        cum = np.cumsum(probs[r][order])
        n = int(np.searchsorted(cum, 0.9)) + 1
        assert seen[r] <= set(order[:n].tolist()), r
        assert len(seen[r]) > TOPK_WINDOW, (r, len(seen[r]))


def test_head_sample_bit_identical_to_unfused():
    """The fused chunked head+sampler must reproduce sample(head_matmul(..))
    BIT-identically — same dots per chunk, same sliced noise stream, strict->
    running max = jnp.argmax tie-break — including the clamped last chunk's
    overlap (V=300, chunk=128 -> starts 0/128/172) and seeded rows."""
    from nanovllm_tpu.ops import quant
    from nanovllm_tpu.ops.sampling import head_sample

    rng = np.random.default_rng(3)
    s, d, v = 5, 16, 300
    h = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    logits = quant.head_matmul(h, w)
    temps = jnp.asarray([0.0, 0.5, 1.0, 2.0, 1.0])
    seeds = jnp.asarray([3, -1, -1, 9, -1], jnp.int32)
    pos = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
    for i in range(8):
        key = jax.random.PRNGKey(40 + i)
        want = sample(logits, temps, key)
        got = head_sample(h, w, temps, key, chunk=128)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), i)
        want_s = sample(logits, temps, key, seeds, pos)
        got_s = head_sample(h, w, temps, key, chunk=128, seeds=seeds,
                            positions=pos)
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_head_sample_tp_matches_single_chip():
    """Vocab-sharded head_sample (4 ranks) == the unsharded sampler on the
    same weights: the per-rank noise slices come from one global stream and
    the rank combine keeps lowest-global-index ties."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from nanovllm_tpu.ops import quant
    from nanovllm_tpu.ops.sampling import head_sample

    rng = np.random.default_rng(4)
    s, d, v = 4, 16, 256
    h = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    logits = quant.head_matmul(h, w)
    temps = jnp.asarray([0.0, 0.7, 1.3, 1.0])
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tp",))
    for i in range(8):
        key = jax.random.PRNGKey(60 + i)
        want = sample(logits, temps, key)
        got = shard_map(
            lambda wl: head_sample(h, wl, temps, key, axis="tp",
                                   v_total=v, chunk=32),
            mesh=mesh, in_specs=P("tp", None), out_specs=P(None),
            check_rep=False,
        )(w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), i)


def test_window_path_true_normalization():
    """The fast path must use full-softmax probabilities: a peaked
    distribution with top_p covering only the first two tokens in TRUE mass.
    (Window-local softmax would inflate their mass and shrink the nucleus.)"""
    v = 300
    base = np.full((1, v), -3.0, np.float32)
    base[0, 0] = 3.0
    base[0, 1] = 2.0
    base[0, 2] = 1.8
    logits = jnp.asarray(np.repeat(base, S, 0))
    probs = np.asarray(jax.nn.softmax(logits[0]), np.float64)
    # p just above p0 + p1: the TRUE nucleus is {0, 1, 2}.
    p = float(probs[0] + probs[1]) + 1e-4
    seen = set()
    for i in range(300):
        toks = np.asarray(sample_topk_topp(
            logits, jnp.ones(S), jax.random.PRNGKey(i),
            jnp.zeros(S, jnp.int32), jnp.full(S, p)))
        seen |= set(int(t) for t in toks)
    assert seen == {0, 1, 2}, seen
