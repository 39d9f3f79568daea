"""Speculative-decoding device ops: drafting, the fused verify-stats pass,
greedy acceptance, and exact rejection-sampling acceptance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops import quant
from nanovllm_tpu.ops.sampling import head_sample
from nanovllm_tpu.ops.spec import (
    emit_tokens, head_verify_stats, head_verify_stats_tp, ngram_propose,
    verify_accept)


def _ref_propose(h, n, k):
    h = list(h[:n])
    if n < 3:
        return [-1] * k
    a, b = h[-2], h[-1]
    for p in range(n - 3, -1, -1):
        if h[p] == a and h[p + 1] == b:
            out = h[p + 2: p + 2 + k]
            return out + [-1] * (k - len(out))
    return [-1] * k


def test_ngram_propose_matches_reference():
    rng = np.random.default_rng(0)
    s, l, k = 32, 64, 4
    hist = rng.integers(0, 6, (s, l)).astype(np.int32)  # small vocab: matches
    lens = rng.integers(0, l + 1, s).astype(np.int32)
    out = np.asarray(ngram_propose(jnp.asarray(hist), jnp.asarray(lens), k))
    for i in range(s):
        assert out[i].tolist() == _ref_propose(hist[i], int(lens[i]), k), i


def test_ngram_propose_excludes_tail_self_match():
    h = np.zeros((1, 16), np.int32)
    h[0, :6] = [9, 1, 2, 7, 1, 2]
    out = np.asarray(ngram_propose(jnp.asarray(h), jnp.asarray([6]), 3))
    assert out[0].tolist() == [7, 1, 2]  # matched at p=1, NOT the tail itself


@pytest.mark.parametrize("mode", [None, "int8", "int4", "fp8"])
def test_head_verify_stats_matches_full_logits(mode):
    rng = np.random.default_rng(1)
    r, d, v = 24, 64, 1000
    h = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    wf = rng.standard_normal((v, d)).astype(np.float32)
    if mode is None:
        w = jnp.asarray(wf, jnp.bfloat16)
    else:
        qw = quant.quantize_array(wf, mode, axis=1)
        w = quant.QuantWeight(
            q=jnp.asarray(np.asarray(qw.q)), scale=jnp.asarray(qw.scale),
            mode=mode,
        )
    temps = jnp.asarray(
        rng.choice([0.0, 0.5, 1.0, 1.7], size=r), jnp.float32
    )
    check = jnp.asarray(
        np.where(rng.random(r) < 0.2, -1, rng.integers(0, v, r)), jnp.int32
    )
    logits = np.asarray(quant.head_matmul(h, w), np.float32)
    scaled = logits / np.maximum(np.asarray(temps), 1e-6)[:, None]
    exp_idx = np.argmax(scaled, axis=-1)
    exp_lse = np.log(np.sum(np.exp(scaled - scaled.max(-1, keepdims=True)),
                            axis=-1)) + scaled.max(-1)
    exp_chk = np.where(
        np.asarray(check) >= 0,
        scaled[np.arange(r), np.maximum(np.asarray(check), 0)],
        -np.inf,
    )
    # chunk=300 also exercises the clamped-overlap last chunk (1000 % 300):
    # the logsumexp must mask re-visited columns, not double-count them.
    for chunk in (128, 300, 8192):
        best, idx, lse, chk = head_verify_stats(h, w, check, temps, chunk)
        np.testing.assert_array_equal(np.asarray(idx), exp_idx)
        np.testing.assert_allclose(np.asarray(lse), exp_lse, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(chk), exp_chk, rtol=2e-5)
        # the tp entry point returns (argmax, logp) directly
        am, logp = head_verify_stats_tp(h, w, check, temps, None, chunk)
        np.testing.assert_array_equal(np.asarray(am), exp_idx)
        np.testing.assert_allclose(
            np.asarray(logp), exp_chk - exp_lse, rtol=2e-5, atol=1e-5
        )


def test_head_verify_stats_tp_matches_single_device():
    """Vocab-sharded combine (shard_map over the 8-device CPU mesh) must
    reproduce the single-device argmax ids and draft logprobs."""
    from jax.sharding import Mesh, PartitionSpec as P

    from nanovllm_tpu.engine.model_runner import _shard_map

    rng = np.random.default_rng(2)
    r, d, v = 16, 32, 512
    h = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    temps = jnp.asarray(rng.choice([0.0, 0.8], size=r), jnp.float32)
    check = jnp.asarray(rng.integers(-1, v, r), jnp.int32)
    am1, lp1 = head_verify_stats_tp(h, w, check, temps, None)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("tp",))
    f = _shard_map(
        lambda hh, ww, cc, tt: head_verify_stats_tp(hh, ww, cc, tt, "tp"),
        mesh=mesh,
        in_specs=(P(), P("tp"), P(), P()),
        out_specs=P(),
    )
    am4, lp4 = f(h, w, check, temps)
    np.testing.assert_array_equal(np.asarray(am4), np.asarray(am1))
    np.testing.assert_allclose(np.asarray(lp4), np.asarray(lp1),
                               rtol=2e-5, atol=1e-5)


def test_verify_accept_greedy():
    # qtok rows: [last, d1, d2, d3]; am rows: model prediction after each
    # prefix. Row 0: all drafts match -> emit d1 d2 d3 + bonus am[3].
    # Row 1: d2 mismatches -> emit d1 + corrective am[1]. Row 2: immediate
    # mismatch -> emit am[0]. Row 3: ineligible -> corrective only.
    # Row 4: -1 drafts (no ngram match) never equal an argmax.
    qtok = jnp.asarray([
        [5, 10, 11, 12],
        [5, 10, 99, 12],
        [5, 77, 11, 12],
        [5, 10, 11, 12],
        [5, -1, -1, -1],
    ], jnp.int32)
    am = jnp.asarray([[10, 11, 12, 13]] * 5, jnp.int32)
    eligible = jnp.asarray([True, True, True, False, True])
    temps = jnp.zeros(5, jnp.float32)
    logp = jnp.zeros((5, 3), jnp.float32)   # unused on greedy rows
    logu = jnp.zeros((5, 3), jnp.float32)
    a, excl = verify_accept(qtok, am, logp, logu, temps, eligible)
    assert a.tolist() == [3, 1, 0, 0, 0]
    # greedy rows never exclude (the corrective argmax is exact already)
    assert excl.tolist() == [-1] * 5
    corrective = jnp.take_along_axis(am, a[:, None], axis=1)[:, 0]
    corrective = corrective.at[3].set(42)  # ineligible row samples normally
    emitted, cnt = emit_tokens(qtok, a, corrective)
    assert cnt.tolist() == [4, 2, 1, 1, 1]
    assert np.asarray(emitted).tolist() == [
        [10, 11, 12, 13],
        [10, 11, 0, 0],
        [10, 0, 0, 0],
        [42, 0, 0, 0],
        [10, 0, 0, 0],
    ]


def test_verify_accept_rejection_rule():
    """Sampled rows: accept iff log u < log p (prefix-cumulative), exclusion
    is the first rejected draft — unless it was a no-draft (-1) or the row
    fully accepted."""
    qtok = jnp.asarray([
        [5, 10, 11, 12],
        [5, 10, 11, 12],
        [5, -1, -1, -1],
        [5, 10, 11, 12],
    ], jnp.int32)
    am = jnp.zeros((4, 4), jnp.int32)
    logp = jnp.log(jnp.asarray([
        [0.9, 0.2, 0.9],
        [0.9, 0.9, 0.9],
        [0.9, 0.9, 0.9],
        [0.5, 0.5, 0.5],
    ], jnp.float32))
    logu = jnp.log(jnp.asarray([
        [0.5, 0.5, 0.5],   # d1 accepted (0.5<0.9), d2 rejected (0.5>=0.2)
        [0.5, 0.5, 0.5],   # all accepted
        [0.5, 0.5, 0.5],   # no drafts: nothing to accept
        [0.6, 0.1, 0.1],   # d1 rejected immediately (0.6 >= 0.5)
    ], jnp.float32))
    temps = jnp.full(4, 0.7, jnp.float32)
    eligible = jnp.asarray([True, True, True, True])
    a, excl = verify_accept(qtok, am, logp, logu, temps, eligible)
    assert a.tolist() == [1, 3, 0, 0]
    # row 0 rejected d2=11 -> residual bans 11; row 1 bonus -> no ban;
    # row 2 rejected a -1 no-draft -> no ban; row 3 rejected d1=10.
    assert excl.tolist() == [11, -1, -1, 10]


def _target_probs(h_row, w, temp):
    logits = np.asarray(quant.head_matmul(h_row[None], w), np.float64)[0]
    z = logits / temp
    z -= z.max()
    p = np.exp(z)
    return p / p.sum()


def test_rejection_sampling_distribution_exact():
    """The VERDICT r4 #2 'done' oracle: wire the full verify chain exactly as
    the model runner does (stats -> uniforms -> accept -> excluded
    head_sample -> emit) and check the EMITTED first token's empirical
    distribution equals the plain sampler's target softmax — the defining
    guarantee of rejection-sampling speculative decoding. With a
    deterministic proposal the marginal P(emitted_0 = x) must equal p_0(x)
    for every x: p_0(d) via acceptance, (1-p_0(d)) * p_0(x)/(1-p_0(d))
    via the residual."""
    rng = np.random.default_rng(3)
    d_model, v, ql = 16, 24, 3
    temp = 0.8
    h = jnp.asarray(rng.standard_normal((ql, d_model)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((v, d_model)), jnp.float32)
    p0 = _target_probs(np.asarray(h)[0], w, temp)
    draft1 = int(np.argsort(-p0)[1])  # a likely (but not top) draft
    drafts = jnp.asarray([[draft1, int(np.argmax(p0))]], jnp.int32)
    qtok = jnp.concatenate(
        [jnp.asarray([[7]], jnp.int32), drafts], axis=1
    )                                  # [1, QL]
    temps = jnp.asarray([temp], jnp.float32)
    eligible = jnp.asarray([True])

    @jax.jit
    def run(key):
        check = jnp.concatenate(
            [qtok[:, 1:], jnp.full((1, 1), -1, jnp.int32)], axis=1
        ).reshape(ql)
        am, logp = head_verify_stats_tp(
            h, w, check, jnp.repeat(temps, ql), None
        )
        am = am.reshape(1, ql)
        logp = logp.reshape(1, ql)[:, : ql - 1]
        ukey, skey = jax.random.split(key)
        logu = jnp.log(jax.random.uniform(ukey, (1, ql - 1), jnp.float32))
        a, excl = verify_accept(qtok, am, logp, logu, temps, eligible)
        corrective = head_sample(
            h[a], w, temps, skey, exclude=excl
        )
        emitted, cnt = emit_tokens(qtok, a, corrective)
        return emitted[0], cnt[0]

    n = 6000
    keys = jax.random.split(jax.random.key(0), n)
    emitted, cnt = jax.vmap(run)(keys)
    emitted = np.asarray(emitted)
    cnt = np.asarray(cnt)
    # Acceptance frequency of d1 must be p0(d1).
    acc_rate = float(np.mean(cnt >= 2))
    assert abs(acc_rate - p0[draft1]) < 0.025, (acc_rate, p0[draft1])
    # Marginal distribution of the first emitted token == p0.
    counts = np.bincount(emitted[:, 0], minlength=v) / n
    tv = 0.5 * np.abs(counts - p0).sum()
    assert tv < 0.05, tv
    # Conditional second-token distribution (given d1 accepted) == p1.
    p1 = _target_probs(np.asarray(h)[1], w, temp)
    second = emitted[cnt >= 2, 1]
    counts1 = np.bincount(second, minlength=v) / len(second)
    tv1 = 0.5 * np.abs(counts1 - p1).sum()
    assert tv1 < 0.08, tv1


def test_head_sample_exclusion():
    """exclude bans exactly one global id; <0 bans nothing; greedy rows with
    a banned argmax fall to the runner-up."""
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((100, 8)), jnp.float32)
    logits = np.asarray(quant.head_matmul(h, w))
    top = np.argmax(logits, axis=1)
    second = np.argsort(-logits, axis=1)[:, 1]
    temps = jnp.zeros(3, jnp.float32)  # greedy: noise-free, deterministic
    key = jax.random.key(0)
    excl = jnp.asarray([int(top[0]), -1, int(second[2])], jnp.int32)
    out = np.asarray(head_sample(h, w, temps, key, exclude=excl))
    assert out[0] == second[0]      # banned argmax -> runner-up
    assert out[1] == top[1]         # no ban
    assert out[2] == top[2]         # banning a non-argmax changes nothing
