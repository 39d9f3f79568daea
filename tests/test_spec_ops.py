"""Speculative-decoding device ops: drafting, chunked argmax, acceptance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops import quant
from nanovllm_tpu.ops.spec import accept_drafts, head_argmax, ngram_propose


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
def test_head_argmax_matches_full_logits(mode):
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
    exp = np.asarray(jnp.argmax(quant.head_matmul(h, w), axis=-1))
    # chunk=300 also exercises the clamped-overlap last chunk (1000 % 300).
    for chunk in (128, 300, 8192):
        got = np.asarray(head_argmax(h, w, chunk=chunk)[1])
        np.testing.assert_array_equal(got, exp)


def test_accept_drafts():
    # qtok rows: [last, d1, d2, d3]; am rows: model prediction after each
    # prefix. Row 0: all drafts match -> emit d1 d2 d3 + bonus am[3].
    # Row 1: d2 mismatches -> emit d1 + corrective am[1]. Row 2: immediate
    # mismatch -> emit am[0]. Row 3: ineligible -> emit sampled0 only.
    # Row 4: -1 drafts (no ngram match) never equal an argmax.
    qtok = jnp.asarray([
        [5, 10, 11, 12],
        [5, 10, 99, 12],
        [5, 77, 11, 12],
        [5, 10, 11, 12],
        [5, -1, -1, -1],
    ], jnp.int32)
    am = jnp.asarray([
        [10, 11, 12, 13],
        [10, 11, 12, 13],
        [10, 11, 12, 13],
        [10, 11, 12, 13],
        [10, 11, 12, 13],
    ], jnp.int32)
    eligible = jnp.asarray([True, True, True, False, True])
    sampled0 = jnp.asarray([42, 42, 42, 42, 42], jnp.int32)
    emitted, cnt = accept_drafts(qtok, am, eligible, sampled0)
    assert cnt.tolist() == [4, 2, 1, 1, 1]
    assert np.asarray(emitted).tolist() == [
        [10, 11, 12, 13],
        [10, 11, 0, 0],
        [10, 0, 0, 0],
        [42, 0, 0, 0],
        [10, 0, 0, 0],
    ]
