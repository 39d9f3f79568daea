"""Speculative decoding device ops: prompt-lookup drafting and verification
(greedy token-identity for temperature==0 rows, exact rejection-sampling
acceptance for temperature>0 rows).

No reference analogue — nano-vllm has no speculative decoding (vLLM's
equivalent is its ``speculative_config={"method": "ngram"}`` prompt-lookup
mode). TPU-first design: drafting, verification, and acceptance all run
ON DEVICE inside the spec step program, so the async pipeline's no-host-sync
property survives — the host learns accepted counts only at ring drains and
tracks lengths pessimistically in between (engine/scheduler side).

Rejection-sampling acceptance (the Leviathan/Chen speculative-sampling rule,
specialized to a DETERMINISTIC draft proposal): draft d at position j is
accepted with probability p_j(d) (the temperature-scaled softmax probability
the target model assigns it); on the first rejection the corrective token is
drawn from the residual distribution, which for a deterministic proposal is
exactly p_j with d removed and renormalized (Gumbel argmax with d masked).
The emitted-token distribution is provably identical to plain sampling,
position by position.

The verify pass itself is the ragged prefill kernel: a K+1-token "chunk"
per sequence (its last known token + K drafts) at q_tile=8, with fused KV
appends. Rejected drafts' KV rows are overwritten by the next step's appends
(each step appends K+1 rows starting at its true last position, which is
always at or below the previous step's append frontier).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops import quant


def ngram_propose(hist: jax.Array, lens: jax.Array, k: int) -> jax.Array:
    """Prompt-lookup drafting (vLLM ngram method, bigram match).

    ``hist``: i32[S, L] per-row token history (rows valid in [0, lens[i])).
    For each row, find the MOST RECENT earlier occurrence of the row's final
    bigram and propose the k tokens that followed it. Rows without a match
    (or shorter than 3 tokens) propose -1, which can never equal a model
    argmax (token ids are >= 0), so every such draft auto-rejects and the
    step degenerates to a normal 1-token decode for that row.

    One vectorized compare over the whole history buffer — O(S*L) VPU work
    and S*L*4 bytes of reads per step; L is the lookup cap
    (config.spec_lookup_max), not max_model_len.
    """
    s, l = hist.shape
    idx = jnp.arange(l)
    rows = jnp.arange(s)
    a = hist[rows, jnp.maximum(lens - 2, 0)]
    b = hist[rows, jnp.maximum(lens - 1, 0)]
    m = (hist == a[:, None]) & (jnp.roll(hist, -1, axis=1) == b[:, None])
    m &= (idx[None, :] + 1) < (lens - 1)[:, None]  # strictly before the tail
    m &= lens[:, None] >= 3
    p = jnp.max(jnp.where(m, idx[None, :], -1), axis=1)  # most recent match
    gpos = p[:, None] + 2 + jnp.arange(k)[None, :]
    drafts = jnp.take_along_axis(hist, jnp.clip(gpos, 0, l - 1), axis=1)
    ok = (p >= 0)[:, None] & (gpos < lens[:, None])
    return jnp.where(ok, drafts, -1)


def head_verify_stats(h: jax.Array, w, check_ids: jax.Array,
                      temps: jax.Array, chunk: int = 8192,
                      v_start=None):
    """One chunked fused pass over the LM head serving BOTH acceptance rules:
    per row, (max scaled logit, argmax id, logsumexp of scaled logits,
    scaled logit of ``check_ids[row]``), with scaled = logits / max(T, 1e-6).
    Greedy rows use the argmax; sampled rows use
    logp(draft) = check - lse. Nothing [rows, V]-shaped materializes
    (the verify pass scores S*(K+1) rows — full f32 logits would be GBs).

    ``check_ids`` are GLOBAL token ids compared against ``v_start`` + local
    column (``v_start`` = this rank's first vocab row under TP; default 0);
    ids outside the local range yield -inf. The clamped last chunk masks its
    re-visited overlap columns out of the logsumexp (max/argmax are
    idempotent under recompute; logsumexp is not).
    """
    rows = h.shape[0]
    v = quant.shape_of(w)[0]
    chunk = min(v, chunk)
    n_chunks = -(-v // chunk)
    if v_start is None:
        v_start = jnp.int32(0)
    t = jnp.maximum(temps, 1e-6)[:, None]

    def slice_w(start):
        if isinstance(w, quant.QuantWeight):
            return quant.QuantWeight(
                q=jax.lax.dynamic_slice_in_dim(w.q, start, chunk, 0),
                scale=jax.lax.dynamic_slice_in_dim(w.scale, start, chunk, 0),
                mode=w.mode,
            )
        return jax.lax.dynamic_slice_in_dim(w, start, chunk, 0)

    def body(i, carry):
        best, idx, lse, chk = carry
        start = jnp.minimum(i * chunk, v - chunk)
        logits = quant.head_matmul(h, slice_w(start)).astype(jnp.float32)
        scaled = logits / t
        col = start + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        cbest = jnp.max(scaled, axis=-1)
        cidx = jnp.argmax(scaled, axis=-1).astype(jnp.int32) + start
        take = cbest > best
        fresh = col >= i * chunk  # last chunk: drop re-visited overlap cols
        clse = jax.scipy.special.logsumexp(
            jnp.where(fresh, scaled, -jnp.inf), axis=-1
        )
        lse = jnp.logaddexp(lse, clse)
        hit = (col + v_start) == check_ids[:, None]
        chk = jnp.maximum(chk, jnp.max(
            jnp.where(hit, scaled, -jnp.inf), axis=-1
        ))
        return (jnp.where(take, cbest, best), jnp.where(take, cidx, idx),
                lse, chk)

    init = (
        jnp.full((rows,), -jnp.inf, jnp.float32),
        jnp.zeros((rows,), jnp.int32),
        jnp.full((rows,), -jnp.inf, jnp.float32),
        jnp.full((rows,), -jnp.inf, jnp.float32),
    )
    return jax.lax.fori_loop(0, n_chunks, body, init)


def head_verify_stats_tp(h: jax.Array, w, check_ids: jax.Array,
                         temps: jax.Array, axis: str | None,
                         chunk: int = 8192):
    """``head_verify_stats`` combined across a vocab-sharded LM head:
    returns (argmax ids i32[rows] in GLOBAL vocab order, draft logprobs
    f32[rows] = log softmax(scaled_logits)[check_ids]). Under ``axis`` the
    argmax combines by first-maximal-rank (= lowest
    global index on the rank-blocked layout), the logsumexp combines as
    logsumexp-of-partials, and the check logit is a max over ranks (exactly
    one rank's range contains the id; the rest hold -inf)."""
    if axis is None:
        best, idx, lse, chk = head_verify_stats(h, w, check_ids, temps, chunk)
        return idx, chk - lse
    vs = quant.shape_of(w)[0]
    v_start = jax.lax.axis_index(axis).astype(jnp.int32) * vs
    best, idx, lse, chk = head_verify_stats(
        h, w, check_ids, temps, chunk, v_start=v_start
    )
    idx = idx + v_start
    bests = jax.lax.all_gather(best, axis)           # [tp, rows]
    idxs = jax.lax.all_gather(idx, axis)
    r = jnp.argmax(bests, axis=0)                    # first max: lowest rank
    am = jnp.take_along_axis(idxs, r[None, :], axis=0)[0]
    lse_g = jax.scipy.special.logsumexp(jax.lax.all_gather(lse, axis), axis=0)
    chk_g = jnp.max(jax.lax.all_gather(chk, axis), axis=0)
    return am, chk_g - lse_g


def verify_accept(qtok: jax.Array, am: jax.Array, logp: jax.Array,
                  logu: jax.Array, temperatures: jax.Array,
                  eligible: jax.Array):
    """Acceptance rule for the verify pass. ``qtok`` i32[S, K+1] holds
    [last_token, d_1..d_K]; ``am`` i32[S, K+1] the model argmax after each
    prefix; ``logp`` f32[S, K] the temperature-scaled log-probability of
    draft d_{j+1} under position j's distribution; ``logu`` f32[S, K]
    log of i.i.d. Uniform(0,1) draws.

    Greedy rows (T == 0) accept d_{j+1} iff it equals the argmax — emitted
    streams are bit-identical to plain greedy decode. Sampled rows accept
    with probability p_j(d_{j+1}) (``logu < logp``) — the exact
    rejection-sampling rule for a deterministic proposal. Acceptance is
    prefix-cumulative either way.

    Returns (a i32[S] accepted-draft counts, exclude i32[S]): ``exclude`` is
    the token the corrective sample must ban (-1 = none), i.e. the rejected
    draft for a sampled-row genuine rejection — the residual distribution is
    p with that token removed. Greedy rows, fully-accepted rows (bonus
    position), no-draft rejections (d == -1), and ineligible rows ban
    nothing.
    """
    s, k1 = qtok.shape
    k = k1 - 1
    greedy = temperatures <= 0.0
    match = jnp.where(greedy[:, None], qtok[:, 1:] == am[:, :k], logu < logp)
    match &= (qtok[:, 1:] >= 0) & eligible[:, None]
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1)       # [S, K]
    a = jnp.sum(acc, axis=1)                                  # accepted
    rej = jnp.take_along_axis(qtok, jnp.minimum(a + 1, k)[:, None], axis=1)[:, 0]
    exclude = jnp.where(greedy | (a >= k) | ~eligible, -1, rej)
    return a, exclude


def emit_tokens(qtok: jax.Array, a: jax.Array, corrective: jax.Array):
    """Build the emitted-token rows: the ``a`` accepted drafts followed by
    the corrective/bonus token (position ``a``'s sample — for greedy rows the
    argmax, for sampled rows the residual/plain sample). Every step emits at
    least one token; entries beyond count are 0.

    Returns (emitted i32[S, K+1], count i32[S] = a + 1)."""
    k1 = qtok.shape[1]
    j = jnp.arange(k1)[None, :]
    emitted = jnp.where(
        j < a[:, None],
        jnp.roll(qtok, -1, axis=1),  # column j -> draft d_{j+1}
        jnp.where(j == a[:, None], corrective[:, None], 0),
    )
    return emitted, a + 1
