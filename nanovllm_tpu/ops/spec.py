"""Speculative decoding device ops: prompt-lookup drafting and greedy verify.

No reference analogue — nano-vllm has no speculative decoding (vLLM's
equivalent is its ``speculative_config={"method": "ngram"}`` prompt-lookup
mode). TPU-first design: drafting, verification, and acceptance all run
ON DEVICE inside the spec step program, so the async pipeline's no-host-sync
property survives — the host learns accepted counts only at ring drains and
tracks lengths pessimistically in between (engine/scheduler side).

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


def head_argmax(h: jax.Array, w, chunk: int = 8192):
    """Greedy next-token (max logit, argmax id) per row: argmax_v of
    ``h @ w[v].T`` WITHOUT
    materializing the [rows, V] logits (the verify pass scores
    S*(K+1) rows — full f32 logits would be GBs at bench shapes).

    Chunked over vocab with a running (max, index); strict ``>`` keeps the
    first maximum, matching ``jnp.argmax`` tie-breaking, and the clamped
    last chunk's overlap rows recompute identical values so they never
    steal a tie. Handles every LM-head weight form via quant.head_matmul.
    """
    v = quant.shape_of(w)[0]
    chunk = min(v, chunk)
    n_chunks = -(-v // chunk)

    def slice_w(start):
        if isinstance(w, quant.QuantWeight):
            return quant.QuantWeight(
                q=jax.lax.dynamic_slice_in_dim(w.q, start, chunk, 0),
                scale=jax.lax.dynamic_slice_in_dim(w.scale, start, chunk, 0),
                mode=w.mode,
            )
        return jax.lax.dynamic_slice_in_dim(w, start, chunk, 0)

    def body(i, carry):
        best, idx = carry
        start = jnp.minimum(i * chunk, v - chunk)
        logits = quant.head_matmul(h, slice_w(start))  # [rows, chunk] f32
        cbest = jnp.max(logits, axis=-1)
        cidx = jnp.argmax(logits, axis=-1).astype(jnp.int32) + start
        take = cbest > best
        return jnp.where(take, cbest, best), jnp.where(take, cidx, idx)

    best = jnp.full((h.shape[0],), -jnp.inf, jnp.float32)
    idx = jnp.zeros((h.shape[0],), jnp.int32)
    best, idx = jax.lax.fori_loop(0, n_chunks, body, (best, idx))
    return best, idx


def head_argmax_tp(h: jax.Array, w, axis: str | None,
                   chunk: int = 8192) -> jax.Array:
    """``head_argmax`` under tensor parallelism: inside a shard_map each rank
    holds a rank-blocked vocab shard of ``w`` (rank r owns global rows
    [r*Vs, (r+1)*Vs) — utils/loader.py fuses rank-blocked, and the normal
    logits path all-gathers shards back into global order). Combine local
    (max, argmax) across ranks: the all-gathered rank axis is ordered, so
    taking the first maximal rank preserves jnp.argmax's lowest-global-index
    tie-breaking."""
    best, idx = head_argmax(h, w, chunk=chunk)
    if axis is None:
        return idx
    vs = quant.shape_of(w)[0]  # local (per-rank) vocab rows
    idx = idx + jax.lax.axis_index(axis).astype(jnp.int32) * vs
    bests = jax.lax.all_gather(best, axis)           # [tp, rows]
    idxs = jax.lax.all_gather(idx, axis)
    r = jnp.argmax(bests, axis=0)                    # first max: lowest rank
    return jnp.take_along_axis(idxs, r[None, :], axis=0)[0]


def accept_drafts(qtok: jax.Array, am: jax.Array, eligible: jax.Array,
                  sampled0: jax.Array):
    """Greedy acceptance: ``qtok`` i32[S, K+1] holds [last_token, d_1..d_K],
    ``am`` i32[S, K+1] the model argmax after each prefix. Draft d_{j+1}
    is accepted iff every earlier draft matched and d_{j+1} == am[:, j].

    Returns (emitted i32[S, K+1], count i32[S]): ``count`` = accepted + 1
    (the +1 is the model's own token at the first mismatch — the standard
    "bonus"/corrective token, so every step emits at least one token).
    Ineligible rows (temperature > 0, logit_bias, ...) force count == 1 with
    ``sampled0`` (the normal sampler's token for the row's first position)
    as the single emission. Entries beyond count are 0.
    """
    s, k1 = qtok.shape
    k = k1 - 1
    match = (qtok[:, 1:] == am[:, :k]) & eligible[:, None]
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1)       # [S, K]
    a = jnp.sum(acc, axis=1)                                  # accepted
    j = jnp.arange(k1)[None, :]
    bonus = jnp.take_along_axis(am, a[:, None], axis=1)[:, 0]
    bonus = jnp.where(eligible, bonus, sampled0)
    emitted = jnp.where(
        j < a[:, None],
        jnp.roll(qtok, -1, axis=1),  # column j -> draft d_{j+1}
        jnp.where(j == a[:, None], bonus[:, None], 0),
    )
    return emitted, a + 1
