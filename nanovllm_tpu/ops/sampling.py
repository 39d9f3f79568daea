"""On-device token sampling.

Parity: reference ``nanovllm/layers/sampler.py:8-12`` — temperature-scaled
Gumbel-trick sampling (argmax of ``logits/T + Gumbel`` draws exactly from
``softmax(logits/T)``, equivalent to the reference's Exponential-division
trick). Extensions beyond the reference:
- ``temperature == 0`` rows decode greedily (the reference forbids greedy);
- per-sequence top-k / top-p (nucleus) filtering (``sample_topk_topp``) —
  the engine compiles it as a separate step variant so requests that don't
  use it pay nothing.
"""

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops import quant

# Static candidate-window width for the FAST top-k/top-p path (lax.top_k
# needs a static k). Sampling stays EXACT for any top_k/top_p: rows whose
# active bounds all close inside the window sample from it with true
# (full-softmax) probabilities; otherwise the step falls into a full-vocab
# sorted path under lax.cond — peaked distributions never pay for it.
TOPK_WINDOW = 64


def _row_gumbel(key, shape, seeds, positions):
    """Per-row Gumbel noise honoring per-request seeds (beyond the reference;
    vLLM ``seed`` semantics, made batch-independent): rows with seed >= 0
    draw from fold_in(fold_in(seed_key, seed), position) — a function of the
    request's seed and the sampled token's position only, so a seeded request
    reproduces its trace regardless of batch composition, preemption, or
    engine restarts. Rows with seed < 0 draw from the per-step key (folded by
    row). One per-row key select + ONE noise generation — not two full
    [S, V] streams with a whole-buffer select."""
    if seeds is None:
        return jax.random.gumbel(key, shape, dtype=jnp.float32)
    base = jax.random.key(0)

    def row_key(i, s, p):
        seeded = jax.random.fold_in(jax.random.fold_in(base, s), p)
        unseeded = jax.random.fold_in(key, i)
        return jnp.where(
            s >= 0,
            jax.random.key_data(seeded),
            jax.random.key_data(unseeded),
        )

    data = jax.vmap(row_key)(
        jnp.arange(seeds.shape[0], dtype=jnp.uint32),
        jnp.maximum(seeds, 0).astype(jnp.uint32),
        positions.astype(jnp.uint32),
    )
    keys = jax.random.wrap_key_data(data)
    return jax.vmap(
        lambda k: jax.random.gumbel(k, shape[1:], dtype=jnp.float32)
    )(keys)


def sample(logits: jax.Array, temperatures: jax.Array, key: jax.Array,
           seeds: jax.Array | None = None,
           positions: jax.Array | None = None) -> jax.Array:
    """logits: f[S, V]; temperatures: f32[S]; returns i32[S] token ids."""
    logits = logits.astype(jnp.float32)
    temps = temperatures[:, None]
    scaled = logits / jnp.maximum(temps, 1e-6)
    gumbel = _row_gumbel(key, logits.shape, seeds, positions)
    noisy = scaled + jnp.where(temps > 0.0, gumbel, 0.0)
    return jnp.argmax(noisy, axis=-1).astype(jnp.int32)


def sample_tp(
    logits: jax.Array,        # f[S, Vlocal] — this rank's vocab shard
    temperatures: jax.Array,  # f32[S]
    key: jax.Array,
    axis: str,                # shard_map mesh axis name
    v_total: int,             # padded global vocab (Vlocal * tp)
    seeds: jax.Array | None = None,
    positions: jax.Array | None = None,
) -> jax.Array:
    """``sample`` over vocab-sharded logits WITHOUT gathering the [S, V]
    logits (the all-gather is the dominant per-step collective at large
    batch: ~155 MB for S=256 at a 152k vocab — vs ~2*S*tp scalars here).

    Bit-identical to ``sample(all_gather(logits, tiled))``: each rank slices
    its shard's columns out of the SAME counter-based full-vocab noise
    stream (XLA fuses the slice into the threefry elementwise graph, so only
    the shard's noise is materialized), takes a local noisy argmax, and the
    global winner is the max over ranks. Vocab shards are rank-blocked
    (rank r owns global columns [r*Vl, (r+1)*Vl)), so "first maximal rank,
    lowest local index" is exactly jnp.argmax's lowest-global-index
    tie-break. Greedy rows (T == 0) reduce to the exact argmax."""
    S, v_local = logits.shape
    logits = logits.astype(jnp.float32)
    temps = temperatures[:, None]
    scaled = logits / jnp.maximum(temps, 1e-6)
    v_start = jax.lax.axis_index(axis).astype(jnp.int32) * v_local
    g_full = _row_gumbel(key, (S, v_total), seeds, positions)
    g = jax.lax.dynamic_slice_in_dim(g_full, v_start, v_local, axis=1)
    noisy = scaled + jnp.where(temps > 0.0, g, 0.0)
    loc = jnp.argmax(noisy, axis=-1)
    best = jnp.take_along_axis(noisy, loc[:, None], axis=1)[:, 0]
    gidx = loc.astype(jnp.int32) + v_start
    bests = jax.lax.all_gather(best, axis)            # [tp, S]
    idxs = jax.lax.all_gather(gidx, axis)
    r = jnp.argmax(bests, axis=0)                     # first max: lowest rank
    return jnp.take_along_axis(idxs, r[None, :], axis=0)[0]


def sample_topk_topp_tp(
    logits: jax.Array,        # f[S, Vlocal] — this rank's vocab shard
    temperatures: jax.Array,  # f32[S]
    key: jax.Array,
    top_ks: jax.Array,        # i32[S]; <= 0 means "no k limit"
    top_ps: jax.Array,        # f32[S]; 1.0 means "no nucleus limit"
    axis: str,
    v_total: int,
    seeds: jax.Array | None = None,
    positions: jax.Array | None = None,
    min_ps: jax.Array | None = None,
) -> jax.Array:
    """``sample_topk_topp`` over vocab-sharded logits without gathering the
    [S, V] logits in the common case: each rank contributes its local
    top-``TOPK_WINDOW`` candidates and a partial logsumexp (a
    [tp, S, window]-candidate + [tp, S]-scalar gather, ~1 MB at S=256/tp=8
    vs ~155 MB for full logits); the merged global window then runs the
    EXACT same bound-proof fast path as the unsharded sampler. Only when
    some row's bounds stay open past the window does a ``lax.cond`` branch
    gather the full logits and run the full-vocab sorted path.

    Semantics are identical to the unsharded sampler (same candidate values,
    same shared noise stream, same bound proofs); the row normalizer is
    logsumexp-of-partials, which is mathematically equal but not bit-equal
    to the full-row reduction, so filtered SAMPLED rows are not guaranteed
    bit-identical across topologies (greedy rows are — their argmax never
    reads the normalizer). Unfiltered rows take the distributed plain
    Gumbel argmax (``sample_tp``'s combine), bit-identical to tp=1."""
    S, v_local = logits.shape
    tp = v_total // v_local
    k_win = min(TOPK_WINDOW, v_total)
    logits = logits.astype(jnp.float32)
    temps = temperatures[:, None]
    scaled_l = logits / jnp.maximum(temps, 1e-6)
    g_full = _row_gumbel(key, (S, v_total), seeds, positions)  # same stream
    v_rank = jax.lax.axis_index(axis).astype(jnp.int32) * v_local

    kl = min(k_win, v_local)
    vals_l, idx_l = jax.lax.top_k(scaled_l, kl)       # [S, kl] desc
    idx_l = idx_l.astype(jnp.int32) + v_rank
    lse_l = jax.scipy.special.logsumexp(scaled_l, axis=-1)      # [S]
    vals_g = jax.lax.all_gather(vals_l, axis)         # [tp, S, kl]
    idx_g = jax.lax.all_gather(idx_l, axis)
    lse_g = jax.lax.all_gather(lse_l, axis)           # [tp, S]
    lse = jax.scipy.special.logsumexp(lse_g, axis=0)[:, None]   # [S, 1]
    cand_v = jnp.transpose(vals_g, (1, 0, 2)).reshape(S, tp * kl)
    cand_i = jnp.transpose(idx_g, (1, 0, 2)).reshape(S, tp * kl)
    vals, sel = jax.lax.top_k(cand_v, k_win)          # merged global window
    idx = jnp.take_along_axis(cand_i, sel, axis=1)
    # Ties: top_k breaks by candidate position; candidates are rank-major
    # and in-rank descending-value (ties by global id), so equal values
    # resolve to the lowest global id — matching the unsharded top_k.
    probs = jnp.exp(vals - lse)

    rank = jax.lax.broadcasted_iota(jnp.int32, (S, k_win), 1)
    ks_full = jnp.where(top_ks <= 0, v_total, top_ks)[:, None]
    keep = rank < jnp.minimum(ks_full, k_win)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    keep &= cum_before < top_ps[:, None]
    mps = (
        jnp.zeros((S, 1), jnp.float32) if min_ps is None else min_ps[:, None]
    )
    keep &= probs >= mps * probs[:, :1]

    masked = jnp.where(keep, vals, -jnp.inf)
    g_win = jnp.take_along_axis(g_full, idx, axis=1)
    noisy = jnp.where(temps > 0.0, masked + g_win, vals)
    choice = jnp.argmax(noisy, axis=-1)
    window_tokens = jnp.take_along_axis(idx, choice[:, None], axis=1)[
        :, 0
    ].astype(jnp.int32)

    # Unfiltered rows: distributed plain Gumbel argmax (see sample_tp).
    unfiltered = (ks_full >= v_total) & (top_ps[:, None] >= 1.0) & (mps <= 0.0)
    g_l = jax.lax.dynamic_slice_in_dim(g_full, v_rank, v_local, axis=1)
    noisy_l = scaled_l + g_l
    loc = jnp.argmax(noisy_l, axis=-1)
    best_l = jnp.take_along_axis(noisy_l, loc[:, None], axis=1)[:, 0]
    bests = jax.lax.all_gather(best_l, axis)
    bidx = jax.lax.all_gather(loc.astype(jnp.int32) + v_rank, axis)
    r = jnp.argmax(bests, axis=0)
    plain_tokens = jnp.take_along_axis(bidx, r[None, :], axis=0)[0]
    base_tokens = jnp.where(
        unfiltered[:, 0] & (temperatures > 0.0), plain_tokens, window_tokens
    )

    k_closes = ks_full <= k_win
    mass = cum_before[:, -1:] + probs[:, -1:]
    p_closes = mass >= top_ps[:, None]
    minp_closes = (mps > 0) & (mps * probs[:, :1] > probs[:, -1:])
    needs_exact = ~(unfiltered | k_closes | p_closes | minp_closes)[:, 0]
    needs_exact &= temperatures > 0.0

    def _exact(_):
        # Rare branch: gather the full logits and run the full-vocab sorted
        # path (identical math to the unsharded exact branch).
        full = jax.lax.all_gather(logits, axis, axis=1, tiled=True)
        scaled_full = full / jnp.maximum(temps, 1e-6)
        order = jnp.argsort(-scaled_full, axis=-1)
        svals = jnp.take_along_axis(scaled_full, order, axis=-1)
        sprobs = jnp.exp(svals - lse)
        rr = jax.lax.broadcasted_iota(jnp.int32, (S, v_total), 1)
        k2 = rr < ks_full
        cb = jnp.cumsum(sprobs, axis=-1) - sprobs
        k2 &= cb < top_ps[:, None]
        k2 &= sprobs >= mps * sprobs[:, :1]
        m2 = jnp.where(k2, svals, -jnp.inf)
        g2 = jnp.take_along_axis(g_full, order, axis=1)
        n2 = jnp.where(temps > 0.0, m2 + g2, svals)
        c2 = jnp.argmax(n2, axis=-1)
        exact_tokens = jnp.take_along_axis(order, c2[:, None], axis=1)[
            :, 0
        ].astype(jnp.int32)
        return jnp.where(needs_exact, exact_tokens, base_tokens)

    return jax.lax.cond(
        jnp.any(needs_exact), _exact, lambda _: base_tokens, None
    )


def head_sample(
    h: jax.Array,             # f[S, D] final hidden states
    w,                        # LM head [V(/tp), D] (plain or QuantWeight)
    temperatures: jax.Array,  # f32[S]
    key: jax.Array,
    *,
    axis: str | None = None,  # shard_map axis when the vocab is sharded
    v_total: int | None = None,
    seeds: jax.Array | None = None,
    positions: jax.Array | None = None,
    chunk: int = 8192,
    exclude: jax.Array | None = None,  # i32[S] GLOBAL token id to ban (<0 none)
) -> jax.Array:
    """Fused LM-head matmul + Gumbel sampling, chunked over the vocab.

    ``sample(head_matmul(h, w))`` materializes several [S, V] f32 tensors
    (~100 MB each at S=160, V=152k — the xplane decode profile measured
    ~1.5 ms/step in this tail); chunking keeps per-chunk logits in VMEM so
    HBM traffic is the head-weight read plus one [S, V] noise pass.

    BIT-identical to the unfused path: each chunk's logits are the same dots,
    the noise is a dynamic slice of the same counter-based [S, v_total]
    stream (seeded rows included), the clamped last chunk's overlap rows
    recompute identical (value, noise) pairs, and the running strict-``>``
    max keeps the first maximum — jnp.argmax's lowest-index tie-break.
    Under ``axis`` the local winner combines across ranks exactly like
    ``sample_tp``. Greedy rows (T == 0) reduce to the exact argmax.

    ``exclude``: per-row GLOBAL token id masked to -inf before the argmax —
    sampling from the renormalized distribution with that token removed (the
    residual distribution of rejection-sampling speculative decoding,
    ops/spec.py). Rows with a negative id (and the default None) ban
    nothing; passing None compiles the exclusion-free program."""
    S = h.shape[0]
    v_local = quant.shape_of(w)[0]
    if v_total is None:
        v_total = v_local
    temps = temperatures[:, None]
    g_full = _row_gumbel(key, (S, v_total), seeds, positions)
    v_rank = (
        jnp.int32(0) if axis is None
        else jax.lax.axis_index(axis).astype(jnp.int32) * v_local
    )
    chunk = min(chunk, v_local)
    n_chunks = -(-v_local // chunk)

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
        start = jnp.minimum(i * chunk, v_local - chunk)
        logits = quant.head_matmul(h, slice_w(start)).astype(jnp.float32)
        scaled = logits / jnp.maximum(temps, 1e-6)
        g = jax.lax.dynamic_slice(
            g_full, (jnp.int32(0), v_rank + start), (S, chunk)
        )
        noisy = scaled + jnp.where(temps > 0.0, g, 0.0)
        if exclude is not None:
            col = v_rank + start + jnp.arange(chunk, dtype=jnp.int32)[None, :]
            noisy = jnp.where(col == exclude[:, None], -jnp.inf, noisy)
        cbest = jnp.max(noisy, axis=-1)
        cidx = jnp.argmax(noisy, axis=-1).astype(jnp.int32) + start
        take = cbest > best
        return jnp.where(take, cbest, best), jnp.where(take, cidx, idx)

    best = jnp.full((S,), -jnp.inf, jnp.float32)
    idx = jnp.zeros((S,), jnp.int32)
    best, idx = jax.lax.fori_loop(0, n_chunks, body, (best, idx))
    if axis is None:
        return idx
    gidx = idx + v_rank
    bests = jax.lax.all_gather(best, axis)            # [tp, S]
    idxs = jax.lax.all_gather(gidx, axis)
    r = jnp.argmax(bests, axis=0)                     # first max: lowest rank
    return jnp.take_along_axis(idxs, r[None, :], axis=0)[0]


def sample_topk_topp(
    logits: jax.Array,        # f[S, V]
    temperatures: jax.Array,  # f32[S]
    key: jax.Array,
    top_ks: jax.Array,        # i32[S]; <= 0 means "no k limit"
    top_ps: jax.Array,        # f32[S]; 1.0 means "no nucleus limit"
    seeds: jax.Array | None = None,      # i32[S]; < 0 = unseeded row
    positions: jax.Array | None = None,  # i32[S] sampled-token positions
    min_ps: jax.Array | None = None,     # f32[S]; 0.0 means "no p floor"
) -> jax.Array:
    """EXACT Gumbel sampling restricted to each row's top-k / top-p / min-p
    candidate set (vLLM semantics over the full vocabulary).

    ONE full-vocab Gumbel stream is drawn per step and shared by every path
    (the window and sorted paths gather it by token id), so a row's sample is
    a function of its own logits, bounds, and (seed, position) only — never
    of which branch a batchmate forced.

    Fast path: candidates come from the row's TOPK_WINDOW highest logits
    with TRUE probabilities (full-row softmax normalization); rank masks
    implement top-k (rank < k), top-p (tokens whose *preceding* cumulative
    probability, after temperature, is below p — the first token always
    survives), and min-p (drop tokens below min_p times the row's max
    probability). A row is window-exact iff SOME active bound provably
    closes inside the window (k <= window; window mass >= p; min_p floor
    above the window's last probability). Unfiltered rows (no k, no p, no
    min_p — e.g. sharing a batch with filtered requests) take a plain
    full-vocab Gumbel argmax, which is exact without any sort. Only rows
    whose bounds genuinely stay open past the window — flat / high-
    temperature distributions, top_k > window — fall into a full-vocab
    sorted path under ``lax.cond`` (compiled once, executed only when
    needed). Greedy rows (T == 0) return the argmax either way.
    """
    S, V = logits.shape
    k_win = min(TOPK_WINDOW, V)
    logits = logits.astype(jnp.float32)
    temps = temperatures[:, None]
    scaled_full = logits / jnp.maximum(temps, 1e-6)
    g_full = _row_gumbel(key, (S, V), seeds, positions)  # shared noise
    vals, idx = jax.lax.top_k(scaled_full, k_win)     # [S, K] desc
    # True temperature-scaled probabilities: normalize by the FULL row
    # (window-local softmax would inflate nucleus masses by 1/window-mass).
    lse = jax.scipy.special.logsumexp(scaled_full, axis=-1, keepdims=True)
    probs = jnp.exp(vals - lse)                       # [S, K]

    rank = jax.lax.broadcasted_iota(jnp.int32, (S, k_win), 1)
    ks_full = jnp.where(top_ks <= 0, V, top_ks)[:, None]   # [S, 1]
    keep = rank < jnp.minimum(ks_full, k_win)

    cum_before = jnp.cumsum(probs, axis=-1) - probs   # exclusive prefix sum
    keep &= cum_before < top_ps[:, None]
    mps = (
        jnp.zeros((S, 1), jnp.float32) if min_ps is None else min_ps[:, None]
    )
    keep &= probs >= mps * probs[:, :1]

    masked = jnp.where(keep, vals, -jnp.inf)
    g_win = jnp.take_along_axis(g_full, idx, axis=1)
    noisy = jnp.where(temps > 0.0, masked + g_win, vals)
    choice = jnp.argmax(noisy, axis=-1)               # window-local
    window_tokens = jnp.take_along_axis(idx, choice[:, None], axis=1)[
        :, 0
    ].astype(jnp.int32)

    # Unfiltered rows: plain Gumbel argmax over the vocab is exact, no sort.
    unfiltered = (ks_full >= V) & (top_ps[:, None] >= 1.0) & (mps <= 0.0)
    plain_tokens = jnp.argmax(scaled_full + g_full, axis=-1).astype(jnp.int32)
    base_tokens = jnp.where(
        unfiltered[:, 0] & (temperatures > 0.0), plain_tokens, window_tokens
    )

    # Window-exactness per row: every token OUTSIDE the window has value
    # <= vals[:, -1], preceding-cumulative >= the whole window mass, and
    # probability <= probs[:, -1] — so one closing bound excludes them all.
    k_closes = ks_full <= k_win
    mass = cum_before[:, -1:] + probs[:, -1:]
    p_closes = mass >= top_ps[:, None]
    minp_closes = (mps > 0) & (mps * probs[:, :1] > probs[:, -1:])
    needs_exact = ~(unfiltered | k_closes | p_closes | minp_closes)[:, 0]
    needs_exact &= temperatures > 0.0  # greedy/padding rows: argmax is exact
    if k_win == V:
        return base_tokens

    def _exact(_):
        order = jnp.argsort(-scaled_full, axis=-1)    # [S, V] desc
        svals = jnp.take_along_axis(scaled_full, order, axis=-1)
        sprobs = jnp.exp(svals - lse)
        r = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)
        k2 = r < ks_full
        cb = jnp.cumsum(sprobs, axis=-1) - sprobs
        k2 &= cb < top_ps[:, None]
        k2 &= sprobs >= mps * sprobs[:, :1]
        m2 = jnp.where(k2, svals, -jnp.inf)
        g2 = jnp.take_along_axis(g_full, order, axis=1)
        n2 = jnp.where(temps > 0.0, m2 + g2, svals)
        c2 = jnp.argmax(n2, axis=-1)
        exact_tokens = jnp.take_along_axis(order, c2[:, None], axis=1)[
            :, 0
        ].astype(jnp.int32)
        # Rows already exact keep their fast-path sample: the shared noise
        # stream makes both computations pick the same token, and the select
        # keeps every row's trace independent of batchmates' branches.
        return jnp.where(needs_exact, exact_tokens, base_tokens)

    return jax.lax.cond(
        jnp.any(needs_exact), _exact, lambda _: base_tokens, None
    )
