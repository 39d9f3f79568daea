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

# Static candidate-window width for top-k/top-p: lax.top_k needs a static k,
# so requested top_k values clamp to this, and top_p nucleus mass is computed
# within the window (covers p up to ~0.99 for typical peaked distributions).
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
    """Gumbel sampling restricted to each row's top-k / top-p / min-p
    candidate set.

    Candidates come from the row's TOPK_WINDOW highest logits; rank masks
    implement top-k (rank < k), top-p (tokens whose *preceding* cumulative
    probability, after temperature, is below p — the first token always
    survives), and min-p (vLLM semantics: drop tokens whose probability is
    below min_p times the row's max probability). Greedy rows (T == 0)
    return the argmax.
    """
    S, V = logits.shape
    k_win = min(TOPK_WINDOW, V)
    logits = logits.astype(jnp.float32)
    vals, idx = jax.lax.top_k(logits, k_win)          # [S, K] desc
    temps = temperatures[:, None]
    scaled = vals / jnp.maximum(temps, 1e-6)

    rank = jax.lax.broadcasted_iota(jnp.int32, (S, k_win), 1)
    ks = jnp.where(top_ks <= 0, k_win, jnp.minimum(top_ks, k_win))[:, None]
    keep = rank < ks

    probs = jax.nn.softmax(scaled, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs   # exclusive prefix sum
    keep &= cum_before < top_ps[:, None]
    if min_ps is not None:
        # Window column 0 holds the row max, so probs[:, :1] is p_max.
        keep &= probs >= min_ps[:, None] * probs[:, :1]

    masked = jnp.where(keep, scaled, -jnp.inf)
    gumbel = _row_gumbel(key, masked.shape, seeds, positions)
    noisy = jnp.where(temps > 0.0, masked + gumbel, vals)
    choice = jnp.argmax(noisy, axis=-1)               # window-local
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(
        jnp.int32
    )
