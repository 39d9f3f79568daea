"""On-device repetition / presence / frequency penalties.

No reference analogue — nano-vllm's sampler is temperature-only
(``nanovllm/layers/sampler.py:8-12``); the equivalents here follow vLLM/OpenAI
semantics. TPU-first design: penalties need the count of every token generated
*so far*, which under the async pipeline exists only on device (the host lags
by up to ``fetch_interval`` steps). So the counts live on device too — an
int32 slab ``counts[P, V]`` of per-(penalty-slot, token) output counts plus an
int8 prompt-presence slab — updated by the same step program that samples
(scatter the sampled token before the next chained step reads the slab), so
the pipeline's no-host-sync property survives. Only the "penalized" step
variant pays for any of this; plain requests never touch the slabs.

Semantics (vLLM):
- ``repetition_penalty`` (HF/CTRL form): for tokens present in the prompt OR
  the output so far, divide positive logits by the penalty and multiply
  negative ones (>1 discourages repetition).
- ``frequency_penalty``: subtract ``penalty * count(token in output)``.
- ``presence_penalty``: subtract ``penalty`` once for tokens in the output.
Prompt tokens affect only repetition_penalty; output counts drive the other
two (vLLM semantics; OpenAI's "text so far" is ambiguous on the prompt).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_penalties(
    logits: jax.Array,        # f32[S, V]
    out_counts: jax.Array,    # i32[S, V] per-token output counts
    prompt_seen: jax.Array,   # i8[S, V] nonzero where the token is in the prompt
    presence: jax.Array,      # f32[S] (0 = off)
    frequency: jax.Array,     # f32[S] (0 = off)
    repetition: jax.Array,    # f32[S] (1 = off)
) -> jax.Array:
    """vLLM-order application: repetition (multiplicative, prompt|output),
    then frequency and presence (subtractive, output only). Rows with the
    neutral values (0, 0, 1) pass through unchanged."""
    c = out_counts.astype(jnp.float32)
    out_seen = c > 0.0
    seen = out_seen | (prompt_seen > 0)
    rep = repetition[:, None]
    rep_applied = jnp.where(logits > 0.0, logits / rep, logits * rep)
    logits = jnp.where(seen, rep_applied, logits)
    return (
        logits
        - frequency[:, None] * c
        - presence[:, None] * out_seen.astype(jnp.float32)
    )
