"""On-device token sampling.

Parity: reference ``nanovllm/layers/sampler.py:8-12`` — temperature-scaled
Gumbel-trick sampling (argmax of ``logits/T + Gumbel`` draws exactly from
``softmax(logits/T)``, equivalent to the reference's Exponential-division
trick). Extension: ``temperature == 0`` rows decode greedily (the reference
forbids greedy; we support it in the same fused computation).
"""

import jax
import jax.numpy as jnp


def sample(logits: jax.Array, temperatures: jax.Array, key: jax.Array) -> jax.Array:
    """logits: f[S, V]; temperatures: f32[S]; returns i32[S] token ids."""
    logits = logits.astype(jnp.float32)
    temps = temperatures[:, None]
    scaled = logits / jnp.maximum(temps, 1e-6)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    noisy = scaled + jnp.where(temps > 0.0, gumbel, 0.0)
    return jnp.argmax(noisy, axis=-1).astype(jnp.int32)
