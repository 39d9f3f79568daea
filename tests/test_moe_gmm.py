"""grouped_matmul backends: megablox Pallas gmm (interpret mode) must match
lax.ragged_dot on covered rows, across odd group sizes and partial coverage
(the EP placement masks uncovered rows — megablox leaves them NaN)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.moe import grouped_matmul


@pytest.mark.parametrize(
    "gs",
    [
        [64, 0, 128, 32, 96, 0, 64, 128],   # full coverage (TP path)
        [64, 0, 128, 32, 96, 0, 64, 0],     # partial (EP local slice)
        [5, 0, 17, 3, 96, 0, 64, 0],        # off-tile group boundaries
    ],
)
def test_megablox_matches_ragged_dot(gs):
    rng = np.random.default_rng(1)
    m, k, n, g = 512, 256, 384, 8
    lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((g, k, n)), jnp.bfloat16)
    sizes = jnp.asarray(gs, jnp.int32)
    ref = jax.lax.ragged_dot(
        lhs, rhs, sizes, preferred_element_type=jnp.float32
    )
    out = grouped_matmul(lhs, rhs, sizes, interpret=True)
    cov = int(sizes.sum())
    np.testing.assert_allclose(
        np.asarray(out[:cov]), np.asarray(ref[:cov]), atol=2e-4, rtol=1e-3
    )
    # ragged_dot zero-fills uncovered rows; megablox does NOT (NaN) — the
    # model masks them (models/qwen3._moe_ffn). Just pin ragged's behavior.
    assert float(jnp.max(jnp.abs(ref[cov:]), initial=0.0)) == 0.0


def test_grouped_matmul_quant_matches_dequant():
    """int8-rhs gmm (vendored megablox, interpret) + row-gathered scales
    equals dequantize-then-ragged_dot."""
    from nanovllm_tpu.ops.moe import grouped_matmul_quant

    rng = np.random.default_rng(3)
    m, k, n, g = 512, 256, 384, 8
    lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    q = jnp.asarray(rng.integers(-127, 128, (g, k, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, (g, n)), jnp.float32)
    gs = jnp.asarray([64, 0, 128, 32, 96, 0, 64, 128], jnp.int32)
    out = grouped_matmul_quant(lhs, q, scale, gs, interpret=True)
    deq = q.astype(jnp.float32) * scale[:, None, :]
    ref = jax.lax.ragged_dot(
        lhs.astype(jnp.float32), deq, gs, preferred_element_type=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
