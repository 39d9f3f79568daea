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
