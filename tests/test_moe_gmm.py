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


def test_pack_unpack_int4_k_roundtrip():
    """pack_int4_k/unpack_int4_k invert each other, and group-dequant
    reconstructs the quantizer's values exactly."""
    from nanovllm_tpu.ops import quant

    rng = np.random.default_rng(5)
    vals = rng.integers(-8, 8, (3, 256, 64)).astype(np.int8)
    packed = quant.pack_int4_k(jnp.asarray(vals), 128)
    assert packed.shape == (3, 128, 64) and packed.dtype == jnp.int8
    back = quant.unpack_int4_k(packed, 128)
    np.testing.assert_array_equal(np.asarray(back), vals)

    w = rng.standard_normal((3, 256, 64)).astype(np.float32) * 0.05
    qw = quant.quantize_expert_int4(w)
    assert qw.q.shape == (3, 128, 64) and qw.scale.shape == (3, 2, 64)
    deq = np.asarray(quant.dequant_int4_k(
        jnp.asarray(qw.q), jnp.asarray(qw.scale), jnp.float32
    ))
    # Group-wise symmetric int4: error bounded by half a quantization step.
    step = np.repeat(np.asarray(qw.scale), 128, axis=1)
    assert (np.abs(deq - w) <= step / 2 + 1e-7).all()


@pytest.mark.parametrize(
    "gs",
    [
        [64, 0, 128, 32, 96, 0, 64, 128],   # full coverage (TP path)
        [64, 0, 128, 32, 96, 0, 64, 0],     # partial (EP local slice)
        [5, 0, 17, 3, 96, 0, 64, 0],        # off-tile group boundaries
    ],
)
def test_gmm_int4_matches_dequant(gs):
    """gmm_int4 (in-kernel k-nibble unpack + per-k-tile group scales,
    interpret mode) equals dequantize-then-ragged_dot on covered rows."""
    from nanovllm_tpu.ops import quant
    from nanovllm_tpu.ops.moe import grouped_matmul_quant
    from nanovllm_tpu.ops.pallas.megablox_gmm import gmm_int4

    rng = np.random.default_rng(7)
    m, k, n, g = 512, 256, 384, 8
    lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((g, k, n)).astype(np.float32) * 0.05
    qw = quant.quantize_expert_int4(w)
    q, scale = jnp.asarray(qw.q), jnp.asarray(qw.scale)
    sizes = jnp.asarray(gs, jnp.int32)
    deq = quant.dequant_int4_k(q, scale, jnp.float32)
    ref = jax.lax.ragged_dot(
        lhs.astype(jnp.float32), deq, sizes,
        preferred_element_type=jnp.float32,
    )
    out = gmm_int4(lhs, q, scale, sizes, tiling=(64, 128), interpret=True)
    cov = int(sizes.sum())
    np.testing.assert_allclose(
        np.asarray(out[:cov]), np.asarray(ref[:cov]), atol=2e-3, rtol=2e-3
    )
    # Dispatch: the group-dim scale shape routes to the int4 path.
    out2 = grouped_matmul_quant(lhs, q, scale, sizes, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out2[:cov]), np.asarray(ref[:cov]), atol=2e-3, rtol=2e-3
    )


def test_gmm_int4_sharding_exactness():
    """int4 expert stacks quantized ONCE, then sharded: EP (expert dim),
    width-TP out (gate_up style), and width-TP contraction (down style,
    partial dots psum) all reproduce the unsharded result. Engine-level
    cross-mesh equality is NOT asserted for int4 (the quant group legally
    shrinks with the mesh for off-size dims); this pins the sharding
    semantics with identical quantization."""
    from jax import lax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from nanovllm_tpu.ops import quant
    from nanovllm_tpu.ops.moe import grouped_matmul_quant

    rng = np.random.default_rng(11)
    e, k, n, m = 4, 256, 256, 128
    w = rng.standard_normal((e, k, n)).astype(np.float32) * 0.05
    qw = quant.quantize_expert_int4(w)  # g = 128 (kernel-native)
    q, scale = jnp.asarray(qw.q), jnp.asarray(qw.scale)
    lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    gs = jnp.asarray([40, 30, 20, 38], jnp.int32)
    ref = np.asarray(grouped_matmul_quant(lhs, q, scale, gs))
    cov = int(gs.sum())
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))

    # EP — mimic _moe_ffn: each rank sees its local experts' rows FIRST
    # (local-first sort == roll of the expert-sorted rows), masks non-local
    # rows, psums.
    def ep_fn(lhs, q, s, counts):
        e_local = q.shape[0]
        lo = lax.axis_index("tp") * e_local
        g_local = lax.dynamic_slice_in_dim(counts, lo, e_local)
        off = jnp.sum(counts * (jnp.arange(counts.shape[0]) < lo))
        out = grouped_matmul_quant(jnp.roll(lhs, -off, axis=0), q, s, g_local)
        idx = jnp.arange(out.shape[0])
        out = jnp.where((idx < jnp.sum(g_local))[:, None], out, 0.0)
        return lax.psum(jnp.roll(out, off, axis=0), "tp")

    ep = shard_map(
        ep_fn, mesh=mesh,
        in_specs=(P(None, None), P("tp", None, None), P("tp", None, None),
                  P(None)),
        out_specs=P(None, None), check_rep=False,
    )(lhs, q, scale, gs)
    np.testing.assert_allclose(np.asarray(ep)[:cov], ref[:cov], atol=1e-5)

    col = shard_map(
        lambda lhs, q, s, c: grouped_matmul_quant(lhs, q, s, c), mesh=mesh,
        in_specs=(P(None, None), P(None, None, "tp"), P(None, None, "tp"),
                  P(None)),
        out_specs=P(None, "tp"), check_rep=False,
    )(lhs, q, scale, gs)
    np.testing.assert_allclose(np.asarray(col)[:cov], ref[:cov], atol=1e-5)

    row = shard_map(
        lambda lhs, q, s, c: lax.psum(grouped_matmul_quant(lhs, q, s, c),
                                      "tp"),
        mesh=mesh,
        in_specs=(P(None, "tp"), P(None, "tp", None), P(None, "tp", None),
                  P(None)),
        out_specs=P(None, None), check_rep=False,
    )(lhs, q, scale, gs)
    np.testing.assert_allclose(np.asarray(row)[:cov], ref[:cov], atol=1e-5)
