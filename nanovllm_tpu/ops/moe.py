"""Grouped (per-expert) matmul dispatch for the sparse-MoE FFN.

Two backends behind one call:
- ``lax.ragged_dot`` — XLA's native grouped dot (CPU tests, fallback; also
  zero-fills rows beyond ``sum(group_sizes)``, which the EP placement's
  maskless combine exploited before this wrapper existed);
- megablox ``gmm`` (jax.experimental.pallas.ops.tpu.megablox) — the tuned
  Pallas TPU grouped-matmul kernel (tiled MXU passes with group-boundary
  handling). Its uncovered rows are UNINITIALIZED (NaN), so callers that can
  under-cover rows (expert parallelism) must mask with ``row < cov`` — see
  ``models/qwen3._moe_ffn``.

NANOVLLM_MOE_GMM ∈ {auto, megablox, ragged} overrides (auto = megablox on
TPU backends, ragged elsewhere). No reference analogue: nano-vllm has no MoE
(vLLM's equivalent is its fused-MoE Triton kernel).
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

_MODE = os.environ.get("NANOVLLM_MOE_GMM", "auto")
assert _MODE in ("auto", "megablox", "ragged"), _MODE


def _use_megablox() -> bool:
    if _MODE != "auto":
        return _MODE == "megablox"
    return jax.default_backend() in ("tpu", "axon")


def _tile(dim: int, want: int = 128) -> int | None:
    """Largest divisor of ``dim`` that is <= ``want`` and a multiple of 8
    (megablox requires tile sizes to divide their dims exactly)."""
    for t in range(min(want, dim), 7, -8):
        if dim % t == 0 and t % 8 == 0:
            return t
    return None


def grouped_matmul(lhs, rhs, group_sizes, *, interpret: bool = False):
    """[m, k] x [E, k, n] with expert-sorted lhs rows -> f32 [m, n].

    Rows at index >= sum(group_sizes) are NOT guaranteed zero (backend
    dependent); mask them if coverage can be partial."""
    if _use_megablox() or interpret:
        m, k = lhs.shape
        n = rhs.shape[-1]
        tiling = (_tile(m), _tile(k), _tile(n))
        if all(tiling):
            from jax.experimental.pallas.ops.tpu.megablox import gmm

            return gmm(
                lhs, rhs, group_sizes, tiling=tiling,
                preferred_element_type=jnp.float32, interpret=interpret,
            )
        # Off-size dims (tiny test models): the XLA grouped dot handles any
        # shape.
    return lax.ragged_dot(
        lhs, rhs, group_sizes, preferred_element_type=jnp.float32
    )


def grouped_matmul_quant(lhs, q, scale, group_sizes, *, interpret: bool = False):
    """Weight-only-quantized grouped matmul -> f32 [m, n].

    int8 experts: q [E, k, n] with per-(expert, out-channel) scales [E, n].
    The scales commute with the matmul (each output row belongs to exactly
    one expert), so the vendored int8-rhs megablox kernel
    (ops/pallas/megablox_gmm) runs the raw int8 dot at the bf16 MXU rate and
    the dequantization is a row-gathered multiply on the f32 output.

    int4 experts (detected by the group dim: scale [E, k/g, n] with
    k-nibble-packed q [E, k//2, n], see quant.pack_int4_k): group-wise-k
    scales do NOT commute with the grouped matmul, so the gmm_int4 kernel
    dequantizes per k-tile in VMEM (group == kernel k-tile == 128 original
    rows). Off-size shapes fall back to an XLA dequant + ragged_dot.

    The portable fallback dequantizes the whole rhs (tests/CPU; costs the
    bf16 bytes the quantization saved)."""
    e = q.shape[0]
    m = lhs.shape[0]
    if scale.ndim == q.ndim:  # int4: group dim present
        from nanovllm_tpu.ops import quant

        group = 2 * q.shape[-2] // scale.shape[-2]
        if (_use_megablox() or interpret) and group == 128:
            mm, k = lhs.shape
            n = q.shape[-1]
            tm, tn = _tile(mm), _tile(n)
            if tm and tn and k % 128 == 0:
                from nanovllm_tpu.ops.pallas.megablox_gmm import gmm_int4

                return gmm_int4(
                    lhs, q, scale, group_sizes, tiling=(tm, tn),
                    preferred_element_type=jnp.float32, interpret=interpret,
                )
        deq = quant.dequant_int4_k(q, scale, lhs.dtype)
        return lax.ragged_dot(
            lhs, deq, group_sizes, preferred_element_type=jnp.float32
        )
    if _use_megablox() or interpret:
        mm, k = lhs.shape
        n = q.shape[-1]
        tiling = (_tile(mm), _tile(k), _tile(n))
        if all(tiling):
            from nanovllm_tpu.ops.pallas.megablox_gmm import gmm

            out = gmm(
                lhs, q, group_sizes, tiling=tiling,
                preferred_element_type=jnp.float32, interpret=interpret,
            )
        else:
            out = lax.ragged_dot(
                lhs, q.astype(lhs.dtype), group_sizes,
                preferred_element_type=jnp.float32,
            )
    else:
        out = lax.ragged_dot(
            lhs, q.astype(lhs.dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
    expert_of_row = jnp.repeat(
        jnp.arange(e, dtype=jnp.int32), group_sizes, total_repeat_length=m
    )
    return out * scale[expert_of_row]
