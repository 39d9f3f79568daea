"""Weight-only quantization: INT8 / INT4 / FP8 matmul weights.

Not present in the reference (nano-vllm is BF16-only); required by our
BASELINE targets (INT8 0.6B bench, INT4/FP8 larger configs). Design is
TPU-first:

- Quantized tensors stay in their narrow storage dtype **in HBM**; the
  dequantize (convert + per-channel scale) happens on-chip and XLA fuses it
  into the consuming dot — decode is weight-HBM-bandwidth-bound, so INT8
  halves (INT4 quarters) the bytes streamed per step.
- INT8 / FP8: symmetric per-output-channel scales (scale shape [out]).
- INT4: group-wise scales along the reduction dim (group g=128 → scale
  [in/g, out]) for accuracy; the matmul runs as a batched-over-groups
  dot_general followed by a scaled sum, so the packed int4 weight is never
  materialized densely in HBM.
- INT4 storage uses the native ``jnp.int4`` dtype (XLA packs two values per
  byte on TPU).

A ``QuantWeight`` is a pytree-registered dataclass so quantized parameter
trees flow through ``jax.tree.map`` / ``device_put`` / shard_map like plain
arrays; ``mode`` rides the treedef as static metadata (the int4 group size is
recovered from shapes so treedefs stay uniform across weights).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

WEIGHT_QUANT_MODES = ("int8", "int4", "fp8")
INT4_GROUP = 128
_FP8_MAX = 448.0  # float8_e4m3fn finfo.max


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("q", "scale"),
    meta_fields=("mode",),
)
@dataclasses.dataclass
class QuantWeight:
    """q: narrow-dtype storage; scale: f32 per-channel / per-group scales.

    Layouts (matmul weights are stored [..., in, out] like their bf16
    counterparts; embeddings [vocab, d]):
    - int8/fp8 matmul: q [..., in, out], scale [..., out]
    - int4 matmul:     q [..., in, out], scale [..., in/group, out]
    - int8/fp8 embed:  q [vocab, d],     scale [vocab]   (per-row)
    - int4 embed:      q [vocab, d],     scale [vocab, d/group]
    """

    q: jax.Array
    scale: jax.Array
    mode: str

    @property
    def group(self):
        """int4 group size, recovered from shapes (q [..., in, out] with
        scale [..., in/g, out]; embeddings q [v, d], scale [v, d/g])."""
        return self.q.shape[-2] // self.scale.shape[-2]


# -------------------------------------------------------------- quantize


def _storage_dtype(mode: str):
    # ml_dtypes numpy dtypes: quantized tensors stay host-side numpy until
    # device_put places them with their NamedSharding (no device detour).
    return {
        "int8": np.int8,
        "int4": ml_dtypes.int4,
        "fp8": ml_dtypes.float8_e4m3fn,
    }[mode]


def quantize_array(w: np.ndarray | jax.Array, mode: str, *, axis: int,
                   group: int | None = None) -> QuantWeight:
    """Symmetric quantization of ``w`` reducing over ``axis``.

    ``axis`` is the contraction (in) dim for matmul weights, the feature dim
    for embeddings. int4 uses group-wise scales along ``axis`` (the group dim
    is inserted where ``axis`` was, i.e. scale keeps w's rank).

    The math runs as a jitted CPU program: single-threaded numpy passes over
    a multi-billion-parameter tree take tens of minutes; XLA:CPU is
    multithreaded.
    """
    w = np.asarray(w)
    axis = axis % w.ndim
    g = None
    if mode == "int4":
        g = group or INT4_GROUP
        while w.shape[axis] % g:
            g //= 2  # shrink to a divisor for off-size dims (tiny test models)
        assert g >= 1
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        q, scale = _quantize_jit(mode, axis, g)(w)
    return QuantWeight(q=np.asarray(q), scale=np.asarray(scale), mode=mode)


@functools.lru_cache(maxsize=None)
def _quantize_jit(mode: str, axis: int, group: int | None):
    def fn(w):
        wf = w.astype(jnp.float32)
        if mode == "int4":
            g = group
            shape = wf.shape[:axis] + (wf.shape[axis] // g, g) + wf.shape[axis + 1:]
            wg = wf.reshape(shape)
            amax = jnp.max(jnp.abs(wg), axis=axis + 1, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) / 7.0
            q = jnp.clip(jnp.round(wg / scale), -8, 7)
            return (
                q.reshape(wf.shape).astype(jnp.int4),
                jnp.squeeze(scale, axis=axis + 1),
            )
        amax = jnp.max(jnp.abs(wf), axis=axis)
        if mode == "int8":
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(
                jnp.round(wf / jnp.expand_dims(scale, axis)), -127, 127
            ).astype(jnp.int8)
        elif mode == "fp8":
            scale = jnp.maximum(amax, 1e-8) / _FP8_MAX
            q = (wf / jnp.expand_dims(scale, axis)).astype(jnp.float8_e4m3fn)
        else:
            raise ValueError(f"unknown weight quant mode {mode!r}")
        return q, scale

    return jax.jit(fn)


# ---------------------------------------------------------------- matmul


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for a plain array or a QuantWeight stored [in, out]."""
    if not isinstance(w, QuantWeight):
        return x @ w
    if w.mode == "int4":
        gi = w.scale.shape[-2]
        g = w.q.shape[-2] // gi
        t = x.shape[:-1]
        xg = x.reshape(*t, gi, g)
        qg = w.q.reshape(gi, g, w.q.shape[-1]).astype(x.dtype)
        # partial[..., G, out] = sum_i x[..., G, i] q[G, i, out]
        partial = jax.lax.dot_general(
            xg, qg,
            dimension_numbers=(((xg.ndim - 1,), (1,)), ((xg.ndim - 2,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dot_general puts batch dims first: [G, ..., out].
        out = jnp.sum(
            partial * w.scale.astype(jnp.float32).reshape(
                gi, *([1] * len(t)), -1),
            axis=0,
        )
        return out.astype(x.dtype)
    out = x @ w.q.astype(x.dtype)
    return out * w.scale.astype(x.dtype)


def embed_rows(w, ids: jax.Array, dtype) -> jax.Array:
    """Gather embedding rows (dequantizing when quantized)."""
    if not isinstance(w, QuantWeight):
        return w[ids].astype(dtype)
    rows = w.q[ids].astype(dtype)
    if w.mode == "int4":
        n, d = rows.shape
        g = d // w.scale.shape[-1]
        s = w.scale[ids].astype(dtype)                 # [n, d/g]
        return (rows.reshape(n, d // g, g) * s[..., None]).reshape(n, d)
    return rows * w.scale[ids].astype(dtype)[:, None]


def _dot_f32(a: jax.Array, b_t: jax.Array) -> jax.Array:
    """a @ b_t.T with bf16 operands and f32 accumulation: full MXU rate
    (f32 x f32 dots run at a fraction of the bf16 rate)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b_t.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def head_matmul(h: jax.Array, w) -> jax.Array:
    """LM-head logits: h [S, D] @ w.T for w stored [vocab, D]."""
    if not isinstance(w, QuantWeight):
        return _dot_f32(h, w)
    if w.mode == "int4":
        v, d = w.q.shape
        g = d // w.scale.shape[-1]
        hg = h.astype(jnp.bfloat16).reshape(h.shape[0], d // g, g)
        qg = w.q.reshape(v, d // g, g).astype(jnp.bfloat16)
        # partial[G, s, v] = sum_i h[s, G, i] q[v, G, i]
        partial = jax.lax.dot_general(
            hg, qg, dimension_numbers=(((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32,
        )
        scale = w.scale.astype(jnp.float32).T[:, None, :]  # [d/g, 1, v]
        return jnp.sum(partial * scale, axis=0)
    logits = _dot_f32(h, w.q)
    return logits * w.scale.astype(jnp.float32)[None, :]


def shape_of(w) -> tuple:
    """Logical (dequantized) shape of a parameter leaf."""
    return w.q.shape if isinstance(w, QuantWeight) else w.shape

