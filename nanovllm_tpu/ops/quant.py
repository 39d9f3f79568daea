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
# int4 EXPERT stacks use a k-nibble packing tied to the grouped-matmul
# kernel's tile shape (ops/pallas/megablox_gmm.gmm_int4): quant group = one
# kernel k-tile, so the group scale commutes to a post-dot multiply.
INT4_EXPERT_GROUP = 128
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


def to_packed_int4(x8: jax.Array) -> jax.Array:
    """Convert int8 bytes (values in [-8, 7]) to int4 in the PACKED device
    layout (two values per byte) that AOT-lowered step executables require
    for their int4 parameters.

    The layout is requested via a Format out_shardings, but the persistent
    compilation cache's key does NOT include output-layout requests: a cached
    unpacked-output variant of an identical-looking program silently shadows
    the request (measured: the same jit returns
    sub_byte_element_size_in_bits=0 with a warm cache and =4 against a fresh
    cache dir). The optimization_barrier over a distinctive constant makes
    this program's HLO unique so its cache entry can never collide with an
    unformatted variant, and the assert turns any future regression into a
    loud init-time failure instead of an AOT dispatch error."""
    fmt = packed_int4_format(x8.shape, x8.sharding)

    def conv(x):
        q = jnp.clip(x, -8, 7).astype(jnp.int4)
        q, _ = jax.lax.optimization_barrier((q, jnp.int32(0x9ACD)))
        return q

    kwargs = {"out_shardings": fmt} if fmt is not None else {}
    # The persistent cache additionally LOSES the packed layout on a cache
    # HIT of this very program (measured r3: a fresh compile returns
    # sub_byte_element_size_in_bits=4, reloading the identical entry from
    # the on-disk cache returns =0 — the serialized executable drops the
    # Format). Conversion programs are tiny; compile them uncached (via the
    # public flag, saved/restored — jax._src paths carry no API stability).
    prev = jax.config.jax_enable_compilation_cache
    try:
        jax.config.update("jax_enable_compilation_cache", False)
        out = jax.jit(conv, **kwargs)(x8)
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
    if jax.devices()[0].platform in ("tpu", "axon"):
        layout = str(getattr(out, "format", ""))
        assert "sub_byte_element_size_in_bits=4" in layout, (
            f"int4 conversion produced a non-packed layout: {layout}"
        )
    return out


def packed_int4_format(shape: tuple, sharding):
    """Ask for the *packed* int4 device layout explicitly (two values per
    byte, TPU tiling ((64,128),(8,1)) — the (8k,128)/(k,1) narrow-dtype
    pattern with k = 8). The runtime's layout-assignment default for jit
    outputs and host device_puts is UNPACKED int4
    (sub_byte_element_size_in_bits=0), while AOT-lowered step executables
    require the packed default for their int4 parameters — mismatched
    layouts are a dispatch error, and unpacked int4 would also stream
    int8-sized bytes, forfeiting the packing bandwidth win."""
    if sharding is None:
        return None
    devs = getattr(sharding, "device_set", None)
    if not devs or next(iter(devs)).platform not in ("tpu", "axon"):
        return sharding  # CPU backend: no TPU tilings
    from jax.experimental.layout import Format, Layout

    layout = Layout(
        major_to_minor=tuple(range(len(shape))),
        tiling=((64, 128), (8, 1)),
        sub_byte_element_size_in_bits=4,
    )
    return Format(layout, sharding)


# ------------------------------------------------- int4 expert k-packing
#
# Expert stacks quantize group-wise along the contraction (k) dim — the
# scales do NOT commute with the grouped matmul like per-out-channel int8
# scales do, so the grouped-matmul kernel dequantizes in-VMEM. The packing
# is chosen for that kernel: within each ``group``-row block of k, byte row
# j holds original row (base + j) in the LOW nibble and row
# (base + group//2 + j) in the HIGH nibble. One packed k-tile
# ([group//2, tn] bytes) then unpacks to the block's original rows IN ORDER
# via two shifts and a sublane concat — no nibble interleave (a Mosaic
# relayout) and no lhs permutation. Storage is int8 (uint8 has no Mosaic
# f32 cast); any byte decodes to two values in [-8, 7].


def pack_int4_k(q8, group: int = INT4_EXPERT_GROUP):
    """Pack int4 values (int8 in [-8, 7], shape [..., k, n]) along k into
    the knibble layout above -> int8 [..., k // 2, n]."""
    *lead, k, n = q8.shape
    t = group // 2
    assert group % 2 == 0 and k % group == 0, (k, group)
    b = jnp.asarray(q8, jnp.int32).reshape(*lead, k // group, 2, t, n)
    v = (b[..., 0, :, :] & 0xF) | ((b[..., 1, :, :] & 0xF) << 4)
    v = v - 256 * (v >= 128)  # wrap to signed without out-of-range casts
    return v.astype(jnp.int8).reshape(*lead, k // 2, n)


def unpack_int4_k(packed, group: int):
    """Inverse of ``pack_int4_k``: int8 [..., k//2, n] -> int8 [..., k, n]
    (portable jnp; the TPU kernel unpacks tiles in-VMEM instead)."""
    *lead, kp, n = packed.shape
    t = group // 2
    assert kp % t == 0, (kp, group)
    b = jnp.asarray(packed, jnp.int32).reshape(*lead, kp // t, t, n)
    hi = b >> 4                       # arithmetic: sign-correct
    lo_u = b & 0xF
    lo = lo_u - 16 * (lo_u >= 8)
    vals = jnp.stack([lo, hi], axis=-3)       # [..., k/group, 2, t, n]
    return vals.astype(jnp.int8).reshape(*lead, 2 * kp, n)


def dequant_int4_k(packed, scale, dtype):
    """Dequantize a k-nibble-packed tensor ([..., k//2, n] int8 with
    group scales [..., k/group, n]) to a dense [..., k, n] array."""
    group = 2 * packed.shape[-2] // scale.shape[-2]
    vals = unpack_int4_k(packed, group)
    *lead, k, n = vals.shape
    v = vals.astype(dtype).reshape(*lead, k // group, group, n)
    return (v * scale.astype(dtype)[..., :, None, :]).reshape(*lead, k, n)


def expert_int4_group(in_dim: int, shard_k: int = 1,
                      base: int = INT4_EXPERT_GROUP) -> int:
    """Quant group for an expert stack's contraction dim: divides ``in_dim``
    and (when the contraction dim is sharded over ``shard_k`` ranks) splits
    its group count evenly so every rank holds whole groups. Groups below
    the kernel tile (128) fall back to the XLA dequant path in ops/moe."""
    g = base
    while g > 1 and (in_dim % g or (in_dim // g) % shard_k):
        g //= 2
    assert g >= 2 and in_dim % g == 0, (in_dim, shard_k)
    return g


def quantize_expert_int4(w: np.ndarray | jax.Array,
                         group: int | None = None) -> QuantWeight:
    """Group-wise int4 quantization of an expert stack [..., k, n] into the
    k-nibble-packed storage (q int8 [..., k//2, n], scale [..., k/g, n])."""
    w = np.asarray(w)
    g = group or expert_int4_group(w.shape[-2])
    axis = w.ndim - 2
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        def fn(w):
            wf = w.astype(jnp.float32)
            shape = wf.shape[:axis] + (wf.shape[axis] // g, g) + wf.shape[axis + 1:]
            wg = wf.reshape(shape)
            amax = jnp.max(jnp.abs(wg), axis=axis + 1, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) / 7.0
            q8 = jnp.clip(jnp.round(wg / scale), -8, 7).reshape(wf.shape)
            return pack_int4_k(q8.astype(jnp.int8), g), jnp.squeeze(
                scale, axis + 1
            )

        q, scale = jax.jit(fn)(w)
    return QuantWeight(q=np.asarray(q), scale=np.asarray(scale), mode="int4")


# ---------------------------------------------------------------- matmul


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for a plain array or a QuantWeight stored [in, out]."""
    if not isinstance(w, QuantWeight):
        return x @ w
    if w.mode == "int4":
        # Dequantize the weight to one [in, out] compute-dtype tensor, then a
        # single full dot. The transient costs ~2x the int4 bytes of extra
        # HBM traffic per use; the r1 group-accumulation loop instead
        # streamed the [T, out] f32 accumulator once per group — ~25 GB per
        # 8B gate_up at the 16k-token prefill bucket, 60x the weight bytes.
        # (Group scales vary along the contraction dim, so they cannot fold
        # after the dot like the int8/fp8 per-out-channel scales.)
        assert w.q.ndim == 2, "int4 matmul operates on per-layer [in, out] slices"
        gi = w.scale.shape[-2]
        in_dim, n_out = w.q.shape
        g = in_dim // gi
        wq = w.q.astype(x.dtype).reshape(gi, g, n_out)
        wq = (wq * w.scale.astype(x.dtype)[:, None, :]).reshape(in_dim, n_out)
        return x @ wq
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
        gi = w.scale.shape[-1]
        g = d // gi
        hb = h.astype(jnp.bfloat16)
        # Dequantize vocab CHUNKS to bf16 and dot each (a whole-[V, D]
        # dequant would transiently cost 1.2 GB for an 8B head; the r1
        # group-loop instead streamed the [S, V] f32 logits once per group —
        # ~10 GB per step at S=256). The last chunk's start clamps, so its
        # rows recompute identical values over the overlap.
        chunk = min(v, 8192)
        n_chunks = -(-v // chunk)

        def body(i, logits):
            start = jnp.minimum(i * chunk, v - chunk)
            qv = jax.lax.dynamic_slice_in_dim(w.q, start, chunk, 0)
            sv = jax.lax.dynamic_slice_in_dim(w.scale, start, chunk, 0)
            wv = (
                qv.astype(jnp.bfloat16).reshape(chunk, gi, g)
                * sv.astype(jnp.bfloat16)[:, :, None]
            ).reshape(chunk, d)
            part = jax.lax.dot_general(
                hb, wv, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jax.lax.dynamic_update_slice(logits, part, (0, start))

        return jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((h.shape[0], v), jnp.float32)
        )
    logits = _dot_f32(h, w.q)
    return logits * w.scale.astype(jnp.float32)[None, :]


def shape_of(w) -> tuple:
    """Logical (dequantized) shape of a parameter leaf."""
    return w.q.shape if isinstance(w, QuantWeight) else w.shape

