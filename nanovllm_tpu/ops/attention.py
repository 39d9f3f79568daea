"""Paged-KV attention ops: cache scatter + ragged paged attention.

TPU-native replacement for the reference's attention stack
(``nanovllm/layers/attention.py``): the Triton slot-scatter kernel
(attention.py:10-30) becomes an XLA scatter over a donated cache buffer, and
the two flash-attn CUDA entry points (varlen prefill / paged decode,
attention.py:64-74) are unified into a single *ragged paged attention* op that
handles mixed prefill+decode batches: every key/value lives in the paged cache
(new KV is scattered in first), and queries are a packed ragged batch.

Two implementations share one interface:
- ``ragged_paged_attention_ref``: pure-jnp gather-based oracle (CPU tests,
  small shapes only — it materializes [T, max_kv, ...]).
- ``nanovllm_tpu.ops.pallas.ragged_attention``: the production Pallas kernel.

Cache layout (per layer): ``k_cache, v_cache: [num_kv_heads, num_blocks,
block_size, head_dim]`` — head-major so (a) the Pallas kernels' batched-over-
kv-heads matmuls see equal batch-dim positions (a Mosaic requirement), and
(b) tensor parallelism shards dim 0. Per-head pages are contiguous
[block_size, head_dim] runs in HBM; the (blocks, block_size) dims flatten to
``num_blocks * block_size`` slots for the scatter (reference slot semantics,
model_runner.py:129-161).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class AttentionMeta(NamedTuple):
    """Per-step ragged-batch metadata (the jit-visible analogue of the
    reference's global Context, utils/context.py:5-14)."""

    positions: jax.Array      # i32[T] absolute position of each query token
    slot_mapping: jax.Array   # i32[T] flat cache slot per token; -1 = padding
    seq_ids: jax.Array        # i32[T] row in the [S] arrays; S = padding row
    kv_lens: jax.Array        # i32[S] total kv length per sequence
    block_tables: jax.Array   # i32[S, W] physical block ids
    cu_q_lens: jax.Array      # i32[S+1] cumulative query lengths
    num_seqs: jax.Array       # i32[1] live sequence count
    tile_seq: jax.Array       # i32[NT] q-tile -> sequence (prefill kernel)
    tile_pos0: jax.Array      # i32[NT] q-tile row-0 absolute position
    pair_tile: jax.Array      # i32[NP] active (tile, page) worklist
    pair_page: jax.Array      # i32[NP]
    # Speculative verify steps only (None otherwise): new KV rows to append
    # per sequence (the decode kernel's q_len > 1 mode).
    append_lens: jax.Array | None = None


def write_kv(k_all, v_all, layer, k, v, slot_mapping):
    """Scatter new K/V rows into layer ``layer`` of the stacked paged cache
    ([L, Hkv, blocks, block, hd]) at ``slot_mapping``.

    Used only by the jnp oracle path (CPU tests): on TPU the write is fused
    into the Pallas attention kernels as DMA stores (an XLA scatter on the
    middle dim of the head-major cache forces a full-pool temp copy and runs
    ~100x slower than the data moved — measured on v5e).

    Padding tokens carry slot -1 (reference early-return semantics,
    attention.py:23); they are redirected out of bounds and dropped.
    ``k, v: [T, num_kv_heads, head_dim]``.
    """
    if isinstance(k_all, tuple):
        # Quantized cache: (values, f32 per-token scales) — int8 full-head,
        # or uint8 nibble-packed int4 (head-paired, quantize_kv_rows_int4).
        from nanovllm_tpu.ops.pallas.ragged_attention import (
            quantize_kv_rows,
            quantize_kv_rows_int4,
        )

        kq_all, ks_all = k_all
        vq_all, vs_all = v_all
        rowq = (
            quantize_kv_rows_int4
            if kq_all.dtype == jnp.uint8
            else quantize_kv_rows
        )
        kq, ks = rowq(k)
        vq, vs = rowq(v)
        kq_all, vq_all = write_kv(kq_all, vq_all, layer, kq, vq, slot_mapping)
        # Scales are page-major [L, blocks, Hkv, block].
        L, nb, H, bs = ks_all.shape
        pages = jnp.where(slot_mapping < 0, nb, slot_mapping // bs)
        lanes = jnp.where(slot_mapping < 0, 0, slot_mapping % bs)
        layer = jnp.asarray(layer, jnp.int32)
        ks_all = ks_all.at[layer, pages, :, lanes].set(ks, mode="drop")
        vs_all = vs_all.at[layer, pages, :, lanes].set(vs, mode="drop")
        return (kq_all, ks_all), (vq_all, vs_all)
    L, num_kv_heads, num_blocks, block_size, head_dim = k_all.shape
    n_slots = num_blocks * block_size
    slots = jnp.where(slot_mapping < 0, n_slots, slot_mapping)
    # `layer` as a 0-d array makes both indexes advanced: the indexed shape is
    # (T, Hkv, hd) — element [t, h] addresses kc[layer, h, slots[t]].
    layer = jnp.asarray(layer, jnp.int32)
    kc = k_all.reshape(L, num_kv_heads, n_slots, head_dim)
    vc = v_all.reshape(L, num_kv_heads, n_slots, head_dim)
    kc = kc.at[layer, :, slots].set(k.astype(kc.dtype), mode="drop")
    vc = vc.at[layer, :, slots].set(v.astype(vc.dtype), mode="drop")
    return kc.reshape(k_all.shape), vc.reshape(v_all.shape)


def ragged_paged_attention_ref(
    q: jax.Array,          # [T, num_q_heads, head_dim]
    k_new: jax.Array,      # [T, num_kv_heads, head_dim] this step's K rows
    v_new: jax.Array,
    k_all: jax.Array,      # [L, num_kv_heads, num_blocks, block_size, head_dim]
    v_all: jax.Array,
    layer,
    meta: AttentionMeta,
    *,
    sm_scale: float,
    window: int | None = None,
):
    """Gather-based jnp oracle: scatter new KV, then attend over the paged
    cache. Returns (out, k_all, v_all). O(T * W*block_size) memory — tests
    only."""
    k_all, v_all = write_kv(k_all, v_all, layer, k_new, v_new, meta.slot_mapping)
    out = _paged_attention_ref(
        q, k_all, v_all, layer, meta, sm_scale=sm_scale, window=window
    )
    return out, k_all, v_all


def _paged_attention_ref(
    q: jax.Array,
    k_all: jax.Array,
    v_all: jax.Array,
    layer,
    meta: AttentionMeta,
    *,
    sm_scale: float,
    window: int | None = None,
) -> jax.Array:
    def layer_of(cache):
        if isinstance(cache, tuple):
            vals, scales = cache
            v_ = jax.lax.dynamic_index_in_dim(vals, layer, 0, keepdims=False)
            s_ = jax.lax.dynamic_index_in_dim(scales, layer, 0, keepdims=False)
            if vals.dtype == jnp.uint8:
                # int4: unpack head-paired nibbles [Hs,...] -> [Hkv,...].
                from nanovllm_tpu.ops.pallas.ragged_attention import (
                    unpack_int4_heads,
                )

                v_ = unpack_int4_heads(v_)
            else:
                v_ = v_.astype(jnp.float32)
            # scales are page-major [blocks, Hkv, block] -> head-major.
            return v_ * s_.transpose(1, 0, 2)[..., None]
        return jax.lax.dynamic_index_in_dim(cache, layer, 0, keepdims=False)

    k_cache = layer_of(k_all)
    v_cache = layer_of(v_all)
    T, num_q_heads, head_dim = q.shape
    num_kv_heads, num_blocks, block_size, _ = k_cache.shape
    groups = num_q_heads // num_kv_heads
    S, W = meta.block_tables.shape
    max_kv = W * block_size

    # Per-token gather of that token's sequence pages.
    tables = jnp.concatenate(
        [meta.block_tables, jnp.zeros((1, W), jnp.int32)], axis=0
    )  # padding row
    tok_tables = tables[jnp.minimum(meta.seq_ids, S)]          # [T, W]
    k = k_cache[:, tok_tables].reshape(num_kv_heads, T, max_kv, head_dim)
    v = v_cache[:, tok_tables].reshape(num_kv_heads, T, max_kv, head_dim)

    kv_lens = jnp.concatenate([meta.kv_lens, jnp.zeros((1,), jnp.int32)])
    tok_kv_len = kv_lens[jnp.minimum(meta.seq_ids, S)]          # [T]

    qg = q.reshape(T, num_kv_heads, groups, head_dim)
    scores = jnp.einsum(
        "thgd,htkd->thgk", qg.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale                                                # [T, Hkv, g, max_kv]
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1, max_kv), 3)
    mask = (kv_idx <= meta.positions[:, None, None, None]) & (
        kv_idx < tok_kv_len[:, None, None, None]
    )
    if window is not None:
        # Sliding window (HF semantics): keys in (q_pos - window, q_pos].
        mask &= kv_idx > meta.positions[:, None, None, None] - window
    scores = jnp.where(mask, scores, MASK_VALUE)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thgk,htkd->thgd", w, v.astype(jnp.float32))
    return out.reshape(T, num_q_heads, head_dim).astype(q.dtype)
