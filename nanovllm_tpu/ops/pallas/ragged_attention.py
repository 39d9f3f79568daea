"""Pallas TPU kernels: paged decode attention + ragged paged prefill attention,
with the KV-cache append **fused into the kernels** as DMA stores.

The TPU-native replacement for the reference's attention stack
(``nanovllm/layers/attention.py``): the Triton slot-scatter kernel
(attention.py:10-30) becomes in-kernel DMA writes against an
``input_output_aliases``-aliased cache, and the two flash-attn CUDA entry
points (attention.py:64-74) map to the decode / prefill kernels below.

Why fused: an XLA scatter on the middle (slot) dim of the head-major cache
cannot run in place — the compiler materializes a full-pool temp copy
(measured: +1.47 GB temp and ~3.5 ms per decode step on v5e for a 1.5 GB
pool). In-kernel DMA stores write exactly the new rows (~2 KB/token) and the
aliased cache buffer never moves.

Design (see /opt/skills/guides/pallas_guide.md):
- KV pages live head-major in HBM ([L, Hkv, num_blocks, block_size, hd]); each
  (sequence|tile, page) step DMAs one page across all kv heads into a
  double-buffered VMEM scratch, prefetching page i+1 while computing page i.
- New K/V rows arrive head-major ([Hkv, T, hd]) in HBM; at each sequence/tile
  start the kernel issues HBM->HBM copies into the aliased cache and blocks on
  their completion before any page issued *after* the write is consumed. The
  only read that can predate the write is the first page's prefetch; when the
  written page IS page 0 (num_blocks == 1), that page is re-fetched after the
  write completes.
- Online softmax in fp32 (running m/l + unnormalized accumulator, one divide
  at the end); mask value -0.7*f32max, safe division for empty rows.
- GQA batched over kv heads: q is pre-transposed (cheap XLA transpose outside
  the kernel) to [Hkv, ..., G, hd] so every dot_general has equal batch-dim
  positions (a Mosaic requirement) and no in-kernel relayouts.
- Prefill queries are packed ragged with per-sequence q-tile alignment
  (StepInputs.tile_seq/tile_pos0): grid (num_q_tiles, pages); tiles beyond a
  sequence's kv need and pages past the causal frontier are skipped whole.
  Chunk starts are page-aligned by the scheduler (config asserts
  max_num_batched_tokens % block_size == 0), so a tile's new rows land in one
  page (block_size % q_tile == 0) or span whole pages (q_tile % block_size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a, b):
    return (a + b - 1) // b


# =========================================================== decode kernel
#
# Grouped: each grid step processes GRP sequences against one page each,
# batched into a single MXU-friendly dot with block-diagonal masking. A
# one-sequence-per-step grid spends most of a decode step on per-grid-step
# overhead and sub-MXU matmuls ([G, hd] x [hd, block]); grouping multiplies
# the dot's N dim by GRP and divides grid steps by GRP.

GRP = 8  # sequences per decode grid step (buckets must be multiples)


def _decode_kernel(
    # scalar prefetch
    layer_ref,         # i32[1] layer index into the stacked cache
    kv_lens_ref,       # i32[S]
    tables_ref,        # i32[S, W]
    num_seqs_ref,      # i32[1]
    # inputs (per-group blocks)
    q_ref,             # [Hkv, GRP, G, hd] VMEM (group g)
    k_new_ref,         # [Hkv, GRP, 1, hd] VMEM (one new row per sequence)
    v_new_ref,
    k_hbm,             # [L, Hkv, blocks, block, hd] ANY (aliased in/out)
    v_hbm,
    # outputs
    o_ref,             # [Hkv, GRP, G, hd] VMEM (group g)
    k_out_hbm,         # aliased views of k_hbm / v_hbm
    v_out_hbm,
    # scratch
    k_buf,             # [2, Hkv, GRP*block, hd]
    v_buf,
    sems,              # DMA sems [2, 2, GRP] (k/v, slot, lane)
    w_sems,            # DMA sems [2] (k/v write-back)
    wk_buf,            # [Hkv, 8, hd] staging for the aligned write-back tile
    wv_buf,
    buf_idx_ref,       # SMEM i32[1]
    m_scr,             # f32[Hkv, GRP*G, 128]
    l_scr,             # f32[Hkv, GRP*G, 128]
    acc_scr,           # f32[Hkv, GRP*G, hd]
    *,
    block_size: int,
    sm_scale: float,
):
    g, j = pl.program_id(0), pl.program_id(1)
    layer = layer_ref[0]

    def nb_of(seq):
        return _cdiv(kv_lens_ref[seq], block_size)

    def group_max_nb(grp):
        m = nb_of(grp * GRP)
        for i in range(1, GRP):
            m = jnp.maximum(m, nb_of(grp * GRP + i))
        return m

    gmax = group_max_nb(g)

    def read_group_page(grp, page, slot):
        # One page per live-at-this-depth sequence of the group, landing in
        # that sequence's [block] strip of the buffer. Reads go through the
        # aliased *output* refs: the same HBM buffer on hardware, and in
        # interpret mode (separate arrays) reads then observe the appends.
        for i in range(GRP):
            seq = grp * GRP + i

            @pl.when(page < nb_of(seq))
            def _start(i=i, seq=seq):
                page_id = tables_ref[seq, page]
                pltpu.make_async_copy(
                    k_out_hbm.at[layer, :, page_id],
                    k_buf.at[slot, :, pl.ds(i * block_size, block_size)],
                    sems.at[0, slot, i],
                ).start()
                pltpu.make_async_copy(
                    v_out_hbm.at[layer, :, page_id],
                    v_buf.at[slot, :, pl.ds(i * block_size, block_size)],
                    sems.at[1, slot, i],
                ).start()

    def wait_group_page(grp, page, slot):
        for i in range(GRP):
            seq = grp * GRP + i

            @pl.when(page < nb_of(seq))
            def _wait(i=i, seq=seq):
                pltpu.make_async_copy(
                    k_out_hbm.at[0, :, 0],
                    k_buf.at[slot, :, pl.ds(i * block_size, block_size)],
                    sems.at[0, slot, i],
                ).wait()
                pltpu.make_async_copy(
                    v_out_hbm.at[0, :, 0],
                    v_buf.at[slot, :, pl.ds(i * block_size, block_size)],
                    sems.at[1, slot, i],
                ).wait()

    @pl.when((g == 0) & (j == 0))
    def _init_first():
        buf_idx_ref[0] = 0
        read_group_page(0, 0, 0)

    @pl.when(j < gmax)
    def _work():
        slot = buf_idx_ref[0]

        # Prefetch: rest of this group, else the next group's page 0.
        in_group = j + 1 < gmax
        ngrp = jnp.where(in_group, g, g + 1)
        npage = jnp.where(in_group, j + 1, 0)

        @pl.when(ngrp < pl.num_programs(0))
        def _prefetch():
            read_group_page(ngrp, npage, 1 - slot)

        wait_group_page(g, j, slot)
        buf_idx_ref[0] = 1 - slot

        @pl.when(j == 0)
        def _init_group():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        hkv, grp, groups, hd = q_ref.shape

        def per_seq_scalar(shape, dim, div, fn):
            """Materialize fn(seq) across ``dim`` (where lane index // div is
            the group-local sequence) via scalar-broadcast selects — Mosaic
            cannot relayout a lane vector into a non-minor dim, so build the
            tensor from SMEM scalars directly."""
            idx = jax.lax.broadcasted_iota(jnp.int32, shape, dim) // div
            out = jnp.zeros(shape, jnp.int32)
            for i in range(GRP):
                out = jnp.where(idx == i, fn(g * GRP + i), out)
            return out

        # Convert pages to f32 BEFORE any select: narrow cache dtypes (fp8 /
        # int8) have (32,128) native tiling and masked selects on them force
        # whole-buffer relayouts in Mosaic (measured ~8x step blowup).
        k = k_buf[slot].reshape(hkv, GRP, block_size, hd).astype(jnp.float32)
        v = v_buf[slot].reshape(hkv, GRP, block_size, hd).astype(jnp.float32)

        # This step's new K/V row lands at global position kv_len-1, i.e. in
        # page j exactly when j is the sequence's last page; substitute it in
        # registers (the page was read stale).
        kv4 = per_seq_scalar(k.shape, 1, 1, lambda s_: kv_lens_ref[s_])
        pos4 = j * block_size + jax.lax.broadcasted_iota(jnp.int32, k.shape, 2)
        patch = pos4 == kv4 - 1
        k = jnp.where(patch, k_new_ref[...].astype(jnp.float32), k)
        v = jnp.where(patch, v_new_ref[...].astype(jnp.float32), v)

        # Persist an aligned 8-row tile holding the new row back to the cache
        # (a 1-row DMA at an arbitrary sublane offset is not expressible).
        # The written page is exclusively owned by its sequence.
        for i in range(GRP):
            off = kv_lens_ref[g * GRP + i] - 1 - j * block_size

            @pl.when((off >= 0) & (off < block_size))
            def _write_back(i=i, off=off):
                off8 = pl.multiple_of((off // 8) * 8, 8)
                r = off - off8
                base = i * block_size
                rows_k = k_buf[slot, :, pl.ds(base + off8, 8), :]
                rows_v = v_buf[slot, :, pl.ds(base + off8, 8), :]
                sel = jax.lax.broadcasted_iota(jnp.int32, rows_k.shape, 1) == r
                wk_buf[...] = jnp.where(
                    sel, k_new_ref[:, i].astype(rows_k.dtype), rows_k
                )
                wv_buf[...] = jnp.where(
                    sel, v_new_ref[:, i].astype(rows_v.dtype), rows_v
                )
                page_id = tables_ref[g * GRP + i, j]
                wk = pltpu.make_async_copy(
                    wk_buf,
                    k_out_hbm.at[layer, :, page_id, pl.ds(off8, 8)],
                    w_sems.at[0],
                )
                wv = pltpu.make_async_copy(
                    wv_buf,
                    v_out_hbm.at[layer, :, page_id, pl.ds(off8, 8)],
                    w_sems.at[1],
                )
                wk.start()
                wv.start()
                wk.wait()
                wv.wait()

        q = q_ref[...].astype(jnp.float32).reshape(hkv, GRP * groups, hd)
        kf = k.reshape(hkv, GRP * block_size, hd)
        vf = v.reshape(hkv, GRP * block_size, hd)

        # scores[h, r, c]: one batched dot per head over the whole group.
        scores = jax.lax.dot_general(
            q, kf,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale                        # [Hkv, GRP*G, GRP*block]

        # Block-diagonal (row's sequence == column's sequence) + kv length.
        row_seq = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // groups
        col_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        col_seq = col_idx // block_size
        kv_pos = j * block_size + col_idx % block_size
        kv_len_col = per_seq_scalar(
            scores.shape, 2, block_size, lambda s_: kv_lens_ref[s_]
        )  # column c belongs to group-local sequence c // block_size
        mask = (row_seq == col_seq) & (kv_pos < kv_len_col)
        scores = jnp.where(mask, scores, MASK_VALUE)

        # Zero V's invalid columns: buffer strips of sequences with no page at
        # this depth were never DMA'd, and 0 * garbage (NaN in interpret mode)
        # would poison the p @ V dot even under zero weights.
        v_shape = (hkv, GRP * block_size, hd)
        col_v = jax.lax.broadcasted_iota(jnp.int32, v_shape, 1)
        v_pos = j * block_size + col_v % block_size
        v_len = per_seq_scalar(v_shape, 1, block_size, lambda s_: kv_lens_ref[s_])
        vf = jnp.where(v_pos < v_len, vf, 0.0)

        m_prev = m_scr[:, :, 0]                       # [Hkv, GRP*G]
        l_prev = l_scr[:, :, 0]
        m_curr = jnp.max(scores, axis=-1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(scores - m_next[:, :, None])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)
        m_scr[...] = jnp.broadcast_to(m_next[:, :, None], m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next[:, :, None], l_scr.shape)

        o_curr = jax.lax.dot_general(
            p, vf,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :, None] + o_curr

        @pl.when(j == gmax - 1)
        def _store():
            l = l_scr[:, :, 0]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out = acc_scr[...] * l_inv[:, :, None]    # [Hkv, GRP*G, hd]
            o_ref[...] = out.reshape(hkv, GRP, groups, hd).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,        # [S, Hq, hd] (one query token per sequence)
    k_new: jax.Array,    # [S, Hkv, hd] new K rows (appended at kv_len-1)
    v_new: jax.Array,
    k_cache: jax.Array,  # [L, Hkv, blocks, block, hd] (stacked; reads `layer`)
    v_cache: jax.Array,
    layer,
    meta,
    *,
    sm_scale: float,
    interpret: bool = False,
):
    """Returns (out [S, Hq, hd], k_cache, v_cache) — caches updated in place."""
    S, Hq, hd = q.shape
    _, Hkv, _, block_size, _ = k_cache.shape
    groups = Hq // Hkv
    W = meta.block_tables.shape[1]
    assert S % GRP == 0, f"decode bucket {S} not a multiple of group {GRP}"
    assert block_size % 8 == 0
    q_hm = q.reshape(S, Hkv, groups, hd).transpose(1, 0, 2, 3)
    k_new_hm = k_new.transpose(1, 0, 2)[:, :, None].astype(k_cache.dtype)
    v_new_hm = v_new.transpose(1, 0, 2)[:, :, None].astype(v_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S // GRP, W),
        in_specs=[
            pl.BlockSpec(
                (Hkv, GRP, groups, hd), lambda g, j, *_: (0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Hkv, GRP, 1, hd), lambda g, j, *_: (0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Hkv, GRP, 1, hd), lambda g, j, *_: (0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # k pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # v pages
        ],
        out_specs=[
            pl.BlockSpec(
                (Hkv, GRP, groups, hd), lambda g, j, *_: (0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # k pages (aliased)
            pl.BlockSpec(memory_space=pl.ANY),       # v pages (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, GRP * block_size, hd), k_cache.dtype),
            pltpu.VMEM((2, Hkv, GRP * block_size, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, GRP)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Hkv, 8, hd), k_cache.dtype),
            pltpu.VMEM((Hkv, 8, hd), v_cache.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((Hkv, GRP * groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, GRP * groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, GRP * groups, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, block_size=block_size, sm_scale=sm_scale
    )
    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hkv, S, groups, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # Inputs count from the start of the scalar-prefetch operands:
        # [4 scalars, q, k_new, v_new, k_cache(7), v_cache(8)].
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
        meta.kv_lens, meta.block_tables, meta.num_seqs,
        q_hm, k_new_hm, v_new_hm, k_cache, v_cache,
    )
    return out.transpose(1, 0, 2, 3).reshape(S, Hq, hd), k_cache, v_cache


# ========================================================== prefill kernel


def _prefill_kernel(
    # scalar prefetch
    layer_ref,         # i32[1] layer index into the stacked cache
    tile_seq_ref,      # i32[NT]
    tile_pos0_ref,     # i32[NT]
    kv_lens_ref,       # i32[S]
    tables_ref,        # i32[S, W]
    num_seqs_ref,      # i32[1]
    # inputs
    q_ref,             # [Hkv, BQ, G, hd] VMEM (tile t)
    k_new_hbm,         # [Hkv, T, hd] ANY (packed new rows, tile-aligned)
    v_new_hbm,
    k_hbm,             # [L, Hkv, blocks, block, hd] ANY (aliased in/out)
    v_hbm,
    # outputs
    o_ref,             # [Hkv, BQ, G, hd] VMEM (tile t)
    k_out_hbm,         # aliased views of k_hbm / v_hbm
    v_out_hbm,
    # scratch
    k_buf, v_buf,      # [2, Hkv, block, hd]
    sems,              # [2, 2]
    w_sems,            # [2]
    buf_idx_ref,       # SMEM i32[1]
    m_scr,             # f32[Hkv, BQ, G]
    l_scr,             # f32[Hkv, BQ, G]
    acc_scr,           # f32[Hkv, BQ, G, hd]
    *,
    block_size: int,
    q_tile: int,
    sm_scale: float,
):
    t, j = pl.program_id(0), pl.program_id(1)
    num_seqs = num_seqs_ref[0]
    seq = tile_seq_ref[t]
    live = seq < num_seqs
    safe_seq = jnp.where(live, seq, 0)
    pos0 = tile_pos0_ref[t]
    kv_len = jnp.where(live, kv_lens_ref[safe_seq], 0)
    # Causal frontier: kv needed is min(kv_len, last q position + 1).
    kv_limit = jnp.where(live, jnp.minimum(kv_len, pos0 + q_tile), 0)
    num_blocks = _cdiv(kv_limit, block_size)

    def tile_blocks(tile):
        t_seq = tile_seq_ref[tile]
        t_live = t_seq < num_seqs
        lim = jnp.where(
            t_live,
            jnp.minimum(kv_lens_ref[jnp.where(t_live, t_seq, 0)],
                        tile_pos0_ref[tile] + q_tile),
            0,
        )
        return _cdiv(lim, block_size)

    layer = layer_ref[0]

    def read_page(tile, page, slot):
        # Reads through the aliased *output* refs (see decode kernel note).
        page_id = tables_ref[tile_seq_ref[tile], page]
        pltpu.make_async_copy(
            k_out_hbm.at[layer, :, page_id], k_buf.at[slot], sems.at[0, slot]
        ).start()
        pltpu.make_async_copy(
            v_out_hbm.at[layer, :, page_id], v_buf.at[slot], sems.at[1, slot]
        ).start()

    def wait_page(slot):
        pltpu.make_async_copy(
            k_out_hbm.at[0, :, 0], k_buf.at[slot], sems.at[0, slot]
        ).wait()
        pltpu.make_async_copy(
            v_out_hbm.at[0, :, 0], v_buf.at[slot], sems.at[1, slot]
        ).wait()

    @pl.when((t == 0) & (j == 0))
    def _init_first():
        buf_idx_ref[0] = 0
        read_page(0, 0, 0)

    @pl.when(j < num_blocks)
    def _work():
        slot = buf_idx_ref[0]

        @pl.when(j == 0)
        def _append_kv():
            # Store this tile's new K/V rows into the aliased cache. Chunk
            # starts are page-aligned, so the tile's rows are one run inside a
            # single page (q_tile <= block) or span whole pages (q_tile a
            # multiple of block). Rows past kv_len are garbage but land in
            # pages owned by this sequence and beyond its valid length; pages
            # wholly past kv_len are skipped (their table entries may belong
            # to other sequences).
            n_writes = max(1, q_tile // block_size)
            size = min(q_tile, block_size)
            for w in range(n_writes):
                wpos = pos0 + w * size

                @pl.when(wpos < kv_len)
                def _write(w=w, wpos=wpos):
                    page_id = tables_ref[safe_seq, wpos // block_size]
                    # pos0 is q_tile-aligned and chunk starts are page-aligned
                    # (scheduler invariant), so the in-page offset is a
                    # multiple of min(q_tile, block) — assert it for Mosaic's
                    # sublane-divisibility proof.
                    off = pl.multiple_of(
                        wpos % block_size, min(q_tile, block_size)
                    )
                    src = pl.ds(t * q_tile + w * size, size)
                    wk = pltpu.make_async_copy(
                        k_new_hbm.at[:, src],
                        k_out_hbm.at[layer, :, page_id, pl.ds(off, size)],
                        w_sems.at[0],
                    )
                    wv = pltpu.make_async_copy(
                        v_new_hbm.at[:, src],
                        v_out_hbm.at[layer, :, page_id, pl.ds(off, size)],
                        w_sems.at[1],
                    )
                    wk.start()
                    wv.start()
                    wk.wait()
                    wv.wait()

        # Next working (tile, page): rest of this tile, else next live tile's
        # page 0 (live tiles are contiguous at the front of the grid). Issued
        # after the j==0 writes above, so it observes them.
        in_tile = j + 1 < num_blocks
        ntile = jnp.where(in_tile, t, t + 1)
        npage = jnp.where(in_tile, j + 1, 0)
        nt_total = pl.num_programs(0)
        has_next = jnp.where(
            ntile < nt_total,
            jnp.where(in_tile, True,
                      tile_blocks(jnp.minimum(ntile, nt_total - 1)) > 0),
            False,
        )

        @pl.when(has_next)
        def _prefetch():
            read_page(ntile, npage, 1 - slot)

        wait_page(slot)
        buf_idx_ref[0] = 1 - slot

        @pl.when(j == 0)
        def _init_tile():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

            # Page 0's prefetch predates this tile's writes; re-fetch it when
            # the tile wrote into page 0 (pos0 inside the first page — for
            # q_tile <= block this is exactly the single-page-tile case).
            @pl.when(live & (pos0 < block_size))
            def _refetch():
                read_page(t, 0, slot)
                wait_page(slot)

        hkv, bq, groups, hd = q_ref.shape
        q = q_ref[...].astype(jnp.float32)             # [Hkv, BQ, G, hd]
        k = k_buf[slot]                                 # [Hkv, block, hd]
        # scores[h, bq, g, tok] — batched over kv heads.
        scores = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((3,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [Hkv, BQ, G, block]

        kv_pos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 3
        )
        q_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mask = (kv_pos <= q_pos) & (kv_pos < kv_len)
        scores = jnp.where(mask, scores, MASK_VALUE)

        m_prev, l_prev = m_scr[...], l_scr[...]          # [Hkv, BQ, G]
        m_curr = jnp.max(scores, axis=-1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(scores - m_next[..., None])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1)
        m_scr[...] = m_next

        v = v_buf[slot]                                  # [Hkv, block, hd]
        # o[h, bq, g, d] = sum_tok p[h,bq,g,tok] * v[h,tok,d]
        o_curr = jax.lax.dot_general(
            p, v.astype(jnp.float32),
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[..., None] + o_curr

        @pl.when(j == num_blocks - 1)
        def _store():
            l = l_scr[...]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[...] = (acc_scr[...] * l_inv[..., None]).astype(o_ref.dtype)


def ragged_prefill_attention(
    q: jax.Array,        # [T, Hq, hd] packed ragged, q_tile-aligned per seq
    k_new: jax.Array,    # [T, Hkv, hd] packed new K rows (same alignment)
    v_new: jax.Array,
    k_cache: jax.Array,  # [L, Hkv, blocks, block, hd] (stacked; reads `layer`)
    v_cache: jax.Array,
    layer,
    meta,
    *,
    sm_scale: float,
    q_tile: int = 128,
    interpret: bool = False,
):
    """Returns (out [T, Hq, hd], k_cache, v_cache) — caches updated in place."""
    T, Hq, hd = q.shape
    _, Hkv, _, block_size, _ = k_cache.shape
    groups = Hq // Hkv
    NT = meta.tile_seq.shape[0]
    assert NT * q_tile == T, f"q of {T} rows vs {NT} tiles of {q_tile}"
    assert block_size % q_tile == 0 or q_tile % block_size == 0
    assert q_tile % 8 == 0 and block_size % 8 == 0, "sublane (8) alignment"
    W = meta.block_tables.shape[1]
    q_hm = q.reshape(T, Hkv, groups, hd).transpose(1, 0, 2, 3)
    k_new_hm = k_new.transpose(1, 0, 2).astype(k_cache.dtype)
    v_new_hm = v_new.transpose(1, 0, 2).astype(v_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NT, W),
        in_specs=[
            pl.BlockSpec(
                (Hkv, q_tile, groups, hd), lambda t, j, *_: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # k_new (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # k pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # v pages
        ],
        out_specs=[
            pl.BlockSpec(
                (Hkv, q_tile, groups, hd), lambda t, j, *_: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # k pages (aliased)
            pl.BlockSpec(memory_space=pl.ANY),       # v pages (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, block_size, hd), k_cache.dtype),
            pltpu.VMEM((2, Hkv, block_size, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((Hkv, q_tile, groups), jnp.float32),
            pltpu.VMEM((Hkv, q_tile, groups), jnp.float32),
            pltpu.VMEM((Hkv, q_tile, groups, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        block_size=block_size,
        q_tile=q_tile,
        sm_scale=sm_scale,
    )
    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hkv, T, groups, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # Inputs count from the start of the scalar-prefetch operands:
        # [6 scalars, q, k_new, v_new, k_cache(9), v_cache(10)].
        input_output_aliases={9: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
        meta.tile_seq, meta.tile_pos0, meta.kv_lens, meta.block_tables,
        meta.num_seqs, q_hm, k_new_hm, v_new_hm, k_cache, v_cache,
    )
    return out.transpose(1, 0, 2, 3).reshape(T, Hq, hd), k_cache, v_cache
