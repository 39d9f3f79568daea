"""Pallas TPU kernels: paged decode attention + ragged paged prefill attention,
with the KV-cache append **fused into the kernels** as DMA stores, in bf16 or
int8-with-per-token-scales cache precision.

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
  grid step DMAs pages across all kv heads into double-buffered VMEM scratch,
  prefetching the next step's pages while computing the current ones.
- Quantized mode: the cache is a (values int8, scales f32) pair per K/V, one
  scale per (token, head), laid out page-major [L, blocks, Hkv, block] so a
  page's scales form one aligned [Hkv, block] tile. New rows are quantized by
  XLA outside the kernel; in-kernel the scales FOLD into the scores (K) and
  probabilities (V) — the token dim sits on lanes there, and a lane vector
  cannot relayout onto the pages' sublane dim. (fp8 was measured ~8x slower
  end-to-end: v5e has no hardware fp8, Mosaic emulates the converts.)
- Pages convert to f32 BEFORE any masked select: narrow dtypes have (32,128)
  native tiling and selects on them force whole-buffer relayouts.
- Cache appends: prefill writes new rows page-by-page before its reads (page
  0 is re-fetched when its prefetch predates the write); decode folds the
  new token's self-attention into the group's accumulator INIT (m starts at
  the self-score, l at 1, acc at v_new — tiny per-group tensors), masks
  history at kv_len-1, and persists an aligned tile asynchronously — written
  pages have no same-invocation readers, so the DMAs drain lazily (per-lane
  staging; final drain at the last grid step).
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a, b):
    return (a + b - 1) // b


def _is_quantized(cache) -> bool:
    return isinstance(cache, tuple)


def quantize_kv_rows(x: jax.Array):
    """Per-(token, head) symmetric int8 quantization of new K/V rows.
    x: [T, Hkv, hd] -> (int8 [T, Hkv, hd], f32 scales [T, Hkv])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kv_rows_int4(x: jax.Array):
    """Per-(token, head) int4 quantization, nibble-packed along the KV-HEAD
    dim: byte h holds head h (low nibble) and head h + Hkv/2 (high nibble),
    each stored biased +8 (1..15, symmetric range ±7·scale).

    Head-pairing (not token- or lane-pairing) keeps the packed page's
    (sublane=token, lane=hd) tiling identical to int8 — no new Mosaic
    alignment surface — and makes appends RMW-free: a new token's rows for
    ALL heads are written together, so both nibbles of every byte are known
    at write time. Within a shard_map the pairing is shard-local, matching
    the contiguous-head TP sharding.

    x: [T, Hkv, hd] (Hkv even) -> (uint8 [T, Hkv/2, hd], f32 [T, Hkv]).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7) + 8.0
    hs = x.shape[1] // 2
    packed = (q[:, :hs] + 16.0 * q[:, hs:]).astype(jnp.uint8)
    return packed, scale


def unpack_int4_heads(b: jax.Array) -> jax.Array:
    """f32 nibble-packed bytes [Hs, ...] -> unbiased f32 values [2*Hs, ...]
    (head h from the low nibble, head h + Hs from the high). Pure f32
    arithmetic (exact for 0..255) — no narrow-int shifts, which would force
    whole-buffer relayouts in Mosaic. Mosaic has no uint8->f32 cast (measured
    on chip r2): bitcast to int8 (same bits, same tiling), cast through the
    proven int8->f32 path, and undo two's complement in f32."""
    bi = jax.lax.bitcast_convert_type(b, jnp.int8).astype(jnp.float32)
    bf = jnp.where(bi < 0.0, bi + 256.0, bi)
    hi = jnp.floor(bf * (1.0 / 16.0))
    lo = bf - hi * 16.0
    return jnp.concatenate([lo, hi], axis=0) - 8.0


# =========================================================== decode kernel
#
# Grouped: each grid step processes GRP sequences against one page each,
# batched into a single MXU-friendly dot with block-diagonal masking. A
# one-sequence-per-step grid spends most of a decode step on per-grid-step
# overhead and sub-MXU matmuls ([G, hd] x [hd, block]); grouping multiplies
# the dot's N dim by GRP and divides grid steps by GRP.
#
# The grid is a FLAT WORKLIST of live (group, page) pairs (like the prefill
# kernel): a dense (groups x max_pages) grid left ~2/3 of its iterations
# skipped at bench shapes, and skipped steps still pay per-step scalar
# overhead. The engine sorts decode batches by kv length so each group has
# near-uniform page depth (a group's DMA reads run to its max member).

# Sequences per decode grid step (buckets must be multiples; Config rounds).
# NANOVLLM_GRP overrides for hardware experiments — every consumer (bucket
# rounding, worklist builder, kernel) reads this module constant.
GRP = int(os.environ.get("NANOVLLM_GRP", "8"))

# Partial-last-page DMA rungs: a sequence's final page is fetched only up to
# the smallest rung covering its valid rows (full pages use the last rung ==
# block_size). Rung granularity 64 satisfies every dtype's sublane tile
# (int8/fp8 32, bf16 8). At bench shapes (~1.1k avg context, 256-blocks) the
# full-page fetch wasted ~12% of DMA bytes on rows past kv_len.
# NANOVLLM_PAGE_RUNG overrides (any value >= block_size restores whole-page
# fetches — the pre-rung code path, byte for byte). Values below a block
# must divide it in 32-row steps: n_rungs = block // rung is assumed exact
# (a non-divisor under-fetches the last rung's rows), and 32 satisfies the
# largest sublane tile any cache dtype needs (int8/fp8 32; bf16/f32 8).
# r5: rung=32 measured on chip — see benchmarks/README before changing the
# default.
PAGE_RUNG = int(os.environ.get("NANOVLLM_PAGE_RUNG", "64"))
assert PAGE_RUNG > 0, f"NANOVLLM_PAGE_RUNG={PAGE_RUNG} must be positive"

# Dot-operand dtype experiment: q/k/p/v MXU operands in bf16 instead of f32
# (accumulation stays f32 via preferred_element_type). Dequantized int8/int4
# values are small integers — exact in bf16 — and v5e's MXU runs f32 dots at
# a fraction of its bf16 rate, so once int4 halves the DMA time the f32 dots
# can become the kernel bottleneck. Off by default until measured on chip.
DOT_DTYPE = (
    jnp.bfloat16
    if os.environ.get("NANOVLLM_DOT_BF16", "0") == "1"
    else jnp.float32
)

# Prefill-only dot-operand dtype. The two kernels sit in different regimes
# (r3 profiles): decode is page-DMA-bound (bf16 operands measured a
# regression — the converts add VPU passes), while prefill's per-pair dots
# are M=256-deep and f32-MXU-bound (~5.5us of the ~5.6us/pair). bf16
# operands measured +7% end-to-end at the headline bench (7781 vs 7261)
# without touching decode; scores still accumulate in f32
# (preferred_element_type), and dequantized int8/int4 values are exact in
# bf16. NANOVLLM_PREFILL_DOT_BF16=0 restores f32 operands.
PREFILL_DOT_DTYPE = (
    DOT_DTYPE
    if os.environ.get("NANOVLLM_PREFILL_DOT_BF16", "1") == "0"
    else jnp.bfloat16
)


def _decode_kernel(
    # scalar prefetch
    layer_ref,         # i32[1] layer index into the stacked cache
    kv_lens_ref,       # i32[S]
    tables_ref,        # i32[S, W]
    num_seqs_ref,      # i32[1]
    pair_grp_ref,      # i32[NP] flat worklist of live (group, page) pairs,
    pair_page_ref,     # i32[NP] group-major; padding pairs carry group S/GRP
    *rest,             # [append_lens_ref i32[S] when q_len > 1],
                       # [window_ref i32[1] when windowed], then the operands
                       # below (windowed is static; the window VALUE is a
                       # runtime scalar so per-layer local/global mixes share
                       # one compiled program — a huge value disables masking)
    block_size: int,
    sm_scale: float,
    quantized: bool,
    kv_bits: int,
    wb_tile: int,
    wb_store: int,
    q_len: int,
    windowed: bool,
    interpret: bool,
):
    append_lens_ref = None
    if q_len > 1:
        append_lens_ref, rest = rest[0], rest[1:]
    if windowed:
        window_ref, rest = rest[0], rest[1:]
        window = window_ref[0]
    else:
        window = None
    (
        q_ref,             # [Hkv, GRP, G, hd] VMEM (group g)
    k_new_ref,         # [Hkv, GRP, 1, hd] VMEM model-dtype new rows (compute)
    v_new_ref,
    k_store_ref,       # [Hkv, GRP, 1, hd] VMEM cache-dtype rows (write-back)
    v_store_ref,
    ks_new_ref,        # [Hkv, GRP, block] VMEM f32 scale, lane-broadcast (q8)
    vs_new_ref,
    k_hbm,             # [L, Hkv, blocks, block, hd] ANY (aliased in/out)
    v_hbm,
    ks_hbm,            # [L, blocks, Hkv, block] ANY f32 scales (q8; aliased)
    vs_hbm,
    # outputs
    o_ref,             # [Hkv, GRP, G, hd] VMEM (group g)
    k_out_hbm,         # aliased views of the cache arrays
    v_out_hbm,
    ks_out_hbm,
    vs_out_hbm,
    # scratch
    k_buf,             # [2, Hkv, GRP*block, hd] cache dtype
    v_buf,
    ks_buf,            # [2, Hkv, GRP*block] f32 (q8)
    vs_buf,
    sems,              # DMA sems [NCH, 2, GRP] (channel, slot, lane)
    w_sems,            # DMA sems [4] write-backs
    wk_buf,            # [GRP, Hkv, TILE, hd] per-lane write-back staging
    wv_buf,
    wks_buf,           # [GRP, Hkv, block] f32 per-lane scale-slab staging (q8)
    wvs_buf,
    buf_idx_ref,       # SMEM i32[1]
    wb_flags,          # SMEM i32[GRP]: lane has an in-flight write-back
    m_scr,             # f32[Hkv, GRP*G, 128]
    l_scr,             # f32[Hkv, GRP*G, 128]
    acc_scr,           # f32[Hkv, GRP*G, hd]
    ) = rest
    # The grid is a flat worklist of live (group, page) pairs (group-major,
    # pages ascending): a dense (groups x max_pages) grid spends most steps
    # skipped — at bench shapes ~2/3 of grid iterations — and their per-step
    # scalar work still costs real time (measured ~25% of the kernel).
    i = pl.program_id(0)
    np_ = pl.num_programs(0)
    nG = kv_lens_ref.shape[0] // GRP
    g_raw = pair_grp_ref[i]
    live = g_raw < nG
    g = jnp.minimum(g_raw, nG - 1)
    j = pair_page_ref[i]
    layer = layer_ref[0]

    def nb_of(seq):
        return _cdiv(kv_lens_ref[seq], block_size)

    n_rungs = max(1, block_size // PAGE_RUNG)
    rung = block_size // n_rungs  # == PAGE_RUNG, or the whole (small) block
    assert rung * n_rungs == block_size and (n_rungs == 1 or rung % 32 == 0), (
        f"PAGE_RUNG={PAGE_RUNG} must divide block_size={block_size} in "
        f"32-row steps (or exceed it for whole-page fetches)"
    )

    def rung_conds(rows):
        """Static per-rung predicates: rung r fetches r*rung rows. The last
        rung also covers full pages (rows >= block); rows <= 0 means the
        lane has no page at this depth and fetches nothing. Start and wait
        recompute identical predicates from the same prefetched scalars, so
        every start has exactly one matching wait."""
        conds = []
        for r in range(1, n_rungs + 1):
            lo = (r - 1) * rung
            c = rows > lo
            if r < n_rungs:
                c &= rows <= r * rung
            conds.append((c, r * rung))
        return conds

    def lane_rows(seq, page):
        """Rows of ``page`` this lane must fetch: valid rows under kv_len,
        zero when a sliding window has rolled past the whole page (need page
        j iff (j+1)*block > kv_len-1-window; the last page always qualifies,
        keeping the fused write-back covered). Start/wait/zero predicates all
        derive from this one value, so every start has a matching wait."""
        rows = kv_lens_ref[seq] - page * block_size
        if window is not None:
            need = (page + 1) * block_size > kv_lens_ref[seq] - 1 - window
            rows = jnp.where(need, rows, 0)
        return rows

    def read_group_page(grp, page, slot):
        # One page per live-at-this-depth sequence of the group, landing in
        # that sequence's [block] strip of the buffer — fetched only up to
        # the rung covering its valid rows (full pages = last rung). Reads go
        # through the aliased *output* refs: the same HBM buffer on hardware,
        # and in interpret mode (separate arrays) reads then observe appends.
        for i in range(GRP):
            seq = grp * GRP + i
            rows = lane_rows(seq, page)

            for cond, hi in rung_conds(rows):

                @pl.when(cond)
                def _start(i=i, seq=seq, hi=hi):
                    page_id = tables_ref[seq, page]
                    pltpu.make_async_copy(
                        k_out_hbm.at[layer, :, page_id, pl.ds(0, hi)],
                        k_buf.at[slot, :, pl.ds(i * block_size, hi)],
                        sems.at[0, slot, i],
                    ).start()
                    pltpu.make_async_copy(
                        v_out_hbm.at[layer, :, page_id, pl.ds(0, hi)],
                        v_buf.at[slot, :, pl.ds(i * block_size, hi)],
                        sems.at[1, slot, i],
                    ).start()

            if quantized:
                # Scale tiles are fetched whole regardless of rung: their
                # lane-dim (block) slicing wants 128-alignment and the tile
                # is ~3% of the page bytes.
                @pl.when(rows > 0)
                def _scales(i=i, seq=seq):
                    page_id = tables_ref[seq, page]
                    strip = pl.ds(i * block_size, block_size)
                    pltpu.make_async_copy(
                        ks_out_hbm.at[layer, page_id],
                        ks_buf.at[slot, :, strip],
                        sems.at[2, slot, i],
                    ).start()
                    pltpu.make_async_copy(
                        vs_out_hbm.at[layer, page_id],
                        vs_buf.at[slot, :, strip],
                        sems.at[3, slot, i],
                    ).start()
            else:
                # Un-DMA'd V rows (no page at this depth, or rows past the
                # fetched rung): bf16 scratch garbage can be NaN (on hardware
                # and in interpret mode), and the p @ V dot then sums 0 * NaN.
                # Zero them. (K needs nothing: NaN scores die in the mask
                # *select*; int8 garbage is always finite and the scale folds
                # contribute exact zeros.)
                for r in range(n_rungs):
                    cond = (rows <= 0) if r == 0 else (
                        (rows > (r - 1) * rung) & (rows <= r * rung)
                    )

                    @pl.when(cond)
                    def _zero(i=i, r=r):
                        off = i * block_size + r * rung
                        n = block_size - r * rung
                        v_buf[slot, :, pl.ds(off, n), :] = jnp.zeros(
                            (v_buf.shape[1], n, v_buf.shape[3]), v_buf.dtype
                        )

    def wait_group_page(grp, page, slot):
        for i in range(GRP):
            seq = grp * GRP + i
            rows = lane_rows(seq, page)

            for cond, hi in rung_conds(rows):

                @pl.when(cond)
                def _wait(i=i, hi=hi):
                    pltpu.make_async_copy(
                        k_out_hbm.at[0, :, 0, pl.ds(0, hi)],
                        k_buf.at[slot, :, pl.ds(i * block_size, hi)],
                        sems.at[0, slot, i],
                    ).wait()
                    pltpu.make_async_copy(
                        v_out_hbm.at[0, :, 0, pl.ds(0, hi)],
                        v_buf.at[slot, :, pl.ds(i * block_size, hi)],
                        sems.at[1, slot, i],
                    ).wait()

            if quantized:

                @pl.when(rows > 0)
                def _wait_scales(i=i):
                    strip = pl.ds(i * block_size, block_size)
                    pltpu.make_async_copy(
                        ks_out_hbm.at[0, 0], ks_buf.at[slot, :, strip],
                        sems.at[2, slot, i],
                    ).wait()
                    pltpu.make_async_copy(
                        vs_out_hbm.at[0, 0], vs_buf.at[slot, :, strip],
                        sems.at[3, slot, i],
                    ).wait()

    def _wait_lane_writes(i):
        # Waits must mirror the starts exactly (2 channels, 4 if quantized).
        pltpu.make_async_copy(
            wk_buf.at[i], k_out_hbm.at[0, :, 0, pl.ds(0, wb_store)],
            w_sems.at[0, i],
        ).wait()
        pltpu.make_async_copy(
            wv_buf.at[i], v_out_hbm.at[0, :, 0, pl.ds(0, wb_store)],
            w_sems.at[1, i],
        ).wait()
        if quantized:
            pltpu.make_async_copy(
                wks_buf.at[i], ks_out_hbm.at[0, 0], w_sems.at[2, i]
            ).wait()
            pltpu.make_async_copy(
                wvs_buf.at[i], vs_out_hbm.at[0, 0], w_sems.at[3, i]
            ).wait()

    def read_pair_into(pair, slot):
        read_group_page(
            jnp.minimum(pair_grp_ref[pair], nG - 1), pair_page_ref[pair], slot
        )

    @pl.when(i == 0)
    def _init_first():
        buf_idx_ref[0] = 0
        for lane in range(GRP):
            wb_flags[lane] = 0

        # Triple-buffered: fill two slots up front so every step's wait sees
        # a read issued two steps earlier (a one-deep pipeline left ~1.5 us
        # of un-hidden DMA latency per step — reads aren't hazarded: this
        # step's new rows are patched in registers, and write-backs target
        # pages no pair of this invocation reads again).
        @pl.when(live)
        def _read_first():
            read_pair_into(0, 0)

        @pl.when((1 < np_) & (pair_grp_ref[jnp.minimum(1, np_ - 1)] < nG))
        def _read_second():
            read_pair_into(jnp.minimum(1, np_ - 1), 1)

    @pl.when(live)
    def _work():
        slot = buf_idx_ref[0]

        # Prefetch two pairs ahead (live pairs are contiguous at the front).
        nxt = jnp.minimum(i + 1, np_ - 1)
        pre = jnp.minimum(i + 2, np_ - 1)

        @pl.when((i + 2 < np_) & (pair_grp_ref[pre] < nG))
        def _prefetch():
            read_pair_into(pre, jnp.where(slot == 0, 2, slot - 1))

        wait_group_page(g, j, slot)
        buf_idx_ref[0] = jnp.where(slot == 2, 0, slot + 1)

        hkv, grp, qlg, hd = q_ref.shape   # qlg = q_len * G
        groups = qlg // q_len

        # First pair of this group (== j == 0 unless a sliding window dropped
        # the group's leading pages from the worklist).
        group_start = (i == 0) | (pair_grp_ref[jnp.maximum(i - 1, 0)] != g_raw)

        @pl.when(group_start)
        def _init_group():
            # Fold the new token's self-attention into the accumulator init:
            # each row's running max starts at its own (scaled) self-score,
            # l at exp(0) = 1 and acc at 1 * v_new. This removes the per-pair
            # register patch of the stale kv_len-1 row (two full-page selects
            # per pair); history columns mask at kv_len-1 instead, and all
            # the work here is on tiny [Hkv, GRP, G|hd] tensors once per group.
            qg = q_ref[...].astype(jnp.float32) * sm_scale
            kn = k_new_ref[...].astype(jnp.float32)   # [Hkv, GRP, QL, hd]
            vn = v_new_ref[...].astype(jnp.float32)
            if q_len == 1:
                if groups > 1:
                    # Mosaic cannot broadcast a size-1 *middle* dim; replicate
                    # by concatenation (static, tiny tensors).
                    kn = jnp.concatenate([kn] * groups, axis=2)
                    vn = jnp.concatenate([vn] * groups, axis=2)
                qg2 = qg.reshape(hkv, grp * groups, hd)
                kn2 = kn.reshape(hkv, grp * groups, hd)
                s_new = jnp.sum(qg2 * kn2, axis=-1)       # [Hkv, GRP*G]
                m_scr[...] = jnp.broadcast_to(s_new[:, :, None], m_scr.shape)
                l_scr[...] = jnp.ones_like(l_scr)
                acc_scr[...] = vn.reshape(hkv, grp * groups, hd)
            else:
                # Spec verify: the chunk's q_len x q_len causal self-attention
                # block, batched over the whole group as one small dot with
                # block-diagonal + causal masking (row r of lane wl attends
                # new rows 0..ql(r) of the SAME lane; history pages mask at
                # kv_len - q_len, so new rows live only here).
                m_rows = grp * qlg
                n_cols = grp * q_len
                q2 = qg.reshape(hkv, m_rows, hd)
                kn2 = kn.reshape(hkv, n_cols, hd)
                s_new = jax.lax.dot_general(
                    q2, kn2,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                        # [Hkv, M, N]
                r2 = jax.lax.broadcasted_iota(
                    jnp.int32, (m_rows, n_cols), 0
                )
                c2 = jax.lax.broadcasted_iota(
                    jnp.int32, (m_rows, n_cols), 1
                )
                okm = (r2 // qlg == c2 // q_len) & (
                    c2 % q_len <= (r2 % qlg) // groups
                )
                s_new = jnp.where(okm[None], s_new, MASK_VALUE)
                m0 = jnp.max(s_new, axis=-1)             # [Hkv, M]
                p0 = jnp.exp(s_new - m0[:, :, None])
                l0 = jnp.sum(p0, axis=-1)
                acc0 = jax.lax.dot_general(
                    p0, vn.reshape(hkv, n_cols, hd),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                m_scr[...] = jnp.broadcast_to(m0[:, :, None], m_scr.shape)
                l_scr[...] = jnp.broadcast_to(l0[:, :, None], l_scr.shape)
                acc_scr[...] = acc0

        def per_seq_scalar(shape, dim, div, fn):
            """Materialize fn(seq) across ``dim`` (where index // div is the
            group-local sequence) via scalar-broadcast selects — Mosaic cannot
            relayout a lane vector into a non-minor dim, so build the tensor
            from SMEM scalars directly."""
            idx = jax.lax.broadcasted_iota(jnp.int32, shape, dim) // div
            out = jnp.zeros(shape, jnp.int32)
            for i in range(GRP):
                out = jnp.where(idx == i, fn(g * GRP + i), out)
            return out

        # History-column validity, 2D [Hkv, GRP*block] (token dim on lanes —
        # cheap; anything materialized at the full [.., GRP*G, GRP*block]
        # scores shape costs GRPx the VPU work). Positions kv_len-q_len..
        # kv_len-1 are this step's own rows — stale in the DMA'd page,
        # covered by the self-term in _init_group — so history masks there.
        n_cols = GRP * block_size
        col2 = jax.lax.broadcasted_iota(jnp.int32, (hkv, n_cols), 1)
        kvc2 = per_seq_scalar(
            (hkv, n_cols), 1, block_size, lambda s_: kv_lens_ref[s_]
        )
        pos2 = j * block_size + col2 % block_size
        hist = pos2 < kvc2 - q_len
        if window is not None:
            # Sliding window: the (single) query sits at position kv_len-1;
            # history keys in (kv_len-1 - window, kv_len-1). Static branch —
            # window=None compiles to exactly the unwindowed kernel.
            hist &= pos2 > kvc2 - 1 - window
        col_bias = jnp.where(hist, 0.0, MASK_VALUE)   # [Hkv, n_cols]
        if quantized:
            # Scale vectors zero outside history: those buffer strips may
            # never have been DMA'd (NaN in interpret mode) and 0 * NaN
            # would poison the folds despite the score mask.
            ks_vec = jnp.where(hist, ks_buf[slot], 0.0)
            vs_vec = jnp.where(hist, vs_buf[slot], 0.0)

        # Persist an aligned tile holding the new (cache-dtype) row back to
        # the cache for future steps (a 1-row DMA at an arbitrary sublane
        # offset is not expressible; int8 needs 32-row alignment, bf16 8).
        # The written page is exclusively owned by its sequence, so the DMA
        # is NOT waited here: synchronous waits serialize ~256 write-backs
        # per layer per step on DMA latency. Each lane has its own staging
        # buffers; a lane's previous write is waited only when the lane
        # writes again (>= one full group later) or at the last grid step.
        for wl in range(GRP):
            # Row-0 in-page offset of this lane's appends (QL=1: the single
            # new row at kv_len-1). Spec verify (q_len>1) appends
            # append_lens[seq] rows starting there — possibly spilling into
            # the next page, whose own pair visit writes the spilled part.
            off = kv_lens_ref[g * GRP + wl] - q_len - j * block_size
            if q_len == 1:
                wb_cond = (off >= 0) & (off < block_size)
                n_wr = jnp.int32(1)
            else:
                n_wr = append_lens_ref[g * GRP + wl]
                wb_cond = (off + n_wr > 0) & (off < block_size) & (n_wr > 0)

            @pl.when(wb_cond)
            def _write_back(wl=wl, off=off, n_wr=n_wr):
                @pl.when(wb_flags[wl] == 1)
                def _drain_prev(wl=wl):
                    _wait_lane_writes(wl)

                wb_flags[wl] = 1
                if q_len == 1:
                    offt = pl.multiple_of((off // wb_tile) * wb_tile, wb_tile)
                else:
                    # Double-width window: any in-page run of <= q_len (<=
                    # wb_tile) rows fits a 2*wb_tile aligned window clamped
                    # to the page end.
                    lo = jnp.maximum(off, 0)
                    offt = pl.multiple_of(
                        jnp.minimum(
                            (lo // wb_tile) * wb_tile, block_size - wb_store
                        ),
                        wb_tile,
                    )
                base = wl * block_size
                rows_k = k_buf[slot, :, pl.ds(base + offt, wb_store), :]
                rows_v = v_buf[slot, :, pl.ds(base + offt, wb_store), :]
                ri = jax.lax.broadcasted_iota(jnp.int32, rows_k.shape, 1)
                if q_len == 1:
                    sel = ri == off - offt
                    pk = jnp.where(
                        sel, k_store_ref[:, wl].astype(rows_k.dtype), rows_k
                    )
                    pv = jnp.where(
                        sel, v_store_ref[:, wl].astype(rows_v.dtype), rows_v
                    )
                else:
                    pk, pv = rows_k, rows_v
                    for ql in range(q_len):
                        sel = (ri == off + ql - offt) & (n_wr > ql)
                        pk = jnp.where(
                            sel,
                            k_store_ref[:, wl, ql: ql + 1].astype(pk.dtype),
                            pk,
                        )
                        pv = jnp.where(
                            sel,
                            v_store_ref[:, wl, ql: ql + 1].astype(pv.dtype),
                            pv,
                        )
                wk_buf[wl] = pk
                wv_buf[wl] = pv
                page_id = tables_ref[g * GRP + wl, j]
                pltpu.make_async_copy(
                    wk_buf.at[wl],
                    k_out_hbm.at[layer, :, page_id, pl.ds(offt, wb_store)],
                    w_sems.at[0, wl],
                ).start()
                pltpu.make_async_copy(
                    wv_buf.at[wl],
                    v_out_hbm.at[layer, :, page_id, pl.ds(offt, wb_store)],
                    w_sems.at[1, wl],
                ).start()
                if quantized:
                    # Scale slabs are [Hkv, block] with block on the lane dim:
                    # patch the appended lanes in registers and rewrite the
                    # whole slab.
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (hkv, block_size), 1
                    )
                    strip = pl.ds(base, block_size)
                    if q_len == 1:
                        pks = jnp.where(
                            lane == off, ks_new_ref[:, wl],
                            ks_buf[slot, :, strip],
                        )
                        pvs = jnp.where(
                            lane == off, vs_new_ref[:, wl],
                            vs_buf[slot, :, strip],
                        )
                    else:
                        pks = ks_buf[slot, :, strip]
                        pvs = vs_buf[slot, :, strip]
                        for ql in range(q_len):
                            cnd = (lane == off + ql) & (n_wr > ql)
                            pks = jnp.where(cnd, ks_new_ref[:, wl, ql], pks)
                            pvs = jnp.where(cnd, vs_new_ref[:, wl, ql], pvs)
                    wks_buf[wl] = pks
                    wvs_buf[wl] = pvs
                    pltpu.make_async_copy(
                        wks_buf.at[wl], ks_out_hbm.at[layer, page_id],
                        w_sems.at[2, wl],
                    ).start()
                    pltpu.make_async_copy(
                        wvs_buf.at[wl], vs_out_hbm.at[layer, page_id],
                        w_sems.at[3, wl],
                    ).start()

        # sm_scale folds into q (tiny tensor) instead of a pass over scores.
        q = (
            q_ref[...].astype(jnp.float32).reshape(hkv, GRP * qlg, hd)
            * sm_scale
        ).astype(DOT_DTYPE)
        # Convert pages to a wide dtype BEFORE any select (narrow-dtype
        # selects force relayouts; all masking here is on the f32 scores).
        # In int8 and int4 modes the per-token scales are NOT applied here:
        # a [H, N] lane vector cannot relayout onto k's sublane dim, so the
        # scales fold into the scores (k) and probabilities (v) instead,
        # where the token dim is already on lanes. int4 pages additionally
        # unpack their head-paired nibbles ([Hkv/2] bytes -> [Hkv] values).
        if kv_bits == 4:
            kf = unpack_int4_heads(k_buf[slot]).astype(DOT_DTYPE)
            vf = unpack_int4_heads(v_buf[slot]).astype(DOT_DTYPE)
        else:
            kf = k_buf[slot].astype(DOT_DTYPE)    # [Hkv, GRP*block, hd]
            vf = v_buf[slot].astype(DOT_DTYPE)

        # NaN hygiene (hardware AND interpret): K garbage in never-DMA'd
        # strips dies in the mask *selects* below (their columns are always
        # masked); V garbage strips are zeroed at DMA-issue time in
        # read_group_page, so the p @ V dot never sees 0 * NaN.

        # scores[h, r, c]: one batched dot per head over the whole group.
        scores = jax.lax.dot_general(
            q, kf,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                   # [Hkv, GRP*G, GRP*block]
        if quantized:
            scores = scores * ks_vec[:, None, :]  # fold K dequant scales

        # Masking by two broadcast SELECTS over the big scores shape
        # instead of materializing row/col/len index tensors there (~10
        # passes): history validity comes from the 2D [Hkv, GRP*block]
        # ``hist``, the block-diagonal from a 2D [GRP*G, GRP*block] pattern.
        # (Broadcast ADDS of a size-1 middle dim crash Mosaic — selects with
        # the same broadcast lower fine, like the quantized scale folds.)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (GRP * qlg, n_cols), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (GRP * qlg, n_cols), 1)
        diag2 = r2 // qlg == c2 // block_size
        scores = jnp.where(hist[:, None, :], scores, MASK_VALUE)
        scores = jnp.where(diag2[None, :, :], scores, MASK_VALUE)

        m_prev = m_scr[:, :, 0]                       # [Hkv, GRP*G]
        l_prev = l_scr[:, :, 0]
        m_curr = jnp.max(scores, axis=-1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(scores - m_next[:, :, None])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)
        m_scr[...] = jnp.broadcast_to(m_next[:, :, None], m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next[:, :, None], l_scr.shape)

        if quantized:
            p = p * vs_vec[:, None, :]      # fold V dequant scales
        o_curr = jax.lax.dot_general(
            p.astype(DOT_DTYPE), vf,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :, None] + o_curr

        # Group end: the next pair belongs to a different group (or this is
        # the last pair).
        @pl.when((i == np_ - 1) | (pair_grp_ref[nxt] != g_raw))
        def _store():
            l = l_scr[:, :, 0]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out = acc_scr[...] * l_inv[:, :, None]    # [Hkv, GRP*QL*G, hd]
            o_ref[...] = out.reshape(hkv, GRP, qlg, hd).astype(o_ref.dtype)

    @pl.when(i == np_ - 1)
    def _drain_all_writes():
        for lane in range(GRP):
            @pl.when(wb_flags[lane] == 1)
            def _drain(lane=lane):
                _wait_lane_writes(lane)
                wb_flags[lane] = 0


def paged_decode_attention(
    q: jax.Array,        # [S*q_len, Hq, hd] (q_len query tokens per sequence)
    k_new: jax.Array,    # [S*q_len, Hkv, hd] new K rows (appended starting at
    v_new: jax.Array,    #                    kv_len - q_len per sequence)
    k_cache,             # [L, Hkv, blocks, block, hd], or (values, scales)
    v_cache,
    layer,
    meta,
    *,
    sm_scale: float,
    window: int | None = None,
    q_len: int = 1,
    interpret: bool = False,
):
    """Returns (out [S*q_len, Hq, hd], k_cache, v_cache) — caches updated in
    place. Quantized caches are (values, f32 per-token scales) pairs: int8
    values full-head, or uint8 nibble-packed int4 ([Hkv/2] bytes per head
    pair, see quantize_kv_rows_int4). ``window``: sliding-window attention
    (keys in (q_pos - window, q_pos]); pages the window has wholly rolled
    past are skipped — dropped from the worklist when every lane of a group
    is past them (build_step_inputs) and per-lane DMA-skipped inside visited
    pairs (lane_rows).

    ``q_len > 1`` is the speculative-decoding verify mode: each sequence
    contributes q_len consecutive query rows (its last token + drafts) at
    positions [kv_len - q_len, kv_len - 1]; meta.kv_lens is the total INCLUDING
    the chunk, history pages mask at kv_len - q_len, and the chunk's causal
    self-attention folds into the accumulator init (the q_len x q_len new-row
    block never touches HBM). meta.append_lens bounds the per-sequence fused
    appends (rejected-draft rows past a sequence's length cap are skipped).
    q_len == 1 compiles to exactly the r3 decode program."""
    quantized = _is_quantized(k_cache)
    if quantized:
        kc, ks = k_cache
        vc, vs = v_cache
        kv_bits = 4 if kc.dtype == jnp.uint8 else 8
    else:
        kc, vc = k_cache, v_cache
        ks = vs = jnp.zeros((1, 1, 1, 1), jnp.float32)
        kv_bits = 0
    T, Hq, hd = q.shape
    S = T // q_len
    assert S * q_len == T
    _, Hs, _, block_size, _ = kc.shape      # storage head count
    Hkv = 2 * Hs if kv_bits == 4 else Hs    # logical kv heads
    groups = Hq // Hkv
    assert S % GRP == 0, f"decode bucket {S} not a multiple of group {GRP}"
    wb_tile = 32 if quantized else 8
    # Multi-row appends stage a double-width aligned window (a run of up to
    # q_len rows can straddle one wb_tile boundary); a whole page suffices
    # when pages are that small.
    wb_store = wb_tile if q_len == 1 else min(2 * wb_tile, block_size)
    assert block_size % wb_tile == 0 and block_size >= wb_store
    assert q_len <= wb_tile, f"q_len {q_len} exceeds staging tile {wb_tile}"
    assert window is None or q_len == 1, "spec verify assumes full attention"
    if q_len == 1:
        q_hm = q.reshape(S, Hkv, groups, hd).transpose(1, 0, 2, 3)
        k_new_hm = k_new.transpose(1, 0, 2)[:, :, None]
        v_new_hm = v_new.transpose(1, 0, 2)[:, :, None]
    else:
        q_hm = (
            q.reshape(S, q_len, Hkv, groups, hd)
            .transpose(2, 0, 1, 3, 4)
            .reshape(Hkv, S, q_len * groups, hd)
        )
        k_new_hm = k_new.reshape(S, q_len, Hkv, hd).transpose(2, 0, 1, 3)
        v_new_hm = v_new.reshape(S, q_len, Hkv, hd).transpose(2, 0, 1, 3)
    if quantized:
        rowq = quantize_kv_rows_int4 if kv_bits == 4 else quantize_kv_rows
        kq, ksc = rowq(k_new)   # [T, Hs, hd], [T, Hkv]
        vq, vsc = rowq(v_new)
        if q_len == 1:
            k_store = kq.transpose(1, 0, 2)[:, :, None]
            v_store = vq.transpose(1, 0, 2)[:, :, None]
            ks_new = jnp.broadcast_to(
                ksc.T[:, :, None], (Hkv, S, block_size)
            )
            vs_new = jnp.broadcast_to(
                vsc.T[:, :, None], (Hkv, S, block_size)
            )
        else:
            k_store = kq.reshape(S, q_len, Hs, hd).transpose(2, 0, 1, 3)
            v_store = vq.reshape(S, q_len, Hs, hd).transpose(2, 0, 1, 3)
            ks_new = jnp.broadcast_to(
                ksc.reshape(S, q_len, Hkv).transpose(2, 0, 1)[..., None],
                (Hkv, S, q_len, block_size),
            )
            vs_new = jnp.broadcast_to(
                vsc.reshape(S, q_len, Hkv).transpose(2, 0, 1)[..., None],
                (Hkv, S, q_len, block_size),
            )
    else:
        k_store = k_new_hm.astype(kc.dtype)
        v_store = v_new_hm.astype(vc.dtype)
        ks_shape = (
            (Hkv, S, block_size) if q_len == 1
            else (Hkv, S, q_len, block_size)
        )
        ks_new = vs_new = jnp.zeros(ks_shape, jnp.float32)
        k_new_hm = k_store
        v_new_hm = v_store

    NP = meta.pair_tile.shape[0]
    nG = S // GRP
    windowed = window is not None
    # Runtime window scalar (per-layer local/global mixes reuse one program;
    # a huge value disables masking for global layers).
    win_ops = (
        (jnp.reshape(jnp.asarray(window, jnp.int32), (1,)),) if windowed else ()
    )
    # Per-sequence fused-append row counts (spec verify mode only).
    al_ops = (
        (meta.append_lens.astype(jnp.int32),) if q_len > 1 else ()
    )

    def grp_index(i, layer_r, kv_lens_r, tables_r, num_seqs_r, pair_grp_r,
                  pair_page_r, *rest):
        return jnp.minimum(pair_grp_r[i], nG - 1)

    grp_block = lambda shape: pl.BlockSpec(
        shape,
        lambda i, *refs: (0, grp_index(i, *refs)) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM,
    )
    new_block = (
        (Hkv, GRP, 1, hd) if q_len == 1 else (Hkv, GRP, q_len, hd)
    )
    store_block = (
        (Hs, GRP, 1, hd) if q_len == 1 else (Hs, GRP, q_len, hd)
    )
    scale_block = (
        (Hkv, GRP, block_size) if q_len == 1
        else (Hkv, GRP, q_len, block_size)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 + len(al_ops) + len(win_ops),
        grid=(NP,),
        in_specs=[
            grp_block((Hkv, GRP, q_len * groups, hd)),   # q
            grp_block(new_block),                # k_new (compute dtype)
            grp_block(new_block),                # v_new
            grp_block(store_block),              # k_store (cache dtype)
            grp_block(store_block),              # v_store
            grp_block(scale_block),              # ks_new (lane-broadcast)
            grp_block(scale_block),              # vs_new
            pl.BlockSpec(memory_space=pl.ANY),   # k pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # v pages
            pl.BlockSpec(memory_space=pl.ANY),   # k scales
            pl.BlockSpec(memory_space=pl.ANY),   # v scales
        ],
        out_specs=[
            grp_block((Hkv, GRP, q_len * groups, hd)),   # o
            pl.BlockSpec(memory_space=pl.ANY),   # aliased caches
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, Hs, GRP * block_size, hd), kc.dtype),
            pltpu.VMEM((3, Hs, GRP * block_size, hd), vc.dtype),
            pltpu.VMEM(
                (3, Hkv, GRP * block_size) if quantized else (1, 1, 1),
                jnp.float32,
            ),
            pltpu.VMEM(
                (3, Hkv, GRP * block_size) if quantized else (1, 1, 1),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((4, 3, GRP)),
            pltpu.SemaphoreType.DMA((4, GRP)),
            pltpu.VMEM((GRP, Hs, wb_store, hd), kc.dtype),
            pltpu.VMEM((GRP, Hs, wb_store, hd), vc.dtype),
            pltpu.VMEM(
                (GRP, Hkv, block_size) if quantized else (1, 1, 1), jnp.float32
            ),
            pltpu.VMEM(
                (GRP, Hkv, block_size) if quantized else (1, 1, 1), jnp.float32
            ),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((GRP,), jnp.int32),
            pltpu.VMEM((Hkv, GRP * q_len * groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, GRP * q_len * groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, GRP * q_len * groups, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, block_size=block_size, sm_scale=sm_scale,
        quantized=quantized, kv_bits=kv_bits, wb_tile=wb_tile,
        wb_store=wb_store, q_len=q_len, windowed=windowed,
        interpret=interpret,
    )
    # Inputs count from the start of the scalar-prefetch operands: 6 scalars
    # (+1 append_lens in spec mode, +1 window), then q k_new v_new k_store
    # v_store ks_new vs_new, then the aliased HBM caches k/v/ks/vs.
    base = 13 + len(al_ops) + len(win_ops)
    aliases = {base: 1, base + 1: 2}
    if quantized:
        aliases.update({base + 2: 3, base + 3: 4})
    out, kc, vc, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hkv, S, q_len * groups, hd), q.dtype),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
        meta.kv_lens, meta.block_tables, meta.num_seqs,
        meta.pair_tile, meta.pair_page, *al_ops, *win_ops,
        q_hm, k_new_hm, v_new_hm, k_store, v_store, ks_new, vs_new,
        kc, vc, ks, vs,
    )
    if q_len == 1:
        out = out.transpose(1, 0, 2, 3).reshape(S, Hq, hd)
    else:
        out = (
            out.reshape(Hkv, S, q_len, groups, hd)
            .transpose(1, 2, 0, 3, 4)
            .reshape(T, Hq, hd)
        )
    if quantized:
        return out, (kc, ks), (vc, vs)
    return out, kc, vc


# ========================================================== prefill kernel


def _prefill_kernel(
    # scalar prefetch
    layer_ref,         # i32[1] layer index into the stacked cache
    tile_seq_ref,      # i32[NT]
    tile_pos0_ref,     # i32[NT]
    kv_lens_ref,       # i32[S]
    tables_ref,        # i32[S, W]
    num_seqs_ref,      # i32[1]
    pair_tile_ref,     # i32[NP] active (tile, page) worklist, tile-major
    pair_page_ref,     # i32[NP]
    *rest,             # [window_ref i32[1] when windowed], then the operands
                       # below (see _decode_kernel: the window VALUE is a
                       # runtime scalar, `windowed` is static)
    block_size: int,
    q_tile: int,
    sm_scale: float,
    quantized: bool,
    kv_bits: int,
    windowed: bool,
):
    if windowed:
        window_ref, rest = rest[0], rest[1:]
        window = window_ref[0]
    else:
        window = None
    (
    # inputs
    q_ref,             # [Hkv, BQ, G, hd] VMEM (tile t)
    k_store_hbm,       # [Hkv, T, hd] ANY cache-dtype new rows, tile-aligned
    v_store_hbm,
    ks_new_hbm,        # [Hkv, T] ANY f32 new-row scales (q8)
    vs_new_hbm,
    k_hbm,             # [L, Hkv, blocks, block, hd] ANY (aliased in/out)
    v_hbm,
    ks_hbm,            # [L, blocks, Hkv, block] ANY f32 (q8; aliased)
    vs_hbm,
    # outputs
    o_ref,             # [Hkv, BQ, G, hd] VMEM (tile t)
    k_out_hbm,         # aliased views of the cache arrays
    v_out_hbm,
    ks_out_hbm,
    vs_out_hbm,
    # scratch
    k_buf, v_buf,      # [2, Hkv, block, hd] cache dtype
    ks_buf, vs_buf,    # [2, Hkv, block] f32 (q8)
    sems,              # [4, 2]
    w_sems,            # [4]
    buf_idx_ref,       # SMEM i32[1]
    m_scr,             # f32[Hkv, BQ, G]
    l_scr,             # f32[Hkv, BQ, G]
    acc_scr,           # f32[Hkv, BQ, G, hd]
    ) = rest
    # The grid is a flat worklist of active (tile, page) pairs: a dense
    # (tiles x pages) grid is ~75% skipped steps whose per-step scalar work
    # still costs real time. Pairs are tile-major; padding pairs carry the
    # NT sentinel tile.
    i = pl.program_id(0)
    nt = tile_seq_ref.shape[0]
    t = jnp.minimum(pair_tile_ref[i], nt - 1)
    j = pair_page_ref[i]
    pair_live = pair_tile_ref[i] < nt

    num_seqs = num_seqs_ref[0]
    seq = tile_seq_ref[t]
    live = pair_live & (seq < num_seqs)
    safe_seq = jnp.where(live, seq, 0)
    pos0 = tile_pos0_ref[t]
    kv_len = jnp.where(live, kv_lens_ref[safe_seq], 0)
    # Causal frontier: kv needed is min(kv_len, last q position + 1).
    kv_limit = jnp.where(live, jnp.minimum(kv_len, pos0 + q_tile), 0)
    num_blocks = _cdiv(kv_limit, block_size)

    layer = layer_ref[0]

    n_rungs = max(1, block_size // PAGE_RUNG)
    rung = block_size // n_rungs
    assert rung * n_rungs == block_size and (n_rungs == 1 or rung % 32 == 0), (
        f"PAGE_RUNG={PAGE_RUNG} must divide block_size={block_size} in "
        f"32-row steps (or exceed it for whole-page fetches)"
    )

    def pair_rows(pair):
        """Valid rows of this pair's page under the causal frontier: the page
        is fetched only up to the rung covering them (see PAGE_RUNG), and not
        at all when a sliding window has rolled past the whole page for every
        row of the tile (lowest key any row can attend to is pos0-window+1 —
        on per-layer-window models the worklist can't pre-skip these pages
        because global layers share it, so local layers gate here). Start,
        wait, and refetch recompute identical predicates from the same
        prefetched scalars, so every start has exactly one matching wait."""
        tile = jnp.minimum(pair_tile_ref[pair], nt - 1)
        s = tile_seq_ref[tile]
        p0 = tile_pos0_ref[tile]
        limit = jnp.minimum(kv_lens_ref[s], p0 + q_tile)
        rows = limit - pair_page_ref[pair] * block_size
        if window is not None:
            need = (pair_page_ref[pair] + 1) * block_size > p0 - window + 1
            rows = jnp.where(need, rows, 0)
        return rows

    def rung_conds(rows):
        conds = []
        for r in range(1, n_rungs + 1):
            c = rows > (r - 1) * rung
            if r < n_rungs:
                c &= rows <= r * rung
            conds.append((c, r * rung))
        return conds

    def read_pair(pair, slot):
        # Reads through the aliased *output* refs (see decode kernel note).
        tile = jnp.minimum(pair_tile_ref[pair], nt - 1)
        page = pair_page_ref[pair]
        page_id = tables_ref[tile_seq_ref[tile], page]
        rows = pair_rows(pair)
        for cond, hi in rung_conds(rows):

            @pl.when(cond)
            def _start(hi=hi):
                pltpu.make_async_copy(
                    k_out_hbm.at[layer, :, page_id, pl.ds(0, hi)],
                    k_buf.at[slot, :, pl.ds(0, hi)], sems.at[0, slot]
                ).start()
                pltpu.make_async_copy(
                    v_out_hbm.at[layer, :, page_id, pl.ds(0, hi)],
                    v_buf.at[slot, :, pl.ds(0, hi)], sems.at[1, slot]
                ).start()

        if quantized:
            # Scale tiles are fetched whole: their lane-dim (block) slicing
            # wants 128-alignment and the tile is ~3% of the page bytes.
            @pl.when(rows > 0)
            def _scales():
                pltpu.make_async_copy(
                    ks_out_hbm.at[layer, page_id], ks_buf.at[slot],
                    sems.at[2, slot],
                ).start()
                pltpu.make_async_copy(
                    vs_out_hbm.at[layer, page_id], vs_buf.at[slot],
                    sems.at[3, slot],
                ).start()

            # A window-gated pair fetches nothing: its V scales must still
            # be finite (p multiplies vs_buf AFTER the mask select; NaN
            # scratch would poison exp(masked)=0 rows via 0 * NaN).
            @pl.when(rows <= 0)
            def _zero_scales():
                vs_buf[slot] = jnp.zeros_like(vs_buf[slot])
        else:
            # Un-DMA'd V rows past the fetched rung — or the whole strip of a
            # window-gated pair (rows == 0): bf16 scratch garbage can be NaN
            # and the p @ V dot then sums 0 * NaN — zero them. (K needs
            # nothing: NaN scores die in the mask *select*.)
            for r in range(n_rungs):
                if r == 0:
                    cond = rows <= 0
                else:
                    cond = (rows > (r - 1) * rung) & (rows <= r * rung)

                @pl.when(cond)
                def _zero(r=r):
                    n = block_size - r * rung
                    v_buf[slot, :, pl.ds(r * rung, n), :] = jnp.zeros(
                        (v_buf.shape[1], n, v_buf.shape[3]), v_buf.dtype
                    )

    def wait_page(rows, slot):
        for cond, hi in rung_conds(rows):

            @pl.when(cond)
            def _wait(hi=hi):
                pltpu.make_async_copy(
                    k_out_hbm.at[0, :, 0, pl.ds(0, hi)],
                    k_buf.at[slot, :, pl.ds(0, hi)], sems.at[0, slot]
                ).wait()
                pltpu.make_async_copy(
                    v_out_hbm.at[0, :, 0, pl.ds(0, hi)],
                    v_buf.at[slot, :, pl.ds(0, hi)], sems.at[1, slot]
                ).wait()

        if quantized:

            @pl.when(rows > 0)
            def _wait_scales():
                pltpu.make_async_copy(
                    ks_out_hbm.at[0, 0], ks_buf.at[slot], sems.at[2, slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_out_hbm.at[0, 0], vs_buf.at[slot], sems.at[3, slot]
                ).wait()

    @pl.when(i == 0)
    def _init_first():
        buf_idx_ref[0] = 0
        # Triple-buffered: fill two slots so each step's wait sees a read
        # issued two steps earlier. Pairs j < 2 of a tile may be prefetched
        # before the tile's own KV appends — the generalized refetch below
        # re-reads exactly those pages.
        read_pair(0, 0)

        @pl.when((1 < pl.num_programs(0)) & (
            pair_tile_ref[jnp.minimum(1, pl.num_programs(0) - 1)] < nt
        ))
        def _read_second():
            read_pair(jnp.minimum(1, pl.num_programs(0) - 1), 1)

    @pl.when(live & (j < num_blocks))
    def _work():
        slot = buf_idx_ref[0]

        # First pair of this tile (== j == 0 unless a sliding window dropped
        # the tile's leading pages from the worklist); ordinal_lt2 marks the
        # tile's first TWO pairs — the ones whose reads were prefetched
        # before this tile's own j-start appends (pairs of a tile are
        # contiguous in the worklist, so neighbor comparisons recover the
        # tile-relative ordinal).
        prev1 = jnp.maximum(i - 1, 0)
        prev2 = jnp.maximum(i - 2, 0)
        tile_start = (i == 0) | (pair_tile_ref[prev1] != pair_tile_ref[i])
        ordinal_lt2 = (i < 2) | (pair_tile_ref[prev2] != pair_tile_ref[i])

        @pl.when(tile_start)
        def _append_kv():
            # Store this tile's new K/V rows (and scales) into the aliased
            # cache. Chunk starts are page-aligned, so the tile's rows are one
            # run inside a single page (q_tile <= block) or span whole pages
            # (q_tile a multiple of block). Rows past kv_len are garbage but
            # land in pages owned by this sequence and beyond its valid
            # length; pages wholly past kv_len are skipped (their table
            # entries may belong to other sequences).
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
                        k_store_hbm.at[:, src],
                        k_out_hbm.at[layer, :, page_id, pl.ds(off, size)],
                        w_sems.at[0],
                    )
                    wv = pltpu.make_async_copy(
                        v_store_hbm.at[:, src],
                        v_out_hbm.at[layer, :, page_id, pl.ds(off, size)],
                        w_sems.at[1],
                    )
                    wk.start()
                    wv.start()
                    if quantized:
                        wks = pltpu.make_async_copy(
                            ks_new_hbm.at[:, src],
                            ks_out_hbm.at[layer, page_id, :, pl.ds(off, size)],
                            w_sems.at[2],
                        )
                        wvs = pltpu.make_async_copy(
                            vs_new_hbm.at[:, src],
                            vs_out_hbm.at[layer, page_id, :, pl.ds(off, size)],
                            w_sems.at[3],
                        )
                        wks.start()
                        wvs.start()
                        wks.wait()
                        wvs.wait()
                    wk.wait()
                    wv.wait()

        # Prefetch two pairs ahead (live pairs are contiguous at the front of
        # the worklist). Issued after the j==0 writes above, so same-tile
        # pages at j >= 2 observe the appends.
        pre = jnp.minimum(i + 2, pl.num_programs(0) - 1)

        @pl.when((i + 2 < pl.num_programs(0)) & (pair_tile_ref[pre] < nt))
        def _prefetch():
            read_pair(pre, jnp.where(slot == 0, 2, slot - 1))

        rows_here = kv_limit - j * block_size
        if window is not None:
            # Mirror pair_rows' window gate (the waits must match the starts).
            need_here = (j + 1) * block_size > pos0 - window + 1
            rows_here = jnp.where(need_here, rows_here, 0)
        wait_page(rows_here, slot)
        buf_idx_ref[0] = jnp.where(slot == 2, 0, slot + 1)

        @pl.when(tile_start)
        def _init_tile():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # Refetch pages whose prefetch (issued two pairs earlier) predates
        # appends that land in them. Two hazards:
        # (a) same tile: the tile's first two pairs were prefetched before
        #     its own start-of-tile appends — stale if the page is one this
        #     tile writes (pages [pos0/block, pos0/block + n_writes));
        # (b) previous tile: a read issued at pair i-2 misses appends from a
        #     single-pair tile whose only pair is i-1 — stale if that tile is
        #     a different tile of the SAME sequence writing the page we read.
        #     (A tile starting at i-2 or earlier appends before our read is
        #     issued — _append_kv runs before _prefetch in its _work.)
        w0 = pos0 // block_size
        n_wr = max(1, q_tile // block_size)
        same_tile = ordinal_lt2 & (j >= w0) & (j < w0 + n_wr)
        pt_raw = pair_tile_ref[prev1]
        pt = jnp.minimum(pt_raw, nt - 1)
        prev_w0 = tile_pos0_ref[pt] // block_size
        prev_first = (i <= 1) | (pair_tile_ref[prev2] != pt_raw)
        prev_tile = (
            (i > 0)
            & (pt_raw != pair_tile_ref[i])
            & prev_first
            & (tile_seq_ref[pt] == seq)
            & (j >= prev_w0)
            & (j < prev_w0 + n_wr)
        )

        @pl.when(same_tile | prev_tile)
        def _refetch():
            read_pair(i, slot)
            wait_page(rows_here, slot)

        hkv, bq, groups, hd = q_ref.shape
        m = bq * groups
        # Flatten [BQ, G] into one M dim for the dots (like the decode
        # kernel): a 4D dot with lhs non-contracting (BQ, G) lowers with
        # M = G rows per MXU pass looping over BQ — measured 20 us/pair vs
        # ~2 us with M = BQ*G (G is 2-4 on these models).
        # sm_scale folds into q (one [Hkv, M, hd] pass fused into the dot-
        # dtype convert) instead of a post-dot pass over the 2x-larger score
        # tensor — the kernel is VPU-pass-bound over scores (r4 profile:
        # ~8.8 us/pair vs ~1.4 us of MXU time).
        q = (q_ref[...] * sm_scale).astype(
            PREFILL_DOT_DTYPE
        ).reshape(hkv, m, hd)
        if kv_bits == 4:
            # Nibble-packed pages: [Hkv/2] bytes unpack to [Hkv] values.
            k = unpack_int4_heads(k_buf[slot]).astype(PREFILL_DOT_DTYPE)
            v = unpack_int4_heads(v_buf[slot]).astype(PREFILL_DOT_DTYPE)
        else:
            k = k_buf[slot].astype(PREFILL_DOT_DTYPE)          # [Hkv, block, hd]
            v = v_buf[slot].astype(PREFILL_DOT_DTYPE)
        # scores[h, r, tok] (row r = query bq r//G) — batched over kv heads.
        # In int8 mode the per-token scales fold into the scores /
        # probabilities (token dim on lanes there; it cannot relayout onto
        # k/v's sublane dim).
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, BQ*G, block]
        if quantized:
            scores = scores * ks_buf[slot][:, None, :]

        # 2D mask, broadcast across the (identical) kv heads: the 3D i32
        # iota/compare tensors were full score-sized VPU passes x Hkv.
        kv_pos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (m, block_size), 1
        )
        q_pos = pos0 + jax.lax.broadcasted_iota(
            jnp.int32, (m, block_size), 0
        ) // groups
        mask = (kv_pos <= q_pos) & (kv_pos < kv_len)
        if window is not None:
            mask &= kv_pos > q_pos - window
        scores = jnp.where(mask[None], scores, MASK_VALUE)

        m_prev = m_scr[:, :, 0]                          # [Hkv, BQ*G]
        l_prev = l_scr[:, :, 0]
        m_curr = jnp.max(scores, axis=-1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(scores - m_next[:, :, None])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)
        m_scr[...] = jnp.broadcast_to(m_next[:, :, None], m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next[:, :, None], l_scr.shape)

        # o[h, r, d] = sum_tok p[h,r,tok] * v[h,tok,d]
        if quantized:
            p = p * vs_buf[slot][:, None, :]
        o_curr = jax.lax.dot_general(
            p.astype(PREFILL_DOT_DTYPE), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :, None] + o_curr

        @pl.when(j == num_blocks - 1)
        def _store():
            l = l_scr[:, :, 0]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out = acc_scr[...] * l_inv[:, :, None]       # [Hkv, BQ*G, hd]
            o_ref[...] = out.reshape(hkv, bq, groups, hd).astype(o_ref.dtype)


def ragged_prefill_attention(
    q: jax.Array,        # [T, Hq, hd] packed ragged, q_tile-aligned per seq
    k_new: jax.Array,    # [T, Hkv, hd] packed new K rows (same alignment)
    v_new: jax.Array,
    k_cache,             # [L, Hkv, blocks, block, hd], or (values, scales)
    v_cache,
    layer,
    meta,
    *,
    sm_scale: float,
    q_tile: int = 128,
    window: int | None = None,
    interpret: bool = False,
):
    """Returns (out [T, Hq, hd], k_cache, v_cache) — caches updated in place.
    Quantized caches are (values, f32 per-token scales) pairs: int8 values
    full-head, or uint8 nibble-packed int4 (see quantize_kv_rows_int4).
    ``window``: sliding-window attention mask (see paged_decode_attention)."""
    quantized = _is_quantized(k_cache)
    if quantized:
        kc, ks = k_cache
        vc, vs = v_cache
        kv_bits = 4 if kc.dtype == jnp.uint8 else 8
    else:
        kc, vc = k_cache, v_cache
        ks = vs = jnp.zeros((1, 1, 1, 1), jnp.float32)
        kv_bits = 0
    T, Hq, hd = q.shape
    _, Hs, _, block_size, _ = kc.shape      # storage head count
    Hkv = 2 * Hs if kv_bits == 4 else Hs    # logical kv heads
    groups = Hq // Hkv
    NT = meta.tile_seq.shape[0]
    assert NT * q_tile == T, f"q of {T} rows vs {NT} tiles of {q_tile}"
    assert block_size % q_tile == 0 or q_tile % block_size == 0
    assert q_tile % 8 == 0 and block_size % 8 == 0, "sublane (8) alignment"
    W = meta.block_tables.shape[1]
    q_hm = q.reshape(T, Hkv, groups, hd).transpose(1, 0, 2, 3)
    if quantized:
        rowq = quantize_kv_rows_int4 if kv_bits == 4 else quantize_kv_rows
        kq, ksc = rowq(k_new)
        vq, vsc = rowq(v_new)
        k_store = kq.transpose(1, 0, 2)
        v_store = vq.transpose(1, 0, 2)
        ks_new = ksc.T       # [Hkv, T] f32
        vs_new = vsc.T
    else:
        k_store = k_new.transpose(1, 0, 2).astype(kc.dtype)
        v_store = v_new.transpose(1, 0, 2).astype(vc.dtype)
        ks_new = vs_new = jnp.zeros((1, 1), jnp.float32)

    NP = meta.pair_tile.shape[0]
    windowed = window is not None
    win_ops = (
        (jnp.reshape(jnp.asarray(window, jnp.int32), (1,)),) if windowed else ()
    )

    def q_index(i, layer_r, tile_seq_r, tile_pos0_r, kv_lens_r, tables_r,
                num_seqs_r, pair_tile_r, pair_page_r, *rest):
        return (0, jnp.minimum(pair_tile_r[i], NT - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8 + len(win_ops),
        grid=(NP,),
        in_specs=[
            pl.BlockSpec(
                (Hkv, q_tile, groups, hd), q_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # k_store (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # v_store
            pl.BlockSpec(memory_space=pl.ANY),       # ks_new
            pl.BlockSpec(memory_space=pl.ANY),       # vs_new
            pl.BlockSpec(memory_space=pl.ANY),       # k pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # v pages
            pl.BlockSpec(memory_space=pl.ANY),       # k scales
            pl.BlockSpec(memory_space=pl.ANY),       # v scales
        ],
        out_specs=[
            pl.BlockSpec(
                (Hkv, q_tile, groups, hd), q_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # aliased caches
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, Hs, block_size, hd), kc.dtype),
            pltpu.VMEM((3, Hs, block_size, hd), vc.dtype),
            pltpu.VMEM(
                (3, Hkv, block_size) if quantized else (1, 1, 1), jnp.float32
            ),
            pltpu.VMEM(
                (3, Hkv, block_size) if quantized else (1, 1, 1), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((4, 3)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SMEM((1,), jnp.int32),
            # m/l ride a 128-lane broadcast: their values have the BQ*G dim
            # on sublanes (born of a lane reduction); a [Hkv, BQ*G] layout
            # would put it on lanes, forcing relayouts.
            pltpu.VMEM((Hkv, q_tile * groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, q_tile * groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, q_tile * groups, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        block_size=block_size,
        q_tile=q_tile,
        sm_scale=sm_scale,
        quantized=quantized,
        kv_bits=kv_bits,
        windowed=windowed,
    )
    # Inputs count from the start of the scalar-prefetch operands: 8 scalars
    # (+1 window), then q k_store v_store ks_new vs_new, then the aliased
    # HBM caches k/v/ks/vs.
    base = 13 + len(win_ops)
    aliases = {base: 1, base + 1: 2}
    if quantized:
        aliases.update({base + 2: 3, base + 3: 4})
    out, kc, vc, ks, vs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hkv, T, groups, hd), q.dtype),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
        meta.tile_seq, meta.tile_pos0, meta.kv_lens, meta.block_tables,
        meta.num_seqs, meta.pair_tile, meta.pair_page, *win_ops,
        q_hm, k_store, v_store, ks_new, vs_new, kc, vc, ks, vs,
    )
    out = out.transpose(1, 0, 2, 3).reshape(T, Hq, hd)
    if quantized:
        return out, (kc, ks), (vc, vs)
    return out, kc, vc
