"""Pallas attention kernels vs the jnp oracle (interpret mode, CPU).

Covers: GQA decode over ragged kv lengths with padding sequences, ragged
prefill with causal masking, chunked-prefill continuation (q positions offset
into a longer cached kv), multi-sequence tiling, partial last pages — plus the
fused KV append: both kernels write this step's K/V rows into the aliased
paged cache, and the tests verify the written slots match the oracle's
scatter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.engine.inputs import build_step_inputs
from nanovllm_tpu.ops.attention import AttentionMeta, ragged_paged_attention_ref
from nanovllm_tpu.ops.pallas.ragged_attention import (
    GRP,
    paged_decode_attention,
    ragged_prefill_attention,
)

BLOCK = 16   # small pages so tests exercise many-page sequences
HD = 32
HKV = 2
HQ = 4
SM = HD ** -0.5


def make_cache(rng, num_blocks, layers=1):
    k = rng.standard_normal((layers, HKV, num_blocks, BLOCK, HD), np.float32)
    v = rng.standard_normal((layers, HKV, num_blocks, BLOCK, HD), np.float32)
    return jnp.asarray(k), jnp.asarray(v)


def meta_from_inputs(inputs):
    return AttentionMeta(
        positions=inputs.positions,
        slot_mapping=inputs.slot_mapping,
        seq_ids=inputs.seq_ids,
        kv_lens=inputs.kv_lens,
        block_tables=inputs.block_tables,
        cu_q_lens=inputs.cu_q_lens,
        num_seqs=inputs.num_seqs,
        tile_seq=inputs.tile_seq,
        tile_pos0=inputs.tile_pos0,
        pair_tile=inputs.pair_tile,
        pair_page=inputs.pair_page,
    )


def build(reqs, t_bucket, s_bucket, w, q_tile=None):
    inputs = build_step_inputs(
        reqs,
        block_size=BLOCK,
        num_tokens_bucket=t_bucket,
        num_seqs_bucket=s_bucket,
        max_blocks_per_seq=w,
        rng=np.zeros(2, np.uint32),
        q_tile=q_tile,
        # In this file batches without a q_tile are decode batches: build the
        # decode kernel's (group, page) worklist.
        group_pairs=None if q_tile else GRP,
    )
    return inputs, meta_from_inputs(inputs)


def new_kv(rng, t):
    k = jnp.asarray(rng.standard_normal((t, HKV, HD), np.float32))
    v = jnp.asarray(rng.standard_normal((t, HKV, HD), np.float32))
    return k, v


def assert_written(k_out, v_out, kn, vn, inputs):
    """Every live slot in the output cache holds its new K/V row."""
    slots = np.asarray(inputs.slot_mapping)
    live = slots >= 0
    k_flat = np.asarray(k_out)[0].reshape(HKV, -1, HD)
    v_flat = np.asarray(v_out)[0].reshape(HKV, -1, HD)
    np.testing.assert_allclose(
        k_flat[:, slots[live]], np.asarray(kn)[live].transpose(1, 0, 2),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        v_flat[:, slots[live]], np.asarray(vn)[live].transpose(1, 0, 2),
        rtol=1e-6, atol=1e-6,
    )


def test_decode_matches_oracle():
    rng = np.random.default_rng(0)
    kc, vc = make_cache(rng, num_blocks=24)
    # 5 live sequences with ragged kv lengths (incl. exact page multiples and
    # partial last pages), padded to an 8-seq bucket.
    kv_lens = [3, 16, 33, 48, 7]
    tables = [[0, 1, 2, 3], [4, 5, 0, 0], [6, 7, 8, 9], [10, 11, 12, 0], [13, 0, 0, 0]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n, block_table=t[: -(-n // BLOCK)],
             temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs, meta = build(reqs, t_bucket=8, s_bucket=8, w=4)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8)

    ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:5], np.asarray(ref)[:5], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)
    # Decode writes exactly the live slots: caches agree with the oracle's.
    np.testing.assert_allclose(np.asarray(ko), np.asarray(kr), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=1e-6, atol=1e-6)


def test_prefill_matches_oracle_multiseq():
    rng = np.random.default_rng(1)
    kc, vc = make_cache(rng, num_blocks=24)
    q_tile = 8  # tiny tile so one seq spans multiple tiles
    # Fresh prefills: kv_len == q_len (the kernel appends kv before attending).
    lens = [5, 19, 8]
    tables = [[0, 1], [2, 3, 4], [5]]
    reqs = [
        dict(token_ids=list(range(n)), start=0, kv_len=n,
             block_table=t, temperature=1.0)
        for n, t in zip(lens, tables)
    ]
    inputs, meta = build(reqs, t_bucket=48, s_bucket=4, w=3, q_tile=q_tile)
    q = jnp.asarray(rng.standard_normal((48, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 48)

    ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, interpret=True
    )
    live = np.asarray(inputs.seq_ids) < 4  # compare live rows only
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)


def test_prefill_chunked_continuation():
    """Chunk 2 of a chunked prefill: q positions 16..30 against kv_len 31
    (prefix already in cache) — exercises prefix reads + causal frontier.
    Chunk starts are page-aligned (scheduler invariant)."""
    rng = np.random.default_rng(2)
    kc, vc = make_cache(rng, num_blocks=8)
    q_tile = 8
    reqs = [
        dict(token_ids=list(range(15)), start=16, kv_len=31,
             block_table=[0, 1, 2], temperature=1.0)
    ]
    inputs, meta = build(reqs, t_bucket=16, s_bucket=2, w=3, q_tile=q_tile)
    q = jnp.asarray(rng.standard_normal((16, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 16)

    ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, interpret=True
    )
    live = np.asarray(inputs.seq_ids) < 2
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)


def test_prefill_tile_wider_than_page():
    """q_tile a multiple of the page size: each tile writes several pages."""
    rng = np.random.default_rng(4)
    kc, vc = make_cache(rng, num_blocks=12)
    q_tile = 32  # 2 pages per tile
    lens = [40, 17]
    tables = [[0, 1, 2], [3, 4]]
    reqs = [
        dict(token_ids=list(range(n)), start=0, kv_len=n,
             block_table=t, temperature=1.0)
        for n, t in zip(lens, tables)
    ]
    inputs, meta = build(reqs, t_bucket=96, s_bucket=4, w=3, q_tile=q_tile)
    q = jnp.asarray(rng.standard_normal((96, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 96)

    ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, interpret=True
    )
    live = np.asarray(inputs.seq_ids) < 4
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)


@pytest.mark.parametrize("n_seqs", [1, 8])
def test_decode_single_and_full_bucket(n_seqs):
    rng = np.random.default_rng(3)
    kc, vc = make_cache(rng, num_blocks=40)
    reqs = [
        dict(token_ids=[1], start=i + 1, kv_len=i + 2,
             block_table=[4 * i, 4 * i + 1], temperature=1.0)
        for i in range(n_seqs)
    ]
    inputs, meta = build(reqs, t_bucket=8, s_bucket=8, w=4)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8)
    ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:n_seqs], np.asarray(ref)[:n_seqs], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)


def test_decode_int8_kv_matches_oracle():
    """int8 KV cache (per-token scales): kernel vs oracle, block 32 (int8
    write-back tiles are 32 rows)."""
    block = 32
    rng = np.random.default_rng(5)
    kq = np.clip(rng.standard_normal((1, HKV, 16, block, HD)) * 40, -127, 127)
    vq = np.clip(rng.standard_normal((1, HKV, 16, block, HD)) * 40, -127, 127)
    kc = (jnp.asarray(kq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, 16, HKV, block)), jnp.float32))
    vc = (jnp.asarray(vq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, 16, HKV, block)), jnp.float32))
    kv_lens = [3, 32, 65, 90]
    tables = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // block)], temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=8, num_seqs_bucket=8,
        max_blocks_per_seq=3, rng=np.zeros(2, np.uint32), group_pairs=GRP)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 8)

    ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:4], np.asarray(ref)[:4], rtol=2e-2, atol=2e-2
    )
    # The quantized new rows + scales must round-trip through the cache.
    np.testing.assert_array_equal(np.asarray(ko[0]), np.asarray(kr[0]))
    np.testing.assert_allclose(np.asarray(ko[1]), np.asarray(kr[1]),
                               rtol=1e-6, atol=1e-6)


def test_prefill_int8_kv_matches_oracle():
    block = 32
    q_tile = 8
    rng = np.random.default_rng(6)
    shape = (1, HKV, 16, block, HD)
    sshape = (1, 16, HKV, block)
    kc = (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32))
    vc = (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32))
    lens = [5, 40, 16]
    tables = [[0, 1], [2, 3], [4]]
    reqs = [
        dict(token_ids=list(range(n)), start=0, kv_len=n,
             block_table=t, temperature=1.0)
        for n, t in zip(lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=72, num_seqs_bucket=4,
        max_blocks_per_seq=2, rng=np.zeros(2, np.uint32), q_tile=q_tile)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((72, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 72)

    ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, interpret=True
    )
    live = np.asarray(inputs.seq_ids) < 4
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


def _snap_int4(x):
    """Round rows onto the int4 quantization grid (scale = amax/7 per
    (token, head)). Grid-resident inputs quantize exactly, so the kernel's
    full-precision self-term equals the oracle's quantized-row read and the
    comparison is tight."""
    x = np.asarray(x)
    scale = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-8) / 7.0
    return jnp.asarray(np.clip(np.round(x / scale), -7, 7) * scale, np.float32)


def test_decode_int4_kv_matches_oracle():
    """int4 KV cache: uint8 values nibble-packed along the kv-head dim
    ([Hkv/2] bytes, head h low nibble / head h+Hkv/2 high), per-(token, head)
    f32 scales — kernel vs oracle, block 32."""
    block = 32
    rng = np.random.default_rng(11)
    hs = HKV // 2
    kc = (jnp.asarray(rng.integers(0, 256, (1, hs, 16, block, HD)), jnp.uint8),
          jnp.asarray(rng.uniform(0.05, 0.3, (1, 16, HKV, block)), jnp.float32))
    vc = (jnp.asarray(rng.integers(0, 256, (1, hs, 16, block, HD)), jnp.uint8),
          jnp.asarray(rng.uniform(0.05, 0.3, (1, 16, HKV, block)), jnp.float32))
    kv_lens = [3, 32, 65, 90]
    tables = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // block)], temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=8, num_seqs_bucket=8,
        max_blocks_per_seq=3, rng=np.zeros(2, np.uint32), group_pairs=GRP)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 8)
    # Snap new rows onto the int4 grid: the kernel folds the new token's
    # self-attention in at full precision while the oracle reads its
    # quantized cache row — identical only for grid-resident values.
    kn, vn = _snap_int4(kn), _snap_int4(vn)

    ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:4], np.asarray(ref)[:4], rtol=2e-2, atol=2e-2
    )
    # The packed new rows + scales must round-trip through the cache.
    np.testing.assert_array_equal(np.asarray(ko[0]), np.asarray(kr[0]))
    np.testing.assert_allclose(np.asarray(ko[1]), np.asarray(kr[1]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(vo[0]), np.asarray(vr[0]))


def test_prefill_int4_kv_matches_oracle():
    block = 32
    q_tile = 8
    rng = np.random.default_rng(12)
    hs = HKV // 2
    shape = (1, hs, 16, block, HD)
    sshape = (1, 16, HKV, block)
    kc = (jnp.zeros(shape, jnp.uint8), jnp.zeros(sshape, jnp.float32))
    vc = (jnp.zeros(shape, jnp.uint8), jnp.zeros(sshape, jnp.float32))
    lens = [5, 40, 16]
    tables = [[0, 1], [2, 3], [4]]
    reqs = [
        dict(token_ids=list(range(n)), start=0, kv_len=n,
             block_table=t, temperature=1.0)
        for n, t in zip(lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=72, num_seqs_bucket=4,
        max_blocks_per_seq=2, rng=np.zeros(2, np.uint32), q_tile=q_tile)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((72, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 72)

    ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, interpret=True
    )
    # Both paths attend over the quantized appended rows, so the outputs
    # match tightly without snapping.
    live = np.asarray(inputs.seq_ids) < 4
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    # Packed bytes and scale slabs agree at every LIVE slot (the kernel also
    # writes tile-run rows past kv_len inside sequence-owned pages — by
    # design; the oracle drops them).
    slots = np.asarray(inputs.slot_mapping)
    lv = slots[slots >= 0]
    pages, lanes = lv // block, lv % block
    for got, want in ((ko[0], kr[0]), (vo[0], vr[0])):
        a = np.asarray(got).reshape(hs, -1, HD)
        d = np.asarray(want).reshape(hs, -1, HD)
        np.testing.assert_array_equal(a[:, lv], d[:, lv])
    for got, want in ((ko[1], kr[1]), (vo[1], vr[1])):
        np.testing.assert_allclose(
            np.asarray(got)[0, pages, :, lanes],
            np.asarray(want)[0, pages, :, lanes], rtol=1e-6, atol=1e-6,
        )


def _pad_hd(x, khd):
    return jnp.pad(x, ((0, 0), (0, 0), (0, khd - x.shape[-1])))


@pytest.mark.parametrize("quantized", [False, True])
def test_padded_head_dim_matches_unpadded_oracle(quantized):
    """Off-size head dims run the kernels with q/k/v and the cache zero-padded
    to the lane-tile width (model_runner.kernel_head_dim): padded K lanes add
    0 to scores, padded V lanes are sliced away, and int8-KV per-(token, head)
    scales see the same amax — outputs must equal the UNPADDED oracle."""
    KHD = 64  # kernel-visible head dim; logical HD = 32
    rng = np.random.default_rng(11)
    kv_lens = [5, 20, 37]
    tables = [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    reqs = [dict(token_ids=[1], start=n - 1, kv_len=n,
                 block_table=t[: -(-n // BLOCK)], temperature=1.0)
            for n, t in zip(kv_lens, tables)]
    inputs, meta = build(reqs, 8, 8, 3)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 8)

    # Unpadded oracle on an hd=32 cache.
    kc, vc = make_cache(rng, 16)
    ref, kr, vr = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM,
    )

    # Padded kernel on an hd=64 cache holding the same values in lanes 0:32.
    kc64 = jnp.pad(np.asarray(kc), ((0, 0), (0, 0), (0, 0), (0, 0), (0, KHD - HD)))
    vc64 = jnp.pad(np.asarray(vc), ((0, 0), (0, 0), (0, 0), (0, 0), (0, KHD - HD)))
    if quantized:
        # int8-KV mode: fresh (zeroed) quantized caches for both kernel and
        # oracle — the padding concern is quantize_kv_rows over zero lanes
        # (amax unchanged) and the scale folds; decode's block%32 constraint
        # makes this a prefill-only check at BLOCK=16.
        zq = lambda: (jnp.zeros((1, HKV, 16, BLOCK, KHD), jnp.int8),
                      jnp.zeros((1, 16, HKV, BLOCK), jnp.float32))
        zq32 = lambda: (jnp.zeros((1, HKV, 16, BLOCK, HD), jnp.int8),
                        jnp.zeros((1, 16, HKV, BLOCK), jnp.float32))
        preqs = [dict(token_ids=list(range(20)), start=0, kv_len=20,
                      block_table=[9, 10], temperature=1.0)]
        pinputs, pmeta = build(preqs, 32, 8, 3, q_tile=8)
        qp = jnp.asarray(rng.standard_normal((32, HQ, HD)), np.float32)
        knp, vnp = new_kv(rng, 32)
        refp, _, _ = ragged_paged_attention_ref(
            qp, knp, vnp, zq32(), zq32(), 0, pmeta, sm_scale=SM
        )
        outp, _, _ = ragged_prefill_attention(
            _pad_hd(qp, KHD), _pad_hd(knp, KHD), _pad_hd(vnp, KHD),
            zq(), zq(), 0, pmeta, sm_scale=SM, q_tile=8, interpret=True,
        )
        live = np.asarray(pinputs.slot_mapping) >= 0
        np.testing.assert_allclose(
            np.asarray(outp)[live, :, :HD], np.asarray(refp, np.float32)[live],
            rtol=2e-2, atol=2e-2,
        )
        return

    out, ko, vo = paged_decode_attention(
        _pad_hd(q, KHD), _pad_hd(kn, KHD), _pad_hd(vn, KHD),
        kc64, vc64, 0, meta, sm_scale=SM, interpret=True,
    )
    out = out[:, :, :HD]
    n = len(reqs)
    # decode dots run f32: padding must be numerically invisible
    np.testing.assert_allclose(
        np.asarray(out[:n]), np.asarray(ref[:n], np.float32),
        rtol=1e-5, atol=1e-5,
    )

    # Prefill path with the same padding.
    preqs = [dict(token_ids=list(range(20)), start=0, kv_len=20,
                  block_table=[9, 10], temperature=1.0)]
    pinputs, pmeta = build(preqs, 32, 8, 3, q_tile=8)
    qp = jnp.asarray(rng.standard_normal((32, HQ, HD)), np.float32)
    knp, vnp = new_kv(rng, 32)
    refp, _, _ = ragged_paged_attention_ref(
        qp, knp, vnp, kc, vc, 0, pmeta, sm_scale=SM
    )
    outp, _, _ = ragged_prefill_attention(
        _pad_hd(qp, KHD), _pad_hd(knp, KHD), _pad_hd(vnp, KHD),
        kc64, vc64, 0, pmeta, sm_scale=SM, q_tile=8, interpret=True,
    )
    live = np.asarray(pinputs.slot_mapping) >= 0
    # prefill dots default to bf16 operands (r3): padding itself is exact,
    # but the comparison vs the f32 oracle carries bf16 rounding.
    np.testing.assert_allclose(
        np.asarray(outp)[live, :, :HD], np.asarray(refp, np.float32)[live],
        rtol=2e-2, atol=2e-2,
    )


def test_decode_grp4_matches_oracle(monkeypatch):
    """The decode group size is a tunable (config/runner read it from the
    kernel module); the kernel must stay correct at other GRP values."""
    import nanovllm_tpu.ops.pallas.ragged_attention as ra

    monkeypatch.setattr(ra, "GRP", 4)
    rng = np.random.default_rng(7)
    kc, vc = make_cache(rng, num_blocks=24)
    kv_lens = [3, 16, 33, 48, 7, 21]
    tables = [[0, 1, 2, 3], [4, 5, 0, 0], [6, 7, 8, 9], [10, 11, 12, 0],
              [13, 0, 0, 0], [14, 15, 0, 0]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // BLOCK)], temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=BLOCK, num_tokens_bucket=8, num_seqs_bucket=8,
        max_blocks_per_seq=4, rng=np.zeros(2, np.uint32), group_pairs=4,
    )
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8)
    ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, interpret=True
    )
    n = len(reqs)
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(ref)[:n], rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(ko), np.asarray(kr), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_partial_page_rungs(quantized):
    """Blocks >= 2*PAGE_RUNG fetch a sequence's last page only up to the
    rung covering its valid rows (ragged_attention.PAGE_RUNG). kv lengths
    straddle every rung boundary of a 128-block (2 rungs of 64), including
    exact boundaries, one-token pages, and dead lanes at depth 1."""
    block = 128
    rng = np.random.default_rng(13)
    if quantized:
        kq = np.clip(rng.standard_normal((1, HKV, 18, block, HD)) * 40, -127, 127)
        vq = np.clip(rng.standard_normal((1, HKV, 18, block, HD)) * 40, -127, 127)
        kc = (jnp.asarray(kq, jnp.int8), jnp.asarray(
            rng.uniform(0.005, 0.02, (1, 18, HKV, block)), jnp.float32))
        vc = (jnp.asarray(vq, jnp.int8), jnp.asarray(
            rng.uniform(0.005, 0.02, (1, 18, HKV, block)), jnp.float32))
    else:
        k = rng.standard_normal((1, HKV, 18, block, HD), np.float32)
        v = rng.standard_normal((1, HKV, 18, block, HD), np.float32)
        kc, vc = jnp.asarray(k), jnp.asarray(v)
    kv_lens = [1, 63, 64, 65, 127, 128, 130, 255]
    nb = [-(-n // block) for n in kv_lens]
    start = np.cumsum([0] + nb)
    tables = [list(range(start[i], start[i + 1])) for i in range(len(kv_lens))]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n, block_table=t,
             temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=8, num_seqs_bucket=8,
        max_blocks_per_seq=2, rng=np.zeros(2, np.uint32), group_pairs=GRP)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 8)

    ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    if quantized:
        np.testing.assert_array_equal(np.asarray(ko[0]), np.asarray(kr[0]))
        np.testing.assert_allclose(np.asarray(ko[1]), np.asarray(kr[1]),
                                   rtol=1e-6, atol=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(ko), np.asarray(kr),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vo), np.asarray(vr),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("quantized", [False, True])
def test_prefill_partial_page_rungs(quantized):
    """Prefill page reads also stop at the rung covering the causal frontier
    (block 128 = 2 rungs of 64): fresh prefills with lens straddling the rung
    boundary, plus a chunked continuation whose q positions start mid-page."""
    block = 128
    q_tile = 8
    rng = np.random.default_rng(17)
    shape = (1, HKV, 12, block, HD)
    sshape = (1, 12, HKV, block)
    if quantized:
        kc = (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32))
        vc = (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32))
    else:
        kc = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        vc = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    # Fresh prefills (kv == q rows) at 70 and 130; chunk 2 of a 190-token
    # sequence whose first 128 tokens (one whole page) are already cached.
    reqs = [
        dict(token_ids=list(range(70)), start=0, kv_len=70,
             block_table=[0], temperature=1.0),
        dict(token_ids=list(range(130)), start=0, kv_len=130,
             block_table=[1, 2], temperature=1.0),
        dict(token_ids=list(range(62)), start=128, kv_len=190,
             block_table=[3, 4], temperature=1.0),
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=280, num_seqs_bucket=4,
        max_blocks_per_seq=2, rng=np.zeros(2, np.uint32), q_tile=q_tile)
    meta = meta_from_inputs(inputs)
    t = 280
    q = jnp.asarray(rng.standard_normal((t, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, t)

    ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, interpret=True
    )
    live = np.asarray(inputs.slot_mapping) >= 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


def test_decode_sliding_window_matches_oracle():
    """window=W masks history to (kv_len-1-W, kv_len-1) in the decode kernel
    (static branch; window=None compiles to the unwindowed kernel)."""
    rng = np.random.default_rng(4)
    kc, vc = make_cache(rng, num_blocks=24)
    kv_lens = [3, 16, 33, 48, 7]
    tables = [[0, 1, 2, 3], [4, 5, 0, 0], [6, 7, 8, 9], [10, 11, 12, 0],
              [13, 0, 0, 0]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // BLOCK)], temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs, meta = build(reqs, t_bucket=8, s_bucket=8, w=4)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8)
    W = 6  # smaller than several kv lengths -> mask bites
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, _, _ = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:5], np.asarray(ref)[:5], rtol=2e-2, atol=2e-2
    )
    # the window must change the result vs unwindowed
    ref_nw, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM
    )
    assert np.abs(np.asarray(ref)[:5] - np.asarray(ref_nw)[:5]).max() > 1e-3


def test_prefill_sliding_window_matches_oracle():
    rng = np.random.default_rng(5)
    kc, vc = make_cache(rng, num_blocks=24)
    q_tile = 8
    lens = [5, 19, 8]
    tables = [[0, 1], [2, 3, 4], [5]]
    reqs = [
        dict(token_ids=list(range(n)), start=0, kv_len=n,
             block_table=t, temperature=1.0)
        for n, t in zip(lens, tables)
    ]
    inputs, meta = build(reqs, t_bucket=48, s_bucket=4, w=3, q_tile=q_tile)
    q = jnp.asarray(rng.standard_normal((48, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 48)
    W = 6
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, _, _ = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, window=W,
        interpret=True,
    )
    live = np.asarray(inputs.seq_ids) < 4
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


def test_decode_sliding_window_int8_kv():
    """Window mask composes with the int8-KV scale folds (scales zero
    outside the narrowed history; masked columns die in the select)."""
    block = 32
    rng = np.random.default_rng(6)
    kq = np.clip(rng.standard_normal((1, HKV, 16, block, HD)) * 40, -127, 127)
    vq = np.clip(rng.standard_normal((1, HKV, 16, block, HD)) * 40, -127, 127)
    kc = (jnp.asarray(kq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, 16, HKV, block)), jnp.float32))
    vc = (jnp.asarray(vq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, 16, HKV, block)), jnp.float32))
    kv_lens = [3, 32, 65, 90]
    tables = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // block)], temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=8, num_seqs_bucket=8,
        max_blocks_per_seq=3, rng=np.zeros(2, np.uint32), group_pairs=GRP)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 8)
    W = 20  # < several kv lengths -> the window bites
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, _, _ = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:4], np.asarray(ref)[:4], rtol=2e-2, atol=2e-2
    )


def test_decode_window_worklist_skipping():
    """window passed to build_step_inputs drops pages every group lane has
    rolled past (glo > 0); the kernel's group-start init moves off j==0 and
    per-lane DMAs skip pages outside (kv_len-1-W, kv_len-1]."""
    rng = np.random.default_rng(7)
    kc, vc = make_cache(rng, num_blocks=64)
    W = 10  # well under one page (BLOCK=16): leading pages all skippable
    kv_lens = [40, 45, 33, 100, 60, 50, 70, 80]   # full group, all long
    reqs = []
    nb = 0
    for n in kv_lens:
        t = list(range(nb, nb + -(-n // BLOCK)))
        nb += len(t)
        reqs.append(dict(token_ids=[1], start=n - 1, kv_len=n,
                         block_table=t, temperature=1.0))
    kw = dict(block_size=BLOCK, num_tokens_bucket=8, num_seqs_bucket=8,
              max_blocks_per_seq=7, rng=np.zeros(2, np.uint32),
              group_pairs=GRP)
    inputs = build_step_inputs(reqs, window=W, **kw)
    full = build_step_inputs(reqs, **kw)
    # every lane is past page 0: glo = min lane lo = (33-1-10)//16 = 1
    n_live = int((np.asarray(inputs.pair_tile) < 1).sum())
    n_full = int((np.asarray(full.pair_tile) < 1).sum())
    assert n_live < n_full and np.asarray(inputs.pair_page)[0] == 1
    # fast path == slow path with a window
    slow = build_step_inputs(reqs, window=W, _slow=True, **kw)
    for name, a, b in zip(inputs._fields, inputs, slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8)
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert_written(ko, vo, kn, vn, inputs)


def test_decode_window_worklist_mixed_groups():
    """Two groups with heterogeneous lengths: a short lane pins its group's
    first page at 0 (glo = min over lanes) while the uniform long group
    skips; lanes inside a visited pair still skip their own dead pages."""
    rng = np.random.default_rng(8)
    kc, vc = make_cache(rng, num_blocks=96)
    W = 12
    kv_lens = [3, 90, 100, 80, 75, 95, 88, 70,       # group 0: glo = 0
               64, 66, 70, 72, 74, 76, 78, 81]       # group 1: glo > 0
    reqs = []
    nb = 0
    for n in kv_lens:
        t = list(range(nb, nb + -(-n // BLOCK)))
        nb += len(t)
        reqs.append(dict(token_ids=[1], start=n - 1, kv_len=n,
                         block_table=t, temperature=1.0))
    kw = dict(block_size=BLOCK, num_tokens_bucket=16, num_seqs_bucket=16,
              max_blocks_per_seq=7, rng=np.zeros(2, np.uint32),
              group_pairs=GRP)
    inputs = build_step_inputs(reqs, window=W, **kw)
    slow = build_step_inputs(reqs, window=W, _slow=True, **kw)
    for name, a, b in zip(inputs._fields, inputs, slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    pt, pp = np.asarray(inputs.pair_tile), np.asarray(inputs.pair_page)
    assert pp[pt == 0].min() == 0          # short lane keeps page 0
    assert pp[pt == 1].min() > 0           # uniform long group skips
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((16, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 16)
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert_written(ko, vo, kn, vn, inputs)


def test_decode_window_worklist_int8_kv():
    """Worklist skipping composes with the quantized cache (scale DMAs are
    gated on the same lane_rows predicate as the page DMAs)."""
    block = 32
    nb_pool = 48  # the tables below use 44 distinct pages
    rng = np.random.default_rng(9)
    kq = np.clip(
        rng.standard_normal((1, HKV, nb_pool, block, HD)) * 40, -127, 127
    )
    vq = np.clip(
        rng.standard_normal((1, HKV, nb_pool, block, HD)) * 40, -127, 127
    )
    kc = (jnp.asarray(kq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, nb_pool, HKV, block)), jnp.float32))
    vc = (jnp.asarray(vq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, nb_pool, HKV, block)), jnp.float32))
    W = 30
    kv_lens = [120, 150, 180, 200, 130, 140, 165, 190]
    reqs = []
    nb = 0
    for n in kv_lens:
        t = list(range(nb, nb + -(-n // block)))
        nb += len(t)
        reqs.append(dict(token_ids=[1], start=n - 1, kv_len=n,
                         block_table=t, temperature=1.0))
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=8, num_seqs_bucket=8,
        max_blocks_per_seq=7, rng=np.zeros(2, np.uint32), group_pairs=GRP,
        window=W)
    assert np.asarray(inputs.pair_page)[0] > 0   # leading pages skipped
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.float32)
    kn, vn = new_kv(rng, 8)
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, _, _ = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_prefill_window_worklist_skipping():
    """Prefill worklist drops pages below each tile's window reach
    (lo = (pos0 - W + 1) // block); start-of-tile appends/init/refetch keys
    move from j==0 to the tile's first worklist pair."""
    rng = np.random.default_rng(10)
    kc, vc = make_cache(rng, num_blocks=64)
    q_tile = 8
    W = 10
    # Chunked continuations far past the window: tiles must skip leading
    # pages; one fresh short seq keeps a j==0 tile in the mix; seq 1 spans
    # two chunks of the same sequence (prev-tile refetch hazard).
    reqs_spec = [
        (48, 64),   # start=48, kv_len=64: 2 tiles, lo = 39//16 = 2
        (0, 13),    # fresh short: tiles at j==0
        (80, 96),   # deep continuation: lo = 71//16 = 4
    ]
    reqs = []
    nb = 0
    for start, kv in reqs_spec:
        t = list(range(nb, nb + -(-kv // BLOCK)))
        nb += len(t)
        reqs.append(dict(token_ids=list(range(kv - start)), start=start,
                         kv_len=kv, block_table=t, temperature=1.0))
    inputs = build_step_inputs(
        reqs, block_size=BLOCK, num_tokens_bucket=48, num_seqs_bucket=4,
        max_blocks_per_seq=6, rng=np.zeros(2, np.uint32), q_tile=q_tile,
        window=W)
    full = build_step_inputs(
        reqs, block_size=BLOCK, num_tokens_bucket=48, num_seqs_bucket=4,
        max_blocks_per_seq=6, rng=np.zeros(2, np.uint32), q_tile=q_tile)
    nt = inputs.tile_seq.shape[0]
    assert (np.asarray(inputs.pair_tile) < nt).sum() < (
        np.asarray(full.pair_tile) < nt).sum()
    meta = meta_from_inputs(inputs)
    q = jnp.asarray(rng.standard_normal((48, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 48)
    ref, kr, vr = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, window=W,
        interpret=True,
    )
    live = np.asarray(inputs.seq_ids) < 4
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)


def test_decode_per_layer_window_scalar():
    """The window is a RUNTIME scalar: one traced decode-kernel program
    serves different per-layer windows (Gemma3 local/global interleave) —
    scanning over [W, huge] must equal per-window oracle runs, with the huge
    window behaving exactly like no window."""
    rng = np.random.default_rng(12)
    kc, vc = make_cache(rng, num_blocks=24, layers=2)
    kv_lens = [3, 16, 33, 48, 7]
    tables = [[0, 1, 2, 3], [4, 5, 0, 0], [6, 7, 8, 9], [10, 11, 12, 0],
              [13, 0, 0, 0]]
    reqs = [
        dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // BLOCK)], temperature=1.0)
        for n, t in zip(kv_lens, tables)
    ]
    inputs, meta = build(reqs, t_bucket=8, s_bucket=8, w=4)
    q = jnp.asarray(rng.standard_normal((8, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8)
    windows = jnp.asarray([6, 1 << 30], jnp.int32)

    import jax

    def scan_layers(windows, kc, vc):
        def body(carry, xs):
            kc, vc = carry
            win, layer = xs
            o, kc, vc = paged_decode_attention(
                q, kn, vn, kc, vc, layer, meta, sm_scale=SM, window=win,
                interpret=True,
            )
            return (kc, vc), o

        (kc, vc), outs = jax.lax.scan(
            body, (kc, vc), (windows, jnp.arange(2, dtype=jnp.int32))
        )
        return outs

    outs = scan_layers(windows, kc, vc)
    ref_w, kr, vr = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=6
    )
    ref_nw, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kr, vr, 1, meta, sm_scale=SM
    )
    np.testing.assert_allclose(np.asarray(outs[0])[:5], np.asarray(ref_w)[:5],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(outs[1])[:5], np.asarray(ref_nw)[:5],
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("quantized", [False, True])
def test_prefill_window_gates_pairs_on_full_worklist(quantized):
    """Per-layer-window models (Gemma3) keep the FULL worklist (global layers
    need every page), so local layers must gate dead pages per-pair inside
    the kernel: deep-continuation tiles see their leading pages gated (rows
    0 — no DMA, V strips/scales zeroed) and still match the oracle."""
    rng = np.random.default_rng(21)
    if quantized:
        kq = np.clip(rng.standard_normal((1, HKV, 24, BLOCK, HD)) * 40,
                     -127, 127)
        vq = np.clip(rng.standard_normal((1, HKV, 24, BLOCK, HD)) * 40,
                     -127, 127)
        kc = (jnp.asarray(kq, jnp.int8), jnp.asarray(
            rng.uniform(0.005, 0.02, (1, 24, HKV, BLOCK)), jnp.float32))
        vc = (jnp.asarray(vq, jnp.int8), jnp.asarray(
            rng.uniform(0.005, 0.02, (1, 24, HKV, BLOCK)), jnp.float32))
    else:
        kc, vc = make_cache(rng, num_blocks=24)
    q_tile = 8
    W = 6  # < page (16): deep tiles gate several leading pages
    reqs_spec = [(48, 64), (0, 13), (80, 96)]
    reqs = []
    nb = 0
    for start, kv in reqs_spec:
        t = list(range(nb, nb + -(-kv // BLOCK)))
        nb += len(t)
        reqs.append(dict(token_ids=list(range(kv - start)), start=start,
                         kv_len=kv, block_table=t, temperature=1.0))
    # FULL worklist: no window passed to the builder.
    inputs, meta = build(reqs, t_bucket=48, s_bucket=4, w=6, q_tile=q_tile)
    q = jnp.asarray(rng.standard_normal((48, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 48)
    ref, _, _ = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, window=W
    )
    out, ko, vo = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=q_tile, window=W,
        interpret=True,
    )
    live = np.asarray(inputs.seq_ids) < 4
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    if not quantized:
        assert_written(ko, vo, kn, vn, inputs)


# ------------------------------------------------ spec verify mode (q_len>1)


def _spec_meta(reqs, ql, s_bucket, w, append_lens):
    """Decode-kernel spec mode: ql-token chunks per seq, kv_len includes the
    chunk; rows whose append the device masks carry slot -1 so the oracle's
    scatter matches the kernel's append_lens-capped writes."""
    inputs = build_step_inputs(
        reqs, block_size=BLOCK, num_tokens_bucket=s_bucket * ql,
        num_seqs_bucket=s_bucket, max_blocks_per_seq=w,
        rng=np.zeros(2, np.uint32), group_pairs=GRP,
    )
    sm = np.asarray(inputs.slot_mapping).copy()
    al = np.zeros(s_bucket, np.int32)
    for i, n in enumerate(append_lens):
        al[i] = n
        sm[i * ql + n: (i + 1) * ql] = -1
    inputs = inputs._replace(slot_mapping=sm)
    return inputs, meta_from_inputs(inputs)._replace(
        append_lens=jnp.asarray(al)
    )


def test_decode_spec_qlen_matches_oracle():
    """q_len=4 verify chunks: in-register causal new-row block + history
    masking at kv_len - q_len + multi-row write-back. Covers a chunk
    crossing a page boundary (start 14 in 16-token pages), a short history,
    an exact page multiple, and an append_lens=1 (ineligible) row whose
    draft rows are junk (only row 0 compared)."""
    ql = 4
    rng = np.random.default_rng(31)
    kc, vc = make_cache(rng, num_blocks=24)
    # (row0 position + 1, appends): kv_len passed = start + ql.
    starts = [14, 2, 31, 20, 5]
    appends = [4, 4, 4, 4, 1]
    reqs = []
    nb = 0
    for s0 in starts:
        pages = -(-(s0 + ql) // BLOCK)
        reqs.append(dict(token_ids=[1] * ql, start=s0, kv_len=s0 + ql,
                         block_table=list(range(nb, nb + pages)),
                         temperature=1.0))
        nb += pages
    inputs, meta = _spec_meta(reqs, ql, 8, 3, appends)
    q = jnp.asarray(rng.standard_normal((8 * ql, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8 * ql)

    ref, kr, vr = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM
    )
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_len=ql, interpret=True
    )
    rows = []
    for i, n in enumerate(appends):
        rows += list(range(i * ql, i * ql + n))  # appended rows are exact
    np.testing.assert_allclose(
        np.asarray(out)[rows], np.asarray(ref)[rows], rtol=2e-2, atol=2e-2
    )
    assert_written(ko, vo, kn, vn, inputs)
    np.testing.assert_allclose(np.asarray(ko), np.asarray(kr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr),
                               rtol=1e-6, atol=1e-6)


def test_decode_spec_qlen_int8_kv():
    """Spec verify over an int8 cache: scale-slab lane patches for several
    appended rows per page, incl. a page-boundary spill (block 32)."""
    block, ql = 32, 3
    rng = np.random.default_rng(32)
    kq = np.clip(rng.standard_normal((1, HKV, 16, block, HD)) * 40, -127, 127)
    vq = np.clip(rng.standard_normal((1, HKV, 16, block, HD)) * 40, -127, 127)
    kc = (jnp.asarray(kq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, 16, HKV, block)), jnp.float32))
    vc = (jnp.asarray(vq, jnp.int8), jnp.asarray(
        rng.uniform(0.005, 0.02, (1, 16, HKV, block)), jnp.float32))
    starts = [30, 4, 63, 33]   # 30: spill 31,32,33 across the page boundary
    appends = [3, 3, 3, 1]
    reqs = []
    nb = 0
    for s0 in starts:
        pages = -(-(s0 + ql) // block)
        reqs.append(dict(token_ids=[1] * ql, start=s0, kv_len=s0 + ql,
                         block_table=list(range(nb, nb + pages)),
                         temperature=1.0))
        nb += pages
    inputs = build_step_inputs(
        reqs, block_size=block, num_tokens_bucket=8 * ql, num_seqs_bucket=8,
        max_blocks_per_seq=3, rng=np.zeros(2, np.uint32), group_pairs=GRP,
    )
    sm = np.asarray(inputs.slot_mapping).copy()
    al = np.zeros(8, np.int32)
    for i, n in enumerate(appends):
        al[i] = n
        sm[i * ql + n: (i + 1) * ql] = -1
    inputs = inputs._replace(slot_mapping=sm)
    meta = meta_from_inputs(inputs)._replace(append_lens=jnp.asarray(al))
    q = jnp.asarray(rng.standard_normal((8 * ql, HQ, HD), np.float32))
    kn, vn = new_kv(rng, 8 * ql)

    ref, kr, vr = ragged_paged_attention_ref(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM
    )
    out, ko, vo = paged_decode_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_len=ql, interpret=True
    )
    rows = []
    for i, n in enumerate(appends):
        rows += list(range(i * ql, i * ql + n))
    np.testing.assert_allclose(
        np.asarray(out)[rows], np.asarray(ref)[rows], rtol=3e-2, atol=3e-2
    )
    np.testing.assert_array_equal(np.asarray(ko[0]), np.asarray(kr[0]))
    np.testing.assert_allclose(np.asarray(ko[1]), np.asarray(kr[1]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vo[1]), np.asarray(vr[1]),
                               rtol=1e-6, atol=1e-6)
