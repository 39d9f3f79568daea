"""Compile + numerics probe of both Pallas kernels on the real TPU chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from nanovllm_tpu.engine.inputs import build_step_inputs
from nanovllm_tpu.ops.attention import AttentionMeta, ragged_paged_attention_ref
from nanovllm_tpu.ops.pallas.ragged_attention import (
    GRP, paged_decode_attention, ragged_prefill_attention)

BLOCK, HD, HKV, HQ = 256, 128, 8, 16
SM = HD ** -0.5

def meta_of(i):
    return AttentionMeta(
        positions=i.positions, slot_mapping=i.slot_mapping, seq_ids=i.seq_ids,
        kv_lens=i.kv_lens, block_tables=i.block_tables, cu_q_lens=i.cu_q_lens,
        num_seqs=i.num_seqs, tile_seq=i.tile_seq, tile_pos0=i.tile_pos0,
        pair_tile=i.pair_tile, pair_page=i.pair_page)

rng = np.random.default_rng(0)
NB = 64
kc = jnp.asarray(rng.standard_normal((2, HKV, NB, BLOCK, HD)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((2, HKV, NB, BLOCK, HD)), jnp.bfloat16)

# ---- decode: ragged kv lens, some crossing page boundaries
kv_lens = [3, 256, 257, 777, 511]
tables = [[0,1,2,3], [4,5,6,7], [8,9,10,11], [12,13,14,15], [16,17,18,19]]
reqs = [dict(token_ids=[1], start=n-1, kv_len=n,
             block_table=t[: -(-n // BLOCK)], temperature=1.0)
        for n, t in zip(kv_lens, tables)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=8,
                           num_seqs_bucket=8, max_blocks_per_seq=4,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta = meta_of(inputs)
q = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((8, HKV, HD)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((8, HKV, HD)), jnp.bfloat16)

ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
out, ko, vo = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM)
)(q, kn, vn, kc, vc)
d = np.abs(np.asarray(out[:5], np.float32) - np.asarray(ref[:5], np.float32)).max()
print("decode max diff:", d)
assert d < 0.05, d
# cache write-back check
slots = np.asarray(inputs.slot_mapping)
live = slots >= 0
kf = np.asarray(ko, np.float32)[0].reshape(HKV, -1, HD)
np.testing.assert_allclose(kf[:, slots[live]],
                           np.asarray(kn, np.float32)[live].transpose(1,0,2),
                           rtol=0, atol=1e-2)
print("decode write-back ok")

# ---- prefill: fresh + continuation, q_tile 128
lens = [(0, 300), (256, 200), (0, 64)]  # (start, chunk)
tables2 = [[20,21], [22,23], [24]]
reqs = [dict(token_ids=list(range(c)), start=s, kv_len=s+c,
             block_table=t, temperature=1.0)
        for (s, c), t in zip(lens, tables2)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=768,
                           num_seqs_bucket=4, max_blocks_per_seq=2,
                           rng=np.zeros(2, np.uint32), q_tile=128)
meta = meta_of(inputs)
T = 768
q = jnp.asarray(rng.standard_normal((T, HQ, HD)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((T, HKV, HD)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((T, HKV, HD)), jnp.bfloat16)
ref, _, _ = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
out, ko, vo = jax.jit(
    lambda *a: ragged_prefill_attention(*a, 0, meta, sm_scale=SM, q_tile=128)
)(q, kn, vn, kc, vc)
live = np.asarray(inputs.seq_ids) < 4
d = np.abs(np.asarray(out, np.float32)[live] - np.asarray(ref, np.float32)[live]).max()
print("prefill max diff:", d)
assert d < 0.05, d
slots = np.asarray(inputs.slot_mapping)
live = slots >= 0
kf = np.asarray(ko, np.float32)[0].reshape(HKV, -1, HD)
np.testing.assert_allclose(kf[:, slots[live]],
                           np.asarray(kn, np.float32)[live].transpose(1,0,2),
                           rtol=0, atol=1e-2)
print("prefill write-back ok")
print("TPU PROBE PASS")

# ---- int8 KV quantized path on real chip
kshape = (2, HKV, NB, BLOCK, HD)
kc8 = (jnp.zeros(kshape, jnp.int8), jnp.zeros((2, NB, HKV, BLOCK), jnp.float32))
vc8 = (jnp.zeros(kshape, jnp.int8), jnp.zeros((2, NB, HKV, BLOCK), jnp.float32))
reqs = [dict(token_ids=list(range(c)), start=s, kv_len=s+c,
             block_table=t, temperature=1.0)
        for (s, c), t in zip(lens, tables2)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=768,
                           num_seqs_bucket=4, max_blocks_per_seq=2,
                           rng=np.zeros(2, np.uint32), q_tile=128)
meta = meta_of(inputs)
# prefill into empty quantized cache
ref, kr8, vr8 = ragged_paged_attention_ref(q, kn, vn, kc8, vc8, 0, meta, sm_scale=SM)
out, ko8, vo8 = jax.jit(
    lambda *a: ragged_prefill_attention(*a, 0, meta, sm_scale=SM, q_tile=128)
)(q, kn, vn, kc8, vc8)
live = np.asarray(inputs.seq_ids) < 4
d = np.abs(np.asarray(out, np.float32)[live] - np.asarray(ref, np.float32)[live]).max()
print("prefill int8-kv max diff vs oracle:", d)
assert d < 0.08, d

# decode over the prefilled quantized cache
kv_lens2 = [301, 457, 65]
reqs = [dict(token_ids=[1], start=n-1, kv_len=n, block_table=t,
             temperature=1.0) for n, t in zip(kv_lens2, tables2)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=8,
                           num_seqs_bucket=8, max_blocks_per_seq=4,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta = meta_of(inputs)
qd = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.bfloat16)
knd = jnp.asarray(rng.standard_normal((8, HKV, HD)), jnp.bfloat16)
vnd = jnp.asarray(rng.standard_normal((8, HKV, HD)), jnp.bfloat16)
ref, _, _ = ragged_paged_attention_ref(qd, knd, vnd, kr8, vr8, 0, meta, sm_scale=SM)
out, _, _ = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM)
)(qd, knd, vnd, ko8, vo8)
d = np.abs(np.asarray(out[:3], np.float32) - np.asarray(ref[:3], np.float32)).max()
print("decode int8-kv max diff vs oracle:", d)
assert d < 0.08, d
print("INT8-KV TPU PROBE PASS")

# ---- int4 KV (head-paired nibble packing) on real chip
HS = HKV // 2
kc4 = (jnp.zeros((2, HS, NB, BLOCK, HD), jnp.uint8),
       jnp.zeros((2, NB, HKV, BLOCK), jnp.float32))
vc4 = (jnp.zeros((2, HS, NB, BLOCK, HD), jnp.uint8),
       jnp.zeros((2, NB, HKV, BLOCK), jnp.float32))
reqs = [dict(token_ids=list(range(c)), start=s, kv_len=s+c,
             block_table=t, temperature=1.0)
        for (s, c), t in zip(lens, tables2)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=768,
                           num_seqs_bucket=4, max_blocks_per_seq=2,
                           rng=np.zeros(2, np.uint32), q_tile=128)
meta = meta_of(inputs)
ref, kr4, vr4 = ragged_paged_attention_ref(q, kn, vn, kc4, vc4, 0, meta, sm_scale=SM)
out, ko4, vo4 = jax.jit(
    lambda *a: ragged_prefill_attention(*a, 0, meta, sm_scale=SM, q_tile=128)
)(q, kn, vn, kc4, vc4)
live = np.asarray(inputs.seq_ids) < 4
d = np.abs(np.asarray(out, np.float32)[live] - np.asarray(ref, np.float32)[live]).max()
print("prefill int4-kv max diff vs oracle:", d)
assert d < 0.1, d

reqs = [dict(token_ids=[1], start=n-1, kv_len=n, block_table=t,
             temperature=1.0) for n, t in zip(kv_lens2, tables2)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=8,
                           num_seqs_bucket=8, max_blocks_per_seq=4,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta = meta_of(inputs)
ref, _, _ = ragged_paged_attention_ref(qd, knd, vnd, kr4, vr4, 0, meta, sm_scale=SM)
out, _, _ = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM)
)(qd, knd, vnd, ko4, vo4)
d = np.abs(np.asarray(out[:3], np.float32) - np.asarray(ref[:3], np.float32)).max()
print("decode int4-kv max diff vs oracle:", d)
assert d < 0.1, d
print("INT4-KV TPU PROBE PASS")


# ------------------------------------------------- grouped matmul (MoE gmm)
# The megablox Pallas kernels (stock bf16 + vendored int8-rhs) on the real
# chip vs a per-group jnp dot reference — interpret-mode tests cannot catch
# Mosaic layout/alignment errors (CLAUDE.md).
from nanovllm_tpu.ops.moe import grouped_matmul, grouped_matmul_quant

rng = np.random.default_rng(7)
M, K, N, G = 512, 256, 384, 8
lhs = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
gs_np = np.asarray([64, 0, 128, 32, 96, 0, 64, 128], np.int32)
gs = jnp.asarray(gs_np)

def group_ref(lhs_f, rhs_f):
    outs, row = [], 0
    for e in range(G):
        n_rows = int(gs_np[e])
        outs.append(np.asarray(lhs_f[row: row + n_rows]) @ np.asarray(rhs_f[e]))
        row += n_rows
    return np.concatenate(outs) if outs else np.zeros((0, N), np.float32)

rhs = jnp.asarray(rng.standard_normal((G, K, N)), jnp.bfloat16)
out = np.asarray(jax.jit(grouped_matmul)(lhs, rhs, gs), np.float32)
ref = group_ref(lhs.astype(jnp.float32), rhs.astype(jnp.float32))
d = np.abs(out[: ref.shape[0]] - ref).max() / max(np.abs(ref).max(), 1e-6)
print("gmm bf16 rel diff vs per-group dot:", d)
assert d < 2e-2, d

q8 = jnp.asarray(rng.integers(-127, 128, (G, K, N)), jnp.int8)
scale = jnp.asarray(rng.uniform(0.001, 0.02, (G, N)), jnp.float32)
outq = np.asarray(jax.jit(grouped_matmul_quant)(lhs, q8, scale, gs), np.float32)
refq = group_ref(
    lhs.astype(jnp.float32),
    q8.astype(jnp.float32) * scale[:, None, :],
)
dq = np.abs(outq[: refq.shape[0]] - refq).max() / max(np.abs(refq).max(), 1e-6)
print("gmm int8-rhs rel diff vs dequant per-group dot:", dq)
assert dq < 2e-2, dq

# int4 experts: gmm_int4's in-VMEM k-nibble unpack + per-k-tile group scales
# on the real chip (the f32 nibble arithmetic and sublane concat are the
# Mosaic-sensitive parts interpret mode cannot vouch for).
from nanovllm_tpu.ops import quant as quant_ops

w4 = rng.standard_normal((G, K, N)).astype(np.float32) * 0.05
qw4 = quant_ops.quantize_expert_int4(w4)  # g = 128 (kernel-native)
q4 = jnp.asarray(qw4.q)
s4 = jnp.asarray(qw4.scale)
out4 = np.asarray(
    jax.jit(grouped_matmul_quant)(lhs, q4, s4, gs), np.float32
)
ref4 = group_ref(
    lhs.astype(jnp.float32),
    np.asarray(quant_ops.dequant_int4_k(q4, s4, jnp.float32)),
)
d4 = np.abs(out4[: ref4.shape[0]] - ref4).max() / max(np.abs(ref4).max(), 1e-6)
print("gmm int4 (k-nibble) rel diff vs dequant per-group dot:", d4)
assert d4 < 2e-2, d4
print("GMM TPU PROBE PASS")


# ------------------------------------------ sliding-window attention (SWA)
# window=W is a static kernel branch (window=None is byte-identical to the
# unwindowed program); probe both kernels' masks on the chip.
# fresh bf16 cache for the window probe
kc_w = jnp.asarray(rng.standard_normal((1, HKV, 24, BLOCK, HD)), jnp.bfloat16)
vc_w = jnp.asarray(rng.standard_normal((1, HKV, 24, BLOCK, HD)), jnp.bfloat16)
kv_lens_w = [3, 16, 33, 48, 7, 1, 1, 1]
tables_w = [[0, 1, 2, 3], [4, 5, 0, 0], [6, 7, 8, 9], [10, 11, 12, 0],
            [13, 0, 0, 0], [14, 0, 0, 0], [15, 0, 0, 0], [16, 0, 0, 0]]
reqs = [dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // BLOCK)], temperature=1.0)
        for n, t in zip(kv_lens_w, tables_w)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=8,
                           num_seqs_bucket=8, max_blocks_per_seq=4,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta = meta_of(inputs)
qw = jnp.asarray(rng.standard_normal((8, HQ, HD)), jnp.bfloat16)
knw = jnp.asarray(rng.standard_normal((8, HKV, HD)), jnp.bfloat16)
vnw = jnp.asarray(rng.standard_normal((8, HKV, HD)), jnp.bfloat16)
WIN = 6
ref, _, _ = ragged_paged_attention_ref(
    qw, knw, vnw, kc_w, vc_w, 0, meta, sm_scale=SM, window=WIN)
out, _, _ = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM, window=WIN)
)(qw, knw, vnw, kc_w, vc_w)
d = np.abs(np.asarray(out[:5], np.float32) - np.asarray(ref[:5], np.float32)).max()
print("decode SWA max diff vs oracle:", d)
assert d < 0.1, d
print("SWA TPU PROBE PASS")


# SWA prefill branch + a multi-page windowed decode (window crossing page
# boundaries — the single-page case above never exercises the cross-page
# combine under a fully-masked page).
reqs = [dict(token_ids=list(range(20)), start=0, kv_len=20,
             block_table=[17], temperature=1.0),
        dict(token_ids=list(range(48)), start=0, kv_len=48,
             block_table=[18], temperature=1.0)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=256,
                           num_seqs_bucket=4, max_blocks_per_seq=2,
                           rng=np.zeros(2, np.uint32), q_tile=128)
meta = meta_of(inputs)
qp = jnp.asarray(rng.standard_normal((256, HQ, HD)), jnp.bfloat16)
knp = jnp.asarray(rng.standard_normal((256, HKV, HD)), jnp.bfloat16)
vnp = jnp.asarray(rng.standard_normal((256, HKV, HD)), jnp.bfloat16)
kc_p = jnp.zeros((1, HKV, 24, BLOCK, HD), jnp.bfloat16)
vc_p = jnp.zeros((1, HKV, 24, BLOCK, HD), jnp.bfloat16)
ref, _, _ = ragged_paged_attention_ref(
    qp, knp, vnp, kc_p, vc_p, 0, meta, sm_scale=SM, window=WIN)
out, _, _ = jax.jit(
    lambda *a: ragged_prefill_attention(*a, 0, meta, sm_scale=SM,
                                        q_tile=128, window=WIN)
)(qp, knp, vnp, kc_p, vc_p)
live = np.asarray(inputs.seq_ids) < 4
d = np.abs(np.asarray(out, np.float32)[live] - np.asarray(ref, np.float32)[live]).max()
print("prefill SWA max diff vs oracle:", d)
assert d < 0.1, d

# multi-page decode: kv_len spans 2 pages, window smaller than one page, so
# page 0 is fully masked for some lanes and page 1 partially.
kv_lens_mp = [300, 460, 280, 320, 1, 1, 1, 1]
tables_mp = [[0, 1], [2, 3], [4, 5], [6, 7], [8, 0], [9, 0], [10, 0], [11, 0]]
reqs = [dict(token_ids=[1], start=n - 1, kv_len=n,
             block_table=t[: -(-n // BLOCK)], temperature=1.0)
        for n, t in zip(kv_lens_mp, tables_mp)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=8,
                           num_seqs_bucket=8, max_blocks_per_seq=2,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta = meta_of(inputs)
ref, _, _ = ragged_paged_attention_ref(
    qw, knw, vnw, kc_w, vc_w, 0, meta, sm_scale=SM, window=64)
out, _, _ = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM, window=64)
)(qw, knw, vnw, kc_w, vc_w)
d = np.abs(np.asarray(out[:4], np.float32) - np.asarray(ref[:4], np.float32)).max()
print("decode SWA multi-page max diff vs oracle:", d)
assert d < 0.1, d
print("SWA FULL TPU PROBE PASS")

# ---- Gemma-3 shapes: Hkv=1, G=4, head_dim 256, runtime window scalar.
# Risk surface: single-sublane scale tiles [1, block], hd=2x128 lanes, and
# the windowed kernel variant with the window as scalar prefetch (one
# program serving local AND global layers).
GHKV, GHQ, GHD = 1, 4, 256
GSM = 256.0 ** -0.5
gkc = jnp.asarray(rng.standard_normal((2, GHKV, NB, BLOCK, GHD)), jnp.bfloat16)
gvc = jnp.asarray(rng.standard_normal((2, GHKV, NB, BLOCK, GHD)), jnp.bfloat16)
kv_lens = [700, 777, 900, 1000, 640, 513, 800, 1020]
reqs = []
nb0 = 0
for n in kv_lens:
    t = list(range(nb0, nb0 + -(-n // BLOCK)))
    nb0 += len(t)
    reqs.append(dict(token_ids=[1], start=n - 1, kv_len=n,
                     block_table=t, temperature=1.0))
W = 512  # gemma3-1b local window: leading pages drop from the worklist
kw = dict(block_size=BLOCK, num_tokens_bucket=8, num_seqs_bucket=8,
          max_blocks_per_seq=4, rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta_w = meta_of(build_step_inputs(reqs, window=W, **kw))
meta_full = meta_of(build_step_inputs(reqs, **kw))   # same shapes, full list
gq = jnp.asarray(rng.standard_normal((8, GHQ, GHD)), jnp.bfloat16)
gkn = jnp.asarray(rng.standard_normal((8, GHKV, GHD)), jnp.bfloat16)
gvn = jnp.asarray(rng.standard_normal((8, GHKV, GHD)), jnp.bfloat16)
ref, _, _ = ragged_paged_attention_ref(
    gq, gkn, gvn, gkc, gvc, 0, meta_w, sm_scale=GSM, window=W)
# The same compiled program must serve a local window and a global layer:
# the window and the worklist are traced operands, not constants.
f = jax.jit(lambda win, meta, *a: paged_decode_attention(
    *a, 0, meta, sm_scale=GSM, window=win))
out, _, _ = f(jnp.int32(W), meta_w, gq, gkn, gvn, gkc, gvc)
d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
print("gemma decode (windowed, Hkv=1, hd=256) max diff:", d)
assert d < 0.05, d
# Global layer through the SAME program: huge window, full worklist.
ref_nw, _, _ = ragged_paged_attention_ref(
    gq, gkn, gvn, gkc, gvc, 0, meta_full, sm_scale=GSM)
out2, _, _ = f(jnp.int32(1 << 30), meta_full, gq, gkn, gvn, gkc, gvc)
d2 = np.abs(np.asarray(out2, np.float32) - np.asarray(ref_nw, np.float32)).max()
print("gemma decode (same program, global layer) max diff:", d2)
assert d2 < 0.05, d2
assert f._cache_size() == 1, "window/worklist must not retrace"

# prefill, chunked continuation at gemma shapes with the window scalar
lens3 = [(0, 300), (512, 256)]
tables3 = [[30, 31], [32, 33, 34]]
reqs = [dict(token_ids=list(range(c)), start=s, kv_len=s + c,
             block_table=t, temperature=1.0)
        for (s, c), t in zip(lens3, tables3)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=768,
                           num_seqs_bucket=4, max_blocks_per_seq=3,
                           rng=np.zeros(2, np.uint32), q_tile=128, window=W)
meta = meta_of(inputs)
T = 768
gq = jnp.asarray(rng.standard_normal((T, GHQ, GHD)), jnp.bfloat16)
gkn = jnp.asarray(rng.standard_normal((T, GHKV, GHD)), jnp.bfloat16)
gvn = jnp.asarray(rng.standard_normal((T, GHKV, GHD)), jnp.bfloat16)
ref, _, _ = ragged_paged_attention_ref(
    gq, gkn, gvn, gkc, gvc, 0, meta, sm_scale=GSM, window=W)
out, _, _ = jax.jit(lambda win, *a: ragged_prefill_attention(
    *a, 0, meta, sm_scale=GSM, q_tile=128, window=win))(
    jnp.int32(W), gq, gkn, gvn, gkc, gvc)
live = np.asarray(inputs.seq_ids) < 4
d = np.abs(np.asarray(out, np.float32)[live]
           - np.asarray(ref, np.float32)[live]).max()
print("gemma prefill (windowed) max diff:", d)
assert d < 0.05, d

# int8-KV at Hkv=1: the [1, block] scale tiles are the tightest sublane case
gkc8 = (jnp.zeros((2, GHKV, NB, BLOCK, GHD), jnp.int8),
        jnp.zeros((2, NB, GHKV, BLOCK), jnp.float32))
gvc8 = (jnp.zeros((2, GHKV, NB, BLOCK, GHD), jnp.int8),
        jnp.zeros((2, NB, GHKV, BLOCK), jnp.float32))
ref, kr8, vr8 = ragged_paged_attention_ref(
    gq, gkn, gvn, gkc8, gvc8, 0, meta, sm_scale=GSM, window=W)
out, k8, v8 = jax.jit(lambda win, *a: ragged_prefill_attention(
    *a, 0, meta, sm_scale=GSM, q_tile=128, window=win))(
    jnp.int32(W), gq, gkn, gvn, gkc8, gvc8)
d = np.abs(np.asarray(out, np.float32)[live]
           - np.asarray(ref, np.float32)[live]).max()
print("gemma prefill int8-KV max diff:", d)
assert d < 0.07, d
print("GEMMA TPU PROBE PASS")

# ---- speculative verify mode: decode kernel with q_len = 4 -----------------
# Chunks of 4 rows per sequence (last token + 3 drafts): in-register causal
# new-row block, history mask at kv_len - q_len, multi-row write-back with a
# page-boundary spill (start 254 writes rows 254..257), and an append_lens=1
# (ineligible) lane whose draft rows are junk (row 0 compared only).
QL = 4
starts4 = [254, 2, 511, 300, 70]          # row-0 positions
appends4 = [4, 4, 4, 4, 1]
reqs = []
nb4 = 25
for s0 in starts4:
    pages = -(-(s0 + QL) // BLOCK)
    reqs.append(dict(token_ids=[1] * QL, start=s0, kv_len=s0 + QL,
                     block_table=list(range(nb4, nb4 + pages)),
                     temperature=1.0))
    nb4 += pages
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=8 * QL,
                           num_seqs_bucket=8, max_blocks_per_seq=3,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
smap = np.asarray(inputs.slot_mapping).copy()
al = np.zeros(8, np.int32)
for i, n in enumerate(appends4):
    al[i] = n
    smap[i * QL + n: (i + 1) * QL] = -1
inputs = inputs._replace(slot_mapping=smap)
meta = meta_of(inputs)._replace(append_lens=jnp.asarray(al))
q = jnp.asarray(rng.standard_normal((8 * QL, HQ, HD)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((8 * QL, HKV, HD)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((8 * QL, HKV, HD)), jnp.bfloat16)
ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
out, ko, vo = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM, q_len=QL)
)(q, kn, vn, kc, vc)
rows = [r for i, n in enumerate(appends4) for r in range(i * QL, i * QL + n)]
d = np.abs(np.asarray(out, np.float32)[rows]
           - np.asarray(ref, np.float32)[rows]).max()
print("decode spec q_len=4 max diff:", d)
assert d < 0.05, d
slots = smap
live = slots >= 0
kf = np.asarray(ko, np.float32)[0].reshape(HKV, -1, HD)
np.testing.assert_allclose(kf[:, slots[live]],
                           np.asarray(kn, np.float32)[live].transpose(1, 0, 2),
                           rtol=0, atol=1e-2)
print("spec multi-row write-back ok (incl. page spill)")

# int8-KV spec verify
ksc8 = (jnp.asarray(np.clip(rng.standard_normal((2, HKV, NB, BLOCK, HD)) * 40,
                            -127, 127), jnp.int8),
        jnp.asarray(rng.uniform(0.005, 0.02, (2, NB, HKV, BLOCK)), jnp.float32))
vsc8 = (jnp.asarray(np.clip(rng.standard_normal((2, HKV, NB, BLOCK, HD)) * 40,
                            -127, 127), jnp.int8),
        jnp.asarray(rng.uniform(0.005, 0.02, (2, NB, HKV, BLOCK)), jnp.float32))
ref, kr, vr = ragged_paged_attention_ref(q, kn, vn, ksc8, vsc8, 0, meta,
                                         sm_scale=SM)
out, ko, vo = jax.jit(
    lambda *a: paged_decode_attention(*a, 0, meta, sm_scale=SM, q_len=QL)
)(q, kn, vn, ksc8, vsc8)
d = np.abs(np.asarray(out, np.float32)[rows]
           - np.asarray(ref, np.float32)[rows]).max()
print("decode spec q_len=4 int8-kv max diff:", d)
assert d < 0.08, d
np.testing.assert_array_equal(
    np.asarray(ko[0])[0].reshape(HKV, -1, HD)[:, slots[live]],
    np.asarray(kr[0])[0].reshape(HKV, -1, HD)[:, slots[live]])
print("SPEC TPU PROBE PASS")
