"""Microbenchmark the decode attention kernel + full decode step on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp
from nanovllm_tpu.engine.inputs import build_step_inputs
from nanovllm_tpu.ops.attention import AttentionMeta
from nanovllm_tpu.ops.pallas.ragged_attention import GRP, paged_decode_attention

import os

BLOCK, HD, HKV, HQ, L = 256, 128, 8, 16, 28
SM = HD ** -0.5
S = 256
# Default kv length is bench-like and NOT a page multiple, so the
# partial-last-page rungs engage (KVLEN=768 measures the full-page path).
KVLEN = int(os.environ.get("KVLEN", 1100))

rng = np.random.default_rng(0)
NB = 408
kc = jnp.zeros((L, HKV, NB, BLOCK, HD), jnp.bfloat16)
vc = jnp.zeros((L, HKV, NB, BLOCK, HD), jnp.bfloat16)
print("pool GB:", kc.nbytes * 2 / 1e9, " kvlen:", KVLEN)

PAGES = -(-KVLEN // BLOCK)
reqs = [dict(token_ids=[1], start=KVLEN - 1, kv_len=KVLEN,
             block_table=[(PAGES * i + p) % 400 for p in range(PAGES)],
             temperature=1.0)
        for i in range(S)]
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=S,
                           num_seqs_bucket=S, max_blocks_per_seq=16,
                           rng=np.zeros(2, np.uint32), group_pairs=GRP)
meta = AttentionMeta(
    positions=inputs.positions, slot_mapping=inputs.slot_mapping,
    seq_ids=inputs.seq_ids, kv_lens=inputs.kv_lens,
    block_tables=inputs.block_tables, cu_q_lens=inputs.cu_q_lens,
    num_seqs=inputs.num_seqs, tile_seq=inputs.tile_seq,
    tile_pos0=inputs.tile_pos0, pair_tile=inputs.pair_tile,
    pair_page=inputs.pair_page)

q = jnp.asarray(rng.standard_normal((S, HQ, HD)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((S, HKV, HD)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((S, HKV, HD)), jnp.bfloat16)


def one_layer(q, kn, vn, kc, vc):
    o, kc, vc = paged_decode_attention(q, kn, vn, kc, vc, 0, meta, sm_scale=SM)
    return o, kc, vc


def scan_layers(q, kn, vn, kc, vc):
    def body(carry, _):
        kc, vc, i = carry
        o, kc, vc = paged_decode_attention(q, kn, vn, kc, vc, i, meta, sm_scale=SM)
        return (kc, vc, i + 1), o[0, 0, 0]
    (kc, vc, _), os = jax.lax.scan(body, (kc, vc, jnp.int32(0)), None, length=L)
    return os, kc, vc


f1 = jax.jit(one_layer, donate_argnums=(3, 4))
o, kc, vc = f1(q, kn, vn, kc, vc); jax.block_until_ready(o)
for _ in range(2):
    t = time.perf_counter()
    for _ in range(20):
        o, kc, vc = f1(q, kn, vn, kc, vc)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t) / 20
    pages = S * -(-KVLEN // BLOCK)
    gb = pages * (BLOCK * HKV * HD * 2 * 2) / 1e9
    print(f"1-layer decode attn: {dt*1e3:.3f} ms  ({gb:.3f} GB -> {gb/dt:.0f} GB/s)")

fL = jax.jit(scan_layers, donate_argnums=(3, 4))
os_, kc, vc = fL(q, kn, vn, kc, vc); jax.block_until_ready(os_)
for _ in range(2):
    t = time.perf_counter()
    for _ in range(5):
        os_, kc, vc = fL(q, kn, vn, kc, vc)
    jax.block_until_ready(os_)
    dt = (time.perf_counter() - t) / 5
    print(f"28-layer decode attn: {dt*1e3:.2f} ms ({dt*1e3/L:.3f} ms/layer)")
