"""Microbenchmark the ragged prefill attention kernel on TPU.

Bench-like shape: ~25 seqs of 560 tokens packed into one 14k-token step
(0.6B arch dims, int8 KV). The r4 xplane profile measured the kernel at
~26% of prefill step time and ~8.8 us/pair vs ~1.4 us of MXU-ideal dot time
— VPU passes over the [Hkv, M, block] score tensor dominate. This harness
times the kernel in isolation so pass-elimination changes can be A/B'd
without a full bench run.

Env: SEQLEN (560), NSEQ (25), QTILE (128), KV (int8|bf16).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np
import jax, jax.numpy as jnp

from nanovllm_tpu.engine.inputs import build_step_inputs
from nanovllm_tpu.ops.attention import AttentionMeta
from nanovllm_tpu.ops.pallas.ragged_attention import ragged_prefill_attention

BLOCK, HD, HKV, HQ, L = 256, 128, 8, 16, 28
SM = HD ** -0.5
SEQLEN = int(os.environ.get("SEQLEN", 560))
NSEQ = int(os.environ.get("NSEQ", 25))
QTILE = int(os.environ.get("QTILE", 128))
KV = os.environ.get("KV", "int8")

rng = np.random.default_rng(0)
NB = 408
if KV == "int8":
    kc = (jnp.zeros((L, HKV, NB, BLOCK, HD), jnp.int8),
          jnp.ones((L, NB, HKV, BLOCK), jnp.float32))
    vc = (jnp.zeros((L, HKV, NB, BLOCK, HD), jnp.int8),
          jnp.ones((L, NB, HKV, BLOCK), jnp.float32))
else:
    kc = jnp.zeros((L, HKV, NB, BLOCK, HD), jnp.bfloat16)
    vc = jnp.zeros((L, HKV, NB, BLOCK, HD), jnp.bfloat16)

PAGES = -(-SEQLEN // BLOCK)
reqs = [dict(token_ids=[1] * SEQLEN, start=0, kv_len=SEQLEN,
             block_table=[(PAGES * i + p) % 400 for p in range(PAGES)],
             temperature=1.0)
        for i in range(NSEQ)]
ntok = sum(-(-SEQLEN // QTILE) * QTILE for _ in range(NSEQ))
inputs = build_step_inputs(reqs, block_size=BLOCK, num_tokens_bucket=ntok,
                           num_seqs_bucket=NSEQ, max_blocks_per_seq=16,
                           rng=np.zeros(2, np.uint32), q_tile=QTILE)
meta = AttentionMeta(
    positions=inputs.positions, slot_mapping=inputs.slot_mapping,
    seq_ids=inputs.seq_ids, kv_lens=inputs.kv_lens,
    block_tables=inputs.block_tables, cu_q_lens=inputs.cu_q_lens,
    num_seqs=inputs.num_seqs, tile_seq=inputs.tile_seq,
    tile_pos0=inputs.tile_pos0, pair_tile=inputs.pair_tile,
    pair_page=inputs.pair_page)
n_pairs = int(np.sum(np.asarray(inputs.pair_tile) < inputs.tile_seq.shape[0]))
T = inputs.tile_seq.shape[0] * QTILE
print(f"tokens={T} tiles={inputs.tile_seq.shape[0]} live_pairs={n_pairs} "
      f"bucket_pairs={inputs.pair_tile.shape[0]}")

q = jnp.asarray(rng.standard_normal((T, HQ, HD)), jnp.float32)
kn = jnp.asarray(rng.standard_normal((T, HKV, HD)), jnp.float32)
vn = jnp.asarray(rng.standard_normal((T, HKV, HD)), jnp.float32)


def one_layer(q, kn, vn, kc, vc):
    o, kc, vc = ragged_prefill_attention(
        q, kn, vn, kc, vc, 0, meta, sm_scale=SM, q_tile=QTILE)
    return o, kc, vc


f1 = jax.jit(one_layer, donate_argnums=(3, 4))
o, kc, vc = f1(q, kn, vn, kc, vc); jax.block_until_ready(o)
# Wall-clock through the tunnel reports IMPOSSIBLE numbers
# (block_until_ready does not reliably wait here — see CLAUDE.md); the
# xplane trace's device time for the kernel op is the only trustworthy
# measure.
import glob
from collections import defaultdict

N = 5  # 20 chained donated iterations under the tunnel profiler hung once
trace_dir = "/tmp/nanovllm_prefill_kernel_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(N):
        o, kc, vc = f1(q, kn, vn, kc, vc)
    jax.block_until_ready(o)

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
assert paths, f"no xplane under {trace_dir}"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    tot = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            tot[plane.event_metadata[ev.metadata_id].name] += ev.duration_ps
    kern = sum(ps for nm, ps in tot.items()
               if "closed_call" in nm or "custom-call" in nm)
    step = sum(ps for nm, ps in tot.items() if nm.startswith("jit_"))
    dt = kern / 1e12 / N
    print(f"kernel device time: {dt*1e3:.3f} ms/layer "
          f"({dt*1e6/max(n_pairs,1):.2f} us/pair; x{L} layers -> "
          f"{dt*1e3*L:.1f} ms/step); jit total {step/1e12/N*1e3:.3f} ms")
    for nm, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:6]:
        print(f"  {ps/1e9/N:8.3f} ms  {nm[:90]}")
