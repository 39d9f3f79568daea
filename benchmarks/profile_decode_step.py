"""xplane profile of bench-shaped decode steps: where does the time go?

Writes a trace with jax.profiler, then parses the xplane.pb and prints
per-op device time aggregated by op name (the evidence VERDICT r1 asked for
behind decode-roofline claims). Run on the real chip from the repo root.

Env: KV (auto|int8), QUANT (int8|int4|none), LIVE (decode batch), KVLEN.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os
from collections import defaultdict

import numpy as np

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.testing import QWEN3_0_6B, make_qwen3_dir

d = make_qwen3_dir("/tmp/qwen3-0.6b-bench", QWEN3_0_6B)
config = Config(d, max_model_len=4096, max_num_seqs=256,
                kv_cache_dtype=os.environ.get("KV", "int8"),
                quantization=os.environ.get("QUANT", "int8") or None,
                # SPEC_K > 0 profiles the PLAIN decode variant of a spec
                # build (adds the per-step history-slab maintenance).
                spec_k=int(os.environ.get("SPEC_K", "0")))
runner = ModelRunner(config, random_weights=True)

Sequence.block_size = config.kvcache_block_size
LIVE = int(os.environ.get("LIVE", 160))
KVLEN = int(os.environ.get("KVLEN", 1100))
sp = SamplingParams(temperature=1.0, max_tokens=8, ignore_eos=True)

pages = -(-KVLEN // config.kvcache_block_size)
seqs = []
for i in range(LIVE):
    s = Sequence(list(np.random.randint(2, 400, KVLEN)), sp)
    s.num_cached_tokens = KVLEN - 1
    s.num_scheduled_tokens = 1
    s.device_slot = i
    s.block_table = [(pages * i + p) % config.num_kvcache_blocks
                     for p in range(pages)]
    seqs.append(s)

import jax

runner.run(seqs, False)  # compile/warm the bucket
jax.block_until_ready(runner.kv)

trace_dir = "/tmp/nanovllm_decode_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        runner.run(seqs, False)
    jax.block_until_ready(runner.kv)

# ---- parse the xplane
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
            name = plane.event_metadata[ev.metadata_id].name
            tot[name] += ev.duration_ps
    entries = sorted(tot.items(), key=lambda kv: -kv[1])[:18]
    total_ms = sum(tot.values()) / 1e9
    print(f"== plane {plane.name}: total device {total_ms:.2f} ms over 5 steps")
    for name, ps in entries:
        print(f"  {ps/1e9:8.3f} ms  {name[:100]}")
