"""xplane profile of a bench-shaped prefill step (16384-token bucket).

Prefill measured ~35k tok/s at the r2 bench = ~8% of the chip's bf16 MXU
peak for the 0.6B model — this script shows where the time goes.
Env: KV, QUANT as profile_decode_step.py; TOKENS (default 14000).
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
                quantization=os.environ.get("QUANT", "int8") or None)
runner = ModelRunner(config, random_weights=True)

Sequence.block_size = config.kvcache_block_size
TOKENS = int(os.environ.get("TOKENS", 14000))
sp = SamplingParams(temperature=1.0, max_tokens=8, ignore_eos=True)

# ~25 seqs of 560 tokens ~ the bench prefill mix, packed into one step.
seq_len = 560
n = TOKENS // seq_len
pages = -(-seq_len // config.kvcache_block_size)
seqs = []
for i in range(n):
    s = Sequence(list(np.random.randint(2, 400, seq_len)), sp)
    s.num_cached_tokens = 0
    s.num_scheduled_tokens = seq_len
    s.device_slot = i
    s.block_table = [(pages * i + p) % config.num_kvcache_blocks
                     for p in range(pages)]
    seqs.append(s)

import jax

runner.run(seqs, True)
jax.block_until_ready(runner.kv)

trace_dir = "/tmp/nanovllm_prefill_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        runner.run(seqs, True)
    jax.block_until_ready(runner.kv)

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    tot = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            tot[name] += ev.duration_ps
    total_ms = sum(tot.values()) / 1e9
    print(f"== plane {plane.name}: {total_ms:.2f} ms summed over 3 steps "
          f"({n * seq_len} tokens each)")
    for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {ps/1e9:8.3f} ms  {name[:110]}")
