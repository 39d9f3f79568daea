"""Time one full decode step and one prefill step through the ModelRunner."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.testing import QWEN3_0_6B, make_qwen3_dir

d = make_qwen3_dir("/tmp/qwen3-0.6b-bench", QWEN3_0_6B)
import os
config = Config(d, max_model_len=4096, max_num_seqs=256,
                kv_cache_dtype=os.environ.get("KV", "auto"),
                quantization=os.environ.get("QUANT") or None)
runner = ModelRunner(config, random_weights=True)
print("num blocks:", config.num_kvcache_blocks)

Sequence.block_size = config.kvcache_block_size
KVLEN = 768
sp = SamplingParams(temperature=1.0, max_tokens=8, ignore_eos=True)

def mk_seqs(n, kv_len):
    seqs = []
    pages = -(-kv_len // 256)
    for i in range(n):
        s = Sequence(list(np.random.randint(2, 400, kv_len)), sp)
        s.num_cached_tokens = kv_len - 1
        s.num_scheduled_tokens = 1
        s.block_table = [(pages * i + p) % config.num_kvcache_blocks
                         for p in range(pages)]
        seqs.append(s)
    return seqs

for live in (64, 256):
    seqs = mk_seqs(live, KVLEN)
    import jax
    runner.run(seqs, False)  # warm bucket
    jax.block_until_ready(runner.kv)
    t = time.perf_counter()
    N = 10
    for _ in range(N):
        runner.run(seqs, False)
    jax.block_until_ready(runner.kv)  # run() is async: wait for the device
    dt = (time.perf_counter() - t) / N
    kv_gb = live * (-(-KVLEN // 256)) * (256 * 8 * 128 * 2 * 2) * 28 / 1e9
    print(f"decode live={live} kv={KVLEN}: {dt*1e3:.2f} ms/step, "
          f"{live/dt:.0f} tok/s, kv traffic {kv_gb:.1f} GB -> {kv_gb/dt:.0f} GB/s")

# prefill step: 8 seqs x 2048 tokens = 16384
seqs = []
for i in range(8):
    s = Sequence(list(np.random.randint(2, 400, 2048)), sp)
    s.num_scheduled_tokens = 2048
    s.block_table = [(8 * i + p) % config.num_kvcache_blocks for p in range(8)]
    seqs.append(s)
import jax
runner.run(seqs, True)
jax.block_until_ready(runner.kv)
t = time.perf_counter()
for _ in range(5):
    runner.run(seqs, True)
jax.block_until_ready(runner.kv)
dt = (time.perf_counter() - t) / 5
print(f"prefill 16384 tok: {dt*1e3:.1f} ms/step, {16384/dt:.0f} tok/s")
