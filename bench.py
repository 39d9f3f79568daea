"""Offline throughput benchmark (reference bench.py parity).

Trace: 256 sequences, input lengths ~U(100,1024), output lengths ~U(100,1024),
seed 0, ignore_eos, throughput = sum(max_tokens) / wall-clock
(reference bench.py:9-28; baseline 1434.13 output tok/s, README.md:61).

Runs Qwen3-0.6B architecture with random weights (no checkpoints in this
environment; throughput does not depend on weight values). Prints ONE JSON
line with the result.

Env overrides: BENCH_NUM_SEQS, BENCH_MAX_LEN, BENCH_MODEL (a real HF model
dir, loads actual weights), BENCH_TP.
"""

import json
import os
import time

import numpy as np


def main():
    if os.environ.get("NANOVLLM_PLATFORM"):
        # Pin the backend (the tunnel's sitecustomize ignores JAX_PLATFORMS);
        # "cpu" lets the CI smoke run the full bench flow on tiny shapes.
        import jax

        jax.config.update("jax_platforms", os.environ["NANOVLLM_PLATFORM"])
    num_seqs = int(os.environ.get("BENCH_NUM_SEQS", 256))
    max_len = int(os.environ.get("BENCH_MAX_LEN", 1024))
    min_len = max(1, max_len // 10)
    tp = int(os.environ.get("BENCH_TP", 1))
    # BASELINE.md target config: Qwen3-0.6B INT8 weights on 1 chip.
    quant = os.environ.get("BENCH_QUANT", "int8")
    quant = None if quant in ("", "none", "bf16") else quant
    kv_dtype = os.environ.get("BENCH_KV_DTYPE", "int8")
    fetch_interval = int(os.environ.get("BENCH_FETCH_INTERVAL", 64))
    block = int(os.environ.get("BENCH_BLOCK", 256))
    hbm_util = float(os.environ.get("BENCH_HBM_UTIL", 0.9))
    # Speculative decoding (ngram prompt-lookup): 0 disables. Random-weight
    # sampled runs accept ~nothing (the overhead measurement); BENCH_GREEDY=1
    # makes the trace greedy — random-weight greedy decode falls into
    # repetition cycles that ngram drafting predicts, the high-acceptance
    # regime.
    spec_k = int(os.environ.get("BENCH_SPEC_K", 0))
    greedy = os.environ.get("BENCH_GREEDY", "") == "1"

    from nanovllm_tpu import LLM, SamplingParams

    model_dir = os.environ.get("BENCH_MODEL")
    random_weights = model_dir is None
    if random_weights:
        from nanovllm_tpu.utils.testing import (
            GEMMA3_1B, MISTRAL_7B, QWEN2_72B, QWEN3_0_6B, QWEN3_8B,
            QWEN3_30B_A3B, QWEN3_32B, QWEN3_MOE_MINI, QWEN3_TINY,
            make_qwen3_dir)

        arch = os.environ.get("BENCH_ARCH", "0.6b")
        cfgs = {"0.6b": QWEN3_0_6B, "8b": QWEN3_8B, "32b": QWEN3_32B,
                "72b": QWEN2_72B, "30b-a3b": QWEN3_30B_A3B,
                "moe-mini": QWEN3_MOE_MINI, "mistral-7b": MISTRAL_7B,
                "gemma3-1b": GEMMA3_1B, "tiny": QWEN3_TINY}
        model_dir = make_qwen3_dir(f"/tmp/qwen3-{arch}-bench", cfgs[arch])

    llm = LLM(
        model_dir,
        random_weights=random_weights,
        max_model_len=int(os.environ.get("BENCH_MAX_MODEL_LEN", 4096)),
        max_num_seqs=min(512, max(num_seqs, 8)),
        tensor_parallel_size=tp,
        quantization=quant,
        kv_cache_dtype=kv_dtype,
        fetch_interval=fetch_interval,
        kvcache_block_size=block,
        hbm_utilization=hbm_util,
        spec_k=spec_k,
    )

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, 10000, size=int(rng.integers(min_len, max_len))).tolist()
        for _ in range(num_seqs)
    ]
    sampling_params = [
        SamplingParams(
            temperature=0.0 if greedy else 0.6,
            ignore_eos=True,
            max_tokens=int(rng.integers(min_len, max_len)),
        )
        for _ in range(num_seqs)
    ]
    # Warmup: compiles every shape bucket off the clock (the reference's
    # warmup generate, bench.py:22).
    llm.generate(
        ["warmup"], SamplingParams(max_tokens=8, ignore_eos=True), use_tqdm=False
    )

    from nanovllm_tpu.utils.metrics import EngineMetrics

    llm.metrics = EngineMetrics()  # reset after warmup
    t = time.time()
    llm.generate(prompts, sampling_params, use_tqdm=True)
    elapsed = time.time() - t
    total_tokens = sum(sp.max_tokens for sp in sampling_params)
    throughput = total_tokens / elapsed

    import sys

    print("metrics:", llm.metrics.summary(), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "offline_output_throughput",
                "value": round(throughput, 2),
                "unit": "tok/s",
                "vs_baseline": round(throughput / 1434.13, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
