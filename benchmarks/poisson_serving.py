"""Mixed prefill+decode serving measurement (VERDICT r3 #8 / ROADMAP #5).

The offline bench runs prefill-priority FCFS: admissions and decode alternate
in large phases, so it cannot say what a decode token's latency looks like
WHILE prompts are being admitted. This script drives the engine with a
Poisson arrival trace (the online regime) and records, per request, the
gaps between its token deliveries — the stall a streaming user would see
when other requests' chunked prefills preempt decode steps.

Decision it feeds (benchmarks/README): if p99 inter-delivery gap during
admissions stays within ~a fetch interval of the idle-decode gap, the
scheduler's pure prefill-priority design (reference parity) is fine and
piggybacking decodes onto prefill steps (mixed batches) isn't worth its
compiled-shape cost; otherwise implement the piggyback.

Run on the chip:  python benchmarks/poisson_serving.py --rate 8 --seconds 60
(rate: requests/s; offline headline sustains ~14 req/s at the bench mix).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=8.0, help="arrivals/s")
    ap.add_argument("--seconds", type=float, default=60.0,
                    help="arrival-window length")
    ap.add_argument("--fetch-interval", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-arch CPU self-test of the harness")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nanovllm_tpu.engine.llm_engine import LLMEngine
    from nanovllm_tpu.sampling_params import SamplingParams
    from nanovllm_tpu.utils.testing import (QWEN3_0_6B, QWEN3_TINY,
                                            make_qwen3_dir)

    arch = QWEN3_TINY if args.cpu else QWEN3_0_6B
    d = make_qwen3_dir("/tmp/qwen3-poisson", arch)
    small = dict(max_num_batched_tokens=512, num_kvcache_blocks=256,
                 kvcache_block_size=16) if args.cpu else {}
    engine = LLMEngine(
        d, max_model_len=4096, max_num_seqs=256,
        quantization=None if args.cpu else "int8",
        kv_cache_dtype="int8",
        fetch_interval=args.fetch_interval,
        random_weights=True, **small,
    )

    rng = np.random.default_rng(args.seed)
    min_len = max(1, args.max_len // 10)
    n_req = max(1, int(args.rate * args.seconds))
    arrivals = np.cumsum(rng.exponential(1.0 / args.rate, n_req))
    prompts = [rng.integers(0, 10000, size=int(
        rng.integers(min_len, args.max_len))).tolist() for _ in range(n_req)]
    outs = [int(rng.integers(min_len, args.max_len)) for _ in range(n_req)]
    if args.cpu:  # shrink the self-test
        prompts = [p[:32] for p in prompts[:12]]
        outs = [min(o, 24) for o in outs[:12]]
        arrivals = arrivals[:12] / 10
        n_req = 12

    # Warm every bucket off the clock (the server does this at startup).
    engine.generate([[1, 2, 3]], SamplingParams(max_tokens=8,
                                                ignore_eos=True),
                    use_tqdm=False)
    from nanovllm_tpu.utils.metrics import EngineMetrics

    engine.metrics = EngineMetrics()

    seqs = {}
    deliveries = {}         # seq_id -> [wall time of each valued-token batch]
    delivered = {}          # seq_id -> valued-token watermark
    t0 = time.perf_counter()
    next_arrival = 0
    admitted_during = []    # (wall, n_prefill_tokens) per prefill dispatch
    while next_arrival < n_req or not engine.is_finished():
        now = time.perf_counter() - t0
        while next_arrival < n_req and arrivals[next_arrival] <= now:
            i = next_arrival
            sp = SamplingParams(temperature=0.6, max_tokens=outs[i],
                                ignore_eos=True)
            seq = engine.add_request(prompts[i], sp)
            seqs[seq.seq_id] = seq
            deliveries[seq.seq_id] = [now]  # arrival anchors the first gap
            delivered[seq.seq_id] = 0
            next_arrival += 1
        if next_arrival < n_req and engine.is_finished():
            # Idle gap before the next arrival: sleep to it.
            time.sleep(max(0.0, arrivals[next_arrival] -
                           (time.perf_counter() - t0)))
            continue
        _, num_tokens = engine.step()
        if num_tokens > 0:
            admitted_during.append((time.perf_counter() - t0, num_tokens))
        now = time.perf_counter() - t0
        for sid, seq in seqs.items():
            got = seq.num_valued_tokens - seq.num_prompt_tokens
            if got > delivered[sid]:
                delivered[sid] = got
                deliveries[sid].append(now)

    wall = time.perf_counter() - t0
    # Inter-delivery gaps per request, excluding the arrival->first-token gap
    # (that's TTFT, reported separately by the engine metrics).
    gaps = []
    for sid, ts in deliveries.items():
        gaps.extend(b - a for a, b in zip(ts[1:], ts[2:]))
    gaps = np.asarray(gaps) if gaps else np.asarray([0.0])
    m = engine.metrics.summary()
    print(json.dumps(dict(
        rate_req_s=args.rate, requests=n_req, wall_s=round(wall, 2),
        output_tok_s=round(sum(outs) / wall, 1),
        decode_tok_per_s=m.get("decode_tok_per_s"),
        ttft_p50_s=m.get("ttft_p50_s"), ttft_p99_s=m.get("ttft_p99_s"),
        delivery_gap_p50_s=round(float(np.percentile(gaps, 50)), 4),
        delivery_gap_p99_s=round(float(np.percentile(gaps, 99)), 4),
        delivery_gap_max_s=round(float(gaps.max()), 4),
        prefill_dispatches=len(admitted_during),
        fetch_interval=args.fetch_interval,
    )))


if __name__ == "__main__":
    main()
