"""Serving metrics: TTFT, per-step throughput, token accounting.

Beyond-reference observability (the reference only shows live tok/s in a tqdm
postfix, llm_engine.py:76-83; SURVEY.md §5 calls for structured per-step
metrics — the BASELINE target metric is output tok/s/chip + p50 TTFT).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from time import perf_counter


def _percentile(xs: list[float], p: float) -> float:
    if not xs:
        return float("nan")
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, round(p / 100 * (len(xs) - 1))))
    return xs[i]


@dataclass
class EngineMetrics:
    """Accumulated over one engine lifetime; cheap to update per step."""

    ttfts: list[float] = field(default_factory=list)          # s, per request
    e2e_latencies: list[float] = field(default_factory=list)  # s, per request
    prefill_tokens: int = 0
    decode_tokens: int = 0
    prefill_time: float = 0.0   # s in prefill steps
    decode_time: float = 0.0    # s in decode steps
    num_prefill_steps: int = 0
    num_decode_steps: int = 0
    start_time: float = field(default_factory=perf_counter)

    def record_step(self, num_tokens: int, dt: float):
        """num_tokens: signed step size (+prefill tokens / -decode batch)."""
        if num_tokens > 0:
            self.prefill_tokens += num_tokens
            self.prefill_time += dt
            self.num_prefill_steps += 1
        else:
            self.decode_tokens += -num_tokens
            self.decode_time += dt
            self.num_decode_steps += 1

    def record_first_token(self, arrival_time: float):
        self.ttfts.append(perf_counter() - arrival_time)

    def record_finished(self, arrival_time: float):
        self.e2e_latencies.append(perf_counter() - arrival_time)

    def summary(self) -> dict:
        wall = perf_counter() - self.start_time
        return {
            "wall_s": round(wall, 3),
            "requests_finished": len(self.e2e_latencies),
            "prefill_tokens": self.prefill_tokens,
            "decode_tokens": self.decode_tokens,
            "prefill_tok_per_s": round(
                self.prefill_tokens / self.prefill_time, 1
            ) if self.prefill_time else 0.0,
            "decode_tok_per_s": round(
                self.decode_tokens / self.decode_time, 1
            ) if self.decode_time else 0.0,
            "output_tok_per_s": round(self.decode_tokens / wall, 1) if wall else 0.0,
            "ttft_p50_s": round(_percentile(self.ttfts, 50), 4),
            "ttft_p99_s": round(_percentile(self.ttfts, 99), 4),
            "e2e_p50_s": round(_percentile(self.e2e_latencies, 50), 4),
            "num_prefill_steps": self.num_prefill_steps,
            "num_decode_steps": self.num_decode_steps,
        }
