"""Serving metrics: TTFT, per-phase throughput, token accounting.

Beyond-reference observability (the reference only shows live tok/s in a tqdm
postfix, llm_engine.py:76-83; SURVEY.md §5 calls for structured per-step
metrics — the BASELINE target metric is output tok/s/chip + p50 TTFT).

Honest timing under the async pipeline: dispatching a step returns before the
device executes it, so per-dispatch timestamps measure host overhead only.
Instead, each ring drain (a device->host fetch that blocks until every
dispatched step has executed) closes a measurement interval: the wall time
from the interval's first dispatch to the drain is device-true time for
exactly the steps dispatched inside it, and is attributed to the prefill /
decode phases in proportion to their dispatched token counts (an interval is
usually single-phase under prefill-priority scheduling; mixed intervals are
split approximately). Per-step completion timestamps (for TTFT / e2e
latency) are interpolated across the interval by cumulative token weight.
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
    prefill_time: float = 0.0   # s of drained (device-true) prefill work
    decode_time: float = 0.0    # s of drained (device-true) decode work
    num_prefill_steps: int = 0
    num_decode_steps: int = 0
    # Speculative decoding (spec_k > 0): drafts offered vs accepted across
    # spec decode rows (acceptance rate = accepted / drafted).
    spec_drafted: int = 0
    spec_accepted: int = 0
    # Free-form gauges merged into summary() (e.g. prefix-cache hit counts,
    # refreshed by the engine before reporting).
    extra: dict = field(default_factory=dict)
    start_time: float = field(default_factory=perf_counter)
    # Open measurement interval: signed token counts of dispatched,
    # not-yet-drained steps (+prefill tokens / -decode batch size), and the
    # timestamp of the interval's first dispatch.
    _interval_steps: list[int] = field(default_factory=list)
    _interval_start: float | None = None

    def record_dispatch(self, num_tokens: int):
        """num_tokens: signed step size (+prefill tokens / -decode batch)."""
        if self._interval_start is None:
            self._interval_start = perf_counter()
        self._interval_steps.append(num_tokens)
        if num_tokens > 0:
            self.prefill_tokens += num_tokens
            self.num_prefill_steps += 1
        else:
            self.decode_tokens += -num_tokens
            self.num_decode_steps += 1

    def record_drain(self) -> list[float]:
        """Close the open interval (call right after the blocking ring fetch).
        Returns the estimated completion timestamp of each step in the
        interval (ring-row order), for TTFT / e2e attribution."""
        steps = self._interval_steps
        if not steps:
            return []
        t1 = perf_counter()
        t0 = self._interval_start
        dt = max(t1 - t0, 0.0)
        weights = [abs(n) for n in steps]
        total_w = sum(weights) or len(steps)
        p_tok = sum(n for n in steps if n > 0)
        d_tok = sum(-n for n in steps if n < 0)
        self.prefill_time += dt * (p_tok / (p_tok + d_tok)) if p_tok else 0.0
        self.decode_time += dt * (d_tok / (p_tok + d_tok)) if d_tok else 0.0
        times, acc = [], 0.0
        for w in weights:
            acc += w if total_w else 1.0
            times.append(t0 + dt * acc / total_w)
        self._interval_steps = []
        self._interval_start = None
        return times

    def record_first_token(self, arrival_time: float, done_time: float):
        self.ttfts.append(done_time - arrival_time)

    def record_finished(self, arrival_time: float, done_time: float):
        self.e2e_latencies.append(done_time - arrival_time)

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
            **(
                {
                    "spec_drafted": self.spec_drafted,
                    "spec_accepted": self.spec_accepted,
                    "spec_acceptance": round(
                        self.spec_accepted / self.spec_drafted, 4
                    ),
                }
                if self.spec_drafted else {}
            ),
            **self.extra,
        }
