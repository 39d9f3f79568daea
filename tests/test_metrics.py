"""EngineMetrics: device-true phase attribution under the async pipeline.

VERDICT r1 found the previous metrics reported dispatch time as phase time
(prefill at 2.3M tok/s); these tests pin the new drain-interval semantics:
phase throughput x phase time must reproduce the token counts, and interval
wall time must land in the phases of the steps it covers.
"""

import time

from nanovllm_tpu.utils.metrics import EngineMetrics


def test_phase_rates_are_self_consistent():
    m = EngineMetrics()
    # Interval 1: two prefill steps, ~50ms of "device" time.
    m.record_dispatch(4096)
    m.record_dispatch(2048)
    time.sleep(0.05)
    times = m.record_drain()
    assert len(times) == 2
    # Interval 2: three decode steps of 256 seqs, ~30ms.
    for _ in range(3):
        m.record_dispatch(-256)
    time.sleep(0.03)
    m.record_drain()

    s = m.summary()
    assert s["prefill_tokens"] == 6144
    assert s["decode_tokens"] == 768
    assert m.prefill_time >= 0.05
    assert m.decode_time >= 0.03
    # The published rates must reproduce the counted tokens exactly.
    assert abs(s["prefill_tok_per_s"] * m.prefill_time - 6144) < 64
    assert abs(s["decode_tok_per_s"] * m.decode_time - 768) < 8
    assert s["num_prefill_steps"] == 2
    assert s["num_decode_steps"] == 3


def test_mixed_interval_splits_by_token_weight():
    m = EngineMetrics()
    m.record_dispatch(900)   # prefill
    m.record_dispatch(-100)  # decode
    time.sleep(0.02)
    m.record_drain()
    total = m.prefill_time + m.decode_time
    assert total >= 0.02
    assert abs(m.prefill_time / total - 0.9) < 1e-6
    assert abs(m.decode_time / total - 0.1) < 1e-6


def test_completion_times_interpolate_in_order():
    m = EngineMetrics()
    t0 = time.perf_counter()
    for n in (-8, -8, -8):
        m.record_dispatch(n)
    time.sleep(0.03)
    times = m.record_drain()
    t1 = time.perf_counter()
    assert times == sorted(times)
    assert t0 <= times[0] and times[-1] <= t1
    # TTFT measured against an arrival before the interval is positive and
    # bounded by the interval end.
    m.record_first_token(t0, times[0])
    assert 0 < m.ttfts[0] <= t1 - t0


def test_empty_drain_is_noop():
    m = EngineMetrics()
    assert m.record_drain() == []
    assert m.prefill_time == 0.0 and m.decode_time == 0.0


def test_interval_starts_at_first_dispatch_not_engine_start():
    m = EngineMetrics()
    time.sleep(0.03)  # idle gap must not count as phase time
    m.record_dispatch(-8)
    time.sleep(0.01)
    m.record_drain()
    assert m.decode_time < 0.03
