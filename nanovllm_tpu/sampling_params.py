"""Per-request sampling parameters.

Parity: reference ``nanovllm/sampling_params.py`` (fields temperature,
max_tokens, ignore_eos). Difference: the reference *forbids* greedy decoding
(asserts temperature > 1e-10, sampling_params.py:11); we explicitly support
``temperature == 0.0`` as greedy argmax, which the TPU sampler handles in the
same fused device computation.
"""

from dataclasses import dataclass


@dataclass(slots=True)
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False

    def __post_init__(self):
        assert self.temperature >= 0.0, "temperature must be non-negative"
        assert self.max_tokens >= 1, "max_tokens must be at least 1"
