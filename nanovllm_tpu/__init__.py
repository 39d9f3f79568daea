"""nanovllm-tpu: a TPU-native LLM inference engine.

Capability parity with nano-vLLM (reference: /root/reference, see SURVEY.md),
re-designed TPU-first: JAX/XLA/Pallas compute path, single-controller engine,
paged KV cache with hash-chained prefix caching, continuous batching with
chunked prefill, bucketed jit step functions instead of CUDA graphs, and
GSPMD tensor parallelism over a device mesh.

Public API mirrors the reference (nanovllm/__init__.py:1-2):
    from nanovllm_tpu import LLM, SamplingParams
"""

from nanovllm_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = ["LLM", "SamplingParams", "__version__"]


def __getattr__(name):
    # Lazy import: keep `import nanovllm_tpu` light (no jax) for host-only use.
    if name == "LLM":
        from nanovllm_tpu.llm import LLM

        return LLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
