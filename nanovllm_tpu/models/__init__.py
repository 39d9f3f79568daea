"""Model registry: maps HF ``model_type`` to a model-family module.

Each family module exposes:
- ``spec_from_hf(hf_config) -> Spec`` (static architecture description)
- ``forward(spec, params, kv, inputs, ...) -> (hidden, new_kv)``
- ``hf_param_plan(spec, tp) -> plan`` consumed by ``utils.loader``
- ``device_init_params(spec, seed, dtype, quant=, tp=, shardings=)``
  on-device random init in storage dtype (benchmarks without downloaded
  weights); ``init_params`` is the host-side equivalent
"""

from nanovllm_tpu.models import qwen3

_REGISTRY = {
    "qwen3": qwen3,
    "qwen2": qwen3,   # same decoder family: qkv bias, no qk-norm (spec flags)
    "llama": qwen3,   # same decoder family: no bias, no qk-norm (spec flags)
    "qwen3_moe": qwen3,  # sparse-MoE FFN via spec flags (ragged_dot dispatch)
    "mistral": qwen3,  # llama-style decoder + sliding-window attention
    # Gemma-3 text: GeGLU, sandwich/(1+w) norms, sqrt(D) embed scale,
    # 5-local:1-global window interleave with dual rope (spec flags).
    "gemma3_text": qwen3,
}


def get_model_family(hf_config):
    model_type = getattr(hf_config, "model_type", None)
    if model_type not in _REGISTRY:
        raise ValueError(
            f"unsupported model_type {model_type!r}; supported: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[model_type]
