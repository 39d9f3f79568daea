"""vLLM-compatible entry point name.

Parity: reference ``nanovllm/llm.py:4-5`` (``class LLM(LLMEngine)``).
"""

from nanovllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
