"""Minimal usage example (reference example.py parity).

With a real checkpoint: ``python example.py /path/to/Qwen3-0.6B``.
Without arguments it synthesizes a tiny random model so the flow runs
anywhere (output text is gibberish but demonstrates the API).
"""

import os
import sys

if os.environ.get("NANOVLLM_PLATFORM"):
    # The tunnel's sitecustomize overrides JAX_PLATFORMS at startup; this
    # knob pins the backend (e.g. "cpu" for CI smokes) via jax.config.
    import jax

    jax.config.update("jax_platforms", os.environ["NANOVLLM_PLATFORM"])

from nanovllm_tpu import LLM, SamplingParams


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
        llm = LLM(path, enforce_eager=True)
        tokenizer = llm.tokenizer
        prompts = ["introduce yourself", "list all prime numbers within 20"]
        if tokenizer.chat_template:
            prompts = [
                tokenizer.apply_chat_template(
                    [{"role": "user", "content": p}],
                    tokenize=False,
                    add_generation_prompt=True,
                    enable_thinking=True,
                )
                for p in prompts
            ]
    else:
        from nanovllm_tpu.utils.testing import QWEN3_TINY, make_qwen3_dir

        path = make_qwen3_dir("/tmp/qwen3-tiny-example", QWEN3_TINY)
        llm = LLM(
            path,
            random_weights=True,
            max_model_len=256,
            max_num_batched_tokens=256,
            enforce_eager=True,
        )
        prompts = ["hello world", "tell me a story"]

    sampling_params = SamplingParams(temperature=0.6, max_tokens=64)
    outputs = llm.generate(prompts, sampling_params)

    for prompt, output in zip(prompts, outputs):
        print("\n")
        print(f"Prompt: {prompt!r}")
        print(f"Completion: {output['text']!r}")


if __name__ == "__main__":
    main()
