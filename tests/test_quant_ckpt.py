"""Offline-quantized checkpoints (tools/quantize_checkpoint.py).

The device weights from loading a pre-quantized checkpoint must be
BIT-IDENTICAL to load-time quantization of the original (per-out-channel
quantization commutes with the loader's fuse/transpose transforms), and the
engine must adopt the checkpoint's mode automatically.
"""

import subprocess
import sys

import jax
import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams

ENGINE_KW = dict(
    max_num_batched_tokens=128,
    max_num_seqs=8,
    max_model_len=128,
    kvcache_block_size=16,
    num_kvcache_blocks=64,
    decode_buckets=(8,),
    prefill_buckets=(128,),
    dtype="float32",
    use_pallas_attention=False,
    enforce_eager=True,
)


def _quantize(src, dst, mode):
    subprocess.run(
        [sys.executable, "tools/quantize_checkpoint.py", src, str(dst),
         "--mode", mode, "--tp-compat", "1"],
        check=True, capture_output=True, text=True,
    )


def _leaves(params):
    flat, _ = jax.tree.flatten(
        params, is_leaf=lambda x: hasattr(x, "mode") and hasattr(x, "q")
    )
    return flat


@pytest.mark.parametrize("mode", ["int8", "int4", "fp8"])
def test_prequantized_matches_live_quantization(tiny_qwen3_dir, tmp_path, mode):
    qdir = tmp_path / f"ckpt-{mode}"
    _quantize(tiny_qwen3_dir, qdir, mode)

    live = LLM(tiny_qwen3_dir, quantization=mode, **ENGINE_KW)
    pre = LLM(str(qdir), **ENGINE_KW)  # mode adopted from quantization.json
    assert pre.config.quantization == mode

    for a, b in zip(_leaves(live.model_runner.params),
                    _leaves(pre.model_runner.params)):
        if hasattr(a, "mode"):  # QuantWeight
            assert a.mode == b.mode == mode
            qa = np.asarray(a.q.astype(np.int8) if mode == "int4" else a.q)
            qb = np.asarray(b.q.astype(np.int8) if mode == "int4" else b.q)
            np.testing.assert_array_equal(
                qa.view(np.uint8) if mode == "fp8" else qa,
                qb.view(np.uint8) if mode == "fp8" else qb,
            )
            np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (9, 21)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out_live = [o["token_ids"] for o in live.generate(prompts, sp, use_tqdm=False)]
    out_pre = [o["token_ids"] for o in pre.generate(prompts, sp, use_tqdm=False)]
    assert out_live == out_pre
    live.exit()
    pre.exit()


def test_mode_conflict_rejected(tiny_qwen3_dir, tmp_path):
    qdir = tmp_path / "ckpt-conflict"
    _quantize(tiny_qwen3_dir, qdir, "int8")
    with pytest.raises(AssertionError, match="checkpoint is"):
        LLM(str(qdir), quantization="int4", **ENGINE_KW)
