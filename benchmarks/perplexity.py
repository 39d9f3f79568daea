"""Perplexity harness: teacher-forcing PPL under each quantization mode.

BASELINE.md gates quantized configs at perplexity within 0.1 of the BF16
reference. Usage:

    python benchmarks/perplexity.py /path/to/model tokens.npy [--quant int8]
    python benchmarks/perplexity.py /path/to/model tokens.npy --sweep

``tokens.npy``: 1-D int array of token ids (e.g. a tokenized eval set).
Without a real checkpoint this script still runs (random weights) but the
absolute numbers are meaningless; use it with downloaded weights.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np

import jax

if os.environ.get("NANOVLLM_PLATFORM"):
    # Pin the backend (the tunnel's sitecustomize ignores JAX_PLATFORMS);
    # "cpu" runs the sweep off-chip (weight-quant deltas need no TPU).
    jax.config.update("jax_platforms", os.environ["NANOVLLM_PLATFORM"])

import jax.numpy as jnp

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.inputs import build_step_inputs
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.ops import quant

CHUNK = 2048  # teacher-forcing window per device step (keeps logits ~1.2GB)


def score_logprobs(runner: ModelRunner, token_ids: np.ndarray) -> np.ndarray:
    """log p(x_t | x_<t) for t >= 1, teacher-forcing through the engine's
    own forward (paged cache + the production attention kernels)."""
    cfg, family, spec = runner.config, runner.family, runner.spec
    bs = cfg.kvcache_block_size
    n = len(token_ids)
    table = list(range(-(-n // bs)))
    assert len(table) <= cfg.num_kvcache_blocks

    prefill_impl = runner._attn_impls()[0]

    @jax.jit
    def chunk_logprobs(params, kv, inputs, targets):
        hidden, kv = family.forward(
            spec, params, kv, inputs,
            attn_impl=prefill_impl, scan_layers=cfg.scan_layers,
        )
        logits = quant.head_matmul(hidden, family.lm_head_weight(params))
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        return tok_logp, kv

    kv = runner.kv
    out = []
    q_tile = runner.q_tile if runner.use_pallas else None
    start = 0
    while start < n:
        chunk = token_ids[start: start + CHUNK]
        reqs = [dict(token_ids=list(chunk), start=start,
                     kv_len=start + len(chunk), block_table=table,
                     temperature=1.0, slot=0)]
        t_bucket = CHUNK if q_tile else len(chunk)
        if q_tile:
            t_bucket = -(-len(chunk) // q_tile) * q_tile
        inputs = build_step_inputs(
            reqs, block_size=bs, num_tokens_bucket=t_bucket,
            num_seqs_bucket=1, max_blocks_per_seq=len(table),
            rng=np.zeros(2, np.uint32), q_tile=q_tile,
            num_slots=runner.num_slots,
        )
        # Predict the NEXT token at each position.
        targets = np.zeros(t_bucket, np.int64)
        upto = min(start + len(chunk), n - 1)
        k = upto - start
        targets[:k] = token_ids[start + 1: start + 1 + k]
        tok_logp, kv = chunk_logprobs(
            runner.params, kv, inputs, jnp.asarray(targets)
        )
        out.append(np.asarray(tok_logp)[:k])
        start += len(chunk)
    runner.kv = kv
    return np.concatenate(out)


def run(model_dir, tokens, *, quantization=None, kv_cache_dtype="auto",
        random_weights=False):
    config = Config(
        model_dir,
        max_model_len=min(4096, 1 << int(np.ceil(np.log2(len(tokens))))),
        quantization=quantization,
        kv_cache_dtype=kv_cache_dtype,
        aot_warmup=False,
    )
    runner = ModelRunner(config, random_weights=random_weights)
    logp = score_logprobs(runner, tokens[: config.max_model_len])
    runner.exit()
    return float(np.exp(-logp.mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("tokens", nargs="?", help=".npy of token ids")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--kv", default="auto")
    ap.add_argument("--sweep", action="store_true",
                    help="bf16 + every quant mode, report deltas")
    ap.add_argument("--random-weights", action="store_true")
    args = ap.parse_args()

    if args.tokens:
        tokens = np.load(args.tokens).astype(np.int64)
    else:
        tokens = np.random.default_rng(0).integers(2, 400, 1024)  # within any vocab
        # Use checkpoint weights whenever they exist: with random_weights the
        # per-mode device init draws DIFFERENT weights, making deltas
        # meaningless (each mode must quantize the same underlying model).
        import glob as _glob

        if not _glob.glob(os.path.join(args.model, "*.safetensors")):
            args.random_weights = True

    if not args.sweep:
        ppl = run(args.model, tokens, quantization=args.quant,
                  kv_cache_dtype=args.kv, random_weights=args.random_weights)
        print({"quant": args.quant, "kv": args.kv, "ppl": round(ppl, 4)})
        return

    base = run(args.model, tokens, random_weights=args.random_weights)
    print({"config": "bf16", "ppl": round(base, 4)})
    for q, kv in (("int8", "auto"), ("int8", "int8"), ("int8", "int4"),
                  ("int4", "auto"), ("fp8", "auto")):
        ppl = run(args.model, tokens, quantization=q, kv_cache_dtype=kv,
                  random_weights=args.random_weights)
        print({"config": f"{q}+kv={kv}", "ppl": round(ppl, 4),
               "delta_vs_bf16": round(ppl - base, 4)})


if __name__ == "__main__":
    main()
