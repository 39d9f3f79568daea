"""Structured-weight PPL fixture (VERDICT r3 weak #7).

The quant quality gate's random-weight fixture has i.i.d. weight matrices —
the most flattering case for quantization (no outlier channels, flat
singular spectra). Trained transformers are closer to low-rank + noise with
heavy-tailed channel scales, where group/channel quant error propagates
worse. This writes a ~40M-param Qwen3-arch checkpoint whose every matmul
weight is

    W = (U @ V) * col_scale + eps,   rank = 12.5% of min dim,
    col_scale ~ lognormal(0, 0.5)    (outlier output channels),
    eps ~ N(0, 0.1 * std(U @ V))

then the standard sweep applies:

    NANOVLLM_PLATFORM=cpu python benchmarks/perplexity.py \
        /tmp/qwen3-structured-ppl --sweep
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

PATH = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qwen3-structured-ppl"


def structure_(t: torch.Tensor, gen: torch.Generator):
    if t.ndim != 2 or min(t.shape) < 32:
        return
    out_d, in_d = t.shape
    r = max(4, min(out_d, in_d) // 8)
    u = torch.randn(out_d, r, generator=gen) / (r ** 0.5)
    v = torch.randn(r, in_d, generator=gen)
    w = u @ v
    col = torch.exp(0.5 * torch.randn(out_d, 1, generator=gen))
    w = w * col
    w = w + 0.1 * w.std() * torch.randn(out_d, in_d, generator=gen)
    t.copy_(w * (t.std() / w.std().clamp_min(1e-8)))


def main():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=32768, hidden_size=512, intermediate_size=1408,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg)
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "weight" in name and p.ndim == 2:
                structure_(p.data, gen)
    model.save_pretrained(PATH, safe_serialization=True)
    n = sum(p.numel() for p in model.parameters())
    print(f"wrote {PATH}: {n/1e6:.1f}M params (low-rank+outlier structured)")


if __name__ == "__main__":
    main()
