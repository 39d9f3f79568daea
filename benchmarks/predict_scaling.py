"""Offline scaling-efficiency prediction for the multi-chip BASELINE configs
(BASELINE.md: ">=85% scaling efficiency to v5e-16 on Qwen3-32B INT4").

No multi-chip hardware exists in this environment, so the number is DERIVED,
not measured — but every input is evidence, not guesswork:

1. **Collective payloads come from compiled HLO.** The decode step is lowered
   for real TP degrees on a virtual CPU mesh at the model's REAL widths
   (hidden/intermediate/vocab; the layer stack is scanned, so its collectives
   appear once in HLO and are multiplied by the real layer count). Every
   all-reduce / all-gather / reduce-scatter payload (dtype + shape) is read
   out of the optimized module — the same extraction
   benchmarks/check_tp_overlap.py uses for the overlap assertion.
2. **Per-chip compute time is the HBM roofline** (decode is DMA-bound: weight
   bytes + KV bytes per step, both sharded 1/N), derated by the single-chip
   MEASURED roofline fraction (~75% at the 0.6B headline, benchmarks/README).
3. **Wire model**: bidirectional-ring collectives on one ICI axis —
   all-reduce moves 2(N-1)/N x payload per chip, all-gather/reduce-scatter
   (N-1)/N — at v5e's 45 GB/s/direction ICI links, 2 directions usable by a
   ring. DCN never carries per-step collectives: a v5e-16 is a single-slice
   4x4 ICI torus (multi-host changes the controller layout, not the fabric).

Efficiency := t_compute / (t_compute + t_comm_exposed), i.e. the N-chip step
vs an ideal 1/N step. Reported as a [no-overlap, full-overlap] band: XLA's
latency-hiding scheduler overlaps psums with the next layer's dots
(check_tp_overlap.py asserts async start/done pairs with compute in between
on TPU), so the true point sits near the full-overlap end.

Qwen3-32B has 8 KV heads, so TP=16 is not a valid sharding (hkv = 8/16 < 1);
the v5e-16 serving shape is TP=8 x DP=2 — two independent engine replicas
(data parallelism multiplies throughput at ~100% efficiency offline; the
api_server --data-parallel mode is the online analogue).

Usage (CPU-only, no chip time):
    python benchmarks/predict_scaling.py                # 32B int4, tp 2/4/8
    python benchmarks/predict_scaling.py --arch 72b --tps 4,8 --batch 256
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819e9          # v5e HBM bandwidth
HBM_EFF = 0.75            # measured single-chip decode fraction of roofline
ICI_GBPS = 45e9           # v5e ICI per link per direction
RING_DIRS = 2             # a ring all-reduce streams both directions at once

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred|s4|u4)\[([\d,]*)\]")
_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1, "s4": 0.5, "u4": 0.5}


def _op_bytes(line: str) -> float:
    """Sum the payload bytes of every typed buffer on the RESULT of an HLO
    line (handles tuple-typed all-reduce-start results; the operand list is
    cut off before parsing)."""
    lhs = line.split(" = ", 1)[1] if " = " in line else line
    lhs = lhs.split("(", 1)[0] + lhs.split(")", 1)[0] if lhs.startswith("(") \
        else lhs.split(" ", 1)[0]
    total = 0.0
    for dt, dims in _SHAPE.findall(lhs):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def extract_collectives(hlo: str):
    """Yield (kind, computation, payload_bytes) for every collective op.
    all-reduce-start results are (operand, result) tuples — halve them."""
    comp = "entry"
    while_bodies = set()
    for m in re.finditer(r"body=%?([\w.\-]+)", hlo):
        while_bodies.add(m.group(1))
    out = []
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s+->", line)
        if line and not line[0].isspace():
            h = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)", line)
            if h and "{" in line:
                comp = h.group(1)
        for kind in ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute"):
            if re.search(rf"\b{kind}(-start)?\(", line):
                b = _op_bytes(line)
                if re.search(rf"\b{kind}-start\(", line):
                    b /= 2  # start result aliases (operand, result)
                if "_promoted" in line:
                    # The CPU backend PROMOTES sub-f32 reductions to f32
                    # (to_apply=%region_N_promoted); TPU backends reduce
                    # bf16 natively, so the wire payload is half what this
                    # compiled-for-CPU module shows.
                    b /= 2
                out.append((kind, comp, b, comp in while_bodies))
                break
    return out


def wire_bytes(kind: str, payload: float, n: int) -> float:
    if kind == "all-reduce":
        return 2 * payload * (n - 1) / n
    return payload * (n - 1) / n   # all-gather / reduce-scatter / permute


def shard_fraction(leaf_sharding, n):
    """Fraction of a leaf resident per chip (1/n if any dim is tp-sharded)."""
    spec = getattr(leaf_sharding, "spec", None)
    if spec is None:
        return 1.0
    return 1.0 / n if any(s == "tp" for s in spec if s) else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="32b", choices=["8b", "32b", "72b"])
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--tps", default="2,4,8")
    ap.add_argument("--batch", type=int, default=256,
                    help="decode bucket (resident sequences per replica)")
    ap.add_argument("--avg-ctx", type=int, default=800,
                    help="mean context length during decode (bench trace: "
                    "in 100-1024 + half the 100-1024 output)")
    ap.add_argument("--layers", type=int, default=2,
                    help="layers materialized for lowering (collectives ride "
                    "the scan body once; bytes scale by the real count)")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{max(int(t) for t in args.tps.split(','))}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401

    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner
    from nanovllm_tpu.utils.testing import (QWEN2_72B, QWEN3_8B, QWEN3_32B,
                                            make_qwen3_dir)

    archs = {"8b": QWEN3_8B, "32b": QWEN3_32B, "72b": QWEN2_72B}
    real = dict(archs[args.arch])
    l_real = real["num_hidden_layers"]
    arch = dict(real, num_hidden_layers=args.layers)
    model_dir = make_qwen3_dir(
        f"/tmp/predict-scaling-{args.arch}-{args.layers}", arch
    )

    results = []
    for tp in (int(t) for t in args.tps.split(",")):
        cfg = Config(
            model_dir,
            max_model_len=2048,
            max_num_batched_tokens=2048,
            max_num_seqs=args.batch,
            kvcache_block_size=16,
            num_kvcache_blocks=2 * args.batch,
            tensor_parallel_size=tp,
            quantization=args.quant,
            kv_cache_dtype="int8",
            decode_buckets=(args.batch,),
            prefill_buckets=(256,),
            aot_warmup=False,
        )
        runner = ModelRunner(cfg, random_weights=True)
        inputs = runner._dummy_inputs(args.batch, args.batch, False)
        compiled = runner._step.lower(
            runner.params, runner.kv, runner.token_state, runner.rope,
            inputs, None, None, None, None, False, False, False, False, False,
            False, False, False,
        ).compile()
        hlo = compiled.as_text()

        colls = extract_collectives(hlo)
        per_layer = [(k, b) for k, c, b, inbody in colls if inbody]
        per_step = [(k, b) for k, c, b, inbody in colls if not inbody]
        comm_payload = (sum(b for _, b in per_layer) * l_real
                        + sum(b for _, b in per_step))
        comm_wire = (sum(wire_bytes(k, b, tp) for k, b in per_layer) * l_real
                     + sum(wire_bytes(k, b, tp) for k, b in per_step))
        t_comm = comm_wire / (ICI_GBPS * RING_DIRS)

        # Per-chip HBM bytes per decode step: resident weight shard (read
        # once per step — batch rows reuse it from VMEM/CMEM) + this step's
        # KV reads + the KV append (negligible) — scaled to the real depth.
        shardings = runner._param_shardings()
        w_bytes = 0.0
        for leaf, sh in zip(jax.tree.leaves(runner.params),
                            jax.tree.leaves(shardings)):
            scale = l_real / args.layers if (
                leaf.ndim >= 1 and leaf.shape[0] == args.layers
            ) else 1.0
            # jnp.int4 reports itemsize 1 (numpy has no sub-byte); on the TPU
            # the resident form is packed — 0.5 B/element. (k-nibble-packed
            # expert int8 bytes already hold two values per byte: their
            # element count is halved instead, so itemsize 1 is correct.)
            itemsize = leaf.dtype.itemsize
            if str(leaf.dtype) in ("int4", "uint4"):
                itemsize = 0.5
            w_bytes += leaf.size * itemsize * shard_fraction(sh, tp) * scale
        spec = runner.spec
        kv_tok = 2 * l_real * real["num_key_value_heads"] * spec.head_dim
        kv_bytes = args.batch * args.avg_ctx * kv_tok / tp  # int8 KV = 1B
        t_compute = (w_bytes + kv_bytes) / (HBM_GBPS * HBM_EFF)

        eff_no = t_compute / (t_compute + t_comm)
        eff_ov = t_compute / max(t_compute, t_comm)
        results.append(dict(
            tp=tp, batch=args.batch,
            per_layer_collectives=[(k, round(b / 1e6, 3)) for k, b in
                                   per_layer],
            per_step_collectives=[(k, round(b / 1e6, 3)) for k, b in
                                  per_step],
            comm_payload_mb=round(comm_payload / 1e6, 1),
            comm_wire_mb=round(comm_wire / 1e6, 1),
            weight_bytes_per_chip_gb=round(w_bytes / 1e9, 3),
            kv_bytes_per_chip_gb=round(kv_bytes / 1e9, 3),
            t_compute_ms=round(t_compute * 1e3, 3),
            t_comm_ms=round(t_comm * 1e3, 3),
            eff_no_overlap=round(eff_no, 3),
            eff_full_overlap=round(eff_ov, 3),
        ))
        print(json.dumps(results[-1]))
        del runner

    print(json.dumps(dict(
        arch=args.arch, quant=args.quant, layers_real=l_real,
        model=("efficiency = t_compute/(t_compute+t_comm_exposed); "
               "v5e-16 = TP=8 x DP=2 (8 KV heads cap TP at 8); "
               f"HBM {HBM_GBPS/1e9:.0f} GB/s x {HBM_EFF} measured, "
               f"ICI {ICI_GBPS/1e9:.0f} GB/s/dir x {RING_DIRS} ring dirs"),
        results=results,
    )))


if __name__ == "__main__":
    main()
