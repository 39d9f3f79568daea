"""Offline weight-only quantizer: HF safetensors -> quantized checkpoint.

Usage:
    python tools/quantize_checkpoint.py MODEL_DIR OUT_DIR --mode int8|int4|fp8
        [--tp-compat 8] [--group 128]

Produces OUT_DIR with model-quant.safetensors + quantization.json + copied
config/tokenizer files; the engine loads it directly (Config.quantization
may stay None — the mode is adopted from the sidecar) and the resulting
device weights are bit-identical to load-time quantization of the original
checkpoint (see utils/quant_ckpt.py). A quantized checkpoint is 2-4x
smaller, so engine startup reads 2-4x fewer bytes and skips the on-device
quantization passes.

Runs streaming: peak host memory is one tensor. SURVEY.md §5 ("offline
quantizer producing INT4/INT8/FP8 checkpoints"); the reference has no
quantization support at all.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--mode", choices=("int8", "int4", "fp8"), required=True)
    ap.add_argument("--tp-compat", type=int, default=8,
                    help="largest tensor_parallel_size the int4 groups must "
                         "shard under (row-parallel scale dims)")
    ap.add_argument("--group", type=int, default=None,
                    help="int4 group size along in_features (default 128)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # quantize on host CPU via XLA

    import ml_dtypes
    import numpy as np
    from transformers import AutoConfig

    from nanovllm_tpu.models import get_model_family
    from nanovllm_tpu.ops import quant
    from nanovllm_tpu.utils.loader import CheckpointReader
    from nanovllm_tpu.utils.quant_ckpt import (
        QUANT_META,
        StreamingSafetensorsWriter,
        _st_dtype_code,
        int4_tensor_group,
        pack_int4_np,
        quantized_hf_tensors,
    )

    hf_config = AutoConfig.from_pretrained(args.model_dir)
    family = get_model_family(hf_config)
    spec = family.spec_from_hf(hf_config)
    plan = family.hf_param_plan(spec, tp=1)
    qmap = quantized_hf_tensors(family, spec, plan)
    base_group = args.group or quant.INT4_GROUP

    reader = CheckpointReader(args.model_dir)
    names = sorted(reader.names())
    os.makedirs(args.out_dir, exist_ok=True)

    # Phase 1: declare every output tensor (shapes only, no data reads).
    writer = StreamingSafetensorsWriter(
        os.path.join(args.out_dir, "model-quant.safetensors")
    )
    meta_tensors: dict[str, dict] = {}
    for name in names:
        t = reader.tensor(name)
        if name not in qmap:
            writer.declare(name, _st_dtype_code(t), t.shape, t.nbytes)
            continue
        out_dim, in_dim = t.shape
        if args.mode == "int4":
            g = int4_tensor_group(in_dim, qmap[name], args.tp_compat, base_group)
            packed = in_dim % 2 == 0
            qshape = (out_dim, in_dim // 2) if packed else (out_dim, in_dim)
            qcode = "U8" if packed else "I8"
            sshape = (out_dim, in_dim // g)
            meta_tensors[name] = {"group": g, "packed": packed}
        else:
            qshape, sshape = (out_dim, in_dim), (out_dim,)
            qcode = "I8" if args.mode == "int8" else "F8_E4M3"
            meta_tensors[name] = {}
        writer.declare(name, qcode, qshape, int(np.prod(qshape)))
        writer.declare(name + ".scale", "F32", sshape, int(np.prod(sshape)) * 4)

    # Phase 2: stream data through the quantizer.
    writer.open()
    n_q = 0
    for name in names:
        t = reader.tensor(name)
        if name not in qmap:
            writer.write(name, np.asarray(t))
            continue
        g = meta_tensors[name].get("group")
        qw = quant.quantize_array(t, args.mode, axis=1, group=g)
        if args.mode == "int4":
            # HF orientation [out, in]: the group dim is axis 1 here (the
            # QuantWeight.group property assumes engine [in, out] layout).
            assert qw.q.shape[1] // qw.scale.shape[1] == g, (qw.q.shape, g)
            q8 = np.asarray(qw.q.astype(np.int8) if hasattr(qw.q, "astype")
                            else qw.q, np.int8)
            writer.write(
                name, pack_int4_np(q8) if meta_tensors[name]["packed"] else q8
            )
        elif args.mode == "int8":
            writer.write(name, np.asarray(qw.q, np.int8))
        else:
            writer.write(name, np.asarray(qw.q).view(ml_dtypes.float8_e4m3fn)
                         if qw.q.dtype != np.dtype(ml_dtypes.float8_e4m3fn)
                         else np.asarray(qw.q))
        writer.write(name + ".scale", np.asarray(qw.scale, np.float32))
        n_q += 1
    writer.close()

    with open(os.path.join(args.out_dir, QUANT_META), "w") as f:
        json.dump(
            {"format_version": 1, "mode": args.mode, "tensors": meta_tensors},
            f, indent=1,
        )
    for fname in os.listdir(args.model_dir):
        if fname.endswith((".json", ".txt", ".model")) and not fname.endswith(
            ".safetensors.index.json"
        ):
            shutil.copy(os.path.join(args.model_dir, fname),
                        os.path.join(args.out_dir, fname))
    print(f"quantized {n_q}/{len(names)} tensors -> {args.out_dir} "
          f"(mode={args.mode})")


if __name__ == "__main__":
    main()
