"""Offline-quantized checkpoint format (INT8 / INT4 / FP8 weight-only).

The reference ships no quantization at all; SURVEY.md §5 plans an "offline
quantizer producing INT4/INT8/FP8 checkpoints" for the TPU build. Format:

- ``model-quant.safetensors``: for every quantizable HF tensor ``name``
  (per the model family's QUANT_PLAN), ``name`` holds the quantized values
  and ``name.scale`` the f32 scales; all other tensors are copied verbatim.
  Tensors keep HF orientation ([out, in]); quantization reduces over the
  *in_features* axis (axis 1) with per-out-channel scales (int8/fp8) or
  group-wise scales along axis 1 (int4) — exactly the math the engine's
  load-time quantizer applies after its fuse/transpose transforms, so both
  paths produce bit-identical device weights (per-out-channel quantization
  commutes with out-dim fusion and transposition).
- int4 values nibble-pack two per byte along axis 1 (u8, lo nibble = even
  index); odd in_features fall back to one int8 byte per value.
- ``quantization.json``: {"mode", "tensors": {name: {"group", "packed"}}}.

The engine auto-detects the sidecar: ``Config.quantization`` may be left
None (adopted from the checkpoint) or must match it.
"""

from __future__ import annotations

import json
import os

import numpy as np

QUANT_META = "quantization.json"


def read_quant_meta(model_dir: str) -> dict | None:
    path = os.path.join(model_dir, QUANT_META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        meta = json.load(f)
    assert meta.get("format_version") == 1, meta.get("format_version")
    return meta


def pack_int4_np(q8: np.ndarray) -> np.ndarray:
    """int8 values in [-8, 7], even-length axis 1 -> u8 nibble pairs
    [out, in/2] (lo nibble = even in-index)."""
    assert q8.shape[1] % 2 == 0
    u = q8.astype(np.uint8) & 0xF
    return (u[:, 0::2] | (u[:, 1::2] << 4)).astype(np.uint8)


def unpack_int4_jnp(u8, out_cols: int):
    """Device-side inverse of pack_int4_np: u8 [out, in/2] -> int8 [out, in]."""
    import jax.numpy as jnp

    x = u8.astype(jnp.int32)
    lo = ((x & 0xF) ^ 8) - 8
    hi = (((x >> 4) & 0xF) ^ 8) - 8
    both = jnp.stack([lo, hi], axis=-1).reshape(u8.shape[0], -1)
    return both[:, :out_cols].astype(jnp.int8)


def int4_tensor_group(in_dim: int, kind: str, tp_compat: int, base: int) -> int:
    """Group size along in_features: divides in_dim; for row-parallel tensors
    the group COUNT must also split evenly over up to ``tp_compat`` ranks
    (the scale's group dim shards with the contraction dim)."""
    g = base
    while g > 1 and (
        in_dim % g or (kind == "row" and (in_dim // g) % tp_compat)
    ):
        g //= 2
    assert g >= 1 and in_dim % g == 0, (in_dim, kind, tp_compat)
    return g


def quantized_hf_tensors(family, spec, plan: dict) -> dict[str, str]:
    """Map HF tensor name -> TP kind ("col" | "row" | "vocab") for every
    tensor belonging to a QUANT_PLAN leaf of this model family."""
    out: dict[str, str] = {}
    for path, kind in family.QUANT_PLAN.items():
        if kind.startswith("expert"):
            # Expert stacks quantize at LOAD time (int8 only) — the offline
            # writer keeps them in checkpoint dtype so one artifact serves
            # every mode.
            continue
        rule = plan.get(path)
        if rule is None:
            continue  # e.g. lm_head absent under tied embeddings
        rkind, src = rule[0], rule[1]
        for i in range(spec.num_layers if rkind != "single" else 1):
            if rkind == "single":
                out[src] = kind
            elif rkind in ("stack", "row"):
                out[src.format(i=i)] = kind
            else:  # fused_col
                for tmpl, _ in src:
                    out[tmpl.format(i=i) + ".weight"] = kind
    return out


# ------------------------------------------------- streaming safetensors IO

_WRITE_DTYPES = {
    np.dtype(np.float32): "F32",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
}


def _st_dtype_code(arr: np.ndarray) -> str:
    import ml_dtypes

    if arr.dtype == np.dtype(ml_dtypes.bfloat16):
        return "BF16"
    if arr.dtype == np.dtype(ml_dtypes.float8_e4m3fn):
        return "F8_E4M3"
    if arr.dtype == np.dtype(np.float16):
        return "F16"
    return _WRITE_DTYPES[arr.dtype]


class StreamingSafetensorsWriter:
    """Two-phase safetensors writer: declare shapes/dtypes first (header is
    laid out up front), then append tensor bytes one at a time — peak host
    memory stays at a single tensor."""

    def __init__(self, path: str):
        self.path = path
        self._decl: list[tuple[str, str, tuple, int]] = []  # name, code, shape, nbytes

    def declare(self, name: str, code: str, shape: tuple, nbytes: int):
        self._decl.append((name, code, tuple(int(s) for s in shape), nbytes))

    def open(self):
        header: dict = {}
        off = 0
        for name, code, shape, nbytes in self._decl:
            header[name] = {
                "dtype": code,
                "shape": list(shape),
                "data_offsets": [off, off + nbytes],
            }
            off += nbytes
        blob = json.dumps(header).encode()
        pad = (8 - len(blob) % 8) % 8  # align data start
        blob += b" " * pad
        self._f = open(self.path, "wb")
        self._f.write(len(blob).to_bytes(8, "little"))
        self._f.write(blob)
        self._next = iter(self._decl)

    def write(self, name: str, arr: np.ndarray):
        decl_name, code, shape, nbytes = next(self._next)
        assert decl_name == name, (decl_name, name)
        assert tuple(arr.shape) == shape and _st_dtype_code(arr) == code, (
            name, arr.shape, shape, _st_dtype_code(arr), code,
        )
        data = np.ascontiguousarray(arr).tobytes()
        assert len(data) == nbytes
        self._f.write(data)

    def close(self):
        assert next(self._next, None) is None, "declared tensors not all written"
        self._f.close()
