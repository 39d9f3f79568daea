"""Safetensors checkpoint loading: HF weights -> our stacked parameter tree.

Parity: reference ``nanovllm/utils/loader.py`` (streams tensor-by-tensor,
loader.py:12-28) + the shard/fuse rules of its parallel linear loaders
(linear.py:65-128): q/k/v fuse into one projection, gate/up fuse into one,
with **rank-blocked** layout so tensor-parallel rank r owns contiguous
[q_r|k_r|v_r] / [gate_r|up_r] slices after an even split of the fused output
dim.

Two paths:

- ``stream_params_to_device`` (the engine path): true streaming. Tensors are
  np.memmap views (no host read until the transfer), device_put **raw and in
  checkpoint dtype** one layer at a time, and every transform — fuse,
  transpose, dtype cast, quantization — runs on-device, writing into a
  donated [L, ...] accumulator. Peak host memory is one layer's raw tensors;
  there is no torch dependency and no float32 detour (this host writes memory
  at ~40 MB/s; materializing an 8B checkpoint as f32 numpy would take
  tens of minutes and ~32 GB).
- ``load_params`` (host tree, used by CPU parity tests): same plan semantics,
  returns a numpy pytree in checkpoint dtype.

The safetensors format is parsed directly (8-byte LE header length + JSON
header + raw little-endian tensor bytes) so bf16 checkpoints map onto
ml_dtypes.bfloat16 memmap views without any framework in between.
"""

from __future__ import annotations

import glob
import json
import os
import struct

import ml_dtypes
import numpy as np

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
}


class CheckpointReader:
    """Lazy index over a directory of ``*.safetensors`` files.

    ``tensor(name)`` returns a read-only np.memmap view — bytes hit host
    memory only when consumed (e.g. by a device transfer)."""

    def __init__(self, model_dir: str):
        files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
        assert files, f"no *.safetensors found under {model_dir}"
        self._entries: dict[str, tuple[str, int, np.dtype, tuple]] = {}
        for path in files:
            with open(path, "rb") as f:
                (hlen,) = struct.unpack("<Q", f.read(8))
                header = json.loads(f.read(hlen))
            for name, info in header.items():
                if name == "__metadata__":
                    continue
                dtype = np.dtype(_ST_DTYPES[info["dtype"]])
                shape = tuple(info["shape"])
                off = 8 + hlen + info["data_offsets"][0]
                self._entries[name] = (path, off, dtype, shape)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self):
        return self._entries.keys()

    def tensor(self, name: str) -> np.ndarray:
        path, off, dtype, shape = self._entries[name]
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        return np.memmap(path, dtype=dtype, mode="r", offset=off,
                         shape=(n,)).reshape(shape)


def _fused_sources(src, suffix: str):
    return [tmpl + suffix for tmpl, _ in src]


def _plan_layer_sources(rule, i: int) -> list[str]:
    """HF tensor names one layer of this plan entry reads."""
    kind, src = rule[0], rule[1]
    if kind == "single":
        return [src]
    if kind in ("stack", "row"):
        return [src.format(i=i)]
    suffix = ".bias" if kind == "fused_col_bias" else ".weight"
    return [t.format(i=i) for t in _fused_sources(src, suffix)]


# ------------------------------------------------------------ host path


def _rank_block_fuse(mats: list[np.ndarray], tp: int, axis: int = 0) -> np.ndarray:
    """Fuse column-parallel weights [out_i, ...] so that an even split of the
    fused out dim over tp ranks yields [part0_r | part1_r | ...] per rank."""
    per_rank = []
    for r in range(tp):
        for m in mats:
            out = m.shape[axis]
            assert out % tp == 0, f"output dim {out} not divisible by tp={tp}"
            chunk = out // tp
            per_rank.append(np.take(m, range(r * chunk, (r + 1) * chunk), axis=axis))
    return np.concatenate(per_rank, axis=axis)


def load_params(spec, plan: dict, model_dir: str, tp: int = 1) -> dict:
    """Execute a model family's ``hf_param_plan`` on host (numpy pytree in
    checkpoint dtype). Test/utility path — the engine streams instead."""
    reader = CheckpointReader(model_dir)
    num_layers = spec.num_layers
    params: dict = {}

    def put(path, value):
        node = params
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for path, rule in plan.items():
        kind, src = rule[0], rule[1]
        if kind == "single":
            put(path, np.asarray(reader.tensor(src)))
        elif kind == "stack":
            put(path, np.stack(
                [reader.tensor(src.format(i=i)) for i in range(num_layers)]
            ))
        elif kind == "row":
            # [out, in] -> [in, out]; tp shards the in dim (even split works).
            put(path, np.stack([
                np.ascontiguousarray(reader.tensor(src.format(i=i)).T)
                for i in range(num_layers)
            ]))
        elif kind in ("fused_col", "fused_col_bias"):
            suffix = ".bias" if kind == "fused_col_bias" else ".weight"
            stacked = []
            for i in range(num_layers):
                mats = [np.asarray(reader.tensor(t.format(i=i)))
                        for t in _fused_sources(src, suffix)]
                fused = _rank_block_fuse(mats, tp, axis=0)
                stacked.append(fused.T if kind == "fused_col" else fused)
            put(path, np.stack([np.ascontiguousarray(a) for a in stacked]))
        elif kind == "experts_fused_col":
            # MoE expert weights: [L, E, in, fused_out]. The fuse layout tp
            # comes from the plan (rule[3]): rank-blocked when TP shards the
            # expert width, natural tp=1 layout under expert parallelism.
            num_experts, fuse_tp = rule[2], rule[3]
            layers = []
            for i in range(num_layers):
                per_e = []
                for e in range(num_experts):
                    mats = [
                        np.asarray(reader.tensor(t.format(i=i, e=e) + ".weight"))
                        for t, _ in src
                    ]
                    per_e.append(_rank_block_fuse(mats, fuse_tp, axis=0).T)
                layers.append(np.stack([np.ascontiguousarray(a) for a in per_e]))
            put(path, np.stack(layers))
        elif kind == "experts_row":
            num_experts = rule[2]
            put(path, np.stack([
                np.stack([
                    np.ascontiguousarray(reader.tensor(src.format(i=i, e=e)).T)
                    for e in range(num_experts)
                ])
                for i in range(num_layers)
            ]))
        else:
            raise ValueError(f"unknown plan kind {kind!r}")
    return params


# ------------------------------------------------------- streaming path


def stream_params_to_device(
    spec,
    plan: dict,
    model_dir: str,
    *,
    tp: int,
    dtype,
    quant_plan: dict,
    quant_mode: str | None,
    shardings,
    put,
    prequant: dict | None = None,
) -> dict:
    """Stream a checkpoint leaf-by-leaf onto the device(s).

    ``put(arr, sharding)``: host->device transfer (multi-host aware).
    ``shardings``: pytree mirroring the parameter tree (QuantWeight leaves
    holding per-field shardings when the leaf is quantized).
    Returns the device parameter tree (QuantWeight leaves where quantized).

    Per stacked leaf, a donated on-device accumulator is updated one layer at
    a time: host peak = one layer's raw tensors (memmap views transferred in
    checkpoint dtype); device transient = the leaf plus one layer. Every
    transform — rank-block fuse, transpose, dtype cast, quantization — runs
    on-device in ONE jitted update program per leaf (the layer index is a
    traced argument, so there is exactly one compile per leaf shape). int4
    leaves accumulate as int8 bytes and convert to the packed int4 device
    layout in one final jitted cast (an int4 *input* to a jit with a Format
    out_sharding trips a runtime bug; int4 outputs are fine — see
    quant.packed_int4_format).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from nanovllm_tpu.ops import quant as quant_ops
    from nanovllm_tpu.ops.quant import QuantWeight

    from nanovllm_tpu.utils.quant_ckpt import unpack_int4_jnp

    reader = CheckpointReader(model_dir)
    L = spec.num_layers
    params: dict = {}

    # Offline-quantized checkpoint (tools/quantize_checkpoint.py): tensors in
    # quant_plan are already (q, scale) pairs in HF orientation; stream them
    # through the same fuse/transpose transforms with no on-device
    # quantization. Per-out-channel quantization commutes with out-dim fusion
    # and transposition, so the device weights are bit-identical to the
    # load-time-quantized path.
    pq_tensors = (prequant or {}).get("tensors", {})
    if prequant is not None:
        assert quant_mode == prequant["mode"], (
            f"config quantization={quant_mode!r} but checkpoint is "
            f"{prequant['mode']!r} (set quantization=None to adopt it)"
        )

    def pq_meta(srcs: list[str]) -> dict:
        metas = [pq_tensors[n] for n in srcs]
        assert all(m == metas[0] for m in metas), (srcs, metas)
        return metas[0]

    def assign(path, value):
        node = params
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def lookup_sharding(path):
        node = shardings
        for key in path:
            node = node[key]
        return node

    def base_sharding(sh):
        return sh.sharding if hasattr(sh, "sharding") else sh  # unwrap Format

    def rep_sharding(sh):
        """Replicated NamedSharding on the same mesh (raw layer staging)."""
        base = base_sharding(sh.q if isinstance(sh, QuantWeight) else sh)
        return NamedSharding(base.mesh, PartitionSpec())

    def int4_group(in_dim: int, kind: str) -> int:
        g = quant_ops.INT4_GROUP
        while in_dim % g or (kind == "row" and (in_dim // g) % tp):
            g //= 2
        return g

    def quantize_slice(w, axis: int, mode: str, group: int | None):
        """On-device mirror of quant.quantize_array for one slice (int4 q
        returned as int8 bytes; packed in a final pass)."""
        wf = w.astype(jnp.float32)
        if mode == "int4":
            g = group
            shape = wf.shape[:axis] + (wf.shape[axis] // g, g) + wf.shape[axis + 1:]
            wg = wf.reshape(shape)
            amax = jnp.max(jnp.abs(wg), axis=axis + 1, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) / 7.0
            q = jnp.clip(jnp.round(wg / scale), -8, 7)
            return q.reshape(wf.shape).astype(jnp.int8), jnp.squeeze(scale, axis + 1)
        amax = jnp.max(jnp.abs(wf), axis=axis)
        if mode == "int8":
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(
                jnp.round(wf / jnp.expand_dims(scale, axis)), -127, 127
            ).astype(jnp.int8)
        else:  # fp8
            scale = jnp.maximum(amax, 1e-8) / 448.0
            q = (wf / jnp.expand_dims(scale, axis)).astype(jnp.float8_e4m3fn)
        return q, scale

    def pack_int4(q8, q_sharding):
        del q_sharding  # the int8 bytes already carry the target sharding
        return quant_ops.to_packed_int4(q8)

    def stream_stacked(path, rule, kind_tp):
        """Per-layer streamed assembly of a stacked [L, ...] leaf.

        kind_tp: "col" (rank-block fuse + transpose), "row" (transpose),
        "bias" (rank-block fuse only), "stack" (plain)."""
        sh = lookup_sharding(path)
        qmode = quant_mode if path in quant_plan else None
        rep = rep_sharding(sh)

        def layer_transform(mats):
            if kind_tp in ("col", "bias"):
                per_rank = []
                for r in range(tp):
                    for m in mats:
                        chunk = m.shape[0] // tp
                        per_rank.append(
                            jax.lax.dynamic_slice_in_dim(m, r * chunk, chunk, 0)
                        )
                fused = jnp.concatenate(per_rank, axis=0)
                return fused.T if kind_tp == "col" else fused
            if kind_tp == "row":
                return mats[0].T
            return mats[0]

        # Slice shape from layer-0 metadata (no tensor bytes read).
        srcs0 = _plan_layer_sources(rule, 0)
        shapes0 = [reader.tensor(n).shape for n in srcs0]
        pq = qmode is not None and prequant is not None
        pq_m = pq_meta(srcs0) if pq else {}
        # int4 checkpoints store nibble-packed values [out, in/2].
        in0 = (
            shapes0[0][1] * (2 if pq_m.get("packed") else 1)
            if len(shapes0[0]) == 2 else None
        )
        if kind_tp == "col":
            slice_shape = (in0, sum(s[0] for s in shapes0))
        elif kind_tp == "bias":
            slice_shape = (sum(s[0] for s in shapes0),)
        elif kind_tp == "row":
            slice_shape = (in0, shapes0[0][0])
        else:
            slice_shape = shapes0[0]

        if qmode is None:
            acc = jax.jit(
                lambda: jnp.zeros((L, *slice_shape), dtype), out_shardings=sh
            )()

            def update(acc, i, *mats):
                upd = layer_transform(list(mats)).astype(dtype)
                return jax.lax.dynamic_update_slice_in_dim(acc, upd[None], i, 0)

            step = jax.jit(update, donate_argnums=(0,), out_shardings=sh)
            for i in range(L):
                mats = [put(reader.tensor(n), rep)
                        for n in _plan_layer_sources(rule, i)]
                acc = step(acc, jnp.int32(i), *mats)
            assign(path, acc)
            return

        # Quantized leaf: accumulate q (int8 bytes for int4) + scales.
        if pq and qmode == "int4":
            group = pq_m["group"]
            assert slice_shape[0] % group == 0
            if quant_plan[path] == "row":
                assert (slice_shape[0] // group) % tp == 0, (
                    f"checkpoint int4 group {group} cannot shard over tp={tp} "
                    f"(in={slice_shape[0]}); requantize with --tp-compat {tp}"
                )
        else:
            group = (
                int4_group(slice_shape[0], quant_plan[path])
                if qmode == "int4" else None
            )
        if qmode == "int4":
            sshape = (L, slice_shape[0] // group, slice_shape[1])
            q_store = jnp.int8
            # int4 accumulates as int8 bytes: shard like q, no packed Format.
            qb = base_sharding(sh.q)
            acc_sh = NamedSharding(qb.mesh, qb.spec)
        else:
            sshape = (L, slice_shape[1])
            q_store = jnp.int8 if qmode == "int8" else jnp.float8_e4m3fn
            acc_sh = sh.q
        s_sh = sh.scale
        acc_q = jax.jit(lambda: jnp.zeros((L, *slice_shape), q_store),
                        out_shardings=acc_sh)()
        acc_s = jax.jit(lambda: jnp.zeros(sshape, jnp.float32),
                        out_shardings=s_sh)()

        if pq:
            # Pre-quantized sources: interleaved (q, scale) per source; the
            # same fuse/transpose transforms apply to both fields.
            def update_q(acc_q, acc_s, i, *mats):
                qs, ss = list(mats[0::2]), list(mats[1::2])
                if qmode == "int4" and pq_m["packed"]:
                    qs = [unpack_int4_jnp(m, in0) for m in qs]
                q = layer_transform(qs).astype(acc_q.dtype)
                s = layer_transform(ss).astype(jnp.float32)
                return (
                    jax.lax.dynamic_update_slice_in_dim(acc_q, q[None], i, 0),
                    jax.lax.dynamic_update_slice_in_dim(acc_s, s[None], i, 0),
                )
        else:
            def update_q(acc_q, acc_s, i, *mats):
                q, s = quantize_slice(
                    layer_transform(list(mats)), 0, qmode, group
                )
                return (
                    jax.lax.dynamic_update_slice_in_dim(acc_q, q[None], i, 0),
                    jax.lax.dynamic_update_slice_in_dim(acc_s, s[None], i, 0),
                )

        step = jax.jit(
            update_q, donate_argnums=(0, 1), out_shardings=(acc_sh, s_sh)
        )
        for i in range(L):
            mats = []
            for n in _plan_layer_sources(rule, i):
                mats.append(put(reader.tensor(n), rep))
                if pq:
                    mats.append(put(reader.tensor(n + ".scale"), rep))
            acc_q, acc_s = step(acc_q, acc_s, jnp.int32(i), *mats)
        if qmode == "int4":
            acc_q = pack_int4(acc_q, sh.q)
        assign(path, QuantWeight(q=acc_q, scale=acc_s, mode=qmode))

    def stream_experts(path, rule, kind):
        """MoE expert stacks [L, E, ...]: streamed one (layer, expert) slice
        at a time through a single jitted update program (host peak = one
        expert's raw tensors). Quantized entries (int8 only — per-(expert,
        out-channel) scales commute with the grouped matmul) quantize each
        slice on-device; offline checkpoints keep experts in checkpoint
        dtype, so this same path serves them too."""
        qmode = quant_mode if path in quant_plan else None
        assert qmode in (None, "int8", "int4"), (
            "expert weights quantize under int8/int4 only"
        )
        sh = lookup_sharding(path)
        rep = rep_sharding(sh)
        num_experts = rule[2]
        fuse_tp = rule[3] if kind == "experts_fused_col" else 1
        if kind == "experts_fused_col":
            srcs = lambda i, e: [
                t.format(i=i, e=e) + ".weight" for t, _ in rule[1]
            ]
        else:
            srcs = lambda i, e: [rule[1].format(i=i, e=e)]
        shapes0 = [reader.tensor(n).shape for n in srcs(0, 0)]
        in0 = shapes0[0][1]
        if kind == "experts_fused_col":
            slice_shape = (in0, sum(s[0] for s in shapes0))
        else:
            slice_shape = (in0, shapes0[0][0])

        def layer_transform(mats):
            if kind == "experts_fused_col":
                per_rank = []
                for r in range(fuse_tp):
                    for m in mats:
                        chunk = m.shape[0] // fuse_tp
                        per_rank.append(
                            jax.lax.dynamic_slice_in_dim(m, r * chunk, chunk, 0)
                        )
                return jnp.concatenate(per_rank, axis=0).T
            return mats[0].T

        if qmode is None:
            acc = jax.jit(
                lambda: jnp.zeros((L, num_experts, *slice_shape), dtype),
                out_shardings=sh,
            )()

            def update(acc, i, e, *mats):
                upd = layer_transform(list(mats)).astype(dtype)
                return jax.lax.dynamic_update_slice(
                    acc, upd[None, None],
                    (i, e) + (jnp.int32(0),) * len(slice_shape),
                )

            step = jax.jit(update, donate_argnums=(0,), out_shardings=sh)
            for i in range(L):
                for e in range(num_experts):
                    mats = [put(reader.tensor(n), rep) for n in srcs(i, e)]
                    acc = step(acc, jnp.int32(i), jnp.int32(e), *mats)
            assign(path, acc)
            return

        if qmode == "int4":
            # k-nibble-packed storage for the in-kernel-dequant gmm
            # (quant.pack_int4_k). The group count splits over ranks only
            # when the contraction dim actually shards (width-TP expert
            # down; EP shards the expert dim instead).
            shard_k = tp if getattr(sh.q, "spec", (None,) * 4)[2] else 1
            eg = quant_ops.expert_int4_group(slice_shape[0], shard_k)
            q_slice = (slice_shape[0] // 2, slice_shape[1])
            s_slice = (slice_shape[0] // eg, slice_shape[1])
        else:
            eg = None
            q_slice = slice_shape
            s_slice = (slice_shape[1],)
        acc_q = jax.jit(
            lambda: jnp.zeros((L, num_experts, *q_slice), jnp.int8),
            out_shardings=sh.q,
        )()
        acc_s = jax.jit(
            lambda: jnp.zeros((L, num_experts, *s_slice), jnp.float32),
            out_shardings=sh.scale,
        )()

        def update_q(acc_q, acc_s, i, e, *mats):
            q, s = quantize_slice(layer_transform(list(mats)), 0, qmode, eg)
            if qmode == "int4":
                q = quant_ops.pack_int4_k(q, eg)
            zeros_q = (jnp.int32(0),) * len(q_slice)
            zeros_s = (jnp.int32(0),) * len(s_slice)
            return (
                jax.lax.dynamic_update_slice(
                    acc_q, q[None, None], (i, e) + zeros_q
                ),
                jax.lax.dynamic_update_slice(
                    acc_s, s[None, None], (i, e) + zeros_s
                ),
            )

        step = jax.jit(
            update_q, donate_argnums=(0, 1), out_shardings=(sh.q, sh.scale)
        )
        for i in range(L):
            for e in range(num_experts):
                mats = [put(reader.tensor(n), rep) for n in srcs(i, e)]
                acc_q, acc_s = step(acc_q, acc_s, jnp.int32(i), jnp.int32(e),
                                    *mats)
        assign(path, QuantWeight(q=acc_q, scale=acc_s, mode=qmode))

    for path, rule in plan.items():
        kind = rule[0]
        if kind == "single":
            sh = lookup_sharding(path)
            qmode = quant_mode if path in quant_plan else None
            raw = reader.tensor(rule[1])
            if qmode is None:
                staged = put(raw, rep_sharding(sh))
                assign(path, jax.jit(
                    lambda x: x.astype(dtype), out_shardings=sh
                )(staged))
                continue
            if qmode == "int4":
                qb = base_sharding(sh.q)
                q8_sh = NamedSharding(qb.mesh, qb.spec)
            else:
                q8_sh = sh.q
            if prequant is not None:
                meta1 = pq_meta([rule[1]])
                staged = put(raw, rep_sharding(sh))
                sc = put(reader.tensor(rule[1] + ".scale"), rep_sharding(sh))
                if qmode == "int4" and meta1["packed"]:
                    d_full = raw.shape[1] * 2
                    q8 = jax.jit(
                        lambda x: unpack_int4_jnp(x, d_full),
                        out_shardings=q8_sh,
                    )(staged)
                else:
                    q8 = jax.jit(
                        lambda x: x, out_shardings=q8_sh
                    )(staged)
                scale = jax.jit(lambda x: x, out_shardings=sh.scale)(sc)
            else:
                group = (
                    int4_group(raw.shape[1], "vocab")
                    if qmode == "int4" else None
                )
                staged = put(raw, rep_sharding(sh))
                q8, scale = jax.jit(
                    lambda x: quantize_slice(x, 1, qmode, group),
                    out_shardings=(q8_sh, sh.scale),
                )(staged)
            if qmode == "int4":
                q8 = pack_int4(q8, sh.q)
            assign(path, QuantWeight(q=q8, scale=scale, mode=qmode))
        elif kind == "stack":
            stream_stacked(path, rule, "stack")
        elif kind == "row":
            stream_stacked(path, rule, "row")
        elif kind == "fused_col":
            stream_stacked(path, rule, "col")
        elif kind == "fused_col_bias":
            stream_stacked(path, rule, "bias")
        elif kind in ("experts_fused_col", "experts_row"):
            stream_experts(path, rule, kind)
        else:
            raise ValueError(f"unknown plan kind {kind!r}")
    return params
