"""Safetensors checkpoint loader: HF weights -> our stacked parameter tree.

Parity: reference ``nanovllm/utils/loader.py`` + the shard/fuse rules of its
parallel linear loaders (linear.py:65-128): q/k/v fuse into one projection,
gate/up fuse into one, with **rank-blocked** layout so tensor-parallel rank r
owns contiguous [q_r|k_r|v_r] / [gate_r|up_r] slices after an even split of
the fused output dim.

All tensors are read on host (numpy), fused/stacked/transposed, and returned
as a numpy pytree; the ModelRunner device_puts them with NamedShardings.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from safetensors import safe_open


def _read_checkpoint(model_dir: str) -> dict[str, np.ndarray]:
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    assert files, f"no *.safetensors found under {model_dir}"
    tensors: dict[str, np.ndarray] = {}
    for path in files:
        with safe_open(path, framework="torch", device="cpu") as f:
            for name in f.keys():
                t = f.get_tensor(name)
                tensors[name] = t.to(dtype=__import__("torch").float32).numpy()
    return tensors


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
    """Execute a model family's ``hf_param_plan`` against a checkpoint dir."""
    tensors = _read_checkpoint(model_dir)
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
            put(path, tensors[src])
        elif kind == "stack":
            put(path, np.stack([tensors[src.format(i=i)] for i in range(num_layers)]))
        elif kind == "row":
            # [out, in] -> [in, out]; tp shards the in dim (even split works).
            put(
                path,
                np.stack(
                    [
                        np.ascontiguousarray(tensors[src.format(i=i)].T)
                        for i in range(num_layers)
                    ]
                ),
            )
        elif kind in ("fused_col", "fused_col_bias"):
            suffix = ".bias" if kind == "fused_col_bias" else ".weight"
            stacked = []
            for i in range(num_layers):
                mats = [tensors[tmpl.format(i=i) + suffix] for tmpl, _ in src]
                fused = _rank_block_fuse(mats, tp, axis=0)
                stacked.append(fused.T if kind == "fused_col" else fused)
            put(path, np.stack([np.ascontiguousarray(a) for a in stacked]))
        else:
            raise ValueError(f"unknown plan kind {kind!r}")
    return params
