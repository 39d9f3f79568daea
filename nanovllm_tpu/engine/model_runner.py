"""Single-controller executor: bucketed jit step functions over a resident
paged KV cache.

Parity: reference ``nanovllm/engine/model_runner.py``. TPU-first deltas
(SURVEY.md §7):
- The CUDA-graph capture/replay machinery (model_runner.py:222-257) is
  replaced by ``jax.jit`` step functions compiled once per *shape bucket*
  (decode bucket ladder mirrors the reference's graph_bs ladder); XLA's
  compilation cache plays the role of graph memory pools.
- The KV cache is a **donated** jit argument, so XLA updates it in place —
  the analogue of the reference's persistent cache tensor
  (model_runner.py:115-121).
- Profile-based KV sizing (model_runner.py:103-114) uses the TPU device's
  memory stats instead of torch.cuda.mem_get_info.
- No worker processes / NCCL / shared-memory RPC (model_runner.py:41-89):
  one Python controller drives all chips; tensor parallelism is GSPMD
  sharding inside the same jitted step.
"""

from __future__ import annotations

import os
from time import perf_counter

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.inputs import (
    GuidedInputs,
    PenaltyInputs,
    SpecInputs,
    StepInputs,
    build_guided_inputs,
    build_penalty_inputs,
    build_spec_inputs,
    build_step_inputs,
)
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import get_model_family
from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops import penalties as penalty_ops
from nanovllm_tpu.ops import quant
from nanovllm_tpu.ops import guided as guided_ops
from nanovllm_tpu.ops import spec as spec_ops
from nanovllm_tpu.ops.quant import QuantWeight
from nanovllm_tpu.ops.pallas.ragged_attention import GRP
from nanovllm_tpu.ops import sampling as ops_sampling
from nanovllm_tpu.ops.sampling import sample, sample_topk_topp
from nanovllm_tpu.utils.loader import stream_params_to_device
from nanovllm_tpu.utils.quant_ckpt import read_quant_meta

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
    "int8": jnp.int8,
    # int4 KV storage: uint8 bytes, two head-paired nibbles per byte
    # (ops/pallas/ragged_attention.quantize_kv_rows_int4).
    "int4": jnp.uint8,
    "fp8": jnp.float8_e4m3fn,
}


def _pick_bucket(ladder: tuple, n: int) -> int:
    for b in ladder:
        if n <= b:
            return b
    raise ValueError(f"batch of {n} exceeds largest bucket {ladder[-1]}")


def _shard_map(fn, *, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_rep -> check_vma rename)."""
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        try:
            return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
        except TypeError:
            return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    from jax.experimental.shard_map import shard_map as sm

    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              check_rep=False)


class ModelRunner:
    """Owns device state: parameters, paged KV cache, compiled step fns."""

    def __init__(self, config: Config, *, random_weights: bool = False,
                 tokenizer=None):
        self.config = config
        self._guided_tokenizer = tokenizer
        self.spec = get_model_family(config.hf_config).spec_from_hf(config.hf_config)
        self.family = get_model_family(config.hf_config)
        # Offline-quantized checkpoint (tools/quantize_checkpoint.py): adopt
        # its mode before anything reads config.quantization (shardings, KV
        # sizing); a conflicting explicit mode fails in the loader.
        self._prequant = None if random_weights else read_quant_meta(config.model)
        if self._prequant is not None and config.quantization is None:
            config.quantization = self._prequant["mode"]
        self.dtype = _DTYPES[config.dtype]
        self.kv_dtype = _DTYPES[config.kv_cache_dtype]
        self.tp = config.tensor_parallel_size
        self.ep = config.expert_parallel_size
        n_dev = self.tp * self.ep
        if self.ep > 1:
            assert getattr(self.spec, "num_experts", 0), (
                "expert_parallel_size > 1 needs a MoE model (dense weights "
                "would just replicate across the ep axis)"
            )
            assert self.spec.num_experts % self.ep == 0, (
                f"num_experts={self.spec.num_experts} must divide over "
                f"ep={self.ep}"
            )

        devices = jax.devices()
        off = config.device_offset
        assert off + n_dev <= len(devices), (
            f"device_offset={off} + ep*tp={n_dev} exceeds "
            f"{len(devices)} devices"
        )
        # Multi-host (DCN): every host runs this same program (multi-controller
        # SPMD, SURVEY.md §5/§7: the deterministic scheduler + a shared rng
        # seed keep per-host StepInputs identical, so no control-plane
        # messages are needed — the reference's SHM/pickle mailbox,
        # model_runner.py:41-89, has no equivalent). The mesh must span every
        # process's devices so all hosts participate in each jitted step.
        self.n_proc = jax.process_count()
        if self.n_proc > 1:
            assert n_dev == len(devices) and off == 0, (
                f"multi-host runs require ep*tp == global device "
                f"count ({len(devices)}) and device_offset == 0, got {n_dev}"
            )
        if self.ep > 1:
            # 2-D ("ep", "tp") mesh (Config.expert_parallel_size): P("tp")
            # specs shard over tp and replicate over ep unchanged; only the
            # expert stacks mention "ep".
            self.mesh = Mesh(
                np.asarray(devices[off: off + n_dev]).reshape(
                    self.ep, self.tp
                ),
                ("ep", "tp"),
            )
        else:
            self.mesh = Mesh(
                np.asarray(devices[off: off + self.tp]).reshape(self.tp),
                ("tp",),
            )
        self.is_tpu = devices[0].platform in ("tpu", "axon")

        # Persistent compilation cache: recompiling a bucket costs 20-40s on
        # the tunneled TPU backend; cached reloads are sub-second.
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "NANOVLLM_TPU_CACHE", "/tmp/nanovllm_tpu_jax_cache"
                ),
            )

        self._load_params(random_weights)
        self._alloc_token_state()
        self._init_guided()
        self._init_rope()
        # Step fns are built (not compiled) before the KV pool is sized: auto
        # sizing probe-compiles the largest prefill bucket against a tiny
        # cache and reads the compiler's actual peak (see _auto_num_blocks).
        self._build_step_fns()

        # The scheduler budgets prefills in q-tile-padded units, so packed
        # batches never exceed the largest compiled bucket.
        if self.use_pallas:
            config.schedule_token_align = self.q_tile
        # Expose the (all-layer) sliding window so the scheduler can roll KV
        # eviction forward (blocks below the window are released mid-flight).
        config.attention_window = getattr(self.spec, "sliding_window", None)
        if config.spec_k > 0:
            # Speculative decoding's worklists/appends assume full causal
            # attention; window-rolled page skipping and rolling eviction
            # would interact with pessimistic host lengths.
            assert config.attention_window is None and not getattr(
                self.spec, "layer_windows", None
            ), "spec_k > 0 requires a non-sliding-window model"
            assert config.spec_k + 1 <= GRP, (
                "the verify kernel folds spec_k+1 query rows per sequence"
            )
        self.prefill_token_buckets = tuple(config.prefill_buckets)
        # Active (tile, page) pair buckets per prefill token bucket: the
        # prefill kernel grid is a flat worklist, so its length is a compiled
        # shape too. Two rungs: a typical-load rung and the dense worst case.
        self.prefill_pair_buckets = {}
        for tb in self.prefill_token_buckets:
            nt = tb // self.q_tile
            full = nt * config.max_blocks_per_seq
            self.prefill_pair_buckets[tb] = tuple(
                sorted({min(4 * nt, full), full})
            )
        # Decode (group, page) pair buckets per decode batch bucket: the
        # decode kernel grid is a flat worklist too (r2 — the dense
        # groups x max_pages grid spent ~2/3 of its steps skipped at bench
        # shapes). Two rungs: 6 pages/group covers typical mixes; the dense
        # rung is the worst case.
        self.decode_pair_buckets = {}
        for sb in config.decode_buckets:
            ng = sb // GRP
            full = ng * config.max_blocks_per_seq
            self.decode_pair_buckets[sb] = tuple(
                sorted({min(6 * ng, full), full})
            )

        self._allocate_kv_cache()

        # Per-step PRNG stream for the Gumbel sampler (reference sampler.py).
        self._host_rng = np.random.default_rng(config.rng_seed)

        # enforce_eager skips ahead-of-time bucket compilation (the analogue
        # of the reference's "skip CUDA graph capture", model_runner.py:36);
        # buckets then compile lazily on first use.
        aot = config.aot_warmup
        if config.enforce_eager:
            aot = False
        if aot or (aot is None and self.is_tpu):
            self.warmup()

    # ------------------------------------------------------------- weights

    def _load_params(self, random_weights: bool):
        spec, cfg = self.spec, self.config
        if random_weights:
            # Generate directly on the accelerator, in storage dtype, already
            # sharded: this host's memory bandwidth (~40 MB/s writes) makes a
            # host-side multi-GB init + transfer take tens of minutes.
            self.params = self.family.device_init_params(
                spec, cfg.rng_seed, self.dtype,
                quant=cfg.quantization, tp=self.tp,
                shardings=self._param_shardings(),
            )
            return
        # Stream the checkpoint leaf-by-leaf: raw per-layer tensors transfer
        # in checkpoint dtype; fuse/transpose/cast/quantize all run on-device
        # (reference loader.py:12-28 streams tensor-by-tensor; on this host a
        # whole-checkpoint f32 materialization would take tens of minutes).
        plan = self.family.hf_param_plan(
            spec, tp=self.tp, ep=self.config.enable_expert_parallel
        )
        self.params = stream_params_to_device(
            spec,
            plan,
            cfg.model,
            tp=self.tp,
            dtype=self.dtype,
            quant_plan=dict(
                self.family.effective_quant_plan(cfg.quantization)
            ),
            quant_mode=cfg.quantization,
            shardings=self._param_shardings(),
            put=self._global_put,
            prequant=self._prequant,
        )

    def _global_put(self, arr, sharding):
        """device_put that also works when ``sharding`` spans multiple hosts
        (each host holds the full array; only addressable shards transfer)."""
        if self.n_proc == 1:
            return jax.device_put(arr, sharding)
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    def _param_pspecs(self):
        """PartitionSpecs per parameter: column-parallel weights shard the
        fused (rank-blocked) output dim, row-parallel shard the input dim,
        vocab-parallel embedding shards the vocab dim (reference
        linear.py/embed_head.py)."""
        col = P(None, None, "tp")    # [L, in, out/tp]
        row = P(None, "tp", None)    # [L, in/tp, out]
        rep_l = P(None, None)        # [L, d] norms
        vocab = P("tp", None)        # [V/tp, d]
        layers = {
            "input_norm": rep_l,
            "qkv_proj": col,
            "o_proj": row,
            "post_norm": rep_l,
        }
        if getattr(self.spec, "num_experts", 0):
            # MoE placements (router always replicated): TP shards each
            # expert's FFN width like the dense MLP; EP
            # (config.enable_expert_parallel) gives each rank E/tp
            # full-width experts (better MXU aspect ratios at high tp);
            # 2-D (config.expert_parallel_size) shards the expert dim over
            # "ep" AND each expert's width over "tp" — the checkpoint's
            # width layout is the rank-blocked TP fuse either way.
            layers["router"] = P(None, None, None)
            if self.ep > 1:
                layers["expert_gate_up"] = P(None, "ep", None, "tp")
                layers["expert_down"] = P(None, "ep", "tp", None)
            elif self.config.enable_expert_parallel:
                assert self.spec.num_experts % self.tp == 0, (
                    f"num_experts={self.spec.num_experts} must divide over "
                    f"tp={self.tp} for expert parallelism"
                )
                layers["expert_gate_up"] = P(None, "tp", None, None)
                layers["expert_down"] = P(None, "tp", None, None)
            else:
                layers["expert_gate_up"] = P(None, None, None, "tp")
                layers["expert_down"] = P(None, None, "tp", None)
        else:
            layers["gate_up_proj"] = col
            layers["down_proj"] = row
        if self.spec.has_qkv_bias:
            layers["qkv_bias"] = P(None, "tp")
        if self.spec.has_qk_norm:
            layers["q_norm"] = rep_l
            layers["k_norm"] = rep_l
        if getattr(self.spec, "sandwich_norms", False):
            layers["post_attn_norm"] = rep_l
            layers["post_ffn_norm"] = rep_l
        pspecs = {"embed": vocab, "layers": layers, "final_norm": P(None)}
        if not self.spec.tie_embeddings:
            pspecs["lm_head"] = vocab

        mode = self.config.quantization
        if mode:
            # Mirror QuantWeight leaves: q shards like the bf16 weight; the
            # scale drops the contraction dim (int8/fp8) or replaces it with a
            # group dim (int4), keeping the out-dim sharding.
            grouped = mode == "int4"

            def qw(spec_q, spec_scale):
                return QuantWeight(q=spec_q, scale=spec_scale, mode=mode)

            kinds = {
                "col": qw(col, P(None, None, "tp") if grouped else P(None, "tp")),
                "row": qw(row, P(None, "tp", None) if grouped else P(None, None)),
                "vocab": qw(vocab, P("tp", None) if grouped else P("tp")),
            }
            if getattr(self.spec, "num_experts", 0):
                # Expert stacks [L, E, in, out] + scales (int8: [L, E, out];
                # int4: k-packed q [L, E, in/2, out] with group scales
                # [L, E, in/g, out]). Under EP the expert dim shards (scales
                # follow). Under width-TP, gate_up shards its out dim (scales
                # follow) while down shards its contraction dim — int8's
                # per-out-channel scales stay replicated (partial dots sum
                # exactly; the scale multiply commutes with the psum), int4's
                # group dim shards with the contraction.
                if self.ep > 1:
                    # 2-D: expert dim over "ep", width over "tp" (col out /
                    # row contraction). int8 scales [L, E, out] follow the
                    # out dim for col and stay tp-replicated for row (the
                    # per-out-channel multiply commutes with the width
                    # psum); int4 group scales follow the sharded dim.
                    kinds["expert_col"] = qw(
                        P(None, "ep", None, "tp"),
                        P(None, "ep", None, "tp")
                        if grouped else P(None, "ep", "tp"),
                    )
                    kinds["expert_row"] = qw(
                        P(None, "ep", "tp", None),
                        P(None, "ep", "tp", None)
                        if grouped else P(None, "ep", None),
                    )
                elif self.config.enable_expert_parallel:
                    ep_q = P(None, "tp", None, None)
                    ep_s = ep_q if grouped else P(None, "tp", None)
                    kinds["expert_col"] = qw(ep_q, ep_s)
                    kinds["expert_row"] = qw(ep_q, ep_s)
                else:
                    kinds["expert_col"] = qw(
                        P(None, None, None, "tp"),
                        P(None, None, None, "tp")
                        if grouped else P(None, None, "tp"),
                    )
                    kinds["expert_row"] = qw(
                        P(None, None, "tp", None),
                        P(None, None, "tp", None)
                        if grouped else P(None, None, None),
                    )
            for path, kind in self.family.effective_quant_plan(mode).items():
                node = pspecs
                for key in path[:-1]:
                    node = node.get(key, {})
                if path[-1] in node:
                    node[path[-1]] = kinds[kind]
        return pspecs

    def _param_shardings(self):
        return jax.tree.map(
            lambda s: NamedSharding(self.mesh, s),
            self._param_pspecs(),
            is_leaf=lambda x: isinstance(x, P),
        )

    # ------------------------------------------------------------ KV cache

    @property
    def kv_quantized(self) -> bool:
        return self.config.kv_cache_dtype in ("int8", "int4")

    @property
    def _kv_storage_heads(self) -> int:
        """Value-array head dim: int4 packs two heads' nibbles per byte."""
        h = self.spec.num_kv_heads
        if self.config.kv_cache_dtype == "int4":
            assert h % (2 * self.tp) == 0, (
                f"int4 KV needs an even per-shard kv-head count "
                f"({h} heads / tp={self.tp})"
            )
            return h // 2
        return h

    def _kv_block_bytes(self) -> int:
        spec = self.spec
        hd = self.kernel_head_dim
        per_value = (
            0.5
            if self.config.kv_cache_dtype == "int4"
            else jnp.dtype(self.kv_dtype).itemsize
        )
        scale = 4 / hd if self.kv_quantized else 0  # f32 per (token, head)
        return int(
            2
            * spec.num_layers
            * self.config.kvcache_block_size
            * spec.num_kv_heads
            * hd
            * (per_value + scale)
        )

    def _probe_step_peak_bytes(self, probe_blocks: int) -> int:
        """Compile the largest prefill bucket against a ``probe_blocks``-page
        cache and read the compiler's per-device memory footprint (arguments
        + un-aliased outputs + temporaries). The TPU analogue of the
        reference's warmup-profiling (model_runner.py:91-114): exact, no
        hand-tuned activation constants."""
        cfg = self.config
        kv = self._make_kv_pool(probe_blocks)
        t = max(self.prefill_token_buckets)
        pb = max(self.prefill_pair_buckets[t]) if self.use_pallas else 1
        saved = cfg.num_kvcache_blocks
        cfg.num_kvcache_blocks = probe_blocks  # dummy tables index the probe
        try:
            inputs = self._dummy_inputs(t, cfg.max_num_seqs, True, pb)
        finally:
            cfg.num_kvcache_blocks = saved
        sp = None
        if cfg.spec_k > 0:
            sp = build_spec_inputs(
                [], num_seqs_bucket=cfg.max_num_seqs,
                max_model_len=cfg.max_model_len, is_prefill=True,
            )
        gin = self._empty_guided_inputs(cfg.max_num_seqs, True)
        # Guided builds probe the GUIDED prefill variant: its full-logits
        # mask path has strictly larger temporaries than the fused-sampler
        # plain step, so KV sizing stays safe.
        compiled = self._step.lower(
            self.params, kv, self.token_state, self.rope, inputs,
            None, sp, self.gtab, gin, True, False, False, False, False,
            False, False, cfg.guided_json,
        ).compile()
        ma = compiled.memory_analysis()
        summed = (
            int(ma.argument_size_in_bytes)
            + int(ma.output_size_in_bytes)
            + int(ma.temp_size_in_bytes)
            - int(ma.alias_size_in_bytes)
        )
        # peak_memory_in_bytes (where reported) also covers generated code
        # and runtime scratch; take the safer (larger) figure.
        peak = max(summed, int(getattr(ma, "peak_memory_in_bytes", 0) or 0))
        assert peak > 0
        # The probe cache (an argument) is replaced by the real pool.
        return peak - probe_blocks * (self._kv_block_bytes() // self.tp)

    def _auto_num_blocks(self) -> int:
        """Size the KV pool from free device memory (reference
        model_runner.py:103-114): limit x utilization minus the
        compiler-measured non-KV peak of the hungriest step program."""
        cfg = self.config
        stats = {}
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            pass
        limit = stats.get("bytes_limit")
        if not limit:
            if not self.is_tpu:
                # CPU / unknown backend: a small fixed pool. CPU XLA ignores
                # buffer donation, so every step copies the whole cache —
                # keep it tiny (tests/smoke only).
                return max(64, 32 * cfg.max_model_len // cfg.kvcache_block_size)
            # TPU without memory_stats (tunneled runtime): v5e exposes 15.75
            # GiB of usable HBM (measured from the compiler's OOM report).
            limit = cfg.hbm_bytes or int(15.75 * 1024**3)
        non_kv_peak = self._probe_step_peak_bytes(probe_blocks=64)
        free = int(limit * cfg.hbm_utilization) - non_kv_peak
        num = free // (self._kv_block_bytes() // self.tp)
        assert num > 0, (
            f"not enough device memory for KV cache: limit={limit}, "
            f"non-KV peak={non_kv_peak}"
        )
        return int(num)

    def _kv_pspec(self):
        # Head-major cache [L, Hkv, blocks, block, hd]: kv heads shard over
        # the TP axis (reference model_runner.py:111 shards kv_heads/world).
        # Quantized caches are (values, scales) pairs; scale slabs
        # [L, blocks, Hkv, block] (page-major so a page's slab is one aligned
        # [Hkv, block] tile) shard the same head dim.
        vals = P(None, "tp", None, None, None)
        if self.kv_quantized:
            return (vals, P(None, None, "tp", None))
        return vals

    def _allocate_kv_cache(self):
        cfg = self.config
        if cfg.num_kvcache_blocks == -1:
            cfg.num_kvcache_blocks = self._auto_num_blocks()
        self.kv = self._make_kv_pool(cfg.num_kvcache_blocks)

    def _make_kv_pool(self, num_blocks: int):
        cfg, spec = self.config, self.spec
        shape = (
            spec.num_layers,
            self._kv_storage_heads,
            num_blocks,
            cfg.kvcache_block_size,
            self.kernel_head_dim,
        )
        if self.kv_quantized:
            vspec, sspec = self._kv_pspec()
            vsh = NamedSharding(self.mesh, vspec)
            ssh = NamedSharding(self.mesh, sspec)

            # Scale slabs stay full-head ([Hkv], one f32 per token, head)
            # even when the values are nibble-packed.
            sshape = (
                spec.num_layers,
                num_blocks,
                spec.num_kv_heads,
                cfg.kvcache_block_size,
            )

            def pool():
                return (
                    self._device_zeros(shape, self.kv_dtype, vsh),
                    self._device_zeros(sshape, jnp.float32, ssh),
                )

            return (pool(), pool())
        sh = NamedSharding(self.mesh, self._kv_pspec())
        return (
            self._device_zeros(shape, self.kv_dtype, sh),
            self._device_zeros(shape, self.kv_dtype, sh),
        )

    @staticmethod
    def _device_zeros(shape, dtype, sharding, fill=0):
        """Allocate a filled (possibly multi-host) sharded buffer on device —
        no host materialization or transfer."""
        return jax.jit(
            lambda: jnp.full(shape, fill, dtype), out_shardings=sharding
        )()

    def _alloc_token_state(self):
        """On-device sampled-token state for the async pipeline:
        - last_buf[slot]: each sequence's latest sampled token, fed back as
          the next decode step's input (no host round-trip per step — a
          device->host fetch costs ~40ms through the tunneled runtime);
        - ring[K, S]: per-step sampled tokens, fetched in one transfer every
          K steps for EOS checks / output assembly;
        - lp_ring[K, S]: chosen-token log-probabilities, written only by the
          logprobs step variant (requests without logprobs pass it through
          untouched — zero compute, the buffer just rides the donation).
        """
        cfg = self.config
        self.num_slots = 2 * cfg.max_num_seqs + 1  # last = dead slot
        self.ring_size = cfg.fetch_interval
        # Ring rows must fit the widest compiled batch (decode buckets are
        # rounded up to kernel-group multiples, possibly past max_num_seqs).
        ring_width = max(cfg.max_num_seqs, max(cfg.decode_buckets))
        self.ring_width = ring_width
        rep = NamedSharding(self.mesh, P())
        # Speculative builds widen the ring to [ring, S, spec_k+2]: up to
        # spec_k+1 emitted tokens per seq per step plus an accepted count in
        # the last lane (one fetch still drains everything).
        ring_shape = (
            (self.ring_size, ring_width, cfg.spec_k + 2)
            if cfg.spec_k > 0 else (self.ring_size, ring_width)
        )
        state = [
            self._device_zeros((self.num_slots,), jnp.int32, rep),
            self._device_zeros(ring_shape, jnp.int32, rep),
            self._device_zeros(
                (self.ring_size, ring_width), jnp.float32, rep
            ),
        ]
        if cfg.num_penalty_slots > 0:
            # Penalty-count slabs (presence/frequency/repetition penalties,
            # ops/penalties.py): int32 output counts + int8 prompt presence,
            # one row per penalty slot plus a dead row for padding/masked
            # scatters. Only allocated when the feature is enabled, so the
            # plain build's step programs (and compile cache) are unchanged.
            rows = cfg.num_penalty_slots + 1
            v = self.spec.vocab_size
            state.append(self._device_zeros((rows, v), jnp.int32, rep))
            state.append(self._device_zeros((rows, v), jnp.int8, rep))
        if cfg.guided_json:
            # Guided-decoding automaton state (ops/guided.py): per-slot
            # state (-1 = unguided/inactive), stack depth, and the container
            # stack. Last row = dead slot for masked scatters.
            from nanovllm_tpu.ops.guided import DEPTH_CAP

            state.append(
                self._device_zeros((self.num_slots,), jnp.int32, rep, fill=-1)
            )
            state.append(
                self._device_zeros((self.num_slots,), jnp.int32, rep)
            )
            state.append(
                self._device_zeros(
                    (self.num_slots, DEPTH_CAP), jnp.int32, rep
                )
            )
        if cfg.spec_k > 0:
            # Speculative decoding device state (ops/spec.py): per-slot TRUE
            # sequence lengths (host lengths are pessimistic between drains)
            # and a token-history slab for ngram/prompt-lookup drafting.
            # ~4*max_model_len bytes per slot; last row = dead slot.
            state.append(
                self._device_zeros((self.num_slots,), jnp.int32, rep)
            )
            state.append(
                self._device_zeros(
                    (self.num_slots, cfg.max_model_len), jnp.int32, rep
                )
            )
        self.token_state = tuple(state)

    def _init_guided(self):
        """Compile the guided-decoding (JSON) automaton tables and place the
        device copies (ops/guided.py). Host copies stay for the re-prefill
        resume walk (a preempted guided sequence's completion tokens are
        known at re-admission, so the host rebuilds its automaton state)."""
        self.gtab = None
        self._guided_host = None
        if not self.config.guided_json:
            return
        assert self._guided_tokenizer is not None, (
            "guided_json=True requires the tokenizer at runner construction "
            "(the LLMEngine passes it; direct ModelRunner users must too)"
        )
        from nanovllm_tpu.ops import guided as guided_ops

        eos_ids = tuple(self.config.eos_ids or ()) or (
            (self.config.eos,) if self.config.eos >= 0 else ()
        )
        t = guided_ops.build_engine_tables(
            self._guided_tokenizer, self.spec.vocab_size, eos_ids
        )
        self._guided_eos_ids = eos_ids
        # JSON-Schema slots (ops/guided_schema.py): per-schema automata
        # occupy reserved row ranges appended to the generic block — the
        # device mask/walk programs index by global state id, so installing
        # a schema is a table update, never a recompile.
        self._n_generic = t["trans"].shape[0]
        slots, per = (self.config.guided_schema_slots,
                      self.config.guided_schema_states)
        assert self._n_generic + slots * per < guided_ops.ACT_LSB, (
            f"guided tables need {self._n_generic + slots * per} state rows "
            f"but global ids must stay < ACT_LSB={guided_ops.ACT_LSB} (they "
            f"share the transition entries with the stack-action packing); "
            f"lower guided_schema_slots/states"
        )
        if slots > 0:
            pad_t = np.zeros((slots * per, 4, 257), np.int32)
            pad_a = np.zeros((slots * per, 4), bool)
            pad_m = np.zeros(
                (slots * per,) + t["maskbits"].shape[1:], np.int32
            )
            t["trans"] = np.concatenate([t["trans"], pad_t])
            t["accept"] = np.concatenate([t["accept"], pad_a])
            t["maskbits"] = np.concatenate([t["maskbits"], pad_m])
        self._guided_host = t
        # schema registry: canonical schema text -> {slot, start, seqs};
        # a slot is evictable once every seq that used it finished.
        self._schema_registry = {}
        self._schema_slot_key = [None] * slots
        self._install_jit = None
        rep = NamedSharding(self.mesh, P())

        def put(a):  # multihost-safe replicated placement
            return jax.make_array_from_callback(
                np.shape(a), rep, lambda idx: np.asarray(a)[idx]
            )

        self._guided_put = put
        self.gtab = (
            put(t["trans"]), put(t["maskbits"]), put(t["token_bytes"]),
        )

    def ensure_guided_schema(self, schema: dict, seq=None) -> int:
        """Per-request guided automaton: a JSON Schema dict, or
        ``{"regex": pattern}`` (vLLM guided_regex; full-match semantics) —
        both compile to char-level DFAs in the same table format and share
        the slot machinery. Returns the global start state for GuidedInputs
        arming. Raises SchemaError/RegexError outside the supported subsets,
        RuntimeError when every slot is still referenced by an unfinished
        request."""
        import json as _json

        from nanovllm_tpu.ops import guided_schema as gs

        if set(schema) == {"regex"}:
            from nanovllm_tpu.ops.guided_regex import build_regex_automaton

            pat = schema["regex"]
            assert isinstance(pat, str), pat
            return self._ensure_guided_automaton(
                "re:" + pat,
                lambda cap: build_regex_automaton(pat, cap), seq,
            )
        if set(schema) == {"choice"}:
            # Bare-text choices (vLLM guided_choice): the completion IS one
            # of the strings — unlike {"enum": [...]}, which is the
            # JSON-value form (strings come out quoted).
            choices = tuple(str(c) for c in schema["choice"])
            return self._ensure_guided_automaton(
                "ch:" + _json.dumps(choices),
                lambda cap: gs.build_choice_automaton(choices, cap), seq,
            )
        return self._ensure_guided_automaton(
            "js:" + _json.dumps(schema, sort_keys=True, separators=(",", ":")),
            lambda cap: gs.build_schema_automaton(schema, cap), seq,
        )

    def _ensure_guided_automaton(self, key: str, build, seq=None) -> int:
        from nanovllm_tpu.ops import guided_schema as gs

        cfg = self.config
        assert cfg.guided_schema_slots > 0, (
            "schema/regex guided requests need Config(guided_schema_slots>0)"
        )
        ent = self._schema_registry.get(key)
        if ent is None:
            per = cfg.guided_schema_states
            trans_l, accept_l, n = build(per + 1)
            th = self._guided_host
            packed_l, _ = gs.compile_masks_dfa(
                trans_l, accept_l, th["token_bytes"], th["token_len"],
                eos_ids=self._guided_eos_ids,
            )
            slot = None
            for i, k in enumerate(self._schema_slot_key):
                if k is None:
                    slot = i
                    break
            if slot is None:
                for i, k in enumerate(self._schema_slot_key):
                    old = self._schema_registry[k]
                    old["seqs"] = [
                        s for s in old["seqs"] if not s.is_finished
                    ]
                    if not old["seqs"]:
                        slot = i
                        del self._schema_registry[k]
                        break
            if slot is None:
                raise RuntimeError(
                    f"all {cfg.guided_schema_slots} guided-schema slots are "
                    f"held by in-flight requests (Config.guided_schema_slots)"
                )
            base = self._n_generic + slot * per
            gt = gs.remap_to_global(trans_l, base)          # [n, 257] local-rowed
            tb4 = np.zeros((per, 4, 257), np.int32)
            tb4[: n - 1] = gt[1:n, None, :]                 # replicate tops
            mb = np.zeros((per, 4, packed_l.shape[-1]), np.int32)
            mb[: n - 1] = packed_l[1:n]
            ab = np.zeros((per, 4), bool)
            ab[: n - 1] = accept_l[1:n, None]
            th["trans"][base: base + per] = tb4
            th["maskbits"][base: base + per] = mb
            th["accept"][base: base + per] = ab
            if self._install_jit is None:
                rep = NamedSharding(self.mesh, P())

                def inst(tg, mg, tb, mbk, b):
                    return (
                        jax.lax.dynamic_update_slice(tg, tb, (b, 0, 0)),
                        jax.lax.dynamic_update_slice(mg, mbk, (b, 0, 0)),
                    )

                self._install_jit = jax.jit(
                    inst, donate_argnums=(0, 1),
                    out_shardings=(rep, rep),
                )
            tg, mg, tok = self.gtab
            tg, mg = self._install_jit(
                tg, mg, self._guided_put(tb4), self._guided_put(mb),
                np.int32(base),
            )
            self.gtab = (tg, mg, tok)
            ent = dict(slot=slot, start=base, seqs=[])
            self._schema_registry[key] = ent
            self._schema_slot_key[slot] = key
        if seq is not None:
            ent["seqs"] = [
                s for s in ent["seqs"] if not s.is_finished
            ] + [seq]
        return ent["start"]

    def _guided_resume(self, seq):
        """(state, depth, stack) after the completion tokens emitted so far —
        the host-side walk backing re-prefill resumes."""
        from nanovllm_tpu.ops import guided as guided_ops

        t = self._guided_host
        w = guided_ops.HostWalker(
            t["trans"], t["accept"], t["token_bytes"], t["token_len"],
            depth_cap=guided_ops.DEPTH_CAP,
            start=getattr(seq, "guided_start", 1),
        )
        for tok in seq.token_ids[seq.num_prompt_tokens: seq.num_tokens]:
            if not w.feed_token(int(tok)):
                break  # parked in DEAD: the device walk will agree
        return w.state, len(w.stack), list(w.stack)

    def _init_rope(self):
        """Precompute the RoPE cos/sin tables once, replicated on device, and
        pass them through the step jit as *arguments*: computed in-trace they
        either bloat every bucket executable with a [max_position, hd/2] x2
        folded constant or recompute per step (VERDICT r1 weak #6)."""
        rep = NamedSharding(self.mesh, P())
        self.rope = jax.jit(
            lambda: self.family.rope_tables(self.spec), out_shardings=(rep, rep)
        )()

    # ------------------------------------------------------------- step fn

    @property
    def use_pallas(self) -> bool:
        if self.config.use_pallas_attention is None:
            return self.is_tpu
        return self.config.use_pallas_attention

    @property
    def kernel_head_dim(self) -> int:
        """head_dim as seen by the Pallas kernels / paged cache. Mosaic
        requires the cache's lane (head_dim) dim to be whole 128-lane tiles
        (a [.., hd=64] HBM memref is lane-padded and page slices break —
        measured on v5e); smaller/off-size head dims (64, 96: Qwen2-0.5B,
        Llama-2, Phi) run the SAME kernels with the cache and q/k/v
        zero-padded to the next 128 multiple. Zero K lanes add 0 to scores
        and zero V lanes produce discarded output lanes, so numerics are
        unchanged; cost is proportional KV-memory overhead (2x at hd=64).
        The jnp oracle path never pads."""
        if not self.use_pallas:
            return self.spec.head_dim
        return -(-self.spec.head_dim // 128) * 128

    def _attn_impls(self):
        """(prefill_impl, decode_impl, spec_impl) — Pallas kernels on TPU,
        jnp oracle elsewhere (the oracle serves all modes). Signature:
        (q, k_new, v_new, k_all, v_all, layer, meta[, window]) ->
        (out, k_all, v_all); the impl also appends the new K/V rows to the
        paged cache. ``window`` (a traced i32 scalar) is passed per layer by
        the model when spec.layer_windows is set (Gemma3 local/global mix);
        otherwise the spec's uniform window (or None) is baked in here.
        ``spec_impl`` is the decode kernel's q_len = spec_k+1 verify mode
        (None when spec_k == 0)."""
        sm_scale = (
            getattr(self.spec, "query_scale", None) or self.spec.head_dim
        ) ** -0.5
        window = getattr(self.spec, "sliding_window", None)
        if self.use_pallas:
            from nanovllm_tpu.ops.pallas.ragged_attention import (
                paged_decode_attention,
                ragged_prefill_attention,
            )

            hd, khd = self.spec.head_dim, self.kernel_head_dim

            def padded(impl):
                """Zero-pad q/k/v head_dim to the kernel's 128-lane multiple
                and slice the output back (see kernel_head_dim). Zero K lanes
                contribute 0 to every score; zero V lanes produce output
                lanes that are sliced away."""
                if khd == hd:
                    return impl

                def pad(x):
                    return jnp.pad(x, ((0, 0), (0, 0), (0, khd - hd)))

                def wrapped(q, kn, vn, kc, vc, layer, meta, **kw):
                    o, kc, vc = impl(pad(q), pad(kn), pad(vn), kc, vc, layer,
                                     meta, **kw)
                    return o[:, :, :hd], kc, vc

                return wrapped

            prefill = padded(
                lambda q, kn, vn, kc, vc, layer, meta, window=window: (
                    ragged_prefill_attention(
                        q, kn, vn, kc, vc, layer, meta,
                        sm_scale=sm_scale, q_tile=self.q_tile, window=window,
                    )
                )
            )
            decode = padded(
                lambda q, kn, vn, kc, vc, layer, meta, window=window: (
                    paged_decode_attention(
                        q, kn, vn, kc, vc, layer, meta, sm_scale=sm_scale,
                        window=window,
                    )
                )
            )
            spec_impl = None
            if self.config.spec_k > 0:
                ql = self.config.spec_k + 1
                spec_impl = padded(
                    lambda q, kn, vn, kc, vc, layer, meta: (
                        paged_decode_attention(
                            q, kn, vn, kc, vc, layer, meta,
                            sm_scale=sm_scale, q_len=ql,
                        )
                    )
                )
            return prefill, decode, spec_impl
        ref = lambda q, kn, vn, kc, vc, layer, meta, window=window: (
            attn_ops.ragged_paged_attention_ref(
                q, kn, vn, kc, vc, layer, meta, sm_scale=sm_scale,
                window=window,
            )
        )
        return ref, ref, ref

    def _build_step_fns(self):
        spec, cfg = self.spec, self.config
        # Prefill kernel q-tile (per-seq packed alignment). Bigger tiles mean
        # fewer (tile, page) pairs with larger dots per pair at the cost of
        # more padding for short chunks (env knob for perf experiments).
        self.q_tile = int(os.environ.get("NANOVLLM_Q_TILE", 128))
        prefill_impl, decode_impl, spec_impl = self._attn_impls()
        family = self.family
        tp = self.tp
        # Any sharded topology (tp > 1 or a 2-D ep x tp mesh) runs the step
        # as the per-device program under shard_map; a size-1 "tp" axis
        # makes its psums free no-ops.
        sharded = tp > 1 or self.ep > 1
        axis = "tp" if sharded else None
        ep_axis = "ep" if self.ep > 1 else None

        spec_build = cfg.spec_k > 0
        QL = cfg.spec_k + 1
        guided_build = cfg.guided_json
        gbase = 3 + (2 if cfg.num_penalty_slots > 0 else 0)
        spec_base = gbase + (3 if guided_build else 0)

        def local_step(params, kv, tstate, rope, inputs: StepInputs,
                       pen: PenaltyInputs | None, sp: SpecInputs | None,
                       gtab, gin: GuidedInputs | None,
                       is_prefill: bool, filtered: bool, want_lp: bool,
                       biased: bool, seeded: bool, penalized: bool,
                       spec_step: bool, guided: bool):
            """Per-device program (the whole program when tp == 1)."""
            last_buf, ring, lp_ring = tstate[0], tstate[1], tstate[2]
            gstate = gdepth = gstack = None
            if guided_build:
                # Guided-decoding automaton state (ops/guided.py). Prefill
                # steps clear stale slot state and arm completing guided
                # rows (program order: clear, then arm, then mask/walk).
                gstate, gdepth, gstack = tstate[gbase: gbase + 3]
                gdead = gstate.shape[0] - 1
                if is_prefill:
                    gstate = gstate.at[gin.clear_slots].set(-1)
                    gdepth = gdepth.at[gin.clear_slots].set(0)
                    gstack = gstack.at[gin.clear_slots].set(0)
                    gstate = gstate.at[gin.set_slots].set(gin.set_state)
                    gdepth = gdepth.at[gin.set_slots].set(gin.set_depth)
                    gstack = gstack.at[gin.set_slots].set(gin.set_stack)
                    # The dead row must stay inactive whatever landed on it.
                    gstate = gstate.at[gdead].set(-1)
            seq_lens_buf = hist_buf = None
            if spec_build:
                # Speculative state (device truth): per-slot lengths + token
                # history. Host lengths are pessimistic between drains, so in
                # spec builds every decode step derives positions/appends from
                # these instead of the host-built skeleton.
                seq_lens_buf = tstate[spec_base]
                hist_buf = tstate[spec_base + 1]
                dead_slot = last_buf.shape[0] - 1
                hist_w = hist_buf.shape[1]
            pcounts = pmask = None
            if penalized:
                # Presence/frequency/repetition penalties (ops/penalties.py):
                # maintain the on-device count slabs so the next chained step
                # sees every token sampled so far without any host sync.
                pcounts, pmask = tstate[3], tstate[4]
                dead = pcounts.shape[0] - 1
                pcounts = pcounts.at[pen.reset_slots].set(0)
                pmask = pmask.at[pen.reset_slots].set(0)
                if is_prefill:
                    # Count this chunk's tokens: completions (re-prefill after
                    # preemption re-embeds them) into the output counts,
                    # prompt tokens into the prompt-presence mask. Penalized
                    # prompts bypass the prefix cache, so every prompt token
                    # passes through here exactly once.
                    tok_slots = pen.pslots[inputs.seq_ids]
                    is_out = (
                        inputs.positions >= pen.prompt_lens[inputs.seq_ids]
                    )
                    valid = inputs.slot_mapping >= 0
                    pcounts = pcounts.at[tok_slots, inputs.token_ids].add(
                        (is_out & valid).astype(pcounts.dtype)
                    )
                    mslots = jnp.where((~is_out) & valid, tok_slots, dead)
                    pmask = pmask.at[mslots, inputs.token_ids].set(1)
            S = inputs.kv_lens.shape[0]
            qtok = eligible = real = lens = slot = jql = None
            if spec_build and not is_prefill:
                bs = cfg.kvcache_block_size
                wmax = inputs.block_tables.shape[1]
                slot = inputs.slot_ids
                real = jnp.arange(S, dtype=jnp.int32) < inputs.num_seqs[0]
                lens = jnp.maximum(seq_lens_buf[slot], 1)  # true lengths
                if spec_step:
                    # Draft spec_k tokens per row from its own history
                    # (prompt-lookup), run the K+1-row verify chunk, and keep
                    # the accepted prefix: greedy rows by argmax identity,
                    # sampled rows by exact rejection sampling (ops/spec.py).
                    # Ineligible rows (too close to their length cap) emit
                    # exactly one token — normal decode semantics.
                    assert not (filtered or want_lp or biased or seeded
                                or penalized), "spec steps are plain-only"
                    drafts = spec_ops.ngram_propose(
                        hist_buf[slot], jnp.where(real, lens, 0), cfg.spec_k
                    )
                    last = last_buf[slot]
                    qtok = jnp.concatenate([last[:, None], drafts], axis=1)
                    eligible = real & (lens + QL <= sp.limits)
                    jql = jnp.arange(QL, dtype=jnp.int32)
                    pos = (lens - 1)[:, None] + jql[None, :]   # [S, QL]
                    # Append only rows the device may keep: row 0 always (the
                    # real last token's KV), drafts only when eligible, and
                    # never at/past the length cap (the reserved block table
                    # ends there). Junk draft KV is overwritten by the next
                    # step's appends (its frontier is always at or below).
                    ok = (
                        real[:, None]
                        & (pos < sp.limits[:, None])
                        & (eligible[:, None] | (jql[None, :] == 0))
                    )
                    page = jnp.take_along_axis(
                        inputs.block_tables,
                        jnp.minimum(pos // bs, wmax - 1), axis=1,
                    )
                    seq_col = jnp.where(
                        real[:, None],
                        jnp.arange(S, dtype=jnp.int32)[:, None], S,
                    )
                    inputs = inputs._replace(
                        token_ids=jnp.maximum(qtok, 0).reshape(S * QL),
                        positions=jnp.where(real[:, None], pos, 0)
                        .reshape(S * QL),
                        slot_mapping=jnp.where(
                            ok, page * bs + pos % bs, -1
                        ).reshape(S * QL),
                        seq_ids=jnp.broadcast_to(seq_col, (S, QL))
                        .reshape(S * QL),
                        kv_lens=jnp.where(real, lens - 1 + QL, 0),
                        # Fused-append row count per seq for the verify
                        # kernel (matches the slot_mapping mask above).
                        append_lens=jnp.where(
                            real, jnp.where(eligible, QL, 1), 0
                        ),
                    )
                else:
                    # Fallback decode (filtered/biased/seeded/penalized/
                    # logprobs batches): one token per row, but positions and
                    # appends still come from the device-true lengths.
                    pos0 = lens - 1
                    page0 = jnp.take_along_axis(
                        inputs.block_tables,
                        jnp.minimum(pos0[:, None] // bs, wmax - 1), axis=1,
                    )[:, 0]
                    inputs = inputs._replace(
                        token_ids=last_buf[slot],
                        positions=jnp.where(real, pos0, 0),
                        slot_mapping=jnp.where(
                            real, page0 * bs + pos0 % bs, -1
                        ),
                        kv_lens=jnp.where(real, lens, 0),
                    )
            elif not is_prefill:
                # Decode inputs come from the on-device last-token buffer —
                # the host never needs the sampled values to keep stepping.
                token_ids = last_buf[inputs.slot_ids]
                inputs = inputs._replace(token_ids=token_ids)
            if spec_build and is_prefill:
                # History slab upkeep: scatter this chunk's tokens at their
                # absolute positions (re-prefill after preemption re-embeds
                # completions, so the row rebuilds; prefix-cached tokens are
                # not re-embedded — their history entries may be stale, which
                # only affects draft QUALITY, never correctness: acceptance
                # compares every draft against the model's own argmax).
                valid = inputs.slot_mapping >= 0
                tok_slot = jnp.where(
                    valid,
                    inputs.slot_ids[jnp.minimum(inputs.seq_ids, S - 1)],
                    dead_slot,
                )
                hist_buf = hist_buf.at[
                    tok_slot, jnp.clip(inputs.positions, 0, hist_w - 1)
                ].set(inputs.token_ids)
            hidden, kv = family.forward(
                spec,
                params,
                kv,
                inputs,
                tp=tp,
                axis=axis,
                attn_impl=(
                    prefill_impl if is_prefill
                    else (spec_impl if spec_step else decode_impl)
                ),
                scan_layers=cfg.scan_layers,
                rope=rope,
                moe_ep=cfg.enable_expert_parallel,
                ep_axis=ep_axis,
            )
            w = family.lm_head_weight(params)        # [V(/tp), D]
            if spec_step:
                # Verify + accept, all on device. One fused chunked pass
                # over the LM head yields every position's argmax (greedy
                # acceptance) AND each draft's temperature-scaled logprob
                # (rejection-sampling acceptance for temperature>0 rows);
                # then ONE head_sample over S rows draws the corrective /
                # bonus token at each row's first-rejection position, with
                # the rejected draft banned (the exact residual
                # distribution). No [S*QL, V] logits materialize, and under
                # TP the vocab stays sharded throughout.
                idx0 = jnp.arange(S, dtype=jnp.int32) * QL
                key = jax.random.wrap_key_data(inputs.rng)
                ukey, skey = jax.random.split(key)
                check = jnp.concatenate(
                    [qtok[:, 1:], jnp.full((S, 1), -1, jnp.int32)], axis=1
                ).reshape(S * QL)
                am, logp = spec_ops.head_verify_stats_tp(
                    hidden, w, check,
                    jnp.repeat(inputs.temperatures, QL), axis,
                )
                am = am.reshape(S, QL)
                logp = logp.reshape(S, QL)[:, : QL - 1]
                logu = jnp.log(
                    jax.random.uniform(ukey, (S, QL - 1), jnp.float32)
                )
                a, excl = spec_ops.verify_accept(
                    qtok, am, logp, logu, inputs.temperatures, eligible
                )
                corrective = ops_sampling.head_sample(
                    hidden[idx0 + a], w, inputs.temperatures, skey,
                    axis=axis, v_total=quant.shape_of(w)[0] * tp,
                    exclude=excl,
                )
                emitted, cnt = spec_ops.emit_tokens(qtok, a, corrective)
                # Never grow past the per-row cap (min(prompt + max_tokens,
                # max_model_len)); rows at the cap emit nothing (count 0) —
                # the host finishes them at the next drain.
                cnt = jnp.where(
                    real,
                    jnp.minimum(cnt, jnp.maximum(sp.limits - lens, 0)),
                    0,
                )
                new_last = jnp.take_along_axis(
                    emitted, jnp.maximum(cnt - 1, 0)[:, None], axis=1
                )[:, 0]
                last_buf = last_buf.at[slot].set(
                    jnp.where(cnt > 0, new_last, last)
                )
                seq_lens_buf = seq_lens_buf.at[slot].add(
                    jnp.where(real, cnt, 0)
                )
                keep = jql[None, :] < cnt[:, None]
                hist_buf = hist_buf.at[
                    jnp.where(keep, slot[:, None], dead_slot),
                    jnp.clip(
                        jnp.where(keep, lens[:, None] + jql[None, :], 0),
                        0, hist_w - 1,
                    ),
                ].set(emitted)
                row = jnp.zeros((ring.shape[1], QL + 1), jnp.int32)
                row = row.at[:S, :QL].set(emitted).at[:S, QL].set(cnt)
                ring = jax.lax.dynamic_update_slice(
                    ring, row[None],
                    (inputs.ring_pos[0], jnp.int32(0), jnp.int32(0)),
                )
                out_state = [last_buf, ring, lp_ring]
                out_state += list(tstate[3:spec_base])  # penalty slabs ride
                out_state += [seq_lens_buf, hist_buf]
                return kv, tuple(out_state)
            # Last-token-only before the LM-head matmul (embed_head.py:56-60).
            last_h = hidden[inputs.last_token_idx]  # [S, D]
            # Plain/seeded sampling never materializes [S, V] logits at all:
            # head_sample fuses the chunked head matmul with the Gumbel
            # argmax (the unfused tail measured ~1.5 ms/step in the r4
            # xplane decode profile), and under TP the vocab stays sharded —
            # a [tp, S] scalar reduce replaces the [S, V] logits all-gather
            # (the second-largest per-step collective at large batch:
            # ~155 MB at S=256, V=152k), bit-identically. Variants that
            # transform or read the full distribution (penalties,
            # logit_bias, top-k/p, logprobs) compute and gather logits.
            fused_sample = not (
                penalized or biased or filtered or want_lp or guided
            )
            # Filtered batches under TP keep the vocab sharded too
            # (per-rank top-window + lse partials, ~1 MB gathered;
            # sample_topk_topp_tp) unless penalties/bias/logprobs must
            # transform or read the full distribution.
            shard_filter = (
                filtered and axis is not None
                and not (penalized or biased or want_lp or guided)
            )
            if not fused_sample:
                logits = quant.head_matmul(last_h, w)
                if axis is not None and not shard_filter:
                    # Vocab shards are rank-blocked: all-gather restores
                    # global order (TPU: all_gather over ICI beats the
                    # reference's gather-to-rank-0, embed_head.py:62-66).
                    logits = jax.lax.all_gather(
                        logits, axis, axis=1, tiled=True
                    )
            if guided:
                # JSON-mode -inf masking by each row's (state, top) allowed
                # set, BEFORE penalties/bias/temperature (ops/guided.py);
                # unguided rows (state -1) pass through untouched.
                logits = guided_ops.mask_logits(
                    logits, gstate, gdepth, gstack, inputs.slot_ids,
                    gtab[1],
                )
            if penalized:
                # vLLM order: penalties before logit_bias / temperature /
                # filtering. Rows without penalties gather the dead slab row
                # but their neutral (0, 0, 1) parameters make this identity.
                prows = pen.pslots[: logits.shape[0]]
                logits = penalty_ops.apply_penalties(
                    logits.astype(jnp.float32), pcounts[prows], pmask[prows],
                    pen.presence, pen.frequency, pen.repetition,
                )
            if biased:
                # Additive logit_bias (OpenAI semantics), applied before
                # temperature / filtering / logprobs. One [S, K] scatter-add
                # into the gathered full-vocab logits; padding rows add 0.0
                # at token 0. Separate compiled variant — plain requests
                # never pay the scatter.
                rows = jnp.arange(logits.shape[0], dtype=jnp.int32)[:, None]
                logits = logits.astype(jnp.float32).at[
                    rows, inputs.bias_ids
                ].add(inputs.bias_vals)
            key = jax.random.wrap_key_data(inputs.rng)
            # "seeded" variant: per-request reproducible noise streams keyed
            # by (seed, sampled position) — see ops.sampling._row_gumbel.
            seeds = inputs.seeds if seeded else None
            pos = inputs.kv_lens if seeded else None
            if shard_filter:
                tokens = ops_sampling.sample_topk_topp_tp(
                    logits, inputs.temperatures, key, inputs.top_ks,
                    inputs.top_ps, axis, quant.shape_of(w)[0] * tp,
                    seeds, pos, inputs.min_ps,
                )
            elif filtered:
                # Separate compiled variant: requests without
                # top-k/top-p/min-p never pay for the lax.top_k window.
                tokens = sample_topk_topp(
                    logits, inputs.temperatures, key, inputs.top_ks,
                    inputs.top_ps, seeds, pos, inputs.min_ps,
                )
            elif fused_sample:
                tokens = ops_sampling.head_sample(
                    last_h, w, inputs.temperatures, key, axis=axis,
                    v_total=quant.shape_of(w)[0] * tp, seeds=seeds,
                    positions=pos,
                )
            else:
                tokens = sample(logits, inputs.temperatures, key, seeds, pos)
            if penalized:
                # Count the sampled token BEFORE the next chained decode step
                # reads the slab (append_inc masks incomplete-chunk samples).
                pcounts = pcounts.at[prows, tokens].add(pen.append_inc)
            if guided:
                # Advance each guided row's automaton by its sampled token —
                # the exact pushdown walk (real stack), so the next chained
                # step's mask is ready without any host sync.
                gstate, gdepth, gstack = guided_ops.walk_sampled(
                    gstate, gdepth, gstack, inputs.slot_ids, tokens,
                    gtab[0], gtab[2], gdead,
                )
            last_buf = last_buf.at[inputs.slot_ids].set(tokens)
            if spec_build:
                # Maintain the spec device state on every variant so spec and
                # fallback steps interleave freely, and write the widened
                # [S, QL+1] ring row (token in lane 0, accepted count last).
                if is_prefill:
                    slot = inputs.slot_ids
                    seq_lens_buf = seq_lens_buf.at[slot].set(sp.set_lens)
                    hist_buf = hist_buf.at[
                        jnp.where(sp.append_inc > 0, slot, dead_slot),
                        jnp.clip(sp.set_lens - 1, 0, hist_w - 1),
                    ].set(tokens)
                    counts = sp.append_inc
                else:
                    counts = jnp.where(real, 1, 0)
                    seq_lens_buf = seq_lens_buf.at[slot].add(counts)
                    hist_buf = hist_buf.at[
                        jnp.where(real, slot, dead_slot),
                        jnp.clip(lens, 0, hist_w - 1),
                    ].set(tokens)
                row = jnp.zeros((ring.shape[1], QL + 1), jnp.int32)
                row = row.at[:S, 0].set(tokens).at[:S, QL].set(counts)
                ring = jax.lax.dynamic_update_slice(
                    ring, row[None],
                    (inputs.ring_pos[0], jnp.int32(0), jnp.int32(0)),
                )
            else:
                ring = jax.lax.dynamic_update_slice(
                    ring, tokens[None], (inputs.ring_pos[0], jnp.int32(0))
                )
            if want_lp:
                # Chosen-token model log-prob (raw logits, not temperature-
                # scaled — OpenAI semantics). Separate compiled variant: the
                # logsumexp reads the whole [S, V] logits again, so plain
                # requests never pay for it.
                lf = logits.astype(jnp.float32)
                lse = jax.scipy.special.logsumexp(lf, axis=-1)
                chosen = jnp.take_along_axis(lf, tokens[:, None], axis=1)[:, 0]
                lp_ring = jax.lax.dynamic_update_slice(
                    lp_ring, (chosen - lse)[None],
                    (inputs.ring_pos[0], jnp.int32(0)),
                )
            out_state = [last_buf, ring, lp_ring]
            if cfg.num_penalty_slots > 0:
                out_state += (
                    [pcounts, pmask] if penalized
                    else list(tstate[3:5])  # slabs ride the donation
                )
            if guided_build:
                out_state += [gstate, gdepth, gstack]
            if spec_build:
                out_state += [seq_lens_buf, hist_buf]
            return kv, tuple(out_state)

        if not sharded:
            step = local_step
        else:
            kv_spec = (self._kv_pspec(), self._kv_pspec())
            tstate_spec = tuple(P() for _ in self.token_state)
            inputs_spec = StepInputs(*([P()] * len(StepInputs._fields)))
            pen_spec = PenaltyInputs(*([P()] * len(PenaltyInputs._fields)))

            sp_spec = SpecInputs(*([P()] * len(SpecInputs._fields)))
            gtab_spec = (P(), P(), P())
            gin_spec = GuidedInputs(*([P()] * len(GuidedInputs._fields)))

            def step(params, kv, tstate, rope, inputs, pen, sp, gtab, gin,
                     is_prefill, filtered, want_lp, biased, seeded,
                     penalized, spec_step, guided):
                def inner(p, k, t, r, i, *rest):
                    rest = list(rest)
                    pn = rest.pop(0) if pen is not None else None
                    spv = rest.pop(0) if sp is not None else None
                    gt = rest.pop(0) if gtab is not None else None
                    gv = rest.pop(0) if gin is not None else None
                    return local_step(p, k, t, r, i, pn, spv, gt, gv,
                                      is_prefill, filtered, want_lp, biased,
                                      seeded, penalized, spec_step, guided)

                extra, extra_spec = (), ()
                if pen is not None:
                    extra += (pen,)
                    extra_spec += (pen_spec,)
                if sp is not None:
                    extra += (sp,)
                    extra_spec += (sp_spec,)
                if gtab is not None:
                    extra += (gtab, gin)
                    extra_spec += (gtab_spec, gin_spec)
                return _shard_map(
                    inner,
                    mesh=self.mesh,
                    in_specs=(self._param_pspecs(), kv_spec, tstate_spec,
                              (P(), P()), inputs_spec) + extra_spec,
                    out_specs=(kv_spec, tstate_spec),
                )(params, kv, tstate, rope, inputs, *extra)

        # KV + token-state buffers are donated: the kernels update the cache
        # in place; one compiled program per (shape bucket, mode) — the TPU
        # analogue of the reference's CUDA-graph set (model_runner.py:222-257).
        self._step_fn = step  # raw (un-jitted) for AOT/lowering consumers
        self._step = jax.jit(
            step, donate_argnums=(1, 2),
            static_argnums=(9, 10, 11, 12, 13, 14, 15, 16),
        )
        # AOT executables per (t_bucket, s_bucket, is_prefill); filled by
        # warmup(). Misses fall back to the jit path (compile on first hit).
        self._compiled = {}

    # -------------------------------------------------------------- warmup

    def _empty_guided_inputs(self, s_bucket: int, is_prefill: bool):
        if not self.config.guided_json:
            return None
        return build_guided_inputs(
            [], num_seqs_bucket=s_bucket, dead_slot=self.num_slots - 1,
            is_prefill=is_prefill,
        )

    def _dummy_inputs(self, t_bucket: int, s_bucket: int, is_prefill: bool,
                      p_bucket: int = 1, spec_step: bool = False):
        n = min(2, s_bucket) if is_prefill else s_bucket
        ql = self.config.spec_k + 1 if spec_step else 1
        reqs = []
        for i in range(n):
            chunk = [1] * (2 if is_prefill else ql)
            start = 0 if is_prefill else 1
            # Clamp dummy tables to the pool: a decode bucket can exceed
            # num_kvcache_blocks, and the fused write-back DMAs to page i.
            reqs.append(
                dict(token_ids=chunk, start=start, kv_len=start + len(chunk),
                     block_table=[i % self.config.num_kvcache_blocks],
                     temperature=1.0)
            )
        q_tile = self.q_tile if (is_prefill and self.use_pallas) else None
        group_pairs = GRP if (not is_prefill and self.use_pallas) else None
        return build_step_inputs(
            reqs,
            block_size=self.config.kvcache_block_size,
            num_tokens_bucket=t_bucket,
            num_seqs_bucket=s_bucket,
            max_blocks_per_seq=self.config.max_blocks_per_seq,
            rng=np.zeros(2, np.uint32),
            q_tile=q_tile,
            num_slots=self.num_slots,
            num_pairs_bucket=p_bucket,
            group_pairs=group_pairs,
        )

    def warmup(self):
        """AOT-compile every shape bucket (the analogue of the reference's
        warmup + CUDA-graph capture, model_runner.py:91-101/222-257): one
        program per decode bucket + one per prefill token bucket. With the
        persistent compilation cache this is fast on every run but the
        first."""
        cfg = self.config
        # Each job: (t_bucket, s_bucket, p_bucket, is_prefill, flags) where
        # flags ⊆ {filtered, want_lp, biased, seeded, penalized, spec_step,
        # guided} marks the compiled step variant.
        jobs = []

        def decode_ladder(**flags):
            ql = cfg.spec_k + 1 if flags.get("spec_step") else 1
            for b in cfg.decode_buckets:
                for pb in (
                    self.decode_pair_buckets[b] if self.use_pallas else (1,)
                ):
                    jobs.append((b * ql, b, pb, False, flags))

        def prefill_ladder(**flags):
            for t in self.prefill_token_buckets:
                for pb in (
                    self.prefill_pair_buckets[t] if self.use_pallas else (1,)
                ):
                    jobs.append((t, cfg.max_num_seqs, pb, True, flags))

        decode_ladder()
        prefill_ladder()
        if cfg.num_penalty_slots > 0:
            # A server built with penalty slots will run the penalized step
            # variant for every penalized request; without warmup the first
            # such request per bucket pays a 4-40 s tunnel compile at request
            # time (ADVICE r3). Every prefill bucket too: a short penalized
            # prompt's completing chunk lands in a small bucket.
            decode_ladder(penalized=True)
            prefill_ladder(penalized=True)
        if cfg.spec_k > 0:
            # Speculative verify steps are their own compiled variant per
            # decode bucket (t = S*(spec_k+1) query rows).
            decode_ladder(spec_step=True)
        if cfg.guided_json:
            # Guided (JSON-mode) variants: the completing chunk of a guided
            # prompt runs the guided prefill variant, in whichever bucket
            # its length lands.
            decode_ladder(guided=True)
            prefill_ladder(guided=True)
        for name in cfg.warmup_variants:
            # Serving-facing variants (VERDICT r4 weak #3): any OpenAI client
            # sending top_p<1 hits the filtered variant on its first request;
            # api_server defaults to warmup_variants=("filtered",).
            flag = {"filtered": "filtered", "logprobs": "want_lp",
                    "biased": "biased", "seeded": "seeded"}[name]
            decode_ladder(**{flag: True})
            prefill_ladder(**{flag: True})
        for t_bucket, s_bucket, p_bucket, is_prefill, flags in jobs:
            t0 = perf_counter()
            penalized = flags.get("penalized", False)
            sstep = flags.get("spec_step", False)
            guided = flags.get("guided", False)
            filtered = flags.get("filtered", False)
            want_lp = flags.get("want_lp", False)
            biased = flags.get("biased", False)
            seeded = flags.get("seeded", False)
            inputs = self._dummy_inputs(
                t_bucket, s_bucket, is_prefill, p_bucket, spec_step=sstep
            )
            pen = None
            if penalized:
                pen = build_penalty_inputs(
                    [],
                    num_seqs_bucket=s_bucket,
                    num_slots=cfg.num_penalty_slots + 1,
                    is_prefill=is_prefill,
                )
            sp = None
            if cfg.spec_k > 0:
                sp = build_spec_inputs(
                    [], num_seqs_bucket=s_bucket,
                    max_model_len=cfg.max_model_len, is_prefill=is_prefill,
                )
            gin = self._empty_guided_inputs(s_bucket, is_prefill)
            key = (t_bucket, s_bucket, p_bucket, is_prefill,
                   filtered, want_lp, biased, seeded, penalized, sstep,
                   guided)
            self._compiled[key] = self._step.lower(
                self.params, self.kv, self.token_state, self.rope, inputs,
                pen, sp, self.gtab, gin, is_prefill, filtered, want_lp,
                biased, seeded, penalized, sstep, guided,
            ).compile()
            mode = "prefill" if is_prefill else "decode"
            if jax.process_index() == 0:
                tags = "".join(f" {k}" for k, v in flags.items() if v)
                print(
                    f"[warmup] {mode} bucket t={t_bucket} s={s_bucket} "
                    f"pairs={p_bucket}{tags}: {perf_counter() - t0:.1f}s"
                )

    # ----------------------------------------------------------------- run

    def run(self, seqs: list[Sequence], is_prefill: bool, ring_pos: int = 0,
            spec_step: bool = False):
        """Dispatch one engine step (async: does NOT fetch sampled tokens).
        Decode input tokens are gathered on-device from the last-token slot
        buffer; this step's samples land in ring row ``ring_pos`` and in each
        sequence's slot. Fetch values later via ``fetch_ring``.
        ``spec_step``: run the speculative verify variant (decode only; the
        engine selects it for plain greedy-capable batches when spec_k > 0)."""
        cfg = self.config
        # Any top-k/top-p (or logprobs) request selects a separate compiled
        # variant of the step program (lazily; plain requests never pay).
        filtered = any(seq.uses_filtering for seq in seqs)
        want_lp = any(seq.logprobs for seq in seqs)
        seeded = any(seq.seed is not None for seq in seqs)
        # Penalties: any sequence holding a penalty-slab row selects the
        # penalized step variant (the scheduler assigns rows only to
        # penalized requests; the engine rejects them when the feature is
        # off, so this never trips on an unallocated slab).
        penalized = any(seq.penalty_slot >= 0 for seq in seqs)
        # Guided (JSON-mode) variant: decode batches holding a guided row,
        # and prefill steps where a guided prompt's final chunk completes
        # (its first sampled token must already be masked).
        guided = cfg.guided_json and any(
            seq.guided and (
                not is_prefill
                or seq.num_cached_tokens + seq.num_scheduled_tokens
                == seq.num_tokens
            )
            for seq in seqs
        )
        # min_tokens (vLLM): while a completion is shorter than min_tokens,
        # suppress the model's EOS set by injecting -inf biases — rides the
        # existing logit_bias step variant, no dedicated machinery. The token
        # sampled this step is completion #(num_completion_tokens + 1).
        eos_bias = None
        biases = []
        for seq in seqs:
            b = seq.logit_bias
            # Spec builds: host completion counts are pessimistic between
            # drains, so gate on the CONFIRMED (valued) count — EOS may stay
            # suppressed up to one fetch interval past min_tokens.
            comp = (
                seq.num_valued_tokens - seq.num_prompt_tokens
                if cfg.spec_k > 0 else seq.num_completion_tokens
            )
            if seq.min_tokens and comp < seq.min_tokens:
                if eos_bias is None:
                    ids = tuple(cfg.eos_ids or ()) or (cfg.eos,)
                    eos_bias = tuple((int(t), -1e9) for t in sorted(set(ids)))
                b = tuple(b) + eos_bias
            biases.append(b)
        biased = any(biases)
        ql = cfg.spec_k + 1 if spec_step else 1
        reqs = []
        for seq, bias in zip(seqs, biases):
            if is_prefill:
                start = seq.num_cached_tokens
                n = seq.num_scheduled_tokens
                chunk = seq.token_ids[start: start + n]
                assert -1 not in chunk, "prefill over unfetched token values"
            else:
                # Host lengths are pessimistic in spec builds; the device
                # recomputes positions/appends from its true lengths. The
                # host start/kv_len only size worklists and block tables —
                # cap the verify chunk's frontier at the sequence's length
                # limit (the reserved table ends there).
                start = seq.num_tokens - 1
                chunk = [0] * ql  # values come from the device state
            kv_len = start + len(chunk)
            if spec_step:
                kv_len = min(
                    kv_len,
                    seq.num_prompt_tokens + seq.max_tokens,
                    cfg.max_model_len,
                )
            reqs.append(
                dict(
                    token_ids=chunk,
                    start=start,
                    kv_len=kv_len,
                    block_table=seq.block_table,
                    temperature=seq.temperature,
                    slot=seq.device_slot,
                    top_k=seq.top_k,
                    top_p=seq.top_p,
                    min_p=seq.min_p,
                    logit_bias=bias,
                    seed=seq.seed,
                )
            )
        q_tile = self.q_tile if (is_prefill and self.use_pallas) else None
        window = getattr(self.spec, "sliding_window", None)
        p_bucket = 1
        if is_prefill:
            if q_tile:
                # Exact packed length under per-seq q-tile alignment, plus
                # the active (tile, page) pair count for the worklist grid
                # (window-skipped leading pages excluded, mirroring
                # build_step_inputs).
                off, npairs = 0, 0
                bsz = cfg.kvcache_block_size
                for r in reqs:
                    off = -(-off // q_tile) * q_tile
                    for pos0 in range(r["start"], r["kv_len"], q_tile):
                        lim = min(r["kv_len"], pos0 + q_tile)
                        lo = (
                            0 if window is None
                            else max(0, pos0 - window + 1) // bsz
                        )
                        npairs += -(-lim // bsz) - lo
                    off += len(r["token_ids"])
                num_tokens = -(-off // q_tile) * q_tile
            else:
                num_tokens = sum(len(r["token_ids"]) for r in reqs)
            t_bucket = _pick_bucket(self.prefill_token_buckets, num_tokens)
            s_bucket = cfg.max_num_seqs
            if q_tile:
                p_bucket = _pick_bucket(
                    self.prefill_pair_buckets[t_bucket], npairs
                )
        else:
            s_bucket = _pick_bucket(cfg.decode_buckets, len(seqs))
            t_bucket = s_bucket * ql
            if self.use_pallas:
                # Decode worklist length: one pair per (group of 8, live page
                # depth), minus pages a sliding window has wholly rolled past
                # (mirrors build_step_inputs). The engine sorts decode batches
                # by kv length, so groups have near-uniform depth.
                bsz = cfg.kvcache_block_size
                npairs = 0
                for g0 in range(0, len(reqs), GRP):
                    members = reqs[g0: g0 + GRP]
                    hi = max(-(-r["kv_len"] // bsz) for r in members)
                    lo = 0 if window is None else min(
                        max(0, r["kv_len"] - 1 - window) // bsz
                        for r in members
                    )
                    npairs += hi - lo
                p_bucket = _pick_bucket(
                    self.decode_pair_buckets[s_bucket], npairs
                )
        group_pairs = GRP if (not is_prefill and self.use_pallas) else None
        pen = None
        if penalized:
            pen = build_penalty_inputs(
                seqs,
                num_seqs_bucket=s_bucket,
                num_slots=cfg.num_penalty_slots + 1,
                is_prefill=is_prefill,
            )
        rng = self._host_rng.integers(0, 2**32, size=2, dtype=np.uint32)
        inputs = build_step_inputs(
            reqs,
            block_size=cfg.kvcache_block_size,
            num_tokens_bucket=t_bucket,
            num_seqs_bucket=s_bucket,
            max_blocks_per_seq=cfg.max_blocks_per_seq,
            rng=rng,
            q_tile=q_tile,
            num_slots=self.num_slots,
            ring_pos=ring_pos,
            num_pairs_bucket=p_bucket if (q_tile or group_pairs) else None,
            group_pairs=group_pairs,
            window=window if self.use_pallas else None,
            clamp_positions=spec_step,
        )
        sp = None
        if cfg.spec_k > 0:
            sp = build_spec_inputs(
                seqs, num_seqs_bucket=s_bucket,
                max_model_len=cfg.max_model_len, is_prefill=is_prefill,
            )
        gin = None
        if cfg.guided_json:
            gin = build_guided_inputs(
                seqs, num_seqs_bucket=s_bucket,
                dead_slot=self.num_slots - 1, is_prefill=is_prefill,
                resume_fn=self._guided_resume,
            )
        if self.n_proc > 1:
            # Multi-host: every host builds identical StepInputs (deterministic
            # scheduler + shared rng seed); wrap them as globally-replicated
            # arrays so the global-mesh jit accepts them.
            rep = NamedSharding(self.mesh, P())
            inputs, pen, sp, gin = jax.tree.map(
                lambda a: jax.make_array_from_callback(
                    np.shape(a), rep, lambda idx, a=a: np.asarray(a)[idx]
                ),
                (inputs, pen, sp, gin),
            )
        key = (t_bucket, s_bucket, p_bucket, is_prefill, filtered, want_lp,
               biased, seeded, penalized, spec_step, guided)
        compiled = self._compiled.get(key)
        if compiled is not None:
            self.kv, self.token_state = compiled(
                self.params, self.kv, self.token_state, self.rope, inputs,
                pen, sp, self.gtab, gin,
            )
        else:
            self.kv, self.token_state = self._step(
                self.params, self.kv, self.token_state, self.rope, inputs,
                pen, sp, self.gtab, gin, is_prefill, filtered, want_lp,
                biased, seeded, penalized, spec_step, guided,
            )

    def fetch_ring(self) -> np.ndarray:
        """One batched device->host transfer of the sampled-token ring
        (i32[fetch_interval, max_num_seqs], row r = step dispatched with
        ring_pos r since the previous fetch). The ring is replicated, so on
        multi-host runs each host reads its local copy (no DCN traffic)."""
        return np.asarray(self.token_state[1].addressable_data(0))

    def fetch_logprob_ring(self) -> np.ndarray:
        """The chosen-token log-prob ring (f32, same layout as fetch_ring).
        Rows are only meaningful for steps dispatched with a logprobs request
        (other steps leave their row untouched); the engine fetches this ring
        only when some pending sequence asked for logprobs."""
        return np.asarray(self.token_state[2].addressable_data(0))

    def exit(self):
        """Release device buffers (reference model_runner.py:50-59)."""
        self.kv = None
        self.params = None
        self.token_state = None
