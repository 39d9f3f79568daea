"""Engine configuration.

Parity: reference ``nanovllm/config.py`` (fields and invariants,
config.py:20-25), extended with TPU-specific fields: dtype / KV-cache dtype,
quantization mode, mesh shape (tensor/data parallel), HBM utilization, and
shape-bucketing controls (the TPU analogue of the reference's CUDA-graph
batch-size ladder, model_runner.py:222-257).
"""

import os
from dataclasses import dataclass, field
from typing import Any

from transformers import AutoConfig


@dataclass
class Config:
    model: str
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 256
    max_model_len: int = 4096
    hbm_utilization: float = 0.9
    tensor_parallel_size: int = 1
    # MoE placement over the TP mesh axis: False shards each expert's FFN
    # width (load-balanced); True gives each rank num_experts/tp full-width
    # experts (expert parallelism — better MXU aspect ratios at high tp).
    enable_expert_parallel: bool = False
    # r5 (ROADMAP #4): 2-D expert placement over a DEDICATED mesh axis —
    # total devices = expert_parallel_size x tensor_parallel_size on an
    # ("ep", "tp") mesh. Attention/dense weights and the KV cache shard
    # over "tp" and REPLICATE over "ep" (attention compute is redundant
    # across ep — cheap for expert-dominated MoE); each (ep, tp) rank holds
    # num_experts/ep experts at width/tp, and the expert combine rides one
    # psum over both axes. This unlocks device counts past the kv-head cap
    # on attention TP (e.g. 30B-A3B's 4 kv heads on v5e-16 = tp4 x ep4).
    # 1 (default) keeps the 1-D "tp" mesh. MoE models only; mutually
    # exclusive with enable_expert_parallel.
    expert_parallel_size: int = 1
    # First device of this engine's mesh (data-parallel serving: replica r
    # of the api_server's --data-parallel pool runs on devices
    # [r*tp, (r+1)*tp) of the same process).
    device_offset: int = 0
    data_parallel_size: int = 1
    enforce_eager: bool = False
    hf_config: Any = None
    eos: int = -1
    # Full engine-level stop set. Chat models often declare SEVERAL EOS ids
    # (generation_config.json eos_token_id lists, e.g. Qwen chat's
    # <|im_end|> + <|endoftext|>, Llama-3's eot_id + end_of_text); stopping on
    # only tokenizer.eos_token_id overruns turn boundaries. Filled by the
    # engine from generation_config + tokenizer; () -> {eos}.
    eos_ids: tuple = ()
    kvcache_block_size: int = 256
    num_kvcache_blocks: int = -1

    # --- TPU-specific extensions (absent in reference) ---
    hbm_bytes: int | None = None       # per-chip HBM override (auto-sizing)
    dtype: str = "bfloat16"            # parameter/activation dtype
    kv_cache_dtype: str = "auto"       # "auto" -> dtype; or "int8"/"int4"/"fp8"
    quantization: str | None = None    # None | "int8" | "int4" | "fp8" (weight-only)
    scan_layers: bool = True           # lax.scan over layers (fast compile) vs unrolled
    use_pallas_attention: bool | None = None  # None -> auto (True on TPU)
    aot_warmup: bool | None = None     # None -> auto (True on TPU): compile
                                       # every shape bucket at init (the
                                       # reference's CUDA-graph capture slot,
                                       # model_runner.py:222-257)
    # Extra step variants AOT-compiled by warmup(), from {"filtered",
    # "seeded", "biased", "logprobs"}. A variant's first request otherwise
    # pays a 4-40 s tunnel compile per bucket AT REQUEST TIME — any OpenAI
    # client sending top_p<1 hits "filtered" immediately, so api_server
    # defaults to ("filtered",); offline default () keeps startup minimal.
    warmup_variants: tuple = ()
    # Scheduler charges ceil(chunk/align)*align tokens against the prefill
    # budget so q-tile padding can never push a packed bucket past the largest
    # compiled bucket. Set by the ModelRunner (q_tile on the Pallas path).
    schedule_token_align: int = 1
    # Sliding-window width when EVERY layer slides (set by the ModelRunner
    # from the model spec; None otherwise). The scheduler uses it for rolling
    # KV eviction: leading blocks the window can never touch again are
    # released while the sequence keeps running.
    attention_window: int | None = None
    # Async pipeline depth: sampled tokens stay on-device (fed back into the
    # next decode step from a slot buffer) and are fetched to host in one
    # batched transfer every `fetch_interval` steps. EOS stops can lag by up
    # to that many tokens (the overrun is truncated). 1 = fetch every step.
    fetch_interval: int = 8
    # Decode batch buckets: the jit-compiled shape ladder (analogue of the
    # reference's CUDA-graph sizes 1,2,4,...,512, model_runner.py:226).
    decode_buckets: tuple = ()
    prefill_buckets: tuple = ()
    rng_seed: int = 0
    # Repetition/presence/frequency penalties need per-sequence token counts
    # that live ON DEVICE (the async pipeline means the host lags the sampled
    # stream): this sizes the count slabs ([slots+1, vocab] int32 counts +
    # int8 prompt-presence; 5 bytes/token ≈ 0.8 MB per slot at a 152k vocab)
    # and bounds how
    # many penalized requests can be in flight at once. 0 (default) allocates
    # nothing and keeps every compiled step program byte-identical to the
    # penalty-free build; penalized requests then fail at add_request.
    num_penalty_slots: int = 0
    # Speculative decoding (vLLM's ngram / prompt-lookup method; no reference
    # analogue — nano-vllm has none): draft spec_k tokens per decode step from
    # each sequence's own history and verify them in one fused K+1-row pass.
    # Greedy rows (temperature == 0) accept matching drafts exactly (output
    # token streams are bit-identical to spec_k=0); sampled rows accept by
    # exact rejection sampling (ops/spec.py — the emitted distribution is
    # provably identical to plain sampling, position by position).
    # 0 (default) allocates nothing and keeps every
    # compiled step program byte-identical to the non-spec build. Enabling it
    # costs an i32[2*max_num_seqs+1, max_model_len] on-device history slab
    # (~4*max_model_len bytes per slot) and widens the token ring by spec_k+1
    # lanes. Requires a non-sliding-window model; batches using filtered /
    # seeded / biased / penalized sampling or logprobs fall back to the
    # normal decode step for that step (still exact, just unaccelerated).
    spec_k: int = 0
    # Guided decoding (JSON mode): compile the on-device JSON pushdown
    # automaton at startup (ops/guided.py) so requests may set
    # SamplingParams(guided="json"). Costs a one-time host mask compilation
    # (~seconds at a 152k vocab), ~10 MB of device tables, and per-slot
    # state slabs; guided batches run a separate full-logits step variant
    # (like penalized ones). False (default) keeps every compiled step
    # program byte-identical to the non-guided build.
    guided_json: bool = False
    # JSON-Schema guided decoding (ops/guided_schema.py): reserve this many
    # per-schema automaton slots in the global guided tables. Each slot costs
    # guided_schema_states x 4 x ceil(V/32) x 4 bytes of device mask slab
    # (~29 MB at a 152k vocab with the default 384 states) plus matching
    # transition rows; schemas compile on the host (~1-2 s, LRU-cached by
    # schema text) and install into a free slot — a slot is reusable once
    # every request that used its schema finished. 0 (default) keeps the
    # guided tables byte-identical to the generic-JSON-only build; schema
    # requests then fail loudly at add_request. Requires guided_json=True.
    guided_schema_slots: int = 0
    guided_schema_states: int = 384
    # Acceptance-adaptive speculation (cf. vLLM's dynamic speculative
    # decoding): drafting only pays when drafts get accepted. The engine
    # tracks the per-drain acceptance rate (EWMA); below spec_min_acceptance
    # it stops issuing spec steps (plain decode; the on-device spec state is
    # still maintained) and re-probes with a single spec step every
    # spec_probe_interval eligible decode steps, so a workload shift back to
    # a predictable phase re-enables drafting. Measured r4 on chip: an
    # acceptance≈0 sampled trace ran ~10x SLOWER with always-on drafting —
    # pessimistic +k host lengths park every sequence at its cap, forcing
    # pipeline-flushing drains, and phantom block reservations trigger
    # preemptions. The gate bounds that cost to the probe cadence.
    # spec_min_acceptance=0.0 restores always-on drafting.
    spec_min_acceptance: float = 0.1
    spec_probe_interval: int = 256
    # When set, generate() runs under jax.profiler.trace writing an xplane
    # trace here (view with tensorboard-plugin-profile / xprof).
    profile_dir: str | None = None

    def __post_init__(self):
        assert os.path.isdir(self.model), f"model path {self.model!r} is not a directory"
        assert self.kvcache_block_size % 16 == 0, "kvcache_block_size must be a multiple of 16"
        assert self.tensor_parallel_size >= 1
        assert self.data_parallel_size >= 1
        assert self.expert_parallel_size >= 1
        assert not (
            self.expert_parallel_size > 1 and self.enable_expert_parallel
        ), (
            "expert_parallel_size (2-D ep x tp mesh) and "
            "enable_expert_parallel (1-D EP over the tp axis) are exclusive"
        )
        assert 0.0 < self.hbm_utilization <= 1.0
        if self.hf_config is None:
            self.hf_config = AutoConfig.from_pretrained(self.model)
        max_pos = getattr(self.hf_config, "max_position_embeddings", self.max_model_len)
        self.max_model_len = min(self.max_model_len, max_pos)
        # The prefill budget may be SMALLER than max_model_len (the
        # reference's chunked prefill runs budget < prompt across steps,
        # scheduler.py:42-51; a small budget is the standard knob for
        # bounding prefill's interference with decode latency) — it just
        # must admit at least one page-aligned chunk per step.
        assert self.max_num_batched_tokens >= self.kvcache_block_size, (
            "max_num_batched_tokens must cover at least one KV block so "
            "chunked prefill can make progress"
        )
        assert self.max_num_batched_tokens % self.kvcache_block_size == 0, (
            "prefill budget must be a multiple of the KV block size so chunk "
            "starts stay page-aligned (the Pallas prefill kernel writes new "
            "KV rows page-by-page)"
        )
        assert self.quantization in (None, "int8", "int4", "fp8"), self.quantization
        assert all(
            v in ("filtered", "seeded", "biased", "logprobs")
            for v in self.warmup_variants
        ), self.warmup_variants
        assert self.guided_schema_slots >= 0
        assert self.guided_schema_states > 0
        if self.guided_schema_slots > 0:
            assert self.guided_json, (
                "guided_schema_slots requires guided_json=True (schema "
                "automata extend the guided tables)"
            )
        # The spec verify pass runs as extra query rows per sequence through
        # the decode kernel; its multi-row write-back patches a 2*wb_tile
        # staging window, which covers runs of up to wb_tile (8) rows.
        assert 0 <= self.spec_k <= 7, "spec_k must be in [0, 7]"
        assert 0.0 <= self.spec_min_acceptance < 1.0, self.spec_min_acceptance
        assert self.spec_probe_interval > 0, self.spec_probe_interval
        if self.kv_cache_dtype == "auto":
            self.kv_cache_dtype = self.dtype
        # int8 KV stores values in 1 byte with an f32 scale per (token, head)
        # — the fast quantized path (native int8 converts). int4 halves the
        # KV bytes again (decode is KV-DMA-bound), nibble-packing two heads
        # per byte with the same per-(token, head) scales — needs an even
        # per-shard kv-head count. fp8 (e4m3, scale-free) also works but v5e
        # emulates fp8 converts in software, so it is slower than bf16 for
        # decode-heavy work.
        assert self.kv_cache_dtype in (
            "bfloat16", "float16", "float32", "int8", "int4", "fp8"
        ), f"unsupported kv_cache_dtype {self.kv_cache_dtype!r}"
        # Few, coarse buckets: every (bucket, mode) pair is a separate XLA
        # program; decode matmuls are weight-bandwidth-bound so padding a
        # decode batch up is nearly free, and large prefill buckets cost only
        # proportional MXU time. (The reference captures 9+ CUDA graph sizes,
        # model_runner.py:226 — graphs are cheap to capture; XLA programs are
        # not, so we keep the ladder short.)
        if not self.decode_buckets:
            # Finer rungs than r1's (8, 64, max): decode wall time scales with
            # the *bucketed* batch's KV reads, so padding 140 live seqs to 256
            # wastes real HBM bandwidth. The compile cache amortizes the
            # extra programs.
            ladder = [8, 16, 32, 64, 96, 128, 160, 192, 224]
            self.decode_buckets = tuple(b for b in ladder if b < self.max_num_seqs) + (
                self.max_num_seqs,
            )
        # The Pallas decode kernel processes sequences in groups of GRP
        # (ops/pallas/ragged_attention.py); round every rung up so any
        # user-supplied ladder (or an off-size max_num_seqs) compiles.
        from nanovllm_tpu.ops.pallas.ragged_attention import GRP as _grp

        self.decode_buckets = tuple(
            sorted({-(-b // _grp) * _grp for b in self.decode_buckets})
        )
        if not self.prefill_buckets:
            ladder = [2048, 8192]
            self.prefill_buckets = tuple(
                b for b in ladder if b < self.max_num_batched_tokens
            ) + (self.max_num_batched_tokens,)

    @property
    def max_blocks_per_seq(self) -> int:
        return -(-self.max_model_len // self.kvcache_block_size)
