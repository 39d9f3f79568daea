"""Engine orchestration: request intake, the step loop, and generate().

Parity: reference ``nanovllm/engine/llm_engine.py``:
- ctor filters arbitrary kwargs into Config fields (llm_engine.py:18-20),
- ``add_request`` tokenizes string prompts (llm_engine.py:43-47),
- ``step`` = schedule -> run -> postprocess, returning (outputs, signed token
  count: +prefill tokens / -decode batch size) (llm_engine.py:49-55),
- ``generate`` drives the loop under tqdm with live prefill/decode tok/s,
  returns outputs sorted by arrival order as [{"text", "token_ids"}]
  (llm_engine.py:60-90).

TPU delta: no worker processes — the single controller owns the device mesh
(SURVEY.md §7 design delta 4); ``exit`` just drops device buffers.
"""

from __future__ import annotations

import atexit
from dataclasses import fields
from time import perf_counter

from tqdm.auto import tqdm
from transformers import AutoTokenizer

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.metrics import EngineMetrics


# Reference/vLLM-compatible kwarg aliases: a user porting from the reference
# passes gpu_memory_utilization=0.9 (reference config.py:14) and must get the
# equivalent knob, not a silently-dropped kwarg and the default.
CONFIG_ALIASES = {
    "gpu_memory_utilization": "hbm_utilization",
    "seed": "rng_seed",  # vLLM's LLM(seed=...) engine-level sampling seed
}


class LLMEngine:

    def __init__(self, model, **kwargs):
        config_kwargs = {f.name for f in fields(Config)}
        runner_kwargs = {
            k: kwargs.pop(k) for k in ("random_weights",) if k in kwargs
        }
        for alias, target in CONFIG_ALIASES.items():
            if alias in kwargs:
                assert target not in kwargs, (
                    f"pass either {alias!r} or {target!r}, not both"
                )
                kwargs[target] = kwargs.pop(alias)
        unknown = sorted(set(kwargs) - config_kwargs)
        if unknown:
            # The reference silently drops unknown kwargs (llm_engine.py:18-19)
            # — which turns a typo'd or renamed knob into a default. Fail loud.
            raise TypeError(
                f"unknown engine kwargs: {unknown}; valid fields are the "
                f"nanovllm_tpu.Config dataclass fields plus aliases "
                f"{sorted(CONFIG_ALIASES)}"
            )
        config = Config(model, **kwargs)
        self.config = config
        Sequence.block_size = config.kvcache_block_size
        # Tokenizer + EOS resolution BEFORE the runner: guided-decoding
        # builds compile their token masks (which exclude EOS outside accept
        # states) during runner construction/warmup.
        self.tokenizer = AutoTokenizer.from_pretrained(config.model, use_fast=True)
        if config.eos == -1:
            config.eos = self.tokenizer.eos_token_id
        if not config.eos_ids:
            # Chat checkpoints stop on SEVERAL ids (generation_config.json
            # eos_token_id is a list for Qwen chat / Llama-3); union them
            # with the tokenizer's eos so turn boundaries actually stop.
            eos_ids = {config.eos}
            try:
                from transformers import GenerationConfig

                gc_eos = GenerationConfig.from_pretrained(
                    config.model
                ).eos_token_id
                if gc_eos is not None:
                    eos_ids |= (
                        set(gc_eos) if isinstance(gc_eos, (list, tuple))
                        else {gc_eos}
                    )
            except OSError:
                pass  # no generation_config.json (tests, bare checkpoints)
            config.eos_ids = tuple(sorted(eos_ids))
        if config.guided_json:
            runner_kwargs["tokenizer"] = self.tokenizer
        self.model_runner = ModelRunner(config, **runner_kwargs)
        # Scheduler after the runner: KV sizing fills num_kvcache_blocks.
        self.scheduler = Scheduler(config)
        self.metrics = EngineMetrics()
        # Async pipeline: steps whose sampled-token values are still on
        # device, as (seqs, appended_flags) per ring row. Values arrive in
        # one batched fetch per `fetch_interval` steps (drain()).
        self.pending: list[tuple] = []
        self._emitted: dict[int, list[int]] = {}
        self._drain_count = 0  # generate_stream wakes on ring drains
        # Acceptance-adaptive speculation (Config.spec_min_acceptance):
        # per-drain acceptance EWMA decides whether decode steps draft.
        self._spec_accept_ewma: float | None = None
        self._spec_off = False
        self._spec_steps_since_probe = 0
        # Draft/accept tallies accumulate across drains until there are
        # enough samples for a stable rate estimate (single probe steps and
        # small tail batches would otherwise flip the gate on noise).
        self._spec_pending_drafted = 0
        self._spec_pending_accepted = 0
        atexit.register(self.exit)

    def exit(self):
        if self.model_runner is not None:
            self.model_runner.exit()
            self.model_runner = None

    # -------------------------------------------------------------- intake

    def add_request(self, prompt: str | list[int], sampling_params: SamplingParams):
        if isinstance(prompt, str):
            prompt = self.tokenizer.encode(prompt)
        assert len(prompt) <= self.config.max_model_len, (
            f"prompt of {len(prompt)} tokens exceeds max_model_len "
            f"{self.config.max_model_len}"
        )
        if sampling_params.min_tokens:
            # min_tokens suppresses EOS via injected logit biases; the device
            # slab is static-width (see SamplingParams.LOGIT_BIAS_K).
            from nanovllm_tpu.sampling_params import LOGIT_BIAS_K

            n_eos = len(set(self.config.eos_ids or (self.config.eos,)))
            assert len(sampling_params.logit_bias) + n_eos <= LOGIT_BIAS_K, (
                "logit_bias entries + the model's EOS set exceed the "
                f"{LOGIT_BIAS_K}-entry device slab (min_tokens injects an "
                "EOS-suppressing bias per EOS id)"
            )
        if sampling_params.guided:
            assert self.config.guided_json, (
                "guided requests require Config(guided_json=True) — the "
                "on-device automaton tables are compiled at engine startup"
            )
            if isinstance(sampling_params.guided, dict):
                assert self.config.guided_schema_slots > 0, (
                    "JSON-Schema guided requests require "
                    "Config(guided_schema_slots > 0) — schema automata "
                    "install into statically reserved table slots"
                )
        if sampling_params.uses_penalties:
            # Penalty counts live in fixed-size on-device slabs; the feature
            # must be sized at engine construction (Config.num_penalty_slots).
            assert self.config.num_penalty_slots > 0, (
                "presence/frequency/repetition penalties require "
                "num_penalty_slots > 0 at engine construction (the on-device "
                "token-count slabs are statically sized)"
            )
        seq = Sequence(prompt, sampling_params)
        if isinstance(sampling_params.guided, dict):
            # Compile (LRU-cached) + install the schema automaton; may raise
            # SchemaError (unsupported subset) or RuntimeError (slots busy)
            # BEFORE the request is admitted — never mid-generation.
            seq.guided_start = self.model_runner.ensure_guided_schema(
                sampling_params.guided, seq
            )
        self.scheduler.add(seq)
        return seq

    def abort_request(self, seq: Sequence):
        """Stop a request early (e.g. an online client disconnected). Safe
        with steps in flight: this is the same finish path max_tokens/EOS
        use — later drains guard finished sequences, and device steps execute
        in dispatch order, so in-flight writes to the freed pages land before
        any new owner's."""
        if not seq.is_finished:
            self.scheduler.finish(seq)

    # ---------------------------------------------------------------- loop

    def drain(self) -> list[tuple[int, list[int]]]:
        """Fetch the sampled-token ring (one device->host transfer) and apply
        the values to every in-flight step: patch placeholders, stop at EOS,
        register prefix-cache hashes, emit finished outputs."""
        if not self.pending:
            return []
        self._drain_count += 1
        ring = self.model_runner.fetch_ring()
        # Second transfer only when some in-flight sequence asked for
        # logprobs — plain serving never pays the extra fetch.
        lp_ring = (
            self.model_runner.fetch_logprob_ring()
            if any(s.logprobs for seqs, _, _ in self.pending for s in seqs)
            else None
        )
        # The fetch blocked until every dispatched step executed: close the
        # metrics interval now (device-true phase timing) and get per-row
        # estimated completion timestamps for TTFT / e2e latency.
        row_times = self.metrics.record_drain()
        bm = self.scheduler.block_manager
        self.metrics.extra = {
            "prefix_cached_prompt_tokens": bm.cached_prompt_tokens,
            "new_prompt_tokens": bm.new_prompt_tokens,
        }
        spec_mode = self.config.spec_k > 0
        ql = self.config.spec_k + 1
        touched: dict[int, object] = {}
        drain_drafted = drain_accepted = 0
        outputs = []
        for row, (seqs, appended, was_prefill) in enumerate(self.pending):
            done_t = row_times[row] if row < len(row_times) else perf_counter()
            lps = (
                lp_ring[row, : len(seqs)].tolist()
                if lp_ring is not None else None
            )
            if spec_mode:
                # Widened ring rows: [S, QL] emitted tokens + accepted count.
                emitted = ring[row, : len(seqs), :ql]
                counts = ring[row, : len(seqs), ql]
                applied = self.scheduler.apply_spec_values(
                    seqs, appended, emitted, counts, lps
                )
                if not was_prefill:
                    # Dispatch metered one token per decode row; credit the
                    # extra accepted drafts (or debit in-flight finishes).
                    self.metrics.decode_tokens += applied - len(seqs)
                    # Acceptance accounting: spec rows reserved k+1 slots per
                    # seq (fallback rows 1); stops may truncate `applied`, so
                    # this undercounts acceptance slightly at sequence ends.
                    drafted = sum(a - 1 for a in appended if a)
                    if drafted:
                        accepted = max(
                            0, applied - sum(1 for a in appended if a)
                        )
                        self.metrics.spec_drafted += drafted
                        self.metrics.spec_accepted += accepted
                        drain_drafted += drafted
                        drain_accepted += accepted
                for seq in seqs:
                    touched[seq.seq_id] = seq
            else:
                values = ring[row, : len(seqs)].tolist()
                self.scheduler.apply_values(seqs, appended, values, lps)
            self._check_stop_strings(seqs)
            for seq, was_appended in zip(seqs, appended):
                if not was_appended:
                    continue
                if (
                    seq.num_valued_tokens > seq.num_prompt_tokens
                    and not seq.ttft_recorded
                ):
                    seq.ttft_recorded = True
                    self.metrics.record_first_token(seq.arrival_time, done_t)
                if (
                    seq.is_finished
                    and seq.num_valued_tokens == seq.num_tokens
                    and seq.seq_id not in self._emitted
                ):
                    self.metrics.record_finished(seq.arrival_time, done_t)
                    self._emitted[seq.seq_id] = seq.completion_token_ids
                    lp_out = (
                        seq.logprob_values[: seq.num_completion_tokens]
                        if seq.logprobs else None
                    )
                    outputs.append(
                        (seq.seq_id, seq.completion_token_ids,
                         self.final_text(seq), lp_out)
                    )
        self.pending.clear()
        if spec_mode:
            # Every dispatched step has now executed and its values applied:
            # restore the exact decode invariants (resident-KV watermark,
            # prefix-cache hashing) the pessimistic bookkeeping relaxed.
            self.scheduler.reconcile_spec(touched.values())
            self._spec_pending_drafted += drain_drafted
            self._spec_pending_accepted += drain_accepted
            if self._spec_pending_drafted >= 64:
                acc = self._spec_pending_accepted / self._spec_pending_drafted
                self._spec_pending_drafted = self._spec_pending_accepted = 0
                self._spec_accept_ewma = (
                    acc if self._spec_accept_ewma is None
                    else 0.7 * self._spec_accept_ewma + 0.3 * acc
                )
                thresh = self.config.spec_min_acceptance
                self._spec_off = (
                    thresh > 0.0 and self._spec_accept_ewma < thresh
                )
        return outputs

    def final_text(self, seq: Sequence) -> str:
        """Decoded completion, honoring stop-string trimming."""
        if seq.output_text is not None:
            return seq.output_text
        return self.tokenizer.decode(seq.completion_token_ids)

    def _check_stop_strings(self, seqs: list[Sequence]):
        """Finish sequences whose decoded completion now contains one of
        their stop strings; the stop text and everything after it is trimmed
        (token tail truncated at the token that completed the match). Runs
        only for requests that set ``stop`` — the per-drain incremental
        re-decode is their cost alone."""
        for seq in seqs:
            if not seq.stop or seq.output_text is not None:
                continue
            n = seq.num_valued_tokens - seq.num_prompt_tokens
            comp = seq.token_ids[
                seq.num_prompt_tokens: seq.num_prompt_tokens + n
            ]
            for k in range(seq.stop_checked + 1, n + 1):
                text = self.tokenizer.decode(comp[:k])
                hits = [i for i in (text.find(s) for s in seq.stop) if i >= 0]
                if not hits:
                    continue
                seq.output_text = text[: min(hits)]
                seq.truncate(seq.num_prompt_tokens + k)
                if not seq.is_finished:  # may already be done by max_tokens
                    self.scheduler.finish(seq)
                break
            seq.stop_checked = min(n, seq.num_completion_tokens)

    def step(self) -> tuple[list[tuple], int]:
        """Dispatch one step; drain the pipeline when the ring is full (or
        when nothing is schedulable but values are still in flight)."""
        outputs = []
        if self.scheduler.is_finished():
            return self.drain(), 0
        # Drain BEFORE scheduling: (a) when the ring is full, (b) when a
        # waiting sequence has unfetched completion tokens (a re-prefill after
        # preemption embeds them from the host). Draining first also means a
        # late EOS can never finish a sequence that was just scheduled.
        if len(self.pending) >= self.model_runner.ring_size or any(
            seq.num_valued_tokens < seq.num_tokens
            for seq in self.scheduler.waiting
        ):
            outputs += self.drain()
            if self.scheduler.is_finished():
                return outputs, 0
        seqs, is_prefill = self.scheduler.schedule()
        if not seqs:
            # Spec mode only: every running sequence is parked at its
            # pessimistic length cap — the in-flight accepted counts resolve
            # them (drain cannot be empty here: a parked sequence by
            # construction has placeholders pending).
            outputs += self.drain()
            return outputs, 0
        spec_step = False
        if self.config.spec_k > 0 and not is_prefill:
            # The verify step supports plain sampling only; batches touching
            # filtered/seeded/biased/penalized sampling or logprobs fall back
            # to the (state-maintaining) normal decode variant this step.
            spec_step = not any(
                s.uses_filtering or s.logprobs or s.seed is not None
                or s.penalty_slot >= 0 or s.logit_bias or s.guided
                or (
                    s.min_tokens
                    and s.num_valued_tokens - s.num_prompt_tokens
                    < s.min_tokens
                )
                for s in seqs
            )
            if spec_step and self._spec_off:
                # Acceptance gate tripped: plain decode, except one probe
                # spec step per spec_probe_interval eligible steps so a
                # workload shift back to predictability re-enables drafting.
                self._spec_steps_since_probe += 1
                if self._spec_steps_since_probe >= self.config.spec_probe_interval:
                    self._spec_steps_since_probe = 0
                else:
                    spec_step = False
            if spec_step:
                for s in seqs:
                    s.num_scheduled_tokens = self.config.spec_k + 1
        if not is_prefill:
            # Sort the decode batch by kv length: the Pallas decode kernel
            # processes sequences in groups of 8 whose page loop runs to the
            # group MAX — skewed groups waste whole-page DMAs (VERDICT r1
            # weak #2). Order within a step has no semantic effect (the ring
            # row / postprocess pairing below uses this same list).
            seqs = sorted(seqs, key=lambda s: s.num_tokens, reverse=True)
        # Signed count for the live display: +prefill tokens / -decode batch
        # size (reference llm_engine.py:51). Read before postprocess resets it.
        num_tokens = (
            sum(seq.num_scheduled_tokens for seq in seqs) if is_prefill else -len(seqs)
        )
        self.model_runner.run(
            seqs, is_prefill, ring_pos=len(self.pending), spec_step=spec_step
        )
        appended = self.scheduler.postprocess_lengths(seqs, is_prefill)
        self.pending.append((seqs, appended, is_prefill))
        self.metrics.record_dispatch(num_tokens)
        return outputs, num_tokens

    def is_finished(self) -> bool:
        return self.scheduler.is_finished() and not self.pending

    def generate(
        self,
        prompts: list[str] | list[list[int]],
        sampling_params: SamplingParams | list[SamplingParams],
        use_tqdm: bool = True,
    ) -> list[dict]:
        if self.config.profile_dir:
            import jax

            with jax.profiler.trace(self.config.profile_dir):
                return self._generate(prompts, sampling_params, use_tqdm)
        return self._generate(prompts, sampling_params, use_tqdm)

    def generate_stream(
        self,
        prompts: list[str] | list[list[int]],
        sampling_params: SamplingParams | list[SamplingParams],
    ):
        """Incremental generation (beyond the reference, whose API is offline
        ``generate`` only): a generator yielding one event dict per sequence
        per ring drain as sampled-token values reach the host:

            {"index": i,            # position in ``prompts``
             "token_ids": [...],    # NEW completion tokens since last event
             "finished": bool,
             "logprobs": [...],     # parallel to token_ids, only if the
                                    # request set SamplingParams.logprobs
             "text": str}           # full completion text, finished event only

        Streaming granularity is ``config.fetch_interval`` decode steps per
        drain (the async pipeline fetches the device token ring in batches —
        a per-step fetch would cost ~40 ms of tunnel RTT each); serve with a
        small interval (engine default 8) for low per-token latency.
        """
        self._emitted.clear()
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        seqs = [
            self.add_request(p, sp) for p, sp in zip(prompts, sampling_params)
        ]
        watermark = [0] * len(seqs)
        done = [False] * len(seqs)
        last_drain = self._drain_count
        while not all(done):
            self.step()
            if self._drain_count == last_drain:
                continue  # no new values on host yet
            last_drain = self._drain_count
            for i, seq in enumerate(seqs):
                if done[i]:
                    continue
                hi = seq.num_valued_tokens - seq.num_prompt_tokens
                new = seq.completion_token_ids[watermark[i]: hi]
                fin = seq.is_finished and seq.num_valued_tokens == seq.num_tokens
                if not new and not fin:
                    continue
                event = {"index": i, "token_ids": new, "finished": fin}
                if seq.logprobs:
                    event["logprobs"] = seq.logprob_values[watermark[i]: hi]
                if fin:
                    done[i] = True
                    event["text"] = self.final_text(seq)
                watermark[i] = hi
                yield event

    def _generate(self, prompts, sampling_params, use_tqdm):
        # _emitted dedups drain outputs; entries from a previous generate()
        # were consumed by its caller (would otherwise leak without bound).
        self._emitted.clear()
        if use_tqdm:
            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        for prompt, sp in zip(prompts, sampling_params):
            self.add_request(prompt, sp)
        outputs = {}
        while not self.is_finished():
            output, num_tokens = self.step()
            if use_tqdm:
                # Cumulative device-true phase rates (updated at ring drains;
                # per-dispatch wall time would only measure host overhead).
                m = self.metrics
                pre = m.prefill_tokens / m.prefill_time if m.prefill_time else 0
                dec = m.decode_tokens / m.decode_time if m.decode_time else 0
                pbar.set_postfix(
                    {
                        "Prefill": f"{int(pre)}tok/s",
                        "Decode": f"{int(dec)}tok/s",
                    }
                )
            for seq_id, token_ids, text, lps in output:
                outputs[seq_id] = {"text": text, "token_ids": token_ids}
                if lps is not None:
                    outputs[seq_id]["logprobs"] = lps
                if use_tqdm:
                    pbar.update(1)
        outputs = [outputs[seq_id] for seq_id in sorted(outputs)]
        if use_tqdm:
            pbar.close()
        return outputs
