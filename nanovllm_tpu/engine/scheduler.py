"""Continuous-batching scheduler: prefill-priority FCFS with chunked prefill
and preempt-by-recompute.

Parity: reference ``nanovllm/engine/scheduler.py``:
- two deques (waiting / running), prefill packed FCFS up to max_num_seqs and
  max_num_batched_tokens (scheduler.py:30-52),
- prefix-cache-aware admission: the new-token count excludes cached tokens,
- chunked prefill for the *first* sequence of a batch only; a chunk-incomplete
  sequence stays at the front of ``waiting`` (scheduler.py:42-51),
- decode otherwise: preempt last-in running (or self) while the KV pool cannot
  cover an append (scheduler.py:58-65); preemption deallocates all blocks and
  recomputes later via prefix-aware re-prefill (scheduler.py:75-79),
- postprocess: advance cached tokens, register new full-block hashes, append
  the sampled token, finish on EOS (unless ignore_eos) or max_tokens
  (scheduler.py:81-92).

TPU note: the scheduler itself is pure host bookkeeping; the ModelRunner pads
its output to compiled shape buckets (SURVEY.md §7 design delta 5).
"""

from collections import deque

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


class Scheduler:

    def __init__(self, config: Config):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.max_model_len = config.max_model_len
        # Prefill budget is charged in padded units so per-seq q-tile
        # alignment can never overflow the largest compiled token bucket.
        self.token_align = max(1, getattr(config, "schedule_token_align", 1))
        self.eos = config.eos
        self.eos_ids = (
            frozenset(getattr(config, "eos_ids", ()) or ())
            or frozenset({config.eos})
        )
        self.block_manager = BlockManager(
            config.num_kvcache_blocks, config.kvcache_block_size
        )
        # Rolling KV eviction for sliding-window models (set by ModelRunner):
        # leading blocks the window can never reach again are released while
        # the sequence runs, bounding steady-state KV at ~window + one block
        # per sequence regardless of generated length.
        self.attention_window = getattr(config, "attention_window", None)
        # Speculative decoding (Config.spec_k): decode steps may emit up to
        # spec_k+1 tokens; the host tracks lengths PESSIMISTICALLY (reserving
        # blocks and appending placeholders for the maximum) and reconciles
        # to the device's true accepted counts at ring drains.
        self.spec_k = getattr(config, "spec_k", 0)
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        # Device slots for on-device last-token feedback (async pipeline).
        # 2x max_num_seqs: running seqs plus chunk-in-progress waiters.
        self.free_slots: deque[int] = deque(range(2 * config.max_num_seqs))
        # Rows of the on-device penalty-count slabs (presence/frequency/
        # repetition penalties); sized by config.num_penalty_slots, bounding
        # concurrent penalized requests. Empty when the feature is off.
        self.free_penalty_slots: deque[int] = deque(
            range(getattr(config, "num_penalty_slots", 0))
        )

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def add(self, seq: Sequence):
        # Priority admission (beyond the reference's pure FCFS): insert
        # before the first lower-priority waiter, FCFS within a level —
        # SamplingParams.priority defaults to 0, so all-default traffic is
        # plain FCFS (reference semantics). Never displace the head when it
        # is a chunk-in-progress prefill (the scheduler requires its
        # continuation at waiting[0]) or a preempted sequence (its re-prefill
        # must drain pending token values first).
        if not self.waiting or self.waiting[-1].priority >= seq.priority:
            self.waiting.append(seq)
            return
        items = list(self.waiting)
        # Protected prefix: chunk-in-progress and preempted sequences hold
        # the front regardless of priority (preemptions appendleft, so they
        # form a leading run); the remainder is the insertion-sorted region.
        start = 0
        while start < len(items) and (
            items[start].block_table or items[start].was_preempted
        ):
            start += 1
        pos = len(items)
        for i in range(start, len(items)):
            if items[i].priority < seq.priority:
                pos = i
                break
        items.insert(pos, seq)
        self.waiting = deque(items)

    # ---------------------------------------------------------------- sched

    def schedule(self) -> tuple[list[Sequence], bool]:
        # Prefill first (prefill-priority).
        scheduled: list[Sequence] = []
        num_batched_tokens = 0
        while self.waiting and len(scheduled) < self.max_num_seqs:
            seq = self.waiting[0]
            if seq.device_slot < 0 and not self.free_slots:
                # Admission is otherwise bounded only by KV capacity; a pool
                # that can host more than 2*max_num_seqs concurrent prompts
                # must not outrun the device slot buffer.
                break
            if (
                seq.uses_penalties
                and seq.penalty_slot < 0
                and not self.free_penalty_slots
            ):
                break  # all penalty-count rows are in flight
            windowed = self.attention_window is not None
            if seq.block_table:
                cached = seq.num_cached_tokens  # continuation chunk
            elif windowed:
                # Window-lazy admission: budget per chunk, not per prompt
                # (rolling eviction keeps resident KV at ~chunk + window, so
                # total prompt length may exceed the whole pool).
                cached = (
                    self.block_manager.match_prefix(seq)
                    * self.block_manager.block_size
                )
            else:
                cached_blocks = self.block_manager.can_allocate(seq)
                if cached_blocks == -1:
                    break  # KV pool cannot host this prompt right now
                cached = cached_blocks * self.block_manager.block_size
            remaining = seq.num_tokens - cached
            align = self.token_align
            budget = self.max_num_batched_tokens - num_batched_tokens
            # Largest chunk whose padded size still fits the budget.
            max_chunk = budget // align * align
            if max_chunk <= 0:
                break
            chunk = min(remaining, max_chunk)
            if chunk < remaining and scheduled:
                break  # a chunked (partial) prefill may only lead a batch
            if chunk < remaining:
                # Partial chunks end on a page boundary so the next chunk
                # starts page-aligned (the Pallas prefill kernel appends KV
                # page-by-page). With a full budget this is already aligned.
                chunk -= chunk % self.block_manager.block_size
                if chunk == 0:
                    break
            if windowed:
                bsz = self.block_manager.block_size
                upto = -(-(cached + chunk) // bsz)
                if not self.block_manager.extend_for_window(seq, upto):
                    break  # pool cannot host this chunk right now
            elif not seq.block_table:
                self.block_manager.allocate(seq)
            if seq.device_slot < 0:
                seq.device_slot = self.free_slots.popleft()
            if seq.uses_penalties and seq.penalty_slot < 0:
                seq.penalty_slot = self.free_penalty_slots.popleft()
            seq.num_scheduled_tokens = chunk
            num_batched_tokens += -(-chunk // align) * align
            scheduled.append(seq)
            if chunk == remaining:
                seq.status = SequenceStatus.RUNNING
                seq.was_preempted = False
                self.waiting.popleft()
                self.running.append(seq)
            else:
                break  # incomplete chunk stays at the front of waiting
        if scheduled:
            return scheduled, True

        # Decode: schedule every running sequence, preempting under pressure.
        deferred: list[Sequence] = []
        while self.running and len(scheduled) < self.max_num_seqs:
            seq = self.running.popleft()
            # Roll the window eviction forward BEFORE the capacity check: the
            # block this sequence is about to need may be freed by its own
            # dead leading block (steady-state windowed decode never needs a
            # net-new block once past the window).
            self._evict_window(seq)
            if self.spec_k:
                # Pessimistic-length gate: a sequence whose host (pessimistic)
                # length reached its cap may still have accepted fewer tokens
                # on device — park it until the next drain reconciles.
                if seq.num_tokens >= self._seq_limit(seq):
                    deferred.append(seq)
                    continue
                need = self._spec_blocks_needed(seq)
                while not self.block_manager.can_extend_to(seq, need):
                    if self.running:
                        self.preempt(self.running.pop())
                    else:
                        self.preempt(seq)
                        seq = None
                        break
                if seq is None:
                    continue
                self.block_manager.extend_to(seq, need)
            else:
                while not self.block_manager.can_append(seq):
                    if self.running:
                        self.preempt(self.running.pop())
                    else:
                        self.preempt(seq)
                        seq = None
                        break
                if seq is None:
                    continue
                self.block_manager.may_append(seq)
            seq.num_scheduled_tokens = 1
            scheduled.append(seq)
        assert scheduled or deferred, (
            "scheduler deadlock: no sequence can be scheduled"
        )
        self.running.extendleft(reversed(scheduled + deferred))
        return scheduled, False

    def _seq_limit(self, seq: Sequence) -> int:
        return min(seq.num_prompt_tokens + seq.max_tokens, self.max_model_len)

    def _spec_blocks_needed(self, seq: Sequence) -> int:
        """Blocks covering the pessimistic append frontier of one spec step:
        positions up to min(num_tokens + spec_k, limit) - 1 (the device caps
        appends at the sequence's length limit)."""
        max_pos = min(seq.num_tokens + self.spec_k, self._seq_limit(seq) - 1)
        return max_pos // self.block_manager.block_size + 1

    def _evict_window(self, seq: Sequence):
        """Rolling KV eviction (sliding-window models): release leading
        blocks no future step can read. For the upcoming decode step at
        kv_len = num_tokens, the kernels need page j iff (j+1)*block >
        kv_len-1-window (ragged_attention.lane_rows); pages below are dead
        forever (kv_len only grows). A truncate-on-EOS shrinks kv_len, but
        the sequence finishes immediately after, so no later step reads."""
        if self.attention_window is None:
            return
        bsz = self.block_manager.block_size
        lo = max(0, seq.num_tokens - 1 - self.attention_window) // bsz
        if lo > seq.num_evicted_blocks:
            self.block_manager.evict_prefix(seq, lo)

    def _evict_window_prefill(self, seq: Sequence):
        """Between prefill chunks: the next chunk starts at num_cached_tokens
        and its lowest-reaching tile reads pages >= (pos0 - window + 1) //
        block (build_step_inputs prefill lo); earlier pages are dead. Bounds
        a long prompt's resident KV during chunked prefill at ~window +
        chunk (admission still reserves the full table up-front)."""
        if self.attention_window is None:
            return
        bsz = self.block_manager.block_size
        lo = max(0, seq.num_cached_tokens - self.attention_window + 1) // bsz
        if lo > seq.num_evicted_blocks:
            self.block_manager.evict_prefix(seq, lo)

    def preempt(self, seq: Sequence):
        seq.status = SequenceStatus.WAITING
        seq.was_preempted = True
        self.block_manager.deallocate(seq)
        self._free_slot(seq)
        self.waiting.appendleft(seq)

    def _free_slot(self, seq: Sequence):
        if seq.device_slot >= 0:
            self.free_slots.append(seq.device_slot)
            seq.device_slot = -1
        if seq.penalty_slot >= 0:
            # The counts rebuild at the next (re-)prefill's first chunk: a
            # re-embedded prompt+completion scatters every token again, and
            # the slab row zeroes itself via PenaltyInputs.reset_slots.
            self.free_penalty_slots.append(seq.penalty_slot)
            seq.penalty_slot = -1

    def finish(self, seq: Sequence):
        seq.status = SequenceStatus.FINISHED
        self.block_manager.deallocate(seq)
        self._free_slot(seq)
        if seq in self.running:
            self.running.remove(seq)
        elif seq in self.waiting:
            # A preempted sequence whose last (in-flight) sample was an EOS.
            self.waiting.remove(seq)

    # ----------------------------------------------------------------- post
    #
    # Postprocess is split for the async pipeline: lengths advance as soon as
    # a step is dispatched (the scheduler only needs counts), while sampled
    # token *values* arrive later in a batched device fetch. The synchronous
    # ``postprocess`` composes both (reference scheduler.py:81-92 semantics).

    def postprocess_lengths(
        self, seqs: list[Sequence], is_prefill: bool | None = None
    ) -> list[int]:
        """Advance per-seq bookkeeping for a dispatched step; returns the
        number of completion placeholders appended per seq (0 or 1; up to
        spec_k+1 for speculative decode steps). In spec mode, decode-step
        finish checks are DEFERRED to ring drains (host lengths are
        pessimistic until the device's accepted counts arrive)."""
        appended = []
        defer = bool(self.spec_k) and is_prefill is False
        for seq in seqs:
            if seq.is_finished:
                appended.append(0)  # finished while the step was in flight
                continue
            n_sched = seq.num_scheduled_tokens
            seq.num_cached_tokens += n_sched
            seq.num_scheduled_tokens = 0
            self.block_manager.hash_new_full_blocks(seq)
            if seq.status == SequenceStatus.WAITING:
                self._evict_window_prefill(seq)
                appended.append(0)  # incomplete prefill chunk
                continue
            k = n_sched if defer else 1
            for _ in range(k):
                seq.append_placeholder()
            appended.append(k)
            if defer:
                continue
            if (
                seq.num_completion_tokens >= seq.max_tokens
                # Length cap: a sequence at max_model_len cannot append more
                # KV (block tables are sized for max_model_len); the token
                # just sampled is its last (vLLM-style completion capping —
                # the reference would overflow here too).
                or seq.num_tokens >= self.max_model_len
            ):
                self.finish(seq)
        return appended

    def apply_values(self, seqs: list[Sequence], appended: list[bool],
                     token_ids: list[int],
                     logprobs: list[float] | None = None):
        """Patch fetched token values into their placeholders; stop at a
        late-discovered EOS (truncate the overrun)."""
        for i, (seq, was_appended, token_id) in enumerate(
            zip(seqs, appended, token_ids)
        ):
            lp = logprobs[i] if logprobs is not None else None
            if not was_appended or not seq.apply_value(int(token_id), lp):
                continue
            self.block_manager.hash_new_full_blocks(seq)
            # ignore_eos bypasses the model's EOS set only; per-request
            # stop_token_ids always apply (vLLM semantics).
            if (not seq.ignore_eos and token_id in self.eos_ids) or (
                token_id in seq.stop_token_ids
            ):
                seq.truncate(seq.num_valued_tokens)
                if seq.is_finished:
                    continue  # already finished by max_tokens; output trimmed
                self.finish(seq)

    def apply_spec_values(
        self, seqs: list[Sequence], appended: list[int],
        emitted, counts, lps=None,
    ) -> int:
        """Speculative-step drain reconciliation for ONE ring row:
        ``emitted[i, :counts[i]]`` are the tokens the device actually kept
        for seq i this step (accepted drafts + the bonus/corrective token);
        ``appended[i]`` placeholders were reserved pessimistically. Patch the
        accepted values, delete the rejected drafts' placeholders, and apply
        the finish rules postprocess deferred (EOS / stop ids / max_tokens /
        max_model_len). Returns the number of tokens applied (metrics)."""
        applied_total = 0
        for i, (seq, k) in enumerate(zip(seqs, appended)):
            if not k:
                continue
            c = min(int(counts[i]), k)
            applied = 0
            ended = False
            for j in range(c):
                tok = int(emitted[i][j])
                # Logprobs ride only fallback (1-token) rows in spec mode.
                lp = lps[i] if (lps is not None and j == 0) else None
                if not seq.apply_value(tok, lp):
                    ended = True  # truncated by an earlier row's stop
                    break
                applied += 1
                if (not seq.ignore_eos and tok in self.eos_ids) or (
                    tok in seq.stop_token_ids
                ):
                    seq.truncate(seq.num_valued_tokens)
                    if not seq.is_finished:
                        self.finish(seq)
                    ended = True
                    break
                if (
                    seq.num_valued_tokens - seq.num_prompt_tokens
                    >= seq.max_tokens
                    or seq.num_valued_tokens >= self.max_model_len
                ):
                    seq.truncate(seq.num_valued_tokens)
                    if not seq.is_finished:
                        self.finish(seq)
                    ended = True
                    break
            applied_total += applied
            if not ended:
                seq.drop_placeholders(k - applied)
        return applied_total

    def reconcile_spec(self, seqs):
        """After a FULL drain (every dispatched step executed and its values
        applied), restore the decode invariants the pessimistic bookkeeping
        relaxed: resident KV covers everything but the last sampled token
        (whose KV the next step writes), and newly-valued full blocks become
        prefix-cache entries. Junk KV from rejected drafts sits only at
        positions >= num_tokens - 1, which the hash watermark excludes."""
        for seq in seqs:
            if seq.is_finished or seq.status != SequenceStatus.RUNNING:
                continue
            if seq.num_valued_tokens < seq.num_tokens:
                continue  # later pending rows still hold placeholders
            seq.num_cached_tokens = seq.num_tokens - 1
            self.block_manager.hash_new_full_blocks(seq)

    def postprocess(self, seqs: list[Sequence], token_ids: list[int]):
        appended = self.postprocess_lengths(seqs)
        self.apply_values(seqs, appended, token_ids)
