"""Per-request sequence state machine.

Parity: reference ``nanovllm/engine/sequence.py`` (status enum, token
bookkeeping, block-table, per-block token slicing). The reference's custom
pickle minimization (sequence.py:72-83) is unnecessary here: the TPU engine is
single-controller, so sequences never cross a process boundary.
"""

from enum import Enum, auto
from itertools import count
from time import perf_counter

from nanovllm_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    block_size = 256
    counter = count()

    def __init__(self, token_ids: list[int], sampling_params: SamplingParams = SamplingParams()):
        self.seq_id = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids = list(token_ids)
        self.last_token = token_ids[-1]
        self.num_tokens = len(self.token_ids)
        self.num_prompt_tokens = len(token_ids)
        # Tokens whose KV is resident in the paged cache. Advanced by the
        # scheduler as prefill chunks complete and after each decode step.
        self.num_cached_tokens = 0
        # Full blocks whose hash has been registered in the prefix cache.
        self.num_hashed_blocks = 0
        # Leading blocks a sliding-window model has released (rolling KV
        # eviction): block_table entries below this watermark are stale ids
        # whose pages the attention window can never touch again.
        self.num_evicted_blocks = 0
        # Tokens scheduled for the in-flight step (chunk size for prefill, 1
        # for decode).
        self.num_scheduled_tokens = 0
        self.block_table: list[int] = []
        self.arrival_time = perf_counter()  # for TTFT / e2e latency metrics
        # Async pipeline state: sampled tokens live on-device until the next
        # ring fetch; completion tokens are appended as placeholders (-1) and
        # patched when values arrive. ``num_valued_tokens`` is the watermark
        # below which token_ids holds real values.
        self.num_valued_tokens = len(token_ids)
        # Device slot for last-sampled-token feedback (assigned by scheduler).
        self.device_slot = -1
        # Set while a preempted sequence waits for re-prefill: it keeps
        # front-of-queue precedence over any arrival, whatever its priority.
        self.was_preempted = False
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos
        self.top_k = sampling_params.top_k
        self.top_p = sampling_params.top_p
        self.min_p = sampling_params.min_p
        self.min_tokens = sampling_params.min_tokens
        self.uses_filtering = sampling_params.uses_filtering
        self.stop = sampling_params.stop
        self.stop_token_ids = frozenset(sampling_params.stop_token_ids)
        self.logprobs = sampling_params.logprobs
        self.logit_bias = sampling_params.logit_bias
        self.seed = sampling_params.seed
        self.priority = sampling_params.priority
        self.presence_penalty = sampling_params.presence_penalty
        self.frequency_penalty = sampling_params.frequency_penalty
        self.repetition_penalty = sampling_params.repetition_penalty
        self.uses_penalties = sampling_params.uses_penalties
        self.guided = sampling_params.guided
        # Automaton start state (1 = generic JSON VAL; schema requests get
        # their installed automaton's base row from the engine).
        self.guided_start = 1
        # Row of the on-device penalty-count slabs (assigned by the scheduler
        # while the sequence runs; -1 = none).
        self.penalty_slot = -1
        # Chosen-token log-probabilities, parallel to completion tokens up to
        # the valued watermark (filled as ring drains apply values).
        self.logprob_values: list[float] = []
        # Stop-string machinery (engine-side, host text): completion tokens
        # already scanned, and the trimmed final text once a stop string hit.
        self.stop_checked = 0
        self.output_text: str | None = None
        # TTFT recorded (spec drains can deliver several first tokens at once,
        # so "exactly one completion value" no longer identifies the first).
        self.ttft_recorded = False

    def __len__(self):
        return self.num_tokens

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return self.num_tokens - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens:]

    @property
    def num_blocks(self) -> int:
        return -(-self.num_tokens // self.block_size)

    @property
    def last_block_num_tokens(self) -> int:
        return self.num_tokens - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size: (i + 1) * self.block_size]

    def append_token(self, token_id: int):
        """Append a token whose value is known (synchronous path)."""
        self.token_ids.append(token_id)
        self.last_token = token_id
        self.num_tokens += 1
        self.num_valued_tokens = self.num_tokens

    def append_placeholder(self):
        """Append a completion token whose value is still on-device."""
        self.token_ids.append(-1)
        self.num_tokens += 1

    def apply_value(self, token_id: int, logprob: float | None = None) -> bool:
        """Patch the oldest placeholder with its fetched value; returns False
        if there is none (e.g. the tail was truncated at an earlier EOS)."""
        if self.num_valued_tokens >= self.num_tokens:
            return False
        self.token_ids[self.num_valued_tokens] = token_id
        self.last_token = token_id
        self.num_valued_tokens += 1
        if self.logprobs and logprob is not None:
            self.logprob_values.append(float(logprob))
        return True

    def drop_placeholders(self, n: int):
        """Remove ``n`` unvalued placeholders at the valued watermark
        (speculative decoding appends K+1 placeholders per step
        pessimistically; drain reconciliation deletes the rejected drafts'
        share — later steps' placeholders shift down)."""
        if n <= 0:
            return
        assert self.num_valued_tokens + n <= self.num_tokens
        del self.token_ids[self.num_valued_tokens: self.num_valued_tokens + n]
        self.num_tokens -= n
        if self.num_valued_tokens == self.num_tokens:
            self.last_token = self.token_ids[-1]

    def truncate(self, num_tokens: int):
        """Drop the tail (late-discovered EOS): keep ``num_tokens`` tokens."""
        assert self.num_prompt_tokens <= num_tokens <= self.num_tokens
        del self.token_ids[num_tokens:]
        self.num_tokens = num_tokens
        self.num_valued_tokens = min(self.num_valued_tokens, num_tokens)
        del self.logprob_values[num_tokens - self.num_prompt_tokens:]
        self.last_token = self.token_ids[-1]

    def __repr__(self):
        return (
            f"Sequence(id={self.seq_id}, status={self.status.name}, "
            f"tokens={self.num_tokens}, cached={self.num_cached_tokens})"
        )
