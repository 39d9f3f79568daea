"""Per-request sampling parameters.

Parity: reference ``nanovllm/sampling_params.py`` (fields temperature,
max_tokens, ignore_eos). Differences: the reference *forbids* greedy decoding
(asserts temperature > 1e-10, sampling_params.py:11); we explicitly support
``temperature == 0.0`` as greedy argmax, plus per-request top-k / top-p
(nucleus) filtering, all fused in the on-device sampler. Requests that leave
top_k/top_p at their defaults run the plain (cheaper) sampling program.

Stopping controls beyond the reference: ``stop_token_ids`` (extra per-request
stop ids, honored even under ``ignore_eos``) and ``stop`` strings (generation
ends when the decoded completion contains any of them; the match and
everything after it is trimmed from the output).
"""

from dataclasses import dataclass

# Static width of the per-sequence logit-bias slab in the device batch
# (jit needs fixed shapes; OpenAI itself caps logit_bias at ~300 entries,
# and real use is a handful of tokens).
LOGIT_BIAS_K = 32


@dataclass(slots=True)
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    # 0 disables top-k. EXACT for any k: rows whose k exceeds the fast
    # 64-candidate window fall into a full-vocab sorted path (ops/sampling).
    top_k: int = 0
    # 1.0 disables nucleus filtering; smaller values keep the smallest prefix
    # of the (temperature-scaled) distribution with cumulative mass >= top_p.
    # EXACT over the full vocabulary: probabilities use full-row softmax, and
    # rows whose nucleus is not provably contained in the fast 64-candidate
    # window take the full-vocab path.
    top_p: float = 1.0
    # 0.0 disables min-p; otherwise drop candidates whose probability is
    # below min_p * (probability of the most likely token) — vLLM min_p
    # semantics, exact over the full vocabulary (see top_p).
    min_p: float = 0.0
    # Suppress the model's EOS set until this many completion tokens exist
    # (vLLM min_tokens): implemented host-side by injecting -inf logit biases
    # on the EOS ids while the completion is short, so it needs no dedicated
    # device machinery. Per-request stop_token_ids are NOT suppressed.
    min_tokens: int = 0
    # Stop when any of these strings appears in the decoded completion
    # (checked on host at each ring drain; the stop text is excluded from the
    # output). A single string is accepted and normalized to a 1-tuple.
    stop: tuple = ()
    # Stop when any of these token ids is sampled (in addition to the model's
    # EOS set; applies even with ignore_eos=True, matching vLLM semantics).
    stop_token_ids: tuple = ()
    # Return the model log-probability of each sampled token (log-softmax of
    # the raw logits, NOT temperature-scaled — OpenAI semantics). Requests
    # that leave this False run a step variant that never computes the
    # logsumexp, so they pay nothing.
    logprobs: bool = False
    # Additive per-token logit biases (OpenAI logit_bias): {token_id: bias}
    # or a sequence of (token_id, bias) pairs, at most LOGIT_BIAS_K entries
    # (the device batch carries a static-width [S, K] slab). Applied before
    # temperature/filtering/logprobs; biased requests run their own compiled
    # step variant.
    logit_bias: dict | tuple = ()
    # Reproducible sampling for this request (vLLM/OpenAI ``seed``): the
    # noise stream is a function of (seed, token position) only, so the same
    # seeded request replays identically regardless of batch composition,
    # preemption, or engine restarts. None = the engine's per-step stream.
    seed: int | None = None
    # Admission priority (vLLM-style): higher-priority requests are admitted
    # from the waiting queue first (FCFS within a priority level). Does not
    # change preemption order.
    priority: int = 0
    # Repetition penalties (vLLM/OpenAI semantics; see ops/penalties.py).
    # Token counts are maintained ON DEVICE (the async pipeline means the
    # host lags the sampled stream), in per-sequence rows of a slab sized by
    # ``Config.num_penalty_slots`` — penalized requests require that config
    # to be > 0. presence/frequency consider output tokens; repetition also
    # considers the prompt. Penalized prompts bypass the prefix cache (their
    # tokens must be re-embedded so the device counters see them).
    presence_penalty: float = 0.0    # [-2, 2]; subtract once per seen token
    frequency_penalty: float = 0.0   # [-2, 2]; subtract per occurrence
    repetition_penalty: float = 1.0  # > 0; divide positive / multiply negative
    # Guided decoding (vLLM guided_json analogue): "json" constrains the
    # completion to a syntactically valid JSON value via an ON-DEVICE
    # pushdown automaton (ops/guided.py) — no per-step host sync, so the
    # async pipeline is preserved. Requires ``Config(guided_json=True)``
    # (the engine compiles the token masks at startup). EOS is only
    # sampleable once the value is complete; max_tokens still truncates.
    # r5: a dict is a JSON Schema (supported subset in
    # ops/guided_schema.py: ordered object properties / required, typed
    # arrays with min/maxItems, string/number/integer/boolean/null,
    # enum/const), or {"regex": pattern} for full-match regex constraints
    # (subset in ops/guided_regex.py; vLLM guided_regex semantics), or
    # {"enum": [...]} for guided_choice — all additionally require
    # Config(guided_schema_slots > 0).
    guided: str | dict | None = None

    def __post_init__(self):
        assert self.temperature >= 0.0, "temperature must be non-negative"
        assert self.max_tokens >= 1, "max_tokens must be at least 1"
        assert self.top_k >= 0, "top_k must be non-negative (0 disables)"
        assert 0.0 < self.top_p <= 1.0, "top_p must be in (0, 1]"
        assert 0.0 <= self.min_p <= 1.0, "min_p must be in [0, 1]"
        assert self.min_tokens >= 0, "min_tokens must be non-negative"
        assert self.min_tokens <= self.max_tokens, (
            "min_tokens cannot exceed max_tokens"
        )
        if isinstance(self.stop, str):
            self.stop = (self.stop,)
        self.stop = tuple(self.stop)
        assert all(isinstance(s, str) and s for s in self.stop), (
            "stop must be a non-empty string or a sequence of them"
        )
        self.stop_token_ids = tuple(int(t) for t in self.stop_token_ids)
        items = (
            self.logit_bias.items()
            if isinstance(self.logit_bias, dict) else self.logit_bias
        )
        self.logit_bias = tuple((int(t), float(b)) for t, b in items)
        assert len(self.logit_bias) <= LOGIT_BIAS_K, (
            f"logit_bias supports at most {LOGIT_BIAS_K} entries"
        )
        assert all(0 <= t < 2**31 for t, _ in self.logit_bias), (
            "logit_bias token ids must fit int32 (the device batch is int32;"
            " out-of-vocab ids are dropped by the scatter)"
        )
        assert self.seed is None or 0 <= self.seed < 2**31, (
            "seed must be in [0, 2**31)"
        )
        assert -2.0 <= self.presence_penalty <= 2.0, (
            "presence_penalty must be in [-2, 2]"
        )
        assert -2.0 <= self.frequency_penalty <= 2.0, (
            "frequency_penalty must be in [-2, 2]"
        )
        assert self.repetition_penalty > 0.0, (
            "repetition_penalty must be positive (1.0 disables)"
        )
        assert self.guided is None or self.guided == "json" or isinstance(
            self.guided, dict
        ), (
            f"guided={self.guided!r}: 'json' or a JSON-Schema dict"
        )


    @property
    def uses_filtering(self) -> bool:
        return self.top_k > 0 or self.top_p < 1.0 or self.min_p > 0.0

    @property
    def uses_penalties(self) -> bool:
        return (
            self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
            or self.repetition_penalty != 1.0
        )
