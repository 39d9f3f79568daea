"""The jit-visible per-step input batch.

TPU-first replacement for the reference's module-global Context channel
(utils/context.py:5-27) and host input-prep (model_runner.py:129-193):
globals can't cross a jit boundary, so all per-step metadata travels as one
explicit pytree argument with **bucketed static shapes** (padding instead of
the reference's dynamic tensors).

One format serves both prefill and decode (mixed batches supported): decode is
simply the q_len==1-per-sequence case of the ragged layout.
"""

from __future__ import annotations

from typing import NamedTuple

from nanovllm_tpu.sampling_params import LOGIT_BIAS_K

import jax
import numpy as np


class StepInputs(NamedTuple):
    token_ids: jax.Array      # i32[T]
    positions: jax.Array      # i32[T] absolute positions (0 for padding)
    slot_mapping: jax.Array   # i32[T] flat KV slot per token (-1 padding)
    seq_ids: jax.Array        # i32[T] row in [S] arrays (S for padding)
    kv_lens: jax.Array        # i32[S] per-seq total kv length (0 padding)
    block_tables: jax.Array   # i32[S, W]
    cu_q_lens: jax.Array      # i32[S+1]
    num_seqs: jax.Array       # i32[1]
    last_token_idx: jax.Array  # i32[S] packed index of each seq's last token
    temperatures: jax.Array   # f32[S]
    rng: jax.Array            # PRNG key data (uint32[2])
    # Prefill q-tiling metadata (Pallas ragged prefill kernel): when the batch
    # is built with q_tile=BQ, every sequence's chunk starts at a BQ-aligned
    # packed offset, so each BQ-row tile maps to exactly one sequence.
    tile_seq: jax.Array       # i32[NT] sequence of tile t (S for padding tiles)
    tile_pos0: jax.Array      # i32[NT] absolute position of tile t's row 0
    # Flat worklist of active (tile, page) pairs, tile-major: the kernel grid
    # iterates only real work instead of a dense NT x W grid that is mostly
    # skipped. Padding pairs carry tile NT (sentinel).
    pair_tile: jax.Array      # i32[NP]
    pair_page: jax.Array      # i32[NP]
    # Async pipeline: device slot of each scheduled sequence (decode inputs
    # gather the previous sampled token from the on-device last-token buffer)
    # and the ring row this step's samples scatter into.
    slot_ids: jax.Array       # i32[S] (dead slot for padding rows)
    ring_pos: jax.Array       # i32[1]
    # Per-seq sampling filters (used only by the "filtered" step variant).
    top_ks: jax.Array         # i32[S] (0 = no k limit)
    top_ps: jax.Array         # f32[S] (1.0 = no nucleus limit)
    min_ps: jax.Array         # f32[S] (0.0 = no p floor; vLLM min_p)
    # Per-seq additive logit biases (used only by the "biased" step variant);
    # padding entries are (id 0, bias 0.0) — a no-op scatter-add.
    bias_ids: jax.Array       # i32[S, LOGIT_BIAS_K]
    bias_vals: jax.Array      # f32[S, LOGIT_BIAS_K]
    # Per-seq sampling seeds (used only by the "seeded" step variant);
    # -1 = unseeded row (keeps the per-step noise stream).
    seeds: jax.Array          # i32[S]
    # Speculative verify steps only (set on-device by the spec step variant;
    # None everywhere else, adding nothing to other programs): number of new
    # KV rows the kernel appends per sequence (1..q_len; 0 for padding).
    append_lens: jax.Array | None = None


class PenaltyInputs(NamedTuple):
    """Per-step metadata for the "penalized" step variant (presence /
    frequency / repetition penalties; ops/penalties.py). Passed as a separate
    jit argument (None for every other variant) so the plain step programs'
    HLO — and the warm compilation cache — are untouched. The slab's last row
    is the dead row: padding tokens, non-penalized sequences, and masked
    scatters all land there."""
    pslots: jax.Array       # i32[S+1] slab row per seq (dead for none/padding)
    prompt_lens: jax.Array  # i32[S+1] per-seq prompt length (0 padding)
    reset_slots: jax.Array  # i32[S] slab rows zeroed this step (first prefill
                            # chunk of each penalized seq; dead otherwise)
    presence: jax.Array     # f32[S] (0 = off)
    frequency: jax.Array    # f32[S] (0 = off)
    repetition: jax.Array   # f32[S] (1 = off)
    append_inc: jax.Array   # i32[S] 1 when this step's sampled token joins
                            # the sequence (0 for incomplete prefill chunks)


class SpecInputs(NamedTuple):
    """Per-step metadata for speculative-decoding builds (Config.spec_k > 0).
    Passed as a separate jit argument (None when the feature is off) so the
    non-spec step programs' HLO is untouched. In spec builds EVERY step
    variant receives it: decode steps read per-sequence length caps and the
    device-resident true lengths drive positions/appends; prefill steps use
    it to (re)initialize the device length/history state for their rows."""
    limits: jax.Array       # i32[S] total-length cap per row:
                            # min(prompt + max_tokens, max_model_len)
    set_lens: jax.Array     # i32[S] prefill: value seq_lens[slot] is SET to
                            # (kv_len + 1 when the chunk completes the prompt,
                            # else kv_len); ignored by decode steps
    append_inc: jax.Array   # i32[S] prefill: 1 when this step's sampled token
                            # joins the sequence (chunk completes the prompt)


class GuidedInputs(NamedTuple):
    """Per-step metadata for guided-decoding builds (Config.guided_json).
    Passed as a separate jit argument (None when the feature is off). In
    guided builds EVERY variant receives it: prefill steps clear/arm the
    per-slot automaton state; guided decode variants mask logits and walk
    the sampled tokens (ops/guided.py). The slabs' last row is the dead
    row, like the penalty slabs."""
    clear_slots: jax.Array  # i32[S] slots whose guided state resets to
                            # inactive this step (every seq's first prefill
                            # chunk — clears stale state from a prior slot
                            # owner; dead otherwise)
    set_slots: jax.Array    # i32[S] slots armed this step (final prefill
                            # chunk of a guided seq; dead otherwise)
    set_state: jax.Array    # i32[S] automaton state for set_slots (resumed
                            # via a host re-walk on re-prefill)
    set_depth: jax.Array    # i32[S]
    set_stack: jax.Array    # i32[S, DEPTH_CAP]


def build_guided_inputs(
    seqs, *, num_seqs_bucket: int, dead_slot: int, is_prefill: bool,
    resume_fn=None,
) -> GuidedInputs:
    """``resume_fn(seq) -> (state, depth, stack_list)`` re-walks a
    re-prefilled guided sequence's existing completion tokens on the host
    (preemption re-admission happens after a drain, so their values are
    known); fresh prompts arm at the automaton start state."""
    from nanovllm_tpu.ops.guided import DEPTH_CAP

    s = num_seqs_bucket
    clear_slots = np.full(s, dead_slot, np.int32)
    set_slots = np.full(s, dead_slot, np.int32)
    set_state = np.zeros(s, np.int32)
    set_depth = np.zeros(s, np.int32)
    set_stack = np.zeros((s, DEPTH_CAP), np.int32)
    if is_prefill:
        for i, seq in enumerate(seqs):
            if seq.num_cached_tokens == 0:
                clear_slots[i] = seq.device_slot
            done = (
                seq.num_cached_tokens + seq.num_scheduled_tokens
                == seq.num_tokens
            )
            if done and getattr(seq, "guided", None):
                set_slots[i] = seq.device_slot
                # Start state: generic VAL, or a schema automaton's base row.
                st, depth, stack = (getattr(seq, "guided_start", 1), 0, [])
                if resume_fn is not None and \
                        seq.num_tokens > seq.num_prompt_tokens:
                    st, depth, stack = resume_fn(seq)
                set_state[i] = st
                set_depth[i] = depth
                set_stack[i, : len(stack)] = stack[:DEPTH_CAP]
    return GuidedInputs(
        clear_slots=clear_slots, set_slots=set_slots, set_state=set_state,
        set_depth=set_depth, set_stack=set_stack,
    )


def build_spec_inputs(
    seqs, *, num_seqs_bucket: int, max_model_len: int, is_prefill: bool
) -> SpecInputs:
    s = num_seqs_bucket
    limits = np.zeros(s, np.int32)
    set_lens = np.zeros(s, np.int32)
    append_inc = np.zeros(s, np.int32)
    for i, seq in enumerate(seqs):
        limits[i] = min(
            seq.num_prompt_tokens + seq.max_tokens, max_model_len
        )
        if is_prefill:
            kv_len = seq.num_cached_tokens + seq.num_scheduled_tokens
            complete = int(kv_len == seq.num_tokens)
            set_lens[i] = kv_len + complete
            append_inc[i] = complete
    return SpecInputs(
        limits=limits, set_lens=set_lens, append_inc=append_inc
    )


def build_penalty_inputs(
    seqs, *, num_seqs_bucket: int, num_slots: int, is_prefill: bool
) -> PenaltyInputs:
    """``num_slots`` counts slab rows INCLUDING the dead row (= config
    num_penalty_slots + 1). ``seqs`` carry penalty fields from SamplingParams
    plus the scheduler-assigned ``penalty_slot``."""
    dead = num_slots - 1
    s = num_seqs_bucket
    pslots = np.full(s + 1, dead, np.int32)
    prompt_lens = np.zeros(s + 1, np.int32)
    reset_slots = np.full(s, dead, np.int32)
    presence = np.zeros(s, np.float32)
    frequency = np.zeros(s, np.float32)
    repetition = np.ones(s, np.float32)
    append_inc = np.zeros(s, np.int32)
    for i, seq in enumerate(seqs):
        prompt_lens[i] = seq.num_prompt_tokens
        if seq.penalty_slot < 0:
            continue
        pslots[i] = seq.penalty_slot
        presence[i] = seq.presence_penalty
        frequency[i] = seq.frequency_penalty
        repetition[i] = seq.repetition_penalty
        if is_prefill and seq.num_cached_tokens == 0:
            reset_slots[i] = seq.penalty_slot  # first chunk: zero the row
        # The sampled token counts only when it joins the sequence (decode
        # always; prefill only when this chunk completes the prompt).
        if not is_prefill or (
            seq.num_cached_tokens + seq.num_scheduled_tokens == seq.num_tokens
        ):
            append_inc[i] = 1
    return PenaltyInputs(
        pslots=pslots,
        prompt_lens=prompt_lens,
        reset_slots=reset_slots,
        presence=presence,
        frequency=frequency,
        repetition=repetition,
        append_inc=append_inc,
    )


def build_step_inputs(
    reqs: list[dict],
    *,
    block_size: int,
    num_tokens_bucket: int,
    num_seqs_bucket: int,
    max_blocks_per_seq: int,
    rng: np.ndarray,
    q_tile: int | None = None,
    num_slots: int = 1,
    ring_pos: int = 0,
    num_pairs_bucket: int | None = None,
    group_pairs: int | None = None,
    window: int | None = None,
    clamp_positions: bool = False,
    _slow: bool = False,
) -> StepInputs:
    """Build a padded StepInputs batch on host.

    ``reqs``: one dict per scheduled sequence with keys
      token_ids (list[int], the chunk to run), start (first absolute position),
      kv_len (total kv length incl. this chunk), block_table (list[int]),
      temperature (float).

    ``q_tile``: when set (prefill via the Pallas kernel), each sequence's
    chunk is placed at a q_tile-aligned packed offset so every q-tile belongs
    to one sequence; tile_seq/tile_pos0 describe the tiling.

    ``group_pairs``: when set (decode via the Pallas kernel, value = the
    kernel's GRP), pair_tile/pair_page carry the decode worklist instead:
    (group, page) for every page depth a group of ``group_pairs`` sequences
    is live at (a dense groups x max_pages grid is mostly skipped steps whose
    per-step overhead still costs real time). Sentinel group = S/GRP.

    ``window``: sliding-window attention width shared by ALL layers. Pages
    wholly below every group member's window (decode: valid history is
    [kv_len - window, kv_len - 2], plus the last page for the fused append)
    or every tile row's window (prefill: keys in (q_pos - window, q_pos])
    are dropped from the worklist — the kernels additionally skip per-lane
    DMAs inside a visited pair (see _decode_kernel). window=None emits the
    exact pre-window worklist.

    Decode batches (every chunk exactly one token, no q_tile) take a fully
    vectorized path: the general per-sequence loop costs ~3.6 ms of host time
    at S=224 on this 1-core host — comparable to the device step itself once
    quantized KV shrinks it — and decode is the only shape built every step.
    ``_slow`` forces the general loop (the equivalence-test oracle).
    """
    t_pad, s_pad = num_tokens_bucket, num_seqs_bucket
    w = max_blocks_per_seq
    assert len(reqs) <= s_pad
    token_ids = np.zeros(t_pad, np.int32)
    positions = np.zeros(t_pad, np.int32)
    slot_mapping = np.full(t_pad, -1, np.int32)
    seq_ids = np.full(t_pad, s_pad, np.int32)
    kv_lens = np.zeros(s_pad, np.int32)
    block_tables = np.zeros((s_pad, w), np.int32)
    cu_q_lens = np.zeros(s_pad + 1, np.int32)
    last_token_idx = np.zeros(s_pad, np.int32)
    temperatures = np.zeros(s_pad, np.float32)
    nt = t_pad // q_tile if q_tile else 0
    tile_seq = np.full(nt, s_pad, np.int32)
    tile_pos0 = np.zeros(nt, np.int32)
    pairs: list[tuple[int, int]] = []
    slot_ids = np.full(s_pad, num_slots - 1, np.int32)  # dead slot for padding
    top_ks = np.zeros(s_pad, np.int32)
    top_ps = np.ones(s_pad, np.float32)
    min_ps = np.zeros(s_pad, np.float32)
    bias_ids = np.zeros((s_pad, LOGIT_BIAS_K), np.int32)
    bias_vals = np.zeros((s_pad, LOGIT_BIAS_K), np.float32)
    seeds = np.full(s_pad, -1, np.int32)

    def _fill_bias(i, r):
        for k, (t, b) in enumerate(r.get("logit_bias", ()) or ()):
            bias_ids[i, k] = t
            bias_vals[i, k] = b

    n_req = len(reqs)
    decode_fast = (
        not _slow
        and q_tile is None
        and n_req > 0
        and all(len(r["token_ids"]) == 1 for r in reqs)
    )
    if decode_fast:
        ar = np.arange(n_req, dtype=np.int32)
        token_ids[:n_req] = np.fromiter(
            (r["token_ids"][0] for r in reqs), np.int32, n_req
        )
        starts = np.fromiter((r["start"] for r in reqs), np.int32, n_req)
        positions[:n_req] = starts
        kv_lens[:n_req] = np.fromiter(
            (r["kv_len"] for r in reqs), np.int32, n_req
        )
        for i, r in enumerate(reqs):
            t = r["block_table"]
            block_tables[i, : len(t)] = t
        slot_mapping[:n_req] = (
            block_tables[ar, starts // block_size] * block_size
            + starts % block_size
        )
        seq_ids[:n_req] = ar
        cu_q_lens[1: n_req + 1] = ar + 1
        last_token_idx[:n_req] = ar
        temperatures[:n_req] = np.fromiter(
            (r["temperature"] for r in reqs), np.float32, n_req
        )
        dead = num_slots - 1
        slot_ids[:n_req] = np.fromiter(
            (r.get("slot", dead) for r in reqs), np.int32, n_req
        )
        top_ks[:n_req] = np.fromiter(
            (r.get("top_k", 0) for r in reqs), np.int32, n_req
        )
        top_ps[:n_req] = np.fromiter(
            (r.get("top_p", 1.0) for r in reqs), np.float32, n_req
        )
        if any(r.get("min_p") for r in reqs):
            min_ps[:n_req] = np.fromiter(
                (r.get("min_p", 0.0) for r in reqs), np.float32, n_req
            )
        if any(r.get("logit_bias") for r in reqs):
            for i, r in enumerate(reqs):
                _fill_bias(i, r)
        if any(r.get("seed") is not None for r in reqs):
            seeds[:n_req] = np.fromiter(
                (-1 if r.get("seed") is None else r["seed"] for r in reqs),
                np.int32, n_req,
            )

    offset = n_req if decode_fast else 0
    for i, r in enumerate([] if decode_fast else reqs):
        chunk = np.asarray(r["token_ids"], np.int32)
        n = len(chunk)
        start = r["start"]
        table = np.asarray(r["block_table"], np.int32)
        if q_tile:
            offset = -(-offset // q_tile) * q_tile  # align chunk to a tile
            t0 = offset // q_tile
            for t in range(t0, -(-(offset + n) // q_tile)):
                tile_seq[t] = i
                pos0 = start + (t - t0) * q_tile
                tile_pos0[t] = pos0
                # Pages this tile reads: up to its causal frontier, starting
                # at the sliding window's first live page (lowest key any row
                # of the tile can attend to is pos0 - window + 1).
                kv_limit = min(r["kv_len"], pos0 + q_tile)
                lo = 0 if window is None else max(0, pos0 - window + 1) // block_size
                pairs += [(t, j) for j in range(lo, -(-kv_limit // block_size))]
        token_ids[offset: offset + n] = chunk
        pos = np.arange(start, start + n, dtype=np.int32)
        positions[offset: offset + n] = pos
        if clamp_positions:
            # Speculative verify chunks near a sequence's length cap: the
            # pessimistic host chunk can run past the reserved block table
            # (the device recomputes positions/slots from true lengths and
            # never appends past the cap — host values are placeholders).
            pos = np.minimum(pos, len(table) * block_size - 1)
        slot_mapping[offset: offset + n] = table[pos // block_size] * block_size + (
            pos % block_size
        )
        seq_ids[offset: offset + n] = i
        kv_lens[i] = r["kv_len"]
        block_tables[i, : len(table)] = table
        cu_q_lens[i + 1] = cu_q_lens[i] + n
        offset += n
        last_token_idx[i] = offset - 1
        temperatures[i] = r["temperature"]
        slot_ids[i] = r.get("slot", num_slots - 1)
        top_ks[i] = r.get("top_k", 0)
        top_ps[i] = r.get("top_p", 1.0)
        min_ps[i] = r.get("min_p", 0.0)
        _fill_bias(i, r)
        if r.get("seed") is not None:
            seeds[i] = r["seed"]
    assert offset <= t_pad, f"batch of {offset} tokens exceeds bucket {t_pad}"
    n_pairs = len(pairs)
    vector_pairs = False
    if group_pairs:
        assert q_tile is None, "group_pairs is the decode worklist mode"
        nt = s_pad // group_pairs  # sentinel = total group count

        def _lane_lo(kv_len):
            # First page the sliding window still touches: the kernel needs
            # page j iff (j+1)*block > kv_len-1-window (history positions
            # [kv_len-window, kv_len-2]; the last page always qualifies, so
            # the fused append stays covered).
            if window is None or kv_len <= 0:
                return 0
            return max(0, kv_len - 1 - window) // block_size

        if _slow:
            for g in range(-(-len(reqs) // group_pairs)):
                members = reqs[g * group_pairs: (g + 1) * group_pairs]
                gmax = max(-(-r["kv_len"] // block_size) for r in members)
                glo = min(_lane_lo(r["kv_len"]) for r in members)
                pairs += [(g, j) for j in range(glo, gmax)]
            n_pairs = len(pairs)
        else:
            assert not pairs
            vector_pairs = True
            ng = -(-len(reqs) // group_pairs)
            padded_pages = np.zeros(ng * group_pairs, np.int32)
            padded_pages[: len(reqs)] = -(kv_lens[: len(reqs)] // -block_size)
            gmax = padded_pages.reshape(ng, group_pairs).max(axis=1)
            if window is None:
                glo = np.zeros(ng, np.int32)
            else:
                lanes_lo = np.full(ng * group_pairs, 2**30, np.int32)
                lanes_lo[: len(reqs)] = (
                    np.maximum(kv_lens[: len(reqs)] - 1 - window, 0)
                    // block_size
                )
                glo = lanes_lo.reshape(ng, group_pairs).min(axis=1)
                glo = np.minimum(glo, gmax)  # all-padding group -> 0 pairs
            gcnt = gmax - glo
            n_pairs = int(gcnt.sum())
    if num_pairs_bucket is None:
        num_pairs_bucket = n_pairs  # unpadded (tests / ad-hoc callers)
    assert n_pairs <= num_pairs_bucket, (
        f"{n_pairs} active (tile, page) pairs exceed bucket {num_pairs_bucket}"
    )
    pair_tile = np.full(max(num_pairs_bucket, 1), nt, np.int32)  # nt = dead
    pair_page = np.zeros(max(num_pairs_bucket, 1), np.int32)
    if vector_pairs and n_pairs:
        pair_tile[:n_pairs] = np.repeat(
            np.arange(ng, dtype=np.int32), gcnt
        )
        pair_page[:n_pairs] = (
            np.arange(n_pairs, dtype=np.int32)
            - np.repeat(np.cumsum(gcnt, dtype=np.int32) - gcnt, gcnt)
            + np.repeat(glo, gcnt)
        )
    elif pairs:
        arr = np.asarray(pairs, np.int32)
        pair_tile[:n_pairs] = arr[:, 0]
        pair_page[:n_pairs] = arr[:, 1]
    cu_q_lens[len(reqs) + 1:] = cu_q_lens[len(reqs)]
    num_seqs = np.array([len(reqs)], np.int32)
    return StepInputs(
        token_ids=token_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        seq_ids=seq_ids,
        kv_lens=kv_lens,
        block_tables=block_tables,
        cu_q_lens=cu_q_lens,
        num_seqs=num_seqs,
        last_token_idx=last_token_idx,
        temperatures=temperatures,
        rng=rng,
        tile_seq=tile_seq,
        tile_pos0=tile_pos0,
        pair_tile=pair_tile,
        pair_page=pair_page,
        slot_ids=slot_ids,
        ring_pos=np.asarray([ring_pos], np.int32),
        top_ks=top_ks,
        top_ps=top_ps,
        min_ps=min_ps,
        bias_ids=bias_ids,
        bias_vals=bias_vals,
        seeds=seeds,
    )
