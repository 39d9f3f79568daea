"""Qwen3 decoder family (also covers Qwen2 / Llama via spec flags) as pure
functional JAX over a pytree of parameters.

Parity: reference ``nanovllm/models/qwen3.py`` — identical math: fused QKV
projection, per-head q/k RMSNorm (Qwen3 signature, qwen3.py:68-84), half-split
(non-interleaved) RoPE (rotary_embedding.py:6-14), SwiGLU MLP with merged
gate+up (qwen3.py:91-117), pre-norm residual layers (qwen3.py:146-159), tied
embeddings (qwen3.py:202-203).

TPU-first design:
- layers are *stacked* ([L, ...] leading dim) and iterated with ``lax.scan``
  so XLA traces/compiles one layer body (config.scan_layers);
- tensor parallelism is explicit shard_map-style SPMD: fused projections are
  stored **rank-blocked** (rank r owns [q_r|k_r|v_r] / [gate_r|up_r]) so a
  plain even split over the output dim hands every rank aligned head slices —
  the TPU analogue of the reference's Column/Merged/QKVParallelLinear loaders
  (linear.py:54-128); row-parallel matmuls are followed by ``lax.psum`` over
  the "tp" axis (linear.py:155 all_reduce), and the embedding is
  vocab-parallel with masked lookup + psum (embed_head.py:9-42).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nanovllm_tpu.ops import quant
from nanovllm_tpu.ops.attention import AttentionMeta
from nanovllm_tpu.ops.moe import grouped_matmul, grouped_matmul_quant


class Qwen3Spec(NamedTuple):
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    rms_eps: float
    rope_theta: float
    tie_embeddings: bool
    max_position: int
    has_qkv_bias: bool = False   # True for Qwen2
    has_qk_norm: bool = True     # True for Qwen3 / Qwen3-MoE
    # Sparse MoE FFN (Qwen3-MoE: Qwen3-30B-A3B / 235B-A22B). num_experts == 0
    # means the dense SwiGLU MLP. The reference has no MoE support at all.
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = False
    # Sliding-window attention (Mistral family): each token attends to the
    # last `sliding_window` positions only. Pages the window rolled past are
    # skipped in the kernel worklists (ragged_attention.lane_rows) and their
    # blocks released by the scheduler (rolling eviction, Scheduler._evict_*).
    sliding_window: int | None = None
    # --- Gemma-3 family (model_type gemma3_text) ---
    # Per-layer window pattern (Gemma3's 5-local:1-global interleave): one
    # entry per layer, 0 = global attention. The window value is a runtime
    # scalar in the kernels, so every layer shares one compiled program.
    # When set, `sliding_window` holds the uniform window ONLY if every
    # layer slides (it drives worklist skipping + rolling eviction).
    layer_windows: tuple = ()
    # Attention score scale base: sm_scale = query_scale**-0.5 (HF
    # query_pre_attn_scalar); None -> head_dim.
    query_scale: float | None = None
    # RMSNorm multiplies by (1 + w) (Gemma's zero-centered norm weights).
    norm_plus_one: bool = False
    # MLP activation: "silu" (SwiGLU) or "gelu_tanh" (Gemma GeGLU).
    act: str = "silu"
    # Sandwich norms: extra RMSNorms applied to the attention and MLP
    # *outputs* before their residual adds (post_attn_norm / post_ffn_norm;
    # `post_norm` then plays HF's pre_feedforward_layernorm role).
    sandwich_norms: bool = False
    # Multiply embeddings by sqrt(hidden_size) (Gemma convention).
    embed_scale: bool = False
    # Dual-rope (Gemma3): local (sliding) layers use this theta; global
    # layers use rope_theta with positions divided by rope_scaling_factor
    # (HF linear rope scaling).
    rope_local_theta: float | None = None
    rope_scaling_factor: float = 1.0
    # Scaled-rope checkpoints (Llama-3.1+ "llama3", YaRN Qwen long-context,
    # "linear"): the per-dim inverse frequencies as computed by HF's own
    # ROPE_INIT_FUNCTIONS (a tuple of head_dim//2 floats — already includes
    # any factor, so positions are NOT divided again), plus YaRN's cos/sin
    # attention-scaling multiplier. () = unscaled (compute from rope_theta).
    rope_inv_freq: tuple = ()
    rope_attention_scaling: float = 1.0


def spec_from_hf(hf_config) -> Qwen3Spec:
    model_type = getattr(hf_config, "model_type", "qwen3")
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads
    )
    moe = model_type == "qwen3_moe"
    if model_type == "gemma3_text":
        return _gemma3_spec(hf_config, head_dim)
    if getattr(hf_config, "use_sliding_window", False):
        # HF slides layers >= max_window_layers and keeps the first ones
        # global; per-layer mixes need window plumbing under the scan, and
        # serving them globally would silently diverge from HF.
        assert getattr(hf_config, "max_window_layers", 1) <= 0, (
            "partial sliding-window coverage (max_window_layers > 0) is not "
            "supported; only uniform all-sliding configs are"
        )
    if moe:
        # v1 restriction: every layer sparse (true for the released Qwen3-MoE
        # checkpoints; per-layer dense/sparse mixes would need ragged layer
        # pytrees under the scan).
        assert getattr(hf_config, "decoder_sparse_step", 1) == 1 and not getattr(
            hf_config, "mlp_only_layers", []
        ), "mixed dense/sparse MoE layers are not supported"
    # Scaled rope (Llama-3.1+ sets rope_scaling type "llama3"; long-context
    # Qwen releases use "yarn"): delegate the inverse-frequency math to HF's
    # own init functions so every supported checkpoint matches HF exactly.
    # "dynamic" (NTK-by-current-length) and "longrope" (short/long factor
    # switching) depend on runtime sequence length — reject rather than
    # silently serve a mis-scaled rope.
    scaling = getattr(hf_config, "rope_scaling", None) or {}
    rope_inv_freq: tuple = ()
    rope_att = 1.0
    if scaling:
        rope_type = (
            scaling.get("rope_type") or scaling.get("type") or "default"
        )
        assert rope_type in ("default", "linear", "llama3", "yarn"), (
            f"unsupported rope_scaling type {rope_type!r} (supported: "
            "default, linear, llama3, yarn)"
        )
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

        inv_freq, rope_att = ROPE_INIT_FUNCTIONS[rope_type](
            hf_config, device=None
        )
        rope_inv_freq = tuple(float(x) for x in inv_freq)
        rope_att = float(rope_att)
        # Partial-rotary checkpoints (partial_rotary_factor < 1) return fewer
        # than head_dim//2 frequencies; apply_rope assumes full-width tables,
        # so reject loudly rather than misalign.
        assert len(rope_inv_freq) == head_dim // 2, (
            f"rope_scaling produced {len(rope_inv_freq)} inverse frequencies "
            f"for head_dim {head_dim} (expected {head_dim // 2}); partial "
            "rotary embeddings are not supported"
        )
    return Qwen3Spec(
        rope_inv_freq=rope_inv_freq,
        rope_attention_scaling=rope_att,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_q_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        head_dim=head_dim,
        rms_eps=hf_config.rms_norm_eps,
        rope_theta=hf_config.rope_theta,
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        max_position=hf_config.max_position_embeddings,
        has_qkv_bias=(model_type == "qwen2"),
        has_qk_norm=(model_type in ("qwen3", "qwen3_moe")),
        sliding_window=(
            getattr(hf_config, "sliding_window", None)
            if model_type == "mistral"
            # Qwen2-style opt-in SWA (uniform all-sliding only; partial
            # coverage asserts above).
            or getattr(hf_config, "use_sliding_window", False)
            else None
        ),
        num_experts=getattr(hf_config, "num_experts", 0) if moe else 0,
        num_experts_per_tok=(
            getattr(hf_config, "num_experts_per_tok", 0) if moe else 0
        ),
        moe_intermediate_size=(
            getattr(hf_config, "moe_intermediate_size", 0) if moe else 0
        ),
        norm_topk_prob=getattr(hf_config, "norm_topk_prob", False),
    )


def _gemma3_spec(hf, head_dim) -> Qwen3Spec:
    """Gemma-3 text decoder (HF Gemma3TextConfig): GeGLU, sandwich + (1+w)
    RMSNorms, sqrt(D) embedding scale, qk-norm, query_pre_attn_scalar score
    scale, and the 5-local:1-global sliding-window interleave with dual rope
    (local theta 10k, global theta 1M with optional linear position scaling).
    Multimodal Gemma3 (model_type "gemma3") is not supported — pass the
    text_config checkpoint."""
    types = getattr(hf, "layer_types", None) or [
        "full_attention"
        if (i + 1) % getattr(hf, "sliding_window_pattern", 6) == 0
        else "sliding_attention"
        for i in range(hf.num_hidden_layers)
    ]
    win = hf.sliding_window
    layer_windows = tuple(
        win if t == "sliding_attention" else 0 for t in types
    )
    scaling = getattr(hf, "rope_scaling", None) or {}
    assert scaling.get("rope_type", scaling.get("type", "linear")) in (
        "linear", "default"
    ), f"unsupported rope scaling {scaling}"
    return Qwen3Spec(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        num_layers=hf.num_hidden_layers,
        num_q_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=head_dim,
        rms_eps=hf.rms_norm_eps,
        rope_theta=hf.rope_theta,
        tie_embeddings=getattr(hf, "tie_word_embeddings", True),
        max_position=hf.max_position_embeddings,
        has_qkv_bias=bool(getattr(hf, "attention_bias", False)),
        has_qk_norm=True,
        # Uniform window only if EVERY layer slides (drives worklist
        # skipping + rolling eviction); Gemma3 always has global layers.
        sliding_window=win if all(layer_windows) else None,
        layer_windows=layer_windows,
        query_scale=float(getattr(hf, "query_pre_attn_scalar", head_dim)),
        norm_plus_one=True,
        act="gelu_tanh",
        sandwich_norms=True,
        embed_scale=True,
        rope_local_theta=float(getattr(hf, "rope_local_base_freq", 10000.0)),
        rope_scaling_factor=float(scaling.get("factor", 1.0)),
    )


# --------------------------------------------------------------------- ops


def rms_norm(x, w, eps, plus_one: bool = False):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    wf = w.astype(jnp.float32)
    if plus_one:  # Gemma: zero-centered norm weights, scale by (1 + w)
        wf = 1.0 + wf
    out = xf * lax.rsqrt(var + eps) * wf
    return out.astype(x.dtype)


def rope_tables(spec: Qwen3Spec):
    """cos/sin tables f32[max_position, head_dim//2] (half-split convention).
    Dual-rope specs (Gemma3) return stacked [2, max_position, half] tables:
    index 0 = global rope (rope_theta, linearly position-scaled), index 1 =
    local rope (rope_local_theta); layers select by spec.layer_windows."""
    def one(theta, factor, inv_freq=None):
        half = spec.head_dim // 2
        if inv_freq is None:
            inv_freq = 1.0 / (
                theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
            )
        t = jnp.arange(spec.max_position, dtype=jnp.float32) / factor
        freqs = jnp.outer(t, inv_freq)
        return jnp.cos(freqs), jnp.sin(freqs)

    if spec.rope_inv_freq:
        # Scaled rope (llama3 / yarn / linear): HF-computed inverse
        # frequencies already fold the factor in (positions undivided); YaRN
        # additionally scales cos/sin by a constant attention factor.
        inv = jnp.asarray(spec.rope_inv_freq, jnp.float32)
        cos_g, sin_g = one(None, 1.0, inv)
        a = spec.rope_attention_scaling
        if a != 1.0:
            cos_g, sin_g = cos_g * a, sin_g * a
        assert spec.rope_local_theta is None
        return cos_g, sin_g

    cos_g, sin_g = one(spec.rope_theta, spec.rope_scaling_factor)
    if spec.rope_local_theta is None:
        return cos_g, sin_g
    cos_l, sin_l = one(spec.rope_local_theta, 1.0)
    return jnp.stack([cos_g, cos_l]), jnp.stack([sin_g, sin_l])


def apply_rope(x, cos_t, sin_t):
    """x: [T, H, head_dim]; cos_t/sin_t: f32[T, head_dim//2]."""
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    c = cos_t[:, None, :]
    s = sin_t[:, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def rms_norm_rope(x, w, eps, plus_one, cos_t, sin_t):
    """Fused per-head RMS-norm + rope in ONE f32 round trip. The separate
    rms_norm -> apply_rope chain materializes a narrow-dtype boundary tensor
    between two fusions and upcasts twice (the r5 prefill xplane shows the
    q/k stream's converts/materializations at ~15-20%% of the step);
    mathematically this differs from the chain only by SKIPPING the
    intermediate downcast-to-x.dtype rounding — f32 models are bit-identical,
    bf16 models get a slightly MORE precise value than before."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    wf = w.astype(jnp.float32)
    if plus_one:
        wf = 1.0 + wf
    nf = xf * lax.rsqrt(var + eps) * wf
    x1, x2 = jnp.split(nf, 2, axis=-1)
    c = cos_t[:, None, :]
    s = sin_t[:, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def _moe_ffn(spec: Qwen3Spec, lp, x, axis, ep: bool = False,
             ep_axis: str | None = None):
    """Qwen3-MoE sparse FFN (HF Qwen3MoeSparseMoeBlock math: f32 softmax
    router over all experts, top-k routing weights, optional renormalization).

    TPU-first dispatch: token-expert pairs are sorted by expert and the
    expert SwiGLU runs as two grouped matmuls (``lax.ragged_dot`` — one MXU
    pass per expert over its contiguous row block), instead of a per-expert
    Python loop (torch reference) or a dense all-experts einsum (k/E of the
    FLOPs).

    Two mesh placements (both ride the layer's existing psum):
    - TP (default): each expert's FFN width shards like the dense MLP
      (rank-blocked [gate_r|up_r] columns, row-parallel down) — perfectly
      load-balanced, but per-rank matmul width shrinks with tp.
    - EP (``ep=True``, config.enable_expert_parallel): each rank owns
      E/tp FULL-WIDTH experts. Pairs sort by ``(expert - first_local) % E``
      so the rank's experts occupy the leading rows; rows beyond the local
      group coverage are masked to zero before the weighted combine (they
      are UNINITIALIZED under the megablox backend; ragged_dot happens to
      zero-fill, but the mask is load-bearing either way), and the layer's
      existing psum assembles the full result — no extra collectives.
    - 2-D ep x tp (``ep_axis``, config.expert_parallel_size): each
      (ep, tp) rank owns E/ep experts at width/tp (the TP rank-blocked
      fuse). Local-first sorting keys off the ``ep_axis`` index; the
      caller's combine psums over BOTH axes (width partials over tp,
      expert coverage over ep) — still one collective."""
    t, d = x.shape
    e, k = spec.num_experts, spec.num_experts_per_tok
    logits = x.astype(jnp.float32) @ lp["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                    # [T, E] f32
    w, idx = lax.top_k(probs, k)                               # [T, K]
    if spec.norm_topk_prob:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    flat_e = idx.reshape(-1)                                   # [T*K]
    counts = jnp.zeros((e,), jnp.int32).at[flat_e].add(1)
    partial_experts = ep_axis is not None or (ep and axis is not None)
    if partial_experts:
        e_local = quant.shape_of(lp["expert_gate_up"])[0]
        lo = lax.axis_index(ep_axis if ep_axis is not None else axis) * e_local
        order = jnp.argsort((flat_e - lo) % e)                 # local-first
        group_sizes = lax.dynamic_slice_in_dim(counts, lo, e_local)
    else:
        order = jnp.argsort(flat_e)                            # expert-sorted
        group_sizes = counts
    tok = order // k
    xs = x[tok]                                                # [T*K, d]

    def expert_mm(inp, w):
        if isinstance(w, quant.QuantWeight):
            return grouped_matmul_quant(inp, w.q, w.scale, group_sizes)
        return grouped_matmul(inp, w, group_sizes)

    gu = expert_mm(xs, lp["expert_gate_up"]).astype(x.dtype)
    g, u = jnp.split(gu, 2, axis=-1)
    mid = jax.nn.silu(g) * u
    out = expert_mm(mid, lp["expert_down"])                    # [T*K, d] f32
    if partial_experts:
        # Partial coverage: rows past this rank's local pairs are zero under
        # ragged_dot but UNINITIALIZED under the megablox Pallas kernel —
        # mask before the weighted combine either way.
        cov = jnp.sum(group_sizes)
        valid = jnp.arange(out.shape[0], dtype=jnp.int32) < cov
        out = jnp.where(valid[:, None], out, 0.0)
    out = out * w.reshape(-1)[order][:, None]
    y = jnp.zeros((t, d), jnp.float32).at[tok].add(out)
    return y.astype(x.dtype)


def _embed_lookup(embed, ids, axis, dtype):
    if axis is None:
        return quant.embed_rows(embed, ids, dtype)
    v_local = quant.shape_of(embed)[0]
    start = lax.axis_index(axis) * v_local
    local = ids - start
    ok = (local >= 0) & (local < v_local)
    rows = quant.embed_rows(embed, jnp.clip(local, 0, v_local - 1), dtype)
    rows = jnp.where(ok[:, None], rows, jnp.zeros_like(rows))
    return lax.psum(rows, axis)


# ----------------------------------------------------------------- forward


def forward(
    spec: Qwen3Spec,
    params: dict,
    kv: tuple[jax.Array, jax.Array],  # each [L, Hkv/tp, num_blocks, block_size, hd]
    inputs: Any,                       # StepInputs (engine.model_runner)
    *,
    tp: int = 1,
    axis: str | None = None,
    attn_impl,    # (q, k_new, v_new, k_all, v_all, layer, meta) -> (o, k, v)
    scan_layers: bool = True,
    rope: tuple | None = None,  # precomputed (cos, sin) tables — pass them
                                # through the jit as arguments; computed
                                # in-trace they bloat every bucket executable
                                # with a [max_position, hd/2] x2 constant
    moe_ep: bool = False,       # expert-parallel MoE placement (see _moe_ffn)
    ep_axis: str | None = None,  # 2-D ep x tp expert placement: experts
                                 # shard over this second mesh axis while
                                 # attention/dense replicate across it
):
    """One forward pass over a ragged packed batch; returns (hidden [T, D],
    updated kv). Runs unsharded (tp=1) or as the per-device program inside
    shard_map (axis='tp')."""
    hq = spec.num_q_heads // tp
    hkv = spec.num_kv_heads // tp
    hd = spec.head_dim
    q_size, kv_size = hq * hd, hkv * hd

    dtype = params["final_norm"].dtype  # compute dtype (norms never quantized)
    x = _embed_lookup(params["embed"], inputs.token_ids, axis, dtype)
    if spec.embed_scale:  # Gemma: embeddings scale by sqrt(D)
        x = x * jnp.asarray(spec.hidden_size ** 0.5, x.dtype)
    t = x.shape[0]

    cos, sin = rope if rope is not None else rope_tables(spec)
    safe_pos = jnp.clip(inputs.positions, 0, spec.max_position - 1)
    dual_rope = spec.rope_local_theta is not None  # [2, P, half] tables
    if dual_rope:
        cos_t, sin_t = cos[:, safe_pos], sin[:, safe_pos]   # [2, T, half]
    else:
        cos_t, sin_t = cos[safe_pos], sin[safe_pos]

    # Per-layer attention window (Gemma3 local/global interleave): a runtime
    # scalar per layer — 0 means global, mapped to a huge window so the
    # kernels' masking and page-skip predicates become no-ops. Scanned layers
    # share one compiled body; only the scalar differs.
    if spec.layer_windows:
        no_win = 1 << 30
        win_arr = jnp.asarray(
            [w if w else no_win for w in spec.layer_windows], jnp.int32
        )
        kind_arr = jnp.asarray(  # rope table row: 0 global, 1 local
            [1 if w else 0 for w in spec.layer_windows], jnp.int32
        )
    else:
        win_arr = kind_arr = jnp.zeros((spec.num_layers,), jnp.int32)

    meta = AttentionMeta(
        positions=inputs.positions,
        slot_mapping=inputs.slot_mapping,
        seq_ids=inputs.seq_ids,
        kv_lens=inputs.kv_lens,
        block_tables=inputs.block_tables,
        cu_q_lens=inputs.cu_q_lens,
        num_seqs=inputs.num_seqs,
        tile_seq=inputs.tile_seq,
        tile_pos0=inputs.tile_pos0,
        pair_tile=inputs.pair_tile,
        pair_page=inputs.pair_page,
        append_lens=getattr(inputs, "append_lens", None),
    )

    p1 = spec.norm_plus_one
    act_fn = (
        (lambda g: jax.nn.gelu(g, approximate=True))
        if spec.act == "gelu_tanh" else jax.nn.silu
    )

    def layer_fn(carry, xs):
        # The full stacked KV cache rides the scan carry and is updated with
        # an in-place scatter at layer index `i`: one resident buffer, no
        # xs/ys double allocation (that would 2x HBM at the pool's size).
        lp, win, kind = xs
        h, k_all, v_all, i = carry
        resid = h
        h = rms_norm(h, lp["input_norm"], spec.rms_eps, p1)
        qkv = quant.matmul(h, lp["qkv_proj"])
        if spec.has_qkv_bias:
            qkv = qkv + lp["qkv_bias"]
        q, k, v = jnp.split(qkv, (q_size, q_size + kv_size), axis=-1)
        q = q.reshape(t, hq, hd)
        k = k.reshape(t, hkv, hd)
        v = v.reshape(t, hkv, hd)
        if dual_rope:
            c_t = jnp.where(kind == 1, cos_t[1], cos_t[0])
            s_t = jnp.where(kind == 1, sin_t[1], sin_t[0])
        else:
            c_t, s_t = cos_t, sin_t
        if spec.has_qk_norm:
            q = rms_norm_rope(q, lp["q_norm"], spec.rms_eps, p1, c_t, s_t)
            k = rms_norm_rope(k, lp["k_norm"], spec.rms_eps, p1, c_t, s_t)
        else:
            q = apply_rope(q, c_t, s_t)
            k = apply_rope(k, c_t, s_t)
        # The attention impl also appends this step's K/V rows to the paged
        # cache (fused DMA writes on TPU; jnp scatter in the oracle).
        if spec.layer_windows:
            o, k_all, v_all = attn_impl(
                q, k, v, k_all, v_all, i, meta, window=win
            )
        else:
            o, k_all, v_all = attn_impl(q, k, v, k_all, v_all, i, meta)
        o = quant.matmul(o.reshape(t, q_size), lp["o_proj"])
        if axis is not None:
            # Wire the partial sums in the PARAMETER dtype: activations run
            # f32 on-chip (f32 dots measured faster than operand converts,
            # benchmarks/README r3), but a bf16 model's layer output is
            # bf16-precise anyway and f32 payloads double the dominant
            # per-step ICI term (2 x [T, D] per layer — see
            # benchmarks/predict_scaling.py). f32 checkpoints keep f32
            # payloads, so TP-vs-single-chip token equality tests are exact.
            o = lax.psum(o.astype(dtype), axis)
        if spec.sandwich_norms:  # norm the summed attention output
            o = rms_norm(o, lp["post_attn_norm"], spec.rms_eps, p1)
        h = resid + o
        resid = h
        h = rms_norm(h, lp["post_norm"], spec.rms_eps, p1)
        if spec.num_experts:
            h = _moe_ffn(spec, lp, h, axis, ep=moe_ep, ep_axis=ep_axis)
        else:
            gu = quant.matmul(h, lp["gate_up_proj"])
            g, u = jnp.split(gu, 2, axis=-1)
            h = quant.matmul(act_fn(g) * u, lp["down_proj"])
        if axis is not None or ep_axis is not None:
            # see the o_proj psum note; the 2-D expert placement folds the
            # ep-axis coverage sum into this same collective (dense models
            # never set ep_axis — their replicas must not be summed).
            ax = axis if ep_axis is None else (
                (ep_axis, axis) if axis is not None else ep_axis
            )
            h = lax.psum(h.astype(dtype), ax)
        if spec.sandwich_norms:
            h = rms_norm(h, lp["post_ffn_norm"], spec.rms_eps, p1)
        h = resid + h
        return (h, k_all, v_all, i + 1), None

    layer_params = params["layers"]
    k_all, v_all = kv
    if scan_layers:
        (x, k_all, v_all, _), _ = lax.scan(
            layer_fn, (x, k_all, v_all, jnp.int32(0)),
            (layer_params, win_arr, kind_arr),
        )
    else:
        carry = (x, k_all, v_all, jnp.int32(0))
        for i in range(spec.num_layers):
            lp = jax.tree.map(lambda a: a[i], layer_params)
            carry, _ = layer_fn(carry, (lp, win_arr[i], kind_arr[i]))
        x, k_all, v_all, _ = carry

    x = rms_norm(x, params["final_norm"], spec.rms_eps, p1)
    return x, (k_all, v_all)


def lm_head_weight(params):
    """Tied-embedding aware LM head (reference qwen3.py:202-203)."""
    return params.get("lm_head", params["embed"])


# ------------------------------------------------------------ quantization

# Matmul weights eligible for weight-only quantization, with their TP kind:
# "col"/"row" are [L, in, out] (contraction dim 1); "vocab" are [V, D]
# (contraction/feature dim 1, giving per-row scales that serve both the
# embedding gather and the LM-head matmul under tied embeddings).
QUANT_PLAN = {
    ("layers", "qkv_proj"): "col",
    ("layers", "gate_up_proj"): "col",
    ("layers", "o_proj"): "row",
    ("layers", "down_proj"): "row",
    # MoE expert stacks [L, E, in, out]: per-(expert, out-channel) scales
    # commute with the grouped matmul, so dequantization is a row-gathered
    # multiply AFTER the int8-rhs gmm kernel (ops/moe.grouped_matmul_quant).
    ("layers", "expert_gate_up"): "expert_col",
    ("layers", "expert_down"): "expert_row",
    ("embed",): "vocab",
    ("lm_head",): "vocab",
}


def effective_quant_plan(mode: str | None) -> dict:
    """QUANT_PLAN filtered by mode. Expert weights quantize under int8
    (per-out-channel scales commute with the grouped matmul) and int4
    (group-wise-k scales dequantized in-kernel by megablox_gmm.gmm_int4);
    not under fp8 — its converts are software-emulated on v5e. Absent
    entries load as bf16."""
    if mode is None:
        return {}
    return {
        p: k for p, k in QUANT_PLAN.items()
        if not k.startswith("expert") or mode in ("int8", "int4")
    }


def quantize_params(spec: Qwen3Spec, params: dict, mode: str, tp: int = 1) -> dict:
    """Quantize matmul weights in a host-side parameter tree (numpy in/out);
    norms, biases, and tree structure are untouched. For row-parallel weights
    the int4 group count must divide evenly over TP ranks (the scale's group
    dim shards with the contraction dim)."""
    assert mode in quant.WEIGHT_QUANT_MODES, mode
    for path, kind in effective_quant_plan(mode).items():
        node = params
        for key in path[:-1]:
            node = node.get(key, {})
        leaf = node.get(path[-1])
        if leaf is None:
            continue  # e.g. lm_head absent under tied embeddings
        if mode == "int4" and kind.startswith("expert"):
            # Expert stacks [L, E, in, out]: k-nibble-packed storage for the
            # in-kernel dequant (ops/quant.quantize_expert_int4). Width-TP
            # shards expert_down's contraction dim, so its group count must
            # split over ranks (EP shards the expert dim instead; tp=1 there
            # keeps the kernel-native group 128).
            shard_k = tp if kind == "expert_row" else 1
            group = quant.expert_int4_group(leaf.shape[2], shard_k)
            node[path[-1]] = quant.quantize_expert_int4(leaf, group)
            continue
        group = None
        if mode == "int4" and kind == "row":
            in_dim = leaf.shape[1]
            group = quant.INT4_GROUP
            while in_dim % group or (in_dim // group) % tp:
                group //= 2
        axis = 2 if kind.startswith("expert") else 1  # experts: [L,E,in,out]
        node[path[-1]] = quant.quantize_array(leaf, mode, axis=axis, group=group)
    return params


# ------------------------------------------------------------------- init


def _param_shapes(spec: Qwen3Spec) -> dict:
    l, d, i = spec.num_layers, spec.hidden_size, spec.intermediate_size
    hd = spec.head_dim
    qo = spec.num_q_heads * hd
    kvo = spec.num_kv_heads * hd
    layers = {
        "input_norm": (l, d),
        "qkv_proj": (l, d, qo + 2 * kvo),
        "o_proj": (l, qo, d),
        "post_norm": (l, d),
    }
    if spec.num_experts:
        e, mi = spec.num_experts, spec.moe_intermediate_size
        layers["router"] = (l, d, e)
        layers["expert_gate_up"] = (l, e, d, 2 * mi)
        layers["expert_down"] = (l, e, mi, d)
    else:
        layers["gate_up_proj"] = (l, d, 2 * i)
        layers["down_proj"] = (l, i, d)
    if spec.has_qkv_bias:
        layers["qkv_bias"] = (l, qo + 2 * kvo)
    if spec.has_qk_norm:
        layers["q_norm"] = (l, hd)
        layers["k_norm"] = (l, hd)
    if spec.sandwich_norms:
        layers["post_attn_norm"] = (l, d)
        layers["post_ffn_norm"] = (l, d)
    shapes = {
        "embed": (spec.vocab_size, d),
        "layers": layers,
        "final_norm": (d,),
    }
    if not spec.tie_embeddings:
        shapes["lm_head"] = (spec.vocab_size, d)
    return shapes


def init_params(spec: Qwen3Spec, seed_or_key=0, dtype=jnp.bfloat16):
    """Random host-side parameters with the real structure. Prefer
    ``device_init_params`` (the engine's path): this host's memory bandwidth
    makes multi-GB numpy generation take tens of minutes."""
    import ml_dtypes

    if np.isscalar(seed_or_key):
        seed = int(seed_or_key)
    else:  # a jax PRNG key (legacy callers)
        seed = int(np.asarray(jax.random.key_data(seed_or_key)).ravel()[-1])
    rng = np.random.default_rng(seed)
    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(dtype)
    shapes = _param_shapes(spec)
    flat, treedef = jax.tree.flatten(shapes, is_leaf=lambda x: isinstance(x, tuple))
    leaves = []
    for shape in flat:
        if len(shape) <= 2 and shape[-1] != spec.hidden_size:
            leaves.append(np.ones(shape, np_dtype))  # norm weights
        else:
            scale = (shape[-2] if len(shape) > 1 else shape[-1]) ** -0.5
            leaves.append(
                (scale * rng.standard_normal(shape, np.float32)).astype(np_dtype)
            )
    params = jax.tree.unflatten(treedef, leaves)
    # Norm-like params init to ones — or zeros for (1+w) norms (Gemma) —
    # regardless of shape heuristics.
    norm_init = np.zeros_like if spec.norm_plus_one else np.ones_like
    for name in ("input_norm", "post_norm", "q_norm", "k_norm",
                 "post_attn_norm", "post_ffn_norm"):
        if name in params["layers"]:
            params["layers"][name] = norm_init(params["layers"][name])
    params["final_norm"] = norm_init(params["final_norm"])
    if spec.has_qkv_bias:
        params["layers"]["qkv_bias"] = np.zeros_like(params["layers"]["qkv_bias"])
    return params


def device_init_params(spec: Qwen3Spec, seed: int = 0, dtype=jnp.bfloat16, *,
                       quant: str | None = None, tp: int = 1, shardings=None):
    """Random parameters generated directly on the accelerator, already in
    storage dtype and sharded (``shardings``: optional pytree mirroring the
    parameter tree, QuantWeight leaves holding per-field shardings).

    Benchmark startup path: host-side generation + device transfer of a
    multi-GB tree runs at this environment's ~40 MB/s host memory bandwidth
    (tens of minutes for 8B); on-device generation is seconds and never
    materializes a full-precision copy.
    """
    shapes = _param_shapes(spec)
    quant_paths = set(effective_quant_plan(quant))
    root = jax.random.PRNGKey(seed)
    norm_names = ("input_norm", "post_norm", "q_norm", "k_norm", "final_norm",
                  "post_attn_norm", "post_ffn_norm")
    norm_val = 0.0 if spec.norm_plus_one else 1.0  # (1+w) norms center at 0
    counter = [0]

    def make(fn, sharding):
        kwargs = {"out_shardings": sharding} if sharding is not None else {}
        return jax.jit(fn, **kwargs)()

    def leaf(path, shape, sharding):
        name = path[-1]
        counter[0] += 1
        key = jax.random.fold_in(root, counter[0])
        if name in norm_names:
            return make(lambda: jnp.full(shape, norm_val, dtype), sharding)
        if name == "qkv_bias":
            return make(lambda: jnp.zeros(shape, dtype), sharding)
        if path in quant_paths:
            return _device_quant_leaf(
                shape, quant, key, kind=QUANT_PLAN[path], tp=tp,
                sharding=sharding,
            )
        in_dim = shape[-2] if len(shape) > 1 else shape[-1]
        return make(
            lambda: (in_dim ** -0.5)
            * jax.random.normal(key, shape, jnp.float32).astype(dtype),
            sharding,
        )

    def walk(node, shard, path):
        if isinstance(node, dict):
            return {
                k: walk(v, None if shard is None else shard[k], path + (k,))
                for k, v in node.items()
            }
        return leaf(path, node, shard)

    return walk(shapes, shardings, ())


def _device_quant_leaf(shape: tuple, mode: str, key, *, kind: str, tp: int,
                       sharding):
    """A random QuantWeight in storage format, matching
    ``quantize_array``'s layouts exactly (scale shapes, int4 group shrinking
    for off-size / TP-split contraction dims). Matmul weights are [L, in,
    out] (axis=1); expert stacks are [L, E, in, out] (axis=2, int8-only —
    see effective_quant_plan)."""
    if kind.startswith("expert"):
        assert mode in ("int8", "int4"), (
            "expert weights quantize under int8/int4 only"
        )
        in_dim = shape[2]
        if mode == "int4":
            # k-nibble-packed int8 storage (quant.pack_int4_k): every byte
            # decodes to two nibbles in [-8, 7], so random bytes are valid.
            # The group count must split over ranks only when the contraction
            # dim actually shards (width-TP expert_down; not EP).
            shard_k = 1
            if kind == "expert_row":
                spec = getattr(getattr(sharding, "q", None), "spec", None)
                shard_k = 1 if spec is not None and spec[2] is None else tp
            g = quant.expert_int4_group(in_dim, shard_k)
            qshape = shape[:2] + (in_dim // 2,) + shape[3:]
            sshape = shape[:2] + (in_dim // g,) + shape[3:]
            qmax = 7.0
        else:
            qshape = shape
            sshape = shape[:2] + shape[3:]
            qmax = 127.0
        q = jax.jit(
            lambda: jax.random.randint(key, qshape, -127, 128, jnp.int8),
            **({"out_shardings": sharding.q} if sharding is not None else {}),
        )()
        sfn = lambda: jnp.full(sshape, in_dim ** -0.5 / qmax, jnp.float32)
        scale = jax.jit(
            sfn,
            **({"out_shardings": sharding.scale}
               if sharding is not None else {}),
        )()
        return quant.QuantWeight(q=q, scale=scale, mode=mode)
    in_dim = shape[1]
    qsh = ssh = None
    if sharding is not None:
        qsh, ssh = sharding.q, sharding.scale
    if mode == "int4":
        g = quant.INT4_GROUP
        while in_dim % g or (kind == "row" and (in_dim // g) % tp):
            g //= 2
        # Generate int8 bytes, then convert to packed int4 via the AOT
        # identity (see quant.to_packed_int4 for why a Format out_shardings
        # is not reliable here).
        gen = lambda: jax.random.randint(key, shape, -8, 8, jnp.int8)
        sshape = shape[:1] + (in_dim // g,) + shape[2:]
        qmax = 7.0
    else:
        if mode == "int8":
            gen = lambda: jax.random.randint(key, shape, -127, 128, jnp.int8)
        else:  # fp8
            gen = lambda: jax.random.randint(key, shape, -8, 8, jnp.int8).astype(
                jnp.float8_e4m3fn
            )
        sshape = shape[:1] + shape[2:]
        qmax = 127.0 if mode == "int8" else 8.0
    q = jax.jit(gen, **({"out_shardings": qsh} if qsh is not None else {}))()
    if mode == "int4":
        q = quant.to_packed_int4(q)
    sfn = lambda: jnp.full(sshape, in_dim ** -0.5 / qmax, jnp.float32)
    scale = jax.jit(sfn, **({"out_shardings": ssh} if ssh is not None else {}))()
    return quant.QuantWeight(q=q, scale=scale, mode=mode)


# ------------------------------------------------------------ HF loading


def hf_param_plan(spec: Qwen3Spec, tp: int, ep: bool = False) -> dict:
    """Describe how HF checkpoint tensors map onto our parameter tree.

    Each entry: target path -> (kind, [list of per-layer HF name templates or
    plain names], extra). Kinds understood by utils.loader:
    - "stack":        stack [L] of single tensors (norm weights)
    - "fused_col":    per-layer fused column-parallel weight, rank-blocked,
                      stored transposed [in, out] (HF is [out, in])
    - "fused_col_bias": matching bias, rank-blocked
    - "row":          per-layer row-parallel weight, transposed [in, out]
    - "single":       single tensor, kept [out, in] orientation (embeddings)
    """
    hd = spec.head_dim
    q_parts = [
        ("model.layers.{i}.self_attn.q_proj", spec.num_q_heads * hd),
        ("model.layers.{i}.self_attn.k_proj", spec.num_kv_heads * hd),
        ("model.layers.{i}.self_attn.v_proj", spec.num_kv_heads * hd),
    ]
    mlp_parts = [
        ("model.layers.{i}.mlp.gate_proj", spec.intermediate_size),
        ("model.layers.{i}.mlp.up_proj", spec.intermediate_size),
    ]
    plan = {
        ("embed",): ("single", "model.embed_tokens.weight"),
        ("final_norm",): ("single", "model.norm.weight"),
        ("layers", "input_norm"): ("stack", "model.layers.{i}.input_layernorm.weight"),
        ("layers", "post_norm"): (
            "stack",
            "model.layers.{i}.post_attention_layernorm.weight",
        ),
        ("layers", "qkv_proj"): ("fused_col", q_parts),
        ("layers", "o_proj"): ("row", "model.layers.{i}.self_attn.o_proj.weight"),
    }
    if spec.num_experts:
        ex = "model.layers.{i}.mlp.experts.{e}"
        plan[("layers", "router")] = ("row", "model.layers.{i}.mlp.gate.weight")
        # Expert-parallel placement leaves each expert's width UNSHARDED
        # (the expert dim shards instead), so the gate|up fuse must use the
        # natural tp=1 layout — a rank-blocked fuse would make the in-model
        # split(gu, 2) pair gate halves with gate halves.
        plan[("layers", "expert_gate_up")] = (
            "experts_fused_col",
            [(ex + ".gate_proj", spec.moe_intermediate_size),
             (ex + ".up_proj", spec.moe_intermediate_size)],
            spec.num_experts,
            1 if ep else tp,
        )
        plan[("layers", "expert_down")] = (
            "experts_row", ex + ".down_proj.weight", spec.num_experts,
        )
    else:
        plan[("layers", "gate_up_proj")] = ("fused_col", mlp_parts)
        plan[("layers", "down_proj")] = (
            "row", "model.layers.{i}.mlp.down_proj.weight",
        )
    if spec.has_qk_norm:
        plan[("layers", "q_norm")] = ("stack", "model.layers.{i}.self_attn.q_norm.weight")
        plan[("layers", "k_norm")] = ("stack", "model.layers.{i}.self_attn.k_norm.weight")
    if spec.sandwich_norms:
        # Gemma3 norm naming: HF's post_attention_layernorm norms the
        # attention OUTPUT (our post_attn_norm) and pre_feedforward_layernorm
        # plays the usual pre-FFN role (our post_norm slot).
        plan[("layers", "post_norm")] = (
            "stack", "model.layers.{i}.pre_feedforward_layernorm.weight",
        )
        plan[("layers", "post_attn_norm")] = (
            "stack", "model.layers.{i}.post_attention_layernorm.weight",
        )
        plan[("layers", "post_ffn_norm")] = (
            "stack", "model.layers.{i}.post_feedforward_layernorm.weight",
        )
    if spec.has_qkv_bias:
        plan[("layers", "qkv_bias")] = ("fused_col_bias", q_parts)
    if not spec.tie_embeddings:
        plan[("lm_head",)] = ("single", "lm_head.weight")
    return plan
