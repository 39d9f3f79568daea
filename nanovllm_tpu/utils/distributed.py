"""Multi-host (DCN) support: multi-controller SPMD.

The reference is single-node: rank-0 drives TP worker subprocesses over a
shared-memory mailbox (reference model_runner.py:41-89). The TPU-native
design has no control plane at all (SURVEY.md §5 "Distributed comm backend"):
every host runs the *same* engine program on the *same* request stream; the
scheduler and sampler are deterministic functions of (requests, seed), so all
hosts build identical step inputs and the jitted step — compiled over the
global mesh — runs as one SPMD program with XLA collectives crossing ICI
within a slice and DCN between hosts.

Usage (same script on every host):

    from nanovllm_tpu.utils.distributed import init_multihost
    init_multihost(coordinator="host0:29777", num_processes=N, process_id=i)
    llm = LLM(model, tensor_parallel_size=jax.device_count(), ...)
    out = llm.generate(prompts, params, use_tqdm=is_main_host())

Every host must pass the same prompts/params in the same order.
"""

from __future__ import annotations

import jax


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None, **kwargs) -> None:
    """Initialize JAX's distributed runtime (must run before first device use).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU simulation (tests use 2 processes x 4 virtual
    devices with gloo collectives).
    """
    if _already_initialized():
        return
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # TPU builds / older jax: collectives ride ICI/DCN natively
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def _already_initialized() -> bool:
    state = getattr(jax._src.distributed, "global_state", None)
    return bool(state and state.client is not None)


def is_main_host() -> bool:
    """True on the host that should own user-facing output (progress bars)."""
    return jax.process_index() == 0
