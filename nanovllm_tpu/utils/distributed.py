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


# --------------------------------------------- rank-0 request distribution
#
# SPMD needs every host to run the same engine program on the same request
# stream; these helpers let ONLY process 0 hold the stream (SURVEY §5: "rank-0
# host broadcasts schedule / request distribution"). Objects pickle onto a
# padded uint8 buffer broadcast via a device collective (gloo on CPU, DCN on
# pods); buffer lengths round to 4 KiB buckets so repeated broadcasts reuse a
# handful of compiled programs.

_BCAST_BUCKET = 4096


def broadcast_from_host0(obj=None):
    """Broadcast any picklable object from process 0 to every host; other
    hosts' ``obj`` argument is ignored. No-op on single-process runs."""
    if jax.process_count() == 1:
        return obj
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        data = np.frombuffer(pickle.dumps(obj), np.uint8)
        n = data.size
    else:
        data = np.zeros(0, np.uint8)
        n = 0
    n = int(multihost_utils.broadcast_one_to_all(np.int32(n)))
    padded = -(-max(n, 1) // _BCAST_BUCKET) * _BCAST_BUCKET
    buf = np.zeros(padded, np.uint8)
    buf[: data.size] = data
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(out[:n].tobytes())


def distribute_requests(prompts=None, sampling_params=None):
    """Offline-batch helper: process 0 passes the real (prompts,
    sampling_params); every other host calls with no arguments and receives
    them. All hosts then run the identical ``llm.generate(...)``:

        prompts, params = distribute_requests(prompts, params)  # host 0
        prompts, params = distribute_requests()                 # hosts > 0
        out = llm.generate(prompts, params, use_tqdm=is_main_host())
    """
    return broadcast_from_host0((prompts, sampling_params))
