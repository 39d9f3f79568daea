"""Multi-host (DCN) SPMD: two controller processes, one global mesh.

The reference cannot do this at all (single node, SHM control plane,
model_runner.py:41-89). Our design (SURVEY.md §5): every host runs the same
deterministic engine program; the jitted step compiles over the global mesh
and XLA collectives cross hosts. Simulated here with 2 processes x 4 virtual
CPU devices (gloo collectives), the same recipe as a 2-host TPU slice.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nanovllm_tpu_jax_cache")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nanovllm_tpu.utils.distributed import init_multihost, is_main_host
    init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.utils.testing import QWEN3_TINY, make_qwen3_dir
    model_dir = make_qwen3_dir(f"/tmp/qwen3-tiny-multihost", QWEN3_TINY)
    llm = LLM(model_dir, random_weights=True, tensor_parallel_size=8,
              max_num_seqs=4, max_model_len=256, max_num_batched_tokens=256,
              kvcache_block_size=16, fetch_interval=2, rng_seed=7)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11, 12, 13, 14]]
    outs = llm.generate(prompts,
                        SamplingParams(temperature=0.8, max_tokens=8,
                                       ignore_eos=True),
                        use_tqdm=False)
    print("TOKENS=" + repr([o["token_ids"] for o in outs]), flush=True)
    llm.exit()
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _extract(out: str) -> str:
    lines = [l for l in out.splitlines() if l.startswith("TOKENS=")]
    assert lines, f"no TOKENS line in worker output:\n{out[-2000:]}"
    return lines[0]


@pytest.mark.slow
def test_two_host_spmd_matches_single_host(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        outs.append(_extract(out))

    # Both hosts must observe identical sampled tokens (replicated ring).
    assert outs[0] == outs[1]

    # And the 2-process global mesh must sample exactly what a single
    # process running the same 8-device mesh samples (same SPMD program).
    single = subprocess.run(
        [sys.executable, "-c", WORKER.replace(
            "init_multihost(f\"localhost:{port}\", num_processes=2, process_id=pid)",
            "",
        ).replace("len(jax.local_devices()) == 4", "len(jax.local_devices()) == 8")
         .replace('os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"',
                  'os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"'),
         "0", str(port), REPO],
        capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-2000:]
    assert _extract(single.stdout) == outs[0]


RANK0_WORKER = textwrap.dedent(
    """
    import sys
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    import os, queue
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nanovllm_tpu_jax_cache")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nanovllm_tpu.utils.distributed import init_multihost
    init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)

    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.utils.testing import QWEN3_TINY, make_qwen3_dir
    model_dir = make_qwen3_dir(f"/tmp/qwen3-tiny-mh-rank0", QWEN3_TINY)
    llm = LLM(model_dir, random_weights=True, tensor_parallel_size=8,
              max_num_seqs=4, max_model_len=256, max_num_batched_tokens=256,
              kvcache_block_size=16, fetch_interval=2, rng_seed=7)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11, 12, 13, 14]]
    sp = SamplingParams(temperature=0.8, max_tokens=8, ignore_eos=True)

    # ONLY process 0 ever sees the request stream.
    from nanovllm_tpu.entrypoints.api_server import ServingEngine, serve_follower
    if pid == 0:
        serving = ServingEngine(llm, multihost=True)
        outs = [serving.submit(p, sp)[0] for p in prompts]
        toks = []
        for q_ in outs:
            got = []
            while True:
                ev = q_.get(timeout=300)
                if not isinstance(ev, dict):
                    break  # end-of-stream sentinel
                assert "error" not in ev, ev
                got += ev["token_ids"]
            toks.append(got)
        serving.shutdown()
        print("TOKENS=" + repr(toks), flush=True)
    else:
        fin = {}
        serve_follower(llm, on_finish=lambda sid, t: fin.__setitem__(sid, t))
        print("TOKENS=" + repr([fin[k] for k in sorted(fin)]), flush=True)
    llm.exit()
    """
)


@pytest.mark.slow
def test_rank0_request_distribution(tmp_path):
    """Rank-0 request distribution (SURVEY §5): only process 0 enqueues;
    process 1 replays broadcast admissions and ends with identical tokens."""
    port = _free_port()
    script = tmp_path / "worker_rank0.py"
    script.write_text(RANK0_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        outs.append(_extract(out))
    assert outs[0] == outs[1]
