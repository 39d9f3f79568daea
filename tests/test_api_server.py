"""Online HTTP serving: health, blocking + streaming completions, and
mid-flight admission into the continuous batch."""

import http.client
import json
import threading

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.entrypoints.api_server import serve

ENGINE_KW = dict(
    max_num_batched_tokens=128,
    max_num_seqs=8,
    max_model_len=128,
    kvcache_block_size=16,
    num_kvcache_blocks=64,
    decode_buckets=(4, 8),
    prefill_buckets=(64, 128),
    dtype="float32",
    use_pallas_attention=False,
    enforce_eager=True,
    fetch_interval=4,
)


_server_llm = [None]  # exposes the served engine to white-box assertions


@pytest.fixture(scope="module")
def server(tiny_qwen3_dir):
    llm = LLM(tiny_qwen3_dir, **ENGINE_KW)
    _server_llm[0] = llm
    rng = np.random.default_rng(5)
    prompt = rng.integers(2, 500, size=11).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=14, ignore_eos=True)
    expected = llm.generate([prompt], sp, use_tqdm=False)[0]
    srv, serving = serve(llm, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], prompt, expected
    srv.shutdown()
    serving.shutdown()


def _post(port, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/generate", json.dumps(body),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def test_health(server):
    port, _, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/health")
    r = conn.getresponse()
    assert r.status == 200 and json.loads(r.read())["status"] == "ok"


def test_blocking_completion_matches_offline(server):
    port, prompt, expected = server
    r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=14,
                         ignore_eos=True))
    assert r.status == 200
    out = json.loads(r.read())
    assert out["token_ids"] == expected["token_ids"]
    assert out["text"] == expected["text"]


def test_streaming_completion(server):
    port, prompt, expected = server
    r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=14,
                         ignore_eos=True, stream=True))
    assert r.status == 200
    events = [json.loads(line) for line in r.read().splitlines() if line]
    toks = [t for ev in events for t in ev["token_ids"]]
    assert toks == expected["token_ids"]
    assert events[-1]["finished"] and events[-1]["text"] == expected["text"]
    assert len(events) > 1  # fetch_interval(4) < max_tokens(14): incremental


def test_concurrent_requests_continuous_batch(server):
    """Several requests in flight at once all return the same tokens as the
    lone-request run (greedy decode is batch-composition-independent)."""
    port, prompt, expected = server
    results = {}

    def hit(i):
        r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=14,
                             ignore_eos=True))
        results[i] = json.loads(r.read())["token_ids"]

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == {i: expected["token_ids"] for i in range(4)}


def test_bad_request(server):
    port, _, _ = server
    assert _post(port, dict(max_tokens=4)).status == 400  # no prompt


def test_client_disconnect_cancels_request(server, tiny_qwen3_dir):
    """Closing a streaming connection mid-generation aborts the sequence:
    the engine drains to idle, every KV block is freed, and the server keeps
    serving."""
    import socket
    import time

    port, prompt, expected = server
    body = json.dumps(dict(prompt=prompt, temperature=0.0, max_tokens=100,
                           ignore_eos=True, stream=True)).encode()
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    s.sendall(b"POST /generate HTTP/1.1\r\nHost: x\r\n"
              b"Content-Type: application/json\r\n"
              + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    s.recv(1024)  # headers + first chunk started
    s.close()     # client goes away mid-stream

    # The server loop must abort the sequence and return to idle.
    llm = _server_llm[0]
    deadline = time.time() + 60
    while time.time() < deadline:
        if llm.is_finished() and not llm.scheduler.running:
            break
        time.sleep(0.5)
    assert llm.is_finished(), "engine did not drain after client disconnect"
    bm = llm.scheduler.block_manager
    assert bm.num_free_blocks == bm.num_blocks, "leaked KV blocks after abort"
    # Still serving: a fresh request completes with the usual tokens.
    r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=14,
                         ignore_eos=True))
    assert json.loads(r.read())["token_ids"] == expected["token_ids"]


def test_chat_messages_form(server):
    """The chat form routes through the chat template (or joined contents for
    template-less tokenizers) and generates normally."""
    port, _, _ = server
    r = _post(port, dict(
        messages=[{"role": "user", "content": "hello world"}],
        temperature=0.0, max_tokens=5, ignore_eos=True))
    assert r.status == 200
    out = json.loads(r.read())
    assert len(out["token_ids"]) == 5


def test_stop_token_ids_param(server):
    """Per-request stop_token_ids plumb through /generate (first occurrence
    of the stop id ends the completion, stop token included)."""
    port, prompt, expected = server
    t = expected["token_ids"][3]
    k = expected["token_ids"].index(t)
    r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=14,
                         ignore_eos=True, stop_token_ids=[t]))
    assert r.status == 200
    assert json.loads(r.read())["token_ids"] == expected["token_ids"][: k + 1]


def test_bad_sampling_params_rejected(server):
    port, prompt, _ = server
    assert _post(port, dict(prompt=prompt, top_p=7.5)).status == 400


def test_openai_models(server):
    port, _, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/v1/models")
    out = json.loads(conn.getresponse().read())
    assert out["object"] == "list" and len(out["data"]) == 1


def _post_path(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def test_openai_completions(server):
    port, prompt, expected = server
    r = _post_path(port, "/v1/completions",
                   dict(prompt=prompt, temperature=0.0, max_tokens=14))
    assert r.status == 200
    out = json.loads(r.read())
    assert out["object"] == "text_completion"
    choice = out["choices"][0]
    # Greedy without ignore_eos: either the full 14-token trace (length) or
    # an early EOS stop; both must be deterministic and well-formed.
    assert choice["finish_reason"] in ("stop", "length")
    assert out["usage"]["prompt_tokens"] == len(prompt)
    assert out["usage"]["completion_tokens"] >= 1
    if choice["finish_reason"] == "length":
        assert choice["text"] == expected["text"]


def test_openai_chat_stream_matches_blocking(server):
    port, _, _ = server
    body = dict(messages=[{"role": "user", "content": "hello world"}],
                temperature=0.0, max_tokens=5)
    blocking = json.loads(_post_path(port, "/v1/chat/completions", body).read())
    content = blocking["choices"][0]["message"]["content"]

    r = _post_path(port, "/v1/chat/completions", dict(body, stream=True))
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"
    payloads = []
    for line in r.read().decode().splitlines():
        if line.startswith("data: "):
            payloads.append(line[len("data: "):])
    assert payloads[-1] == "[DONE]"
    chunks = [json.loads(p) for p in payloads[:-1]]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    deltas = "".join(
        c["choices"][0]["delta"].get("content", "") for c in chunks
    )
    assert deltas == content
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_openai_bad_request(server):
    port, _, _ = server
    r = _post_path(port, "/v1/completions", dict(prompt="a", n=0))
    assert r.status == 400
    assert "error" in json.loads(r.read())


def test_openai_n_choices(server):
    port, prompt, expected = server
    r = _post_path(port, "/v1/completions",
                   dict(prompt=prompt, temperature=0.0, max_tokens=6, n=3))
    assert r.status == 200
    out = json.loads(r.read())
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    # Greedy: all fan-out choices must agree (and match the offline trace).
    assert len({c["text"] for c in out["choices"]}) == 1
    assert out["usage"]["prompt_tokens"] == len(prompt)  # counted once (OpenAI)

    # Streaming n>1: chunks interleave with per-choice indices; every choice
    # reaches a finish_reason.
    r = _post_path(port, "/v1/chat/completions",
                   dict(messages=[{"role": "user", "content": "hello"}],
                        temperature=0.0, max_tokens=4, n=2, stream=True))
    assert r.status == 200
    finished = set()
    for line in r.read().decode().splitlines():
        if line.startswith("data: ") and line != "data: [DONE]":
            c = json.loads(line[6:])["choices"][0]
            if c["finish_reason"]:
                finished.add(c["index"])
    assert finished == {0, 1}


def test_metrics_endpoint(server):
    port, _, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    raw = conn.getresponse().read()

    def reject(tok):  # strict JSON: NaN/Infinity must not appear
        raise AssertionError(f"non-JSON constant in /metrics: {tok}")

    m = json.loads(raw, parse_constant=reject)
    assert {"num_waiting", "num_running", "num_streams"} <= set(m)
    assert m["requests_finished"] >= 1  # module fixture already served some


def test_logprobs_generate_and_openai(server):
    port, prompt, expected = server
    # /generate: aligned chosen-token logprobs.
    r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=6,
                         ignore_eos=True, logprobs=True))
    assert r.status == 200
    out = json.loads(r.read())
    assert len(out["logprobs"]) == len(out["token_ids"]) == 6
    assert all(isinstance(v, float) and v <= 0.0 for v in out["logprobs"])
    assert out["token_ids"] == expected["token_ids"][:6]

    # /v1/completions with classic logprobs=1: OpenAI field shape.
    r = _post_path(port, "/v1/completions",
                   dict(prompt=prompt, temperature=0.0, max_tokens=6,
                        logprobs=1))
    assert r.status == 200
    choice = json.loads(r.read())["choices"][0]
    lp = choice["logprobs"]
    assert len(lp["token_logprobs"]) == len(lp["tokens"])
    assert lp["token_logprobs"] == out["logprobs"][: len(lp["token_logprobs"])]

    # /v1/chat/completions with logprobs=true: content entries.
    r = _post_path(port, "/v1/chat/completions",
                   dict(messages=[{"role": "user", "content": "hello"}],
                        temperature=0.0, max_tokens=4, logprobs=True))
    assert r.status == 200
    choice = json.loads(r.read())["choices"][0]
    entries = choice["logprobs"]["content"]
    assert len(entries) >= 1
    assert all("token" in e and e["logprob"] <= 0.0 for e in entries)


def test_logit_bias_param(server):
    port, prompt, _ = server
    r = _post(port, dict(prompt=prompt, temperature=0.0, max_tokens=4,
                         ignore_eos=True, logit_bias={"9": 1000.0}))
    assert r.status == 200
    assert json.loads(r.read())["token_ids"] == [9] * 4

    r = _post_path(port, "/v1/completions",
                   dict(prompt=prompt, temperature=0.0, max_tokens=3,
                        logit_bias={"9": 1000.0}))
    assert r.status == 200
    out = json.loads(r.read())
    # token 9 maps to a real word in the tiny tokenizer; just check shape +
    # determinism of the forced choice via usage.
    assert out["usage"]["completion_tokens"] >= 1


def test_seed_param(server):
    port, prompt, _ = server
    body = dict(prompt=prompt, temperature=1.0, max_tokens=6, ignore_eos=True,
                seed=7)
    a = json.loads(_post(port, body).read())["token_ids"]
    b = json.loads(_post(port, body).read())["token_ids"]
    assert a == b
    c = json.loads(_post(port, dict(body, seed=8)).read())["token_ids"]
    assert c != a


def test_data_parallel_pool(tiny_qwen3_dir):
    """Two engine replicas on disjoint device subsets behind one server:
    concurrent requests spread across replicas and all return the offline
    tokens (greedy)."""
    from nanovllm_tpu.entrypoints.api_server import ServingPool

    engines = [
        LLM(tiny_qwen3_dir, device_offset=r, **ENGINE_KW) for r in range(2)
    ]
    rng = np.random.default_rng(23)
    prompt = rng.integers(2, 500, size=12).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    expected = engines[0].generate([prompt], sp, use_tqdm=False)[0]

    srv, serving = serve(engines, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        assert isinstance(serving, ServingPool)
        port = srv.server_address[1]
        results = {}

        def hit(i):
            r = _post(port, dict(prompt=prompt, temperature=0.0,
                                 max_tokens=10, ignore_eos=True))
            results[i] = json.loads(r.read())["token_ids"]

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert results == {i: expected["token_ids"] for i in range(4)}
        # Both replicas actually served work.
        served = [len(e.metrics.e2e_latencies) for e in engines]
        assert all(n >= 1 for n in served), served

        # Aggregated /metrics exposes per-replica stats.
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/metrics")
        m = json.loads(conn.getresponse().read())
        assert len(m["replicas"]) == 2
    finally:
        srv.shutdown()
        serving.shutdown()


def test_seeded_n_choices_distinct(server):
    """n>1 with a seed must return n DISTINCT choices (per-choice seed
    offset), each individually reproducible."""
    port, prompt, _ = server
    # Compare logprob traces, not text: the tiny test tokenizer decodes most
    # sampled ids to the same <unk> text, which would mask distinctness.
    body = dict(prompt=prompt, temperature=1.0, max_tokens=8, n=3, seed=5,
                logprobs=1)
    out1 = json.loads(_post_path(port, "/v1/completions", body).read())
    traces1 = [tuple(c["logprobs"]["token_logprobs"]) for c in out1["choices"]]
    assert len(set(traces1)) == 3, "seeded n>1 collapsed to identical choices"
    out2 = json.loads(_post_path(port, "/v1/completions", body).read())
    traces2 = [tuple(c["logprobs"]["token_logprobs"]) for c in out2["choices"]]
    assert traces2 == traces1  # reproducible per choice
    # seed/logit_bias values outside int32 are rejected, not a server crash.
    r = _post(port, dict(prompt=prompt, max_tokens=4, seed=2**40))
    assert r.status == 400
    r = _post(port, dict(prompt=prompt, max_tokens=4,
                         logit_bias={str(2**40): 1.0}))
    assert r.status == 400


def test_guided_rejected_without_config(server):
    """guided='json' against a server whose engine lacks guided_json must
    surface a request-level error, not a 500."""
    port, prompt, _ = server
    r = _post(port, dict(prompt=prompt, max_tokens=8, guided="json"))
    body = r.read().decode()
    assert r.status in (200, 400) and "guided_json" in (
        json.loads(body).get("error", "") if r.status == 200 else body
    )


def test_guided_server_roundtrip(tmp_path_factory):
    """Happy path over HTTP: /generate with guided='json' and the OpenAI
    endpoint with response_format json_object both produce automaton-valid
    streams from a guided-enabled engine."""
    from tests.test_guided_engine import (_assert_valid_json_stream,
                                          _write_guided_fixture)

    path = _write_guided_fixture(
        str(tmp_path_factory.mktemp("gsrv") / "model")
    )
    llm = LLM(path, max_num_batched_tokens=256, max_model_len=256,
              max_num_seqs=8, kvcache_block_size=16, enforce_eager=True,
              guided_json=True, num_kvcache_blocks=256, fetch_interval=4)
    srv, serving = serve(llm, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        r = _post(port, dict(prompt=[5, 6, 7], temperature=1.1, seed=2,
                             max_tokens=40, guided="json"))
        assert r.status == 200
        out = json.loads(r.read())
        _assert_valid_json_stream(llm, out["token_ids"], 40)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request(
            "POST", "/v1/completions",
            json.dumps(dict(prompt=[8, 9], temperature=1.0, seed=3,
                            max_tokens=40,
                            response_format={"type": "json_object"})),
            {"Content-Type": "application/json"},
        )
        rr = conn.getresponse()
        assert rr.status == 200
        body = json.loads(rr.read())
        text = body["choices"][0]["text"]
        ids = [
            i for i in llm.tokenizer.convert_tokens_to_ids(
                [c for c in text]
            )
        ]
        # Validate via the automaton on the decoded text's chars (merged
        # tokens decode to the same chars).
        from nanovllm_tpu.ops import guided as guided_ops
        tbl = llm.model_runner._guided_host
        w = guided_ops.HostWalker(
            tbl["trans"], tbl["accept"], tbl["token_bytes"],
            tbl["token_len"]
        )
        for tok in ids:
            assert w.feed_token(int(tok)), text
    finally:
        srv.shutdown()
        serving.shutdown()
        llm.exit()


def test_guided_json_schema_roundtrip(tmp_path_factory):
    """r5: OpenAI response_format json_schema (nested OpenAI shape) and
    /generate with a raw schema dict both constrain output to the schema;
    an out-of-subset schema returns a request error, not a 500."""
    from tests.test_guided_engine import _write_guided_fixture

    path = _write_guided_fixture(
        str(tmp_path_factory.mktemp("gschemasrv") / "model")
    )
    llm = LLM(path, max_num_batched_tokens=256, max_model_len=256,
              max_num_seqs=8, kvcache_block_size=16, enforce_eager=True,
              guided_json=True, guided_schema_slots=2,
              guided_schema_states=256, num_kvcache_blocks=256,
              fetch_interval=4)
    srv, serving = serve(llm, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    schema = {"enum": ["w0", "w1"]}
    try:
        port = srv.server_address[1]
        # /generate accepts the schema dict directly in "guided".
        def chars(ids):
            # The word-level test tokenizer joins tokens with spaces in
            # decode(); rebuild the raw char stream from ids instead.
            return "".join(
                llm.tokenizer.convert_ids_to_tokens(i) for i in ids if i != 1
            )

        r = _post(port, dict(prompt=[5, 6, 7], temperature=1.0, seed=2,
                             max_tokens=24, guided=schema))
        assert r.status == 200
        out = json.loads(r.read())
        if len(out["token_ids"]) < 24:
            assert json.loads(chars(out["token_ids"])) in ("w0", "w1")

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request(
            "POST", "/v1/completions",
            json.dumps(dict(
                prompt=[8, 9], temperature=1.0, seed=3, max_tokens=24,
                response_format={
                    "type": "json_schema",
                    "json_schema": {"name": "pick", "schema": schema},
                },
            )),
            {"Content-Type": "application/json"},
        )
        rr = conn.getresponse()
        assert rr.status == 200
        body = json.loads(rr.read())
        text = body["choices"][0]["text"]
        if body["choices"][0]["finish_reason"] == "stop":
            # The word-level tokenizer's decode() inserts spaces between
            # tokens and spells out <eos>; the enum values contain neither.
            assert json.loads(
                text.replace(" ", "").replace("\t", "").replace("<eos>", "")
            ) in ("w0", "w1")

        # Unsupported schema -> clean request error mentioning the keyword.
        r = _post(port, dict(prompt=[5], max_tokens=4,
                             guided={"type": "string", "pattern": "a+"}))
        body = r.read().decode()
        msg = (json.loads(body).get("error", "")
               if r.status == 200 else body)
        assert "pattern" in msg or "unsupported" in msg, (r.status, msg)
    finally:
        srv.shutdown()
        serving.shutdown()
        llm.exit()
