"""Online HTTP serving on top of the continuous-batching engine.

The reference (nano-vllm) serves offline batches only (`example.py` /
`bench.py`); this entrypoint adds the online surface a production deployment
needs: requests arrive at any time over HTTP, join the running batch at the
next scheduler step (continuous batching), and stream token deltas back as
each async ring drain lands.

Design: ONE engine thread owns the device (the TPU runtime is strictly
single-client; see CLAUDE.md) and runs the schedule/step/drain loop.
HTTP handler threads never touch the engine — they enqueue an intake record
and block on a per-request queue that the engine thread feeds after every
ring drain.

Protocol (stdlib-only, no framework dependency):
  GET  /health              -> {"status": "ok"}
  GET  /metrics             -> engine stats (queue depths, tok/s, TTFT)
  POST /generate            body: {"prompt": str | [int], "temperature"?,
                             "max_tokens"?, "ignore_eos"?, "top_k"?,
                             "top_p"?, "min_p"?, "min_tokens"?, "stop"?,
                             "stop_token_ids"?, "logprobs"?, "stream"?,
                             "presence_penalty"?, "frequency_penalty"?,
                             "repetition_penalty"? (need --config
                             num_penalty_slots=N at server start)}
    stream=false (default): one JSON body
        {"text": ..., "token_ids": [...]}
    stream=true: ndjson — one line per event
        {"token_ids": [...], "finished": false}
        {"token_ids": [...], "finished": true, "text": ...}

OpenAI-compatible surface (drop-in for openai-client tooling):
  GET  /v1/models           -> model listing
  POST /v1/completions      -> text_completion (+SSE streaming)
  POST /v1/chat/completions -> chat.completion via the model's chat template
                               (+SSE chunk streaming, data: [DONE] terminator)

Run: python -m nanovllm_tpu.entrypoints.api_server <model_dir> [--port 8000]
(plus any LLM(...) config kwargs via --config key=value).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from nanovllm_tpu.sampling_params import SamplingParams

_SENTINEL = object()


class _StreamState:
    """Engine-thread-side per-request record: the sequence, its consumer
    queue, and how many completion tokens have been emitted."""

    __slots__ = ("seq", "out", "watermark")

    def __init__(self, seq, out):
        self.seq = seq
        self.out = out
        self.watermark = 0


class ServingEngine:
    """Continuous-batching serve loop around an LLMEngine.

    ``submit`` is thread-safe and returns a queue of event dicts (same shape
    as ``LLMEngine.generate_stream`` events, minus "index"); the queue ends
    with a sentinel. The engine thread folds new arrivals into the running
    batch before every step, so a request admitted mid-decode joins at the
    next prefill opportunity without draining the batch.
    """

    def __init__(self, engine, multihost: bool = False):
        self.engine = engine
        # Multi-host serving (rank-0 request distribution, SURVEY §5): this
        # process (0) owns the HTTP surface and broadcasts every admission /
        # cancel / step decision; every other host runs ``serve_follower``
        # and replays them, so the SPMD step stays lock-stepped while only
        # one host needs the request stream.
        self.multihost = multihost
        self.intake: queue.Queue = queue.Queue()
        self.active: dict[int, _StreamState] = {}
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, prompt, sampling_params: SamplingParams):
        """Returns (event queue, cancel handle). Pass the handle to
        ``cancel`` if the client goes away."""
        out: queue.Queue = queue.Queue()
        handle: dict = {"_serving": self}  # cancel routing (incl. via a pool)
        self.intake.put(("submit", prompt, sampling_params, out, handle))
        return out, handle

    def cancel(self, handle: dict):
        """Abort a submitted request. FIFO intake guarantees the submit was
        processed (and ``handle['seq']`` set) before this is."""
        self.intake.put(("cancel", handle))

    def shutdown(self):
        self._stop = True
        self.intake.put(None)  # wake the loop
        self.thread.join(timeout=60)

    # ----------------------------------------------------- engine thread

    def _admit(self, block: bool) -> list:
        """Apply queued submits/cancels in arrival order. Returns the replay
        list for multi-host broadcast: ("submit", prompt, sp, seq_id) /
        ("cancel", seq_id) — followers re-apply in the same order, and the
        deterministic Sequence counter keeps seq ids aligned (asserted)."""
        replay: list = []
        try:
            item = self.intake.get(timeout=0.05) if block else self.intake.get_nowait()
        except queue.Empty:
            return replay
        while True:
            if item is not None and item[0] == "submit":
                _, prompt, sp, out, handle = item
                try:
                    seq = self.engine.add_request(prompt, sp)
                    handle["seq"] = seq
                    self.active[seq.seq_id] = _StreamState(seq, out)
                    replay.append(("submit", prompt, sp, seq.seq_id))
                except Exception as e:  # oversized prompt etc.
                    out.put({"error": str(e)})
                    out.put(_SENTINEL)
            elif item is not None and item[0] == "cancel":
                seq = item[1].get("seq")
                if seq is not None and seq.seq_id in self.active:
                    self.engine.abort_request(seq)
                    st = self.active.pop(seq.seq_id)
                    st.out.put(_SENTINEL)
                    self.engine._emitted.pop(seq.seq_id, None)
                    replay.append(("cancel", seq.seq_id))
            try:
                item = self.intake.get_nowait()
            except queue.Empty:
                return replay

    def _loop(self):
        engine = self.engine
        bcast = None
        if self.multihost:
            from nanovllm_tpu.utils.distributed import broadcast_from_host0

            bcast = broadcast_from_host0
        while not self._stop:
            # Block for work only when fully idle; otherwise just fold in
            # whatever has arrived and keep stepping.
            replay = self._admit(block=engine.is_finished())
            if bcast is not None:
                do_step = not engine.is_finished()
                if replay or do_step:
                    bcast(("work", replay, do_step))
                else:
                    bcast(("idle",))
            if engine.is_finished():
                continue
            drains_before = engine._drain_count
            engine.step()
            if engine._drain_count != drains_before:
                self._emit()
        if bcast is not None:
            bcast(("stop",))
        for st in self.active.values():
            st.out.put(_SENTINEL)

    def _emit(self):
        done = []
        for seq_id, st in self.active.items():
            seq = st.seq
            hi = seq.num_valued_tokens - seq.num_prompt_tokens
            new = seq.completion_token_ids[st.watermark: hi]
            fin = seq.is_finished and seq.num_valued_tokens == seq.num_tokens
            if not new and not fin:
                continue
            event = {"token_ids": new, "finished": fin}
            if seq.logprobs:
                event["logprobs"] = seq.logprob_values[st.watermark: hi]
            if fin:
                event["text"] = self.engine.final_text(seq)
                done.append(seq_id)
            st.watermark = hi
            st.out.put(event)
        for seq_id in done:
            st = self.active.pop(seq_id)
            st.out.put(_SENTINEL)
            # Keep the drain-dedup map bounded for a long-lived server.
            self.engine._emitted.pop(seq_id, None)


class ServingPool:
    """Data-parallel serving: N independent engine replicas (each on its own
    device subset via ``Config.device_offset``) behind one submit() surface.
    Requests go to the replica with the fewest active streams — each replica
    runs its own continuous batch, scheduler, and KV pool, so small models
    scale across chips without sharding (SURVEY §2 parallelism table: DP is
    the reference's explicitly-absent "optional v2")."""

    def __init__(self, engines):
        self.servings = [ServingEngine(e) for e in engines]
        self.engine = engines[0]  # tokenizer/config surface (identical)

    def submit(self, prompt, sampling_params: SamplingParams):
        se = min(self.servings, key=lambda s: len(s.active) + s.intake.qsize())
        out, handle = se.submit(prompt, sampling_params)
        handle["_serving"] = se
        return out, handle

    def cancel(self, handle: dict):
        handle.get("_serving", self.servings[0]).cancel(handle)

    @property
    def active(self):
        return {
            (i, k): v
            for i, s in enumerate(self.servings)
            for k, v in s.active.items()
        }

    def metrics(self) -> dict:
        per = []
        for s in self.servings:
            m = dict(s.engine.metrics.summary())
            m["num_waiting"] = len(s.engine.scheduler.waiting)
            m["num_running"] = len(s.engine.scheduler.running)
            m["num_streams"] = len(s.active)
            per.append(m)
        agg = {
            "num_waiting": sum(m["num_waiting"] for m in per),
            "num_running": sum(m["num_running"] for m in per),
            "num_streams": sum(m["num_streams"] for m in per),
            "replicas": per,
        }
        return agg

    def shutdown(self):
        for s in self.servings:
            s.shutdown()


class _IncrementalDetok:
    """Streaming detokenizer: decodes the completion so far and emits only
    the stable new suffix (a trailing U+FFFD means a token straddles a UTF-8
    boundary — hold it back until the next event completes it)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.token_ids: list[int] = []
        self.emitted = 0

    def push(self, new_token_ids) -> str:
        self.token_ids += new_token_ids
        text = self.tokenizer.decode(self.token_ids)
        if text.endswith("�"):
            return ""
        delta = text[self.emitted:]
        self.emitted = len(text)
        return delta

    def finish(self, final_text: str) -> str:
        """Flush against the engine's final (stop-trimmed) text."""
        delta = final_text[self.emitted:]
        self.emitted = len(final_text)
        return delta


def _guided_from_request(req) -> str | dict | None:
    """Map OpenAI ``response_format`` to the engine's guided mode:
    ``{"type": "json_object"}`` -> generic JSON; ``{"type": "json_schema",
    "json_schema": {"schema": {...}}}`` (the nested OpenAI shape; a flat
    ``"schema"`` is also accepted) -> schema-constrained decoding. Falls
    back to the raw ``guided`` field ("json" or a schema dict)."""
    rf = req.get("response_format") or {}
    t = rf.get("type")
    if t == "json_object":
        return "json"
    if t == "json_schema":
        schema = (rf.get("json_schema") or {}).get("schema") or rf.get("schema")
        if not isinstance(schema, dict):
            raise ValueError(
                "response_format json_schema needs json_schema.schema (an "
                "object)"
            )
        return schema
    if req.get("guided_regex"):           # vLLM parameter names
        return {"regex": str(req["guided_regex"])}
    if req.get("guided_choice"):
        # vLLM semantics: the completion IS one of the strings (bare text,
        # not the JSON-quoted enum form).
        return {"choice": [str(c) for c in req["guided_choice"]]}
    return req.get("guided")


def _finish_reason(seq) -> str:
    return (
        "length" if seq.num_completion_tokens >= seq.max_tokens else "stop"
    )


def _make_handler(serving: ServingEngine):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/health":
                body = b'{"status": "ok"}'
            elif self.path == "/v1/models":
                body = json.dumps({
                    "object": "list",
                    "data": [{
                        "id": serving.engine.config.model,
                        "object": "model",
                        "owned_by": "nanovllm_tpu",
                    }],
                }).encode()
            elif self.path == "/metrics":
                # Engine observability: TTFT p50/p99, per-phase tok/s, e2e
                # latency (utils/metrics.py) plus live queue depths.
                if isinstance(serving, ServingPool):
                    m = serving.metrics()
                else:
                    m = dict(serving.engine.metrics.summary())
                    m["num_waiting"] = len(serving.engine.scheduler.waiting)
                    m["num_running"] = len(serving.engine.scheduler.running)
                    m["num_streams"] = len(serving.active)

                def scrub(v):
                    # NaN (empty percentiles) is not valid JSON; emit null.
                    if isinstance(v, dict):
                        return {k: scrub(x) for k, x in v.items()}
                    if isinstance(v, list):
                        return [scrub(x) for x in v]
                    return None if isinstance(v, float) and v != v else v

                body = json.dumps(scrub(m)).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _chat_prompt(self, messages):
            # Chat form through the model's chat template (reference
            # example.py:27-29); template-less (test) tokenizers fall back
            # to joined contents.
            tok = serving.engine.tokenizer
            if tok.chat_template:
                return tok.apply_chat_template(
                    messages, tokenize=True, add_generation_prompt=True
                )
            return "\n".join(m["content"] for m in messages)

        def do_POST(self):
            if self.path in ("/v1/completions", "/v1/chat/completions"):
                self._openai(chat=self.path.endswith("/chat/completions"))
                return
            if self.path != "/generate":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if "messages" in req:
                    prompt = self._chat_prompt(req["messages"])
                else:
                    prompt = req["prompt"]
                sp = SamplingParams(
                    temperature=float(req.get("temperature", 1.0)),
                    max_tokens=int(req.get("max_tokens", 64)),
                    ignore_eos=bool(req.get("ignore_eos", False)),
                    top_k=int(req.get("top_k", 0)),
                    top_p=float(req.get("top_p", 1.0)),
                    min_p=float(req.get("min_p", 0.0)),
                    min_tokens=int(req.get("min_tokens", 0)),
                    stop=req.get("stop", ()),
                    stop_token_ids=req.get("stop_token_ids", ()),
                    logprobs=bool(req.get("logprobs", False)),
                    logit_bias={
                        int(k): float(v)
                        for k, v in (req.get("logit_bias") or {}).items()
                    },
                    seed=(None if req.get("seed") is None
                          else int(req["seed"])),
                    priority=int(req.get("priority", 0)),
                    presence_penalty=float(req.get("presence_penalty", 0.0)),
                    frequency_penalty=float(req.get("frequency_penalty", 0.0)),
                    repetition_penalty=float(
                        req.get("repetition_penalty", 1.0)
                    ),
                    guided=_guided_from_request(req),
                )
            except (KeyError, ValueError, TypeError, AssertionError,
                    json.JSONDecodeError) as e:
                # AssertionError: SamplingParams validates by assert (e.g.
                # top_p range, stop types) — a bad request, not a server bug.
                self.send_error(400, explain=str(e))
                return
            out, handle = serving.submit(prompt, sp)
            if req.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                while True:
                    ev = out.get()
                    if ev is _SENTINEL:
                        self.wfile.write(b"0\r\n\r\n")
                        return
                    line = (json.dumps(ev) + "\n").encode()
                    try:
                        self.wfile.write(
                            f"{len(line):x}\r\n".encode() + line + b"\r\n"
                        )
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        # Client went away: free its batch slot + KV blocks.
                        serving.cancel(handle)
                        return
            else:
                token_ids, text, error = [], None, None
                lps: list[float] = []
                while True:
                    ev = out.get()
                    if ev is _SENTINEL:
                        break
                    error = ev.get("error", error)
                    token_ids += ev.get("token_ids", [])
                    lps += ev.get("logprobs", [])
                    text = ev.get("text", text)
                if error is not None:
                    self.send_error(400, explain=error)
                    return
                resp = {"text": text, "token_ids": token_ids}
                if sp.logprobs:
                    # Stop-string/EOS trimming can drop a tail after events
                    # were emitted; the sequence holds the trimmed truth.
                    seq = handle.get("seq")
                    resp["token_ids"] = seq.completion_token_ids
                    resp["logprobs"] = seq.logprob_values[
                        : seq.num_completion_tokens
                    ]
                body = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def _openai(self, chat: bool):
            """OpenAI-compatible completions: request/response shapes a stock
            openai client (or curl tooling) expects, mapped onto the same
            serving engine. Chosen-token logprobs are supported (classic
            ``logprobs: N`` and chat ``logprobs: true`` both return the
            sampled token's logprob; top-N alternatives are not). ``n`` up
            to 16 fans out into prefix-cache-sharing sequences; penalties
            are not supported."""
            import time
            import uuid

            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = (
                    self._chat_prompt(req["messages"]) if chat
                    else req["prompt"]
                )
                sp = SamplingParams(
                    temperature=float(req.get("temperature", 1.0)),
                    max_tokens=int(req.get("max_tokens", 64)),
                    top_p=float(req.get("top_p", 1.0)),
                    min_p=float(req.get("min_p", 0.0)),
                    min_tokens=int(req.get("min_tokens", 0)),
                    stop=req.get("stop") or (),
                    logprobs=bool(req.get("logprobs") or False),
                    logit_bias={
                        int(k): float(v)
                        for k, v in (req.get("logit_bias") or {}).items()
                    },
                    seed=(None if req.get("seed") is None
                          else int(req["seed"])),
                    priority=int(req.get("priority", 0)),
                    presence_penalty=float(req.get("presence_penalty", 0.0)),
                    frequency_penalty=float(req.get("frequency_penalty", 0.0)),
                    repetition_penalty=float(
                        req.get("repetition_penalty", 1.0)
                    ),
                    # OpenAI response_format: json_object -> guided JSON,
                    # json_schema -> schema-constrained decoding (requires
                    # --config guided_json=True [+ guided_schema_slots=N]).
                    guided=_guided_from_request(req),
                )
                n_choices = int(req.get("n", 1))
                if not 1 <= n_choices <= 16:
                    raise ValueError("n must be in [1, 16]")
            except (KeyError, ValueError, TypeError, AssertionError,
                    json.JSONDecodeError) as e:
                self._openai_error(400, str(e))
                return
            rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
            created = int(time.time())
            model = req.get("model") or serving.engine.config.model
            obj = "chat.completion" if chat else "text_completion"
            # n > 1: fan out into n sequences sharing the prompt — the
            # prefix cache makes the duplicate prefills nearly free, and
            # per-row Gumbel noise diversifies them at temperature > 0.
            # A seeded request offsets the seed per choice (identical seeds
            # would sample n identical traces), and under a data-parallel
            # pool all choices go to ONE replica so the shared prompt
            # actually hits that replica's prefix cache.
            import dataclasses

            def _choice_sp(i):
                if sp.seed is None or i == 0:
                    return sp
                return dataclasses.replace(sp, seed=(sp.seed + i) % 2**31)

            first = serving.submit(prompt, _choice_sp(0))
            target = first[1].get("_serving", serving)
            subs = [first] + [
                target.submit(prompt, _choice_sp(i))
                for i in range(1, n_choices)
            ]
            tok = serving.engine.tokenizer

            def _lp_field(token_ids, lps):
                if chat:
                    return {"content": [
                        {"token": tok.decode([t]), "logprob": l}
                        for t, l in zip(token_ids, lps)
                    ]}
                return {
                    "tokens": [tok.decode([t]) for t in token_ids],
                    "token_logprobs": lps,
                    "top_logprobs": None,
                    "text_offset": [],
                }

            if req.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                # Merge the per-choice event queues (tagged by index) so
                # chunks interleave as drains land, OpenAI-style.
                merged: queue.Queue = queue.Queue()

                def _pump(i, q):
                    while True:
                        ev = q.get()
                        merged.put((i, ev))
                        if ev is _SENTINEL:
                            return

                for i, (q, _) in enumerate(subs):
                    threading.Thread(
                        target=_pump, args=(i, q), daemon=True
                    ).start()
                detoks = [
                    _IncrementalDetok(tok) for _ in range(n_choices)
                ]
                first = [True] * n_choices
                live = n_choices
                while live:
                    i, ev = merged.get()
                    if ev is _SENTINEL:
                        live -= 1
                        continue
                    if "error" in ev:
                        continue  # surfaced as an immediate [DONE]
                    fin = ev.get("finished", False)
                    delta = (
                        detoks[i].finish(ev["text"]) if fin
                        else detoks[i].push(ev.get("token_ids", []))
                    )
                    ev_lps = ev.get("logprobs", []) if sp.logprobs else []
                    if not delta and not fin and not ev_lps:
                        continue
                    fr = (
                        _finish_reason(subs[i][1]["seq"]) if fin else None
                    )
                    if chat:
                        d = {"content": delta}
                        if first[i]:
                            d["role"] = "assistant"
                            first[i] = False
                        choice = {"index": i, "delta": d,
                                  "finish_reason": fr}
                        if ev_lps:
                            choice["logprobs"] = _lp_field(
                                ev["token_ids"], ev_lps
                            )
                        chunk = {"id": rid, "object": "chat.completion.chunk",
                                 "created": created, "model": model,
                                 "choices": [choice]}
                    else:
                        chunk = {"id": rid, "object": obj,
                                 "created": created, "model": model,
                                 "choices": [{
                                     "index": i, "text": delta,
                                     "logprobs":
                                     _lp_field(ev["token_ids"], ev_lps)
                                     if ev_lps else None,
                                     "finish_reason": fr,
                                 }]}
                    try:
                        self._sse(chunk)
                    except (BrokenPipeError, ConnectionResetError):
                        for _, handle in subs:
                            serving.cancel(handle)
                        return
                self._sse(None)  # data: [DONE]
                self.wfile.write(b"0\r\n\r\n")
                return

            choices, usage = [], {
                "prompt_tokens": 0, "completion_tokens": 0, "total_tokens": 0,
            }
            for i, (out, handle) in enumerate(subs):
                text, error = None, None
                while True:
                    ev = out.get()
                    if ev is _SENTINEL:
                        break
                    error = ev.get("error", error)
                    text = ev.get("text", text)
                if error is not None:
                    self._openai_error(400, error)
                    return
                seq = handle["seq"]
                if i == 0:
                    # OpenAI counts the prompt once per request (and the
                    # prefix cache really does prefill it once).
                    usage["prompt_tokens"] = seq.num_prompt_tokens
                usage["completion_tokens"] += seq.num_completion_tokens
                usage["total_tokens"] = (
                    usage["prompt_tokens"] + usage["completion_tokens"]
                )
                lp_field = None
                if sp.logprobs:
                    toks = seq.completion_token_ids
                    lp_field = _lp_field(toks, seq.logprob_values[: len(toks)])
                if chat:
                    choices.append(
                        {"index": i,
                         "message": {"role": "assistant", "content": text},
                         "logprobs": lp_field,
                         "finish_reason": _finish_reason(seq)}
                    )
                else:
                    choices.append(
                        {"index": i, "text": text, "logprobs": lp_field,
                         "finish_reason": _finish_reason(seq)}
                    )
            body = json.dumps({"id": rid, "object": obj, "created": created,
                               "model": model, "choices": choices,
                               "usage": usage}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _sse(self, payload):
            data = b"data: [DONE]\n\n" if payload is None else (
                b"data: " + json.dumps(payload).encode() + b"\n\n"
            )
            self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            self.wfile.flush()

        def _openai_error(self, code: int, message: str):
            body = json.dumps({"error": {
                "message": message, "type": "invalid_request_error",
            }}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(llm, host: str = "0.0.0.0", port: int = 8000,
          multihost: bool = False):
    """Serve an existing LLM/LLMEngine — or a LIST of engine replicas
    (data-parallel pool; see ServingPool) — returns (server, serving).
    Call ``server.serve_forever()`` (blocking) or drive it from a thread.
    ``multihost``: this is process 0 of a multi-host SPMD deployment — every
    admission/step broadcasts to the ``serve_follower`` loops on the other
    hosts (rank-0 request distribution; only this host needs clients)."""
    if isinstance(llm, (list, tuple)):
        serving = ServingPool(list(llm))
    else:
        serving = ServingEngine(llm, multihost=multihost)
    server = ThreadingHTTPServer((host, port), _make_handler(serving))
    return server, serving


def serve_follower(engine, on_finish=None):
    """Multi-host serving, hosts with ``jax.process_index() > 0``: replay
    process 0's admission/cancel/step decisions so the SPMD step programs
    stay lock-stepped. Blocks until the driver broadcasts shutdown.

        init_multihost(...)                       # every host
        llm = LLM(model, tensor_parallel_size=jax.device_count(), ...)
        if jax.process_index() == 0:
            server, serving = serve(llm, multihost=True)
            server.serve_forever()
        else:
            serve_follower(llm)

    Request values never touch hosts > 0: prompts/params arrive via the
    broadcast, and sequence ids stay aligned because admissions replay in
    the driver's order against the same deterministic engine (asserted).
    """
    from nanovllm_tpu.utils.distributed import broadcast_from_host0

    live: dict[int, object] = {}
    while True:
        cmd = broadcast_from_host0()
        if cmd[0] == "stop":
            return
        if cmd[0] == "idle":
            continue
        _, replay, do_step = cmd
        for item in replay:
            if item[0] == "submit":
                _, prompt, sp, sid = item
                seq = engine.add_request(prompt, sp)
                assert seq.seq_id == sid, (
                    f"follower sequence counter diverged: {seq.seq_id} != "
                    f"{sid} (did this process create sequences outside the "
                    f"replay?)"
                )
                live[sid] = seq
            else:
                seq = live.pop(item[1], None)
                if seq is not None:
                    engine.abort_request(seq)
        if do_step:
            engine.step()
        done = [
            k for k, s in live.items()
            if s.is_finished and s.num_valued_tokens == s.num_tokens
        ]
        for sid in done:
            seq = live.pop(sid)
            engine._emitted.pop(sid, None)
            if on_finish is not None:
                on_finish(sid, seq.completion_token_ids)


def main(argv=None):
    import argparse
    import os

    if os.environ.get("NANOVLLM_PLATFORM"):
        # The TPU-tunnel sitecustomize pins jax_platforms at startup; this
        # knob (same as bench.py) routes CPU/debug runs.
        import jax

        jax.config.update("jax_platforms", os.environ["NANOVLLM_PLATFORM"])

    from nanovllm_tpu import LLM

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument(
        "--data-parallel", type=int, default=1,
        help="engine replicas, each on its own tp-sized device subset "
             "(device_offset = replica * tensor_parallel_size)",
    )
    ap.add_argument(
        "--multihost", action="store_true",
        help="multi-host SPMD serving: initialize jax.distributed (TPU pod "
             "auto-detect), serve HTTP from process 0 and run the follower "
             "replay loop on every other host (rank-0 request distribution)",
    )
    ap.add_argument(
        "--config", nargs="*", default=[],
        help="LLM config overrides as key=value (ints/floats auto-cast)",
    )
    args = ap.parse_args(argv)
    kwargs = {}
    for kv in args.config:
        k, v = kv.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        kwargs[k] = v
    # Serving warms the filtered (top-k/top-p/min-p) step variant by default:
    # most OpenAI clients send top_p<1, and an un-warmed variant stalls the
    # first such request 4-40 s per bucket on a cold compile cache. Override
    # with --config warmup_variants= (empty) to skip.
    kwargs.setdefault("warmup_variants", ("filtered",))
    if kwargs["warmup_variants"] == "":
        kwargs["warmup_variants"] = ()
    elif isinstance(kwargs["warmup_variants"], str):
        kwargs["warmup_variants"] = tuple(kwargs["warmup_variants"].split(","))
    if args.multihost:
        import jax

        from nanovllm_tpu.utils.distributed import init_multihost

        assert args.data_parallel == 1, "--multihost serves one SPMD engine"
        init_multihost()  # TPU pods auto-detect coordinator/ranks
        kwargs.setdefault("tensor_parallel_size", jax.device_count())
        llm = LLM(args.model, **kwargs)
        if jax.process_index() > 0:
            serve_follower(llm)
            return
        server, serving = serve(llm, args.host, args.port, multihost=True)
    elif args.data_parallel > 1:
        # Each replica's mesh spans tp * ep devices (2-D expert placement
        # included) — offsets must stride by the full span or replicas
        # would share chips and overcommit their HBM.
        span = int(kwargs.get("tensor_parallel_size", 1)) * int(
            kwargs.get("expert_parallel_size", 1)
        )
        llm = [
            LLM(args.model, device_offset=r * span,
                data_parallel_size=args.data_parallel, **kwargs)
            for r in range(args.data_parallel)
        ]
        server, serving = serve(llm, args.host, args.port)
    else:
        llm = LLM(args.model, **kwargs)
        server, serving = serve(llm, args.host, args.port)
    print(f"serving {args.model} on {args.host}:{args.port}")
    try:
        server.serve_forever()
    finally:
        serving.shutdown()


if __name__ == "__main__":
    main()
