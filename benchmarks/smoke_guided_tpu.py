"""Real-chip smoke of guided decoding: generic JSON, a JSON Schema, and a
regex automaton through the Pallas path on the v5e (interpret-mode tests do
not exercise the TPU backend's gathers over the enlarged slot tables or the
donated install program).

Run from the repo root (the chip is the default platform). ~2-4 min incl.
compiles on a warm cache.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import re

import numpy as np

from tests.test_guided_engine import _write_guided_fixture

path = _write_guided_fixture("/tmp/guided-smoke-tpu")
from nanovllm_tpu import LLM, SamplingParams

llm = LLM(
    path, max_num_batched_tokens=256, max_model_len=256, max_num_seqs=8,
    kvcache_block_size=16, num_kvcache_blocks=256, guided_json=True,
    guided_schema_slots=2, guided_schema_states=256, fetch_interval=4,
    aot_warmup=False,
)

def chars(ids):
    # The unguided row may sample ids past the fixture tokenizer's vocab
    # (model vocab 96 > tokenizer 71); guided rows never can (their masks
    # exclude unmaskable ids).
    return "".join(
        llm.tokenizer.convert_ids_to_tokens(i) or "?"
        for i in ids if i != 1
    )

schema = {"type": "object", "properties": {
    "a": {"type": "integer"}, "b": {"enum": ["w0", "w1"]}}}
pattern = r"w[0-7](,w[0-7]){0,5}"
params = [
    SamplingParams(temperature=1.0, max_tokens=32, guided="json", seed=1),
    SamplingParams(temperature=0.9, max_tokens=32, guided=schema, seed=2),
    SamplingParams(temperature=1.0, max_tokens=32,
                   guided={"regex": pattern}, seed=3),
    SamplingParams(temperature=0.8, max_tokens=32, seed=4),  # unguided mate
]
out = llm.generate([[5, 6], [7, 8], [9, 10], [11, 12]], params,
                   use_tqdm=False)
texts = [chars(o["token_ids"]) for o in out]
for i, t in enumerate(texts):
    print(f"row {i}: {t!r} ({len(out[i]['token_ids'])} tokens)")

# Validity: complete rows must parse/match; truncated rows must be live
# prefixes (host walk).
tbl = llm.model_runner._guided_host
from nanovllm_tpu.ops import guided as guided_ops

if len(out[0]["token_ids"]) < 32:
    json.loads(texts[0])
else:
    w = guided_ops.HostWalker(tbl["trans"], tbl["accept"],
                              tbl["token_bytes"], tbl["token_len"])
    for tok in out[0]["token_ids"]:
        assert w.feed_token(int(tok)), texts[0]
if len(out[1]["token_ids"]) < 32:
    v = json.loads(texts[1])
    assert set(v) <= {"a", "b"}
if len(out[2]["token_ids"]) < 32:
    assert re.fullmatch(pattern, texts[2]), texts[2]
else:
    from nanovllm_tpu.ops.guided_regex import build_regex_automaton
    trans, accept, _ = build_regex_automaton(pattern, 256)
    st = 1
    for ch in texts[2].encode():
        st = int(trans[st, ch])
        assert st != 0, texts[2]
print("GUIDED TPU SMOKE PASS")
