"""build_step_inputs: decode fast path == general-loop oracle.

The vectorized decode path exists purely for host speed (inputs.py docstring);
it must be bit-identical to the general per-sequence loop on every field.
"""

import numpy as np
import pytest

from nanovllm_tpu.engine.inputs import build_step_inputs


def _random_decode_reqs(rng, n, block_size, max_pages):
    reqs = []
    for i in range(n):
        kv_len = int(rng.integers(1, block_size * max_pages))
        pages = -(-kv_len // block_size)
        reqs.append(
            dict(
                token_ids=[int(rng.integers(0, 1000))],
                start=kv_len - 1,
                kv_len=kv_len,
                block_table=rng.integers(0, 500, size=pages).tolist(),
                temperature=float(rng.uniform(0, 2)),
                slot=int(rng.integers(0, 64)),
                top_k=int(rng.integers(0, 50)),
                top_p=float(rng.uniform(0.1, 1.0)),
            )
        )
    return reqs


@pytest.mark.parametrize("n_req,grp", [(1, None), (5, None), (8, 8), (13, 8),
                                       (24, 4), (224, 8)])
def test_decode_fast_path_matches_slow(n_req, grp):
    rng = np.random.default_rng(n_req)
    block, w = 256, 8
    reqs = _random_decode_reqs(rng, n_req, block, w)
    s_pad = max(16, -(-n_req // (grp or 1)) * (grp or 1))
    kw = dict(
        block_size=block,
        num_tokens_bucket=s_pad,
        num_seqs_bucket=s_pad,
        max_blocks_per_seq=w,
        rng=np.zeros(2, np.uint32),
        num_slots=65,
        ring_pos=3,
        num_pairs_bucket=(s_pad // (grp or 1)) * w if grp else None,
        group_pairs=grp,
    )
    fast = build_step_inputs(reqs, **kw)
    slow = build_step_inputs(reqs, **kw, _slow=True)
    for name, a, b in zip(fast._fields, fast, slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_minimal_req_defaults_match():
    """Reqs without optional keys (slot/top_k/top_p) take identical defaults
    on both paths."""
    reqs = [
        dict(token_ids=[7], start=10, kv_len=11, block_table=[3],
             temperature=0.5)
    ]
    kw = dict(block_size=16, num_tokens_bucket=4, num_seqs_bucket=4,
              max_blocks_per_seq=2, rng=np.zeros(2, np.uint32), num_slots=9)
    fast = build_step_inputs(reqs, **kw)
    slow = build_step_inputs(reqs, **kw, _slow=True)
    for name, a, b in zip(fast._fields, fast, slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
