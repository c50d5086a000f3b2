"""Property-based segment-op tests (random graphs, random widths)."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anemoi_models_tpu.ops.segment import segment_max, segment_softmax, segment_sum


@st.composite
def segment_cases(draw):
    n_seg = draw(st.integers(min_value=1, max_value=12))
    n_items = draw(st.integers(min_value=0, max_value=60))
    width = draw(st.integers(min_value=1, max_value=5))
    seed = draw(st.integers(min_value=0, max_value=999))
    return n_seg, n_items, width, seed


@given(case=segment_cases())
@settings(max_examples=25, deadline=None)
def test_segment_sum_matches_numpy(case):
    n_seg, n_items, width, seed = case
    rng = np.random.RandomState(seed)
    ids = np.sort(rng.randint(0, n_seg, n_items)).astype(np.int32)
    vals = rng.randn(n_items, width).astype(np.float32)
    ref = np.zeros((n_seg, width), np.float32)
    np.add.at(ref, ids, vals)
    out = segment_sum(jnp.asarray(vals), jnp.asarray(ids), n_seg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@given(case=segment_cases())
@settings(max_examples=25, deadline=None)
def test_segment_softmax_normalizes(case):
    n_seg, n_items, width, seed = case
    rng = np.random.RandomState(seed)
    ids = np.sort(rng.randint(0, n_seg, n_items)).astype(np.int32)
    scores = rng.randn(n_items, width).astype(np.float32) * 5
    alpha = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), n_seg))
    # per-segment sums are 1 for non-empty segments
    sums = np.zeros((n_seg, width), np.float32)
    np.add.at(sums, ids, alpha)
    counts = np.bincount(ids, minlength=n_seg)
    for s in range(n_seg):
        if counts[s]:
            np.testing.assert_allclose(sums[s], 1.0, atol=1e-5)
    assert (alpha >= 0).all() and (alpha <= 1 + 1e-6).all()


@given(case=segment_cases())
@settings(max_examples=15, deadline=None)
def test_segment_max_matches_numpy(case):
    n_seg, n_items, width, seed = case
    rng = np.random.RandomState(seed)
    ids = np.sort(rng.randint(0, n_seg, n_items)).astype(np.int32)
    vals = rng.randn(n_items, width).astype(np.float32)
    out = np.asarray(segment_max(jnp.asarray(vals), jnp.asarray(ids), n_seg))
    for s in range(n_seg):
        sel = vals[ids == s]
        if len(sel):
            np.testing.assert_allclose(out[s], sel.max(0), atol=1e-6)
