"""Exact-substring dedup (cleanops.py::exact_substring_dedup).

Contract (Lee et al. 2022, arXiv:2107.06499): every >= k-token span that
occurs more than once in the corpus — across documents at ANY alignment,
or repeated within one document — keeps its globally first occurrence
(min (doc_id, pos)) and is cut everywhere else. Verified row-for-row
against a plain dict-of-substrings reference implementation, which is
oblivious to the operator's rolling-hash mechanics by construction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from bocadillo_spark.operators.cleanops import exact_substring_dedup

K = 8
PASSAGE = [f"shared{i}" for i in range(12)]  # > K: straddles any alignment
INNER = [f"inner{i}" for i in range(10)]


def _filler(doc_id, start, count):
    return [f"d{doc_id}w{start + i}" for i in range(count)]


def _fixture_texts():
    texts = {}
    # the shared passage planted at three DIFFERENT offsets (1, 4, 9) —
    # fixed-chunk dedup at chunk size K would miss at least one alignment
    for doc_id, off in [(1, 1), (5, 4), (9, 9)]:
        toks = _filler(doc_id, 0, off) + PASSAGE + _filler(doc_id, 100, 7)
        texts[doc_id] = " ".join(toks)
    # internal repetition: the same 10-token span twice in one document
    texts[3] = " ".join(_filler(3, 0, 3) + INNER + _filler(3, 50, 5) + INNER)
    # short document (< K tokens): structurally untouchable
    texts[7] = " ".join(_filler(7, 0, K - 1))
    # an entirely unique document
    texts[8] = " ".join(_filler(8, 0, 40))
    return texts


def _reference(texts, k):
    occ = {}
    for d in sorted(texts):
        toks = texts[d].split(" ")
        for pos in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[pos : pos + k]), []).append((d, pos))
    cuts = {d: set() for d in texts}
    for lst in occ.values():
        if len(lst) > 1:
            for d, pos in sorted(lst)[1:]:
                cuts[d].update(range(pos, pos + k))
    out = {}
    for d, t in texts.items():
        toks = t.split(" ")
        kept = [w for i, w in enumerate(toks) if i not in cuts[d]]
        out[d] = (
            len(toks),
            len(cuts[d]),
            hashlib.md5(" ".join(kept).encode("utf-8")).hexdigest(),
        )
    return out


@pytest.fixture(scope="module")
def fixture_df(spark):
    texts = _fixture_texts()
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    return texts, df


def test_matches_reference_implementation(spark, fixture_df):
    texts, df = fixture_df
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["clean_md5"])
        for r in exact_substring_dedup(df, k=K).collect()
    }
    assert got == _reference(texts, K)


def test_first_occurrence_kept_and_straddle_alignments_cut(spark, fixture_df):
    texts, df = fixture_df
    got = {r["doc_id"]: r for r in exact_substring_dedup(df, k=K).collect()}
    # doc 1 holds the canonical copy of the shared passage: nothing cut
    assert got[1]["n_cut"] == 0
    # docs 5 and 9 lose the whole passage despite different alignments
    for d in (5, 9):
        assert got[d]["n_cut"] == len(PASSAGE)
    # internal repetition: second copy of the 10-token span cut
    assert got[3]["n_cut"] == len(INNER)
    # short and unique docs untouched, md5 equals the original text's
    for d in (7, 8):
        assert got[d]["n_cut"] == 0
        assert got[d]["clean_md5"] == hashlib.md5(
            texts[d].encode("utf-8")
        ).hexdigest()


def test_deterministic_across_runs(spark, fixture_df):
    _, df = fixture_df
    r1 = sorted(map(tuple, exact_substring_dedup(df, k=K).collect()))
    r2 = sorted(map(tuple, exact_substring_dedup(df, k=K).collect()))
    assert r1 == r2


# ---- rolling-hash kernel properties (no Spark) ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from bocadillo_spark.operators.cleanops import _rolling_window_hashes


@settings(max_examples=200, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=60),
    k=st.integers(min_value=1, max_value=8),
)
def test_kernel_hash_equality_iff_window_equality(toks, k):
    """Alphabet of 4 token values forces dense window repeats: the hash
    must merge exactly the equal windows (no false splits), and on these
    inputs — tiny equality classes vs 2^64 — never merge distinct ones
    (a false merge here would be an arithmetic bug, not bad luck)."""
    rng = np.random.RandomState(13)
    vocab = rng.randint(1, 1 << 63, size=4, dtype=np.uint64)
    th = vocab[np.asarray(toks, dtype=np.int64)] if toks else np.empty(0, np.uint64)
    h = _rolling_window_hashes(th, k)
    n = len(toks)
    assert len(h) == max(n - k + 1, 0)
    windows = [tuple(toks[i : i + k]) for i in range(max(n - k + 1, 0))]
    by_window = {}
    for i, w in enumerate(windows):
        by_window.setdefault(w, set()).add(int(h[i]))
    # equal windows -> equal hash (exact, not probabilistic)
    for w, hs in by_window.items():
        assert len(hs) == 1, (w, hs)
    # distinct windows -> distinct hash on this input space
    firsts = {next(iter(hs)) for hs in by_window.values()}
    assert len(firsts) == len(by_window)


@settings(max_examples=100, deadline=None)
@given(
    prefix=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=20),
    window=st.lists(st.integers(min_value=0, max_value=9), min_size=4, max_size=4),
    gap=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=20),
)
def test_kernel_position_independence(prefix, window, gap):
    """The same window at two different offsets hashes identically — the
    property the whole keep-first grouping rests on."""
    toks = prefix + window + gap + window
    rng = np.random.RandomState(13)
    vocab = rng.randint(1, 1 << 63, size=10, dtype=np.uint64)
    th = vocab[np.asarray(toks, dtype=np.int64)]
    h = _rolling_window_hashes(th, 4)
    p1 = len(prefix)
    p2 = len(prefix) + 4 + len(gap)
    assert h[p1] == h[p2]


def test_dense_collision_corpus_matches_reference(spark):
    """Adversarial Spark fixture: 12 docs over a 3-word vocabulary at
    k=4 — nearly every window is duplicated many times across docs, so
    canonical selection, hot-window aggregation, and span merging are
    all stressed at once. Row-for-row against the dict reference."""
    rng = np.random.RandomState(29)
    vocab = ["aa", "bb", "cc"]
    texts = {
        d: " ".join(vocab[i] for i in rng.randint(0, 3, size=30))
        for d in range(12)
    }
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["clean_md5"])
        for r in exact_substring_dedup(df, k=4).collect()
    }
    assert got == _reference(texts, 4)
