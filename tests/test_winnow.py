"""Winnowing fingerprint properties (textops._winnow_fps).

Pits the engine's vectorized sliding-window implementation against a naive
per-position pure-Python third implementation (the oracle in oracle_ext is
a rolling-hash SECOND implementation — three formulations total), and
asserts the published MOSS guarantee: any substring shared by two texts of
length >= k + w - 1 produces at least one shared fingerprint.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy__ray.pipelines.textops import (
    _WINNOW_K,
    _WINNOW_MOD,
    _WINNOW_BASE,
    _WINNOW_W,
    _winnow_fps,
)

GUARANTEE = _WINNOW_K + _WINNOW_W - 1


def _naive_fps(text: str) -> set[int]:
    bs = text.encode("utf-8")
    n = len(bs) - _WINNOW_K + 1
    if n <= 0:
        return set()
    hs = []
    for i in range(n):
        h = 0
        for c in bs[i : i + _WINNOW_K]:
            h = (h * _WINNOW_BASE + c) % _WINNOW_MOD
        hs.append(h)
    if n < _WINNOW_W:
        return {min(hs)}
    return {min(hs[s : s + _WINNOW_W]) for s in range(n - _WINNOW_W + 1)}


_text = st.text(alphabet="abcd efg.\n", min_size=0, max_size=200)


@given(_text)
@settings(max_examples=200, deadline=None)
def test_engine_matches_naive(text):
    assert _winnow_fps(text) == _naive_fps(text)


@given(_text, _text, st.text(alphabet="xyz ", min_size=GUARANTEE, max_size=80))
@settings(max_examples=100, deadline=None)
def test_shared_substring_guarantee(prefix_a, prefix_b, shared):
    a, b = prefix_a + shared, prefix_b + shared
    assert _winnow_fps(a) & _winnow_fps(b)


def test_edge_lengths():
    assert _winnow_fps("") == set()
    assert _winnow_fps("x" * (_WINNOW_K - 1)) == set()
    # exactly one k-gram -> exactly one fingerprint
    assert len(_winnow_fps("a" * _WINNOW_K)) == 1
    # below the full-window regime the rightmost global minimum is kept
    short = "abcdefghij" * 2 + "klmno"  # k <= len < k + w - 1
    assert len(_winnow_fps(short)) >= 1
