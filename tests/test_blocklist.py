"""Aho-Corasick blocklist matcher properties (textops.BlocklistMatcher).

The automaton's failure-link construction is the subtle part; pit its
total-match count against the naive third implementation (str.count per
pattern — exact for the borderless pinned terms) on hypothesis-generated
text built from fragments that exercise shared prefixes ('spar'/'spark')
and cross-boundary matches."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy__ray.pipelines.textops import _BLOCK_TERMS, BlocklistMatcher

_frag = st.sampled_from(
    list(_BLOCK_TERMS) + ["spa", "sparkspar", "value", " ", "x", "hash part"]
)
_text = st.lists(_frag, min_size=0, max_size=30).map("".join)


def _naive(text: str) -> int:
    return sum(text.count(t) for t in _BLOCK_TERMS)


@given(_text)
@settings(max_examples=300, deadline=None)
def test_automaton_matches_naive(text):
    m = BlocklistMatcher()
    assert m._count(text) == _naive(text)


def test_overlapping_prefix_patterns():
    m = BlocklistMatcher()
    # 'spark' contains 'spar': both must count
    assert m._count("spark") == 2
    assert m._count("sparspark") == 3  # 'spar' x2 + 'spark' x1
    assert m._count("") == 0
