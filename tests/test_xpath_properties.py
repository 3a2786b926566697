"""Property tests for the XPath subset.

Two independent ground truths:
  1. the generated tree structure itself (same scheme as
     test_cssselect_properties.py);
  2. the CSS-subset engine — an ALGORITHMICALLY different implementation
     (right-to-left matching with backtracking vs XPath's left-to-right
     node-set generation) — on selector pairs whose semantics coincide.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy__ray.functions.cssselect import css_extract
from scrapy__ray.functions.xpath import xpath_extract

from tests.test_cssselect_properties import CLASSES, TAGS, trees, _parents


def _doc(root) -> bytes:
    return f"<html><body>{root.html()}</body></html>".encode()


@given(trees(), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_descendant_matches_generated_structure(root, tag):
    expected = [n.full_text() for n in root.walk() if n.tag == tag]
    assert xpath_extract(_doc(root), f"//{tag}") == expected


@given(trees(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_descendant(root, outer, inner):
    doc = _doc(root)
    assert xpath_extract(doc, f"//{outer}//{inner}") == css_extract(
        doc, f"{outer} {inner}::text"
    )


@given(trees(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_child(root, outer, inner):
    doc = _doc(root)
    assert xpath_extract(doc, f"//{outer}/{inner}") == css_extract(
        doc, f"{outer} > {inner}::text"
    )


@given(trees(), st.sampled_from(CLASSES))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_attr_value(root, cls):
    # [@class='v'] is exact-match; the css [class=v] operator is too
    doc = _doc(root)
    got = xpath_extract(doc, f"//*[@class='{cls}']")
    assert got == css_extract(doc, f"[class={cls}]::text")


@given(trees(), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_first_of_type(root, tag):
    # //x[1] = first x among its x-siblings = css :first-of-type
    doc = _doc(root)
    assert xpath_extract(doc, f"//{tag}[1]") == css_extract(
        doc, f"{tag}:first-of-type::text"
    )
    assert xpath_extract(doc, f"//{tag}[last()]") == css_extract(
        doc, f"{tag}:last-of-type::text"
    )


@given(trees(), st.sampled_from(TAGS), st.integers(1, 4))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_nth_of_type(root, tag, n):
    doc = _doc(root)
    assert xpath_extract(doc, f"//{tag}[{n}]") == css_extract(
        doc, f"{tag}:nth-of-type({n})::text"
    )


@given(trees(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_adjacent_sibling(root, a, b):
    # css 'a + b' == xpath //a/following-sibling::*[1] filtered to tag b
    # (following-sibling::b[1] would be "NEAREST following b", not
    # "adjacent" — a classic XPath confusion this test pins down).
    # Ground truth comes from the generated tree itself.
    doc = _doc(root)

    def walk_pairs(node):
        for i, c in enumerate(node.children):
            if i + 1 < len(node.children):
                yield c, node.children[i + 1]
            yield from walk_pairs(c)

    expected = [
        nxt.full_text()
        for prev, nxt in walk_pairs(root)
        if prev.tag == a and nxt.tag == b
    ]
    assert css_extract(doc, f"{a} + {b}::text") == expected

    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_select

    nodes = xpath_select(parse_dom(doc), f"//{a}/following-sibling::*[1]")
    assert [n.text() for n in nodes if n.tag == b] == expected


@given(trees(), st.sampled_from(TAGS), st.sampled_from(CLASSES))
@settings(max_examples=60, deadline=None)
def test_css_equivalence_not_class(root, tag, cls):
    doc = _doc(root)
    got = xpath_extract(doc, f"//{tag}[not(contains(concat(' ', @class, ' '), ' {cls} '))]")
    assert got == css_extract(doc, f"{tag}:not(.{cls})::text")


@given(trees())
@settings(max_examples=60, deadline=None)
def test_count_matches_walk(root):
    doc = _doc(root)
    for tag in TAGS:
        expected = sum(1 for n in root.walk() if n.tag == tag)
        assert xpath_extract(doc, f"count(//{tag})") == [str(expected)]


@given(trees(), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_union_is_doc_ordered_dedup(root, tag):
    doc = _doc(root)
    # X | X == X, and a union with * is just * (doc order, dedup)
    assert xpath_extract(doc, f"//{tag} | //{tag}") == xpath_extract(doc, f"//{tag}")
    every = xpath_extract(doc, "//body//*")
    assert xpath_extract(doc, f"//body//* | //{tag}") == every
