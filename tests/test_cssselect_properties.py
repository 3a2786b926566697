"""Property tests for the CSS-subset selector: generate a random DOM tree
programmatically, serialize it to HTML, and assert css_extract recovers
exactly what was put in — the ground truth comes from the generated
structure itself, not from the parser under test."""

from __future__ import annotations

from dataclasses import dataclass, field

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy__ray.functions.cssselect import css_extract

# freely-nestable tags only: p/li/td carry HTML5 implied-close semantics
# (opening one closes the previous), so a generated p-in-p tree would not
# round-trip structurally — that behavior has its own vector tests
TAGS = ["div", "span", "section", "em", "b"]
CLASSES = ["a", "b", "c"]
WORDS = ["alpha", "beta", "gamma", "delta"]


@dataclass
class Gen:
    tag: str
    classes: list[str]
    text: str
    children: list["Gen"] = field(default_factory=list)

    def html(self) -> str:
        cls = f' class="{" ".join(self.classes)}"' if self.classes else ""
        inner = self.text + "".join(c.html() for c in self.children)
        return f"<{self.tag}{cls}>{inner}</{self.tag}>"

    def full_text(self) -> str:
        return self.text + "".join(c.full_text() for c in self.children)

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


@st.composite
def trees(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    classes = draw(st.lists(st.sampled_from(CLASSES), max_size=2, unique=True))
    text = draw(st.sampled_from(["", *WORDS]))
    kids = []
    if depth < 3:
        for _ in range(draw(st.integers(0, 3 - depth))):
            kids.append(draw(trees(depth=depth + 1)))
    return Gen(tag, classes, text, kids)


@given(trees(), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_tag_text_matches_generated_structure(root, tag):
    doc = f"<html><body>{root.html()}</body></html>"
    expected = [n.full_text() for n in root.walk() if n.tag == tag]
    assert css_extract(doc.encode(), f"{tag}::text") == expected


@given(trees(), st.sampled_from(CLASSES))
@settings(max_examples=60, deadline=None)
def test_class_selector_matches_generated_structure(root, cls):
    doc = f"<html><body>{root.html()}</body></html>"
    expected = [n.full_text() for n in root.walk() if cls in n.classes]
    assert css_extract(doc.encode(), f".{cls}::text") == expected


@given(trees(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_descendant_combinator_matches_generated_structure(root, outer, inner):
    doc = f"<html><body>{root.html()}</body></html>"

    def has_ancestor(node, anc_tag, parents):
        p = parents.get(id(node))
        while p is not None:
            if p.tag == anc_tag:
                return True
            p = parents.get(id(p))
        return False

    parents = {}
    for n in root.walk():
        for c in n.children:
            parents[id(c)] = n
    expected = [
        n.full_text()
        for n in root.walk()
        if n.tag == inner and has_ancestor(n, outer, parents)
    ]
    assert css_extract(doc.encode(), f"{outer} {inner}::text") == expected

def _parents(root):
    parents = {}
    for n in root.walk():
        for c in n.children:
            parents[id(c)] = n
    return parents


@given(trees(), st.sampled_from(TAGS), st.integers(-3, 4), st.integers(-2, 5))
@settings(max_examples=60, deadline=None)
def test_nth_child_matches_generated_structure(root, tag, a, b):
    doc = f"<html><body>{root.html()}</body></html>"
    parents = _parents(root)

    def pos(n):  # 1-based position among element siblings (root: body child 1)
        p = parents.get(id(n))
        if p is None:
            return 1
        # identity, not ==: Gen is a dataclass, equal-valued siblings compare ==
        return next(i for i, c in enumerate(p.children) if c is n) + 1

    def nth(p):
        if a == 0:
            return p == b
        k, r = divmod(p - b, a)
        return r == 0 and k >= 0

    expected = [n.full_text() for n in root.walk() if n.tag == tag and nth(pos(n))]
    assert css_extract(doc.encode(), f"{tag}:nth-child({a}n{b:+d})::text") == expected


@given(trees(), st.sampled_from(TAGS))
@settings(max_examples=60, deadline=None)
def test_first_last_of_type_matches_generated_structure(root, tag):
    doc = f"<html><body>{root.html()}</body></html>"
    parents = _parents(root)

    def of_type_sibs(n):
        p = parents.get(id(n))
        return [c for c in p.children if c.tag == n.tag] if p else [n]

    first = [n.full_text() for n in root.walk()
             if n.tag == tag and of_type_sibs(n)[0] is n]
    last = [n.full_text() for n in root.walk()
            if n.tag == tag and of_type_sibs(n)[-1] is n]
    assert css_extract(doc.encode(), f"{tag}:first-of-type::text") == first
    assert css_extract(doc.encode(), f"{tag}:last-of-type::text") == last


@given(trees(), st.sampled_from(TAGS), st.sampled_from(CLASSES))
@settings(max_examples=60, deadline=None)
def test_not_class_matches_generated_structure(root, tag, cls):
    doc = f"<html><body>{root.html()}</body></html>"
    expected = [n.full_text() for n in root.walk()
                if n.tag == tag and cls not in n.classes]
    assert css_extract(doc.encode(), f"{tag}:not(.{cls})::text") == expected
