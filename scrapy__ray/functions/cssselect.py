"""CSS-subset selector over stdlib html.parser (SURVEY.md §2.6 P3).

The reference's most-used extraction surface is ``response.css(...)``
(`scrapy/selector/unified.py::Selector`, backed by parsel/lxml).  lxml is
absent in this environment, so this module implements the practically-used
subset over a lightweight DOM built with stdlib ``html.parser``:

  selector groups   ``h1, p.intro``          (comma = union, doc order)
  compound          ``div.note#top[data-x=1]`` (tag, #id, .class, [attr],
                                              [attr=value], ``*``)
  combinators       ``ul li`` (descendant), ``ul > li`` (child)
  pseudo-elements   ``::text`` (recursive text), ``::attr(name)``

Out of scope (documented): sibling combinators, :nth-child and friends,
attribute ~=/^=/$=/*= operators, XPath.  Matching follows the CSS rule of
evaluating the rightmost compound against every element and walking
ancestors for the rest.  Results are in document order, deduplicated, like
parsel's ``SelectorList``.

Encoding resolution is shared with the extract stage (functions/encoding.py,
the P2 precedence rules), so ``css_extract(html_bytes, ...)`` sees exactly
the text the byte-identity oracle sees.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from scrapy__ray.functions.encoding import decode_html

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# HTML5 implied end tags: opening <X> auto-closes a still-open <Y> for these
# (the subset real pages rely on; lxml/parsel apply the full HTML5 set)
_IMPLIED_CLOSE = {
    "li": {"li"},
    "p": {"p"},
    "dt": {"dd", "dt"},
    "dd": {"dd", "dt"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
}


@dataclass
class Node:
    tag: str
    attrs: dict[str, str]
    parent: "Node | None" = None
    # document-ordered content: text chunks (str) interleaved with child Nodes
    content: list = field(default_factory=list)

    def children(self):
        return (c for c in self.content if isinstance(c, Node))

    def iter(self):
        yield self
        for c in self.children():
            yield from c.iter()

    def text(self) -> str:
        """Recursive concatenated text (parsel ``::text`` getall-joined)."""
        out: list[str] = []

        def walk(n: Node) -> None:
            for item in n.content:
                if isinstance(item, str):
                    out.append(item)
                else:
                    walk(item)

        walk(self)
        return "".join(out)

    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("", {})
        self._stack = [self.root]

    def _add(self, tag, attrs) -> Node:
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        top = self._stack[-1]
        node.parent = top
        top.content.append(node)
        return node

    def handle_starttag(self, tag, attrs):
        closes = _IMPLIED_CLOSE.get(tag)
        if closes and len(self._stack) > 1 and self._stack[-1].tag in closes:
            self._stack.pop()
        node = self._add(tag, attrs)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._add(tag, attrs)

    def handle_endtag(self, tag):
        # close the nearest open element of this tag (lenient, like browsers)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        self._stack[-1].content.append(data)


def parse_dom(html: bytes | str, declared_encoding: str | None = None) -> Node:
    text = html if isinstance(html, str) else decode_html(html, declared_encoding)
    b = _DomBuilder()
    b.feed(text)
    b.close()
    return b.root


# ------------------------------------------------------------ selector AST
@dataclass(frozen=True)
class Compound:
    tag: str | None  # None = any ('*')
    id_: str | None
    classes: tuple[str, ...]
    attrs: tuple[tuple[str, str | None], ...]  # (name, value-or-None)

    def matches(self, n: Node) -> bool:
        if not n.tag:
            return False
        if self.tag is not None and n.tag != self.tag:
            return False
        if self.id_ is not None and n.attrs.get("id") != self.id_:
            return False
        if self.classes and not set(self.classes) <= n.classes():
            return False
        for name, val in self.attrs:
            if name not in n.attrs:
                return False
            if val is not None and n.attrs[name] != val:
                return False
        return True


_COMPOUND_RE = re.compile(
    r"(?:(\*|[a-zA-Z][\w-]*))?"  # tag or *
    r"((?:[#.][\w-]+|\[[^\]]+\])*)"  # id/class/attr suffixes
)
_SUFFIX_RE = re.compile(r"#([\w-]+)|\.([\w-]+)|\[([^\]]+)\]")
_PSEUDO_RE = re.compile(r"::(text|attr\(([\w-]+)\))\s*$")


class SelectorError(ValueError):
    pass


def _parse_compound(tok: str) -> Compound:
    m = _COMPOUND_RE.fullmatch(tok)
    if not m or (m.group(1) is None and not m.group(2)):
        raise SelectorError(f"unsupported compound selector: {tok!r}")
    tag = m.group(1)
    tag = None if tag in (None, "*") else tag.lower()
    id_: str | None = None
    classes: list[str] = []
    attrs: list[tuple[str, str | None]] = []
    for sm in _SUFFIX_RE.finditer(m.group(2) or ""):
        if sm.group(1):
            id_ = sm.group(1)
        elif sm.group(2):
            classes.append(sm.group(2))
        else:
            body = sm.group(3)
            if "=" in body:
                name, val = body.split("=", 1)
                val = val.strip("\"'")
                attrs.append((name.strip().lower(), val))
            else:
                attrs.append((body.strip().lower(), None))
    return Compound(tag, id_, tuple(classes), tuple(attrs))


def _parse_chain(sel: str) -> list[tuple[str, Compound]]:
    """One selector group -> [(combinator, compound)] with combinator in
    {'descendant', 'child'} (first entry's combinator is 'descendant')."""
    toks = sel.replace(">", " > ").split()
    chain: list[tuple[str, Compound]] = []
    comb = "descendant"
    for tok in toks:
        if tok == ">":
            if not chain:
                raise SelectorError(f"selector starts with '>': {sel!r}")
            comb = "child"
            continue
        chain.append((comb, _parse_compound(tok)))
        comb = "descendant"
    if comb == "child":
        raise SelectorError(f"selector ends with '>': {sel!r}")
    if not chain:
        raise SelectorError(f"empty selector: {sel!r}")
    return chain


def _chain_matches(chain: list[tuple[str, Compound]], n: Node) -> bool:
    """Rightmost compound already matched ``n``; walk ancestors for the rest."""
    idx = len(chain) - 1
    if not chain[idx][1].matches(n):
        return False
    node = n
    idx -= 1
    while idx >= 0:
        comb_right = chain[idx + 1][0]  # how chain[idx] relates to chain[idx+1]
        comp = chain[idx][1]
        if comb_right == "child":
            node = node.parent
            if node is None or not comp.matches(node):
                return False
        else:
            node = node.parent
            while node is not None and not comp.matches(node):
                node = node.parent
            if node is None:
                return False
        idx -= 1
    return True


def css_select(root: Node, selector: str) -> list[Node]:
    """All elements matching the selector (groups comma-separated), in
    document order, deduplicated."""
    sel = selector.strip()
    m = _PSEUDO_RE.search(sel)
    if m:
        sel = sel[: m.start()].strip()
    chains = [_parse_chain(g.strip()) for g in sel.split(",") if g.strip()]
    if not chains:
        raise SelectorError(f"empty selector: {selector!r}")
    out: list[Node] = []
    seen: set[int] = set()
    for n in root.iter():
        if id(n) in seen:
            continue
        for chain in chains:
            if _chain_matches(chain, n):
                out.append(n)
                seen.add(id(n))
                break
    return out


def css_extract(
    html: bytes | str, selector: str, declared_encoding: str | None = None
) -> list[str]:
    """parsel-style ``response.css(sel).getall()``: ``::text`` yields each
    match's recursive text, ``::attr(name)`` yields the attribute value of
    matches that have it, no pseudo-element yields the element's text (the
    pragmatic subset; outer-HTML reserialization is out of scope)."""
    root = html if isinstance(html, Node) else parse_dom(html, declared_encoding)
    m = _PSEUDO_RE.search(selector.strip())
    nodes = css_select(root, selector)
    if m and m.group(1) == "text":
        return [n.text() for n in nodes]
    if m and m.group(2):
        attr = m.group(2).lower()
        return [n.attrs[attr] for n in nodes if attr in n.attrs]
    return [n.text() for n in nodes]
