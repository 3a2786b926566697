"""CSS-subset selector over stdlib html.parser (SURVEY.md §2.6 P3).

The reference's most-used extraction surface is ``response.css(...)``
(`scrapy/selector/unified.py::Selector`, backed by parsel/lxml).  lxml is
absent in this environment, so this module implements the practically-used
subset over a lightweight DOM built with stdlib ``html.parser``:

  selector groups   ``h1, p.intro``          (comma = union, doc order;
                                              pseudo-elements apply PER
                                              group, as in parsel)
  compound          ``div.note#top[data-x=1]`` (tag, #id, .class, ``*``,
                                              [attr] with the operators
                                              ``= ~= |= ^= $= *=`` and
                                              quoted values that may
                                              contain spaces/``>``)
  combinators       ``ul li`` (descendant), ``ul > li`` (child),
                    ``h1 + p`` (adjacent sibling), ``h1 ~ p`` (general
                    sibling)
  pseudo-classes    ``:first-child :last-child :only-child``,
                    ``:nth-child(an+b|odd|even) :nth-last-child(..)``,
                    ``:first-of-type :last-of-type :nth-of-type(..)``,
                    ``:not(compound)`` (argument is a full compound —
                    a superset of CSS3's single-simple-selector rule —
                    but may not itself contain :not or a combinator)
  pseudo-elements   ``::text`` (recursive text), ``::attr(name)``

Out of scope (documented): dynamic/tree pseudo-classes beyond the above
(:hover, :empty, :root, :lang, ...), namespaces, case-insensitivity
flags ([attr=v i]), XPath.  Matching
follows the CSS rule of evaluating the rightmost compound against every
element and walking left with full backtracking (a rejected ancestor
candidate resumes the search higher up — greedy nearest-ancestor locking
returned false negatives on mixed chains, advice r2).  Results are in
document order, deduplicated, like parsel's ``SelectorList``.

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
class SelectorError(ValueError):
    pass


def _elem_index(n: Node, *, of_type: bool, from_end: bool) -> int:
    """1-based position of ``n`` among its parent's ELEMENT children
    (optionally only those sharing its tag), counted from the front or the
    back — the :nth-child / :nth-of-type index.  A parentless node (the
    synthetic root) is position 1."""
    if n.parent is None:
        return 1
    sibs = [
        c
        for c in n.parent.content
        if isinstance(c, Node) and (not of_type or c.tag == n.tag)
    ]
    idx = next(i for i, c in enumerate(sibs) if c is n)
    return len(sibs) - idx if from_end else idx + 1


def _nth_matches(a: int, b: int, pos: int) -> bool:
    """True if pos == a*k + b for some integer k >= 0 (CSS an+b)."""
    if a == 0:
        return pos == b
    k, r = divmod(pos - b, a)
    return r == 0 and k >= 0


@dataclass(frozen=True)
class Compound:
    tag: str | None  # None = any ('*')
    id_: str | None
    classes: tuple[str, ...]
    attrs: tuple[tuple[str, str, str | None], ...]  # (name, op, value)
    # pseudo-classes: ("nth", a, b, of_type, from_end) | ("only-child",)
    # | ("not", Compound)
    pseudos: tuple[tuple, ...] = ()

    def matches(self, n: Node) -> bool:
        if not n.tag:
            return False
        if self.tag is not None and n.tag != self.tag:
            return False
        if self.id_ is not None and n.attrs.get("id") != self.id_:
            return False
        if self.classes and not set(self.classes) <= n.classes():
            return False
        for name, op, val in self.attrs:
            if name not in n.attrs:
                return False
            have = n.attrs[name]
            if op == "" or val is None:
                continue  # presence-only
            if op == "=":
                if have != val:
                    return False
            elif op == "~=":
                # whitespace-list contains; an empty value or one with
                # whitespace can never match, per CSS
                if not val or " " in val or val not in have.split():
                    return False
            elif op == "|=":
                if have != val and not have.startswith(val + "-"):
                    return False
            elif op == "^=":
                if not val or not have.startswith(val):
                    return False
            elif op == "$=":
                if not val or not have.endswith(val):
                    return False
            elif op == "*=":
                if not val or val not in have:
                    return False
        for ps in self.pseudos:
            if ps[0] == "nth":
                _, a, b, of_type, from_end = ps
                if not _nth_matches(
                    a, b, _elem_index(n, of_type=of_type, from_end=from_end)
                ):
                    return False
            elif ps[0] == "only-child":
                if (
                    _elem_index(n, of_type=False, from_end=False) != 1
                    or _elem_index(n, of_type=False, from_end=True) != 1
                ):
                    return False
            else:  # ("not", Compound)
                if ps[1].matches(n):
                    return False
        return True


_SUFFIX_RE = re.compile(
    r"#([\w-]+)"
    r"|\.([\w-]+)"
    r"|\[((?:[^\]\"']|\"[^\"]*\"|'[^']*')*)\]"
    r"|:([\w-]+)(?:\(((?:[^()\"']|\"[^\"]*\"|'[^']*')*)\))?"
)
_NTH_RE = re.compile(
    r"^\s*(?:(odd|even)|([+-]?\d*)n(?:\s*([+-])\s*(\d+))?|([+-]?\d+))\s*$",
    re.IGNORECASE,
)
#: :name -> ("nth", a, b, of_type, from_end) for the argument-free forms
_POSITIONAL_PSEUDOS = {
    "first-child": (0, 1, False, False),
    "last-child": (0, 1, False, True),
    "first-of-type": (0, 1, True, False),
    "last-of-type": (0, 1, True, True),
}
_NTH_PSEUDOS = {
    "nth-child": (False, False),
    "nth-last-child": (False, True),
    "nth-of-type": (True, False),
    "nth-last-of-type": (True, True),
}


def _parse_nth(arg: str, tok: str) -> tuple[int, int]:
    """CSS an+b formula -> (a, b); accepts odd/even/n/2n/-n+3/+3/2n + 1."""
    m = _NTH_RE.match(arg)
    if not m:
        raise SelectorError(f"unsupported nth formula in: {tok!r}")
    if m.group(1):
        return (2, 1) if m.group(1).lower() == "odd" else (2, 0)
    if m.group(5) is not None:
        return (0, int(m.group(5)))
    coef = m.group(2)
    a = 1 if coef in ("", "+") else -1 if coef == "-" else int(coef)
    b = int(m.group(4)) * (1 if m.group(3) == "+" else -1) if m.group(3) else 0
    return (a, b)
_ATTR_BODY_RE = re.compile(
    r"\s*([\w-]+)\s*(?:(~=|\|=|\^=|\$=|\*=|=)\s*(.*?)\s*)?$"
)
_PSEUDO_RE = re.compile(r"::(text|attr\(([\w-]+)\))\s*$")
_TAG_RE = re.compile(r"\*|[a-zA-Z][\w-]*")
_COMBINATORS = {">": "child", "+": "adjacent", "~": "sibling"}


def _parse_compound(tok: str) -> Compound:
    m = _TAG_RE.match(tok)
    tag_tok = m.group(0) if m else None
    rest = tok[m.end() :] if m else tok
    tag = None if tag_tok in (None, "*") else tag_tok.lower()
    id_: str | None = None
    classes: list[str] = []
    attrs: list[tuple[str, str, str | None]] = []
    pseudos: list[tuple] = []
    pos = 0
    for sm in _SUFFIX_RE.finditer(rest):
        if sm.start() != pos:
            raise SelectorError(f"unsupported compound selector: {tok!r}")
        pos = sm.end()
        if sm.group(1):
            id_ = sm.group(1)
        elif sm.group(2):
            classes.append(sm.group(2))
        elif sm.group(4):
            name = sm.group(4).lower()
            arg = sm.group(5)
            if name in _POSITIONAL_PSEUDOS:
                if arg is not None:
                    raise SelectorError(f":{name} takes no argument: {tok!r}")
                pseudos.append(("nth", *_POSITIONAL_PSEUDOS[name]))
            elif name == "only-child":
                if arg is not None:
                    raise SelectorError(f":{name} takes no argument: {tok!r}")
                pseudos.append(("only-child",))
            elif name in _NTH_PSEUDOS:
                if arg is None:
                    raise SelectorError(f":{name} needs an argument: {tok!r}")
                a, b = _parse_nth(arg, tok)
                pseudos.append(("nth", a, b, *_NTH_PSEUDOS[name]))
            elif name == "not":
                if arg is None or not arg.strip():
                    raise SelectorError(f":not needs an argument: {tok!r}")
                inner = _parse_compound(arg.strip())
                if any(p[0] == "not" for p in inner.pseudos):
                    raise SelectorError(f"nested :not unsupported: {tok!r}")
                pseudos.append(("not", inner))
            else:
                raise SelectorError(f"unsupported pseudo-class :{name} in: {tok!r}")
        else:
            am = _ATTR_BODY_RE.fullmatch(sm.group(3))
            if not am:
                raise SelectorError(f"unsupported attribute selector: {tok!r}")
            name = am.group(1).lower()
            op = am.group(2) or ""
            val = am.group(3)
            if val is not None and len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                val = val[1:-1]
            attrs.append((name, op, val))
    if pos != len(rest) or (tag_tok is None and not rest):
        raise SelectorError(f"unsupported compound selector: {tok!r}")
    return Compound(tag, id_, tuple(classes), tuple(attrs), tuple(pseudos))


def _split_groups(selector: str) -> list[str]:
    """Split a selector list on commas OUTSIDE brackets/quotes."""
    groups: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    for ch in selector:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        elif ch == "," and depth == 0:
            groups.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    groups.append("".join(cur))
    return groups


def _tokenize_group(sel: str) -> list[str]:
    """One group -> alternating compound / combinator tokens.  Character
    scan so quoted attribute values may contain whitespace, '>', ',' etc.;
    ``[...]`` is consumed atomically."""
    toks: list[str] = []
    i, n = 0, len(sel)
    pending_ws = False
    while i < n:
        ch = sel[i]
        if ch.isspace():
            pending_ws = True
            i += 1
            continue
        if ch in _COMBINATORS:
            toks.append(ch)
            pending_ws = False
            i += 1
            continue
        if pending_ws and toks and toks[-1] not in _COMBINATORS:
            toks.append(" ")  # descendant combinator
        pending_ws = False
        start = i
        while i < n:
            c = sel[i]
            if c.isspace() or c in _COMBINATORS:
                break
            if c == "[":
                j = i + 1
                quote = None
                while j < n:
                    cj = sel[j]
                    if quote:
                        if cj == quote:
                            quote = None
                    elif cj in "\"'":
                        quote = cj
                    elif cj == "]":
                        break
                    j += 1
                if j >= n:
                    raise SelectorError(f"unclosed '[' in selector: {sel!r}")
                i = j + 1
            elif c == ":":
                if i + 1 < n and sel[i + 1] == ":":
                    raise SelectorError(
                        f"pseudo-element only allowed at selector end: {sel!r}"
                    )
                i += 1
                while i < n and (sel[i].isalnum() or sel[i] in "-_"):
                    i += 1
                if i < n and sel[i] == "(":
                    depth = 1
                    i += 1
                    quote = None
                    while i < n and depth:
                        cj = sel[i]
                        if quote:
                            if cj == quote:
                                quote = None
                        elif cj in "\"'":
                            quote = cj
                        elif cj == "(":
                            depth += 1
                        elif cj == ")":
                            depth -= 1
                        i += 1
                    if depth:
                        raise SelectorError(f"unclosed '(' in selector: {sel!r}")
            else:
                i += 1
        toks.append(sel[start:i])
    return toks


def _parse_chain(sel: str) -> list[tuple[str, Compound]]:
    """One selector group -> [(combinator, compound)]; ``combinator`` is the
    relation between this compound and the PREVIOUS one, one of
    {'descendant', 'child', 'adjacent', 'sibling'} (first entry:
    'descendant')."""
    chain: list[tuple[str, Compound]] = []
    comb = "descendant"
    have_comb = False  # an explicit combinator is pending
    for tok in _tokenize_group(sel):
        if tok in _COMBINATORS:
            if not chain or have_comb:
                raise SelectorError(f"misplaced combinator in: {sel!r}")
            comb = _COMBINATORS[tok]
            have_comb = True
            continue
        if tok == " ":
            continue  # descendant stays pending unless an explicit follows
        chain.append((comb, _parse_compound(tok)))
        comb = "descendant"
        have_comb = False
    if have_comb:
        raise SelectorError(f"selector ends with a combinator: {sel!r}")
    if not chain:
        raise SelectorError(f"empty selector: {sel!r}")
    return chain


def _prev_element_sibling(n: Node) -> Node | None:
    if n.parent is None:
        return None
    prev: Node | None = None
    for item in n.parent.content:
        if item is n:
            return prev
        if isinstance(item, Node):
            prev = item
    return None


def _match_left(chain: list[tuple[str, Compound]], idx: int, node: Node) -> bool:
    """``chain[idx]`` matched ``node``; check everything to the left.  Full
    backtracking: a descendant/sibling step that locks onto a candidate
    which fails further left RESUMES from the next candidate (the greedy
    nearest-ancestor walk returned false negatives on e.g. 'div > span em'
    when the nearest span's parent was not a div but a higher span
    qualified — advice r2)."""
    if idx == 0:
        return True
    comb = chain[idx][0]
    comp = chain[idx - 1][1]
    if comb == "child":
        p = node.parent
        return p is not None and comp.matches(p) and _match_left(chain, idx - 1, p)
    if comb == "descendant":
        p = node.parent
        while p is not None:
            if comp.matches(p) and _match_left(chain, idx - 1, p):
                return True
            p = p.parent
        return False
    if comb == "adjacent":
        s = _prev_element_sibling(node)
        return s is not None and comp.matches(s) and _match_left(chain, idx - 1, s)
    # general sibling
    s = _prev_element_sibling(node)
    while s is not None:
        if comp.matches(s) and _match_left(chain, idx - 1, s):
            return True
        s = _prev_element_sibling(s)
    return False


def _chain_matches(chain: list[tuple[str, Compound]], n: Node) -> bool:
    """Rightmost compound against ``n``, the rest with backtracking."""
    idx = len(chain) - 1
    return chain[idx][1].matches(n) and _match_left(chain, idx, n)


def _parse_groups(selector: str) -> list[tuple[list[tuple[str, Compound]], tuple]]:
    """Full selector -> [(chain, pseudo)] with a PER-GROUP pseudo-element
    (parsel applies 'h1::text, p::attr(x)' per group, not to the union):
    pseudo is ('text',) | ('attr', name) | ('element',)."""
    out = []
    for g in _split_groups(selector):
        g = g.strip()
        if not g:
            continue
        pseudo: tuple = ("element",)
        m = _PSEUDO_RE.search(g)
        if m:
            pseudo = ("text",) if m.group(1) == "text" else ("attr", m.group(2).lower())
            g = g[: m.start()].strip()
        out.append((_parse_chain(g), pseudo))
    if not out:
        raise SelectorError(f"empty selector: {selector!r}")
    return out


def css_select(root: Node, selector: str) -> list[Node]:
    """All elements matching the selector (groups comma-separated), in
    document order, deduplicated.  Pseudo-elements are stripped."""
    groups = _parse_groups(selector)
    out: list[Node] = []
    seen: set[int] = set()
    for n in root.iter():
        if id(n) in seen:
            continue
        for chain, _pseudo in groups:
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
    pragmatic subset; outer-HTML reserialization is out of scope).  Each
    comma group applies ITS OWN pseudo-element; results are in document
    order, deduplicated per (element, extraction)."""
    root = html if isinstance(html, Node) else parse_dom(html, declared_encoding)
    groups = _parse_groups(selector)
    out: list[str] = []
    seen: set[tuple[int, tuple]] = set()
    for n in root.iter():
        for chain, pseudo in groups:
            # no-pseudo extraction IS the recursive text, so dedup it
            # against an explicit ::text of the same element
            kind = ("text",) if pseudo == ("element",) else pseudo
            if (id(n), kind) in seen or not _chain_matches(chain, n):
                continue
            if kind == ("text",):
                out.append(n.text())
                seen.add((id(n), kind))
            else:
                if kind[1] in n.attrs:
                    out.append(n.attrs[kind[1]])
                seen.add((id(n), kind))
    return out


def re_extract(strings: list[str], pattern) -> list[str]:
    """parsel's ``Selector.re`` tail applied to an extracted string list
    (``css_extract(...)`` / ``xpath_extract(...)`` output): per string,
    ``findall`` flattened — with groups the group values, without the full
    matches — EXCEPT a group NAMED 'extract', which short-circuits to
    search().group('extract') per string (parsel's extract_regex
    contract).  Entity replacement is a no-op here: the stdlib DOM already
    decodes entities before any text reaches a selector result."""
    rx = re.compile(pattern) if isinstance(pattern, str) else pattern
    out: list[str] = []
    if "extract" in rx.groupindex:
        for s in strings:
            m = rx.search(s)
            # a match whose optional 'extract' group did not participate
            # yields None — parsel skips it rather than emitting None
            if m and m.group("extract") is not None:
                out.append(m.group("extract"))
        return out
    for s in strings:
        for m in rx.findall(s):
            if isinstance(m, tuple):
                out.extend(m)
            else:
                out.append(m)
    return out


def re_first(strings: list[str], pattern, default=None):
    """parsel's ``Selector.re_first``: first ``re_extract`` result or
    ``default``."""
    r = re_extract(strings, pattern)
    return r[0] if r else default
