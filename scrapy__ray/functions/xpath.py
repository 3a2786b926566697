"""XPath-1.0-subset evaluator over stdlib html.parser (SURVEY.md §2.6 P3).

The reference's second extraction surface is ``response.xpath(...)``
(`scrapy/selector/unified.py::Selector`, parsel/lxml XPath 1.0).  lxml is
absent here, so this module implements the practically-used XPath subset
over the same lightweight DOM that functions/cssselect.py builds
(``parse_dom`` / ``Node``), with a genuinely different algorithm: XPath is
evaluated LEFT-TO-RIGHT, generating candidate node-sets axis by axis, while
the CSS engine matches RIGHT-TO-LEFT with backtracking — the property suite
cross-checks the two on equivalent selector pairs.

Supported surface:

  paths         ``/a/b``, ``//a``, ``a/b``, ``.//a``, ``./a``, ``.``, ``..``,
                union ``p1 | p2``, parenthesized node-sets with predicates
                and trailing steps ``(//a)[1]/@href``
  axes          abbreviated child (default), ``//`` (descendant-or-self
                expansion with XPath-correct positional semantics:
                ``//x[1]`` is every x that is the FIRST x CHILD of its
                parent, not the first x in the document), ``@name``/``@*``,
                plus explicit ``child::``, ``descendant::``,
                ``descendant-or-self::``, ``self::``, ``parent::``,
                ``attribute::``, ``following-sibling::``,
                ``preceding-sibling::``, ``ancestor::``,
                ``ancestor-or-self::``, ``following::``, ``preceding::``
                (reverse axes number nearest-first: ``ancestor::div[1]``
                is the closest enclosing div)
  node tests    name, ``*``, ``text()``, ``node()``
  predicates    ``[3]``, ``[last()]``, ``[position()<=2]``, ``[@a]``,
                ``[@a='v']``, ``[tag]``, nested relative paths, ``and``,
                ``or``, comparisons ``= != < <= > >=`` with XPath-1.0
                node-set/any-match semantics
  functions     position last count not contains starts-with string
                normalize-space string-length concat name local-name
                true false substring substring-before substring-after
                translate number sum boolean floor ceiling round
                (round/substring follow the 1.0 spec: half toward +inf)
  arithmetic    ``+ - * div mod`` and unary minus, full §3.5 semantics:
                left-associative, IEEE division (x div 0 → ±inf, 0 div 0
                → NaN), mod keeps the DIVIDEND's sign (Java %, not
                Python's), negative literals, and the §3.7 ``*``/``div``/
                ``mod`` operator-vs-name disambiguation (``//div div 2``
                parses; idioms ``//tr[position() mod 2 = 1]`` and
                ``//li[last() - 1]`` work)
  result types  node-sets (elements / text nodes / attributes) and, at the
                top level, scalars (``count(//a)`` etc.)

Out of scope (documented): the namespace axis, ``lang()`` (no xml:lang in
this DOM), namespaced names.  ``id()`` is supported (round 4) under the
HTML convention pinned in ``_Env.id_map``.  Variables (``$x``) bind via keyword arguments on the
public API, the parsel kwargs surface.  ``xpath_extract`` maps element results to their
recursive text (same pragmatic divergence as css_extract — parsel returns
outer HTML; re-serialization is out of scope, noted in the docstring
there too).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from scrapy__ray.functions.cssselect import Node, parse_dom


class XPathError(ValueError):
    pass


# --------------------------------------------------------------- node kinds
@dataclass
class TextItem:
    """A text NODE (one content chunk) — distinct from an element's
    recursive string-value."""

    parent: Node
    index: int  # position in parent.content
    value: str


@dataclass
class AttrItem:
    owner: Node
    name: str
    value: str


def _ident(item):
    if isinstance(item, Node):
        return ("n", id(item))
    if isinstance(item, TextItem):
        return ("t", id(item.parent), item.index)
    return ("a", id(item.owner), item.name)


def _string_value(item) -> str:
    if isinstance(item, Node):
        return item.text()
    return item.value


class _Env:
    """Per-evaluation document context: doc-order index + canonical
    text/attr wrappers (so dedup-by-identity works across steps)."""

    def __init__(self, root: Node, variables: dict | None = None) -> None:
        self.root = root
        self.variables = variables or {}
        self.order: dict = {}
        i = 0

        def walk(n: Node) -> None:
            nonlocal i
            self.order[id(n)] = i
            i += 1
            for ci, item in enumerate(n.content):
                if isinstance(item, Node):
                    walk(item)
                else:
                    self.order[(id(n), ci)] = i
                    i += 1

        walk(root)
        self._texts: dict = {}
        self._attrs: dict = {}

    def id_map(self) -> dict:
        """§4.1 id(): unique-ID map, built lazily on first use.  This DOM
        has no DTD, so the pinned contract is the HTML convention (what
        lxml does over HTML too): an element's ``id`` attribute is its
        unique ID, and of duplicated IDs the FIRST element in document
        order wins."""
        m = getattr(self, "_idmap", None)
        if m is None:
            m = {}

            def walk(n: Node) -> None:
                v = n.attrs.get("id")
                if v is not None and v not in m:
                    m[v] = n
                for item in n.content:
                    if isinstance(item, Node):
                        walk(item)

            walk(self.root)
            self._idmap = m
        return m

    def text_item(self, parent: Node, index: int) -> TextItem:
        key = (id(parent), index)
        it = self._texts.get(key)
        if it is None:
            it = self._texts[key] = TextItem(parent, index, parent.content[index])
        return it

    def attr_item(self, owner: Node, name: str) -> AttrItem:
        key = (id(owner), name)
        it = self._attrs.get(key)
        if it is None:
            it = self._attrs[key] = AttrItem(owner, name, owner.attrs[name])
        return it

    def sort_key(self, item):
        if isinstance(item, Node):
            return (self.order[id(item)], -1, 0)
        if isinstance(item, TextItem):
            return (self.order[(id(item.parent), item.index)], -1, 0)
        # XPath: attributes follow their element, before its children,
        # in declaration order (matching lxml)
        return (self.order[id(item.owner)], 0, list(item.owner.attrs).index(item.name))

    def doc_sort(self, items: list) -> list:
        out, seen = [], set()
        for it in sorted(items, key=self.sort_key):
            k = _ident(it)
            if k not in seen:
                seen.add(k)
                out.append(it)
        return out


# ------------------------------------------------------------------- lexer
_TOKEN_RE = re.compile(
    r"\s*("
    r"//|/|\.\.|::|!=|<=|>=|"
    r"\d+(?:\.\d+)?|\.\d+|"
    r"\.|@|\||\[|\]|\(|\)|,|=|<|>|\*|\+|-|"
    r"\$[A-Za-z_][\w-]*|"
    r'"[^"]*"|\'[^\']*\'|'
    r"[A-Za-z_][\w-]*"
    r")"
)
# NB: the name pattern consumes hyphens greedily, so `foo-bar` is ONE QName
# (spec: '-' without surrounding whitespace continues the name) while
# `foo - bar` and `4-2` lex the '-' as the subtraction operator.


def _tokenize(expr: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            if expr[pos:].strip() == "":
                break
            raise XPathError(f"bad character at {pos} in xpath: {expr!r}")
        toks.append(m.group(1))
        pos = m.end()
    return toks


# ---------------------------------------------------------------- AST nodes
@dataclass
class Step:
    axis: str  # child descendant descendant-or-self self parent attribute
    #           following-sibling preceding-sibling ancestor
    #           ancestor-or-self following preceding
    test: str  # tag name | "*" | "text()" | "node()"
    preds: list


@dataclass
class Path:
    absolute: bool
    steps: list  # [(dslash: bool, Step)] — dslash = '//' before the step


@dataclass
class Filter:
    inner: object  # any expression; must evaluate to a node-set
    preds: list
    steps: list  # trailing [(dslash, Step)]


@dataclass
class UnionExpr:
    parts: list  # Path | Filter


@dataclass
class Cmp:
    op: str
    left: object
    right: object


@dataclass
class BoolOp:
    op: str  # "and" | "or"
    parts: list


@dataclass
class Func:
    name: str
    args: list


@dataclass
class Arith:
    op: str  # "+" | "-" | "*" | "div" | "mod"
    left: object
    right: object


@dataclass
class Neg:
    inner: object


@dataclass
class Var:
    name: str  # $name — bound at evaluation time (the parsel kwargs surface)


@dataclass
class Lit:
    value: object  # float | str


_AXES = {
    "child",
    "descendant",
    "descendant-or-self",
    "self",
    "parent",
    "attribute",
    "following-sibling",
    "preceding-sibling",
    "ancestor",
    "ancestor-or-self",
    "following",
    "preceding",
}
_FUNCS = {
    "position": (0, 0),
    "last": (0, 0),
    "count": (1, 1),
    "not": (1, 1),
    "contains": (2, 2),
    "starts-with": (2, 2),
    "string": (0, 1),
    "normalize-space": (0, 1),
    "string-length": (0, 1),
    "concat": (2, 99),
    "name": (0, 1),
    "local-name": (0, 1),
    "true": (0, 0),
    "false": (0, 0),
    "substring": (2, 3),
    "substring-before": (2, 2),
    "substring-after": (2, 2),
    "translate": (3, 3),
    "number": (0, 1),
    "sum": (1, 1),
    "boolean": (1, 1),
    "floor": (1, 1),
    "ceiling": (1, 1),
    "round": (1, 1),
    "id": (1, 1),
    "lang": (1, 1),
}


class _Parser:
    def __init__(self, expr: str) -> None:
        self.expr = expr
        self.toks = _tokenize(expr)
        self.i = 0

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise XPathError(f"unexpected end of xpath: {self.expr!r}")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t != tok:
            raise XPathError(f"expected {tok!r}, got {t!r} in: {self.expr!r}")

    # XPath 1.0 precedence (subset): or < and < (=,!=,<,<=,>,>=) < '|' <
    # path.  The top-level expression is a full OrExpr, so scalars like
    # ``count(//a)`` parse as well as plain paths.
    def parse(self):
        e = self.parse_or()
        if self.i != len(self.toks):
            raise XPathError(f"trailing tokens in xpath: {self.expr!r}")
        return e

    def parse_pathexpr(self):
        tok = self.peek()
        if tok == "(":
            self.next()
            inner = self.parse_or()
            self.expect(")")
            preds = self.parse_preds()
            steps = []
            while self.peek() in ("/", "//"):
                dslash = self.next() == "//"
                steps.append((dslash, self.parse_step()))
            return Filter(inner, preds, steps)
        if tok is not None and re.fullmatch(r"\d+(?:\.\d+)?|\.\d+", tok):
            self.next()
            return Lit(float(tok))
        if tok is not None and tok[0] in "\"'":
            self.next()
            return Lit(tok[1:-1])
        if tok is not None and tok.startswith("$"):
            self.next()
            return self._filter_tail(Var(tok[1:]))
        if (
            tok is not None
            and re.fullmatch(r"[A-Za-z_][\w-]*", tok)
            and self.peek(1) == "("
            and tok in _FUNCS
        ):
            name = self.next()
            self.expect("(")
            args = []
            if self.peek() != ")":
                args.append(self.parse_or())
                while self.peek() == ",":
                    self.next()
                    args.append(self.parse_or())
            self.expect(")")
            lo, hi = _FUNCS[name]
            if not lo <= len(args) <= hi:
                raise XPathError(f"{name}() takes {lo}..{hi} args: {self.expr!r}")
            return self._filter_tail(Func(name, args))
        return self.parse_path()

    def _filter_tail(self, inner):
        """Grammar §3.3: ANY FilterExpr (function call, variable) may carry
        predicates and continue as a path — ``id('b')/span``,
        ``$nodes[1]/@href``.  Without a tail the expression is returned
        bare so scalar uses (``string-length(x) div 2``) stay scalars."""
        if self.peek() == "[" or self.peek() in ("/", "//"):
            preds = self.parse_preds()
            steps = []
            while self.peek() in ("/", "//"):
                dslash = self.next() == "//"
                steps.append((dslash, self.parse_step()))
            return Filter(inner, preds, steps)
        return inner

    def parse_path(self) -> Path:
        absolute = False
        steps: list = []
        tok = self.peek()
        if tok in ("/", "//"):
            absolute = True
            dslash = self.next() == "//"
            steps.append((dslash, self.parse_step()))
        else:
            steps.append((False, self.parse_step()))
        while self.peek() in ("/", "//"):
            dslash = self.next() == "//"
            steps.append((dslash, self.parse_step()))
        return Path(absolute, steps)

    def parse_step(self) -> Step:
        tok = self.peek()
        if tok == ".":
            self.next()
            return Step("self", "node()", [])
        if tok == "..":
            self.next()
            return Step("parent", "node()", [])
        axis = "child"
        if tok == "@":
            self.next()
            axis = "attribute"
        elif tok is not None and self.peek(1) == "::":
            if tok not in _AXES:
                raise XPathError(f"unsupported axis {tok!r} in: {self.expr!r}")
            axis = tok
            self.next()
            self.next()
        test = self.parse_nodetest(axis)
        return Step(axis, test, self.parse_preds())

    def parse_nodetest(self, axis: str) -> str:
        tok = self.next()
        if tok == "*":
            return "*"
        if not re.fullmatch(r"[A-Za-z_][\w-]*", tok or ""):
            raise XPathError(f"bad node test {tok!r} in: {self.expr!r}")
        if tok in ("text", "node") and self.peek() == "(":
            self.next()
            self.expect(")")
            if axis == "attribute":
                raise XPathError(f"{tok}() invalid on attribute axis")
            return tok + "()"
        return tok.lower()

    def parse_preds(self) -> list:
        preds = []
        while self.peek() == "[":
            self.next()
            preds.append(self.parse_or())
            self.expect("]")
        return preds

    # predicate expression grammar
    def parse_or(self):
        parts = [self.parse_and()]
        while self.peek() == "or":
            self.next()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else BoolOp("or", parts)

    def parse_and(self):
        parts = [self.parse_cmp()]
        while self.peek() == "and":
            self.next()
            parts.append(self.parse_cmp())
        return parts[0] if len(parts) == 1 else BoolOp("and", parts)

    def parse_cmp(self):
        # spec §3.4/§3.5: EqualityExpr and RelationalExpr are separate,
        # LEFT-associative levels above the additive chain
        left = self.parse_rel()
        while self.peek() in ("=", "!="):
            op = self.next()
            left = Cmp(op, left, self.parse_rel())
        return left

    def parse_rel(self):
        left = self.parse_add()
        while self.peek() in ("<", "<=", ">", ">="):
            op = self.next()
            left = Cmp(op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.peek() in ("+", "-"):
            op = self.next()
            left = Arith(op, left, self.parse_mul())
        return left

    def parse_mul(self):
        # §3.7 disambiguation: at this loop position an operand has just
        # been parsed, so a following '*' is the MultiplyOperator and the
        # NCNames 'div'/'mod' are OperatorNames — where an operand is
        # EXPECTED (after '/', '//', '::', '(', '[', ',' or an operator),
        # the same spellings lex as node tests instead, which the step /
        # operand parsers consume before control ever returns here.
        left = self.parse_unary()
        while self.peek() in ("*", "div", "mod"):
            op = self.next()
            left = Arith(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.peek() == "-":
            self.next()
            return Neg(self.parse_unary())
        return self.parse_union_tight()

    def parse_union_tight(self):
        parts = [self.parse_pathexpr()]
        while self.peek() == "|":
            self.next()
            parts.append(self.parse_pathexpr())
        if len(parts) == 1:
            return parts[0]
        for p in parts:
            if not isinstance(p, (Path, Filter)):
                raise XPathError(f"'|' operands must be paths: {self.expr!r}")
        return UnionExpr(parts)


# -------------------------------------------------------------- evaluation
def _nodetest_ok(item, test: str, axis: str) -> bool:
    if axis == "attribute":
        return test == "*" or (isinstance(item, AttrItem) and item.name == test)
    if isinstance(item, TextItem):
        return test in ("text()", "node()")
    if isinstance(item, Node):
        if test == "node()":
            return True
        if not item.tag:  # synthetic document root: only node() matches
            return False
        return test == "*" or item.tag == test
    return False


def _child_items(n, env: _Env) -> list:
    if not isinstance(n, Node):
        return []
    out = []
    for ci, item in enumerate(n.content):
        out.append(item if isinstance(item, Node) else env.text_item(n, ci))
    return out


def _descendants(n, env: _Env, include_self: bool) -> list:
    out = [n] if include_self else []
    if isinstance(n, Node):
        stack = list(reversed(_child_items(n, env)))
        while stack:
            it = stack.pop()
            out.append(it)
            if isinstance(it, Node):
                stack.extend(reversed(_child_items(it, env)))
    return out


def _parent_of(item):
    if isinstance(item, Node):
        return item.parent
    if isinstance(item, TextItem):
        return item.parent
    return item.owner


def _ancestors(item) -> list:
    out = []
    p = _parent_of(item)
    while p is not None:
        out.append(p)
        p = _parent_of(p)
    return out  # nearest first — ancestor is a reverse axis


def _doc_items(env: _Env) -> list:
    """All element/text items of the document in document order, cached on
    the env — following/preceding would otherwise re-walk the whole DOM
    once per context node (the per-page-re-walk cost xpath_compile /
    xpath_extract_many exist to avoid)."""
    cached = getattr(env, "_all_items", None)
    if cached is None:
        cached = env._all_items = _descendants(env.root, env, include_self=False)
    return cached


def _following(item, env: _Env) -> list:
    """§2.2 following: everything after the node in document order,
    excluding its OWN descendants (attribute nodes never appear on this
    axis).  An attribute has no descendants, so from ``@a`` the owning
    element's children are included — they follow the attribute in
    document order (lxml agrees)."""
    subtree = {
        _ident(x)
        for x in (
            _descendants(item, env, include_self=True)
            if isinstance(item, Node)
            else [item]
        )
    }
    k = env.sort_key(item)
    return [
        it
        for it in _doc_items(env)
        if env.sort_key(it) > k and _ident(it) not in subtree
    ]


def _preceding(item, env: _Env) -> list:
    """§2.2 preceding: everything before the node in document order,
    excluding its ancestors (for an attribute that chain starts at the
    owning element); reverse axis (nearest first)."""
    ancs = {_ident(x) for x in _ancestors(item)}
    k = env.sort_key(item)
    return list(
        reversed(
            [
                it
                for it in _doc_items(env)
                if env.sort_key(it) < k and _ident(it) not in ancs
            ]
        )
    )


def _siblings(item, env: _Env, *, forward: bool) -> list:
    p = _parent_of(item)
    if not isinstance(item, (Node, TextItem)) or p is None:
        return []
    sibs = _child_items(p, env)
    me = _ident(item)
    idx = next(i for i, s in enumerate(sibs) if _ident(s) == me)
    if forward:
        return sibs[idx + 1 :]
    return list(reversed(sibs[:idx]))  # reverse axis order: nearest first


def _axis_candidates(ctx, step: Step, env: _Env) -> list:
    a = step.axis
    if a == "child":
        items = _child_items(ctx, env)
    elif a == "descendant":
        items = _descendants(ctx, env, include_self=False)
    elif a == "descendant-or-self":
        items = _descendants(ctx, env, include_self=True)
    elif a == "self":
        items = [ctx]
    elif a == "parent":
        p = _parent_of(ctx)
        items = [p] if p is not None else []
    elif a == "attribute":
        if not isinstance(ctx, Node):
            return []
        names = (
            list(ctx.attrs) if step.test == "*" else
            ([step.test] if step.test in ctx.attrs else [])
        )
        return [env.attr_item(ctx, nm) for nm in names]
    elif a == "following-sibling":
        items = _siblings(ctx, env, forward=True)
    elif a == "preceding-sibling":
        items = _siblings(ctx, env, forward=False)
    elif a == "ancestor":
        items = _ancestors(ctx)
    elif a == "ancestor-or-self":
        items = [ctx] + _ancestors(ctx)
    elif a == "following":
        items = _following(ctx, env)
    else:  # preceding
        items = _preceding(ctx, env)
    return [it for it in items if _nodetest_ok(it, step.test, a)]


def _apply_preds(cands: list, preds: list, env: _Env) -> list:
    for pred in preds:
        size = len(cands)
        cands = [
            it
            for pos, it in enumerate(cands, 1)
            if _pred_true(pred, it, pos, size, env)
        ]
    return cands


def _eval_steps(ctxs: list, steps: list, env: _Env) -> list:
    cur = ctxs
    for dslash, step in steps:
        if dslash:
            # '//' = /descendant-or-self::node()/ then the step's own axis
            expanded = []
            for c in cur:
                expanded.extend(_descendants(c, env, include_self=True))
            cur = env.doc_sort(expanded)
        nxt = []
        for c in cur:
            nxt.extend(_apply_preds(_axis_candidates(c, step, env), step.preds, env))
        cur = env.doc_sort(nxt)
    return cur


def _eval_pathexpr(px, ctx_items: list, env: _Env):
    if isinstance(px, Path):
        start = [env.root] if px.absolute else ctx_items
        return _eval_steps(start, px.steps, env)
    # Filter: (expr)[preds]/steps — inner evaluated per context item
    out: list = []
    for c in ctx_items:
        v = _eval_expr(px.inner, c, 1, 1, env)
        if not isinstance(v, list):
            if not px.preds and not px.steps and len(ctx_items) == 1:
                return v  # plain parenthesized scalar
            raise XPathError("predicates/steps require a node-set operand")
        out.extend(v)
    base = _apply_preds(env.doc_sort(out), px.preds, env)
    return _eval_steps(base, px.steps, env) if px.steps else base


def _eval_union(u: UnionExpr, ctx_items: list, env: _Env) -> list:
    out = []
    for p in u.parts:
        out.extend(_eval_pathexpr(p, ctx_items, env))
    return env.doc_sort(out)


def _xpath_round(v: float) -> float:
    """XPath 1.0 round(): half rounds toward POSITIVE infinity (round(-1.5)
    is -1, round(1.5) is 2) — neither Python's banker's rounding nor
    away-from-zero.  NaN passes through."""
    if math.isnan(v) or math.isinf(v):
        return v
    return float(math.floor(v + 0.5))


_NUMBER_RE = re.compile(r"^[ \t\r\n]*-?(\d+(\.\d*)?|\.\d+)[ \t\r\n]*$")


def _to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, str):
        # XPath 1.0 §3.5 Number grammar: optional '-', digits with an
        # optional fractional part (or a bare '.digits') — NOTHING else.
        # Python float() is far more lenient ('1e5', '+5', 'inf', '5_0'
        # all parse); every such string is NaN under the spec.
        if _NUMBER_RE.match(v):
            return float(v.strip())
        return math.nan
    # node-set: number(string-value of first node)
    return _to_number(_string_value(v[0])) if v else math.nan


def _to_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):  # §4.2: reachable via div since the arithmetic
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        return repr(v)
    if isinstance(v, str):
        return v
    return _string_value(v[0]) if v else ""


def _to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v != 0 and not math.isnan(v)
    if isinstance(v, str):
        return bool(v)
    return bool(v)  # node-set: non-empty


_NUM_CMP = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def _cmp_values(op: str, lv, rv) -> bool:
    lset = isinstance(lv, list)
    rset = isinstance(rv, list)
    # XPath 1.0 §3.4: a node-set compared against a BOOLEAN is first
    # converted via boolean() (non-empty test) for ALL six operators —
    # the per-node some-match rule below applies only vs numbers/strings
    if lset and isinstance(rv, bool):
        return _cmp_values(op, _to_bool(lv), rv)
    if rset and isinstance(lv, bool):
        return _cmp_values(op, lv, _to_bool(rv))
    if lset or rset:
        # XPath 1.0: true iff SOME node(s) satisfy the comparison
        lvals = [_string_value(n) for n in lv] if lset else [lv]
        rvals = [_string_value(n) for n in rv] if rset else [rv]
        for a in lvals:
            for b in rvals:
                if _cmp_values(op, a, b):
                    return True
        return False
    if op in ("<", "<=", ">", ">="):
        return _NUM_CMP[op](_to_number(lv), _to_number(rv))
    if isinstance(lv, bool) or isinstance(rv, bool):
        eq = _to_bool(lv) == _to_bool(rv)
    elif isinstance(lv, float) or isinstance(rv, float):
        eq = _to_number(lv) == _to_number(rv)
    else:
        eq = _to_string(lv) == _to_string(rv)
    return eq if op == "=" else not eq


def _eval_expr(e, item, pos: int, size: int, env: _Env):
    if isinstance(e, Lit):
        return e.value
    if isinstance(e, BoolOp):
        if e.op == "and":
            return all(_to_bool(_eval_expr(p, item, pos, size, env)) for p in e.parts)
        return any(_to_bool(_eval_expr(p, item, pos, size, env)) for p in e.parts)
    if isinstance(e, Cmp):
        return _cmp_values(
            e.op,
            _eval_expr(e.left, item, pos, size, env),
            _eval_expr(e.right, item, pos, size, env),
        )
    if isinstance(e, Neg):
        return -_to_number(_eval_expr(e.inner, item, pos, size, env))
    if isinstance(e, Var):
        if e.name not in env.variables:
            raise XPathError(f"undefined XPath variable ${e.name}")
        v = env.variables[e.name]
        if isinstance(v, (bool, str, list)):
            return v
        try:
            # any numeric scalar — including numpy ints/floats, the natural
            # output of this repo's pandas pipelines — coerces to XPath float
            return float(v)
        except (TypeError, ValueError):
            return v
    if isinstance(e, Arith):
        a = _to_number(_eval_expr(e.left, item, pos, size, env))
        b = _to_number(_eval_expr(e.right, item, pos, size, env))
        if e.op == "+":
            return a + b
        if e.op == "-":
            return a - b
        if e.op == "*":
            return a * b
        if e.op == "div":
            # IEEE 754 semantics (§3.5): x div 0 is ±inf, 0 div 0 / NaN
            # operands give NaN — Python '/' raises instead
            if b == 0:
                if math.isnan(a) or a == 0:
                    return math.nan
                return math.copysign(math.inf, a) * math.copysign(1.0, b)
            return a / b
        # mod: remainder with the sign of the DIVIDEND (5 mod -2 is 1,
        # -5 mod 2 is -1) — math.fmod, NOT Python's '%'
        if b == 0 or math.isnan(a) or math.isinf(a):
            return math.nan
        return math.fmod(a, b)
    if isinstance(e, Func):
        args = [_eval_expr(a, item, pos, size, env) for a in e.args]
        n = e.name
        if n == "position":
            return float(pos)
        if n == "last":
            return float(size)
        if n == "count":
            if not isinstance(args[0], list):
                raise XPathError("count() needs a node-set")
            return float(len(args[0]))
        if n == "not":
            return not _to_bool(args[0])
        if n == "contains":
            return _to_string(args[1]) in _to_string(args[0])
        if n == "starts-with":
            return _to_string(args[0]).startswith(_to_string(args[1]))
        if n == "string":
            return _to_string(args[0]) if args else _string_value(item)
        if n == "normalize-space":
            s = _to_string(args[0]) if args else _string_value(item)
            return " ".join(s.split())
        if n == "string-length":
            s = _to_string(args[0]) if args else _string_value(item)
            return float(len(s))
        if n == "concat":
            return "".join(_to_string(a) for a in args)
        if n in ("name", "local-name"):  # no namespaces in this DOM
            if args:
                if not isinstance(args[0], list):
                    raise XPathError(f"{n}() needs a node-set argument")
                if not args[0]:
                    return ""  # §4.1: empty node-set -> empty string
                t = args[0][0]
            else:
                t = item
            if isinstance(t, Node):
                return t.tag
            if isinstance(t, AttrItem):
                return t.name
            return ""
        if n == "substring":
            # XPath 1.0 4.2: 1-based, start/length pass through round()
            # (half toward +inf); chars kept where round(start) <= p <
            # round(start)+round(length); any NaN -> empty
            s = _to_string(args[0])
            start = _xpath_round(_to_number(args[1]))
            if math.isnan(start):
                return ""
            if len(args) == 3:
                ln = _xpath_round(_to_number(args[2]))
                if math.isnan(ln):
                    return ""
                end = start + ln
            else:
                end = math.inf
            return "".join(
                c for p, c in enumerate(s, start=1) if start <= p < end
            )
        if n == "substring-before":
            s, sub = _to_string(args[0]), _to_string(args[1])
            i = s.find(sub)
            return s[:i] if i >= 0 else ""
        if n == "substring-after":
            s, sub = _to_string(args[0]), _to_string(args[1])
            i = s.find(sub)
            return s[i + len(sub):] if i >= 0 else ""
        if n == "translate":
            s, frm, to = (_to_string(a) for a in args)
            table = {}
            for i, c in enumerate(frm):
                if ord(c) not in table:  # first occurrence wins per spec
                    table[ord(c)] = to[i] if i < len(to) else None
            return s.translate(table)
        if n == "number":
            return _to_number(args[0]) if args else _to_number(_string_value(item))
        if n == "sum":
            if not isinstance(args[0], list):
                raise XPathError("sum() needs a node-set")
            return float(sum(_to_number(_string_value(t)) for t in args[0]))
        if n == "boolean":
            return _to_bool(args[0])
        if n == "floor":
            # NaN and ±inf pass through (math.floor(inf) raises Overflow)
            v = _to_number(args[0])
            return v if math.isnan(v) or math.isinf(v) else float(math.floor(v))
        if n == "ceiling":
            v = _to_number(args[0])
            return v if math.isnan(v) or math.isinf(v) else float(math.ceil(v))
        if n == "round":
            return _xpath_round(_to_number(args[0]))
        if n == "id":
            # §4.1: node-set arg -> tokens from each node's STRING-VALUE;
            # other args -> string split on whitespace; result = the
            # elements those unique IDs name, doc order, deduped
            a = args[0]
            if isinstance(a, list):
                tokens = [tok for t in a for tok in _string_value(t).split()]
            else:
                tokens = _to_string(a).split()
            idmap = env.id_map()
            hits: dict[int, Node] = {}
            for tok in tokens:
                nd = idmap.get(tok)
                if nd is not None:
                    hits[id(nd)] = nd
            return sorted(hits.values(), key=env.sort_key)
        if n == "lang":
            # §4.3: the context node's language — nearest self-or-ancestor
            # xml:lang — equals the argument or is a sublanguage of it
            # ('-' suffix ignored), case-insensitive; no attribute -> false.
            # HTML adaptation (documented divergence from lxml, which reads
            # xml:lang only): the HTML ``lang`` attribute is accepted as a
            # fallback on each node, since real pages declare language there.
            want = _to_string(args[0]).lower()
            nd = item
            if isinstance(nd, AttrItem):
                nd = nd.owner
            elif isinstance(nd, TextItem):
                nd = nd.parent
            while nd is not None:
                v = nd.attrs.get("xml:lang") or nd.attrs.get("lang")
                if v:
                    have = v.lower()
                    return have == want or have.startswith(want + "-")
                nd = nd.parent
            return False
        if n == "true":
            return True
        return False  # false()
    # a path used as a value -> node-set relative to the context item
    if isinstance(e, (Path, Filter)):
        return _eval_pathexpr(e, [item], env)
    if isinstance(e, UnionExpr):
        return _eval_union(e, [item], env)
    raise XPathError(f"unhandled expression node {e!r}")


def _pred_true(pred, item, pos: int, size: int, env: _Env) -> bool:
    v = _eval_expr(pred, item, pos, size, env)
    if isinstance(v, float):  # bare number predicate: position()=N
        return float(pos) == v
    return _to_bool(v)


# --------------------------------------------------------------- public API
def xpath_compile(expr: str):
    """Parse ``expr`` once for reuse across many documents — pass the
    result anywhere a string expression is accepted.  Hot per-page stages
    must not re-tokenize constant expressions per document."""
    return _Parser(expr).parse()


def xpath_select(root: Node, expr, **variables):
    """Evaluate ``expr`` (a string, or an AST from :func:`xpath_compile`)
    against the document ``root`` (from cssselect.parse_dom).  Node-set
    results come back as a doc-ordered, deduplicated list of Node /
    TextItem / AttrItem; a top-level scalar expression (``count(//a)``)
    returns its Python value.  Keyword arguments bind XPath variables —
    the parsel surface ``sel.xpath("//a[@href=$u]", u=url)``: strings,
    booleans, and numbers (any numeric scalar, numpy included, coerces to
    XPath float).  Reserved names: a variable cannot be called ``root`` /
    ``expr`` (or ``html`` / ``expr`` / ``declared_encoding`` via
    xpath_extract) — the positional parameters shadow them, the same
    kwargs trap parsel's ``query``/``namespaces`` has."""
    ast = _Parser(expr).parse() if isinstance(expr, str) else expr
    env = _Env(root, variables)
    return _eval_expr(ast, root, 1, 1, env)


def xpath_extract_many(
    html: bytes | str | Node,
    exprs,
    declared_encoding: str | None = None,
) -> list[list[str]]:
    """``xpath_extract`` for several (optionally precompiled) expressions
    over ONE parsed document sharing ONE doc-order index (_Env) — the
    per-page multi-selector shape; building the index per expression
    would re-walk the DOM once per selector."""
    root = html if isinstance(html, Node) else parse_dom(html, declared_encoding)
    env = _Env(root)
    out = []
    for e in exprs:
        ast = _Parser(e).parse() if isinstance(e, str) else e
        res = _eval_expr(ast, root, 1, 1, env)
        out.append(
            [_to_string(res)]
            if not isinstance(res, list)
            else [_string_value(it) for it in res]
        )
    return out


def xpath_extract(
    html: bytes | str | Node,
    expr: str,
    declared_encoding: str | None = None,
    **variables,
) -> list[str]:
    """parsel-style ``response.xpath(expr).getall()`` over the subset:
    text nodes and attributes yield their value; elements yield their
    recursive text (parsel returns outer HTML — re-serialization is out of
    scope, same pragmatic divergence as css_extract); a scalar expression
    yields its XPath string() form as a single entry."""
    root = html if isinstance(html, Node) else parse_dom(html, declared_encoding)
    res = xpath_select(root, expr, **variables)
    if not isinstance(res, list):
        return [_to_string(res)]
    return [_string_value(it) for it in res]
