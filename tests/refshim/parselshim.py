"""Minimal parsel stand-in over the engine's stdlib DOM
(newscrawler_spark.functions.html_dom) with an XPath-subset evaluator.

The subset is exactly the grammar the reference crawlers use (full
inventory audited from /root/reference/news_crawler — every
``.xpath(...)`` call site):

  steps     //tag  /tag  .//tag  ./tag  ./*  //tag/*  text()  @attr
            .//@attr  ancestor::tag  preceding-sibling::tag
  preds     [@a='v']  [@a="v"]  [contains(@a, 'v')]  [N]
            [position()>N]  [relative-path-exists]   (chained, applied
            sequentially with per-step position semantics)
  top-level string()  string(.)  string(path)   and unions  a | b | c
            (document order, deduplicated — media ordering depends on
            this)

Semantics matched to parsel/lxml where the reference depends on them:
``//`` from a node-level Selector is ABSOLUTE (whole document);
``./text()`` returns the direct child text nodes; ``string()`` is the
concatenated descendant text; positional predicates are evaluated per
context node; union results come back in document order.
"""

from __future__ import annotations

import re

from newscrawler_spark.functions.html_dom import VOID_TAGS, Node, parse_html

__all__ = ["Selector", "SelectorList"]


# ---------------------------------------------------------------------------
# serialization (Selector.get() on element nodes)
# ---------------------------------------------------------------------------

def _serialize(n: Node) -> str:
    if n.tag == "#text":
        return n.text or ""
    if n.tag == "#document":
        return "".join(_serialize(c) for c in n.children)
    attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
    inner = "".join(_serialize(c) for c in n.children)
    if n.tag in VOID_TAGS and not n.children:
        return f"<{n.tag}{attrs}>"
    return f"<{n.tag}{attrs}>{inner}</{n.tag}>"


# ---------------------------------------------------------------------------
# xpath evaluation
# ---------------------------------------------------------------------------

def _split_top(q: str, sep: str) -> list[str]:
    """Split on `sep` at bracket/paren depth 0, outside quotes."""
    parts, cur, depth, quote = [], [], 0, None
    for ch in q:
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


def _split_steps(path: str) -> list[tuple[str, str]]:
    """-> [(axis, step)] where axis is 'child' or 'desc'; the leading
    axis marker must already be stripped by the caller (which passes the
    axis of the first step)."""
    steps: list[tuple[str, str]] = []
    cur, depth, quote = [], 0, None
    axis = "child"
    i = 0

    def flush(next_axis):
        nonlocal cur, axis
        if cur:
            steps.append((axis, "".join(cur)))
            cur = []
        axis = next_axis

    while i < len(path):
        ch = path[i]
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "[(":
            depth += 1
            cur.append(ch)
        elif ch in "])":
            depth -= 1
            cur.append(ch)
        elif ch == "/" and depth == 0:
            if i + 1 < len(path) and path[i + 1] == "/":
                flush("desc")
                i += 1
            else:
                flush("child")
        else:
            cur.append(ch)
        i += 1
    if cur:
        steps.append((axis, "".join(cur)))
    return steps


def _parse_step(step: str) -> tuple[str | None, str, list[str]]:
    """step string -> (axis_override, name, predicates)."""
    preds: list[str] = []
    # peel trailing [...] groups (depth-aware)
    while step.endswith("]"):
        depth, quote = 0, None
        start = None
        for j in range(len(step) - 1, -1, -1):
            ch = step[j]
            if quote:
                if ch == quote:
                    quote = None
                continue
            if ch in "'\"":
                quote = ch
            elif ch == "]":
                depth += 1
            elif ch == "[":
                depth -= 1
                if depth == 0:
                    start = j
                    break
        if start is None:
            break
        preds.insert(0, step[start + 1 : -1])
        step = step[:start]
    axis_override = None
    if "::" in step:
        axis_override, step = step.split("::", 1)
    return axis_override, step.strip(), preds


def _node_string(n: Node) -> str:
    return n.string()


def _axis_candidates(ctx: Node, axis: str, name: str):
    """Matches for one step from one context node, document order."""
    if name == "text()":
        if axis == "desc":
            return [n.text or "" for n in ctx.iter() if n.tag == "#text"]
        return [c.text or "" for c in ctx.children if c.tag == "#text"]
    if name.startswith("@"):
        attr = name[1:]
        if axis == "desc":
            return [
                n.attrs[attr]
                for n in ctx.iter()
                if n.tag not in ("#text",) and attr in n.attrs
            ]
        return [ctx.attrs[attr]] if attr in ctx.attrs else []
    if axis == "ancestor":
        out = []
        p = ctx.parent
        while p is not None:
            if p.tag == name or (name == "*" and p.tag not in ("#text", "#document")):
                out.append(p)
            p = p.parent
        out.reverse()  # document order
        return out
    if axis == "preceding-sibling":
        if ctx.parent is None:
            return []
        sibs = []
        for c in ctx.parent.children:
            if c is ctx:
                break
            if c.tag == name or (name == "*" and c.tag != "#text"):
                sibs.append(c)
        return sibs
    if axis == "desc":
        return [
            n
            for n in ctx.iter()
            if n is not ctx
            and (n.tag == name or (name == "*" and n.tag not in ("#text", "#document")))
        ]
    # child axis
    return [
        c
        for c in ctx.children
        if c.tag == name or (name == "*" and c.tag != "#text")
    ]


_POS_RE = re.compile(r"^position\(\)\s*(>=|<=|!=|=|>|<)\s*(\d+)$")
_ATTR_EQ_RE = re.compile(r"^@([\w.:-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$")
_CONTAINS_RE = re.compile(
    r"^contains\(\s*@([\w.:-]+)\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\s*\)$"
)


def _apply_preds(items: list, preds: list[str], doc: Node) -> list:
    for p in preds:
        p = p.strip()
        if re.fullmatch(r"\d+", p):
            i = int(p)
            items = [items[i - 1]] if len(items) >= i else []
            continue
        m = _POS_RE.match(p)
        if m:
            op, k = m.group(1), int(m.group(2))
            cmp = {
                ">": lambda pos: pos > k,
                "<": lambda pos: pos < k,
                ">=": lambda pos: pos >= k,
                "<=": lambda pos: pos <= k,
                "=": lambda pos: pos == k,
                "!=": lambda pos: pos != k,
            }[op]
            items = [x for i, x in enumerate(items, 1) if cmp(i)]
            continue
        m = _ATTR_EQ_RE.match(p)
        if m:
            attr, v = m.group(1), m.group(2) if m.group(2) is not None else m.group(3)
            items = [
                x for x in items if isinstance(x, Node) and x.attrs.get(attr) == v
            ]
            continue
        m = _CONTAINS_RE.match(p)
        if m:
            attr, v = m.group(1), m.group(2) if m.group(2) is not None else m.group(3)
            items = [
                x
                for x in items
                if isinstance(x, Node) and v in x.attrs.get(attr, "")
            ]
            continue
        m = re.fullmatch(r"@([\w.:-]+)", p)
        if m:
            attr = m.group(1)
            items = [x for x in items if isinstance(x, Node) and attr in x.attrs]
            continue
        # relative-path existence predicate (e.g. [.//img])
        items = [
            x
            for x in items
            if isinstance(x, Node) and _evaluate(p, x, doc)
        ]
    return items


def _doc_order_dedup(items: list, doc: Node) -> list:
    pos = {id(n): i for i, n in enumerate(doc.iter())}
    seen: set[int] = set()
    nodes = [x for x in items if isinstance(x, Node)]
    others = [x for x in items if not isinstance(x, Node)]
    out = []
    for n in sorted(nodes, key=lambda n: pos.get(id(n), 1 << 30)):
        if id(n) not in seen:
            seen.add(id(n))
            out.append(n)
    return out + others


def _evaluate(q: str, ctx: Node, doc: Node) -> list:
    q = q.strip()
    if q in ("string()", "string(.)"):
        return [_node_string(ctx)]
    if q.startswith("string(") and q.endswith(")"):
        inner = q[len("string(") : -1].strip()
        res = _evaluate(inner, ctx, doc) if inner not in ("", ".") else [ctx]
        if not res:
            return [""]
        first = res[0]
        return [_node_string(first) if isinstance(first, Node) else str(first)]

    parts = _split_top(q, "|")
    if len(parts) > 1:
        collected: list = []
        for part in parts:
            collected.extend(_evaluate(part, ctx, doc))
        return _doc_order_dedup(collected, doc)

    # leading axis
    if q.startswith("//"):
        contexts: list = [doc]
        rest, first_axis = q[2:], "desc"
    elif q.startswith(".//"):
        contexts, rest, first_axis = [ctx], q[3:], "desc"
    elif q.startswith("./"):
        contexts, rest, first_axis = [ctx], q[2:], "child"
    elif q == ".":
        return [ctx]
    elif q.startswith("/"):
        contexts, rest, first_axis = [doc], q[1:], "child"
    else:
        contexts, rest, first_axis = [ctx], q, "child"

    steps = _split_steps(rest)
    if steps:
        steps[0] = (first_axis, steps[0][1])

    for axis, raw in steps:
        axis_override, name, preds = _parse_step(raw)
        eff_axis = axis_override or axis
        nxt: list = []
        for c in contexts:
            if not isinstance(c, Node):
                continue
            cand = _axis_candidates(c, eff_axis, name)
            cand = _apply_preds(cand, preds, doc)
            nxt.extend(cand)
        contexts = nxt
    return contexts


# ---------------------------------------------------------------------------
# parsel API surface
# ---------------------------------------------------------------------------

class Selector:
    def __init__(self, text: str | None = None, _node: Node | None = None,
                 _doc: Node | None = None, _str: str | None = None, **kw):
        if text is not None:
            self._node = parse_html(text)
            self._doc = self._node
        else:
            self._node = _node
            self._doc = _doc if _doc is not None else _node
        self._str = _str

    @property
    def root(self):
        """lxml-element stand-in: our Node already has .tag/.attrs."""
        return self._node

    @property
    def attrib(self) -> dict:
        return dict(self._node.attrs) if self._node is not None else {}

    def xpath(self, query: str, **kw) -> "SelectorList":
        if self._node is None:
            return SelectorList()
        items = _evaluate(query, self._node, self._doc)
        return SelectorList(
            Selector(_node=x, _doc=self._doc) if isinstance(x, Node)
            else Selector(_str=str(x), _doc=self._doc)
            for x in items
        )

    def css(self, query: str):  # pragma: no cover — unused by the reference
        raise NotImplementedError("css selectors not supported by the shim")

    def get(self, default=None):
        if self._str is not None:
            return self._str
        if self._node is not None:
            return _serialize(self._node)
        return default

    extract_first = get

    def getall(self) -> list[str]:
        return [self.get()]

    def __repr__(self) -> str:  # pragma: no cover
        return f"<ShimSelector {self._str if self._str is not None else getattr(self._node, 'tag', None)!r}>"


class SelectorList(list):
    def xpath(self, query: str, **kw) -> "SelectorList":
        out = SelectorList()
        for sel in self:
            out.extend(sel.xpath(query, **kw))
        return out

    def get(self, default=None):
        return self[0].get() if self else default

    extract_first = get

    def getall(self) -> list[str]:
        return [sel.get() for sel in self]

    extract = getall
