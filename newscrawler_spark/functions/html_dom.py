"""Tiny DOM built on stdlib ``html.parser`` — the container has no
lxml/parsel, and the extraction dialects need recursive-descent walks with
sibling counting (list numbering) and attribute access.

This is a minimal tree good enough for the reference dialects' needs:
tag, attrs, children, text nodes, parent, plus the handful of query
helpers the dialects use (descendants by tag, string() text collection,
class matching).  Void elements are handled; mismatched close tags are
tolerated by popping to the nearest matching open tag (browsers' behavior
approximated — the synthetic + fixture HTML is well-formed anyway).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None, text: str | None = None):
        self.tag = tag            # '#text' for text nodes
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text

    # -- construction -------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    # -- queries -------------------------------------------------------------
    def get(self, attr: str, default: str = "") -> str:
        return self.attrs.get(attr, default)

    def classes(self) -> set[str]:
        return set(self.get("class", "").split())

    def iter(self):
        """Depth-first descendants including self (document order)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def find_all(self, tag: str, cls: str | None = None) -> list["Node"]:
        out = []
        for n in self.iter():
            if n.tag == tag and (cls is None or cls in n.classes()):
                out.append(n)
        return out

    def find(self, tag: str, cls: str | None = None) -> "Node | None":
        for n in self.iter():
            if n.tag == tag and (cls is None or cls in n.classes()):
                return n
        return None

    def find_by_id(self, el_id: str) -> "Node | None":
        for n in self.iter():
            if n.attrs.get("id") == el_id:
                return n
        return None

    def string(self) -> str:
        """XPath string() equivalent — all descendant text concatenated."""
        parts = []
        for n in self.iter():
            if n.tag == "#text" and n.text:
                parts.append(n.text)
        return "".join(parts)

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if c.tag != "#text"]


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # pop to nearest matching open tag (tolerate mismatches)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node("#text", text=data))


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html or "")
    return builder.root
