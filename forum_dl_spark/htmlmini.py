"""Minimal stdlib HTML DOM for the engine's parse stages.

The reference wraps BeautifulSoup in a strict Soup API
(forum_dl/soup.py:12-204); this container has no bs4/lxml, so the engine
(and the oracle simulator) share this ~150-line tree parser instead. It
supports exactly the query surface the reference's extractors use: find /
find_all by tag + class / attr filters, descendant search in document
order, string content, and inner HTML. In production this would swap for
selectolax/lxml behind the same interface.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = {
    "img", "br", "hr", "link", "meta", "input", "source", "embed", "area",
    "base", "col", "track", "wbr",
}


class Comment(str):
    """An HTML comment's text (pipermail threads are driven by comment
    markers, forum_dl/extractors/pipermail.py:58-59,236-316)."""


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None) -> None:
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[object] = []  # Node | str
        self.parent = parent

    # -- queries ------------------------------------------------------------
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def iter(self):
        """All descendant Nodes in document order."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter()

    def walk(self):
        """All descendants (Nodes, text, Comments) in document order."""
        for c in self.children:
            yield c
            if isinstance(c, Node):
                yield from c.walk()

    def _match(self, tag: str | None, class_: str | None, attrs: dict | None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if class_ is not None and class_ not in self.classes():
            return False
        if attrs:
            for k, v in attrs.items():
                av = self.attrs.get(k)
                if av is None:
                    return False
                if v is not True and av != v:
                    return False
        return True

    def find_all(self, tag: str | None = None, class_: str | None = None,
                 attrs: dict | None = None) -> list["Node"]:
        return [n for n in self.iter() if n._match(tag, class_, attrs)]

    def find(self, tag: str | None = None, class_: str | None = None,
             attrs: dict | None = None) -> "Node | None":
        for n in self.iter():
            if n._match(tag, class_, attrs):
                return n
        return None

    def get(self, name: str) -> str | None:
        return self.attrs.get(name)

    def string(self) -> str:
        """Concatenated text content, stripped."""
        out: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, Node):
                    walk(c)
                else:
                    out.append(c)

        walk(self)
        return "".join(out).strip()

    def inner_html(self) -> str:
        return "".join(_render(c) for c in self.children)


def _render(c: object) -> str:
    if isinstance(c, Comment):
        return f"<!--{c}-->"
    if isinstance(c, str):
        return c
    assert isinstance(c, Node)
    attr_s = "".join(f' {k}="{v}"' for k, v in c.attrs.items())
    if c.tag in _VOID:
        return f"<{c.tag}{attr_s}>"
    return f"<{c.tag}{attr_s}>{c.inner_html()}</{c.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                    self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                    self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)

    def handle_comment(self, data: str) -> None:
        self.stack[-1].children.append(Comment(data))


def parse_html(html: str) -> Node:
    tb = _TreeBuilder()
    tb.feed(html or "")
    tb.close()
    return tb.root
