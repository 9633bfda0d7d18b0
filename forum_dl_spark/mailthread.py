"""Threaded-mail kernels shared by the engine and the oracle simulator.

- ``replay_subpaths``: the reference's indentation→reply-chain stack replay
  (forum_dl/extractors/hypermail.py:182-201), reproduced EXACTLY including
  its slice arithmetic (``subpath[-(prev-cur-1):] = [post_id]``) — the
  semantics are whatever that code computes;
- ``address_content``: post body = the HTML of everything after the first
  sibling following the ``<address>`` element
  (hypermail.py:218-228: ``islice(address.next_siblings, 1, None)``);
- ``anchor_depth``: nesting depth from ancestor count, as the reference
  derives it from BeautifulSoup ``parents`` (hypermail.py:174,186-187).
"""

from __future__ import annotations

from .htmlmini import Node, _render


def anchor_depth(node: Node) -> int:
    n = 0
    cur = node.parent
    while cur is not None:
        n += 1
        cur = cur.parent
    return n


def replay_subpaths(entries: list[tuple[int, str]]) -> list[tuple[str, ...]]:
    """[(depth, post_id)] → subpath per entry, reference algorithm verbatim
    (hypermail.py:182-201)."""
    out: list[tuple[str, ...]] = []
    prev_depth = 0
    subpath: list[str] = []
    for cur_depth, post_id in entries:
        if cur_depth > prev_depth:
            subpath.append(post_id)
        else:
            subpath[-(prev_depth - cur_depth - 1):] = [post_id]
        out.append(tuple(subpath))
        prev_depth = cur_depth
    return out


def address_content(doc: Node) -> str:
    """Serialize the siblings after <address>, skipping the first one."""
    addr = doc.find("address")
    if addr is None or addr.parent is None:
        return ""
    sibs = addr.parent.children
    idx = sibs.index(addr)
    after = sibs[idx + 1:]
    return "".join(_render(s) for s in after[1:])
