"""Deterministic crawl-order keys.

``ord`` is a string of fixed-width 8-hex-char segments, one per tree level:
``child(parent, i) = parent + f"{i:08x}"``. Plain string comparison of these
keys is exactly pre-order DFS over the discovery tree, which is exactly the
reference's sequential fetch/emission order (generators recurse depth-first:
forum_dl/writers/common.py:100-129). Keys are assigned at *parse time* from
the parent's key plus the child's document-order index — never from physical
row order — so the ordering is reproducible under any parallelism.

Capacity: 8 hex chars = 2^32 children per node; depth is crawl-tree depth
(~10), so keys stay < 100 bytes even at 10^10-URL scale.
"""

from __future__ import annotations


def child(parent_ord: str, index: int) -> str:
    return f"{parent_ord}{index:08x}"


def root(index: int) -> str:
    return f"{index:08x}"
