"""Deterministic synthetic forum fixtures (FIXTURES.md §4).

Each fixture is a pure function ``(url, params, attempt) -> (status_code,
content_type, body_bytes)`` of its config — no network, no mutable state —
so the same object can be shipped to every Spark executor and to the
sequential oracle simulator and serve byte-identical pages.
"""

from .discourse import SyntheticDiscourse

__all__ = ["SyntheticDiscourse"]
