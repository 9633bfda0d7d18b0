"""Engine registry: per-forum-software parse branches.

Each engine module exposes:

- ``seed(base_url, next_index, probes) -> {"frontier": [rows], "items":
  [item dicts]}`` — initial frontier rows (and any items derivable from
  the detection probes' bodies, e.g. phpBB's board tree) after detection;
- ``parse(row, status, body, resp_url) -> (items, children)`` — pure
  per-page function (called inside ``mapInPandas`` Arrow batches; a "row"
  is a *page*, which fans out to many item/frontier rows).

The registry mirrors the reference's extractor modules
(forum_dl/extractors/__init__.py:12-24); engines are added as their
fixtures land (SURVEY.md §7 step 6).
"""

from __future__ import annotations

from . import (
    discourse,
    hackernews,
    hypermail,
    hyperkitty,
    invision,
    phpbb,
    pipermail,
    proboards,
    simplemachines,
    vbulletin,
    xenforo,
)

ENGINES = {
    "discourse": discourse,
    "phpbb": phpbb,
    "hackernews": hackernews,
    "hypermail": hypermail,
    "xenforo": xenforo,
    "simplemachines": simplemachines,
    "vbulletin": vbulletin,
    "invision": invision,
    "proboards": proboards,
    "pipermail": pipermail,
    "hyperkitty": hyperkitty,
}
