"""forum_dl_spark — a PySpark-native batch-iterative forum crawler engine.

A from-scratch reimplementation of the *capabilities* of mikwielgus/forum-dl
(reference at /root/reference, cited by file:line throughout) as an idiomatic
Spark DataFrame engine:

- URL frontier + fetch scheduler as BSP supersteps (driver loop over
  DataFrames), not a generator pipeline.
- URL-seen semantics (reference: forum_dl/session.py:105-148) as a
  partitioned seen table + anti-join, with an optional bloom prefilter.
- All page parsing in Arrow-batched ``mapInPandas`` stages (no per-row
  Python UDFs in the hot path).
- Interleaved text+media span extraction (reference:
  forum_dl/extractors/common.py:480-569) into a ``documents`` table of
  ``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``.
- Deterministic crawl-order keys (``ord``) assigned from parent order at
  parse time, so that sorting any output by ``ord`` reproduces the
  reference's sequential crawl/emission order exactly.
"""

__version__ = "0.1.0"
