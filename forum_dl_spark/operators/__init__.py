"""Analytics / training-data-pipeline operators.

Each operator is a ``(spark, sf_dir) -> DataFrame`` callable plus (where
SQL-expressible) a DuckDB oracle SQL string with IDENTICAL column names and
semantics — the driver's correctness gate (CORRECTNESS_r{N}.json).

Modules:
- relational:  joins/aggregations/windows over the TPC-H-ish tables
- dedup:       exact, n-gram Jaccard, MinHash+LSH, SimHash
- textops:     lang-ID, quality scoring, token counts, fingerprints, spans
- similarity:  brute-force cosine top-k + LSH-bucketed ANN
- multimodal:  binary-column plumbing with stubbed decode
- pipeline:    dup-cluster connected components + stratified sampling
- streamq:     drained Structured-Streaming wrappers (stream==batch oracle)
- corpus:      crawl→pipeline bridge (interleaved spans → flat documents)
- ir:          BM25 / tf-idf keywords / perplexity buckets / winnowing
- graph:       link-graph analytics (integer-exact iterative PageRank)
- textstats:   chunking, cardinality sketch, PMI, Zipf histogram, fertility
- mixing:      temperature mixture weights + token-budgeted source draw
- audits:      index/batching/versioning/leakage dataset-engineering audits
"""

from . import (audits, corpus, dedup, graph, ir, mixing, multimodal,
               pipeline, relational, similarity, streamq, textops, textstats)

_MODULES = [relational, dedup, textops, similarity, multimodal, pipeline,
            streamq, corpus, ir, graph, textstats, mixing, audits]


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
