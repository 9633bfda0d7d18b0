"""Multimodal column plumbing — binary payloads with typed metadata.

Image/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct, exactly as a 100 TB training-data pipeline would: the
Spark-side plumbing (schema, batched Arrow transfer, ``mapInPandas``
signature, partitioning) is real and tested; the actual codec step is
STUBBED behind ``decode_image`` (the image/audio libraries are not in this
container) with a deterministic fake so results are verifiable.

The synthetic payloads derive from ``md5`` so the pipeline is pure:
``payload(vec_id) = md5(vec_id) * N`` bytes tagged ``image/png``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("byte_mean_e4", LongType(), False),
        StructField("phash", StringType(), False),
        StructField("thumb_w", LongType(), False),
        StructField("thumb_h", LongType(), False),
    ]
)


def decode_image(payload: bytes) -> "object":
    """REAL decode would go through PIL/libvips here — not available in this
    container. Raises so callers must opt into the deterministic fake."""
    raise NotImplementedError("image codecs not available in this container")


def synth_media(spark: SparkSession, sf_dir: str, n_rows: int = 200) -> DataFrame:
    """Deterministic fake media table (binary payload per id)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                h = hashlib.md5(f"media:{int(mid)}".encode()).digest()
                payload = (h * (16 + int(mid) % 16))[: 256 + int(mid) % 256]
                rows.append(
                    {
                        "media_id": int(mid),
                        "content_type": "image/png" if mid % 3 else "image/jpeg",
                        "payload": payload,
                        "width": 64 + int(mid) % 64,
                        "height": 48 + int(mid) % 48,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n_rows).repartition(4).mapInPandas(gen, MEDIA_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: mapInPandas over binary payloads.

    Uses the deterministic fake featureizer — the Arrow batch shape and
    UDF signature are exactly what a real decoder would use. Every output
    is chosen to be INTEGER-EXACT or hash-exact so a DuckDB closed-form
    oracle can replay it over the md5-derived payload spec: byte_sum /
    byte_mean_e4 (= 10000*sum // n, integer floor — no FP rounding-tie
    nondeterminism between engines) and phash = md5 of the payload's HEX
    encoding (DuckDB 1.0 has no md5(BLOB) / blob substring, and the hex
    string of the repeated-digest payload is closed-form in SQL).
    """
    media = synth_media(spark, sf_dir)

    def featurize(batches):
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # numpy view over each buffer — no per-byte Python loop
            sums = [
                int(np.frombuffer(p, dtype=np.uint8).sum()) if len(p) else 0
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content_type": pdf["content_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "byte_mean_e4": pd.Series(
                        [
                            (10000 * s) // n if n else 0
                            for s, n in zip(sums, n_bytes)
                        ],
                        dtype="int64",
                    ),
                    "phash": [
                        hashlib.md5(bytes(p).hex().encode()).hexdigest()[:16]
                        for p in payloads
                    ],
                    "thumb_w": np.minimum(pdf["width"], 32).astype("int64"),
                    "thumb_h": np.minimum(pdf["height"], 32).astype("int64"),
                },
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    return media.mapInPandas(featurize, FEATURES_SCHEMA)


# --- frame sampling ------------------------------------------------------------
#
# The video/audio counterpart of media_features: treat each binary payload
# as a fixed-frame-size container (FRAME_BYTES bytes/frame) and emit every
# FRAME_EVERY-th frame as its own row — the standard decode-and-subsample
# step of a multimodal training pipeline (e.g. 1 fps video sampling). The
# row-EXPANDING mapInPandas shape is the part worth pinning: one input
# media row fans out to n_frames/FRAME_EVERY output rows inside the same
# Arrow batch, no shuffle, no join — at 100 TB the frame table inherits the
# media table's partitioning and never exchanges. The real codec boundary
# stays stubbed (decode_image); frame slicing + checksums are deterministic
# over the md5-derived payload spec, so the DuckDB oracle replays them
# closed-form on the hex string.

FRAME_BYTES = 32
FRAME_EVERY = 3

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("frame_off", LongType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ``FRAME_EVERY``-th fixed-size frame of each media payload,
    with its byte offset and a content checksum — one row per sampled
    frame, produced row-expanding inside the Arrow batch."""
    media = synth_media(spark, sf_dir)

    def sample(batches):
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "n_frames": [],
                "frame_off": [],
                "frame_md5": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                nf = len(b) // FRAME_BYTES
                for i in range(0, nf, FRAME_EVERY):
                    off = i * FRAME_BYTES
                    frame = b[off : off + FRAME_BYTES]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["n_frames"].append(nf)
                    out["frame_off"].append(off)
                    out["frame_md5"].append(
                        hashlib.md5(frame.hex().encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out).astype(
                {
                    "media_id": "int64",
                    "frame_idx": "int64",
                    "n_frames": "int64",
                    "frame_off": "int64",
                }
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)


MEDIA_FRAME_SAMPLE_SQL = f"""
WITH m AS (
  SELECT id AS media_id,
         md5('media:' || id) AS hexd,
         16 + id % 16 AS reps,
         256 + id % 256 AS cap
  FROM range(0, 200) t(id)
),
b AS (
  SELECT media_id,
         LEAST(16 * reps, cap) AS n_bytes,
         substring(repeat(hexd, reps), 1, 2 * LEAST(16 * reps, cap)) AS hexstr
  FROM m
),
f AS (
  SELECT media_id, n_bytes // {FRAME_BYTES} AS n_frames, hexstr FROM b
)
SELECT media_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(i * {FRAME_BYTES} AS BIGINT) AS frame_off,
       substring(md5(substring(hexstr, 1 + {2 * FRAME_BYTES} * i,
                               {2 * FRAME_BYTES})), 1, 16) AS frame_md5
FROM f, LATERAL (
  SELECT unnest(generate_series(0, n_frames - 1, {FRAME_EVERY})) AS i
) g
"""


# --- resize --------------------------------------------------------------------
#
# The remaining stage of the charter's multimodal list (decode /
# feature-extract / RESIZE / frame-sample): nearest-neighbor downsample to a
# fixed thumbnail. The codec boundary stays stubbed (decode_image), so the
# "image" is the VIRTUAL raster over the payload — pixel(x, y) =
# payload[(y*width + x) mod n_bytes] — which exercises exactly the real
# kernel's shape: a per-row numpy gather indexed by the integer
# nearest-neighbor map src = ((dst * src_dim) // DST_DIM), vectorized over
# the Arrow batch, output = resized buffer + checksum. Map-only: the
# thumbnail table inherits the media partitioning, nothing shuffles.
# Integer-exact + hex-md5 outputs keep the DuckDB oracle closed-form.

RESIZE_W = 16
RESIZE_H = 12

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_w", LongType(), False),
        StructField("src_h", LongType(), False),
        StructField("dst_w", LongType(), False),
        StructField("dst_h", LongType(), False),
        StructField("resized_sum", LongType(), False),
        StructField("resized_md5", StringType(), False),
    ]
)


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor thumbnail of every media payload's virtual raster:
    one numpy gather per row (no per-pixel Python), emitting the resized
    buffer's byte sum and checksum."""
    media = synth_media(spark, sf_dir)

    def resize(batches):
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA.fields}
            ys = np.arange(RESIZE_H)
            xs = np.arange(RESIZE_W)
            for mid, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                sy = (ys * int(h)) // RESIZE_H
                sx = (xs * int(w)) // RESIZE_W
                idx = (sy[:, None] * int(w) + sx[None, :]) % len(buf)
                resized = buf[idx].ravel()
                out["media_id"].append(int(mid))
                out["src_w"].append(int(w))
                out["src_h"].append(int(h))
                out["dst_w"].append(RESIZE_W)
                out["dst_h"].append(RESIZE_H)
                out["resized_sum"].append(int(resized.sum()))
                out["resized_md5"].append(
                    hashlib.md5(resized.tobytes().hex().encode()).hexdigest()[:16]
                )
            yield pd.DataFrame(out).astype(
                {k: "int64" for k in (
                    "media_id", "src_w", "src_h", "dst_w", "dst_h", "resized_sum"
                )}
            )

    return media.mapInPandas(resize, RESIZE_SCHEMA)


MEDIA_RESIZE_SQL = f"""
WITH m AS (
  SELECT id AS media_id,
         md5('media:' || id) AS hexd,
         16 + id % 16 AS reps,
         256 + id % 256 AS cap,
         64 + id % 64 AS w,
         48 + id % 48 AS h
  FROM range(0, 200) t(id)
),
b AS (
  SELECT media_id, w, h,
         LEAST(16 * reps, cap) AS n_bytes,
         substring(repeat(hexd, reps), 1, 2 * LEAST(16 * reps, cap)) AS hexstr
  FROM m
),
px AS (
  SELECT media_id, w, h, y, x,
         substring(hexstr,
                   1 + 2 * ((((y * h) // {RESIZE_H}) * w
                             + ((x * w) // {RESIZE_W})) % n_bytes),
                   2) AS hexpair
  FROM b,
       LATERAL (SELECT unnest(generate_series(0, {RESIZE_H} - 1)) AS y) gy,
       LATERAL (SELECT unnest(generate_series(0, {RESIZE_W} - 1)) AS x) gx
)
SELECT media_id,
       CAST(w AS BIGINT) AS src_w,
       CAST(h AS BIGINT) AS src_h,
       CAST({RESIZE_W} AS BIGINT) AS dst_w,
       CAST({RESIZE_H} AS BIGINT) AS dst_h,
       CAST(sum(CAST(concat('0x', hexpair) AS INT)) AS BIGINT) AS resized_sum,
       substring(md5(string_agg(hexpair, '' ORDER BY y, x)), 1, 16)
         AS resized_md5
FROM px GROUP BY media_id, w, h
"""


def crawl_discourse_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny end-to-end crawl returning the interleaved-spans documents table
    (the north-rule payload) — registered rows-only (no SQL oracle: the
    crawl is iterative/stateful, not SQL-expressible). The producing crawl
    is session-memoized and shared with crawl_corpus_quality /
    pagerank_crawl (operators/_fixture.py)."""
    from ._fixture import fixture_discourse_crawl

    res = fixture_discourse_crawl(spark)
    docs = res.documents()
    return docs.select(
        "doc_id",
        F.expr("size(spans)").alias("n_spans"),
        F.expr("size(filter(spans, s -> s.kind = 'media'))").alias("n_media"),
        F.expr("concat_ws('|', transform(spans, s -> s.kind))").alias("kind_seq"),
    )


def crawl_phpbb_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny phpBB crawl returning the completed file items — exercises the
    HtmlExtractor file pipeline (stub emission + dedup'd downloads + body
    join) through the driver gate. Rows-only (iterative crawl)."""
    import tempfile

    from ..crawl import CrawlConfig, run_crawl
    from ..fixtures.phpbb import SyntheticPhpbb

    srv = SyntheticPhpbb(seed=11, n_cats=1, n_subs=1, n_topics=2, max_posts=3)
    wd = tempfile.mkdtemp(prefix="crawl_phpbb_")
    res = run_crawl(spark, srv, "https://phpbb.example/", wd, CrawlConfig())
    return res.items().filter(F.col("type") == "file").select(
        "url",
        "content_type",
        F.length(F.col("content_bytes")).alias("n_bytes"),
        F.array_join(F.col("subpath"), "|").alias("subpath_key"),
    )


# --- perceptual-hash near-duplicate detection --------------------------------
#
# The image analogue of MinHash-LSH dedup: band the 64-bit phash into 4
# 16-bit bands, bucket-join on band equality (any shared band -> candidate
# pair), then verify exact Hamming distance <= HAM_T with bit_count(xor) on
# the candidates only. Random md5 phashes sit at expected Hamming 32, so
# nothing random survives the verify; the FIXTURE plants 8 near-copies
# (2 bits flipped in band 0) so the result is non-vacuous — the planting
# lives in the fixture layer (_phash_table), not the operator, per the
# stream_dedup_exact lesson (round-3 ADVICE #4).
#
# Scale shape: the band table is 4 rows/media hash-partitioned by
# (band, value) — the same bucket-bounded candidate generation as
# dedup_minhash_lsh (dedup.py:187) — and the Hamming verify touches
# candidate pairs only, joined back to the 4-band vectors (bigint ops,
# whole-stage codegen). At 100 TB a hot bucket (constant-color thumbnails)
# gets the same df-cap treatment as winnowing's stop-fingerprints.

N_MEDIA = 200        # matches synth_media/media_features
_PLANT_N = 8         # planted near-copies: ids 200..207 copy id*25's phash
_PLANT_STRIDE = 25   # with 2 bits flipped in band 0
HAM_T = 8


def _phash_expr(id_col: str) -> str:
    """Closed-form 64-bit phash from the synth_media payload spec:
    phash = md5(hex(payload))[:16], hex(payload) = repeat(md5hex, reps)
    truncated to 2*n_bytes chars (multimodal.py:61-80)."""
    return (
        f"substring(md5(substring(repeat(md5(concat('media:', cast({id_col} as string))), "
        f"cast(16 + {id_col} % 16 as int)), 1, "
        f"cast(2 * least(16 * (16 + {id_col} % 16), 256 + {id_col} % 256) as int))), 1, 16)"
    )


def _phash_table(spark: SparkSession) -> DataFrame:
    """FIXTURE: (media_id, b0..b3) 16-bit phash bands for the 200 synthetic
    media plus 8 planted near-copies (band 0 xor 3 — Hamming distance 2)."""
    band = lambda b: (
        f"cast(conv(substring(ph, {4 * b + 1}, 4), 16, 10) as bigint)"
    )
    base = spark.range(N_MEDIA).select(
        F.col("id").alias("media_id"), F.expr(_phash_expr("id")).alias("ph")
    ).select(
        "media_id", *[F.expr(band(b)).alias(f"b{b}") for b in range(4)]
    )
    planted = spark.range(_PLANT_N).select(
        (F.col("id") + N_MEDIA).alias("media_id"),
        F.expr(_phash_expr(f"(id * {_PLANT_STRIDE})")).alias("ph"),
    ).select(
        "media_id",
        F.expr(f"cast(({band(0)}) ^ 3 as bigint)").alias("b0"),
        *[F.expr(band(b)).alias(f"b{b}") for b in range(1, 4)],
    )
    return base.unionByName(planted)


def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ph = _phash_table(spark)
    bands = ph.select(
        "media_id",
        F.explode(
            F.expr("array(struct(0 as b, b0 as v), struct(1 as b, b1 as v), "
                   "struct(2 as b, b2 as v), struct(3 as b, b3 as v))")
        ).alias("s"),
    ).select("media_id", F.col("s.b").alias("b"), F.col("s.v").alias("v"))
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["b", "v"])
        .filter(F.col("x.media_id") < F.col("y.media_id"))
        .select(
            F.col("x.media_id").alias("media_a"),
            F.col("y.media_id").alias("media_b"),
        )
        .distinct()
    )
    a = ph.select(*[F.col(c).alias(f"{c}_a") for c in ph.columns])
    b = ph.select(*[F.col(c).alias(f"{c}_b") for c in ph.columns])
    ham = (
        "cast(bit_count(b0_a ^ b0_b) + bit_count(b1_a ^ b1_b) + "
        "bit_count(b2_a ^ b2_b) + bit_count(b3_a ^ b3_b) as bigint)"
    )
    return (
        cand.join(a, cand.media_a == a.media_id_a)
        .join(b, cand.media_b == b.media_id_b)
        .select("media_a", "media_b", F.expr(ham).alias("hamming"))
        .filter(F.col("hamming") <= HAM_T)
    )


_PH_DUCK = (
    "substring(md5(substring(repeat(md5('media:' || {id}), 16 + {id} % 16), "
    "1, 2 * least(16 * (16 + {id} % 16), 256 + {id} % 256))), 1, 16)"
)
_BAND_DUCK = "CAST(concat('0x', substring(ph, {o}, 4)) AS BIGINT)"

MEDIA_PHASH_NEARDUP_SQL = rf"""
WITH base AS (
  SELECT id AS media_id, {_PH_DUCK.format(id="id")} AS ph
  FROM range(0, {N_MEDIA}) t(id)
),
base_b AS (
  SELECT media_id,
         {_BAND_DUCK.format(o=1)} AS b0, {_BAND_DUCK.format(o=5)} AS b1,
         {_BAND_DUCK.format(o=9)} AS b2, {_BAND_DUCK.format(o=13)} AS b3
  FROM base
),
planted AS (
  SELECT id + {N_MEDIA} AS media_id,
         {_PH_DUCK.format(id=f"(id * {_PLANT_STRIDE})")} AS ph
  FROM range(0, {_PLANT_N}) t(id)
),
planted_b AS (
  SELECT media_id,
         xor({_BAND_DUCK.format(o=1)}, 3) AS b0, {_BAND_DUCK.format(o=5)} AS b1,
         {_BAND_DUCK.format(o=9)} AS b2, {_BAND_DUCK.format(o=13)} AS b3
  FROM planted
),
ph AS (SELECT * FROM base_b UNION ALL SELECT * FROM planted_b),
bands AS (
  SELECT media_id, b, v FROM (
    SELECT media_id, unnest([
      struct_pack(b := 0, v := b0), struct_pack(b := 1, v := b1),
      struct_pack(b := 2, v := b2), struct_pack(b := 3, v := b3)]) AS s
    FROM ph
  ) q(media_id, s), LATERAL (SELECT s.b AS b, s.v AS v) l
),
cand AS (
  SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
  FROM bands x JOIN bands y USING (b, v)
  WHERE x.media_id < y.media_id
)
SELECT media_a, media_b,
       CAST(bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
          + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
         AS BIGINT) AS hamming
FROM cand
JOIN ph pa ON cand.media_a = pa.media_id
JOIN ph pb ON cand.media_b = pb.media_id
WHERE bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
    + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3)) <= {HAM_T}
"""


# --- near-dup media clustering -----------------------------------------------


def media_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup media CLUSTERS: the multimodal counterpart of the text
    side's ``dedup_clusters`` — phash LSH pairs (``media_phash_neardup``)
    closed under connected components, each edge-incident medium labeled
    with its component min id and the component size. This is the unit a
    dedup EMIT keeps one survivor from (min-id convention shared with
    every text dedup operator).

    Scale shape: reuses ``pipeline.connected_components`` (pointer-jumping
    CC, O(log n) label-only rounds, edge relation localCheckpointed once);
    the node universe is EDGE-INCIDENT media only — near-dup graphs at
    corpus scale are overwhelmingly singletons, and materializing a
    self-labeled row per singleton medium would dwarf the interesting
    output. cluster_size rides one cluster_id-keyed window over the label
    table (|nodes| rows, not |media|)."""
    from pyspark.sql import Window

    from .pipeline import connected_components

    pairs = media_phash_neardup(spark, sf_dir).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    labels, _rounds = connected_components(pairs, nodes)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("doc_id").alias("media_id"),
        "cluster_id",
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
    )


MEDIA_DEDUP_CLUSTERS_SQL = rf"""
WITH RECURSIVE pairs AS (
  SELECT media_a, media_b FROM ({MEDIA_PHASH_NEARDUP_SQL}) q
),
sym AS (
  SELECT media_a AS src, media_b AS dst FROM pairs
  UNION
  SELECT media_b AS src, media_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS media_id FROM sym),
reach(src, dst) AS (
  SELECT media_id, media_id FROM nodes
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
lab AS (SELECT src AS media_id, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT media_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lab
"""


QUERIES = {
    "media_features": media_features,
    "media_frame_sample": media_frame_sample,
    "media_resize": media_resize,
    "media_phash_neardup": media_phash_neardup,
    "media_dedup_clusters": media_dedup_clusters,
    "crawl_discourse_spans": crawl_discourse_spans,
    "crawl_phpbb_files": crawl_phpbb_files,
}

# media_features IS oracle-able: the fake featurizer is a closed form over
# md5('media:'||id), so DuckDB replays payload construction symbolically —
# hex(payload) = (hexdigest * reps)[:2*n_bytes] and per-byte stats come from
# the 16 digest bytes (full repeats + remainder prefix). The two crawl
# smokes stay rows-only (iterative stateful crawl, not SQL-expressible).
ORACLES: dict[str, str] = {
    "media_resize": MEDIA_RESIZE_SQL,
    "media_phash_neardup": MEDIA_PHASH_NEARDUP_SQL,
    "media_dedup_clusters": MEDIA_DEDUP_CLUSTERS_SQL,
    "media_frame_sample": MEDIA_FRAME_SAMPLE_SQL,
    "media_features": """
WITH m AS (
  SELECT id AS media_id,
         CASE WHEN id % 3 <> 0 THEN 'image/png' ELSE 'image/jpeg' END
           AS content_type,
         md5('media:' || id) AS hexd,
         16 + id % 16 AS reps,
         256 + id % 256 AS cap,
         64 + id % 64 AS width,
         48 + id % 48 AS height
  FROM range(0, 200) t(id)
),
b AS (
  SELECT *,
         LEAST(16 * reps, cap) AS n_bytes,
         list_transform(range(0, 16),
           i -> CAST(concat('0x', substring(hexd, 2 * i + 1, 2)) AS BIGINT))
           AS bytes16
  FROM m
),
s AS (
  SELECT *,
         CAST((n_bytes // 16) * list_sum(bytes16)
              + COALESCE(list_sum(bytes16[1:(n_bytes % 16)]), 0) AS BIGINT)
           AS byte_sum
  FROM b
)
SELECT media_id,
       content_type,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       byte_sum,
       CAST((10000 * byte_sum) // n_bytes AS BIGINT) AS byte_mean_e4,
       substring(md5(substring(repeat(hexd, reps), 1, 2 * n_bytes)), 1, 16)
         AS phash,
       CAST(LEAST(width, 32) AS BIGINT) AS thumb_w,
       CAST(LEAST(height, 32) AS BIGINT) AS thumb_h
FROM s
""",
}
