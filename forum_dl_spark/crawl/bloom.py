"""Partitioned bloom prefilter for the URL-seen anti-join.

The seen set is the crawl's hottest relation: every candidate URL must be
checked against it (forum_dl/session.py:105-148 semantics). The exact
anti-join is a shuffle over all candidates; the bloom sketch cuts that
shuffle input: candidates that the sketch definitely hasn't seen skip the
exact join entirely (no false negatives — bloom guarantees), and only the
"maybe seen" residue (|seen-hits| + FP rate × |new|) is joined exactly.

Layout: one bloom per ``shard = pmod(xxhash64(seen_key), K)`` — built
per-shard with ``applyInPandas`` over the JVM-computed xxhash64 column
(no per-row Python hashing), collected as checkpoint artifacts and
broadcast back for the probe side. Double hashing (Kirsch-Mitzenmacher)
derives k probe positions from the one 64-bit hash.

At 10^10 URLs: 10 bits/key ≈ 12.5 GB total sketch — sharded across
executors it stays broadcast-able per shard; rebuild is incremental per
superstep (only the delta's shards change).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_HASHES = 5
BITS_PER_KEY = 10


def _positions(h: np.ndarray, n_bits: int) -> list[np.ndarray]:
    h = h.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    return [((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
            for i in range(K_HASHES)]


def build_blooms(seen: DataFrame, n_bits: int) -> dict[int, bytes]:
    """shard -> bloom bit-array bytes, built with one pass over seen."""
    hashed = seen.select(
        F.col("shard"), F.xxhash64(F.col("seen_key")).alias("h")
    )

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits, dtype=bool)
        for pos in _positions(pdf["h"].to_numpy(), n_bits):
            bits[pos] = True
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bloom": [np.packbits(bits).tobytes()]}
        )

    rows = hashed.groupBy("shard").applyInPandas(
        per_shard, "shard INT, bloom BINARY"
    ).collect()
    return {r["shard"]: bytes(r["bloom"]) for r in rows}


def split_candidates(
    candidates: DataFrame, blooms: dict[int, bytes], n_bits: int
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) — no false negatives by construction."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blooms)

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series, shard: pd.Series) -> pd.Series:
        out = np.zeros(len(h), dtype=bool)
        hs = h.to_numpy(dtype=np.int64)
        sh = shard.to_numpy()
        for s in np.unique(sh):
            raw = bc.value.get(int(s))
            mask = sh == s
            if raw is None:
                continue  # empty shard: definitely new
            bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))[:n_bits]
            hit = np.ones(mask.sum(), dtype=bool)
            for pos in _positions(hs[mask], n_bits):
                hit &= bits[pos].astype(bool)
            out[mask] = hit
        return pd.Series(out)

    with_flag = candidates.withColumn(
        "_maybe", maybe_seen(F.xxhash64(F.col("seen_key")), F.col("shard"))
    )
    return (
        with_flag.filter(~F.col("_maybe")).drop("_maybe"),
        with_flag.filter(F.col("_maybe")).drop("_maybe"),
    )


def bits_for(expected_keys: int) -> int:
    return max(1024, int(BITS_PER_KEY * max(expected_keys, 1)))


class BloomState:
    """Incremental sharded bloom maintained across supersteps.

    Built ONCE from the full seen set (with 2x key headroom so routine
    growth never forces a rebuild), then each wave ORs in only the current
    seen DELTA — a toPandas of (shard, xxhash64) pairs, wave-sized, never
    the historical set. A full rebuild happens only when the key count
    outgrows the sized capacity (FP rate would otherwise degrade)."""

    def __init__(self, blooms: dict[int, bytes], n_bits: int, keys: int) -> None:
        self.blooms = blooms
        self.n_bits = n_bits
        self.keys = keys

    @classmethod
    def build(cls, seen_keys: DataFrame) -> "BloomState":
        n_keys = seen_keys.count()
        n_bits = bits_for(2 * n_keys)
        return cls(build_blooms(seen_keys, n_bits), n_bits, n_keys)

    def over_capacity(self) -> bool:
        return self.keys * BITS_PER_KEY > self.n_bits

    def update(self, seen_delta: DataFrame) -> None:
        pdf = seen_delta.select(
            F.col("shard"), F.xxhash64(F.col("seen_key")).alias("h")
        ).toPandas()
        added = 0
        for s, grp in pdf.groupby("shard"):
            raw = self.blooms.get(int(s))
            bits = (
                np.unpackbits(np.frombuffer(raw, dtype=np.uint8))[: self.n_bits]
                .astype(bool)
                if raw is not None
                else np.zeros(self.n_bits, dtype=bool)
            )
            positions = _positions(grp["h"].to_numpy(), self.n_bits)
            # count only keys whose bits were NOT already all set — re-added
            # keys (cache hits, evicted probes reappearing in deltas) must
            # not inflate the capacity estimate into premature full rebuilds
            already = np.ones(len(grp), dtype=bool)
            for pos in positions:
                already &= bits[pos]
            added += int((~already).sum())
            for pos in positions:
                bits[pos] = True
            self.blooms[int(s)] = np.packbits(bits).tobytes()
        self.keys += added


def expected_fp_rate(n_keys: int, n_bits: int) -> float:
    if n_keys == 0:
        return 0.0
    return (1 - math.exp(-K_HASHES * n_keys / n_bits)) ** K_HASHES
