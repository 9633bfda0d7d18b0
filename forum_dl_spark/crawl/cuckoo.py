"""Partitioned cuckoo-filter prefilter for the URL-seen anti-join.

The north rule names a "bloom/cuckoo URL-seen set"; this is the cuckoo
half, same contract as :mod:`crawl.bloom` — a per-shard sketch that splits
candidates into (definitely_new, maybe_seen) with NO false negatives, so
only the maybe-seen residue pays the exact anti-join shuffle. What cuckoo
adds over bloom:

- **Deletion.** A bloom can only grow, so the bloom path must insert every
  seen record (evicted one-shot keys included) and let the exact join sort
  the evictions out. The cuckoo sketch tracks exactly the GATING set
  (``evict == 0`` keys): evicted keys are never inserted, and
  ``CuckooState.delete`` removes keys outright — the primitive a TTL-based
  recrawl/refresh policy needs, which bloom structurally cannot provide.
- **Bounded FP at high load** (~2*SLOTS/2^FP_BITS ≈ 1.2e-4 at 16-bit
  fingerprints) vs bloom's load-dependent curve.

Partial-key cuckoo hashing (Fan et al., CoNEXT'14 "Cuckoo Filter:
Practically Better Than Bloom"): fingerprint fp = high bits of
xxhash64(key) (0 reserved = empty slot), bucket i1 = h mod n, alternate
i2 = i1 XOR (hash(fp) mod n) — i1 is recoverable from (i2, fp), which is
what makes displacement (kicking) and deletion work without the key.

Layout mirrors bloom.py: one filter per ``shard = pmod(xxhash64(seen_key),
K)``, built per-shard with ``applyInPandas`` over the JVM-computed
xxhash64 column, collected as checkpoint artifacts, broadcast for the
probe side. At 10^10 URLs: 16-bit fp x 4 slots at 0.84 load ≈ 2.4
bytes/key ≈ 24 GB total — sharded it stays broadcast-able per shard,
comparable to bloom's 12.5 GB with a ~100x lower FP rate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
FP_BITS = 16
MAX_KICKS = 500
TARGET_LOAD = 0.84  # standard safe load factor for 4-slot buckets
_FP_MASK = (1 << FP_BITS) - 1
_MIX = np.uint64(0x5BD1E9955BD1E995)  # odd multiplier for the fp->offset hash


def _fingerprints(h: np.ndarray) -> np.ndarray:
    fp = ((h.astype(np.uint64) >> np.uint64(64 - FP_BITS)) & np.uint64(_FP_MASK)).astype(
        np.uint16
    )
    fp[fp == 0] = 1  # 0 is the empty-slot sentinel
    return fp


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def _alt_bucket(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    off = (fp.astype(np.uint64) * _MIX) % np.uint64(n_buckets)
    return (np.bitwise_xor(i.astype(np.uint64), off) % np.uint64(n_buckets)).astype(
        np.int64
    )


def buckets_for(expected_keys: int) -> int:
    """Bucket count sized for TARGET_LOAD occupancy, power-of-2-free."""
    return max(64, int(max(expected_keys, 1) / (SLOTS * TARGET_LOAD)) + 1)


class _Filter:
    """Single-shard cuckoo filter over a numpy (n_buckets, SLOTS) table."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None) -> None:
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        )
        self.count = int((self.table != 0).sum())

    def insert(self, h: int, rng_seed: int = 0) -> bool:
        fp = int(_fingerprints(np.array([h]))[0])
        i1 = int(_bucket1(np.array([h]), self.n_buckets)[0])
        i2 = int(_alt_bucket(np.array([i1]), np.array([fp], dtype=np.uint16),
                             self.n_buckets)[0])
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # displacement: deterministic kick walk (no RNG — resume-safe)
        i = i1 if (h & 1) == 0 else i2
        for kick in range(MAX_KICKS):
            slot = (h + kick) % SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = int(_alt_bucket(np.array([i]), np.array([fp], dtype=np.uint16),
                                self.n_buckets)[0])
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False  # table effectively full -> caller rebuilds bigger

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = _fingerprints(h)
        i1 = _bucket1(h, self.n_buckets)
        i2 = _alt_bucket(i1, fp, self.n_buckets)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, h: int) -> bool:
        fp = int(_fingerprints(np.array([h]))[0])
        i1 = int(_bucket1(np.array([h]), self.n_buckets)[0])
        i2 = int(_alt_bucket(np.array([i1]), np.array([fp], dtype=np.uint16),
                             self.n_buckets)[0])
        for i in (i1, i2):
            row = self.table[i]
            hit = np.where(row == fp)[0]
            if len(hit):
                row[hit[0]] = 0
                self.count -= 1
                return True
        return False

    def load(self) -> float:
        return self.count / (self.n_buckets * SLOTS)


def build_filters(seen: DataFrame, n_buckets: int) -> dict[int, bytes]:
    """shard -> serialized cuckoo table, one pass over the seen relation."""
    hashed = seen.select(F.col("shard"), F.xxhash64(F.col("seen_key")).alias("h"))

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        f = _Filter(n_buckets)
        for h in pdf["h"].to_numpy():
            f.insert(int(h))
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "table": [f.table.tobytes()]}
        )

    rows = hashed.groupBy("shard").applyInPandas(
        per_shard, "shard INT, table BINARY"
    ).collect()
    return {r["shard"]: bytes(r["table"]) for r in rows}


def _deserialize(raw: bytes, n_buckets: int) -> _Filter:
    table = np.frombuffer(raw, dtype=np.uint16).reshape(n_buckets, SLOTS).copy()
    return _Filter(n_buckets, table)


def split_candidates(
    candidates: DataFrame, tables: dict[int, bytes], n_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) — no false negatives for inserted keys."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(tables)

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
            f = _deserialize(raw, n_buckets)
            out[mask] = f.contains_many(hs[mask])
        return pd.Series(out)

    with_flag = candidates.withColumn(
        "_maybe", maybe_seen(F.xxhash64(F.col("seen_key")), F.col("shard"))
    )
    return (
        with_flag.filter(~F.col("_maybe")).drop("_maybe"),
        with_flag.filter(F.col("_maybe")).drop("_maybe"),
    )


class CuckooState:
    """Incremental sharded cuckoo filter maintained across supersteps.

    Tracks exactly the GATING set: ``evict == 0`` keys are inserted,
    evicted one-shot keys are never added (the exact join treats them as
    not-seen, so the sketch must too — a bloom has to over-approximate
    here). ``update`` consumes each wave's seen DELTA driver-side
    (wave-sized, never the historical set); a rebuild with 2x headroom
    happens when any shard's load crosses TARGET_LOAD or an insert fails
    (kick limit)."""

    def __init__(self, filters: dict[int, "_Filter"], n_buckets: int, keys: int):
        self.filters = filters
        self.n_buckets = n_buckets
        self.keys = keys

    @classmethod
    def build(cls, seen_keys: DataFrame) -> "CuckooState":
        # a key can carry several records (consume-then-refetch): one
        # membership entry each is wasteful — dedupe at build time
        gating = seen_keys.dropDuplicates(["seen_key"])
        n_keys = gating.count()
        n_buckets = buckets_for(2 * n_keys)
        raw = build_filters(gating, n_buckets)
        filters = {s: _deserialize(b, n_buckets) for s, b in raw.items()}
        return cls(filters, n_buckets, n_keys)

    @property
    def tables(self) -> dict[int, bytes]:
        return {s: f.table.tobytes() for s, f in self.filters.items()}

    def over_capacity(self) -> bool:
        return any(f.load() > TARGET_LOAD for f in self.filters.values())

    def update(self, seen_delta: DataFrame) -> bool:
        """Insert the delta's gating keys; False if any insert failed
        (caller must rebuild — the sketch would otherwise miss a key and
        break the no-false-negative contract)."""
        pdf = (
            seen_delta.filter(F.col("evict") == 0)
            .select(F.col("shard"), F.xxhash64(F.col("seen_key")).alias("h"))
            .toPandas()
        )
        for s, grp in pdf.groupby("shard"):
            f = self.filters.get(int(s))
            if f is None:
                f = _Filter(self.n_buckets)
                self.filters[int(s)] = f
            hs = grp["h"].to_numpy()
            fresh = ~f.contains_many(hs)
            for h in hs[fresh]:
                if not f.insert(int(h)):
                    return False
            self.keys += int(fresh.sum())
        return True

    def delete(self, seen_keys: DataFrame) -> int:
        """Remove keys (e.g. a TTL recrawl window re-opening URLs); returns
        the number actually removed. Only keys previously inserted may be
        deleted — deleting an absent key could strip another key's
        colliding fingerprint and break the no-false-negative contract."""
        pdf = seen_keys.select(
            F.col("shard"), F.xxhash64(F.col("seen_key")).alias("h")
        ).toPandas()
        removed = 0
        for s, grp in pdf.groupby("shard"):
            f = self.filters.get(int(s))
            if f is None:
                continue
            for h in grp["h"].to_numpy():
                if f.delete(int(h)):
                    removed += 1
        self.keys -= removed
        return removed
