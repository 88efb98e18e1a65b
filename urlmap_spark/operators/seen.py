"""Partitioned URL-seen structure: bloom prefilter + exact anti-join.

north_rule: "tests membership against a partitioned bloom/cuckoo
URL-seen structure". Design (SURVEY.md §4.3.1):

- the EXACT seen set stays authoritative (an anti-join) — a bloom
  false positive may only cost an extra exact check, never a dropped
  URL, and a false negative cannot happen by construction;
- per host-hash bucket, a fixed-size bloom filter (numpy bitmap, k
  hashes derived from two 64-bit hashes) summarizes every seen URL;
  filters are built/merged per round with applyInPandas (one task per
  bucket) and persisted as (bucket, version, filter binary) rows;
- the probe is a broadcast of the (small, fixed-size) filter blobs +
  one mapInPandas pass over the candidates: rows whose bucket filter
  definitely excludes them are DEFINITELY NEW and skip the exact
  anti-join entirely; only "maybe seen" rows take the join.

At 10^10 URLs the exact set is a bucketed Iceberg table and the maybe-
seen fraction ~= true-dup fraction + false-positive rate — the anti-
join's probe side shrinks by the share of genuinely-new URLs, which in
a growing crawl is most of them.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILTER_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("filter", T.BinaryType()),
])


def _hash2(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode(), digest_size=16).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def _positions(url: str, m_bits: int, k: int) -> np.ndarray:
    """k bit positions via double hashing. Arithmetic is pinned to
    np.uint64 on BOTH the build and probe paths: mixing a raw Python int
    >= 2**63 with a uint64 array lets numpy promote to float64 and the
    low bits of the position differ between build and probe — observed
    as rare bloom FALSE NEGATIVES (i.e. silently re-crawled URLs)."""
    h1, h2 = _hash2(url)
    step = np.uint64(h2 % (1 << 63))
    return ((np.uint64(h1 % (1 << 64)) + np.arange(k, dtype=np.uint64) * step)
            % np.uint64(m_bits)).astype(np.int64)


class BloomConfig:
    def __init__(self, n_buckets: int = 32, m_bits: int = 1 << 20, k: int = 5):
        self.n_buckets = n_buckets
        self.m_bits = m_bits  # bits per bucket filter (1 MiB/8 default)
        self.k = k


def _bucket_of(url: str, n_buckets: int) -> int:
    """Bucket assignment — SAME function on build and probe sides (both
    Python): a mismatch would make the probe consult the wrong filter
    and declare truly-seen URLs 'definitely new'."""
    d = hashlib.blake2b(url.encode(), digest_size=8).digest()
    return int.from_bytes(d, "big") % n_buckets


def build_filters(urls: DataFrame, cfg: BloomConfig,
                  existing: DataFrame | None = None) -> DataFrame:
    """urls(url) [+ existing (bucket, filter)] -> merged (bucket, filter).
    One applyInPandas task per bucket; merge = bitwise OR."""
    from pyspark.sql.functions import pandas_udf

    m_bits, k, nb = cfg.m_bits, cfg.k, cfg.n_buckets

    @pandas_udf(T.IntegerType())
    def _bucket_udf(u: pd.Series) -> pd.Series:
        return u.map(lambda s: _bucket_of(s, nb)).astype("int32")

    tagged = urls.select("url", _bucket_udf(F.col("url")).alias("bucket"))

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        for u in pdf["url"]:
            pos = _positions(u, m_bits, k)
            # bitwise_or.AT, not fancy-index |=: when two of the k
            # positions land in the SAME byte, buffered fancy indexing
            # applies only one of them — a silently missing bit, i.e. a
            # bloom false negative (observed on real data)
            np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"bucket": [key[0]], "filter": [bits.tobytes()]})

    fresh = tagged.groupBy("bucket").applyInPandas(build, FILTER_SCHEMA)
    if existing is None:
        return fresh
    both = fresh.unionByName(existing)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for b in pdf["filter"]:
            acc |= np.frombuffer(bytes(b), dtype=np.uint8)
        return pd.DataFrame({"bucket": [key[0]], "filter": [acc.tobytes()]})

    return both.groupBy("bucket").applyInPandas(merge, FILTER_SCHEMA)


def split_candidates(candidates: DataFrame, filters: DataFrame, cfg: BloomConfig,
                     url_col: str = "url") -> tuple[DataFrame, DataFrame]:
    """candidates -> (definitely_new, maybe_seen).

    The filter blobs are collected to the driver (n_buckets x m_bits/8
    bytes — 4 MiB at defaults) and broadcast; the probe is one
    mapInPandas pass, no shuffle. On a cluster the same blobs ride the
    torrent broadcast to every executor once per round.
    """
    blobs = {r["bucket"]: np.frombuffer(bytes(r["filter"]), dtype=np.uint8)
             for r in filters.collect()}
    sc = candidates.sparkSession.sparkContext
    bblobs = sc.broadcast(blobs)
    m_bits, k, n_buckets = cfg.m_bits, cfg.k, cfg.n_buckets

    schema = T.StructType(candidates.schema.fields + [T.StructField("_maybe", T.BooleanType())])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = bblobs.value
        for pdf in batches:
            maybe = []
            for u in pdf[url_col]:
                b = local.get(_bucket_of(u, n_buckets))
                if b is None:
                    maybe.append(False)
                    continue
                pos = _positions(u, m_bits, k)
                maybe.append(bool(np.all((b[pos // 8] >> (pos % 8)) & 1)))
            out = pdf.copy()
            out["_maybe"] = maybe
            yield out

    probed = candidates.mapInPandas(probe, schema)
    return (probed.filter(~F.col("_maybe")).drop("_maybe"),
            probed.filter(F.col("_maybe")).drop("_maybe"))


def seen_anti_join(candidates: DataFrame, seen: DataFrame,
                   filters: DataFrame | None, cfg: BloomConfig | None = None,
                   url_col: str = "url") -> DataFrame:
    """Exact NOT-IN(seen) with optional bloom prefilter: rows the bloom
    proves unseen bypass the join; the rest take the authoritative
    left_anti. Equality with the plain anti-join is pinned by tests."""
    if filters is None:
        return candidates.join(seen, url_col, "left_anti")
    cfg = cfg or BloomConfig()
    definitely_new, maybe = split_candidates(candidates, filters, cfg, url_col)
    return definitely_new.unionByName(maybe.join(seen, url_col, "left_anti"))
