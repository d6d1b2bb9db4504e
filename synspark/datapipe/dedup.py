"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the staples of web-scale training-data curation.

Scale design: everything except SimHash is pure built-in expressions
(codegen'd, shuffle only on the final groupBy/join keys). MinHash uses
md5-with-salt string minima as the permutation family — portable
(identical in DuckDB for the oracle) and deterministic. LSH banding
turns O(N^2) near-dup detection into groupBy(band) — the classic
shingle→minhash→band→bucket-join plan; candidate verification joins
are bucket-local (bounded by band-collision groups, not N)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import DELIM_RE, _words


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: md5 groups with >1 doc."""
    return (
        df.select(F.md5(F.col(text_col)).alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(F.count("*").alias("n_docs"),
             F.min(id_col).alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def word_shingles(df: DataFrame, k: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Distinct word k-shingles per doc (built-in: split + transform +
    explode; no UDF)."""
    w = _words(F.lower(F.col(text_col)))
    sh = F.when(
        F.size(w) >= k,
        F.transform(F.sequence(F.lit(0), F.size(w) - k),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)))
    ).otherwise(F.array(F.concat_ws(" ", w)))
    return (df.select(F.col(id_col), F.explode(sh).alias("shingle"))
            .filter(F.length("shingle") > 0)
            .distinct())


def minhash_signatures(shingles: DataFrame, n_hashes: int = 8,
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash via salted-md5 minima: sig_i = min(md5(i || shingle)).
    String minima under k independent salted hashes approximate
    permutation minima; portable to any SQL engine for oracles."""
    aggs = [F.min(F.md5(F.concat(F.lit(str(i)), F.col("shingle"))))
            .alias(f"mh{i}") for i in range(n_hashes)]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_groups(sigs: DataFrame, bands: int = 4,
                         rows_per_band: int = 2,
                         id_col: str = "doc_id") -> DataFrame:
    """Band the signature; docs sharing any band are near-dup
    candidates. Returns (band_id, band_key) groups with >1 doc."""
    out = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        out.append(sigs.select(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            F.col(id_col)))
    un = out[0]
    for o in out[1:]:
        un = un.unionAll(o)
    return (un.groupBy("band_id", "band_key")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


def jaccard_pairs(shingles: DataFrame, candidates: DataFrame | None = None,
                  id_col: str = "doc_id",
                  threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard for doc pairs (optionally restricted to LSH
    candidate buckets): |A∩B| via self-join on shingle, |A∪B| from doc
    shingle counts. Pair key ordered (a < b) to avoid dupes."""
    counts = shingles.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = shingles.select(F.col(id_col).alias("a"), "shingle")
    bdf = shingles.select(F.col(id_col).alias("b"), "shingle")
    inter = (a.join(bdf, "shingle")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count("*").alias("n_inter")))
    j = (inter
         .join(counts.select(F.col(id_col).alias("a"),
                             F.col("n_sh").alias("na")), "a")
         .join(counts.select(F.col(id_col).alias("b"),
                             F.col("n_sh").alias("nb")), "b")
         .withColumn("jaccard",
                     F.round(F.col("n_inter") /
                             (F.col("na") + F.col("nb") - F.col("n_inter")),
                             6)))
    if threshold > 0:
        j = j.filter(F.col("jaccard") >= threshold)
    return j.select("a", "b", "n_inter", "jaccard")


def simhash(df: DataFrame, bits: int = 64, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word unigrams (Charikar): sign of the
    per-bit weighted sum of token hashes. Bit-level work → vectorized
    pandas UDF (Arrow batches), the sanctioned slow path."""

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import re
        import hashlib
        out = np.zeros(len(texts), dtype=np.int64)
        splitter = re.compile("[ \t\n\r　]+")
        for i, t in enumerate(texts):
            if not t:
                continue
            words = [w for w in splitter.split(t.lower()) if w]
            if not words:
                continue
            acc = np.zeros(bits, dtype=np.int64)
            shifts = np.arange(bits, dtype=np.uint64)
            for w in set(words):
                h = np.uint64(int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[:8], "big"))
                bitsarr = (h >> shifts) & np.uint64(1)
                acc += np.where(bitsarr == 1, 1, -1)
            sig = np.uint64(0)
            for j in np.flatnonzero(acc > 0):
                sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(sim: DataFrame, max_hamming: int = 3,
                      id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming, blocked on
    16-bit chunks (pigeonhole: ≤3 differing bits ⇒ some chunk equal)."""
    chunks = [(F.shiftrightunsigned(F.col("simhash"), 16 * c)
               .bitwiseAND(F.lit(0xFFFF))).alias(f"c{c}") for c in range(4)]
    s = sim.select(id_col, "simhash", *chunks)
    pairs = None
    for c in range(4):
        a = s.select(F.col(id_col).alias("a"),
                     F.col("simhash").alias("ha"), F.col(f"c{c}").alias("ck"))
        b = s.select(F.col(id_col).alias("b"),
                     F.col("simhash").alias("hb"), F.col(f"c{c}").alias("ck"))
        p = a.join(b, "ck").filter(F.col("a") < F.col("b")).drop("ck")
        pairs = p if pairs is None else pairs.unionAll(p)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (pairs.distinct()
            .withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))
