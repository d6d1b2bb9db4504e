"""Percolation (reverse search) — the ES ``percolate`` query shape:
registered queries fire as documents arrive.

Truth anchors are public ES percolator semantics:
- each registered query is analyzed with the index analyzer at
  registration time (ES indexes the percolator query's extracted
  terms);
- a doc matches an AND query iff every position group matches, an OR
  query iff any does, an msm query iff ≥ m do;
- synonym alternatives satisfy their group (any-of);
- percolation during ingest is per-document and stateless — the
  broadcast path must work unchanged on a Structured Streaming frame.

Oracle: brute-force python matching over the same analyzed groups,
plus broadcast ≡ distributed path equality.
"""

import pytest

from synspark.percolate import percolate, register_queries
from synspark.query import analyze_query
from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig, tokenize

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)

QUERIES = [(1, "data sort", "and"),
           (2, "merge", "or"),
           (3, "key order", "msm", 3),
           (4, "zz", "and")]          # matches nothing

BODIES = ["data sort merge all here",
          "key order small",
          "merge key order data",
          "nothing relevant",
          "data here but not the other word",
          "DATA SORT upper case"]


def _docs(spark):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(BODIES)],
        "doc_id long, content string")


def _truth(queries, bodies, cfg, syn=None):
    out = set()
    for did, body in enumerate(bodies):
        terms = {w for w, *_ in tokenize(body, cfg, syn)}
        for q in queries:
            qid, text, mode = q[0], q[1], q[2]
            groups = analyze_query(text, cfg, syn)
            if not groups:
                continue
            hit = sum(1 for g in groups if any(t in terms for t in g))
            req = {"and": len(groups), "or": 1}.get(mode, None)
            if req is None:
                req = min(q[3], len(groups))
            if hit >= req:
                out.add((did, qid))
    return sorted(out)


def test_percolate_matches_truth_both_paths(spark):
    reg = register_queries(spark, QUERIES, CFG)
    docs = _docs(spark)
    bcast = sorted((r.doc_id, r.query_id) for r in
                   percolate(spark, reg, docs, CFG).collect())
    dist = sorted((r.doc_id, r.query_id) for r in
                  percolate(spark, reg, docs, CFG,
                            broadcast=False).collect())
    truth = _truth(QUERIES, BODIES, CFG)
    assert bcast == truth
    assert dist == truth
    assert all(q != 4 for _d, q in bcast)


def test_percolate_synonym_alternative_satisfies_group(spark):
    """A registered query for the anchor fires on docs containing only
    the alternative — the synonym-aware saved search."""
    syn = SynonymDict.parse("ab,xy")
    cfg = TokenizerConfig(n=2, expand=True, ignore_case=True)
    reg = register_queries(spark, [(7, "ab", "and")], cfg, syn=syn)
    docs = spark.createDataFrame(
        [(0, "xy only"), (1, "ab only"), (2, "neither")],
        "doc_id long, content string")
    got = sorted((r.doc_id, r.query_id) for r in
                 percolate(spark, reg, docs, cfg, syn=syn).collect())
    assert got == [(0, 7), (1, 7)]


def test_register_rejects_bad_modes(spark):
    with pytest.raises(ValueError):
        register_queries(spark, [(1, "ab", "xor")], CFG)
    with pytest.raises(ValueError):
        register_queries(spark, [(1, "ab", "msm")], CFG)


def test_percolate_streaming(spark, tmp_path_factory):
    """Saved-search alerting over a stream: the SAME percolate call on
    a readStream frame, zero state, append mode."""
    src = tmp_path_factory.mktemp("perc_src")
    ckpt = tmp_path_factory.mktemp("perc_ck")
    reg = register_queries(spark, QUERIES, CFG)

    def drop(rows):
        spark.createDataFrame(rows, "doc_id long, content string") \
            .coalesce(1).write.mode("append").parquet(str(src))

    drop([(0, BODIES[0]), (1, BODIES[1])])
    stream = (spark.readStream.schema("doc_id long, content string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = percolate(spark, reg, stream, CFG)
    q = (out.writeStream.format("memory").queryName("perc_out")
         .outputMode("append")
         .option("checkpointLocation", str(ckpt)).start())
    try:
        q.processAllAvailable()
        got1 = sorted((r.doc_id, r.query_id) for r in
                      spark.sql("select * from perc_out").collect())
        assert got1 == _truth(QUERIES, BODIES[:2], CFG)
        drop([(2, BODIES[2]), (3, BODIES[3])])
        q.processAllAvailable()
        got2 = sorted((r.doc_id, r.query_id) for r in
                      spark.sql("select * from perc_out").collect())
        assert got2 == _truth(QUERIES, BODIES[:4], CFG)
    finally:
        q.stop()


def test_percolate_streaming_rejects_distributed(spark,
                                                 tmp_path_factory):
    src = tmp_path_factory.mktemp("perc_src2")
    spark.createDataFrame([(0, "x")], "doc_id long, content string") \
        .write.parquet(str(src), mode="overwrite")
    stream = (spark.readStream.schema("doc_id long, content string")
              .parquet(str(src)))
    reg = register_queries(spark, QUERIES, CFG)
    with pytest.raises(ValueError):
        percolate(spark, reg, stream, CFG, broadcast=False)
