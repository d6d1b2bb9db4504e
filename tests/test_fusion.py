"""Hybrid lexical+vector retrieval via reciprocal rank fusion (the
public ES 8 ``retriever: {rrf}`` surface; Cormack & Clarke RRF).
Oracle: brute-force rank algebra over the engine's own retriever
outputs."""

import pytest

from pyspark.sql import functions as F

from synspark.fusion import hybrid_search, ranked_window, rrf_fuse
from synspark.index_store import build_index
from synspark.query import search
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)


def _corpus(spark, n=60):
    rows = [(f"r{i:02d}", "f", "c", "en",
             "data sort " + "merge " * (i % 5)) for i in range(n)]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


def _emb(spark, n=60, dim=8):
    rows = [(i, [float((i * j) % 7 - 3) / 3.0 for j in range(1, dim + 1)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def fstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fusion")
    store = build_index(spark, _corpus(spark), str(root / "idx"),
                        cfg=CFG, n_shards=2, resume=False)
    return store


def test_rrf_matches_brute_force(spark, fstore):
    emb = _emb(spark)
    qv = [0.5] * 8
    got = {r.doc_id: r.rrf_score for r in
           hybrid_search(spark, fstore, "data sort", emb, qv, k=20,
                         window=15).collect()}

    from synspark.datapipe.similarity import brute_force_topk
    lex = search(spark, fstore, "data sort", k=100, mode="and")
    lp = sorted([(round(r.score, 6), r.doc_id) for r in lex.collect()],
                key=lambda t: (-t[0], t[1]))[:15]
    vp = sorted([(r.cosine, r.vec_id) for r in
                 brute_force_topk(emb, qv, k=100).collect()],
                key=lambda t: (-t[0], t[1]))[:15]
    want: dict = {}
    for rank, (_s, d) in enumerate(lp, 1):
        want[d] = want.get(d, 0) + 1.0 / (60 + rank)
    for rank, (_s, d) in enumerate(vp, 1):
        want[d] = want.get(d, 0) + 1.0 / (60 + rank)
    top = dict(sorted(want.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:20])
    assert set(got) == set(top)
    for d in got:
        assert got[d] == pytest.approx(round(top[d], 6), abs=1e-6)


def test_doc_in_both_windows_sums(spark, fstore):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank int")
    rows = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b]).collect()}
    assert rows[1] == pytest.approx(round(2 / 61, 6))
    assert rows[2] == rows[3] == pytest.approx(round(1 / 62, 6))


def test_ranked_window_rounds_before_ranking(spark):
    df = spark.createDataFrame(
        [(1, 0.1234564), (2, 0.1234561), (3, 0.2)],
        "doc_id long, score double")
    rows = {r.doc_id: r.rank for r in
            ranked_window(df, "score", 10).collect()}
    # docs 1 and 2 tie after rounding -> doc_id breaks the tie
    assert rows == {3: 1, 1: 2, 2: 3}


def test_rrf_errors():
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_ivf_backend(spark, fstore, tmp_path):
    """ivf_path backend: with probes = 2^n_planes (all buckets) the
    fused result equals the brute-force backend exactly."""
    from synspark.datapipe.similarity import write_ivf_index
    emb = _emb(spark)
    qv = [0.5] * 8
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, dim=8, n_planes=4)
    bf = hybrid_search(spark, fstore, "data sort", emb, qv, k=15,
                       window=10).collect()
    ivf = hybrid_search(spark, fstore, "data sort", None, qv, k=15,
                        window=10, ivf_path=path, n_planes=4,
                        probes=16).collect()
    assert [(r.doc_id, r.rrf_score) for r in bf] == \
        [(r.doc_id, r.rrf_score) for r in ivf]
    with pytest.raises(ValueError):
        hybrid_search(spark, fstore, "data", None, qv)
