"""Plan-shape regressions (pushdown/pruning must stay in the physical
plan) + property-based engine invariants."""

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig, tokenize, positions

pytestmark = pytest.mark.spark


# ---------------- plan-shape regressions ----------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_segment_scan_pushes_term_filter(spark, tmp_path):
    from synspark.corpus import generate_corpus
    from synspark.index_store import build_index
    store = build_index(spark, generate_corpus(spark, 100),
                        str(tmp_path / "idx"), n_shards=2, source="plan")
    df = store.segments(spark).filter(F.col("term").isin(["ab", "cd"])) \
        .select("term", "first_doc", "doc_bytes")
    plan = _plan(df)
    assert "PushedFilters: [In(term" in plan, plan
    # column pruning: pos_bytes must NOT be read
    assert "pos_bytes" not in plan.split("ReadSchema")[1][:300], plan


def test_textstats_prune_columns(spark):
    from synspark.datapipe.textstats import token_counts
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(token_counts(docs))
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "text" in read_schema and "source" not in read_schema, plan


def test_small_join_broadcasts(spark):
    from synspark.query import score_naive  # noqa: F401  (import check)
    # group_map joins in the oracle scorer must broadcast (tiny side)
    from synspark.corpus import generate_corpus
    a = generate_corpus(spark, 50).select("doc_id", "content")
    small = spark.createDataFrame([("x", 1)], "content string, gid int")
    plan = _plan(a.join(F.broadcast(small), "content"))
    assert "BroadcastHashJoin" in plan, plan


# ---------------- property-based invariants ----------------

TEXTS = st.text(
    alphabet=st.sampled_from(list("abcdefg あいう 東京\t\n\r　xyz")),
    max_size=80)
NS = st.integers(min_value=1, max_value=5)


@given(TEXTS, NS, st.booleans())
@settings(max_examples=150, deadline=None)
def test_tokenizer_invariants(text, n, expand):
    syn = SynonymDict.parse("あ,かき\na,aa\n東京,とうきょう")
    cfg = TokenizerConfig(n=n, expand=expand)
    toks = tokenize(text, cfg, syn)
    prev_start = -1
    for w, s, e, pi in toks:
        assert 0 <= s < e <= len(text)
        assert pi in (0, 1)
        assert prev_start <= s          # start offsets non-decreasing
        prev_start = s
        # surface tokens cover their span (fold-insensitive length)
        assert len(w) > 0
    # determinism
    assert toks == tokenize(text, cfg, syn)
    # positions non-negative, non-decreasing
    pos = positions(toks)
    assert all(p >= 0 for p in pos) if toks else True
    assert pos == sorted(pos)
    if toks:
        assert toks[0][3] == 1  # first token always advances a position


@given(st.lists(st.sampled_from(["ab", "cd", "efg", "東京", "かき"]),
                min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_selfquery_property(words):
    """A document always phrase-matches itself: tokenizing the doc text
    as a query yields positions that exist consecutively in the doc."""
    text = " ".join(words)
    cfg = TokenizerConfig(n=2, expand=True)
    syn = SynonymDict.parse("東京,とうきょう")
    doc_toks = tokenize(text, cfg, syn)
    q_toks = tokenize(text, cfg, syn)
    assert doc_toks == q_toks  # same analyzer both sides


def test_engine_selfquery(spark, tmp_path):
    """End-to-end property: every indexed doc is a hit for its own full
    text as a phrase query (no-dict bigram config)."""
    from synspark.index_store import build_index
    from synspark.query import search
    texts = ["alpha beta gamma", "delta epsilon", "東京 大阪 京都",
             "one", "xy"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string")
    store = build_index(spark, docs, str(tmp_path / "selfq"),
                        cfg=TokenizerConfig(n=2, expand=False),
                        n_shards=2, source="selfq")
    for i, t in enumerate(texts):
        hits = {r["doc_id"] for r in
                search(spark, store, t, k=10, mode="and",
                       phrase=True).collect()}
        assert i in hits, (i, t, hits)