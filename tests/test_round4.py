"""Round-4 pins: FS-shim metadata/commit layer (HadoopFS over a
file: URI proving the indirection), enforced single-writer lock,
post-fold termstats vacuum, pre-v5 partial-build resume detection,
distributed docID bucket offsets, posLength-carrying filter-composed
indexes, doc-range block skip in decoded_postings, and multi-probe
embedding near-dup recall."""

import json

import pytest

from pyspark.sql import functions as F

from synspark.fs import FsPath, LocalFS
from synspark.index_store import (ConcurrentWriterError, IndexStore,
                                  append_to_index, build_index)
from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig

from test_round3 import CFG, mk

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------
# FS shim (round-3 verdict task #1)
# ---------------------------------------------------------------------

def test_local_fs_atomic_write_and_path_ops(tmp_path):
    fs = LocalFS()
    root = FsPath(fs, tmp_path)
    d = root / "sub"
    d.mkdir()
    (d / "a.json").write_text(json.dumps({"x": 1}))
    assert (d / "a.json").exists()
    assert json.loads((d / "a.json").read_text()) == {"x": 1}
    # overwrite is atomic (os.replace) — and leaves no temp litter
    (d / "a.json").write_text("{}")
    assert (d / "a.json").read_text() == "{}"
    names = [p.name for p in d.iterdir()]
    assert names == ["a.json"]
    # file: URI normalization
    assert fs._local(f"file://{tmp_path}") == str(tmp_path)
    assert fs._local(f"file:{tmp_path}") == str(tmp_path)
    # exclusive create: second attempt fails
    assert (d / "lock").create_exclusive("me")
    assert not (d / "lock").create_exclusive("you")
    (d / "lock").unlink()
    assert (d / "lock").create_exclusive("again")
    d.rmtree()
    assert not d.exists()


def test_hadoopfs_file_uri_store_end_to_end(spark, tmp_path_factory):
    """The whole store lifecycle (build → query → append → crash purge)
    through the Hadoop FileSystem API bound to a file: URI — proving
    the commit layer runs wherever Spark's Hadoop conf points (the
    round-3 verdict's #1: meta/manifest/purge were POSIX-only)."""
    from synspark.fs import HadoopFS
    from synspark.query import search

    local = tmp_path_factory.mktemp("hfs")
    base = f"file:{local}/index"
    fs = HadoopFS(spark, base)

    st = build_index(spark, mk(spark, 0, 60), base, cfg=CFG,
                     n_shards=3, source="hfs", fs=fs)
    assert isinstance(st.fs, HadoopFS)
    m = st.meta()
    assert m.n_docs == 60
    hits = search(spark, st, "alpha beta", k=5, mode="and").collect()
    assert hits

    # append through the same FS; lock cycles through HadoopFS
    st = append_to_index(spark, st, mk(spark, 60, 90), source="a",
                         batch_tag="b1")
    assert st.meta().n_docs == 90
    assert not (st.path / "writer.lock").exists()

    # crash purge through the shim: plant a fake uncommitted shard dir
    # + stats partition, run a retry-shaped append, leftovers gone
    stale_seg = st.path / "segments" / "shard=99"
    stale_seg.mkdir()
    (stale_seg / "junk.parquet").write_text("not parquet")
    stale_ts = st.path / "termstats" / "batch=at-90"
    stale_ts.mkdir()
    (stale_ts / "junk").write_text("x")
    st = append_to_index(spark, st, mk(spark, 90, 100), source="b",
                         batch_tag="b2")
    assert not stale_seg.exists()
    assert st.meta().n_docs == 100
    # readers agree with a plain-local store over the same directory
    plain = IndexStore(str(local / "index"))
    assert plain.meta().n_docs == 100
    a = {tuple(r) for r in st.termstats(spark).collect()}
    b = {tuple(r) for r in plain.termstats(spark).collect()}
    assert a == b


def test_hadoopfs_atomic_rename_and_stat(spark, tmp_path_factory):
    from synspark.fs import HadoopFS
    local = tmp_path_factory.mktemp("hfsops")
    base = f"file:{local}"
    fs = HadoopFS(spark, base)
    p = FsPath(fs, base)
    (p / "x.txt").write_text("one")
    (p / "x.txt").write_text("two")  # overwrite via rename
    assert (p / "x.txt").read_text() == "two"
    mtime, size = (p / "x.txt").stat_sig()
    assert size == 3 and mtime > 0
    assert sorted(c.name for c in p.iterdir()) == ["x.txt"]
    assert (p / "l").create_exclusive("o")
    assert not (p / "l").create_exclusive("o2")


# ---------------------------------------------------------------------
# writer lock (round-3 verdict task #10)
# ---------------------------------------------------------------------

def test_concurrent_append_raises(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("lock") / "index"
    st = build_index(spark, mk(spark, 0, 30), str(out), cfg=CFG,
                     n_shards=2, source="base")
    # simulate a concurrent writer holding the lock
    st.acquire_writer_lock(owner="other-writer")
    with pytest.raises(ConcurrentWriterError, match="another writer"):
        append_to_index(spark, st, mk(spark, 30, 40), source="me")
    # index untouched by the failed attempt
    assert st.meta().n_docs == 30
    # operator override for a crashed holder, then the append works
    st.break_lock()
    st = append_to_index(spark, st, mk(spark, 30, 40), source="me")
    assert st.meta().n_docs == 40
    assert not (st.path / "writer.lock").exists()


def test_lock_released_on_append_failure(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("lockfail") / "index"
    st = build_index(spark, mk(spark, 0, 30), str(out), cfg=CFG,
                     n_shards=2, source="base",
                     syn=SynonymDict.parse("alpha,beta"))
    with pytest.raises(ValueError, match="fingerprint|dictionary"):
        append_to_index(spark, st, mk(spark, 30, 40), syn=None)
    assert not (st.path / "writer.lock").exists()  # released on error


# ---------------------------------------------------------------------
# post-fold termstats vacuum (round-3 verdict task #5)
# ---------------------------------------------------------------------

def test_stats_vacuum_keeps_dir_count_bounded(spark, tmp_path_factory):
    """Over > 2×fold_stats_every appends, folded-away delta partitions
    are reclaimed right after each fold's commit: the termstats dir
    count stays ≤ fold_stats_every + 1 forever, and values still equal
    a full rebuild's."""
    out = tmp_path_factory.mktemp("vac") / "index"
    fold_every = 3
    st = build_index(spark, mk(spark, 0, 30), str(out), cfg=CFG,
                     n_shards=2, source="base")
    n = 30
    for i in range(8):
        st = append_to_index(spark, st, mk(spark, n, n + 10),
                             batch_tag=f"v{i}",
                             fold_stats_every=fold_every)
        n += 10
        dirs = [p.name for p in (st.path / "termstats").glob("batch=*")]
        assert len(dirs) <= fold_every + 1, (i, dirs)
    # committed partitions are exactly the on-disk ones now
    dirs = {p.name.split("=", 1)[1]
            for p in (st.path / "termstats").glob("batch=*")}
    assert set(st.meta().stats_batches) <= dirs
    out2 = tmp_path_factory.mktemp("vacfull") / "index"
    full = build_index(spark, mk(spark, 0, n), str(out2), cfg=CFG,
                       n_shards=2, source="full")
    a = {tuple(r) for r in st.termstats(spark).collect()}
    b = {tuple(r) for r in full.termstats(spark).collect()}
    assert a == b


# ---------------------------------------------------------------------
# pre-v5 partial-build resume (round-3 advice #4)
# ---------------------------------------------------------------------

def test_resume_rebuilds_unpartitioned_stats(spark, tmp_path_factory):
    """A crashed pre-v5 build left UNPARTITIONED stats dirs (no batch=
    children). Resuming over one must rebuild the stats in the current
    layout instead of committing meta over a layout readers can't
    filter (obscure missing-column failure, round-3 advice)."""
    import shutil
    out = tmp_path_factory.mktemp("prev5") / "index"
    st = build_index(spark, mk(spark, 0, 40), str(out), cfg=CFG,
                     n_shards=2, source="base")
    expect = {tuple(r) for r in st.termstats(spark).collect()}
    # simulate the pre-v5 crash artifact: meta missing, stats
    # unpartitioned (files moved out of batch=initial to the root)
    (out / "meta.json").unlink()
    for sub in ("termstats", "docstats"):
        d = out / sub
        for f in (d / "batch=initial").iterdir():
            if f.name.endswith(".parquet"):
                shutil.move(str(f), str(d / f.name))
        shutil.rmtree(d / "batch=initial")
    st2 = build_index(spark, mk(spark, 0, 40), str(out), cfg=CFG,
                      n_shards=2, source="resume", resume=True)
    assert st2.meta().n_docs == 40
    got = {tuple(r) for r in st2.termstats(spark).collect()}
    assert got == expect
    assert sorted(map(tuple, st2.docstats(spark).collect()))[-1][0] == 39


# ---------------------------------------------------------------------
# distributed docID offsets (round-3 verdict task #2)
# ---------------------------------------------------------------------

def test_docid_offsets_no_driver_materialization(spark, monkeypatch):
    """assign_doc_ids (bucketed) must not collect()/toPandas() the
    bucket-offset frame: offsets are an executor-side prefix sum
    (round-3 verdict, wrong #1 — the old path collected all B buckets
    onto the driver at B ≈ n/250k)."""
    from synspark.docids import assign_doc_ids
    cls = type(spark.range(1))
    calls = []
    orig_collect, orig_topandas = cls.collect, cls.toPandas
    monkeypatch.setattr(cls, "collect",
                        lambda self: (calls.append("collect"),
                                      orig_collect(self))[1])
    monkeypatch.setattr(cls, "toPandas",
                        lambda self: (calls.append("toPandas"),
                                      orig_topandas(self))[1])
    df = mk(spark, 0, 500)
    out = assign_doc_ids(df, buckets=16)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    calls.clear()  # only the test's own action above may collect
    out2 = assign_doc_ids(df, buckets=16)
    out2.count()
    assert calls == []
    assert sorted(ids) == list(range(500))
    # determinism across replans
    ids2 = [r["doc_id"] for r in out2.select("doc_id").collect()[:0]] or \
        [r["doc_id"] for r in assign_doc_ids(df, buckets=16)
         .select("doc_id").collect()]
    assert sorted(ids2) == list(range(500))
