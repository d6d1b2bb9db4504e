"""spark-submit entry points.

    spark-submit --py-files synspark.zip -m ... synspark/cli.py build \
        --input /data/corpus --output /data/index --synonyms dict.txt \
        --n 2 --expand --shards 4096
    spark-submit ... synspark/cli.py query --index /data/index \
        --text "かきいうえお" --k 10 --phrase
    python -m synspark.cli analyze --text "東京タワー" --synonyms dict.txt

(The session helper also self-ships the package, so plain
``python -m synspark.cli`` works for local runs.)
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--synonyms", help="Solr-format synonym rules file")
    p.add_argument("--n", type=int, default=2)
    p.add_argument("--no-expand", dest="expand", action="store_false")
    p.add_argument("--case-sensitive", dest="ignore_case",
                   action="store_false")


def _load_syn(args):
    from .synonyms import SynonymDict
    if not args.synonyms:
        return None
    with open(args.synonyms, encoding="utf-8") as f:
        return SynonymDict.parse(f.read(), ignore_case=args.ignore_case)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="synspark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True, help="parquet/iceberg corpus")
    b.add_argument("--output", required=True)
    b.add_argument("--shards", type=int, default=32)
    b.add_argument("--layout", choices=["doc", "term"], default="doc")
    b.add_argument("--no-positions", dest="positions", action="store_false")
    b.add_argument("--no-resume", dest="resume", action="store_false")
    _add_common(b)

    q = sub.add_parser("query", help="BM25 top-k search")
    q.add_argument("--index", required=True)
    q.add_argument("--text", help="plain match query (omit when "
                   "using the bool clauses below)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", choices=["and", "or"], default="and")
    q.add_argument("--phrase", action="store_true")
    q.add_argument("--must", action="append", default=None,
                   help="ES bool must clause (repeatable)")
    q.add_argument("--should", action="append", default=None,
                   help="ES bool should clause (repeatable)")
    q.add_argument("--must-not", action="append", default=None,
                   dest="must_not",
                   help="ES bool must_not clause (repeatable)")
    q.add_argument("--min-should-match", type=int, default=None,
                   dest="msm", help="minimum_should_match (match "
                   "m-of-n with --text --mode or, or the bool "
                   "should-clause minimum)")
    q.add_argument("--query-string", dest="qs", default=None,
                   help="Lucene query_string mini-DSL (+must -not "
                   '"phrase"~slop tok* tok~N ^boost field:value); '
                   "overrides --text/bool clauses")
    q.add_argument("--doc-where", dest="doc_where", default=None,
                   help="doc-values filter: Spark SQL predicate over "
                   "docmap metadata columns (e.g. \"lang = 'en'\")")
    _add_common(q)

    g = sub.add_parser("grep", help="gram-accelerated regex search "
                       "over the source corpus (grep -c/-n shapes)")
    g.add_argument("--index", required=True)
    g.add_argument("--source", required=True,
                   help="parquet path of the corpus the index was "
                   "built from (needs doc_id + the text column)")
    g.add_argument("--pattern", required=True)
    g.add_argument("--lines", action="store_true",
                   help="print matching lines (grep -n) instead of "
                   "per-doc match counts")
    g.add_argument("--doc-where", dest="doc_where", default=None)
    _add_common(g)

    a = sub.add_parser("analyze", help="_analyze-style token debug")
    a.add_argument("--text", required=True)
    _add_common(a)

    v = sub.add_parser("verify", help="check sha256 invariant vs source")
    v.add_argument("--index", required=True)
    v.add_argument("--input", required=True)

    c = sub.add_parser("count", help="total hit count (assertDocCount "
                       "idiom) — distributed, no candidate collection")
    c.add_argument("--index", required=True)
    c.add_argument("--text", required=True)
    c.add_argument("--mode", choices=["and", "or"], default="and")
    c.add_argument("--phrase", action="store_true")
    c.add_argument("--min-should-match", type=int, default=None,
                   dest="msm", help="minimum_should_match for "
                   "--mode or (match m-of-n count)")
    _add_common(c)

    ap_add = sub.add_parser("append", help="append new docs to an index")
    ap_add.add_argument("--index", required=True)
    ap_add.add_argument("--input", required=True)
    ap_add.add_argument("--batch-tag", help="idempotence tag: a tag "
                        "already committed makes this a no-op")
    ap_add.add_argument("--allow-dict-change", action="store_true",
                        help="accept changed synonym rules (ES reload "
                        "semantics: old docs keep old tokens)")
    _add_common(ap_add)

    st = sub.add_parser("stream", help="tail a parquet directory into "
                        "an index (Structured Streaming foreachBatch)")
    st.add_argument("--input", required=True)
    st.add_argument("--index", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--shards-first", type=int, default=8)
    st.add_argument("--files-per-batch", type=int, default=64)
    st.add_argument("--dict-path", help="live-reloaded rules file "
                    "(polled per micro-batch, the reference's "
                    "dynamic_reload); mutually exclusive with --synonyms")
    st.add_argument("--timeout", type=float, default=None,
                    help="stop after N seconds (default: run forever)")
    st.add_argument("--mode", choices=["append", "upsert"],
                    default="append",
                    help="upsert: replace documents by key per "
                    "micro-batch instead of blind-appending")
    st.add_argument("--key-cols", default=None,
                    help="comma-separated upsert key columns "
                    "(default: repo,path)")
    st.add_argument("--auto-merge-fraction", type=float, default=None,
                    help="run the TieredMergePolicy-analogue merge "
                    "after each batch at this deleted fraction")
    _add_common(st)

    ap_cmp = sub.add_parser("compact",
                            help="merge small shards into a new index "
                            "(applies tombstones when present: purge + "
                            "dense renumber + stats recompute)")
    ap_cmp.add_argument("--index", required=True)
    ap_cmp.add_argument("--output", required=True)
    ap_cmp.add_argument("--docs-per-shard", type=int, default=None)

    stt = sub.add_parser("stats", help="index stats (_cat/indices "
                         "style): docs/deleted/purged, shard layout, "
                         "segment bytes — no Spark job")
    stt.add_argument("--index", required=True)

    sn = sub.add_parser("snapshot", help="point-in-time incremental "
                        "copy of the committed store (_snapshot): "
                        "immutable files skip on re-snapshot, "
                        "metadata written last — no Spark job")
    sn.add_argument("--index", required=True)
    sn.add_argument("--dest", required=True)

    rs = sub.add_parser("restore", help="materialize a snapshot as a "
                        "fresh writable store — no Spark job")
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--dest", required=True)

    mg = sub.add_parser("merge", help="incremental merge: purge "
                        "tombstones from shards whose deleted "
                        "fraction crosses the threshold (Lucene "
                        "per-segment merge; doc ids stay stable)")
    mg.add_argument("--index", required=True)
    mg.add_argument("--min-deleted-fraction", type=float, default=0.1)
    mg.add_argument("--shards", help="comma-separated shard ids "
                    "(overrides the threshold policy)")

    d = sub.add_parser("delete", help="tombstone documents (Lucene "
                       "liveDocs phase 1: hits/counts exclude them, "
                       "stats keep them until compact)")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", help="comma-separated doc_ids")
    d.add_argument("--keys", help="parquet of key columns "
                   "(repo/path/commit), resolved via the docmap")
    d.add_argument("--query", help="delete all docs matching this "
                   "query (ES _delete_by_query)")
    d.add_argument("--mode", choices=["and", "or"], default="and")
    d.add_argument("--phrase", action="store_true")
    d.add_argument("--batch-tag", help="idempotence tag")
    d.add_argument("--auto-merge-fraction", type=float, default=None,
                   help="run the TieredMergePolicy-analogue merge "
                   "after the commit at this deleted fraction")
    _add_common(d)

    u = sub.add_parser("upsert", help="replace-by-key + insert "
                       "(atomic delete+add, one meta commit)")
    u.add_argument("--input", required=True, help="parquet of new "
                   "document versions")
    u.add_argument("--index", required=True)
    u.add_argument("--key-cols", default=None,
                   help="comma-separated key columns (default: repo,path)")
    u.add_argument("--batch-tag", help="idempotence tag")
    u.add_argument("--auto-merge-fraction", type=float, default=None,
                   help="run the TieredMergePolicy-analogue merge "
                   "after the commit at this deleted fraction")
    _add_common(u)

    args = ap.parse_args(argv)
    from .tokenizer import TokenizerConfig, tokenize_to_string
    cfg = TokenizerConfig(n=getattr(args, "n", 2),
                          expand=getattr(args, "expand", True),
                          ignore_case=getattr(args, "ignore_case", True))

    if args.cmd == "analyze":  # no Spark needed (E12)
        print(tokenize_to_string(args.text, cfg, _load_syn(args)))
        return 0
    if args.cmd == "stats":  # meta + manifest only — no Spark needed
        from .index_store import IndexStore
        print(json.dumps(IndexStore(args.index).stats()))
        return 0
    if args.cmd == "snapshot":  # file copies only — no Spark needed
        from .index_store import IndexStore
        from .snapshot import snapshot as _snap
        print(json.dumps(_snap(IndexStore(args.index), args.dest)))
        return 0
    if args.cmd == "restore":
        from .snapshot import restore as _restore
        store = _restore(args.snapshot, args.dest)
        print(json.dumps(store.stats()))
        return 0
    if args.cmd == "delete" and \
            sum(map(bool, (args.ids, args.keys, args.query))) != 1:
        print("error: pass exactly one of --ids / --keys / --query",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from .session import get_spark
    # get_spark is getOrCreate: when a host process (tests, a
    # notebook) already owns a session we must NOT stop it on exit —
    # only a session this invocation created is ours to tear down
    owned = SparkSession.getActiveSession() is None
    spark = get_spark(app=f"synspark-{args.cmd}")
    try:
        if args.cmd == "build":
            from .index_store import build_index
            store = build_index(
                spark, spark.read.parquet(args.input), args.output,
                cfg=cfg, syn=_load_syn(args), n_shards=args.shards,
                layout=args.layout, store_positions=args.positions,
                source=args.input, resume=args.resume)
            print(json.dumps({"meta": store.meta().__dict__,
                              "shards_done": sorted(store.completed_shards())}))
        elif args.cmd == "query":
            from .index_store import IndexStore
            from .query import search, search_bool
            store = IndexStore(args.index)
            if not (store.path / "meta.json").exists():
                print(f"error: no index at {args.index} "
                      f"(missing meta.json)", file=sys.stderr)
                return 2
            if args.qs:
                from .querystring import query_string
                rows = query_string(
                    spark, store, args.qs, k=args.k,
                    default_operator=args.mode,
                    syn=_load_syn(args),
                    doc_where=args.doc_where).collect()
            elif args.must or args.should or args.must_not:
                rows = search_bool(
                    spark, store, must=args.must, should=args.should,
                    must_not=args.must_not, k=args.k,
                    min_should_match=args.msm,
                    syn=_load_syn(args),
                    doc_where=args.doc_where).collect()
            elif args.text is None:
                print("error: --text or a bool clause is required",
                      file=sys.stderr)
                return 2
            else:
                rows = search(spark, store, args.text,
                              k=args.k, mode=args.mode,
                              phrase=args.phrase,
                              min_should_match=args.msm,
                              syn=_load_syn(args),
                              doc_where=args.doc_where).collect()
            for r in rows:
                print(f"{r['doc_id']}\t{r['score']:.6f}")
        elif args.cmd == "grep":
            from .grep import grep_lines, grep_search
            from .index_store import IndexStore
            store = IndexStore(args.index)
            if not (store.path / "meta.json").exists():
                print(f"error: no index at {args.index} "
                      f"(missing meta.json)", file=sys.stderr)
                return 2
            corpus = spark.read.parquet(args.source)
            text_col = store.meta().text_col
            if text_col not in corpus.columns and "text" in \
                    corpus.columns:
                corpus = corpus.withColumnRenamed("text", text_col)
            if args.lines:
                for r in grep_lines(spark, store, corpus,
                                    args.pattern, text_col=text_col,
                                    doc_where=args.doc_where) \
                        .collect():
                    print(f"{r['doc_id']}:{r['line_no']}:{r['line']}")
            else:
                for r in grep_search(spark, store, corpus,
                                     args.pattern, text_col=text_col,
                                     doc_where=args.doc_where) \
                        .collect():
                    print(f"{r['doc_id']}\t{r['n_matches']}")
        elif args.cmd == "verify":
            from .index_store import IndexStore, verify_content_sha
            n = verify_content_sha(spark, spark.read.parquet(args.input),
                                   IndexStore(args.index))
            print(json.dumps({"sha_mismatches": n}))
            return 0 if n == 0 else 1
        elif args.cmd == "count":
            from .index_store import IndexStore
            from .query import count_matches
            n = count_matches(spark, IndexStore(args.index), args.text,
                              mode=args.mode, phrase=args.phrase,
                              min_should_match=args.msm,
                              syn=_load_syn(args)).collect()[0]["hits"]
            print(n)
        elif args.cmd == "append":
            from .index_store import IndexStore, append_to_index
            store = append_to_index(
                spark, IndexStore(args.index),
                spark.read.parquet(args.input), syn=_load_syn(args),
                source=args.input, batch_tag=args.batch_tag,
                allow_dict_change=args.allow_dict_change)
            print(json.dumps({"meta": store.meta().__dict__}))
        elif args.cmd == "stream":
            from .streaming import stream_ingest
            q = stream_ingest(
                spark, args.input, args.index, args.checkpoint, cfg=cfg,
                syn=_load_syn(args), n_shards_first=args.shards_first,
                poll_files_per_batch=args.files_per_batch,
                dict_path=args.dict_path, mode=args.mode,
                key_cols=args.key_cols.split(",")
                if args.key_cols else None,
                auto_merge_fraction=args.auto_merge_fraction)
            if args.timeout:
                q.awaitTermination(args.timeout)
                q.stop()
            else:
                q.awaitTermination()
        elif args.cmd == "compact":
            from .index_store import IndexStore, compact_index
            store = compact_index(spark, IndexStore(args.index),
                                  args.output,
                                  docs_per_shard=args.docs_per_shard)
            print(json.dumps({"meta": store.meta().__dict__}))
        elif args.cmd == "delete":
            from .deletes import delete_by_query, delete_docs
            from .index_store import IndexStore
            store = IndexStore(args.index)
            if args.query:
                delete_by_query(spark, store, args.query,
                                mode=args.mode, phrase=args.phrase,
                                syn=_load_syn(args),
                                batch_tag=args.batch_tag)
            else:
                delete_docs(
                    spark, store,
                    doc_ids=[int(x) for x in args.ids.split(",")]
                    if args.ids else None,
                    keys=spark.read.parquet(args.keys)
                    if args.keys else None,
                    batch_tag=args.batch_tag)
            m = store.meta()
            print(json.dumps({"n_docs": m.n_docs,
                              "n_deleted": m.n_deleted,
                              "delete_batches": m.delete_batches}))
        elif args.cmd == "merge":
            from .deletes import merge_shards
            from .index_store import IndexStore
            store = IndexStore(args.index)
            merge_shards(
                spark, store,
                shards=[int(x) for x in args.shards.split(",")]
                if args.shards else None,
                min_deleted_fraction=args.min_deleted_fraction)
            m = store.meta()
            print(json.dumps({"n_shards": m.n_shards,
                              "dead_shards": m.dead_shards,
                              "n_purged": m.n_purged,
                              "n_deleted": m.n_deleted}))
        elif args.cmd == "upsert":
            from .deletes import upsert_docs
            from .index_store import IndexStore
            store = IndexStore(args.index)
            upsert_docs(spark, store, spark.read.parquet(args.input),
                        syn=_load_syn(args),
                        key_cols=args.key_cols.split(",")
                        if args.key_cols else None,
                        batch_tag=args.batch_tag,
                        auto_merge_fraction=args.auto_merge_fraction)
            m = store.meta()
            print(json.dumps({"n_docs": m.n_docs,
                              "n_deleted": m.n_deleted}))
    finally:
        if owned:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
