"""Token-level synonym filter (SURVEY §2.3 — the reference's second
analysis component, `SynonymFilter`, a fork of Lucene's classic
FST-driven filter re-expressed over token streams).

Semantics implemented (observable contract of the reference):
greedy earliest-longest matching of consecutive-token sequences
against the dictionary (multi-word entries split on whitespace, the
factory's default tokenizer — SynonymTokenFilterFactory.java:31,45-52);
on a match, alternatives stack at the match-start position with
pos_inc=0; originals are kept when the mapping includes them
(SolrSynonymParser expand=true ⇒ identity mappings ⇒ keepOrig).

Exposed as a pure function (driver-side query analysis) and a
DataFrame transform over the tokens table (Arrow-batched per-doc
groups). Not on the BM25 critical path — tokenizer-level expansion
already subsumes it there (SURVEY §2.3 scope decision).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .synonyms import SynonymDict, _fold


def _multi_map(syn: SynonymDict) -> dict:
    """dict key: tuple of words -> list of output word-tuples."""
    out = {}
    for term, targets in syn.mapping.items():
        key = tuple(term.split(" "))
        out[key] = [tuple(t.split(" ")) for t in targets]
    return out


def expand_tokens(words: list, syn: SynonymDict,
                  ignore_case: bool = False) -> list:
    """words: [(word, pos_inc)] -> expanded [(word, pos_inc)].

    Greedy earliest-longest multi-token match; stacked alternatives are
    emitted with pos_inc=0 after the original sequence's first token.
    Multi-word outputs emit as consecutive tokens (pos_inc=1 chains).
    """
    mm = _multi_map(syn)
    max_len = max((len(k) for k in mm), default=1)
    out: list = []
    i = 0
    n = len(words)
    while i < n:
        matched = None
        surface = None
        for L in range(min(max_len, n - i), 0, -1):
            cand = tuple(_fold(w) if ignore_case else w
                         for w, _ in words[i:i + L])
            if cand in mm:
                matched, surface = mm[cand], cand
                break
        if matched is None:
            out.append(words[i])
            i += 1
            continue
        L = len(surface)
        # originals kept (identity mapping present with expand=true)
        keep_orig = surface in matched
        if keep_orig:
            out.append(words[i])
            out.extend((w, 1) for w, _ in words[i + 1:i + L])
        first = True
        for alt in matched:
            if alt == surface:
                continue
            pos_inc = 0 if (keep_orig or not first) else words[i][1]
            first = False
            out.append((alt[0], pos_inc))
            out.extend((w, 1) for w in alt[1:])
        if not keep_orig and first:
            # mapping with no outputs other than surface: keep original
            out.append(words[i])
            out.extend(words[i + 1:i + L])
        i += L
    return out


def expand_tokens_df(tokens: DataFrame, syn: SynonymDict,
                     ignore_case: bool = False) -> DataFrame:
    """Apply the filter to a tokens DataFrame (doc_id, term, pos,
    pos_inc ...) — per-doc Arrow-batched groups, order by pos."""
    cols = "doc_id long, term string, pos int, pos_inc int"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos", kind="stable")
        words = list(zip(pdf["term"], pdf["pos_inc"]))
        expanded = expand_tokens(words, syn, ignore_case)
        pos, poss, pincs, terms = -1, [], [], []
        for w, pi in expanded:
            pos += pi
            terms.append(w)
            poss.append(pos)
            pincs.append(pi)
        return pd.DataFrame({
            "doc_id": np.full(len(terms), key[0], dtype=np.int64),
            "term": terms,
            "pos": np.asarray(poss, dtype=np.int32),
            "pos_inc": np.asarray(pincs, dtype=np.int32),
        })

    return tokens.select("doc_id", "term", "pos", "pos_inc") \
        .groupBy("doc_id").applyInPandas(run, schema=cols)
