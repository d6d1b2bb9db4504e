"""Token-level synonym filter (SURVEY §2.3 — the reference's second
analysis component, `SynonymFilter`, a fork of Lucene's classic
FST-driven filter re-expressed over token streams).

Semantics implemented (observable contract of the reference):

- Greedy earliest-longest matching of consecutive-token sequences
  against the dictionary. Dictionary entries are analyzed by a
  configurable ``entry_tokenizer`` (default: whitespace split — the
  factory's default tokenizer, SynonymTokenFilterFactory.java:31,45-52).
- On a match spanning L input tokens, outputs stack at the MATCH START
  position (SynonymFilter.java:544-644): originals are kept when the
  mapping includes the surface (SolrSynonymParser expand=true ⇒
  identity mappings ⇒ keepOrig), alternatives follow in rule order
  with pos_inc=0.
- Position length (SynonymFilter.addOutput, :472-526): an output with
  M words places word i at match position p+i; words before the last
  get pos_len=1, the last word absorbs the remaining match span,
  pos_len = max(1, L - (M-1)). A single-word output for a multi-token
  match therefore spans the whole match (pos_len=L) — this is what
  lets "new york"→"ny" phrase-match downstream.
- When M > L the extra output words extend positions past the match
  (pos_inc=1 chains) — the classic (non-graph) SynonymFilter behavior
  the reference forks; the flaw it implies for following-token
  adjacency is reference parity, not an accident.

Configuration errors fail fast: a filter without a dictionary raises,
mirroring SynonymTokenFilterFactory.java:55-63 (throws when neither
``synonyms`` nor ``synonyms_path`` is set).

Exposed as a pure function (driver-side query analysis), a DataFrame
transform over the tokens table (Arrow-batched per-doc groups), and —
round 3 — a full analyzer composition: ``synonym_token_filter`` plugs
into ``build_index(token_filter=...)`` (the reference's
2gram_synonym_analyzer / 2gram_reload_analyzer deployments,
SynonymPluginTest.java:488-626) and ``analyze_query_filtered`` builds
the matching query-side groups for ``search(groups=...)``.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .synonyms import SynonymDict, _fold


def _require(syn: SynonymDict | None) -> SynonymDict:
    if syn is None:
        raise ValueError(
            "synonym filter requires a dictionary: pass non-empty "
            "`synonyms` rules or a `synonyms_path` (the reference "
            "factory throws here — SynonymTokenFilterFactory.java:55-63)")
    return syn


def _multi_map(syn: SynonymDict,
               entry_tokenizer: Callable[[str], list[str]] | None = None
               ) -> dict:
    """dict key: tuple of words -> list of output word-tuples.

    ``entry_tokenizer`` analyzes dictionary entries into token
    sequences (reference: a configurable analyzer, default whitespace —
    SynonymTokenFilterFactory.java:45-52)."""
    tok = entry_tokenizer or str.split
    out = {}
    for term, targets in syn.mapping.items():
        key = tuple(tok(term))
        if not key:
            continue
        out[key] = [tuple(tok(t)) for t in targets if tok(t)]
    return out


def expand_tokens(words: list, syn: SynonymDict,
                  ignore_case: bool = False,
                  entry_tokenizer: Callable[[str], list[str]] | None = None
                  ) -> list:
    """words: [(word, pos_inc)] -> expanded [(word, pos_inc, pos_len)].

    Greedy earliest-longest multi-token match; emission is
    position-by-position across the match span: at match position p+q
    the surviving original (if keepOrig) comes first, then each
    alternative's q-th word stacked with pos_inc=0. pos_len per the
    module contract (last output word absorbs the remaining span).
    """
    mm = _multi_map(_require(syn), entry_tokenizer)
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
            out.append((words[i][0], words[i][1], 1))
            i += 1
            continue
        L = len(surface)
        keep_orig = surface in matched
        alts = [a for a in matched if a != surface]
        if not keep_orig and not alts:
            # mapping with no outputs other than surface: keep original
            out.append((words[i][0], words[i][1], 1))
            out.extend((w, pi, 1) for w, pi in words[i + 1:i + L])
            i += L
            continue
        # emission position-by-position over the match span (and past
        # it when some alternative has more words than the span)
        span = max([L if keep_orig else 0] + [len(a) for a in alts])
        first_pi = words[i][1]
        for q in range(span):
            emitted_here = False
            if keep_orig and q < L:
                out.append((words[i + q][0], first_pi if q == 0 else 1, 1))
                emitted_here = True
            for a in alts:
                if q >= len(a):
                    continue
                if q == len(a) - 1:
                    plen = max(1, L - (len(a) - 1))
                else:
                    plen = 1
                if emitted_here:
                    pi = 0
                elif q == 0:
                    pi = first_pi
                else:
                    pi = 1
                out.append((a[q], pi, plen))
                emitted_here = True
        i += L
    return out


def synonym_token_filter(syn: SynonymDict, ignore_case: bool = False,
                         entry_tokenizer: Callable[[str], list[str]]
                         | None = None) -> Callable[[list], list]:
    """A ``token_filter`` for ``build_index``/``append_to_index`` —
    the classic SynonymFilter composed after the tokenizer (the
    reference's 2gram_synonym_analyzer / 2gram_reload_analyzer shape,
    SynonymPluginTest.java:488-538). ``entry_tokenizer`` analyzes
    dictionary entries with the SAME tokenizer as the text (ES
    analyzes filter rules with the pipeline's analyzer), so an entry
    like とうきょう becomes its bigram sequence and a matched token
    expands into a multi-position output chain — exactly the
    reference's _analyze stream 東京/とう/うき/きょ/ょう
    (SynonymPluginTest.java:573-580).

    Offsets are collapsed (the index stores positions, not offsets).
    posLength is CARRIED (5-tuple output; v6 indexes persist it as
    pl_bytes): a single-token output for an L-token match spans L
    positions (SynonymFilter.java:472-526), which is what lets
    "united states => usa" phrase-match "in usa today" against a doc
    saying "in united states today" via graph adjacency."""
    def f(toks: list) -> list:
        words = [(w, pi) for w, _s, _e, pi in toks]
        return [(w, 0, 0, pi, pl) for w, pi, pl in
                expand_tokens(words, syn, ignore_case, entry_tokenizer)]
    return f


def analyze_query_filtered(text: str, cfg, syn: SynonymDict,
                           ignore_case: bool = False,
                           entry_tokenizer: Callable[[str], list[str]]
                           | None = None) -> list[list[str]]:
    """Query analysis for the reference's msg2 analyzer shape — a
    plain tokenizer followed by the synonym token FILTER
    (SynonymPluginTest.java:92-99: ``2gram_analyzer`` = nGram(2,2) +
    synonym filter). Tokenizes ``text`` with ``cfg`` (use
    ``TokenizerConfig(emit_short_blocks=False)`` for ES nGram parity:
    a 1-char query analyzes to NOTHING, so e.g. msg2:"あ" counts 0,
    SynonymPluginTest.java:162), runs the filter over the token
    stream, and groups the expanded words by position — per-position
    alternative groups for ``search(..., groups=)`` /
    ``count_matches(..., groups=)``."""
    from .tokenizer import tokenize
    words = [(w, pi) for w, _s, _e, pi in tokenize(text, cfg, None)]
    expanded = expand_tokens(words, syn, ignore_case, entry_tokenizer)
    groups: list[list[str]] = []
    pos = -1
    for w, pi, _pl in expanded:
        pos += pi
        while len(groups) <= pos:
            groups.append([])
        if w not in groups[pos]:
            groups[pos].append(w)
    return [g for g in groups if g]


def phrase_match(stream: list, phrase: list[str]) -> bool:
    """Does the expanded token graph contain ``phrase`` along
    consecutive graph edges? A token occupies graph span
    [pos, pos + pos_len); tokens are adjacent when the next one starts
    where the previous ends — how MultiPhraseQuery consumes posLen.
    ``stream``: [(word, pos_inc, pos_len)]."""
    if not phrase:
        return True
    pos = -1
    nodes = []
    for w, pi, pl in stream:
        pos += pi
        nodes.append((w, pos, pos + pl))
    frontier = {e for w, s, e in nodes if w == phrase[0]}
    for target in phrase[1:]:
        frontier = {e for w, s, e in nodes
                    if w == target and s in frontier}
        if not frontier:
            return False
    return True


def expand_tokens_df(tokens: DataFrame, syn: SynonymDict,
                     ignore_case: bool = False,
                     entry_tokenizer: Callable[[str], list[str]] | None
                     = None) -> DataFrame:
    """Apply the filter to a tokens DataFrame (doc_id, term, pos,
    pos_inc ...) — per-doc Arrow-batched groups, order by pos."""
    _require(syn)
    cols = "doc_id long, term string, pos int, pos_inc int, pos_len int"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive shuffle-ordered: sort by (pos, pos_inc DESC) so the
        # position-taking token (pos_inc=1) precedes stacked ones and the
        # pos_inc chain reconstructs deterministically. Matching assumes
        # a single-path stream (pi=1 tokens); stacked alternatives pass
        # through but don't participate in multi-token surface matches.
        pdf = pdf.sort_values(["pos", "pos_inc"], ascending=[True, False],
                              kind="stable")
        words = list(zip(pdf["term"], pdf["pos_inc"]))
        expanded = expand_tokens(words, syn, ignore_case, entry_tokenizer)
        pos, poss, pincs, plens, terms = -1, [], [], [], []
        for w, pi, pl in expanded:
            pos += pi
            terms.append(w)
            poss.append(pos)
            pincs.append(pi)
            plens.append(pl)
        return pd.DataFrame({
            "doc_id": np.full(len(terms), key[0], dtype=np.int64),
            "term": terms,
            "pos": np.asarray(poss, dtype=np.int32),
            "pos_inc": np.asarray(pincs, dtype=np.int32),
            "pos_len": np.asarray(plens, dtype=np.int32),
        })

    return tokens.select("doc_id", "term", "pos", "pos_inc") \
        .groupBy("doc_id").applyInPandas(run, schema=cols)
