"""NGram-synonym tokenizer: LUCENE-5252 semantics, re-implemented.

Sliding-window n-gram tokenization where dictionary synonym matches act
as anchors: n-grams never straddle a synonym boundary, and in ``expand``
mode boundary partials + stacked alternatives are emitted so phrase
queries crossing the boundary still match. Behavior re-derived from the
reference (`NGramSynonymTokenizer.java`) and pinned token-for-token by
the ported golden fixtures (tests/golden_tokens.json, extracted from
`NGramSynonymTokenizerTest.java:226-1354`).

Layout of the per-block algorithm (reference anchors):
  - block segmentation on delimiters " 　\\t\\n\\r"  (:42,357-379)
  - greedy leftmost-longest dictionary match             (:174-221)
  - per-match emission: gap grams / prev-partials / surface /
    alternatives / after-partials                        (:223-323)
  - order: (start ASC, end ASC, posInc DESC, seq ASC)    (:502-531)
  - consecutive-duplicate elimination (posInc==0 guard)  (:162-172,431-445)

Parity scope: BMP text matches Java token-for-token with default
settings (offsets are code points here, UTF-16 units in Java —
identical for BMP; all reference fixtures are BMP). For non-BMP text
``TokenizerConfig(offsets="utf16")`` restores Java OFFSET parity;
window CONTENT stays code-point based (surrogate-safe — see the
config docstring).

This module is pure Python (no Spark import at top level) so the same
code path serves the executor-side pandas UDF and driver-side query
analysis (reference reuses one analyzer for both, SynonymPluginTest).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

from .synonyms import SynonymDict, _fold

DEFAULT_N = 2
DEFAULT_DELIMITERS = " 　\t\n\r"

# token tuple layout: (word, start, end, pos_inc)
Token = tuple


@dataclass(frozen=True)
class TokenizerConfig:
    """Settings of the analysis component (NGramSynonymTokenizerFactory
    .java:26-31): n, delimiters, expand, ignore_case.

    ``emit_short_blocks=True`` (default) is LUCENE-5252 behavior: a
    block/gap shorter than n emits one whole-span token
    (NGramSynonymTokenizer.java:291-295). False gives ES
    ``nGram(min_gram=n, max_gram=n)`` parity — short runs emit nothing
    — needed to reproduce the reference's msg2 analyzer (plain 2gram +
    synonym token FILTER, SynonymPluginTest.java:92-99).

    ``offsets="utf16"`` reports start/end offsets in UTF-16 code
    UNITS — what the Java reference emits (it reads a char[] buffer,
    NGramSynonymTokenizer.java:297-300) and what an ES client doing
    JS/Java-side substring extraction expects. Default ``"codepoint"``
    counts code points (Python-native). The two agree for all BMP text
    (every reference fixture); for non-BMP text this option restores
    offset parity. Token CONTENT stays code-point windowed either way
    (surrogate pairs are never split — the behavior of every
    post-4.4 Lucene NGramTokenizer; the reference's own char-unit
    windows would emit lone surrogates, unrepresentable in UTF-8
    storage)."""

    n: int = DEFAULT_N
    delimiters: str = DEFAULT_DELIMITERS
    expand: bool = True
    ignore_case: bool = True
    emit_short_blocks: bool = True
    offsets: str = "codepoint"

    def __post_init__(self):
        if self.offsets not in ("codepoint", "utf16"):
            raise ValueError(
                f"offsets must be 'codepoint' or 'utf16', "
                f"got {self.offsets!r}")


@lru_cache(maxsize=64)
def _block_re(delimiters: str) -> re.Pattern:
    return re.compile("[^" + re.escape(delimiters) + "]+")


def blocks(text: str, delimiters: str = DEFAULT_DELIMITERS):
    """(blk_start, block) pairs: maximal non-delimiter runs with global
    char offsets (reference getNextBlock, :357-379)."""
    for m in _block_re(delimiters).finditer(text):
        yield m.start(), m.group(0)


def _find_matches(block: str, syn: SynonymDict) -> list:
    """Greedy leftmost-longest dictionary scan; returns [(start, end)].
    After a match, scanning resumes at its end (:189)."""
    out = []
    s, L = 0, len(block)
    match_end = syn.longest_match_end
    while s < L:
        e = match_end(block, s)
        if e < 0:
            s += 1
        else:
            out.append((s, e))
            s = e
    return out


_SEQ_GRAM = 1 << 31  # Integer.MAX_VALUE stand-in: gram tokens sort after stacked synonyms


def _tokenize_block(block: str, n: int, expand: bool, ignore_case: bool,
                    syn: SynonymDict | None,
                    emit_short: bool = True) -> list:
    """Tokenize one block; returns [(word, start, end, pos_inc)] with
    block-local offsets."""
    matches = _find_matches(block, syn) if syn is not None else []
    L = len(block)

    if not matches:
        # fast path: pure sliding window (:284-301 with no anchors)
        if L < n:
            return [(block, 0, L, 1)] if emit_short else []
        return [(block[i:i + n], i, i + n, 1) for i in range(L - n + 1)]

    toks: list = []  # (start, end, neg_pos_inc, seq, ins, word)
    ins = 0

    def add(word: str, start: int, end: int, pos_inc: int, seq: int = _SEQ_GRAM):
        nonlocal ins
        toks.append((start, end, -pos_inc, seq, ins, word))
        ins += 1

    def partial(start: int, end: int, after_produced: bool):
        # gap grams; short gap -> whole-span token (:284-301)
        if start >= end:
            return
        pos_inc = 0 if after_produced else 1
        if end - start < n:
            if emit_short:
                add(block[start:end], start, end, pos_inc)
            return
        for i in range(start, end - n + 1):
            add(block[i:i + n], i, i + n, pos_inc)
            pos_inc = 1

    def prev_partials(end: int, limit: int):
        # grams of len 1..n-1 ending at the synonym start, posInc=0 (:303-310)
        start = end - 1
        for _len in range(1, n):
            if start < limit:
                break
            add(block[start:end], start, end, 0)
            start -= 1

    def after_partials(start: int, limit: int) -> bool:
        # grams of len 1..n-1 starting at the synonym end; first posInc=1 (:312-323)
        end = start + 1
        pos_inc = 1
        produced = False
        for _len in range(1, n):
            if end > limit:
                break
            add(block[start:end], start, end, pos_inc)
            produced = True
            end += 1
            pos_inc = 0
        return produced

    next_start = 0
    after_produced = False
    for idx, (ms, me) in enumerate(matches):
        partial(next_start, ms, after_produced)
        if expand:
            prev_partials(ms, matches[idx - 1][1] if idx > 0 else 0)
        surface = _fold(block[ms:me]) if ignore_case else block[ms:me]
        add(surface, ms, me, 1, 0)  # anchor token, seq=0 (:405-415)
        if expand and syn is not None:
            # stacked alternatives: rule order, surface excluded (:245-267)
            for i, w in enumerate(syn.mapping.get(surface, ())):
                if w == surface:
                    continue
                add(w, ms, me, 0, i + 1)
        if expand:
            after_produced = after_partials(
                me, matches[idx + 1][0] if idx + 1 < len(matches) else L)
        next_start = me
    partial(next_start, L, after_produced)

    # total order (start, end, posInc DESC, seq, insertion) (:502-531)
    toks.sort()

    # consecutive-duplicate elimination: drop a token iff pos_inc==0 and
    # (word,start,end) equals the previously EMITTED token (:162-172,431-445)
    out: list = []
    prev = None
    for start, end, neg_pi, _seq, _ins, word in toks:
        if prev is not None and neg_pi == 0 and prev[0] == word \
                and prev[1] == start and prev[2] == end:
            continue
        prev = (word, start, end)
        out.append((word, start, end, -neg_pi))
    return out


def tokenize(text: str, cfg: TokenizerConfig = TokenizerConfig(),
             syn: SynonymDict | None = None) -> list:
    """Tokenize a document: [(term, start, end, pos_inc)] with global
    char offsets (blk_start + local, :150-157). Offsets count code
    points, or UTF-16 units with ``cfg.offsets="utf16"`` (Java offset
    parity for non-BMP text — see TokenizerConfig)."""
    out: list = []
    n, expand, ignore_case = cfg.n, cfg.expand, cfg.ignore_case
    emit_short = cfg.emit_short_blocks
    for blk_start, block in blocks(text, cfg.delimiters):
        for word, s, e, pi in _tokenize_block(block, n, expand,
                                              ignore_case, syn, emit_short):
            out.append((word, blk_start + s, blk_start + e, pi))
    if cfg.offsets == "utf16" and out:
        # exclusive prefix sum of per-code-point UTF-16 widths; only
        # computed when requested, so the default path pays nothing
        from itertools import accumulate
        cum = list(accumulate((1 + (ord(c) > 0xFFFF) for c in text),
                              initial=0))
        out = [(w, cum[s], cum[e], pi) for w, s, e, pi in out]
    return out


def tokenize_to_string(text: str, cfg: TokenizerConfig = TokenizerConfig(),
                       syn: SynonymDict | None = None) -> str:
    """Reference test encoding: 'term,start,end,posInc' joined by '/'
    (NGramSynonymTokenizerTest.java:1356-1384)."""
    return "/".join(f"{w},{s},{e},{p}" for w, s, e, p in tokenize(text, cfg, syn))


def positions(tokens: list) -> list:
    """Lucene position per token: cumulative pos_inc - 1."""
    pos, out = -1, []
    for _w, _s, _e, pi in tokens:
        pos += pi
        out.append(pos)
    return out
