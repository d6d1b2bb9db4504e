"""Synonym dictionary: Solr-format parsing + longest-match trie.

Re-implements, from observed behavior, the dictionary pipeline of the
reference (SynonymLoader.java:80-114 builds a Lucene ``SynonymMap`` via
``SolrSynonymParser``; entries are analyzed with KeywordTokenizer +
optional LowerCaseFilter, SynonymLoader.java:172-181 — i.e. each
comma-separated entry is ONE term, lowercased iff ``ignore_case``).

The observable contract (NGramSynonymTokenizerTest.java:308-327):
matching is greedy leftmost-longest over a text block; the expansion
set of a matched surface is the rule group in rule order, with the
surface form itself excluded.

Spark-first design: the dictionary is a small driver-side object
(thousands of rules at most); it is shipped to executors inside the
tokenizer UDF closure (pickled once per python worker), the Spark
equivalent of the reference's process-wide shared FST
(SynonymLoader.java:52,76-78).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field


def _split_unescaped(s: str, sep: str) -> list[str]:
    """Split on sep, honoring backslash escapes (Solr rule syntax)."""
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
            continue
        if s.startswith(sep, i):
            parts.append("".join(cur))
            cur = []
            i += len(sep)
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


# code points whose Python str.lower() expands to >1 code point, mapped
# to Java's 1:1 Character.toLowerCase result (UnicodeData.txt simple
# mapping). U+0130 'İ' is the ONLY such code point in Unicode; Java
# maps it to 'i' while Python produces 'i' + U+0307 combining dot.
_LOWER_OVERRIDES = {"İ": "i"}


def _fold(term: str) -> str:
    """Per-code-point lowercase (parity with Java Character.toLowerCase,
    which never expands; Python str.lower can expand e.g. 'İ' -> 'i̇')."""
    out = []
    for ch in term:
        lo = _LOWER_OVERRIDES.get(ch)
        if lo is None:
            lo = ch.lower()
            if len(lo) != 1:
                lo = ch
        out.append(lo)
    return "".join(out)


@dataclass
class SynonymDict:
    """term -> expansion list (rule order); plus a trie for longest match.

    ``expand`` is the PARSER flag (SynonymLoader.java:89-95): for a plain
    group ``a,b,c`` expand=True maps every term to the whole group;
    expand=False maps every term to the first term only. Explicit
    ``lhs => rhs`` rules always map each lhs term to the rhs list.
    """

    expand: bool = True
    ignore_case: bool = True
    mapping: dict[str, list[str]] = field(default_factory=dict)
    # trie: nested dict; "" key marks a terminal node
    _trie: dict = field(default_factory=dict, repr=False)

    # -- construction ------------------------------------------------
    @classmethod
    def parse(cls, rules: str | list[str] | None, expand: bool = True,
              ignore_case: bool = True) -> "SynonymDict | None":
        """Parse Solr-format synonym rules. Returns None for empty rules
        (reference: empty map -> null, SynonymLoader.java:82-85)."""
        if rules is None:
            return None
        if isinstance(rules, str):
            lines = rules.splitlines()
        else:
            lines = list(rules)
        d = cls(expand=expand, ignore_case=ignore_case)
        for raw in lines:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if "=>" in line.replace("\\=>", "\x00"):
                lhs_s, rhs_s = _split_unescaped(line, "=>")[:2]
                lhs = [t for t in (_t.strip() for _t in _split_unescaped(lhs_s, ",")) if t]
                rhs = [t for t in (_t.strip() for _t in _split_unescaped(rhs_s, ",")) if t]
                if ignore_case:
                    lhs, rhs = [_fold(t) for t in lhs], [_fold(t) for t in rhs]
                for t in lhs:
                    d._add(t, rhs)
            else:
                group = [t for t in (_t.strip() for _t in _split_unescaped(line, ",")) if t]
                if ignore_case:
                    group = [_fold(t) for t in group]
                if not group:
                    continue
                targets = group if expand else group[:1]
                for t in group:
                    d._add(t, targets)
        if not d.mapping:
            return None
        d._build_trie()
        return d

    def _add(self, term: str, targets: list[str]) -> None:
        cur = self.mapping.setdefault(term, [])
        for t in targets:
            if t not in cur:
                cur.append(t)

    def _build_trie(self) -> None:
        trie: dict = {}
        for term in self.mapping:
            node = trie
            for ch in term:
                node = node.setdefault(ch, {})
            node[""] = term
        self._trie = trie

    # -- matching ----------------------------------------------------
    def longest_match_end(self, block: str, start: int) -> int:
        """Longest dictionary match starting at ``start``; returns its
        end offset, or -1 (greedy scan semantics of
        NGramSynonymTokenizer.consultDictionary/getLongestMatchOutput,
        :174-221; fold per char when ignore_case, :203)."""
        node = self._trie
        best = -1
        i = start
        fold = self.ignore_case
        while i < len(block):
            ch = block[i]
            if fold:
                ch = _fold(ch)
            node = node.get(ch)
            if node is None:
                return best
            i += 1
            if "" in node:
                best = i
        return best

    def alternatives(self, surface: str) -> list[str]:
        """Expansion set for a matched surface: mapped words in rule
        order, surface excluded (NGramSynonymTokenizerTest.java:308-327)."""
        return [w for w in self.mapping.get(surface, []) if w != surface]

    # -- wordnet format (SynonymLoader.java:89-91) --------------------
    @classmethod
    def parse_wordnet(cls, rules: str | list[str] | None,
                      expand: bool = True,
                      ignore_case: bool = True) -> "SynonymDict | None":
        """WordNet prolog format: ``s(<synset>,<num>,'<word>',...).``
        Words sharing a synset id form a group (quote escape: '')."""
        if rules is None:
            return None
        lines = rules.splitlines() if isinstance(rules, str) else rules
        groups: dict[str, list[str]] = {}
        rx = re.compile(r"^s\(\s*(\d+)\s*,\s*\d+\s*,\s*'((?:[^']|'')*)'")
        for raw in lines:
            m = rx.match(raw.strip())
            if not m:
                continue
            word = m.group(2).replace("''", "'")
            g = groups.setdefault(m.group(1), [])
            if word not in g:
                g.append(word)
        d = cls(expand=expand, ignore_case=ignore_case)
        for g in groups.values():
            terms = [_fold(t) for t in g] if ignore_case else g
            targets = terms if expand else terms[:1]
            for t in terms:
                d._add(t, targets)
        if not d.mapping:
            return None
        d._build_trie()
        return d

    # -- lineage -----------------------------------------------------
    def fingerprint(self) -> str:
        """Stable sha256 of the rule mapping, recorded in build lineage
        (the batch analogue of reload mtimes, SynonymLoader.java:40-43)."""
        blob = json.dumps(
            {"expand": self.expand, "ignore_case": self.ignore_case,
             "mapping": {k: self.mapping[k] for k in sorted(self.mapping)}},
            ensure_ascii=False, sort_keys=True)
        return hashlib.sha256(blob.encode("utf-8")).hexdigest()
