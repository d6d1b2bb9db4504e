"""Extract golden tokenization fixtures from the reference test suite.

Scans ``NGramSynonymTokenizerTest.java`` (reference, read-only) for the
regular pattern

    a = new NGramSynonymTokenizerTestAnalyzer(n[, expand, "rules"]);
    stream = a.tokenStream("f", new StringReader("TEXT"));
    assertTokenStream(stream, "EXPECTED");

and emits one JSON record per assertion:
``{"id", "n", "expand", "synonyms", "text", "expected"}`` where
``synonyms`` is the Solr-format rule string ('/' = newline, as in the
test helper) and ``expected`` is the reference's own
``term,start,end,posInc`` '/'-joined encoding
(NGramSynonymTokenizerTest.java:1356-1384).

This extracts test DATA (expected behavior), not code. Output:
tests/golden_tokens.json — committed so tests don't depend on the
reference tree at runtime.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF = Path("/root/reference/src/test/java/org/codelibs/elasticsearch/synonym/analysis/NGramSynonymTokenizerTest.java")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden_tokens.json"

ANALYZER_RE = re.compile(
    r"new NGramSynonymTokenizerTestAnalyzer\(\s*(\d+)\s*(?:,\s*(true|false)\s*(?:,\s*\"([^\"]*)\")?)?\)"
)
READER_RE = re.compile(r"new StringReader\(\"([^\"]*)\"\)")
ASSERT_RE = re.compile(r"assertTokenStream\(stream,\s*\"([^\"]*)\"\)")
TEST_RE = re.compile(r"public void (test\w+)\(")


def main() -> None:
    cases = []
    n, expand, synonyms, text, test_name = None, False, None, None, "?"
    seq_in_test = 0
    for lineno, line in enumerate(REF.read_text(encoding="utf-8").splitlines(), 1):
        m = TEST_RE.search(line)
        if m:
            test_name = m.group(1)
            seq_in_test = 0
        m = ANALYZER_RE.search(line)
        if m:
            n = int(m.group(1))
            expand = m.group(2) == "true"
            synonyms = m.group(3)  # may be None
        m = READER_RE.search(line)
        if m:
            text = m.group(1)
        m = ASSERT_RE.search(line)
        if m:
            assert n is not None and text is not None, f"dangling assert at line {lineno}"
            seq_in_test += 1
            cases.append(
                {
                    "id": f"{test_name}#{seq_in_test}",
                    "line": lineno,
                    "n": n,
                    "expand": expand,
                    "synonyms": synonyms,
                    "text": text,
                    "expected": m.group(1),
                }
            )
    OUT.write_text(json.dumps(cases, ensure_ascii=False, indent=1), encoding="utf-8")
    print(f"wrote {len(cases)} cases -> {OUT}")


if __name__ == "__main__":
    main()
