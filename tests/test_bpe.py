"""BPE merge learning: invariants plus an independent pure-Python
replay of the whole algorithm (a third implementation besides the
Spark plan and the DuckDB oracle — catches errors the cross-engine
hash can't, e.g. a shared misreading of the merge rule)."""

import re
from collections import Counter

from engine.io import load_table
from engine.operators.bpe import BPE_MERGES, _WORD_RE, bpe_merges
from tests.conftest import SF_SMOKE


def _python_bpe(word_freq: dict[str, int], k: int):
    seqs = {w: tuple(w) for w in word_freq}
    merges = []
    for _ in range(k):
        counts = Counter()
        for w, s in seqs.items():
            f = word_freq[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def test_bpe_matches_pure_python_replay(spark):
    got = sorted(
        (r["step"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_merges(spark, SF_SMOKE).collect()
    )
    assert [g[0] for g in got] == list(range(BPE_MERGES))
    # max pair count is non-increasing: merging can only remove
    # occurrences of existing pairs, and any newly created pair is
    # bounded by the merged pair's count.
    cnts = [g[3] for g in got]
    assert all(x >= y for x, y in zip(cnts, cnts[1:]))

    docs = load_table(spark, SF_SMOKE, "documents")
    rx = re.compile(_WORD_RE.replace("\\z", "\\Z"))  # Python spells absolute-end \Z, Java \z
    wf = Counter()
    for row in docs.select("text").collect():
        for w in row["text"].lower().split(" "):
            if rx.match(w):
                wf[w] += 1
    expect = [
        (t, a, b, c) for t, (a, b, c) in enumerate(_python_bpe(wf, BPE_MERGES))
    ]
    assert got == expect


def test_bpe_encode_matches_pure_python(spark):
    """Per-doc token counts from bpe_encode_docs == encoding every doc
    with the pure-Python merge replay above."""
    from engine.operators.bpe import bpe_encode_docs

    docs = load_table(spark, SF_SMOKE, "documents")
    rx = re.compile(_WORD_RE.replace("\\z", "\\Z"))  # Python spells absolute-end \Z, Java \z
    wf = Counter()
    doc_words: dict[int, list[str]] = {}
    for row in docs.select("doc_id", "text").collect():
        ws = [w for w in row["text"].lower().split(" ") if rx.match(w)]
        doc_words[row["doc_id"]] = ws
        wf.update(ws)

    # replay merges, then encode the vocabulary
    seqs = {w: tuple(w) for w in wf}
    for a, b, _ in _python_bpe(wf, BPE_MERGES):
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    expect = {
        d: sum(len(seqs[w]) for w in ws) for d, ws in doc_words.items() if ws
    }
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_docs(spark, SF_SMOKE).collect()
    }
    assert got == expect
