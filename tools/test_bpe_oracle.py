#!/usr/bin/env python3
"""Pin the q147 BPE-train oracle SQL to greedy-fold merge semantics.

Usage: python3 tools/test_bpe_oracle.py [oracle_sql.json]
       (default /tmp/verify_out/oracle_sql.json)

The driver's CORRECTNESS gate runs the oracle over the generated corpus,
which happens to contain no repeated-pair runs — precisely the case where
a space-padded `replace` diverges from the trainer's pending-symbol fold
('aaaaa' folds to [aa,aa,a]; one replace leaves [aa,a,aa], corrupting the
next step's pair census). This test plants such a corpus, runs the DUMPED
q147 oracle SQL over it in DuckDB, and checks the learned merge table
against an independent Python reimplementation of the fold.
"""
import json
import sys

import duckdb


def bpe_train(words, n_merges):
    """Independent reference trainer: word histogram + greedy fold."""
    from collections import Counter

    hist = Counter(words)
    syms = {w: list(w) for w in hist}
    merges = []
    for step in range(1, n_merges + 1):
        census = Counter()
        for w, ss in syms.items():
            for i in range(len(ss) - 1):
                census[(ss[i], ss[i + 1])] += hist[w]
        if not census:
            break
        (l, r), n = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, n, l + r))
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return merges, syms


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
    sql = json.load(open(path))["q147_bpe_train"]

    # Trap corpus: odd + even self-pair runs and an alternating run.
    text = "aaaaa aaaa abab ab"
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 0::BIGINT AS doc_id, ? AS text", [text])
    got = [tuple(r) for r in con.execute(sql).fetchall()]

    merges, _ = bpe_train(text.split(), n_merges=8)
    want = [(s, l, r, n, m) for (s, l, r, n, m) in merges]
    # Oracle columns: step, lhs, rhs, pair_count, new_token
    ok = got == want
    print(f"oracle : {got}")
    print(f"fold   : {want}")
    # Hand-computed first three steps (documented in TextStats4Spec):
    head = [(1, "a", "a", 7, "aa"), (2, "a", "b", 3, "ab"),
            (3, "aa", "aa", 2, "aaaa")]
    assert want[:3] == head, f"reference trainer drifted: {want[:3]}"
    if not ok:
        print("FAIL: q147 oracle diverges from the greedy fold on planted runs")
        sys.exit(1)
    print("PASS: q147 oracle == greedy fold on the planted trap corpus")


if __name__ == "__main__":
    main()
