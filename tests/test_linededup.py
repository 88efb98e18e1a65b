"""Cross-document line dedup (operators/linededup.py): handcrafted
first-occurrence semantics, a brute-force python cross-check, hash ==
exact keying parity, and the broadcast plan shape."""

from __future__ import annotations

import pytest

from urlmap_spark.operators.linededup import remove_duplicate_lines


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in remove_duplicate_lines(df, **kw).collect()}


def _brute(rows):
    seen, out = set(), {}
    for i, text in sorted(rows):
        kept, removed = [], 0
        for line in text.split("\n"):
            if line in seen:
                removed += 1
            else:
                seen.add(line)
                kept.append(line)
        out[i] = ("\n".join(kept), len(text.split("\n")), removed)
    return out


ROWS = [
    (0, "alpha beta\ncookie banner\ngamma"),
    (1, "cookie banner\ndelta epsilon\ncookie banner"),
    (2, "zeta\ndelta epsilon\ncookie banner\neta"),
    (3, "unique only\nlines here"),
]


def test_first_occurrence_semantics(spark):
    got = _run(spark, ROWS)
    # doc 0 keeps everything (it owns the first 'cookie banner')
    assert got[0]["text"] == ROWS[0][1] and got[0]["n_removed"] == 0
    # doc 1 loses BOTH copies (cross-doc dup + its own within-doc repeat)
    assert got[1]["text"] == "delta epsilon" and got[1]["n_removed"] == 2
    # doc 2 loses the two lines docs 0/1 already claimed
    assert got[2]["text"] == "zeta\neta" and got[2]["n_removed"] == 2
    assert got[3]["n_removed"] == 0 and got[3]["n_lines"] == 2


def test_vs_brute_force_and_key_parity(spark):
    rows = [(i, "\n".join(f"line {(i * 7 + j * 3) % 11}" for j in range(5)))
            for i in range(20)]
    want = _brute(rows)
    for key in ("hash", "exact"):
        got = _run(spark, rows, key=key)
        for i, (text, n_lines, n_removed) in want.items():
            assert (got[i]["text"], got[i]["n_lines"], got[i]["n_removed"]) \
                == (text, n_lines, n_removed), (key, i)


def test_empty_and_identical_docs(spark):
    got = _run(spark, [(0, ""), (1, ""), (2, "same\nsame")])
    assert got[0]["text"] == "" and got[0]["n_removed"] == 0
    # doc 1's '' line is a dup of doc 0's — rewritten text is still ''
    assert got[1]["text"] == "" and got[1]["n_removed"] == 1
    # within-doc repeat collapses
    assert got[2]["text"] == "same" and got[2]["n_removed"] == 1


def test_extra_columns_pass_through(spark):
    df = spark.createDataFrame(
        [(0, "a\nb", "x"), (1, "b\nc", "y")],
        "doc_id long, text string, tag string")
    got = {r["doc_id"]: r.asDict()
           for r in remove_duplicate_lines(df).collect()}
    assert got[1]["tag"] == "y" and got[1]["text"] == "c"


def test_broadcast_hint_and_rejects_bad_key(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = remove_duplicate_lines(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="key"):
        remove_duplicate_lines(df, key="md5")
