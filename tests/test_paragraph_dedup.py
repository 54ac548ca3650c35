"""Paragraph-level exact dedup (operators/dedup.paragraph_duplicates /
strip_duplicate_paragraphs): cross-document boilerplate detection at
paragraph grain — the Lee et al. within-corpus substring problem. The
driver-facing oracle parity lives in driver_queries
(paragraph_dedup / strip_dup_paragraphs entries); these pin the
operator semantics on planted boilerplate the synthetic corpus can't
produce (within-doc repeats, all-paragraphs-stripped docs, short-line
exclusion)."""

from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import dedup

BOILER = "subscribe to our newsletter for updates today"  # 45 chars
FOOTER = "copyright example corp all rights reserved now"  # 46 chars


def _docs(spark):
    rows = [
        (1, f"{BOILER}\nunique text one\nalpha beta gamma delta epsilon zeta"),
        (2, f"{BOILER}\nunique text two"),
        (3, "totally unique document paragraph content here"),
        # within-doc repeat of its OWN unique para — not cross-doc
        (4, "self quoted paragraph repeated inside one doc\n"
            "self quoted paragraph repeated inside one doc"),
        # repeats the shared boilerplate twice
        (5, f"{BOILER}\n{BOILER}\n{FOOTER}"),
        (6, FOOTER),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_duplicates_flags_cross_doc_only(spark):
    out = dedup.paragraph_duplicates(_docs(spark), keep_text=True).collect()
    got = {(r["doc_id"], r["para_index"]): (r["para"], r["n_docs_sharing"])
           for r in out}
    # BOILER occurrences: docs 1,2 at para 0; doc 5 at paras 0 and 1 —
    # 4 occurrence rows, 3 distinct docs sharing
    assert got[(1, 0)] == (BOILER, 3)
    assert got[(2, 0)] == (BOILER, 3)
    assert got[(5, 0)] == (BOILER, 3)
    assert got[(5, 1)] == (BOILER, 3)
    # FOOTER shared by docs 5 and 6
    assert got[(5, 2)] == (FOOTER, 2)
    assert got[(6, 0)] == (FOOTER, 2)
    # doc 4's within-doc repeat is NOT flagged (distinct-doc count = 1);
    # doc 3 is clean; short lines ('unique text one') never analyzed
    assert set(got) == {(1, 0), (2, 0), (5, 0), (5, 1), (5, 2), (6, 0)}


def test_strip_keeps_globally_first_occurrence(spark):
    out = {r["doc_id"]: r["text"]
           for r in dedup.strip_duplicate_paragraphs(_docs(spark)).collect()}
    # every input doc comes back
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # doc 1 holds the first BOILER occurrence — untouched (re-joined)
    assert out[1] == (f"{BOILER}\nunique text one\n"
                      "alpha beta gamma delta epsilon zeta")
    # doc 2 loses BOILER, keeps its short line
    assert out[2] == "unique text two"
    assert out[3] == "totally unique document paragraph content here"
    # within-doc-only repeat is not corpus boilerplate — doc 4 intact
    assert out[4] == ("self quoted paragraph repeated inside one doc\n"
                      "self quoted paragraph repeated inside one doc")
    # doc 5: both BOILER copies stripped (doc 1 holds the keeper);
    # FOOTER's first occurrence is (5, 2) — kept
    assert out[5] == FOOTER
    # doc 6 loses FOOTER entirely → empty text, row preserved
    assert out[6] == ""


def test_strip_is_idempotent(spark):
    once = dedup.strip_duplicate_paragraphs(_docs(spark))
    twice = dedup.strip_duplicate_paragraphs(once)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


def test_paragraph_dedup_no_cartesian(spark):
    """Candidate generation is hash-equi-join only at any scale."""
    docs = _docs(spark)
    for df in (dedup.paragraph_duplicates(docs),
               dedup.strip_duplicate_paragraphs(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
