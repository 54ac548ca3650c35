"""Metric parity vs hand-computed reference formulas
(gpt_intent_classifier.py:669-967 semantics, computed in pure Python
on the same rows — sklearn is not in the sandbox, so the formulas are
transliterated: P=tp/(tp+fp), R=tp/(tp+fn), zero_division=0)."""

import itertools

from intent_classifier_service_spark.operators import metrics as M

ROWS = [
    ("r1", ["flight"], ["flight", "airfare", "city"]),
    ("r2", ["airfare"], ["flight", "city", "meal"]),          # miss
    ("r3", ["flight", "airfare"], ["airfare", "flight", "x"]),
    ("r4", ["city"], ["city", "city", "meal"]),
    ("r5", ["meal"], ["flight", "airfare", "city"]),           # miss
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "id string, actual array<string>, predicted array<string>"
    )


def _expected_counts():
    classes = sorted({c for _, a, p in ROWS for c in a + p})
    out = {}
    for c in classes:
        tp = sum(1 for _, a, p in ROWS if c in a and c in p)
        fp = sum(1 for _, a, p in ROWS if c not in a and c in p)
        fn = sum(1 for _, a, p in ROWS if c in a and c not in p)
        support = sum(1 for _, a, p in ROWS if c in a)
        out[c] = (tp, fp, fn, support)
    return out


def test_subset_accuracy(spark):
    got = M.subset_accuracy(_df(spark)).collect()[0]["subset_accuracy"]
    expected = sum(1 for _, a, p in ROWS if set(a) <= set(p)) / len(ROWS)
    assert abs(got - expected) < 1e-9


def test_incorrect_predictions(spark):
    rows = M.incorrect_predictions(_df(spark), "id").collect()
    assert {r["doc_id"] for r in rows} == {"r2", "r5"}
    assert all(r["rule_id"] == "R-EVAL-SUBSET" for r in rows)


def test_per_class_counts_and_prf(spark):
    got = {r["class"]: r for r in M.per_class_prf(M.per_class_counts(_df(spark))).collect()}
    for c, (tp, fp, fn, support) in _expected_counts().items():
        r = got[c]
        assert (r["tp"], r["fp"], r["fn"], r["support"]) == (tp, fp, fn, support), c
        assert r["tn"] == len(ROWS) - tp - fp - fn
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        assert abs(r["precision"] - prec) < 1e-9
        assert abs(r["recall"] - rec) < 1e-9
        assert abs(r["f1"] - f1) < 1e-9


def test_averaged_metrics(spark):
    prf = M.per_class_prf(M.per_class_counts(_df(spark)))
    got = {r["average"]: r for r in M.averaged_metrics(prf).collect()}
    exp = _expected_counts()
    per = {}
    for c, (tp, fp, fn, support) in exp.items():
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        per[c] = (prec, rec, f1, support)
    n = len(per)
    assert abs(got["macro"]["precision"] - sum(v[0] for v in per.values()) / n) < 1e-9
    assert abs(got["macro"]["f1"] - sum(v[2] for v in per.values()) / n) < 1e-9
    tps = sum(v[0] for v in exp.values())
    fps = sum(v[1] for v in exp.values())
    fns = sum(v[2] for v in exp.values())
    mp = tps / (tps + fps)
    mr = tps / (tps + fns)
    assert abs(got["micro"]["precision"] - mp) < 1e-9
    assert abs(got["micro"]["recall"] - mr) < 1e-9
    tot_support = sum(v[3] for v in per.values())
    wp = sum(v[0] * v[3] for v in per.values()) / tot_support
    assert abs(got["weighted"]["precision"] - wp) < 1e-9


def test_cooccurrence_matrix(spark):
    got = {
        (r["actual_class"], r["predicted_class"]): r["n"]
        for r in M.cooccurrence_matrix(_df(spark)).collect()
    }
    expected = {}
    for _, a, p in ROWS:
        for x, y in itertools.product(a, p):
            expected[(x, y)] = expected.get((x, y), 0) + 1
    assert got == expected
