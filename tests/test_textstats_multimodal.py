from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import multimodal, textstats


def test_text_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox is in the barn"),
            (2, "!!! ??? ..."),
            (3, "der hund ist nicht da und die katze"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.text_profile(df).collect()}
    assert got[1]["n_tokens"] == 8
    assert got[1]["lang_pred"] == "en"
    assert got[3]["lang_pred"] == "de"
    assert got[2]["punct_ratio"] > 0.5
    assert got[2]["quality"] < got[1]["quality"]
    assert got[4]["n_tokens"] == 0


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", textstats.fingerprint().alias("fp")).collect()}
    assert got[1] == got[3]
    assert got[1] != got[2]


def test_word_topk(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    got = [(r["word"], r["n"]) for r in textstats.word_topk(df, k=2).collect()]
    assert got == [("a", 3), ("b", 2)]


def test_image_feature_plumbing(spark):
    docs = spark.createDataFrame(
        [("d1", "media-00001"), ("d2", "media-00002"), ("d3", None)],
        "doc_id string, media_ref string",
    )
    media = multimodal.attach_fake_payloads(docs)
    feats = {r["doc_id"]: r for r in multimodal.extract_image_features(media).collect()}
    assert feats["d1"]["decode_error"] is None
    assert feats["d1"]["width"] == 4 and feats["d1"]["height"] == 4
    assert 0 <= feats["d1"]["mean_r"] <= 255
    assert feats["d3"]["decode_error"] is not None  # null payload → violation row
    # determinism: same ref → same features
    again = {r["doc_id"]: r for r in multimodal.extract_image_features(media).collect()}
    assert again["d1"]["mean_r"] == feats["d1"]["mean_r"]
    # decoder stamp: downstream must be able to tell stub features from
    # real ones — in this sandbox (no PIL) every row says 'stub'
    assert all(r["decoder"] == multimodal.IMAGE_DECODER for r in again.values())
    assert multimodal.IMAGE_DECODER == ("pil" if multimodal._HAVE_PIL else "stub")


def test_real_image_decoder_roundtrip(spark):
    """Seam check for deployments WITH codec libraries: a real PNG
    decodes to its true pixels through the same operator (skipped in
    this sandbox — no PIL; the routing itself is covered above via the
    decoder stamp)."""
    import pytest
    PIL = pytest.importorskip("PIL")
    import io
    from PIL import Image
    import numpy as np

    buf = io.BytesIO()
    Image.fromarray(np.full((5, 7, 3), 200, dtype=np.uint8)).save(buf, "PNG")
    media = spark.createDataFrame(
        [("d1", "r1", bytearray(buf.getvalue()))],
        "doc_id string, media_ref string, payload binary",
    )
    row = multimodal.extract_image_features(media).collect()[0]
    assert row["decoder"] == "pil"
    assert (row["width"], row["height"]) == (7, 5)
    assert row["mean_r"] == 200.0
    del PIL


def test_frame_sample_plan(spark):
    media = spark.createDataFrame([("d1", 25)], "doc_id string, n_frames int")
    got = multimodal.frame_sample_plan(media, every_n=10).collect()[0]
    assert got["frame_indices"] == [0, 10, 20]


def test_normalize_text_reference_semantics(spark):
    """F3: strip + string.punctuation removal (reference preprocess_text
    documented semantics, gpt_intent_classifier.py:296-314) — verified
    against a pure-Python model using string.punctuation itself."""
    import string
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import textstats as T

    samples = [
        "  Hello, World!  ",
        "a-b c_d e.f",          # '_' is punctuation too
        "!!!",
        "no punct here",
        "tabs\tand\nnewlines, plus   spaces",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r["n"] for r in df.select(T.normalize_text("text").alias("n")).collect()]

    def model(s):
        s = s.strip().lower()
        s = "".join(ch for ch in s if ch not in string.punctuation)
        return " ".join(s.split())

    assert got == [model(s) for s in samples]


def test_remove_stopwords_preserves_order_and_dups(spark):
    from intent_classifier_service_spark.operators import textstats as T

    df = spark.createDataFrame(
        [("the cat and the hat and the cat",)], "text string"
    )
    got = df.select(T.remove_stopwords("text").alias("t")).collect()[0]["t"]
    assert got == ["cat", "hat", "cat"]  # order kept, dup 'cat' kept


def test_normalized_text_strip_punct_dedup_key(spark):
    from intent_classifier_service_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "Hello, world!"), (2, "hello   world"), (3, "other text")],
        "doc_id long, text string",
    )
    groups = dedup.exact_duplicates(
        df.withColumn("text", dedup.normalized_text("text", strip_punct=True))
    ).collect()
    assert len(groups) == 1 and sorted(groups[0]["dup_ids"]) == [1, 2]


def test_resize_images_plumbing(spark):
    from intent_classifier_service_spark.operators import multimodal

    media = multimodal.attach_fake_payloads(
        spark.createDataFrame(
            [("d1", "media-00001"), ("d2", "media-00002"), ("d3", None)],
            "doc_id string, media_ref string",
        )
    )
    rows = {r["doc_id"]: r for r in multimodal.resize_images(media, 8, 6).collect()}
    ok = rows["d1"]
    assert ok["resize_error"] is None
    assert (ok["width"], ok["height"]) == (8, 6)
    assert len(ok["resized"]) == 8 * 6 * 3  # raw RGB bytes
    # deterministic: same ref → same bytes across runs
    again = {r["doc_id"]: r for r in multimodal.resize_images(media, 8, 6).collect()}
    assert again["d1"]["resized"] == ok["resized"]
    bad = rows["d3"]
    assert bad["resized"] is None and bad["resize_error"] is not None


def test_extract_audio_features_plumbing(spark):
    from intent_classifier_service_spark.operators import multimodal

    media = multimodal.attach_fake_payloads(
        spark.createDataFrame(
            [("d1", "media-00001"), ("d2", None)],
            "doc_id string, media_ref string",
        )
    )
    rows = {r["doc_id"]: r for r in multimodal.extract_audio_features(media).collect()}
    ok = rows["d1"]
    assert ok["decode_error"] is None
    assert ok["duration_sec"] == 1.0
    assert 0 < ok["rms"] < 1 and 0 < ok["peak"] <= 1 and 0 < ok["zcr"] < 1
    assert rows["d2"]["decode_error"] is not None


def test_lm_doc_scores_exact_arithmetic(spark):
    """Self-scored unigram LM pinned against a pure-Python reference:
    counts, add-1 smoothing scalars, sorted-order log-prob sums, the
    round-6 avg and the derived perplexity."""
    import math

    rows = [(1, "a a b"), (2, "b c"), (3, "  "), (4, "A  a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["n_tokens"], r["avg_nll"], r["ppl"])
           for r in textstats.lm_doc_scores(docs).collect()}

    # reference: tokens lowercased on \s+, blanks dropped
    toks = {1: ["a", "a", "b"], 2: ["b", "c"], 4: ["a", "a"]}
    cnt = {"a": 4, "b": 2, "c": 1}
    total, v = 7, 3
    denom = total + 1.0 * (v + 1)

    assert set(got) == {1, 2, 4}  # blank doc 3 emits nothing
    for d, ts in toks.items():
        lps = sorted(math.log((cnt[t] + 1.0) / denom) for t in ts)
        s = 0.0
        for x in lps:
            s += x
        avg = round(-s / len(ts), 6)
        assert got[d] == (len(ts), avg, round(math.exp(avg), 4))


def test_lm_doc_scores_foreign_lm_oov_floor(spark):
    """CCNet shape: a CLEAN corpus trains the counts, an ingest batch
    is scored against them — OOV tokens get the smoothed floor
    k/(total + k(V+1)), so an all-OOV doc scores exactly
    -ln(1/denom) per token and ranks worst."""
    import math

    clean = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    lm = textstats.unigram_counts(clean)
    batch = spark.createDataFrame(
        [(10, "a b"), (11, "zz qq")], "doc_id long, text string")
    got = {r["id"]: (r["n_tokens"], r["avg_nll"])
           for r in textstats.lm_doc_scores(batch, lm=lm).collect()}

    total, v = 5, 3
    denom = total + 1.0 * (v + 1)
    floor_nll = round(-math.log(1.0 / denom), 6)
    in_nll = round(-(math.log(3.0 / denom) + math.log(3.0 / denom)) / 2, 6)
    assert got[11] == (2, floor_nll)
    assert got[10] == (2, in_nll)
    assert got[11][1] > got[10][1]  # OOV doc ranks worse
