"""Expression parity with the reference's operators — exact values, including
the reference's own unit-test expectations
(/root/reference/tests/test_event_processor.py,
 /root/reference/tests/test_metrics_calculator.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.functions import events as EV
from nostr_data_pipeline_spark.functions import metrics as M
from nostr_data_pipeline_spark.functions.content import content_sha256, fingerprint_series


def one(spark, **cols):
    return spark.createDataFrame([Row(**cols)])


# --- C-family ---------------------------------------------------------------

def test_hashtag_extraction(spark):
    # mirrors tests/test_event_processor.py:42-52
    df = one(
        spark,
        content="Testing multiple #hashtags in #one post! #Tagged",
        tags=[["t", "nostr"], ["p", "abc"]],
    )
    got = df.select(EV.extract_hashtags(F.col("content"), F.col("tags")).alias("h")).first()["h"]
    assert set(got) == {"hashtags", "one", "tagged", "nostr"}


def test_bolt11_amount_exact(spark):
    # tests/test_event_processor.py:55-63: lnbc1000m -> 100_000_000 msats
    df = spark.createDataFrame(
        [("lnbc1000m1..",), ("lnbc25u1..",), ("lnbc1..",), ("junk",), (None,), ("lnbc1000n1..",)],
        "bolt11 string",
    )
    got = [r[0] for r in df.select(EV.bolt11_msats(F.col("bolt11"))).collect()]
    assert got[0] == 100_000_000           # 1000m (the reference's test value)
    assert got[1] == 2500                  # 25u * 100
    assert got[2] == 100_000_000_000       # no multiplier -> BTC
    assert got[3] is None
    assert got[4] is None
    assert got[5] == 100                   # 1000n * 0.1

def test_msats_to_sats(spark):
    df = spark.createDataFrame([(1999,), (None,)], "m long")
    got = [r[0] for r in df.select(EV.msats_to_sats(F.col("m"))).collect()]
    assert got == [1, 0]


def test_media_detection(spark):
    # tests/test_event_processor.py:66-79
    df = one(
        spark,
        content="x",
        urls=[
            "https://example.com/image.jpg",
            "https://example.com/page.html",
            "https://example.com/VIDEO.MP4?x=1",
        ],
    )
    got = df.select(
        EV.media_urls(F.col("urls")).alias("m"), EV.has_media(F.col("urls")).alias("h")
    ).first()
    assert got["m"] == ["https://example.com/image.jpg", "https://example.com/VIDEO.MP4?x=1"]
    assert got["h"] is True


def test_reply_marker_precedence(spark):
    # tests/test_event_processor.py:82-92: marked 'reply' wins over last e-tag
    df = one(
        spark, content="x",
        tags=[["e", "root", "", "root"], ["e", "mid"], ["e", "target", "", "reply"], ["e", "last"]],
    )
    assert df.select(EV.extract_reply_to(F.col("tags"))).first()[0] == "target"
    df2 = one(spark, content="x", tags=[["e", "a"], ["e", "b"], ["p", "c"]])
    assert df2.select(EV.extract_reply_to(F.col("tags"))).first()[0] == "b"
    df3 = one(spark, content="x", tags=[["p", "c"]])
    assert df3.select(EV.extract_reply_to(F.col("tags"))).first()[0] is None


def test_language_detection(spark):
    df = spark.createDataFrame(
        [("hello world",), ("这是中文",), ("これはにほんご",), ("한국어입니다",),
         ("",), ("これは日本語",)],
        "content string",
    )
    got = [r[0] for r in df.select(EV.detect_language(F.col("content"))).collect()]
    # kanji-bearing Japanese -> 'zh': the reference checks the CJK-ideograph
    # range first (event_processor.py:309-313); we mirror that exactly
    assert got == ["en", "zh", "ja", "ko", None, "zh"]


def test_profile_metadata_parse(spark):
    df = spark.createDataFrame(
        [('{"name": "alice", "nip05": "a@b.c"}',), ("not json",)], "content string"
    )
    rows = df.select(EV.parse_profile_metadata(F.col("content")).alias("m")).collect()
    assert rows[0]["m"]["name"] == "alice" and rows[0]["m"]["nip05"] == "a@b.c"
    assert rows[1]["m"] is None or rows[1]["m"]["name"] is None  # PERMISSIVE


def test_is_like_and_urls(spark):
    df = one(spark, content="see https://a.co/x and http://b.io/y.png ok")
    assert df.select(EV.extract_urls(F.col("content"))).first()[0] == [
        "https://a.co/x", "http://b.io/y.png"
    ]
    likes = spark.createDataFrame([("+",), ("👍",), ("no",)], "content string")
    got = [r[0] for r in likes.select(EV.is_like(F.col("content"))).collect()]
    assert got == [True, True, False]


def test_zap_receipt_parse(spark):
    # C7: full receipt walk incl. JSON description (event_processor.py:164-208)
    df = one(
        spark, content="",
        tags=[
            ["bolt11", "lnbc21u1xyz"],
            ["description", '{"pubkey": "sender-pk", "content": "great post!"}'],
            ["preimage", "deadbeef"],
            ["e", "target-event"],
            ["p", "target-pk"],
        ],
    )
    z = df.select(EV.parse_zap_receipt(F.col("tags")).alias("z")).first()["z"]
    assert z["bolt11"] == "lnbc21u1xyz"
    assert z["preimage"] == "deadbeef"
    assert z["target_event_id"] == "target-event"
    assert z["target_pubkey"] == "target-pk"
    assert z["sender_pubkey"] == "sender-pk"
    assert z["comment"] == "great post!"
    assert z["amount_msats"] == 2100  # 21u * 100


# --- M-family ---------------------------------------------------------------

def _scalar(spark, col):
    return one(spark, x=1).select(col.alias("v")).first()["v"]


def test_virality_monotonic_in_age(spark):
    # tests/test_metrics_calculator.py:13-37
    fresh = _scalar(spark, M.virality_score(10, 5000, 5, 3, 20, 1.0))
    old = _scalar(spark, M.virality_score(10, 5000, 5, 3, 20, 24.0))
    assert fresh > old > 0
    # age 0 -> no decay: exact engagement value
    base = _scalar(spark, M.virality_score(2, 1000, 1, 0, 3, 0.0))
    assert base == round(2 * 3.0 + 1000 * 0.001 + 1 * 2.0 + 0 * 2.5 + 3 * 1.0, 2)


def test_trend_score_monotonic_in_authors(spark):
    # tests/test_metrics_calculator.py:40-60
    few = _scalar(spark, M.trend_score(100, 5, 50, 24))
    many = _scalar(spark, M.trend_score(100, 50, 50, 24))
    assert many > few > 0
    assert _scalar(spark, M.trend_score(0, 0, 0, 0)) == 0.0  # window 0 guard


def test_spam_truth_table(spark):
    # tests/test_metrics_calculator.py:63-81
    cases = [
        ((10, 8, 0, 0, False), True),    # short + many hashtags
        ((500, 12, 0, 0, False), True),  # >10 hashtags
        ((50, 0, 5, 0, False), True),    # short + many urls
        ((30, 0, 0, 8, False), True),    # short + many mentions
        ((20, 0, 0, 4, False), True),    # not reply, short, many mentions
        ((300, 2, 1, 1, False), False),  # normal content
        ((20, 0, 0, 4, True), False),    # same but a reply
    ]
    for (cl, hc, uc, mc, rep), want in cases:
        got = _scalar(spark, M.is_spam_likely(cl, hc, uc, mc, rep))
        assert got is want, f"spam({cl},{hc},{uc},{mc},{rep})"


def test_zap_stats_exact(spark):
    # tests/test_metrics_calculator.py:84-95: total 8600, mean 1720, median 1000
    df = spark.createDataFrame([(a,) for a in [100, 500, 1000, 2000, 5000]], "amt long")
    got = df.agg(M.zap_stats(F.collect_list("amt")).alias("s")).first()["s"]
    assert got["total"] == 8600
    assert got["count"] == 5
    assert float(got["mean"]) == 1720.0
    assert got["median"] == 1000
    assert got["min"] == 100 and got["max"] == 5000
    assert got["p95"] == 5000  # int(5*0.95)=4 -> sorted[4]


def test_quality_score_ordering_and_bounds(spark):
    # tests/test_metrics_calculator.py:98-120
    good = _scalar(spark, M.content_quality_score(300, True, 2, 10, 5))
    poor = _scalar(spark, M.content_quality_score(10, False, 0, 0, 0))
    assert good > poor
    for v in (good, poor):
        assert 0.0 <= v <= 100.0


def test_influence_health_growth_engagement(spark):
    inf = _scalar(spark, M.user_influence_score(1000, 500, 2.5, 100, 365))
    import math
    expected = round(
        math.log1p(1000) * 2 + math.log1p(500) * 1.5 + 2.5 * 10
        + min(100 / 365, 10) * 2 * 0.5 + math.log1p(365 / 30) * 0.5, 2
    )
    assert float(inf) == expected
    h = _scalar(spark, M.relay_health_score(99.0, 100.0, 50.0, 0.01))
    expected_h = round(99.0 * 0.4 + 90.0 * 0.3 + min(100, math.log1p(50) * 20) * 0.2
                       + 99.0 * 0.1, 2)
    assert float(h) == expected_h
    d, dod = M.growth_rates(10, 1000, 8)
    assert _scalar(spark, d) == 1.0
    assert _scalar(spark, dod) == 25.0
    assert _scalar(spark, M.engagement_rate(100, 1000, 10)) == 1.0
    assert _scalar(spark, M.engagement_rate(100, 0, 10)) == 0.0


# --- pandas UDF fingerprint ---------------------------------------------------

def test_sha256_udf_matches_oracle_kernel(spark):
    import hashlib

    import pandas as pd

    texts = ["hello\r\nworld", "café", None, "plain"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [r[0] for r in df.select(content_sha256("content")).collect()]
    want = list(fingerprint_series(pd.Series(texts)))
    assert got[2] is None and want[2] is None
    assert got[:2] + got[3:] == want[:2] + want[3:]
    # normalization canonicalizes CRLF
    assert got[0] == hashlib.sha256(b"hello\nworld").hexdigest()


def test_hashtag_and_url_unicode(spark):
    """Java \\w / \\s are ASCII-only without (?U); the reference's Python
    patterns are Unicode-aware — parity requires the flag (round-2 review)."""
    df = one(
        spark,
        content="hello #日本語 and #café #test see https://a.com/pic.jpg　next",
        tags=[["p", "x"]],
    )
    tags_got = df.select(
        EV.extract_hashtags(F.col("content"), F.col("tags")).alias("h")
    ).first()["h"]
    assert set(tags_got) == {"日本語", "café", "test"}
    urls = df.select(EV.extract_urls(F.col("content")).alias("u")).first()["u"]
    assert urls == ["https://a.com/pic.jpg"]
    assert df.select(
        EV.has_media(EV.extract_urls(F.col("content"))).alias("m")
    ).first()["m"] is True


def test_zap_receipt_duplicate_tags_last_wins(spark):
    """The reference's tag loop overwrites per name — duplicates resolve to
    the LAST occurrence (event_processor.py:173-187)."""
    df = one(spark, content="", tags=[
        ["e", "first_e"], ["p", "first_p"], ["e", "second_e"], ["p", "second_p"],
    ])
    z = df.select(EV.parse_zap_receipt(F.col("tags")).alias("z")).first()["z"]
    assert z["target_event_id"] == "second_e"
    assert z["target_pubkey"] == "second_p"


def test_bolt11_overflow_yields_null_not_crash(spark):
    """ANSI mode: an absurd amount must behave like any unparseable invoice
    (null), not raise CAST_OVERFLOW and kill the batch."""
    df = one(spark, content="", tags=[["p", "x"]])
    vals = df.select(
        EV.bolt11_msats(F.lit("lnbc99999999999999999999m1xyz")).alias("a"),
        EV.bolt11_msats(F.lit("lnbc99999999")).alias("b"),  # no multiplier, BTC scale
        EV.bolt11_msats(F.lit("lnbc1000m1abc")).alias("ok"),
    ).first()
    assert vals["a"] is None and vals["b"] is None
    assert vals["ok"] == 100_000_000


def test_deterministic_split_is_subset_stable(spark):
    """A doc's train/val assignment depends only on its id: splitting any
    SUBSET of the corpus (growth, repartition, re-run) yields the identical
    per-doc assignment — the no-contamination guarantee random sample()
    splits cannot give."""
    from nostr_data_pipeline_spark.operators.analytics import (
        deterministic_split,
    )

    full = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    sub = full.filter("doc_id % 3 = 0").repartition(7)
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(full).collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(sub).collect()}
    assert b == {k: v for k, v in a.items() if k % 3 == 0}
    # both classes are populated at this size and the val share is ~0.25
    n_val = sum(1 for v in a.values() if v == "val")
    assert 150 < n_val < 350
