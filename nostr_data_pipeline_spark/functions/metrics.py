"""Derived-metric expressions (SURVEY §2.9 M1-M8) as single Spark Columns.

Exact-parity re-expressions of the reference's scalar formulas
(/root/reference/src/nostr_pipeline/transformers/metrics_calculator.py),
including every rounding, cap, and zero-guard — verified value-for-value by
tests/test_functions.py against the reference's own unit-test expectations.
All are plain Column algebra: they fuse into whole-stage codegen after the
aggregations that feed them; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x) -> Column:
    return x.cast("double") if isinstance(x, Column) else F.lit(float(x))


def virality_score(zap_count, zap_total_sats, reply_count, repost_count,
                   reaction_count, age_hours) -> Column:
    """M1 (metrics_calculator.py:17-58): weighted engagement x exp time decay
    (half-life 6h); age<=0 -> decay 1.0; round 2."""
    engagement = (
        _d(zap_count) * 3.0
        + _d(zap_total_sats) * 0.001
        + _d(reply_count) * 2.0
        + _d(repost_count) * 2.5
        + _d(reaction_count) * 1.0
    )
    decay = F.when(_d(age_hours) > 0, F.exp(-0.1155 * _d(age_hours))).otherwise(1.0)
    return F.round(engagement * decay, 2)


def trend_score(mention_count, unique_authors, total_zaps, window_hours) -> Column:
    """M2 (metrics_calculator.py:60-92): velocity x log1p(authors) x
    (1 + log1p(zaps)); window_hours==0 -> 1; round 2."""
    wh = F.when(_d(window_hours) == 0, F.lit(1.0)).otherwise(_d(window_hours))
    velocity = _d(mention_count) / wh
    return F.round(
        velocity * F.log1p(_d(unique_authors)) * (1.0 + F.log1p(_d(total_zaps))), 2
    )


def user_influence_score(follower_count, total_zaps_received, avg_zaps_per_note,
                         total_notes, account_age_days) -> Column:
    """M3 (metrics_calculator.py:94-140): weighted log-scaled components;
    activity rate capped at 10; age 0 -> activity 0; round 2."""
    activity_rate = F.when(
        _d(account_age_days) > 0,
        F.least(_d(total_notes) / _d(account_age_days), F.lit(10.0)),
    ).otherwise(0.0)
    return F.round(
        F.log1p(_d(follower_count)) * 2.0
        + F.log1p(_d(total_zaps_received)) * 1.5
        + _d(avg_zaps_per_note) * 10.0 * 1.0
        + activity_rate * 2.0 * 0.5
        + F.log1p(_d(account_age_days) / 30.0) * 0.5,
        2,
    )


def relay_health_score(uptime_percentage, avg_latency_ms, events_per_second,
                       error_rate) -> Column:
    """M4 (metrics_calculator.py:142-179): weighted uptime/latency/throughput/
    error scores, clamped; round 2."""
    latency = F.greatest(F.lit(0.0), 100.0 - _d(avg_latency_ms) / 10.0)
    throughput = F.least(F.lit(100.0), F.log1p(_d(events_per_second)) * 20.0)
    error = F.greatest(F.lit(0.0), 100.0 - _d(error_rate) * 100.0)
    return F.round(
        _d(uptime_percentage) * 0.4 + latency * 0.3 + throughput * 0.2 + error * 0.1, 2
    )


def content_quality_score(content_length, has_media, hashtag_count, zap_count,
                          reply_count) -> Column:
    """M5 (metrics_calculator.py:181-226): piecewise length curve + media/
    hashtag/engagement bonuses; round 2."""
    cl = _d(content_length)
    length_score = (
        F.when(cl < 50, cl / 50.0 * 50.0)
        .when(cl <= 500, 50.0 + (cl - 50.0) / 450.0 * 50.0)
        .otherwise(100.0 - F.least(F.lit(50.0), (cl - 500.0) / 100.0))
    )
    media_col = has_media if isinstance(has_media, Column) else F.lit(bool(has_media))
    media_score = F.when(media_col, F.lit(20.0)).otherwise(0.0)
    hc = _d(hashtag_count)
    hashtag_score = (
        F.when(hc == 0, 0.0)
        .when(hc <= 3, 15.0)
        .when(hc <= 5, 10.0)
        .otherwise(F.greatest(F.lit(0.0), 10.0 - (hc - 5.0) * 2.0))
    )
    engagement = F.least(F.lit(30.0), _d(zap_count) * 5.0 + _d(reply_count) * 2.0)
    return F.round(
        length_score * 0.3 + media_score * 0.2 + hashtag_score * 0.1 + engagement * 0.4,
        2,
    )


def is_spam_likely(content_length, hashtag_count, url_count, mention_count,
                   is_reply) -> Column:
    """M6 (metrics_calculator.py:289-322): 5-rule boolean spam heuristic."""
    cl, hc = _d(content_length), _d(hashtag_count)
    uc, mc = _d(url_count), _d(mention_count)
    not_reply = ~is_reply if isinstance(is_reply, Column) else F.lit(not is_reply)
    return (
        ((cl < 20) & (hc > 5))
        | (hc > 10)
        | ((cl < 100) & (uc > 3))
        | ((cl < 50) & (mc > 5))
        | (not_reply & (cl < 30) & (mc > 3))
    )


def growth_rates(new_users_today, total_users, new_users_yesterday) -> tuple[Column, Column]:
    """M7 (metrics_calculator.py:228-250): daily % and day-over-day % with
    zero-guards; round 2. Returns (daily_growth_rate, day_over_day_change)."""
    daily = F.when(
        _d(total_users) > 0, F.round(_d(new_users_today) / _d(total_users) * 100.0, 2)
    ).otherwise(0.0)
    dod = F.when(
        _d(new_users_yesterday) > 0,
        F.round(
            (_d(new_users_today) - _d(new_users_yesterday))
            / _d(new_users_yesterday) * 100.0,
            2,
        ),
    ).otherwise(0.0)
    return daily, dod


def zap_stats(amounts: Column) -> Column:
    """Order statistics with the reference's exact index semantics
    (metrics_calculator.py:252-287): median = sorted[count//2], p95 =
    sorted[int(count*0.95)] (clamped to max). Returns a struct column for use
    in .agg(); amounts = collect_list input column.

    Exact-index semantics require the sorted list; at 10^10 rows per group use
    percentile_approx instead (documented trade-off)."""
    arr = F.sort_array(amounts)
    n = F.size(arr)
    med = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    p95_idx = F.floor(n.cast("double") * 0.95).cast("int")
    p95 = F.when(p95_idx < n, F.element_at(arr, p95_idx + 1)).otherwise(
        F.element_at(arr, n)
    )
    total = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    return F.when(n == 0, F.lit(None)).otherwise(
        F.struct(
            total.alias("total"),
            n.cast("long").alias("count"),
            F.round(total / n, 2).alias("mean"),
            med.alias("median"),
            F.element_at(arr, 1).alias("min"),
            F.element_at(arr, -1).alias("max"),
            p95.alias("p95"),
        )
    )


def engagement_rate(total_engagements, follower_count, content_count) -> Column:
    """M8 (metrics_calculator.py:337-350): (engagements/content)/followers*100
    with zero-guards; round 2."""
    return F.when(
        (_d(follower_count) == 0) | (_d(content_count) == 0), F.lit(0.0)
    ).otherwise(
        F.round(
            _d(total_engagements) / _d(content_count) / _d(follower_count) * 100.0, 2
        )
    )
