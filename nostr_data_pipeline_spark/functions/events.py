"""Event enrichment functions (SURVEY §2.8 C1-C13) as native Spark columns.

Each mirrors a row-at-a-time Python routine in the reference's
EventProcessor (/root/reference/src/nostr_pipeline/transformers/
event_processor.py) as a JVM-side, whole-stage-codegen'd Column expression —
no UDF anywhere. Inputs follow the FIXTURES.md B1 schema:
content string, tags array<array<string>>.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MEDIA_EXT_RE = r"\.(jpg|jpeg|png|gif|webp|mp4|mov|webm)$"
LIKE_CONTENT = ("+", "👍", "❤️", "🤙")


def extract_hashtags(content: Column, tags: Column) -> Column:
    """C1 (event_processor.py:210-223): lowercase #\\w+ from content, unioned
    with lowercase 't' tag values, de-duplicated. ``(?U)`` makes Java's
    ``\\w`` Unicode-aware like Python's — without it #日本語 is dropped and
    #café truncates to 'caf' (the corpus carries zh/ja/ko content)."""
    from_content = F.transform(
        F.regexp_extract_all(content, F.lit(r"(?U)#(\w+)"), 1), F.lower
    )
    from_tags = F.transform(
        F.filter(tags, lambda t: (F.size(t) >= 2) & (t[0] == "t")),
        lambda t: F.lower(t[1]),
    )
    return F.array_distinct(F.concat(from_content, from_tags))


def extract_urls(content: Column) -> Column:
    """C2 (event_processor.py:225-227): https?://[^\\s]+ findall. ``(?U)``
    stops Unicode whitespace (e.g. the ideographic space U+3000, standard in
    CJK text) from being absorbed into the URL — a corrupted trailing char
    would defeat the media-extension match downstream."""
    return F.regexp_extract_all(content, F.lit(r"(?U)(https?://[^\s]+)"), 1)


def extract_mentions(tags: Column) -> Column:
    """C3 (event_processor.py:229-235): pubkeys of 'p' tags."""
    return F.transform(
        F.filter(tags, lambda t: (F.size(t) >= 2) & (t[0] == "p")), lambda t: t[1]
    )


def media_urls(urls: Column) -> Column:
    """C4 (event_processor.py:237-248): urls whose lowercase *path* ends with a
    media extension. Path = strip scheme://host and any ?query/#fragment."""
    def _path(u: Column) -> Column:
        no_host = F.regexp_replace(u, r"^(?i)[a-z]+://[^/]*", "")
        no_q = F.regexp_replace(no_host, r"[?#].*$", "")
        return F.lower(no_q)

    return F.filter(urls, lambda u: _path(u).rlike(MEDIA_EXT_RE))


def has_media(urls: Column) -> Column:
    return F.size(media_urls(urls)) > 0


def extract_reply_to(tags: Column) -> Column:
    """C5 (event_processor.py:250-260): first 'e' tag with marker 'reply',
    else the last 'e' tag."""
    e_tags = F.filter(tags, lambda t: (F.size(t) >= 2) & (t[0] == "e"))
    marked = F.filter(e_tags, lambda t: (F.size(t) >= 4) & (t[3] == "reply"))
    # try_element_at: null (not ANSI error) when the filtered array is empty
    return F.coalesce(
        F.try_element_at(marked, F.lit(1))[1],
        F.try_element_at(e_tags, F.lit(-1))[1],
    )


def is_like(content: Column) -> Column:
    """C13 (event_processor.py:142): reaction content counted as a like."""
    return content.isin(*LIKE_CONTENT)


def parse_profile_metadata(content: Column) -> Column:
    """C6 (event_processor.py:71-88): kind-0 JSON metadata -> struct; malformed
    JSON -> null (PERMISSIVE mode mirrors the JSONDecodeError->None path)."""
    schema = (
        "name string, display_name string, about string, picture string, "
        "banner string, nip05 string, lud06 string, lud16 string, website string"
    )
    return F.from_json(content, schema)


def bolt11_msats(bolt11: Column) -> Column:
    """C8 (event_processor.py:262-297): parse `lnbc<amount><multiplier>` to
    msats with the reference's (non-spec!) multiplier table and int()
    truncation; unparseable -> null.

    NOTE on parity: the reference's literal implementation
    (`bolt11_lower[4:].split("1")[0]`) contradicts its own unit test —
    for "lnbc1000m1..." the split hits the digit '1' inside "1000" and
    returns None, while tests/test_event_processor.py:55-63 asserts
    100_000_000. We implement the *intended* semantics the test asserts:
    amount = leading digits after 'lnbc', optional multiplier char
    m=100_000 / u=100 / n=0.1 / p=0.0001 msats; no multiplier = BTC
    (x 100_000_000_000)."""
    low = F.lower(bolt11)
    num = F.regexp_extract(low, r"^lnbc(\d+)", 1).try_cast("double")
    mult_char = F.regexp_extract(low, r"^lnbc\d+([munp])", 1)
    mult = (
        F.when(mult_char == "m", 100_000.0)
        .when(mult_char == "u", 100.0)
        .when(mult_char == "n", 0.1)
        .when(mult_char == "p", 0.0001)
        .otherwise(100_000_000_000.0)
    )
    # try_cast: double->long truncates toward zero, matching Python int();
    # an over-long product (absurd amount) yields null like every other
    # unparseable invoice instead of an ANSI CAST_OVERFLOW killing the job
    # (the reference's try/except returns None per event)
    return F.when(num.isNotNull(), (num * mult).try_cast("long"))


def parse_zap_receipt(tags: Column) -> Column:
    """C7 (event_processor.py:164-208): walk a zap receipt's tags for
    description / bolt11 / preimage / target event ('e') / target pubkey
    ('p'); the description tag is itself JSON carrying the zap request,
    from which sender pubkey + comment come. Returns a struct column:
    (bolt11, preimage, target_event_id, target_pubkey, sender_pubkey,
    comment, amount_msats)."""

    def tag_val(name: str) -> Column:
        # LAST occurrence wins: the reference's loop overwrites on every
        # matching tag (event_processor.py:173-187), so duplicate e/p/
        # bolt11/description tags resolve to the final one
        return F.try_element_at(
            F.filter(tags, lambda t: (F.size(t) >= 2) & (t[0] == name)), F.lit(-1)
        )[1]

    desc = tag_val("description")
    req = F.from_json(desc, "pubkey string, content string")
    bolt11 = tag_val("bolt11")
    return F.struct(
        bolt11.alias("bolt11"),
        tag_val("preimage").alias("preimage"),
        tag_val("e").alias("target_event_id"),
        tag_val("p").alias("target_pubkey"),
        req["pubkey"].alias("sender_pubkey"),
        req["content"].alias("comment"),
        bolt11_msats(bolt11).alias("amount_msats"),
    )


def msats_to_sats(msats: Column) -> Column:
    """C9 (event_processor.py:204): floor-div 1000; null -> 0."""
    return F.coalesce((msats / 1000).cast("long"), F.lit(0))


def detect_language(content: Column) -> Column:
    """C10 (event_processor.py:299-315): unicode-range heuristic zh/ja/ko/en;
    empty or null content -> null. Check order mirrors the reference: the CJK
    ideograph range wins first, so kanji-bearing Japanese classifies as 'zh'
    exactly like the reference does."""
    zh = content.rlike("[一-鿿]")
    ja = content.rlike("[぀-ゟ゠-ヿ]")
    ko = content.rlike("[가-힯]")
    return F.when(content.isNull() | (F.length(content) == 0), F.lit(None)).otherwise(
        F.when(zh, "zh").when(ja, "ja").when(ko, "ko").otherwise("en")
    )


def epoch_to_ts(created_at: Column) -> Column:
    """C11 (event_processor.py:44): unix epoch seconds -> timestamp."""
    return F.timestamp_seconds(created_at)


def content_length(content: Column) -> Column:
    """C12: len(content)."""
    return F.length(content)
