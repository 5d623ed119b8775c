"""Behavior tests for operators/corpus.py — hand-computed values, packing
invariants, and plan-shape assertions (broadcast on the eval side; the
repetition metrics must not shuffle). Oracle parity for the four contract
queries runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.operators.corpus import (
    decontaminate,
    pack_sequences,
    repetition_metrics,
    select_token_budget,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_hand_example(spark):
    train = _docs(spark, [
        (1, "the quick brown fox jumps over the dog"),   # shares a 5-gram
        (2, "completely unrelated words here and there today"),
        (3, "THE QUICK BROWN FOX JUMPS high"),            # case-folded hit
        (4, "too short"),                                  # < 5 tokens: exempt
    ])
    ev = _docs(spark, [(100, "watch the quick brown fox jumps over everything")])
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(train, ev, n=5).collect()}
    # doc 1 shares "the quick brown fox jumps" + "quick brown fox jumps over"
    assert got == {1: 2, 3: 1}


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same contaminated 5-gram appearing twice in one doc counts once
    train = _docs(spark, [(1, "a b c d e x a b c d e")])
    ev = _docs(spark, [(9, "a b c d e")])
    got = decontaminate(train, ev, n=5).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in got] == [(1, 1)]


def test_decontaminate_broadcasts_eval_side(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = decontaminate(
        d.filter("doc_id % 13 != 0"), d.filter("doc_id % 13 = 0")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_metrics_hand_values(spark):
    df = _docs(spark, [
        (1, "a a a b"),        # dup 1 - 2/4 = 0.5; bigram "a a" x2 -> 2*2/4 = 1.0
        (2, "w x y z"),        # dup 0; every bigram unique -> 2*1/4 = 0.5
        (3, "solo"),           # single token: no bigrams
    ])
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert rows[1]["dup_token_frac"] == pytest.approx(0.5)
    assert rows[1]["top_bigram_frac"] == pytest.approx(1.0)
    assert not rows[1]["passes"]
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == pytest.approx(0.5)
    assert rows[3]["top_bigram_frac"] == 0.0
    assert rows[3]["n_tokens"] == 1


def test_repetition_metrics_no_shuffle(spark):
    """The bigram mode is an array fold, not an explode+agg — the physical
    plan must be exchange-free (scan -> project, all codegen)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        repetition_metrics(d)._jdf.queryExecution().executedPlan().toString()
    )
    # the presentation orderBy adds a range exchange; the metric itself must
    # not hash-shuffle (an explode+agg plan would)
    assert "hashpartitioning" not in plan


def test_select_token_budget_respects_budget_and_order(spark):
    df = spark.createDataFrame(
        [("en", 1, 0.9, 50), ("en", 2, 0.8, 40), ("en", 3, 0.95, 30),
         ("en", 4, 0.1, 100), ("de", 5, 0.5, 60)],
        "lang string, doc_id long, quality double, n_tokens long",
    )
    got = select_token_budget(df, budget=100).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], r["cum_tokens"]))
    # en: quality order 3 (30), 1 (80), 2 would hit 120 > 100 -> excluded
    assert by_lang["en"] == [(3, 30), (1, 80)]
    assert by_lang["de"] == [(5, 60)]


def test_pack_sequences_invariants(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    budget = 256
    rows = pack_sequences(d, budget=budget, n_groups=8).collect()
    assert len(rows) == d.count()
    per_seq: dict = {}
    for r in rows:
        per_seq.setdefault((r["grp"], r["seq"]), []).append(r["n_tokens"])
    for (_g, _s), toks in per_seq.items():
        # a sequence either fits the budget or is a single oversized doc
        assert sum(toks) <= budget or len(toks) == 1
    # greedy next-fit never leaves room for the FIRST doc of the next seq
    # (a packer that opens sequences too early would still satisfy the
    # budget check above — this is the assert that pins greediness)
    by_grp: dict = {}
    for r in sorted(rows, key=lambda r: (r["grp"], r["seq"], r["doc_id"])):
        by_grp.setdefault(r["grp"], []).append(r)
    for g, rs in by_grp.items():
        seqs = sorted({r["seq"] for r in rs})
        assert seqs == list(range(len(seqs))), "seq ids are dense from 0"
        seq_tokens = {s: [r["n_tokens"] for r in rs if r["seq"] == s] for s in seqs}
        for s in seqs[:-1]:
            first_next = seq_tokens[s + 1][0]
            assert sum(seq_tokens[s]) + first_next > budget, (
                f"grp {g} seq {s} closed while the next doc still fit"
            )


def test_pack_sequences_layout_independent(spark):
    """Hash grouping is content-independent: repartitioning the input must
    not change a single assignment."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    a = [tuple(r) for r in pack_sequences(d, budget=256).collect()]
    b = [tuple(r) for r in pack_sequences(d.repartition(13), budget=256).collect()]
    assert a == b


def test_scrub_pii_hand_values(spark):
    from nostr_data_pipeline_spark.operators.corpus import scrub_pii

    df = _docs(spark, [
        (1, "mail me at jo.doe+x@sub.example.org or 10.0.0.7 ok"),
        (2, "card 1234567890123456 clean words"),
        (3, "no pii here at all"),
        (4, "two mails a@b.co c@d.io and ip 192.168.1.1"),
    ])
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_digit_run"]) == (1, 1, 0)
    assert rows[1]["scrubbed"] == "mail me at [PII:email] or [PII:ipv4] ok"
    assert rows[2]["n_digit_run"] == 1
    assert rows[2]["scrubbed"] == "card [PII:digit_run] clean words"
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_digit_run"]) == (0, 0, 0)
    assert rows[3]["scrubbed"] == "no pii here at all"
    assert (rows[4]["n_email"], rows[4]["n_ipv4"]) == (2, 1)


def test_scrub_pii_no_python_udf(spark):
    from nostr_data_pipeline_spark.operators.corpus import scrub_pii

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = scrub_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning" not in plan


def test_pack_sequences_string_ids(spark):
    """uuid/hash-style ids must survive packing — an id cast to long would
    go NULL and silently vanish at the caller's join-back (review finding)."""
    from nostr_data_pipeline_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [("a9f", 100), ("b71", 200), ("c00", 90), ("d42", 250)],
        "doc_id string, n_tokens long",
    )
    rows = pack_sequences(df, budget=256, n_groups=2).collect()
    assert sorted(r["doc_id"] for r in rows) == ["a9f", "b71", "c00", "d42"]
    assert all(r["n_tokens"] > 0 for r in rows)


def test_pack_sequences_matches_pure_python_replica(spark):
    """Exact-assignment property test: random ids/token counts (including
    zero-token and over-budget docs) must match an independent pure-Python
    replica of the md5 grouping + greedy next-fit."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from nostr_data_pipeline_spark.operators.corpus import pack_sequences

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        docs=st.dictionaries(st.integers(min_value=0, max_value=10**6),
                             st.integers(min_value=0, max_value=400),
                             min_size=1, max_size=60),
        budget=st.sampled_from([64, 256]),
    )
    def run(docs, budget):
        rows = sorted(docs.items())
        sdf = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = sorted(tuple(r) for r in pack_sequences(sdf, budget=budget).collect())
        exp = []
        groups: dict = {}
        for i, t in rows:
            g = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 8
            groups.setdefault(g, []).append((i, t))
        for g, items in groups.items():
            seq, cum = 0, 0
            for i, t in sorted(items):
                if cum > 0 and cum + t > budget:
                    seq, cum = seq + 1, 0
                cum += t
                exp.append((i, g, seq, t))
        assert got == sorted(exp)

    run()


def test_export_corpus_layout_and_shards(spark, tmp_path):
    import os

    from nostr_data_pipeline_spark.operators.corpus import export_corpus

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text")
    out = str(tmp_path / "export")
    export_corpus(d, out, shard_rows=40)
    got = spark.read.parquet(out)
    assert got.count() == d.count()
    # partition dirs exist for both splits
    splits = {p for p in os.listdir(out) if p.startswith("split=")}
    assert splits == {"split=train", "split=val"}
    # shard cap respected: no file carries more than shard_rows rows
    import pyarrow.parquet as pq

    for root, _dirs, files in os.walk(out):
        for fn in files:
            if fn.endswith(".parquet"):
                assert pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows <= 40
    # split is the deterministic id-hash assignment (re-export agrees)
    again = str(tmp_path / "export2")
    export_corpus(d.repartition(7), again, shard_rows=40)
    a = {(r["doc_id"], r["split"]) for r in spark.read.parquet(out).select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in spark.read.parquet(again).select("doc_id", "split").collect()}
    assert a == b


def test_export_corpus_byte_shards_bounded_under_skew(spark, tmp_path):
    """Round-5 task: `shard_bytes` caps shards by payload bytes, not rows.
    With doc lengths skewed 100x (a row cap would make 100x-varying shards),
    every shard directory's total text bytes must stay within 2x of the
    target in BOTH directions: <= target + one max doc (the only legal
    overshoot), and >= target/2 for all but each group's final shard."""
    import os
    from collections import defaultdict

    from pyspark.sql import functions as F

    from nostr_data_pipeline_spark.operators.corpus import export_corpus

    # 60 skinny docs (~40 B) + 40 wide docs (~4 kB), interleaved by id so
    # wide ones don't cluster; deterministic synthetic text. One NULL-text
    # row rides along: it must land in a normal shard (0 bytes), never in
    # a shard=__HIVE_DEFAULT_PARTITION__ directory
    rows = []
    for i in range(100):
        width = 4000 if i % 5 == 0 or i % 5 == 3 else 40
        text = None if i == 42 else "x" * width
        rows.append((i, "en" if i % 2 == 0 else "fr", text))
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = str(tmp_path / "bexport")
    target = 16_000
    export_corpus(d, out, shard_bytes=target)
    got = spark.read.parquet(out)
    assert got.count() == 100
    # layout gained a shard= level; splits/langs still partition the tree
    assert {p for p in os.listdir(out) if p.startswith("split=")} \
        == {"split=train", "split=val"}
    # the NULL-text row exported into a real numbered shard
    nrow = got.filter("doc_id = 42").collect()
    assert len(nrow) == 1 and nrow[0]["shard"] is not None
    for root, dirs, _files in os.walk(out):
        assert "shard=__HIVE_DEFAULT_PARTITION__" not in dirs

    per_shard = got.groupBy("split", "lang", "shard").agg(
        F.sum(F.octet_length("text")).alias("bytes")).collect()
    max_doc = 4000
    groups = defaultdict(list)
    for r in per_shard:
        groups[(r["split"], r["lang"])].append((r["shard"], r["bytes"]))
    assert any(len(v) > 1 for v in groups.values())  # sharding happened
    for (_s, _l), shards in groups.items():
        shards.sort()
        for shard_id, nbytes in shards:
            assert nbytes <= target + max_doc, (shard_id, nbytes)
        # all but the tail shard are at least half-full: the 2x bound
        # holds from below too (no dust shards from the byte assignment)
        for _shard_id, nbytes in shards[:-1]:
            assert nbytes >= target / 2, shards

    # determinism: re-export from a different partitioning agrees per row
    again = str(tmp_path / "bexport2")
    export_corpus(d.repartition(7), again, shard_bytes=target)
    a = sorted(tuple(r) for r in got.select("doc_id", "split", "shard").collect())
    b = sorted(tuple(r) for r in spark.read.parquet(again)
               .select("doc_id", "split", "shard").collect())
    assert a == b


def test_dedup_paragraphs_hand_example(spark):
    from nostr_data_pipeline_spark.operators.corpus import dedup_paragraphs

    boiler = "subscribe to our newsletter today"
    d = _docs(spark, [
        (1, f"unique opening paragraph one\n{boiler}\nok"),
        (2, f"{boiler}\nanother unique paragraph here today"),
        # case/whitespace variant of the boilerplate: normalized match
        (3, f"  {boiler.upper()}  \nthird unique paragraph right here"),
        # doc of ONLY duplicate paragraphs must survive with empty text
        (4, boiler),
        (5, None),  # NULL text must not vanish
    ])
    got = {r["doc_id"]: r for r in dedup_paragraphs(d, min_chars=20).collect()}
    assert len(got) == 5
    # first occurrence (lowest (id, pos)) keeps the boilerplate
    assert got[1]["text_dedup"] == f"unique opening paragraph one\n{boiler}\nok"
    assert got[1]["n_paras_dropped"] == 0
    # later occurrences drop it but keep their own paragraphs in order
    assert got[2]["text_dedup"] == "another unique paragraph here today"
    assert got[2]["n_paras_kept"] == 1 and got[2]["n_paras_dropped"] == 1
    assert got[3]["text_dedup"] == "third unique paragraph right here"
    assert got[4]["text_dedup"] == "" and got[4]["n_paras_dropped"] == 1
    assert got[5]["text_dedup"] == "" and got[5]["n_paras_kept"] == 1


def test_dedup_paragraphs_short_lines_exempt(spark):
    from nostr_data_pipeline_spark.operators.corpus import dedup_paragraphs

    # 'ok' repeats in every doc but sits under min_chars: never deduped
    d = _docs(spark, [
        (1, "first long unique paragraph content\nok"),
        (2, "second long unique paragraph content\nok"),
    ])
    got = {r["doc_id"]: r for r in dedup_paragraphs(d, min_chars=20).collect()}
    assert got[1]["n_paras_dropped"] == 0
    assert got[2]["n_paras_dropped"] == 0
    assert got[2]["text_dedup"].endswith("\nok")


def test_dedup_paragraphs_metachar_separator(spark):
    """sep feeds F.split (Java regex) but F.array_join (literal): an
    unquoted '|' separator split per character and reassembled garbage."""
    from nostr_data_pipeline_spark.operators.corpus import dedup_paragraphs

    boiler = "subscribe to our newsletter today"
    d = _docs(spark, [
        (1, f"unique opening paragraph one|{boiler}"),
        (2, f"{boiler}|another unique paragraph here today"),
    ])
    got = {r["doc_id"]: r for r in
           dedup_paragraphs(d, sep="|", min_chars=20).collect()}
    assert got[1]["text_dedup"] == f"unique opening paragraph one|{boiler}"
    assert got[1]["n_paras_kept"] == 2 and got[1]["n_paras_dropped"] == 0
    assert got[2]["text_dedup"] == "another unique paragraph here today"
    assert got[2]["n_paras_kept"] == 1 and got[2]["n_paras_dropped"] == 1
    # '.' is the nastiest metachar (matches everything): must round-trip too
    d2 = _docs(spark, [(7, "alpha beta gamma delta epsilon.ok")])
    r = dedup_paragraphs(d2, sep=".", min_chars=20).collect()[0]
    assert r["text_dedup"] == "alpha beta gamma delta epsilon.ok"
    assert r["n_paras_kept"] == 2


def test_paragraph_dedup_oracle_survives_null_text(spark, tmp_path):
    """A NULL-text document must hash-match the DuckDB oracle: both sides
    plant over coalesce(text,'') — unaligned NULL handling yields zero
    paragraph rows in DuckDB vs one empty paragraph in Spark."""
    import duckdb
    import pandas as pd
    from nostr_data_pipeline_spark.operators.corpus import (
        PARAGRAPH_DEDUP_SQL, q_paragraph_dedup)

    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    src.loc[src.index[:3], "text"] = None  # plant NULL-text rows
    sf = tmp_path / "sf"
    sf.mkdir()
    src.to_parquet(sf / "documents.parquet", index=False)

    got = q_paragraph_dedup(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.register("documents", src)
    want = con.execute(PARAGRAPH_DEDUP_SQL).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    for col in ("text_dedup", "n_paras_kept", "n_paras_dropped"):
        assert list(got[col]) == list(want[col]), col


def test_dedup_paragraphs_no_python_udf(spark):
    from nostr_data_pipeline_spark.operators.corpus import dedup_paragraphs

    d = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta\nok")])
    plan = dedup_paragraphs(d)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
