"""Training-corpus preparation operators beyond the dedup family:
benchmark decontamination, token-budget data mixing, repetition-based
quality filtering (Gopher-style), and fixed-budget sequence packing.

These are beyond-reference operators (the reference pipeline has no notion
of training-set hygiene); their semantics follow the public literature:
n-gram overlap decontamination (GPT-3 appendix C's 13-gram rule, scaled to
the demo corpus), repetition rules from Gopher (Rae et al. 2021, table A1),
and sequence packing as practiced in T5/LLM pretraining. Every operator is
a declarative DataFrame plan except the greedy packer, which is inherently
sequential per bin-group and runs as ``applyInPandas`` over hash groups —
embarrassingly parallel across groups, pandas-vectorized within.

Scale notes per operator are on the functions; the common theme: the
corpus never shuffles on text — only narrow (id, gram/token-count) columns
move, and the one broadcast (the eval-set gram set) is small by
construction (benchmarks are thousands of docs, not billions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ws_tokens(text_col: str = "text", lowercase: bool = False) -> F.Column:
    """Whitespace tokenizer — same rule as analytics.token_counts so all
    corpus operators agree on what a token is."""
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return F.split(F.trim(c), r"\s+")


def _grams(tk: F.Column, n: int) -> F.Column:
    """Word n-gram array over a token array. Docs shorter than ``n`` tokens
    yield an empty array — the ``when`` guard matters because
    ``sequence(1, size-n+1)`` would happily generate a DESCENDING sequence
    for short docs and emit garbage grams."""
    return F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - n + 1),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_set(df: DataFrame, n: int = 5, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document DISTINCT lowercase word n-grams as (id, gram) rows."""
    grams = _grams(_ws_tokens(text_col, lowercase=True), n)
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )


def decontaminate(train: DataFrame, eval_df: DataFrame, n: int = 5,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: training docs sharing ANY word n-gram with
    the eval set, with the count of distinct overlapping grams. Callers drop
    (or flag) the returned ids before training.

    Scale shape: the eval side is distinct-deduped and BROADCAST (eval sets
    are small by construction); the train side streams map-side through the
    broadcast hash join, so the only shuffle is the per-doc hit count over
    the MATCHING (id, gram) rows — contaminated grams only, a vanishing
    fraction of the corpus. The corpus text itself never shuffles.
    """
    eval_grams = ngram_set(eval_df, n, id_col, text_col).select("gram").distinct()
    train_grams = ngram_set(train, n, id_col, text_col)
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))  # grams pre-deduped per doc
        .orderBy(id_col)
    )


def select_token_budget(df: DataFrame, budget: int, group_col: str = "lang",
                        order_col: str = "quality", id_col: str = "doc_id",
                        token_col: str = "n_tokens") -> DataFrame:
    """Data mixing: keep the best docs per group until a token budget fills.

    Within each group, docs are ranked (``order_col`` desc, id asc for
    determinism) and kept while the running token sum stays within
    ``budget`` — the standard per-language / per-source token-budget
    sampler for assembling a training mix.

    Scale shape: one shuffle — the per-group window. Group cardinality is
    tiny (languages/sources) so per-group skew is real at 100 TB; the
    mitigation is the same as any giant window: pre-aggregate to (doc,
    tokens, rank-key) FIRST so only narrow rows shuffle (done here — the
    text column is dropped before the window), and let AQE split the
    oversized partitions.
    """
    from pyspark.sql import Window

    win = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    narrow = df.select(group_col, id_col, order_col, token_col)
    return (
        narrow.withColumn("cum_tokens", F.sum(token_col).over(win))
        .filter(F.col("cum_tokens") <= budget)
        .orderBy(group_col, "cum_tokens")
    )


def repetition_metrics(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_dup_token_frac: float = 0.50,
                       max_top_bigram_frac: float = 0.20,
                       min_tokens: int = 0) -> DataFrame:
    """Gopher-style repetition filter (Rae et al. 2021, table A1 analogue):
    per-doc duplicate-token fraction and the fraction of tokens covered by
    the single most frequent bigram, plus a pass flag. (Thresholds are
    knobs; the defaults suit the short synthetic demo docs — Gopher's
    published numbers target long-form web text. Note the floor: a doc
    under 2/max_top_bigram_frac tokens fails even when every bigram is
    unique — ``min_tokens`` is the length gate for that, folded into
    ``passes`` as Gopher itself gates short docs.)

    The bigram mode is computed WITHOUT a shuffle: sort the bigram array,
    then a single ``aggregate`` fold counts the longest equal run — the
    whole metric evaluates inside codegen per row. (The naive plan explodes
    bigrams and double-aggregates: two shuffles proportional to corpus
    token count. This one shuffles nothing.)
    """
    tk = _ws_tokens(text_col)
    nt = F.size(tk)
    dup_frac = F.when(
        nt > 0, 1.0 - F.size(F.array_distinct(tk)) / nt.cast("double")
    ).otherwise(0.0)

    bigrams = _grams(tk, 2)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_big = F.aggregate(F.array_sort(bigrams), acc0, _step, lambda a: a["best"])
    top_bigram_frac = F.when(
        nt >= 2, 2.0 * max_big / nt.cast("double")
    ).otherwise(0.0)

    out = df.select(
        F.col(id_col),
        nt.cast("long").alias("n_tokens"),
        F.round(dup_frac, 4).alias("dup_token_frac"),
        F.round(top_bigram_frac, 4).alias("top_bigram_frac"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    ).orderBy(id_col)


def pack_sequences(df: DataFrame, budget: int = 256, n_groups: int = 8,
                   id_col: str = "doc_id", token_col: str = "n_tokens") -> DataFrame:
    """Greedy fixed-budget sequence packing: assign docs to training
    sequences of at most ``budget`` tokens. Greedy next-fit is inherently
    sequential, so the corpus is first hashed into ``n_groups`` independent
    bin-groups (md5 of the id — content-independent, stable across runs and
    partitionings) and the greedy scan runs per group in ``applyInPandas``:
    embarrassingly parallel across groups, one vectorized pandas pass
    within. A doc larger than the budget gets a sequence of its own (the
    packer never splits docs — chunk upstream if needed).

    At 100 TB ``n_groups`` scales with the cluster (it is the parallelism
    AND the number of concurrent output shards); only (id, tokens) ever
    shuffles — never text.
    """
    grp = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("long") % n_groups
    )
    # the id keeps its OWN type — casting to long would turn string
    # (uuid/hash) ids into NULL and silently drop every row at the caller's
    # join-back; the applyInPandas schema is built from the input dtype
    id_type = dict(df.dtypes)[id_col]
    narrow = df.select(
        F.col(id_col).alias("doc_id"),
        grp.alias("grp"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    pack_schema = f"doc_id {id_type}, grp long, seq long, n_tokens long"

    def _pack(pdf):
        # self-contained closure (imports inside): the driver gate may pickle
        # this by value into a worker with no surrounding module state
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs = []
        seq, cum = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if cum > 0 and cum + t > budget:
                seq += 1
                cum = 0
            cum += t
            seqs.append(seq)
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        return pdf[["doc_id", "grp", "seq", "n_tokens"]]

    return narrow.groupBy("grp").applyInPandas(_pack, pack_schema).orderBy("doc_id")


def export_corpus(df: DataFrame, path: str, shard_rows: int = 100_000,
                  id_col: str = "doc_id", lang_col: str = "lang",
                  val_threshold_hex: str = "1999999a",
                  shard_bytes: int | None = None,
                  text_col: str = "text") -> None:
    """Last-mile training export: write the corpus as
    ``path/split=train|val/lang=*/*.parquet`` shards of at most
    ``shard_rows`` rows each — the layout a training loader consumes
    (deterministic splits, per-language directories, bounded shard files).

    Mechanics: the split comes from ``analytics.deterministic_split`` (id
    hash — stable across runs and partitionings, default ~10% val);
    ``repartition(split, lang)`` routes each output directory's rows to one
    task so small groups don't scatter into per-input-partition fragments,
    and ``maxRecordsPerFile`` caps shard size WITHIN a group — the writer
    splits oversized groups into numbered shards without another shuffle.
    At 100 TB the one hash shuffle is the export's only data movement, and
    shard size is governed per-file, not per-task.

    ``shard_bytes``: opt-in BYTE-based sharding — a row cap makes oversized
    shards whenever documents are wide, so training exports that must hit a
    file-size budget cap by estimated payload bytes instead. Rows are
    assigned to shards by a cumulative ``octet_length(text_col)`` running
    sum within each (split, lang) group (window ordered by ``id_col`` —
    deterministic; the group is a single window task, the same per-group
    funnel the row-capped path's repartition already creates), then written
    under ``split=*/lang=*/shard=N/`` directories. The shard value rides the
    directory, so no matter how tasks split or collide after the
    ``repartition(split, lang, shard)``, a data FILE only ever holds rows of
    one shard — files can come out smaller than the target, never multiples
    of it (one document past the boundary is the worst overshoot). Write
    parallelism improves from per-group to per-shard as a side effect."""
    from nostr_data_pipeline_spark.operators.analytics import (
        deterministic_split,
    )

    out = deterministic_split(df, id_col=id_col,
                              val_threshold_hex=val_threshold_hex)
    if shard_bytes is not None:
        from pyspark.sql import Window

        w = (Window.partitionBy("split", lang_col)
             .orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        # NULL text counts as 0 bytes: octet_length(NULL) would propagate
        # to a NULL shard id and exile the row to a
        # shard=__HIVE_DEFAULT_PARTITION__ directory the row-capped path
        # never produces
        rbytes = F.coalesce(F.octet_length(F.col(text_col)), F.lit(0))
        cum = F.sum(rbytes).over(w)
        # the running sum INCLUDES the current row, so subtracting half a
        # row would straddle; integer-divide the pre-row prefix instead:
        # shard k holds the rows whose preceding bytes fall in
        # [k*shard_bytes, (k+1)*shard_bytes)
        shard = ((cum - rbytes) / F.lit(int(shard_bytes))).cast("long")
        (
            out.withColumn("shard", shard)
            .repartition(F.col("split"), F.col(lang_col), F.col("shard"))
            .write.mode("overwrite")
            .partitionBy("split", lang_col, "shard")
            .parquet(path)
        )
        return
    (
        out.repartition(F.col("split"), F.col(lang_col))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", shard_rows)
        .partitionBy("split", lang_col)
        .parquet(path)
    )


# PII patterns shared by the Spark expressions and the DuckDB oracle —
# deliberately lookahead/backreference-free so Java regex (Spark) and RE2
# (DuckDB) agree on every match. Counting uses the ORIGINAL text for all
# patterns; replacement applies in dict order.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "digit_run": r"\b\d{9,}\b",
}


def scrub_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              patterns: dict[str, str] = PII_PATTERNS) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4 addresses, ≥9-digit runs) and
    count them per document. Pure JVM column expressions — regexp_extract_all
    for the counts (on the original text) and chained regexp_replace for the
    redaction; no UDF, fully codegen'd, zero shuffle, so at 100 TB this is
    scan-speed work that rides along any other pass over the corpus.

    Each matched span becomes ``[PII:<kind>]``. Counts are per-pattern
    columns ``n_<kind>`` — DETECTION counts on the original text: a span
    matched by a later pattern inside a span an earlier replacement already
    consumed (e.g. an ipv4-shaped substring of an email) is counted but not
    separately redacted.
    """
    cols = [F.col(id_col)]
    for kind, pat in patterns.items():
        cols.append(
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
            .cast("long").alias(f"n_{kind}")
        )
    scrubbed = F.col(text_col)
    for kind, pat in patterns.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"[PII:{kind}]")
    # no orderBy here: the operator stays shuffle-free as documented (the
    # contract query sorts for its oracle comparison; a 100 TB scrub pass
    # must not pay a global sort)
    return df.select(*cols, scrubbed.alias("scrubbed"))


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n",
                     min_chars: int = 20,
                     normalize: bool = True) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet / RefinedWeb line-dedup rule):
    a paragraph that appears in more than one place corpus-wide is kept only
    at its FIRST occurrence (ordered by ``(id, position)``) and removed
    everywhere else; documents are reassembled without the dropped
    paragraphs. Boilerplate (nav bars, cookie banners, license footers) is
    exactly this shape — identical lines repeated across millions of pages
    that doc-level near-dup never catches.

    Matching is on the ``normalize``-d paragraph (lowercase + trim);
    paragraphs shorter than ``min_chars`` normalized chars are exempt
    (never deduped — short lines like headings repeat legitimately).
    ``NULL`` text is treated as empty: the document survives with
    ``text_dedup = ''`` rather than vanishing from the output (empty text
    splits to ONE empty paragraph, so such a row reports
    ``n_paras_kept = 1, n_paras_dropped = 0`` — an oracle replicating this
    operator must ``coalesce(text, '')`` before splitting).

    Scale shape: the dedup DECISION moves only narrow rows — (id, pos,
    sha2(paragraph)) — so the corpus-wide shuffle on the paragraph hash is
    ~48 bytes/row, and the viral-boilerplate key (one paragraph on 10⁹
    pages) is absorbed by map-side partial aggregation (``min`` combines
    locally before the shuffle; no single reducer sees the raw multiplicity).
    Paragraph text moves exactly twice: once through the (id, pos) anti-join
    against the drop list (unique keys — skew-free) and once through the
    per-document reassembly groupBy. Output: (id, text_dedup,
    n_paras_kept, n_paras_dropped).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    # sep is a LITERAL separator, but F.split interprets its pattern as a
    # Java regex while F.array_join joins literally — an unquoted metachar
    # separator ('|', '.') would split per character and reassemble
    # garbage. Quote it (Pattern.quote's \Q...\E algorithm).
    sep_re = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(text, sep_re)).alias("pos", "para"),
    )
    norm = F.trim(F.lower(F.col("para"))) if normalize else F.col("para")
    # narrow decision rows: only hash + coordinates shuffle, never text
    narrow = (
        paras.where(F.length(norm) >= min_chars)
        .select(F.col(id_col), "pos", F.sha2(norm, 256).alias("h"))
    )
    first = narrow.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    )
    drops = (
        narrow.join(first, "h")
        .where(
            (F.col(id_col) != F.col("first")[id_col])
            | (F.col("pos") != F.col("first")["pos"])
        )
        .select(id_col, "pos")
    )
    kept = paras.join(drops, [id_col, "pos"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("long").alias("n_paras_kept"),
    )
    # left join from the source so a doc whose EVERY paragraph dropped
    # still comes out (empty text), and n_dropped = original - kept
    base = df.select(
        F.col(id_col),
        F.size(F.split(text, sep_re)).cast("long").alias("n_paras"),
    )
    return base.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        F.coalesce(F.col("n_paras_kept"), F.lit(0)).cast("long")
        .alias("n_paras_kept"),
        (F.col("n_paras") - F.coalesce(F.col("n_paras_kept"), F.lit(0)))
        .cast("long").alias("n_paras_dropped"),
    )


# ---------------------------------------------------------------------------
# contract queries + DuckDB oracles
# ---------------------------------------------------------------------------

def q_corpus_decontaminate(spark, sf_dir):
    """Demo split: docs with doc_id % 13 == 0 play the benchmark set, the
    rest the training corpus; 5-gram overlap (the GPT-3 rule uses 13-grams
    on web-scale text; 5 suits the short demo docs)."""
    from nostr_data_pipeline_spark.operators.analytics import load

    d = load(spark, sf_dir, "documents")
    eval_df = d.filter(F.col("doc_id") % 13 == 0)
    train = d.filter(F.col("doc_id") % 13 != 0)
    return decontaminate(train, eval_df, n=5)


CORPUS_DECONTAMINATE_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(tk) >= 5
           THEN [array_to_string(tk[i:i+4], ' ') FOR i IN range(1, len(tk)-5+2)]
           ELSE [] END)) AS gram
  FROM tok
), ev AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 13 = 0
)
SELECT g.doc_id, count(*) AS n_hits
FROM grams g JOIN ev USING (gram)
WHERE g.doc_id % 13 <> 0
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


def q_corpus_mix_budget(spark, sf_dir):
    """Per-language token-budget mix: best-quality docs first (the shared
    analytics.quality_columns formula), keep while the language's running
    token sum stays within 2000."""
    from nostr_data_pipeline_spark.operators.analytics import load, quality_columns

    d = load(spark, sf_dir, "documents")
    raw_quality, nt = quality_columns()
    scored = d.select(
        "doc_id", "lang",
        F.round(raw_quality, 4).alias("quality"),
        nt.cast("long").alias("n_tokens"),
    )
    return select_token_budget(scored, budget=2000)


CORPUS_MIX_BUDGET_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang,
         round(0.5 * least(n_chars, 500) / 500.0 +
               0.5 * CASE WHEN nt > 0 THEN ns / CAST(nt AS DOUBLE) ELSE 0.0 END,
               4) AS quality,
         CAST(nt AS BIGINT) AS n_tokens
  FROM (
    SELECT *, len(regexp_split_to_array(trim(text), '\s+')) AS nt,
           len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                           t -> t IN ('the','a','of','and'))) AS ns
    FROM documents
  )
), cum AS (
  SELECT lang, doc_id, quality, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY lang
                                  ORDER BY quality DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT lang, doc_id, quality, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= 2000
ORDER BY lang, cum_tokens
"""


def q_gopher_repetition(spark, sf_dir):
    from nostr_data_pipeline_spark.operators.analytics import load

    return repetition_metrics(load(spark, sf_dir, "documents"))


GOPHER_REPETITION_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM documents
), big AS (
  SELECT doc_id, len(tk) AS nt,
         CASE WHEN len(tk) > 0
              THEN 1.0 - len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS dup_frac,
         CASE WHEN len(tk) >= 2
              THEN [array_to_string(tk[i:i+1], ' ') FOR i IN range(1, len(tk))]
              ELSE [] END AS bigrams
  FROM tok
), modecnt AS (
  SELECT doc_id, max(c) AS max_big FROM (
    SELECT doc_id, count(*) AS c
    FROM (SELECT doc_id, unnest(bigrams) AS g FROM big)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.nt AS BIGINT) AS n_tokens,
       round(b.dup_frac, 4) AS dup_token_frac,
       round(CASE WHEN b.nt >= 2
                  THEN 2.0 * coalesce(m.max_big, 0) / b.nt
                  ELSE 0.0 END, 4) AS top_bigram_frac,
       (round(b.dup_frac, 4) <= 0.50 AND
        round(CASE WHEN b.nt >= 2
                   THEN 2.0 * coalesce(m.max_big, 0) / b.nt
                   ELSE 0.0 END, 4) <= 0.20) AS passes
FROM big b LEFT JOIN modecnt m USING (doc_id)
ORDER BY b.doc_id
"""


def q_pack_sequences(spark, sf_dir):
    from nostr_data_pipeline_spark.operators.analytics import load

    d = load(spark, sf_dir, "documents")
    withtok = d.select(
        "doc_id", F.size(_ws_tokens()).cast("long").alias("n_tokens")
    )
    return pack_sequences(withtok, budget=256, n_groups=8)


PACK_SEQUENCES_SQL = r"""
WITH RECURSIVE docs AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 8 AS grp,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         row_number() OVER (
           PARTITION BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 8
           ORDER BY doc_id) AS rn
  FROM documents
), pack(grp, rn, doc_id, n_tokens, seq, cum) AS (
  SELECT grp, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.cum > 0 AND p.cum + d.n_tokens > 256
              THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.cum > 0 AND p.cum + d.n_tokens > 256
              THEN d.n_tokens ELSE p.cum + d.n_tokens END
  FROM pack p JOIN docs d ON d.grp = p.grp AND d.rn = p.rn + 1
)
SELECT doc_id, grp, seq, n_tokens FROM pack ORDER BY doc_id
"""


def q_pii_scrub(spark, sf_dir):
    """The synthetic docs carry no real PII, so the contract query PLANTS
    deterministic spans first (emails on doc_id % 7, IPs on % 11, long digit
    runs on % 13) and then scrubs — the gate verifies detection, counting
    and redaction end-to-end with nonzero signal."""
    from nostr_data_pipeline_spark.operators.analytics import load

    d = load(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    planted = F.col("text")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(planted, F.lit(" contact user"), sid, F.lit("@example.com")),
    ).otherwise(planted)
    planted = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(planted, F.lit(" from 10.0.0."), (F.col("doc_id") % 256).cast("string")),
    ).otherwise(planted)
    planted = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(planted, F.lit(" ref 90000000"), sid),
    ).otherwise(planted)
    return scrub_pii(d.select("doc_id", planted.alias("text"))).orderBy("doc_id")


def _pii_sql() -> str:
    # DuckDB single-quoted strings are escape-free (Postgres style): the
    # Python pattern strings drop in verbatim — do NOT double backslashes
    pats = PII_PATTERNS
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_{k}"
        for k, p in pats.items()
    )
    scrub = "text"
    for k, p in pats.items():
        scrub = f"regexp_replace({scrub}, '{p}', '[PII:{k}]', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN t2 || ' ref 90000000' || CAST(doc_id AS VARCHAR) ELSE t2 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN t1 || ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE t1 END AS t2
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE text END AS t1
      FROM documents
    )
  )
)
SELECT doc_id,
       {counts},
       {scrub} AS scrubbed
FROM planted
ORDER BY doc_id
"""


def q_paragraph_dedup(spark, sf_dir):
    """The synthetic docs are single-line, so the contract query PLANTS
    paragraph structure first (mirroring how pii_scrub plants spans): every
    doc gains a global boilerplate paragraph (kept only on doc 0), docs with
    doc_id % 3 == 0 a second one, and docs with doc_id % 5 == 0 a short
    'ok' line that sits under min_chars and must never dedup."""
    from nostr_data_pipeline_spark.operators.analytics import load

    d = load(spark, sf_dir, "documents")
    nl = F.lit("\n")
    # coalesce BEFORE concat: F.concat propagates NULL, and the DuckDB
    # oracle's || does too but then string_split(NULL) yields ZERO rows
    # where the operator's internal coalesce yields one empty paragraph —
    # a NULL-text doc would hash-mismatch. Plant over '' on both sides.
    t = F.concat(
        F.coalesce(F.col("text"), F.lit("")), nl,
        F.lit("subscribe to our newsletter for the latest updates today"),
    )
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(t, nl,
                 F.lit("copyright example corp all rights reserved worldwide")),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 5 == 0, F.concat(t, nl, F.lit("ok"))
    ).otherwise(t)
    return dedup_paragraphs(
        d.select("doc_id", t.alias("text")), min_chars=20
    ).orderBy("doc_id")


PARAGRAPH_DEDUP_SQL = r"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN t2 || chr(10) || 'ok' ELSE t2 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN t1 || chr(10) || 'copyright example corp all rights reserved worldwide'
                ELSE t1 END AS t2
    FROM (
      SELECT doc_id,
             coalesce(text, '') || chr(10) || 'subscribe to our newsletter for the latest updates today' AS t1
      FROM documents
    )
  )
), paras AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS para,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM planted
), ranked AS (
  SELECT doc_id, pos, para,
         length(trim(lower(para))) AS nlen,
         row_number() OVER (PARTITION BY trim(lower(para))
                            ORDER BY doc_id, pos) AS rn
  FROM paras
), kept AS (
  SELECT doc_id, pos, para FROM ranked WHERE nlen < 20 OR rn = 1
), agg AS (
  SELECT doc_id,
         string_agg(para, chr(10) ORDER BY pos) AS text_dedup,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT p.doc_id,
       coalesce(a.text_dedup, '') AS text_dedup,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_paras_kept,
       CAST(p.n_paras - coalesce(a.n_kept, 0) AS BIGINT) AS n_paras_dropped
FROM (SELECT doc_id, len(string_split(text, chr(10))) AS n_paras
      FROM planted) p
LEFT JOIN agg a USING (doc_id)
ORDER BY p.doc_id
"""


CORPUS_QUERIES = {
    "corpus_decontaminate": (q_corpus_decontaminate, CORPUS_DECONTAMINATE_SQL),
    "corpus_mix_budget": (q_corpus_mix_budget, CORPUS_MIX_BUDGET_SQL),
    "gopher_repetition": (q_gopher_repetition, GOPHER_REPETITION_SQL),
    "pack_sequences": (q_pack_sequences, PACK_SEQUENCES_SQL),
    "pii_scrub": (q_pii_scrub, _pii_sql()),
}

# registered OUTSIDE the driver's 50-entry correctness window (appended to
# analytics._TAIL_QUERIES): a round-5 addition must not displace the pinned
# in-window contract set. Covered by the local DuckDB parity sweep + pytest.
CORPUS_TAIL_QUERIES = {
    "paragraph_dedup": (q_paragraph_dedup, PARAGRAPH_DEDUP_SQL),
}
