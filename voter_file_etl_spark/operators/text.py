"""Text-analysis operators over the documents table (north-star suite).

Language-ID (stopword n-gram heuristic), quality scoring, token
counting, tokenize+explode word counts, and document fingerprinting
(full-hash + rolling min-hash). All pure Column expressions: at
100 TB these run inside whole-stage codegen with no Python in the row
path, and every aggregate is partial+final.

Cross-engine determinism: ratios are int/int double divisions (bit-
identical IEEE); hashes are md5 hex (identical in Spark and DuckDB);
counts are BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.intmath import half_up, half_up_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t

STOPWORDS_EN = ("the", "a", "and", "of", "is")
STOPWORDS_ES = ("el", "la", "de", "y", "es")
STOPWORDS_FR = ("le", "la", "et", "de", "est")


def _in_list(var: str, words: tuple[str, ...]) -> str:
    return " OR ".join(f"{var} = '{w}'" for w in words)


# ---------------------------------------------------------------------------
# T5 — tokenize + explode word count (the UDTF shape of SURVEY §2.12).
# ---------------------------------------------------------------------------
@register(
    "t5_tokenize_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def t5_tokenize_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# X8 — language ID by stopword hits (n-gram heuristic). Ties resolve
# in a fixed language order, so the guess is deterministic.
# ---------------------------------------------------------------------------
@register(
    "x8_lang_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
    ), scores AS (
      SELECT doc_id,
        CAST(sum(CASE WHEN {_in_list('w', STOPWORDS_EN)} THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
        CAST(sum(CASE WHEN {_in_list('w', STOPWORDS_ES)} THEN 1 ELSE 0 END) AS BIGINT) AS es_hits,
        CAST(sum(CASE WHEN {_in_list('w', STOPWORDS_FR)} THEN 1 ELSE 0 END) AS BIGINT) AS fr_hits
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, en_hits, es_hits, fr_hits,
      CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
           WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
           WHEN fr_hits > 0 THEN 'fr'
           ELSE 'und' END AS lang_guess
    FROM scores
    """,
)
def x8_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))

    def hits(words: tuple[str, ...]) -> F.Column:
        return F.sum(F.when(F.col("w").isin(*words), 1).otherwise(0)).cast("long")

    scores = toks.groupBy("doc_id").agg(
        hits(STOPWORDS_EN).alias("en_hits"),
        hits(STOPWORDS_ES).alias("es_hits"),
        hits(STOPWORDS_FR).alias("fr_hits"),
    )
    return scores.select(
        "doc_id",
        "en_hits",
        "es_hits",
        "fr_hits",
        F.when(
            (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") > 0),
            "en",
        )
        .when((F.col("es_hits") >= F.col("fr_hits")) & (F.col("es_hits") > 0), "es")
        .when(F.col("fr_hits") > 0, "fr")
        .otherwise("und")
        .alias("lang_guess"),
    )


# ---------------------------------------------------------------------------
# X9 — quality scoring: length, word count, avg word length, stopword
# ratio, and a gate. Ratios are int/int -> bit-identical doubles.
# ---------------------------------------------------------------------------
@register(
    "x9_quality_score",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(list_filter(str_split(text, ' '),
                                  w -> {_in_list('w', STOPWORDS_EN)})) AS BIGINT)
                 AS stop_hits
      FROM documents
    )
    SELECT doc_id, n_chars_m, n_words,
           CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
           CAST(stop_hits AS DOUBLE) / n_words AS stop_ratio,
           (n_words >= 10 AND n_words <= 1000
            AND CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words >= 2.0
            AND CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words <= 12.0)
               AS quality_ok
    FROM base
    """,
)
def x9_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_pred = " OR ".join(f"w = '{w}'" for w in STOPWORDS_EN)
    base = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.expr(f"filter(split(text, ' '), w -> {stop_pred})"))
        .cast("long")
        .alias("stop_hits"),
    )
    awl = (F.col("n_chars_m") - (F.col("n_words") - 1)).cast("double") / F.col("n_words")
    return base.select(
        "doc_id",
        "n_chars_m",
        "n_words",
        awl.alias("avg_word_len"),
        (F.col("stop_hits").cast("double") / F.col("n_words")).alias("stop_ratio"),
        (
            (F.col("n_words") >= 10)
            & (F.col("n_words") <= 1000)
            & (awl >= 2.0)
            & (awl <= 12.0)
        ).alias("quality_ok"),
    )


# ---------------------------------------------------------------------------
# X10 — token counting: whitespace words, punctuation count, and the
# BPE-ish chars/4 estimate.
# ---------------------------------------------------------------------------
@register(
    "x10_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                w -> w <> '')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS est_bpe_tokens,
           CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                AS BIGINT) AS n_punct
    FROM documents
    """,
)
def x10_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, '[^a-z0-9]+'), w -> w != '')"))
        .cast("long")
        .alias("n_words"),
        F.length("text").cast("long").alias("n_chars_m"),
        F.ceil(F.length("text").cast("double") / 4).cast("long").alias("est_bpe_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", "[^a-z0-9 ]", "")))
        .cast("long")
        .alias("n_punct"),
    )


# ---------------------------------------------------------------------------
# X11 — document fingerprinting: md5 of the normalized text plus a
# winnowing-style rolling fingerprint (min md5 over strided 16-char
# windows). Both are pure expressions; the rolling min makes the
# fingerprint robust to local edits.
# ---------------------------------------------------------------------------
@register(
    "x11_fingerprint",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           md5(norm) AS fp,
           list_min(list_transform(
               generate_series(1, greatest(length(norm) - 15, 1), 4),
               i -> md5(substr(norm, i, 16)))) AS win_fp
    FROM n
    """,
)
def x11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    normed = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")).alias("norm"),
    )
    return normed.select(
        "doc_id",
        F.md5("norm").alias("fp"),
        F.expr(
            "array_min(transform(sequence(1, greatest(length(norm) - 15, 1), 4),"
            " i -> md5(substring(norm, i, 16))))"
        ).alias("win_fp"),
    )


# ---------------------------------------------------------------------------
# X16 — TF-IDF: the canonical text-feature pipeline (term frequency ×
# inverse document frequency) using t5's tokenization. Three
# aggregates (per-doc-term counts, per-doc lengths, per-term doc
# frequencies) joined back — every one partial+final, shuffles keyed
# on doc_id / term. tf is an exact int ratio; idf's ln() is the one
# libm call in the engine. Quantization: idf and the tfidf product
# are emitted as BIGINT micro-units via floor(x*1e6 + 0.5) — the
# repo's engine-identical rule. The first cut used round(x, 6),
# whose Spark (decimal-string HALF_UP) vs DuckDB (binary) semantics
# diverge near 6th-decimal ties: green at sf0.01, one boundary row
# at sf0.1 (found by the full sf0.1 driver replay). floor(+0.5) on
# the identical IEEE product has no such tie neighborhood.
# ---------------------------------------------------------------------------
@register(
    "x16_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
        FROM documents
      ) WHERE w <> ''
    ), tfc AS (
      SELECT doc_id, w, count(*) AS tf_count FROM toks GROUP BY doc_id, w
    ), dlen AS (
      SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id
    ), dfw AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w
    ), nd AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT tfc.doc_id, tfc.w AS term,
           CAST(tf_count AS DOUBLE) / doc_len AS tf,
           CAST(floor(ln((n_docs + 1.0) / (df + 1.0)) * 1000000 + 0.5)
                AS BIGINT) AS idf_micro,
           CAST(floor((CAST(tf_count AS DOUBLE) / doc_len)
                 * floor(ln((n_docs + 1.0) / (df + 1.0)) * 1000000 + 0.5)
                 + 0.5) AS BIGINT) AS tfidf_micro
    FROM tfc
    JOIN dlen ON tfc.doc_id = dlen.doc_id
    JOIN dfw ON tfc.w = dfw.w
    CROSS JOIN nd
    WHERE tfc.doc_id % 50 = 0
    """,
)
def x16_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.col("w") != "")
    tfc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf_count"))
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    dfw = (
        toks.select("doc_id", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    nd = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = F.col("tf_count").cast("double") / F.col("doc_len")
    idf_micro = F.floor(
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) * 1000000 + 0.5
    ).cast("bigint")
    return (
        tfc.join(dlen, "doc_id")
        .join(dfw, "w")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("doc_id") % 50 == 0)
        .select(
            "doc_id",
            F.col("w").alias("term"),
            tf.alias("tf"),
            idf_micro.alias("idf_micro"),
            F.floor(tf * idf_micro + 0.5).cast("bigint").alias(
                "tfidf_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X18 — bigram language-model counts: P(w2 | w1) as exact count
# ratios (the n-gram LM prep step). Bigrams come from lead() over
# token positions within each doc; both aggregates are partial+final
# hash aggs keyed on the bigram. Probabilities are int/int divisions
# — bit-identical across engines, no rounding needed.
# ---------------------------------------------------------------------------
@register(
    "x18_bigram_lm",
    oracle="""
    WITH arrs AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
      FROM documents
    ), toks AS (
      -- explicit array index as the position (never rely on unnest
      -- emission order surviving window evaluation)
      SELECT doc_id, arr[i] AS w, i AS pos
      FROM arrs, unnest(range(1, len(arr) + 1)) AS t(i)
      WHERE arr[i] <> ''
    ), big AS (
      SELECT doc_id, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), c12 AS (
      SELECT w1, w2, count(*) AS n12 FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY w1
    )
    SELECT c12.w1, c12.w2, n12, CAST(n12 AS DOUBLE) / n1 AS p_cond
    FROM c12 JOIN c1 ON c12.w1 = c1.w1
    WHERE n12 >= 5
    """,
)
def x18_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    big = toks.select(
        "doc_id",
        F.col("w").alias("w1"),
        F.lead("w").over(W.partitionBy("doc_id").orderBy("pos")).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    return (
        c12.join(c1, "w1")
        .filter(F.col("n12") >= 5)
        .select("w1", "w2", "n12", (F.col("n12").cast("double") / F.col("n1")).alias("p_cond"))
    )


# ---------------------------------------------------------------------------
# X20 — PII detection + redaction: the scrub step every training-data
# pipeline runs before anything else. Synthetic PII is planted
# deterministically (the corpus has none), then detected with
# regexp_count and redacted with regexp_replace — patterns kept to
# the RE2/java.util.regex common subset (no lookaround, no backrefs)
# so both engines match identical spans. The redacted text crosses
# the oracle boundary as md5 to keep the comparison compact.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "x20_pii_redact",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN concat(text, ' contact user', doc_id,
                              '@example.com or 555-',
                              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM planted
    """,
)
def x20_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                "text",
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return planted.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# X24 — repetition filter (Gopher-rule shape, Rae et al. 2021 §A1.1):
# per-doc duplicate-word fraction and top-bigram fraction, plus the
# keep/drop verdict. Repetitive machine-generated text shows up as a
# high duplicate-token fraction or one dominating n-gram; both
# signals here are exact count ratios (int/int -> double, bit-stable
# across engines, no rounding needed).
#
# Scale: word stats are pure array expressions (map-side, no
# shuffle); bigram stats are explode -> two partial+final hash aggs
# keyed on doc_id (doc-local keys, no skew) -> broadcast-size join
# back. No Python in the hot path.
# ---------------------------------------------------------------------------
_DUP_WORD_MAX = 0.54
_TOP_BIGRAM_MAX = 0.12


@register(
    "x24_repetition_filter",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, str_split(lower(text), ' ') AS arr FROM documents
    ), words AS (
      SELECT doc_id, len(arr) AS n_tokens,
             len(arr) - len(list_distinct(arr)) AS n_dup
      FROM s
    ), bg AS (
      SELECT doc_id, g, count(*) AS n
      FROM (
        SELECT doc_id, unnest(list_transform(
                 range(1, len(arr)),
                 i -> concat(arr[i], ' ', arr[i + 1]))) AS g
        FROM s
      )
      GROUP BY doc_id, g
    ), bgs AS (
      SELECT doc_id, max(n) AS top_n, CAST(sum(n) AS BIGINT) AS n_bg
      FROM bg GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_tokens,
           CAST(w.n_dup AS DOUBLE) / w.n_tokens AS dup_word_frac,
           CAST(b.top_n AS DOUBLE) / b.n_bg AS top_bigram_frac,
           (CAST(w.n_dup AS DOUBLE) / w.n_tokens <= {_DUP_WORD_MAX}
            AND CAST(b.top_n AS DOUBLE) / b.n_bg <= {_TOP_BIGRAM_MAX}) AS keep
    FROM words w JOIN bgs b ON w.doc_id = b.doc_id
    """,
)
def x24_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    arr = F.split(F.lower("text"), " ")
    words = docs.select(
        "doc_id",
        F.size(arr).alias("n_tokens"),
        (F.size(arr) - F.size(F.array_distinct(arr))).alias("n_dup"),
    )
    from voter_file_etl_spark.functions.ngrams import ngram_rows

    bg = (
        ngram_rows(docs, ["doc_id"], "split(lower(text), ' ')", 2)
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_n"), F.sum("n").alias("n_bg"))
    )
    dup_frac = F.col("n_dup").cast("double") / F.col("n_tokens")
    top_frac = F.col("top_n").cast("double") / F.col("n_bg")
    return words.join(bg, "doc_id").select(
        "doc_id",
        "n_tokens",
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_bigram_frac"),
        ((dup_frac <= _DUP_WORD_MAX) & (top_frac <= _TOP_BIGRAM_MAX)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# X27 — perplexity filtering (the CCNet/Gopher LM-score gate): score
# every document by its average bigram negative log-likelihood under
# the corpus's own bigram model (x18's counts, unsmoothed — every
# observed bigram has a probability), and keep low-perplexity docs.
#
# Cross-engine exactness: ln() is libm, so each bigram's NLL is
# snapped to integer MICRO-nats (round(ln(p)*1e6)) BEFORE the
# per-doc aggregation — the sum is then exact BIGINT arithmetic in
# any order, and the final average is one exact double division.
# (Summing raw doubles would hash-mismatch: addition order differs
# between engines.)
#
# Scale: two global count aggregates (partial+final, keyed on the
# bigram), one broadcast-sized join per doc-bigram, one per-doc agg.
# The model table is O(vocab²) — at 100 TB it stays a table (sort-
# merge join), never a driver collect.
# ---------------------------------------------------------------------------
_PPL_CUT = -3.4  # avg log-prob cutoff in nats (~corpus median, so both classes occur)


@register(
    "x27_perplexity_filter",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
      FROM documents
    ), toks AS (
      SELECT doc_id, arr[i] AS w, i AS pos
      FROM arrs, unnest(range(1, len(arr) + 1)) AS t(i)
      WHERE arr[i] <> ''
    ), big AS (
      SELECT doc_id, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), c12 AS (
      SELECT w1, w2, count(*) AS n12 FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY w1
    ), scored AS (
      SELECT b.doc_id,
             CAST({half_up_sql("ln(CAST(n12 AS DOUBLE) / n1) * 1000000", 0)}
                  AS BIGINT) AS micro_lp
      FROM big b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1 ON b.w1 = c1.w1
      WHERE b.w2 IS NOT NULL
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(micro_lp) AS BIGINT) AS sum_micro_lp,
           CAST(sum(micro_lp) AS DOUBLE) / count(*) / 1000000.0 AS avg_lp,
           CAST(sum(micro_lp) AS DOUBLE) / count(*) / 1000000.0 >= {_PPL_CUT}
             AS keep
    FROM scored
    GROUP BY doc_id
    """,
)
def x27_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    big = toks.select(
        "doc_id",
        F.col("w").alias("w1"),
        F.lead("w").over(W.partitionBy("doc_id").orderBy("pos")).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    # half_up, not F.round: ln-ratio micro-quantization can land on a
    # .5 tie (x34's half-up-vs-half-even class).
    micro = (
        half_up(F.log(F.col("n12").cast("double") / F.col("n1")) * 1000000, 0)
        .cast("bigint")
        .alias("micro_lp")
    )
    scored = big.join(c12, ["w1", "w2"]).join(c1, "w1").select("doc_id", micro)
    avg_lp = F.col("sum_micro_lp").cast("double") / F.col("n_bigrams") / F.lit(1000000.0)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("micro_lp").cast("bigint").alias("sum_micro_lp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_micro_lp",
            avg_lp.alias("avg_lp"),
            (avg_lp >= _PPL_CUT).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# X28 — BPE merge-pair counting: the inner step of byte-pair-encoding
# tokenizer training — count adjacent symbol pairs across the corpus
# weighted by word frequency, rank candidates for the next merge.
# One round is shown (chars -> pairs); iterating re-runs the same
# plan over re-segmented words.
#
# Scale: word-frequency table first (one shuffle keyed on the word —
# pair generation then runs once per DISTINCT word, not per
# occurrence), pair explosion is map-side over the tiny distinct-word
# table, final count is a partial+final agg keyed on the pair.
# ---------------------------------------------------------------------------
_BPE_TOP = 50


@register(
    "x28_bpe_merge_pairs",
    oracle=f"""
    WITH words AS (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ), pairs AS (
      SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2, freq
      FROM words, unnest(range(1, length(w))) AS t(i)
    ), counted AS (
      SELECT c1, c2, CAST(sum(freq) AS BIGINT) AS pair_count
      FROM pairs GROUP BY c1, c2
    )
    SELECT c1, c2, pair_count, rnk FROM (
      SELECT c1, c2, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, c1, c2) AS rnk
      FROM counted
    ) WHERE rnk <= {_BPE_TOP}
    """,
)
def x28_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.posexplode(F.expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
        )).alias("_i", "pair"),
        "freq",
    ).filter(F.length("pair") == 2)
    counted = (
        pairs.select(
            F.substring("pair", 1, 1).alias("c1"),
            F.substring("pair", 2, 1).alias("c2"),
            "freq",
        )
        .groupBy("c1", "c2")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )
    w = W.orderBy(F.desc("pair_count"), F.asc("c1"), F.asc("c2"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BPE_TOP)
    )


# ---------------------------------------------------------------------------
# X31 — URL normalization + URL-keyed dedup: the crawl-curation step
# that collapses scheme/case/www/default-port/tracking-param/fragment
# variants of the same page before content dedup ever runs. Four raw
# variants are planted per canonical URL (plain, utm-tracking
# params, fragment, uppercase-www-with-:443) and the normalizer must
# collapse each group to one key. Regexp chain is in the
# RE2/java.util.regex common subset and applied in the same order on
# both engines.
#
# Scale: normalization is map-side regexp work; the dedup is one
# hash groupBy on the canonical key — same plan as x1.
# ---------------------------------------------------------------------------
def _url_norm_sql(u: str) -> str:
    out = u
    for pat, rep in _URL_NORM_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"lower({out})"


_URL_NORM_STEPS = [
    ("#.*$", ""),                       # fragment
    ("[?&]utm_[a-z_]+=[^&#]*", ""),     # tracking params
    ("^HTTPS://WWW\\.", "HTTPS://"),    # www (pre-lowercase form)
    ("^https://www\\.", "https://"),
    (":443/", "/"),                     # https default port
]


@register(
    "x31_url_normalize",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://ex' || CAST((doc_id // 4) % 7 AS VARCHAR)
                           || '.org/p/' || CAST(doc_id // 4 AS VARCHAR)
               WHEN 1 THEN 'https://ex' || CAST((doc_id // 4) % 7 AS VARCHAR)
                           || '.org/p/' || CAST(doc_id // 4 AS VARCHAR)
                           || '?utm_source=feed&utm_campaign=x'
               WHEN 2 THEN 'https://ex' || CAST((doc_id // 4) % 7 AS VARCHAR)
                           || '.org/p/' || CAST(doc_id // 4 AS VARCHAR) || '#sec2'
               ELSE 'HTTPS://WWW.EX' || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.ORG:443/P/' || CAST(doc_id // 4 AS VARCHAR)
             END AS url
      FROM documents
    )
    SELECT {_url_norm_sql('url')} AS canonical,
           count(*) AS n_variants,
           min(doc_id) AS keep_id
    FROM raw
    GROUP BY 1
    """,
)
def x31_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    host = F.concat(F.lit("https://ex"), F.expr("(doc_id div 4) % 7").cast("string"))
    path = F.concat(F.lit(".org/p/"), F.expr("doc_id div 4").cast("string"))
    up = F.concat(
        F.lit("HTTPS://WWW.EX"),
        F.expr("(doc_id div 4) % 7").cast("string"),
        F.lit(".ORG:443/P/"),
        F.expr("doc_id div 4").cast("string"),
    )
    url = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(host, path))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(host, path, F.lit("?utm_source=feed&utm_campaign=x")))
        .when(F.col("doc_id") % 4 == 2, F.concat(host, path, F.lit("#sec2")))
        .otherwise(up)
    )
    canon = url
    for pat, rep in _URL_NORM_STEPS:
        canon = F.regexp_replace(canon, pat, rep)
    canon = F.lower(canon)
    return (
        docs.select("doc_id", canon.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_id"),
        )
    )


# ---------------------------------------------------------------------------
# X33 — boilerplate n-gram removal: compute the corpus's globally
# most frequent word trigrams (the "boilerplate vocabulary" — at web
# scale, nav bars / cookie banners / license headers), then score
# each document by what fraction of its trigrams are boilerplate and
# gate on it. The C4-style cleaning step that needs GLOBAL corpus
# statistics, unlike x24's purely doc-local repetition features.
#
# Scale: trigram counting is one partial+final agg keyed on the gram;
# the top-K table is K rows (broadcast); per-doc scoring is a
# broadcast hash join + one agg keyed on doc_id. No all-pairs, no
# skew (gram frequencies are the skew — but they're aggregated, not
# joined-through). Tie-break (count DESC, gram ASC) makes top-K
# deterministic.
# ---------------------------------------------------------------------------
_BOILER_TOP = 100
_BOILER_FRAC_DEN = 25  # keep iff boiler trigrams < 4% of doc trigrams


@register(
    "x33_boilerplate_ngrams",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ), trig AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= 3
                    THEN list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                    ELSE [] END) AS g
      FROM a
    ), cnt AS (
      SELECT g, count(*) AS n FROM trig GROUP BY g
    ), top AS (
      SELECT g FROM cnt ORDER BY n DESC, g LIMIT {_BOILER_TOP}
    )
    SELECT doc_id,
           count(*) AS n_trigrams,
           CAST(sum(CASE WHEN g IN (SELECT g FROM top) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           CAST(sum(CASE WHEN g IN (SELECT g FROM top) THEN 1 ELSE 0 END)
                * {_BOILER_FRAC_DEN} < count(*) AS BOOLEAN) AS keep
    FROM trig
    GROUP BY doc_id
    """,
)
def x33_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_remove(F.split(F.lower("text"), "[^a-z0-9]+"), "").alias(
            "w"
        ),
    )
    from voter_file_etl_spark.functions.ngrams import ngram_rows

    # zip-slice handles the size < 3 guard (empty slices, no
    # backward-sequence fabrication) — see functions/ngrams.py.
    trig = ngram_rows(toks, ["doc_id"], "w", 3)
    top = (
        trig.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("g"))
        .limit(_BOILER_TOP)
        .select("g", F.lit(True).alias("_boiler"))
    )
    scored = trig.join(F.broadcast(top), "g", "left")
    boiler = F.sum(F.when(F.col("_boiler"), 1).otherwise(0)).cast("bigint")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        boiler.alias("n_boiler"),
        (boiler * _BOILER_FRAC_DEN < F.count(F.lit(1))).alias("keep"),
    )


# ---------------------------------------------------------------------------
# X34 — model-based quality scoring: a fixed-weight logistic
# classifier over doc-local features (stopword ratio, mean word
# length, length penalty) — the fasttext-classifier-shaped filter
# step of production pipelines, with deterministic weights standing
# in for learned ones. The squashing function is the ALGEBRAIC
# sigmoid z/(1+|z|) rather than 1/(1+exp(-z)): division and abs are
# correctly-rounded IEEE ops, so unlike exp/libm the score is
# bit-identical across engines with no micro-unit rounding policy
# needed.
#
# Scale: pure per-row Column arithmetic — map-side, codegen'd, no
# shuffle, no UDF.
# ---------------------------------------------------------------------------
@register(
    "x34_quality_classifier",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x = 'a' OR x = 'the')) AS BIGINT) AS n_stop,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ), z AS (
      -- floor(x*1e6 + 0.5), never round(): Spark rounds half-up and
      -- DuckDB half-even, and at 50k docs a tie at the 7th decimal
      -- finally landed (r8 sf1.0 replay: one doc, 1 micro apart).
      -- floor is an exact IEEE op, identical in both engines for
      -- negative z too (half toward +inf).
      SELECT doc_id, n_words,
             floor((3.0 * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))
                   + 0.5 * (CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE))
                   - 0.002 * CAST(n_chars AS DOUBLE)
                   - 1.5) * 1000000 + 0.5) / 1000000.0 AS z
      FROM f WHERE n_words > 0
    )
    SELECT doc_id, n_words,
           CAST(floor((0.5 + 0.5 * z / (1.0 + abs(z))) * 1000000 + 0.5) AS BIGINT)
             AS score_micro,
           z >= 0.0 AS keep
    FROM z
    """,
)
def x34_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    feats = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(
            F.filter(words, lambda x: (x == "a") | (x == "the"))
        ).cast("bigint").alias("n_stop"),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint").alias("n_alpha"),
        F.length("text").cast("bigint").alias("n_chars"),
    ).filter(F.col("n_words") > 0)
    # floor(x*1e6 + 0.5) quantization, never round(): Spark half-up vs
    # DuckDB half-even diverged on a 7th-decimal tie at sf1.0 (r8).
    z = (
        F.floor(
            (
                F.lit(3.0)
                * (F.col("n_stop").cast("double") / F.col("n_words").cast("double"))
                + F.lit(0.5)
                * (F.col("n_alpha").cast("double") / F.col("n_words").cast("double"))
                - F.lit(0.002) * F.col("n_chars").cast("double")
                - F.lit(1.5)
            )
            * 1000000
            + F.lit(0.5)
        )
        / 1000000.0
    )
    scored = feats.select("doc_id", "n_words", z.alias("z"))
    return scored.select(
        "doc_id",
        "n_words",
        F.floor(
            (F.lit(0.5) + F.lit(0.5) * F.col("z") / (F.lit(1.0) + F.abs("z")))
            * 1000000
            + F.lit(0.5)
        ).cast("bigint").alias("score_micro"),
        (F.col("z") >= 0.0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# X36 — out-of-vocabulary (OOV) rate filter: build the corpus
# vocabulary as the K globally most frequent words (count DESC, word
# ASC — deterministic), then score every document by the fraction of
# its tokens outside that vocabulary and gate on it. The
# gibberish/encoding-junk detector of web-scale cleaning: a doc whose
# words mostly aren't in the corpus's own head vocabulary is noise.
#
# Scale: word counting is one partial+final agg; the vocabulary is K
# rows broadcast; scoring is a broadcast join + per-doc agg — the
# same global-stats-then-map shape as x33, never all-pairs.
# ---------------------------------------------------------------------------
_OOV_VOCAB_K = 30
_OOV_KEEP_MAX = 0.10  # keep iff OOV fraction <= 10%


@register(
    "x36_oov_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
      FROM documents
    ), vocab AS (
      SELECT w FROM (SELECT w, count(*) AS n FROM toks GROUP BY w)
      ORDER BY n DESC, w LIMIT {_OOV_VOCAB_K}
    )
    SELECT doc_id, n_tokens, n_oov,
           {half_up_sql("oov_rate_raw", 6)} AS oov_rate,
           {half_up_sql("oov_rate_raw", 6)} <= {_OOV_KEEP_MAX} AS keep
    FROM (
      -- bind the vocab-membership sum ONCE (ADVICE r10 #4): the
      -- half_up_sql guard interpolates its operand four times, and
      -- this operand carries a correlated IN-subquery per copy.
      SELECT doc_id,
             count(*) AS n_tokens,
             CAST(sum(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_oov,
             CAST(sum(CASE WHEN w IN (SELECT w FROM vocab)
                      THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS oov_rate_raw
      FROM toks
      GROUP BY doc_id
    )
    """,
)
def x36_oov_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # explode the codegen split, filter after: explode(filter(..,
    # lambda)) re-runs the interpreted lambda per output row (see
    # functions/ngrams.py).
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(_OOV_VOCAB_K)
        .select("w", F.lit(True).alias("_in_vocab"))
    )
    scored = toks.join(F.broadcast(vocab), "w", "left")
    n_oov = F.sum(F.when(F.col("_in_vocab"), 0).otherwise(1)).cast("bigint")
    # half_up, not F.round: int/int ratio can tie at the 6th decimal
    # and the rounded rate also gates `keep` (x34's class).
    rate = half_up(n_oov.cast("double") / F.count(F.lit(1)), 6)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_oov.alias("n_oov"),
        rate.alias("oov_rate"),
        (rate <= _OOV_KEEP_MAX).alias("keep"),
    )


# ---------------------------------------------------------------------------
# T10 — stemming + stopword normalization: the token-normalize stage
# of a text index (suffix-strip stemmer + stopword drop, then stem
# frequencies). The stemmer is a fixed-precedence CASE over
# endswith/length tests — NOT a regex alternation, whose
# leftmost-first-vs-longest semantics differ subtly between regex
# engines; LIKE and substring behave identically everywhere.
#
# Scale: explode + one partial+final agg keyed on the stem.
# ---------------------------------------------------------------------------
_T10_STOP = ("a", "the", "of", "and")


def _t10_stem_sql(w: str) -> str:
    # Order matters and each branch is exclusive: ing > ed > ly > es > s.
    return f"""CASE
      WHEN {w} LIKE '%ing' AND length({w}) > 4 THEN substr({w}, 1, length({w}) - 3)
      WHEN {w} LIKE '%ed' AND length({w}) > 3 THEN substr({w}, 1, length({w}) - 2)
      WHEN {w} LIKE '%ly' AND length({w}) > 3 THEN substr({w}, 1, length({w}) - 2)
      WHEN {w} LIKE '%es' AND length({w}) > 3 THEN substr({w}, 1, length({w}) - 2)
      WHEN {w} LIKE '%s' AND NOT {w} LIKE '%ss' AND length({w}) > 3
           THEN substr({w}, 1, length({w}) - 1)
      ELSE {w} END"""


@register(
    "t10_stem_stopword",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(
          regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
      FROM documents
    ), kept AS (
      SELECT w, {_t10_stem_sql("w")} AS stem FROM toks
      WHERE w NOT IN ({", ".join(f"'{s}'" for s in _T10_STOP)})
    )
    SELECT stem,
           count(*) AS n_tokens,
           count(DISTINCT w) AS n_surface_forms
    FROM kept GROUP BY stem
    """,
)
def t10_stem_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .filter(~F.col("w").isin(*_T10_STOP))
    )
    kept = toks.select("w", F.expr(_t10_stem_sql("w")).alias("stem"))
    return kept.groupBy("stem").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_surface_forms"),
    )


# ---------------------------------------------------------------------------
# X37 — character-entropy filter: Shannon entropy of the per-doc
# character distribution, the classic gibberish / encoding-junk /
# key-mash detector (natural text sits near the corpus's typical
# entropy; base64 blobs and aaaaaa-runs sit far above/below). Follows
# x27's micro-nat policy for the one libm call: each ln(p) is rounded
# to integer MICRO-NATS before the weighted sum, so the aggregation
# is exact integer math in any order and only the final per-doc
# division returns to double (then rounds to integer micro-nats
# again) — bit-identical across engines and cluster sizes.
#
# Scale: per-char explode (length(text) rows per doc) into one
# partial+final agg keyed on (doc_id, char), then a per-doc agg — no
# window, no collect. At 100 TB the explode factor is the honest cost
# of a per-character statistic; partial aggregation collapses it
# map-side before the shuffle.
# ---------------------------------------------------------------------------
_ENTROPY_KEEP_MIN = 2_800_000  # micro-nats (~corpus median, both classes occur)


@register(
    "x37_entropy_filter",
    oracle=f"""
    WITH ch AS (
      SELECT doc_id, substr(text, i, 1) AS c, length(text) AS n
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
    ), freq AS (
      SELECT doc_id, c, max(n) AS n, count(*) AS nc FROM ch GROUP BY doc_id, c
    ), terms AS (
      SELECT doc_id, n,
             nc * CAST({half_up_sql("ln(CAST(nc AS DOUBLE) / n) * 1000000", 0)}
                       AS BIGINT) AS tm
      FROM freq
    )
    SELECT doc_id,
           max(n) AS n_chars,
           count(*) AS n_distinct_chars,
           CAST({half_up_sql("-CAST(sum(tm) AS DOUBLE) / max(n)", 0)} AS BIGINT)
             AS entropy_micro,
           CAST({half_up_sql("-CAST(sum(tm) AS DOUBLE) / max(n)", 0)} AS BIGINT)
             >= {_ENTROPY_KEEP_MIN} AS keep
    FROM terms GROUP BY doc_id
    """,
)
def x37_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.length("text").alias("n"),
        # split on the empty pattern = one array element per char —
        # codegen, unlike a per-char substring lambda, which the
        # generate re-runs per OUTPUT char: O(len^2) per doc (see
        # functions/ngrams.py).
        F.explode(F.split("text", "")).alias("c"),
    )
    freq = ch.groupBy("doc_id", "c").agg(
        F.max("n").alias("n"), F.count(F.lit(1)).alias("nc")
    )
    # half_up, not F.round, at both quantization points: ln-ratio and
    # int/int micro values can land on .5 ties (x34's class).
    term = (
        F.col("nc")
        * half_up(F.log(F.col("nc").cast("double") / F.col("n")) * 1000000, 0)
        .cast("bigint")
    )
    terms = freq.select("doc_id", "n", term.alias("tm"))
    emicro = half_up(
        -F.sum("tm").cast("double") / F.max("n"), 0
    ).cast("bigint")
    return terms.groupBy("doc_id").agg(
        F.max("n").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        emicro.alias("entropy_micro"),
        (emicro >= _ENTROPY_KEEP_MIN).alias("keep"),
    )


# ---------------------------------------------------------------------------
# X40 — curation decision audit: every text-quality gate in the
# engine (heuristic x9, repetition x24, perplexity x27, boilerplate
# x33, classifier x34, OOV x36, entropy x37) evaluated over the same
# corpus, reported as per-filter keep counts plus the strict
# all-gates intersection — the "how much data survives, and which
# gate is the bottleneck" report every curation run ships with. The
# oracle re-derives all seven gates independently, so the composite
# is not allowed to drift from its parts.
#
# Scale: the seven gates share the documents scan and each is the
# already-audited plan; the report adds one union + one join keyed on
# doc_id — negligible next to the gates themselves.
# ---------------------------------------------------------------------------
def _x40_oracle() -> str:
    from voter_file_etl_spark.registry import ORACLE

    gates = [
        ("x9", ORACLE["x9_quality_score"], "quality_ok"),
        ("x24", ORACLE["x24_repetition_filter"], "keep"),
        ("x27", ORACLE["x27_perplexity_filter"], "keep"),
        ("x33", ORACLE["x33_boilerplate_ngrams"], "keep"),
        ("x34", ORACLE["x34_quality_classifier"], "keep"),
        ("x36", ORACLE["x36_oov_filter"], "keep"),
        ("x37", ORACLE["x37_entropy_filter"], "keep"),
    ]
    ctes = ",\n    ".join(
        f"k_{name} AS (SELECT doc_id, {col} AS keep FROM ({sql}\n))"
        for name, sql, col in gates
    )
    per_filter = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS filter_name, doc_id, keep FROM k_{name}"
        for name, _, _ in gates
    )
    all_join = " AND ".join(f"k_{name}.keep" for name, _, _ in gates)
    all_from = " JOIN ".join(
        f"k_{name}" if i == 0 else f"k_{name} USING (doc_id)"
        for i, (name, _, _) in enumerate(gates)
    )
    return f"""
    WITH {ctes}
    SELECT filter_name,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM (
      {per_filter}
      UNION ALL
      SELECT 'all' AS filter_name, doc_id, {all_join} AS keep
      FROM {all_from}
    )
    GROUP BY filter_name
    """


@register("x40_curation_report", oracle=_x40_oracle())
def x40_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Every gate pipeline is evaluated exactly ONCE: the union of the
    # seven verdict frames is folded per doc into seven conditional
    # flags (each gate emits one row per doc, so max(when(gate, keep))
    # recovers each verdict), one global aggregate counts keeps per
    # gate AND the 7-way conjunction, and stack() unpivots the single
    # summary row into the report. The previous shape evaluated each
    # gate pipeline TWICE — once for the per-filter union, once for
    # the 7-way all-gates self-join (4.9 s at sf0.1; this form
    # ~2.6 s). Persisting the verdicts instead was MEASURED SLOWER
    # still (3.9 -> 6.3 s): the cache materialization barrier costs
    # more than the expression-only gate pipelines it saves.
    from functools import reduce as _reduce

    gates = [
        ("x9", x9_quality_score(spark, sf_dir).select("doc_id", F.col("quality_ok").alias("keep"))),
        ("x24", x24_repetition_filter(spark, sf_dir).select("doc_id", "keep")),
        ("x27", x27_perplexity_filter(spark, sf_dir).select("doc_id", "keep")),
        ("x33", x33_boilerplate_ngrams(spark, sf_dir).select("doc_id", "keep")),
        ("x34", x34_quality_classifier(spark, sf_dir).select("doc_id", "keep")),
        ("x36", x36_oov_filter(spark, sf_dir).select("doc_id", "keep")),
        ("x37", x37_entropy_filter(spark, sf_dir).select("doc_id", "keep")),
    ]
    names = [n for n, _ in gates]
    tagged = None
    for name, df in gates:
        part = df.select(F.lit(name).alias("filter_name"), "doc_id", "keep")
        tagged = part if tagged is None else tagged.unionByName(part)
    per_doc = tagged.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("filter_name") == n, F.col("keep"))).alias(f"k_{n}")
            for n in names
        ]
    )
    summary = per_doc.agg(
        F.count(F.lit(1)).alias("nd"),
        *[
            F.sum(F.when(F.col(f"k_{n}"), 1).otherwise(0)).alias(f"s_{n}")
            for n in names
        ],
        F.sum(
            F.when(
                _reduce(lambda a, b: a & b, [F.col(f"k_{n}") for n in names]), 1
            ).otherwise(0)
        ).alias("s_all"),
    )
    stack_args = ", ".join(
        [f"'{n}', nd, s_{n}" for n in names] + ["'all', nd, s_all"]
    )
    return summary.selectExpr(
        f"stack({len(names) + 1}, {stack_args})"
        " as (filter_name, n_docs, n_keep)"
    )


# ---------------------------------------------------------------------------
# X41 — exact-substring overlap dedup (the suffix-array method of
# "Deduplicating Training Data Makes Language Models Better", Lee et
# al. 2022, re-expressed for a cluster): a single suffix array over
# 100 TB is not distributable, but its OUTPUT — pairs of documents
# sharing a long exact token run — is reachable with anchor shingles:
# every 8-token shingle with position, equi-joined across documents,
# then gaps-and-islands over the match diagonal (p1 - p2) to recover
# the MAXIMAL shared run length. A shared run of L tokens appears as
# L-7 consecutive shingle hits on one diagonal, so max_run_tokens =
# island size + 7 is exact, not an estimate.
#
# Scale: the join key is shingle content with a document-frequency
# cap (2..20) — the same frequent-shingle guard CCNet uses — so a
# boilerplate shingle shared by thousands of docs cannot create a
# quadratic hot key: per-shingle expansion is bounded by C(20,2).
# Everything else is windows over (d1, d2, diag) partitions — small
# by construction.
# ---------------------------------------------------------------------------
@register(
    "x41_substring_dedup",
    oracle="""
    WITH arrs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         w -> w <> '') AS arr
      FROM documents
    ), sh AS (
      SELECT doc_id, i, array_to_string(list_slice(arr, i, i + 7), ' ') AS g
      FROM arrs, unnest(generate_series(1, len(arr) - 7)) AS u(i)
      WHERE len(arr) >= 8
    ), keep AS (
      SELECT g FROM sh GROUP BY g HAVING count(DISTINCT doc_id) BETWEEN 2 AND 20
    ), hits AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, a.i AS p1, b.i AS p2
      FROM sh a JOIN keep USING (g) JOIN sh b USING (g)
      WHERE a.doc_id < b.doc_id
    ), isl AS (
      SELECT d1, d2, p1 - p2 AS diag,
             p1 - row_number() OVER (
               PARTITION BY d1, d2, p1 - p2 ORDER BY p1) AS grp
      FROM hits
    ), runs AS (
      SELECT d1, d2, count(*) + 7 AS run_tokens
      FROM isl GROUP BY d1, d2, diag, grp
    )
    SELECT d1 AS doc1, d2 AS doc2, max(run_tokens) AS max_run_tokens
    FROM runs GROUP BY 1, 2
    HAVING max(run_tokens) >= 16
    """,
)
def x41_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    # array_remove, not filter(.., lambda): an interpreted lambda in
    # the generate's collapsed input re-runs per OUTPUT row (measured
    # 3.2 s -> 0.2 s for the shingle stage; functions/ngrams.py).
    arrs = docs.select(
        "doc_id",
        F.array_remove(
            F.split(F.lower("text"), "[^a-z0-9]+"), ""
        ).alias("arr"),
    ).filter(F.size("arr") >= 8)
    # positional zip-slice (functions/ngrams.py rationale): the
    # generate consumes codegen arrays_zip slices; position comes from
    # posexplode and the concat happens post-explode.
    _m = "greatest(size(arr) - 7, 0)"
    _zipped = ", ".join(f"slice(arr, {k + 1}, {_m})" for k in range(8))
    # shingle identity travels as xxhash64 (8-byte shuffle/join keys
    # instead of ~50-byte shingle strings — the x56 discipline; same
    # collision audit: driver_sim strict-clean at sf0.01/sf0.1
    # against the string-keyed oracle).
    # Materialized once (r13, the x4/x88 discipline): the shingle
    # build (tokenize + 8-way zip-slice Generate + hash) feeds THREE
    # consumers — the df-cap aggregate and both sides of the hit
    # self-join — and without the truncation each reference re-runs
    # the whole Generate subtree.
    sh = arrs.selectExpr(
        "doc_id", f"posexplode(arrays_zip({_zipped})) AS (pos, z)"
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("i"),
        F.xxhash64(
            F.concat_ws(" ", *[F.col(f"z.{k}") for k in range(8)])
        ).alias("g"),
    ).transform(materialize)
    keep = (
        sh.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter((F.col("ndocs") >= 2) & (F.col("ndocs") <= 20))
        .select("g")
    )
    shk = sh.join(keep, "g")
    a, b = shk.alias("a"), shk.alias("b")
    hits = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("d1"),
        F.col("b.doc_id").alias("d2"),
        F.col("a.i").alias("p1"),
        F.col("b.i").alias("p2"),
    )
    diag = (F.col("p1") - F.col("p2")).alias("diag")
    win = W.partitionBy("d1", "d2", F.col("p1") - F.col("p2")).orderBy("p1")
    isl = hits.select(
        "d1", "d2", diag, (F.col("p1") - F.row_number().over(win)).alias("grp")
    )
    runs = (
        isl.groupBy("d1", "d2", "diag", "grp")
        .agg((F.count(F.lit(1)) + F.lit(7)).alias("run_tokens"))
    )
    return (
        runs.groupBy(F.col("d1").alias("doc1"), F.col("d2").alias("doc2"))
        .agg(F.max("run_tokens").alias("max_run_tokens"))
        .filter(F.col("max_run_tokens") >= 16)
    )


# ---------------------------------------------------------------------------
# X42 — overlapping document chunking: the context-window prep step
# for embedding/RAG pipelines — each document becomes 64-token
# chunks on a 48-token stride (16 tokens of overlap so no boundary
# sentence is lost). Pure per-row array arithmetic (sequence ->
# slice -> concat): map-side only, no shuffle, no UDF; the chunk
# text itself stays out of the result (md5 fingerprint instead) so
# the row width is bounded.
# ---------------------------------------------------------------------------
_CHUNK, _STRIDE = 64, 48


@register(
    "x42_doc_chunking",
    oracle=f"""
    WITH a AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents)
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(arr, s, s + {_CHUNK} - 1)) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(arr, s, s + {_CHUNK} - 1), ' '))
             AS chunk_md5
    FROM a, unnest(generate_series(1, len(arr), {_STRIDE})) AS u(s)
    """,
)
def x42_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # explode the codegen stride sequence; slice/concat run ONCE per
    # chunk row after it (functions/ngrams.py rationale).
    return (
        docs.select("doc_id", F.split("text", " ").alias("arr"))
        .select(
            "doc_id",
            "arr",
            F.explode(F.expr(f"sequence(1, size(arr), {_STRIDE})")).alias(
                "s"
            ),
        )
        .select(
            "doc_id",
            F.expr(f"CAST((s - 1) div {_STRIDE} AS BIGINT)").alias(
                "chunk_idx"
            ),
            F.expr(f"CAST(size(slice(arr, s, {_CHUNK})) AS BIGINT)").alias(
                "n_tokens"
            ),
            F.md5(
                F.expr(f"cast(concat_ws(' ', slice(arr, s, {_CHUNK})) as binary)")
            ).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# X43 — PMI co-occurrence mining: which word pairs co-occur in more
# documents than independence predicts (collocation discovery /
# topic drift detection over a training corpus). PMI > 0 is tested
# as the EXACT integer cross-multiplication
#     c_xy * N > c_x * c_y
# — no logarithm ever crosses the engine boundary (the x27/x37
# micro-nat lesson: exp/ln are not IEEE-reproducible across engines,
# integer products are). Vocabulary is capped to the top-100 words
# by document frequency (ties broken lexically), so the per-document
# pair fan-out is bounded by C(100,2) and the pair shuffle cannot
# blow up on a verbose document.
# ---------------------------------------------------------------------------
@register(
    "x43_pmi_cooccurrence",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
        FROM documents) WHERE w <> ''
    ), dfc AS (
      SELECT w, count(*) AS df FROM toks GROUP BY w
    ), vocab AS (
      SELECT w, df FROM dfc ORDER BY df DESC, w LIMIT 100
    ), vt AS (
      SELECT t.doc_id, t.w, v.df FROM toks t JOIN vocab v USING (w)
    ), pairs AS (
      SELECT a.w AS w1, a.df AS c_x, b.w AS w2, b.df AS c_y,
             count(*) AS c_xy
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2, 3, 4
    )
    SELECT w1, w2, c_xy, c_x, c_y
    FROM pairs, (SELECT count(*) AS n FROM documents)
    WHERE c_xy >= 5 AND c_xy * n > c_x * c_y
    """,
)
def x43_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # r13 (guide §2.3/§2.4): the per-doc DISTINCT word set is computed
    # MAP-SIDE (array_distinct over the split array) — the old
    # explode + .distinct() paid a full shuffle of every token
    # occurrence just to dedup within documents. ds is deliberately
    # NOT materialized: the vocab rollup and the pair pass each
    # re-run the map-side split (two scans), which the A/B probe
    # measured FASTER than localCheckpoint-ing the word arrays
    # (1.90 s vs 2.58 s min-of-3 at sf0.1 — the x40 cache-barrier
    # lesson: materializing wide intermediates costs more than
    # re-running expression-only pipelines).
    ds = docs.select(
        "doc_id",
        F.array_distinct(
            F.array_remove(F.split(F.lower("text"), "[^a-z0-9]+"), "")
        ).alias("ws"),
    )
    # vocab (100 rows) is referenced THREE times (the membership
    # array + both df re-attach joins) and each rebuild is a FULL
    # corpus token pass — checkpoint the tiny frame once (r13;
    # probed 1.32 -> 1.24 s min-of-3, and structurally 3 -> 1 corpus
    # passes for the vocabulary).
    vocab = (
        ds.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("w"))
        .limit(100)
    ).transform(materialize)
    # Vocabulary membership attaches as a broadcast 1-row ARRAY and
    # the C(hits,2) per-doc pairs come from two CHAINED codegen
    # Generates (posexplode + explode of the tail slice — per-input-
    # row slices, never an interpreted pair-lambda, whose O(m^2)
    # array copies measured 4.4 s here) — the old doc_id self-join
    # shuffled the vocab-hit table twice and paid the join; now the
    # only full Exchange left is the pair aggregate itself. df values
    # re-attach post-aggregate via the broadcast 100-row vocab,
    # exactly as the oracle's bs joins do. A/B min-of-3 at sf0.1:
    # 2.49 s (old self-join) -> 1.90 s.
    varr = vocab.agg(F.array_sort(F.collect_set("w")).alias("varr"))
    # vws is LET-BOUND through an inline generate (functions/ngrams.py
    # discipline): written as a plain projection alias, the
    # posexplode's inferred size/isnotnull predicates push past it and
    # re-inline the array_sort(array_intersect(...)) into the join
    # condition — 3 evaluations per doc (caught by
    # tools/reinline_sweep.py); Generate is a collapse barrier, so
    # this form evaluates it once.
    pairs = (
        ds.crossJoin(F.broadcast(varr))
        .selectExpr(
            "inline(transform(array(array_sort(array_intersect(ws, varr))),"
            " v -> named_struct('vws', v)))"
        )
        .select(F.posexplode("vws").alias("p1", "w1"), "vws")
        .select(
            "w1",
            F.explode(
                F.expr("slice(vws, p1 + 2, size(vws) - p1 - 1)")
            ).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    n_total = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n")))
    return (
        pairs.join(
            F.broadcast(
                vocab.select(F.col("w").alias("w1"), F.col("df").alias("c_x"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                vocab.select(F.col("w").alias("w2"), F.col("df").alias("c_y"))
            ),
            "w2",
        )
        .crossJoin(n_total)
        .filter(
            (F.col("c_xy") >= 5)
            & (F.col("c_xy") * F.col("n") > F.col("c_x") * F.col("c_y"))
        )
        .select("w1", "w2", "c_xy", "c_x", "c_y")
    )


# ---------------------------------------------------------------------------
# X49 — quality-threshold selectivity curve: before committing to a
# cutoff, a curation pipeline asks "what fraction of the corpus
# survives at each candidate threshold" — tuning data, not a guess.
# One scan computes per-doc word counts; a bounded threshold explode
# (5 candidate cutoffs) + groupBy yields kept-count, total, and
# retention in exact basis points (integer arithmetic — no float
# division crosses the engine boundary). At 100 TB this is the
# 5x-fan-out-then-aggregate shape: map-side, one small shuffle.
# ---------------------------------------------------------------------------
_X49_THRESHOLDS = (5, 10, 20, 50, 100)


@register(
    "x49_quality_prune_curve",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_words
      FROM documents
    )
    SELECT th.min_words,
           count(CASE WHEN d.n_words >= th.min_words THEN 1 END) AS n_kept,
           count(*) AS n_total,
           count(CASE WHEN d.n_words >= th.min_words THEN 1 END)
             * 10000 // count(*) AS retention_bp
    FROM d CROSS JOIN (VALUES {", ".join(f"({v})" for v in _X49_THRESHOLDS)})
      AS th(min_words)
    GROUP BY th.min_words
    """,
)
def x49_quality_prune_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_words")
    )
    th = spark.createDataFrame(
        [(v,) for v in _X49_THRESHOLDS], "min_words long"
    )
    return (
        d.crossJoin(F.broadcast(th))
        .groupBy("min_words")
        .agg(
            F.count(F.when(F.col("n_words") >= F.col("min_words"), 1)).alias(
                "n_kept"
            ),
            F.count(F.lit(1)).alias("n_total"),
        )
        .withColumn(
            "retention_bp",
            F.expr("n_kept * 10000 div n_total"),
        )
    )


# ---------------------------------------------------------------------------
# X50 — span-corruption masking (the T5/UL2 denoising-objective prep
# step): deterministic span selection — every 5th 3-token span is
# replaced by an indexed sentinel in the input and becomes the
# target sequence — entirely with array lambdas over the token
# array: tokens -> span ids (pos div 3) -> masked/kept partition ->
# reassembled strings. No UDF, no shuffle; deterministic by
# position, so the oracle rebuilds the exact strings with DuckDB
# list lambdas. Output: masked input, target string, and span/token
# accounting per document.
# ---------------------------------------------------------------------------
_X50_SPAN = 3  # tokens per span
_X50_EVERY = 5  # mask every 5th span


@register(
    "x50_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS arr
      FROM documents
    ), marked AS (
      SELECT doc_id, arr,
             list_transform(arr, (w, i) ->
               CASE WHEN ((i - 1) // {_X50_SPAN}) % {_X50_EVERY} = 0
                    THEN NULL ELSE w END) AS kept,
             list_transform(arr, (w, i) ->
               CASE WHEN ((i - 1) // {_X50_SPAN}) % {_X50_EVERY} = 0
                    THEN w END) AS masked
      FROM toks
    )
    SELECT doc_id,
           CAST(len(arr) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(masked, w -> w IS NOT NULL)) AS BIGINT)
             AS n_masked,
           array_to_string(list_filter(kept, w -> w IS NOT NULL), ' ')
             AS masked_input,
           array_to_string(list_filter(masked, w -> w IS NOT NULL), ' ')
             AS target
    FROM marked
    """,
)
def x50_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(text, ' '), w -> w != '')").alias("arr"),
    )
    marked = toks.select(
        "doc_id",
        "arr",
        F.expr(
            f"transform(arr, (w, i0) -> CASE WHEN ((i0) div {_X50_SPAN})"
            f" % {_X50_EVERY} = 0 THEN NULL ELSE w END)"
        ).alias("kept"),
        F.expr(
            f"transform(arr, (w, i0) -> CASE WHEN ((i0) div {_X50_SPAN})"
            f" % {_X50_EVERY} = 0 THEN w END)"
        ).alias("masked"),
    )
    return marked.select(
        "doc_id",
        F.size("arr").cast("long").alias("n_tokens"),
        F.size(F.expr("filter(masked, w -> w is not null)"))
        .cast("long")
        .alias("n_masked"),
        F.array_join(
            F.expr("filter(kept, w -> w is not null)"), " "
        ).alias("masked_input"),
        F.array_join(
            F.expr("filter(masked, w -> w is not null)"), " "
        ).alias("target"),
    )


# ---------------------------------------------------------------------------
# X62 — language-ID confusion matrix: the evaluation harness for x8's
# stopword classifier against the corpus's ground-truth lang label
# (same measure-the-measurer family as x38 minhash accuracy / x39
# ANN recall — a data pipeline that can't audit its own classifiers
# silently rots). Emits the (true, guessed) contingency with each
# cell's share of its true-language row in basis points — the
# per-class recall diagonal a release gate would read.
#
# Scale: reuses x8's grouped stopword-hit aggregate (partial+final,
# no Python), then one O(langs^2)-key contingency groupBy and a
# broadcast row-total join — nothing after the first aggregate is
# corpus-sized.
# ---------------------------------------------------------------------------
@register(
    "x62_langid_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
    ), scores AS (
      SELECT doc_id,
        CAST(sum(CASE WHEN {_in_list('w', STOPWORDS_EN)} THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
        CAST(sum(CASE WHEN {_in_list('w', STOPWORDS_ES)} THEN 1 ELSE 0 END) AS BIGINT) AS es_hits,
        CAST(sum(CASE WHEN {_in_list('w', STOPWORDS_FR)} THEN 1 ELSE 0 END) AS BIGINT) AS fr_hits
      FROM toks GROUP BY doc_id
    ), guesses AS (
      SELECT s.doc_id, d.lang AS true_lang,
        CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
             WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
             WHEN fr_hits > 0 THEN 'fr'
             ELSE 'und' END AS guess
      FROM scores s JOIN documents d ON s.doc_id = d.doc_id
    ), cells AS (
      SELECT true_lang, guess, CAST(count(*) AS BIGINT) AS n
      FROM guesses GROUP BY true_lang, guess
    ), rows_ AS (
      SELECT true_lang, CAST(sum(n) AS BIGINT) AS row_n FROM cells
      GROUP BY true_lang
    )
    SELECT cells.true_lang, cells.guess, cells.n,
           CAST(cells.n * 10000 // rows_.row_n AS BIGINT) AS row_share_bp
    FROM cells JOIN rows_ ON cells.true_lang = rows_.true_lang
    """,
)
def x62_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    guesses = (
        x8_lang_id(spark, sf_dir)
        .select("doc_id", F.col("lang_guess").alias("guess"))
        .join(docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
    )
    cells = guesses.groupBy("true_lang", "guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows_ = cells.groupBy("true_lang").agg(
        F.sum("n").cast("long").alias("row_n")
    )
    return (
        cells.join(F.broadcast(rows_), "true_lang")
        .select(
            "true_lang",
            "guess",
            "n",
            F.expr("cast(n * 10000 div row_n as bigint)").alias(
                "row_share_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# T15 — unicode/whitespace sanitization: the first mechanical pass of
# every crawl-ingest pipeline (strip control characters, collapse
# whitespace runs, trim) — the hygiene step that runs BEFORE x8/x9
# scoring so ratios aren't skewed by formatting noise. The corpus is
# clean by construction, so dirt is INJECTED deterministically (a tab
# prefix, doubled inter-word spaces, a trailing CR LF) and the
# sanitizer must restore the original text exactly — a row-level
# inverse check, like f9's construct-then-invert pattern.
#
# Scale: pure map-side regexp_replace/trim column expressions in
# whole-stage codegen; the only shuffle is the final bounded rollup
# per language. DuckDB regexp_replace needs the 'g' flag to match
# Spark's replace-all semantics — that asymmetry is the one
# engine-boundary trap here.
# ---------------------------------------------------------------------------
@register(
    "t15_unicode_sanitize",
    oracle="""
    WITH dirty AS (
      SELECT doc_id, lang, text,
             chr(9) || replace(text, ' ', '  ') || chr(13) || chr(10) AS raw
      FROM documents
    ), cleaned AS (
      SELECT doc_id, lang, text, raw,
             trim(regexp_replace(regexp_replace(raw, '[\\x00-\\x1F]', ' ', 'g'),
                                 ' +', ' ', 'g')) AS clean
      FROM dirty
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(raw) - length(clean)) AS BIGINT) AS n_stripped,
           CAST(sum(CASE WHEN clean = text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_restored
    FROM cleaned GROUP BY lang
    """,
)
def t15_unicode_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.expr("char(9)"),
        F.regexp_replace("text", " ", "  "),
        F.expr("char(13)"),
        F.expr("char(10)"),
    )
    d = docs.select("doc_id", "lang", "text", raw.alias("raw"))
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace("raw", "[\\x00-\\x1F]", " "), " +", " "
        )
    )
    c = d.withColumn("clean", clean)
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("raw") - F.length("clean"))
        .cast("long")
        .alias("n_stripped"),
        F.sum(F.when(F.col("clean") == F.col("text"), 1).otherwise(0))
        .cast("long")
        .alias("n_restored"),
    )


# ---------------------------------------------------------------------------
# X64 — token distribution shift: the top distinctive tokens between
# two corpus halves (sources src0-9 vs src10-19) ranked by smoothed
# odds ratio — the drift report run when a crawl refresh lands or two
# data vendors are compared, and the unigram sibling of a36's KS test
# on numeric columns. Ranking uses add-one-smoothed count ratios
# scaled to exact integer ppm, so ordering is engine-independent
# (no log-odds floats); p_total/q_total scaling constants cancel in
# the ranking and are intentionally omitted.
#
# Scale: one token-keyed aggregate (map-side partial over the
# explode), then a global top-50 that Spark plans as
# TakeOrderedAndProject — O(50) per partition, no full sort.
# ---------------------------------------------------------------------------
@register(
    "x64_token_shift",
    oracle="""
    WITH toks AS (
      SELECT CAST(substr(source, 4) AS INTEGER) < 10 AS in_a,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    ), counts AS (
      SELECT word,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS q_n
      FROM toks WHERE word <> '' GROUP BY word
    )
    SELECT word, p_n, q_n,
           CAST((p_n + 1) * 1000000 // (q_n + 1) AS BIGINT) AS ratio_ppm
    FROM counts
    ORDER BY ratio_ppm DESC, word LIMIT 50
    """,
)
def x64_token_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        (F.substring("source", 4, 10).cast("int") < 10).alias("in_a"),
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"),
    )
    counts = (
        toks.filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0))
            .cast("long")
            .alias("p_n"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1))
            .cast("long")
            .alias("q_n"),
        )
    )
    return (
        counts.select(
            "word",
            "p_n",
            "q_n",
            F.expr("cast((p_n + 1) * 1000000 div (q_n + 1) as bigint)").alias(
                "ratio_ppm"
            ),
        )
        .orderBy(F.desc("ratio_ppm"), "word")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# X65 — vocabulary coverage curve: what fraction of the corpus token
# mass does a top-V frequency vocabulary cover? The sizing curve run
# before fixing a tokenizer/embedding vocab (the OOV complement of
# x36, which filters docs given a vocab; this picks the vocab). For
# V in {10, 20, 40}: the cumulative token mass of the top-V words in
# exact basis points.
#
# Scale: the corpus collapses to the token-count table first (one
# map-side-partial aggregate); the ranking window then runs over
# O(vocab) rows — bounded by distinct-token count, not corpus size,
# the same bounded-table-window discipline as a38/a41. The corpus
# total rides along by summing within the vocab table itself (the
# vocab IS the full support, so no second corpus pass).
# ---------------------------------------------------------------------------
@register(
    "x65_vocab_coverage",
    oracle="""
    WITH counts AS (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
              AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ), ranked AS (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word) AS rn,
             sum(cnt) OVER (ORDER BY cnt DESC, word
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER () AS total
      FROM counts
    )
    SELECT CAST(rn AS BIGINT) AS vocab_size,
           CAST(cum AS BIGINT) AS covered_tokens,
           CAST(total AS BIGINT) AS total_tokens,
           CAST(cum * 10000 // total AS BIGINT) AS coverage_bp
    FROM ranked WHERE rn IN (10, 20, 40)
    """,
)
def x65_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    counts = (
        t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    order = W.orderBy(F.desc("cnt"), "word")
    ranked = counts.select(
        "word",
        "cnt",
        F.row_number().over(order).alias("rn"),
        F.sum("cnt")
        .over(order.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("cnt").over(W.partitionBy()).alias("total"),
    )
    return ranked.filter(F.col("rn").isin(10, 20, 40)).select(
        F.col("rn").cast("long").alias("vocab_size"),
        F.col("cum").cast("long").alias("covered_tokens"),
        F.col("total").cast("long").alias("total_tokens"),
        F.expr("cast(cum * 10000 div total as bigint)").alias("coverage_bp"),
    )


# ---------------------------------------------------------------------------
# X66 — tokenizer fertility: subword tokens emitted per whitespace
# word, per language — the tokenizer-efficiency diagnostic run before
# committing a vocab (high-fertility languages burn context window;
# the number drives per-language sampling weights and token-budget
# math in x57/x25). Subword count uses x10's BPE-ish ceil(len/4)
# proxy per word, summed exactly; fertility is emitted in exact
# milli-tokens-per-word (integer division).
#
# Scale: one codegen explode + a bounded per-language rollup with
# map-side partials; no Python, no joins.
# ---------------------------------------------------------------------------
@register(
    "x66_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum((length(word) + 3) // 4) AS BIGINT) AS n_subtokens,
           CAST(sum((length(word) + 3) // 4) * 1000 // count(*) AS BIGINT)
             AS fertility_milli,
           CAST(sum(length(word)) * 1000 // count(*) AS BIGINT)
             AS chars_per_word_milli
    FROM (
      SELECT lang,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    )
    WHERE word <> '' GROUP BY lang
    """,
)
def x66_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        t(spark, sf_dir, "documents")
        .select(
            "lang",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    return words.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.expr("(length(word) + 3) div 4")).cast("long").alias(
            "n_subtokens"
        ),
        F.expr(
            "cast(sum((length(word) + 3) div 4) * 1000 div count(*) as bigint)"
        ).alias("fertility_milli"),
        F.expr(
            "cast(sum(length(word)) * 1000 div count(*) as bigint)"
        ).alias("chars_per_word_milli"),
    )


# ---------------------------------------------------------------------------
# X73 — classifier calibration curve: bin x34's quality-classifier
# score (score_micro, 0..1e6) into ten equal-width bins and compare,
# per bin, the MEAN PREDICTED score against the OBSERVED positive
# rate of an independent ground-truth label (here: the document's
# length lies in the in-distribution band [200, 1500] chars — the
# band the z-feature was tuned on). The per-bin |observed −
# predicted| gap is the Expected Calibration Error contribution;
# curation pipelines run exactly this audit before trusting a
# quality classifier's threshold (reliability diagrams in basis
# points, no floats crossing the engine boundary).
#
# Scale: the score is x34's pure map-side Column arithmetic; the
# audit adds ONE groupBy on a 10-value key with map-side combine.
# Linear, shuffle of 10 groups, no Python.
# ---------------------------------------------------------------------------
@register(
    "x73_calibration_curve",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x = 'a' OR x = 'the')) AS BIGINT) AS n_stop,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ), z AS (
      SELECT doc_id, n_chars,
             {half_up_sql("3.0 * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))"
                          " + 0.5 * (CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE))"
                          " - 0.002 * CAST(n_chars AS DOUBLE)"
                          " - 1.5", 6)} AS z
      FROM f WHERE n_words > 0
    ), scored AS (
      SELECT doc_id,
             CAST({half_up_sql("(0.5 + 0.5 * z / (1.0 + abs(z))) * 1000000", 0)}
                  AS BIGINT) AS score_micro,
             CASE WHEN n_chars BETWEEN 200 AND 1500 THEN 1 ELSE 0 END AS label
      FROM z
    )
    SELECT least(score_micro // 100000, 9) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(10000 * sum(label) // count(*) AS BIGINT) AS obs_rate_bp,
           CAST(sum(score_micro) // (100 * count(*)) AS BIGINT)
             AS mean_pred_bp,
           CAST(abs(10000 * sum(label) // count(*) -
                    sum(score_micro) // (100 * count(*))) AS BIGINT)
             AS gap_bp
    FROM scored GROUP BY 1
    """,
)
def x73_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    feats = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.filter(words, lambda x: (x == "a") | (x == "the")))
        .cast("bigint")
        .alias("n_stop"),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint").alias("n_alpha"),
        F.length("text").cast("bigint").alias("n_chars"),
    ).filter(F.col("n_words") > 0)
    # half_up, not F.round, at both quantizations: int-ratio linear
    # scores and the squashed micro-score can tie (x34's class; also
    # half-up-toward-+inf is sign-consistent for negative z).
    z = half_up(
        F.lit(3.0) * (F.col("n_stop").cast("double") / F.col("n_words").cast("double"))
        + F.lit(0.5) * (F.col("n_alpha").cast("double") / F.col("n_words").cast("double"))
        - F.lit(0.002) * F.col("n_chars").cast("double")
        - F.lit(1.5),
        6,
    )
    scored = feats.select("n_chars", z.alias("z")).select(
        half_up(
            (F.lit(0.5) + F.lit(0.5) * F.col("z") / (F.lit(1.0) + F.abs("z")))
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("score_micro"),
        F.when(F.col("n_chars").between(200, 1500), F.lit(1))
        .otherwise(F.lit(0))
        .alias("label"),
    )
    return scored.groupBy(
        F.least(F.expr("score_micro div 100000"), F.lit(9).cast("bigint")).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
        F.expr("10000 * sum(label) div count(1)").alias("obs_rate_bp"),
        F.expr("sum(score_micro) div (100 * count(1))").alias("mean_pred_bp"),
        F.expr(
            "abs(10000 * sum(label) div count(1)"
            " - sum(score_micro) div (100 * count(1)))"
        ).alias("gap_bp"),
    )


# ---------------------------------------------------------------------------
# X74 — pairwise Jensen-Shannon divergence between the token
# distributions of document sources: the standard corpus-drift /
# domain-shift statistic a curation pipeline computes before mixing
# sources (x25/x32 choose mix rates; this measures how different
# the ingredients actually are). For each unordered source pair,
# JS(p,q) = [KL(p||m) + KL(q||m)]/2 with m=(p+q)/2; each per-word
# log term ln(2·ca·Nb / (ca·Nb + cb·Na)) is computed from EXACT
# integer products (only the final ratio is a double), quantized to
# micro-nats with the engine-identical floor(x·1e6 + 0.5), and
# accumulated as integer sums — the x27 quantize-then-sum
# discipline. Absent words contribute via the other side's ln 2
# term, which is exact and identical in both engines.
#
# Scale: per-(source, word) counts aggregate first (map-side
# combine); the O(S²) pair expansion joins counts to the tiny pair
# table with TWO EQUI-JOINS (as-left, as-right) + union — never an
# IN-condition nested loop — so the work is Θ(vocab · S²) with S
# bounded (curated domain lists are tens, not thousands). Totals
# attach as broadcasts.
# ---------------------------------------------------------------------------
@register(
    "x74_source_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               w -> w <> '')) AS w
      FROM documents
    ), counts AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ), totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY source
    ), pairs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM totals a, totals b WHERE a.source < b.source
    ), sides AS (
      SELECT p.sa, p.sb, c.w, c.c AS ca, CAST(0 AS BIGINT) AS cb
      FROM counts c JOIN pairs p ON c.source = p.sa
      UNION ALL
      SELECT p.sa, p.sb, c.w, CAST(0 AS BIGINT) AS ca, c.c AS cb
      FROM counts c JOIN pairs p ON c.source = p.sb
    ), terms AS (
      SELECT sa, sb, w, sum(ca) AS ca, sum(cb) AS cb
      FROM sides GROUP BY sa, sb, w
    ), scored AS (
      SELECT t.sa, t.sb, t.ca, t.cb, na.n AS na, nb.n AS nb,
             CASE WHEN t.ca > 0 THEN t.ca * CAST(floor(
               ln(2.0 * t.ca * nb.n / (t.ca * nb.n + t.cb * na.n))
               * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS pa_micro,
             CASE WHEN t.cb > 0 THEN t.cb * CAST(floor(
               ln(2.0 * t.cb * na.n / (t.cb * na.n + t.ca * nb.n))
               * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS pb_micro
      FROM terms t
      JOIN totals na ON na.source = t.sa
      JOIN totals nb ON nb.source = t.sb
    )
    SELECT sa AS source_a, sb AS source_b,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(pa_micro) AS BIGINT) AS sum_a_micro,
           CAST(sum(pb_micro) AS BIGINT) AS sum_b_micro,
           CAST(floor((CAST(sum(pa_micro) AS DOUBLE) / max(na)
                       + CAST(sum(pb_micro) AS DOUBLE) / max(nb)) / 2
                      + 0.5) AS BIGINT) AS js_micro
    FROM scored GROUP BY sa, sb
    """,
)
def x74_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("w"),
    )
    counts = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = counts.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = totals.select(F.col("source").alias("sa"))
    b = totals.select(F.col("source").alias("sb"))
    pairs = a.crossJoin(b).filter(F.col("sa") < F.col("sb"))
    left = counts.join(
        F.broadcast(pairs), counts["source"] == pairs["sa"]
    ).select("sa", "sb", "w", F.col("c").alias("ca"), F.lit(0).cast("long").alias("cb"))
    right = counts.join(
        F.broadcast(pairs), counts["source"] == pairs["sb"]
    ).select("sa", "sb", "w", F.lit(0).cast("long").alias("ca"), F.col("c").alias("cb"))
    terms = (
        left.unionByName(right)
        .groupBy("sa", "sb", "w")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    na = F.broadcast(totals.select(F.col("source").alias("sa"), F.col("n").alias("na")))
    nb = F.broadcast(totals.select(F.col("source").alias("sb"), F.col("n").alias("nb")))
    scored = (
        terms.join(na, "sa")
        .join(nb, "sb")
        .select(
            "sa",
            "sb",
            F.expr(
                "case when ca > 0 then ca * cast(floor("
                "ln(2.0d * ca * nb / (ca * nb + cb * na))"
                " * 1000000 + 0.5d) as bigint) else 0 end"
            ).alias("pa_micro"),
            F.expr(
                "case when cb > 0 then cb * cast(floor("
                "ln(2.0d * cb * na / (cb * na + ca * nb))"
                " * 1000000 + 0.5d) as bigint) else 0 end"
            ).alias("pb_micro"),
            "na",
            "nb",
        )
    )
    return scored.groupBy(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("pa_micro").cast("long").alias("sum_a_micro"),
        F.sum("pb_micro").cast("long").alias("sum_b_micro"),
        F.expr(
            "cast(floor((cast(sum(pa_micro) as double) / max(na)"
            " + cast(sum(pb_micro) as double) / max(nb)) / 2"
            " + 0.5d) as bigint)"
        ).alias("js_micro"),
    )


# ---------------------------------------------------------------------------
# X75 — code-vs-prose filtering: score every document on integer
# syntax-density features (brace/bracket/semicolon characters,
# assignment operators, digit density) and report the per-source
# code fraction — the pretraining-curation split that routes
# documents to code vs natural-language pipelines before
# language-specific cleaning (x8's lang-ID is the NL analogue; this
# is its code-side sibling). Every feature is a regexp_count /
# length expression in basis points — no floats, no tokenizer.
#
# Scale: pure map-side Column arithmetic in whole-stage codegen plus
# ONE bounded rollup on source — a4's shape over documents.
# ---------------------------------------------------------------------------
@register(
    "x75_code_data_filter",
    oracle="""
    WITH f AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '[{}()\\[\\];]')) AS BIGINT)
               AS n_braces,
             CAST(len(regexp_extract_all(text, '=')) AS BIGINT) AS n_eq,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
      FROM documents
    ), scored AS (
      SELECT source, n_braces,
             (n_braces * 50 + n_eq * 30 + n_digits * 5) * 10000
               // greatest(n_chars, 1) AS score_bp
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score_bp >= 150 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_code,
           CAST(10000 * sum(CASE WHEN score_bp >= 150 THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS code_bp,
           CAST(sum(n_braces) AS BIGINT) AS sum_braces
    FROM scored GROUP BY source
    """,
)
def x75_code_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    f = docs.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.expr("regexp_count(text, '[{}()\\\\[\\\\];]')").cast("long").alias("n_braces"),
        F.expr("regexp_count(text, '=')").cast("long").alias("n_eq"),
        F.expr("regexp_count(text, '[0-9]')").cast("long").alias("n_digits"),
    )
    scored = f.select(
        "source",
        "n_braces",
        F.expr(
            "(n_braces * 50 + n_eq * 30 + n_digits * 5) * 10000"
            " div greatest(n_chars, 1L)"
        ).alias("score_bp"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("score_bp") >= 150, 1).otherwise(0))
        .cast("long")
        .alias("n_code"),
        F.expr(
            "10000 * sum(case when score_bp >= 150 then 1 else 0 end)"
            " div count(1)"
        ).alias("code_bp"),
        F.sum("n_braces").cast("long").alias("sum_braces"),
    )


# ---------------------------------------------------------------------------
# X78 — BM25 term scoring: the retrieval-ranking scorer (Okapi BM25,
# k1=1.2, b=0.75) over the document corpus — x16's TF-IDF sibling
# with saturation and length normalization, the function every
# retrieval-augmented pipeline ranks candidate passages with. The
# corpus statistics (N, total length) ride a 1-row broadcast;
# df joins on the term key. The probe subset (doc_id % 50 = 0)
# bounds the emitted rows exactly like x16. Quantization: idf and
# the final score are floor(x*1e6 + 0.5) micro-units built from the
# identical expression text on both engines; tf, dl, df, N, and
# total length are exact integers throughout.
#
# Scale: two token aggregates (map-side combined) + one equi-join on
# the term key + one broadcast — linear in corpus tokens; no
# Python, no cartesian.
# ---------------------------------------------------------------------------
@register(
    "x78_bm25_scoring",
    oracle="""
    WITH toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
        FROM documents
      ) WHERE w <> ''
    ), tfc AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, w
    ), dlen AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ), dfw AS (
      SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY w
    ), corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dlen
    )
    SELECT tfc.doc_id, tfc.w AS term, tf, dl, df,
           CAST(floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * 1000000 + 0.5) AS BIGINT) AS idf_micro,
           CAST(floor(
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (CAST(tf AS DOUBLE) * 2.2)
             / (CAST(tf AS DOUBLE) + 1.2 *
                (0.25 + 0.75 * CAST(dl AS DOUBLE) * n_docs / total_len))
             * 1000000 + 0.5) AS BIGINT) AS bm25_micro
    FROM tfc
    JOIN dlen ON tfc.doc_id = dlen.doc_id
    JOIN dfw ON tfc.w = dfw.w
    CROSS JOIN corpus
    WHERE tfc.doc_id % 50 = 0
    """,
)
def x78_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.col("w") != "")
    tfc = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    dfw = (
        toks.select("doc_id", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    corpus = dlen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    return (
        tfc.filter(F.col("doc_id") % 50 == 0)
        .join(dlen, "doc_id")
        .join(dfw, "w")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            "tf",
            "dl",
            "df",
            F.expr(
                "cast(floor(ln(1.0d + (n_docs - df + 0.5d) / (df + 0.5d))"
                " * 1000000 + 0.5d) as bigint)"
            ).alias("idf_micro"),
            F.expr(
                "cast(floor("
                "ln(1.0d + (n_docs - df + 0.5d) / (df + 0.5d))"
                " * (cast(tf as double) * 2.2d)"
                " / (cast(tf as double) + 1.2d *"
                " (0.25d + 0.75d * cast(dl as double) * n_docs / total_len))"
                " * 1000000 + 0.5d) as bigint)"
            ).alias("bm25_micro"),
        )
    )


# ---------------------------------------------------------------------------
# X79 — dataset card: the per-source "datasheet for datasets"
# rollup a corpus release ships with — document count, token mass,
# mean length, language mix (count + entropy in milli-nats), and
# the within-source exact-duplicate rate in basis points. One
# governance table that summarizes what x8/x10/x1 measure
# individually; every statistic is integer or quantized with the
# x27 ln discipline.
#
# Scale: a doc-grain projection (tokenize + md5, map-side) feeding
# three bounded rollups — (source), (source, lang), (source, hash)
# — each with map-side combine; the dup count never materializes
# pair joins (count-minus-distinct on the hash rollup).
# ---------------------------------------------------------------------------
@register(
    "x79_dataset_card",
    oracle="""
    WITH d AS (
      SELECT source, lang, md5(text) AS h,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+'),
                                  w -> w <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), per_lang AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS nl
      FROM d GROUP BY source, lang
    ), shares AS (
      SELECT source, nl,
             sum(nl) OVER (PARTITION BY source) AS tot
      FROM per_lang
    ), lang_mix AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(CAST(floor(
               -1000.0 * (CAST(nl AS DOUBLE) / tot)
               * ln(CAST(nl AS DOUBLE) / tot)
               + 0.5) AS BIGINT)) AS BIGINT) AS lang_entropy_milli
      FROM shares GROUP BY source
    ), dup AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_dupes,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      FROM d GROUP BY source
    )
    SELECT dup.source, dup.n_docs, dup.sum_tokens,
           CAST(dup.sum_tokens // dup.n_docs AS BIGINT) AS mean_tokens,
           lang_mix.n_langs, lang_mix.lang_entropy_milli,
           CAST(10000 * dup.n_dupes // dup.n_docs AS BIGINT) AS dup_bp
    FROM dup JOIN lang_mix ON dup.source = lang_mix.source
    """,
)
def x79_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    per_lang = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("nl")
    )
    from pyspark.sql.window import Window as W

    w_src = W.partitionBy("source")
    lang_mix = (
        per_lang.select(
            "source",
            "nl",
            F.sum("nl").over(w_src).alias("tot"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum(
                F.expr(
                    "cast(floor(-1000.0d * (cast(nl as double) / tot)"
                    " * ln(cast(nl as double) / tot) + 0.5d) as bigint)"
                )
            )
            .cast("long")
            .alias("lang_entropy_milli"),
        )
    )
    dup = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("h")).cast("long").alias("n_dupes"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
    return dup.join(lang_mix, "source").select(
        "source",
        "n_docs",
        "sum_tokens",
        F.expr("sum_tokens div n_docs").alias("mean_tokens"),
        "n_langs",
        "lang_entropy_milli",
        F.expr("10000 * n_dupes div n_docs").alias("dup_bp"),
    )


# ---------------------------------------------------------------------------
# X80 — Zipf-law vocabulary check: the OLS slope of ln(frequency)
# against ln(rank) over the top-200 tokens — natural corpora sit
# near slope −1, and a corpus that drifts (templated spam, code
# dumps, synthetic loops) shows up as a slope break before any
# per-document filter fires. Frequencies and ranks are exact
# integers; each ln quantizes to micro-nats (floor(x·1e6 + 0.5),
# identical text both engines), and the OLS closed form runs over
# those INTEGER micro-values — sums, products, and one final
# integer division, the a41 discipline with x27's quantization.
#
# Scale: one token count (map-side combined), one bounded top-k
# (200 rows via the full-order window), then driver-free closed-form
# OLS in a 1-row aggregate.
# ---------------------------------------------------------------------------
@register(
    "x80_zipf_check",
    oracle="""
    WITH freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
        SELECT unnest(list_filter(
          regexp_split_to_array(lower(text), '[^a-z0-9]+'),
          x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
      FROM freq
    ), top AS (
      SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
               AS lr,
             CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
               AS lf
      FROM ranked WHERE r <= 200
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST((count(*) * sum(lr * lf) - sum(lr) * sum(lf)) * 10000 //
                (count(*) * sum(lr * lr) - sum(lr) * sum(lr))
                AS BIGINT) AS slope_bp
    FROM top
    """,
)
def x80_zipf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = t(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    ranked = freq.select(
        "f", F.row_number().over(W.orderBy(F.desc("f"), "w")).alias("r")
    ).filter(F.col("r") <= 200)
    top = ranked.select(
        F.expr(
            "cast(floor(ln(cast(r as double)) * 1000000 + 0.5d) as bigint)"
        ).alias("lr"),
        F.expr(
            "cast(floor(ln(cast(f as double)) * 1000000 + 0.5d) as bigint)"
        ).alias("lf"),
    )
    return top.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.expr(
            "(count(1) * sum(lr * lf) - sum(lr) * sum(lf)) * 10000"
            " div (count(1) * sum(lr * lr) - sum(lr) * sum(lr))"
        ).alias("slope_bp"),
    )


# ---------------------------------------------------------------------------
# X82 — prefix-reuse analysis: how much of the corpus shares its
# first 64 characters with at least one other document — the
# planning number behind prompt-prefix caching and radix-tree KV
# reuse in serving (and, in curation, a cheap template detector:
# heavy prefix reuse = boilerplate openings x33/x70 should see).
# Groups on md5 of the fixed-length prefix; reports per-source
# document count, documents in a shared-prefix group, distinct
# shared groups, reuse in bp, and the token mass such a cache would
# deduplicate (estimated at 16 tokens per shared 64-char prefix
# occurrence beyond the first).
#
# Scale: one map-side projection + two bounded rollups (prefix
# groups then source) — no joins, no pair enumeration.
# ---------------------------------------------------------------------------
@register(
    "x82_prefix_reuse",
    oracle="""
    WITH p AS (
      SELECT source, md5(substr(text, 1, 64)) AS ph
      FROM documents
    ), g AS (
      SELECT source, ph, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY source, ph
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
             AS n_shared_docs,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_groups,
           CAST(10000 * sum(CASE WHEN n >= 2 THEN n ELSE 0 END) // sum(n)
                AS BIGINT) AS reuse_bp,
           CAST(16 * sum(CASE WHEN n >= 2 THEN n - 1 ELSE 0 END) AS BIGINT)
             AS cacheable_tokens_est
    FROM g GROUP BY source
    """,
)
def x82_prefix_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    g = (
        docs.select(
            "source", F.md5(F.substring("text", 1, 64)).alias("ph")
        )
        .groupBy("source", "ph")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    shared = F.when(F.col("n") >= 2, F.col("n")).otherwise(0)
    return g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(shared).cast("long").alias("n_shared_docs"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_groups"),
        F.expr(
            "10000 * sum(case when n >= 2 then n else 0 end) div sum(n)"
        ).alias("reuse_bp"),
        (
            F.lit(16)
            * F.sum(F.when(F.col("n") >= 2, F.col("n") - 1).otherwise(0))
        )
        .cast("long")
        .alias("cacheable_tokens_est"),
    )


# ---------------------------------------------------------------------------
# X83 — term burstiness: the variance-to-mean ratio (Fisher
# dispersion) of per-document occurrence counts for the 100 most
# frequent terms — function words occur evenly (VMR near 1),
# topical/bursty terms clump (VMR >> 1), so this is the statistic
# behind data-driven stopword lists (t10 uses a fixed list; this is
# how you'd derive one from the corpus itself). Zero-occurrence
# documents COUNT toward the moments (n is the corpus size, not the
# term's document frequency) — computed via sum-of-squares over
# occurrences plus the known n, never by materializing zeros. VMR
# is emitted in exact milli-units: 1000·(n·Σc² − (Σc)²) // (n·Σc).
#
# Scale: one (term, doc) count, one bounded top-k, moments as
# integer sums joined to the 1-row corpus size — no zero-filling,
# no pair joins.
# ---------------------------------------------------------------------------
@register(
    "x83_term_burstiness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        w -> w <> '')) AS w
      FROM documents
    ), tc AS (
      SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY w, doc_id
    ), term AS (
      SELECT w, CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS scc,
             CAST(count(*) AS BIGINT) AS df
      FROM tc GROUP BY w
    ), top AS (
      SELECT w, sc, scc, df,
             row_number() OVER (ORDER BY sc DESC, w) AS r
      FROM term
    ), nd AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    )
    SELECT w AS term, sc AS n_occurrences, df AS doc_freq,
           CAST(1000 * (nd.n * scc - sc * sc) // (nd.n * sc) AS BIGINT)
             AS vmr_milli
    FROM top CROSS JOIN nd WHERE r <= 100
    """,
)
def x83_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("w"),
    )
    tc = tok.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    term = tc.groupBy("w").agg(
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    top = term.select(
        "w",
        "sc",
        "scc",
        "df",
        F.row_number().over(W.orderBy(F.desc("sc"), "w")).alias("r"),
    ).filter(F.col("r") <= 100)
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return top.crossJoin(F.broadcast(nd)).select(
        F.col("w").alias("term"),
        F.col("sc").alias("n_occurrences"),
        F.col("df").alias("doc_freq"),
        F.expr("1000 * (n * scc - sc * sc) div (n * sc)").alias("vmr_milli"),
    )


# ---------------------------------------------------------------------------
# X87 — injection-pattern hygiene scan: per-source rates of
# instruction-override phrasing ("ignore ... instructions",
# "system prompt", "you are now"), long base64-ish runs, and
# bidi/zero-width control characters — the adversarial-content
# screen a corpus passes before becoming assistant training data
# (x20 redacts PII; this flags content designed to steer the
# model). Counts are regexp_count expressions in basis points;
# flagged = any category hit.
#
# Scale: pure codegen regexp arithmetic + one bounded source
# rollup — x75's shape with an adversarial lens.
# ---------------------------------------------------------------------------
@register(
    "x87_injection_scan",
    oracle="""
    WITH f AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text),
               'ignore (all|previous|the above)|system prompt|you are now'))
               AS BIGINT) AS n_override,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9+/]{40,}={0,2}'))
               AS BIGINT) AS n_base64ish,
             CAST(len(regexp_extract_all(text,
               '[\\x{200b}\\x{200c}\\x{200d}\\x{202a}-\\x{202e}\\x{2066}-\\x{2069}]'))
               AS BIGINT) AS n_bidi
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_override + n_base64ish + n_bidi > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(n_override) AS BIGINT) AS n_override_hits,
           CAST(sum(n_base64ish) AS BIGINT) AS n_base64_hits,
           CAST(sum(n_bidi) AS BIGINT) AS n_bidi_hits,
           CAST(10000 * sum(CASE WHEN n_override + n_base64ish + n_bidi > 0
                                 THEN 1 ELSE 0 END) // count(*) AS BIGINT)
             AS flagged_bp
    FROM f GROUP BY source
    """,
)
def x87_injection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    f = docs.select(
        "source",
        F.expr(
            "regexp_count(lower(text),"
            " 'ignore (all|previous|the above)|system prompt|you are now')"
        )
        .cast("long")
        .alias("n_override"),
        F.expr("regexp_count(text, '[A-Za-z0-9+/]{40,}={0,2}')")
        .cast("long")
        .alias("n_base64ish"),
        F.expr(
            "regexp_count(text,"
            " '[\\\\u200b\\\\u200c\\\\u200d\\\\u202a-\\\\u202e"
            "\\\\u2066-\\\\u2069]')"
        )
        .cast("long")
        .alias("n_bidi"),
    )
    hit = F.col("n_override") + F.col("n_base64ish") + F.col("n_bidi") > 0
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_flagged"),
        F.sum("n_override").cast("long").alias("n_override_hits"),
        F.sum("n_base64ish").cast("long").alias("n_base64_hits"),
        F.sum("n_bidi").cast("long").alias("n_bidi_hits"),
        F.expr(
            "10000 * sum(case when n_override + n_base64ish + n_bidi > 0"
            " then 1 else 0 end) div count(1)"
        ).alias("flagged_bp"),
    )


# ---------------------------------------------------------------------------
# X90 — data-driven stopword derivation: the terms x83's burstiness
# statistic says are FUNCTION words — high frequency (top-200) AND
# evenly dispersed (VMR below 2.5, in milli-units) — emitted as the
# corpus's own stopword list with their stats; t10's fixed English
# list is the hand-written version of exactly this output, and
# multilingual corpora need the derived form. Deterministic: every
# filter is integer arithmetic over the x83 moments.
#
# Scale: identical posture to x83 — bounded top-k over the term
# moments, no zero-filling, no pair work. The top-200 pick is
# orderBy+limit (TakeOrderedAndProject: per-partition heap then a
# 200-row driver merge), never a global row_number window that would
# single-partition the whole vocabulary; the (sc DESC, w) sort key is
# unique per term, so the pick is deterministic and tie-free.
# ---------------------------------------------------------------------------
@register(
    "x90_derived_stopwords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        w -> w <> '')) AS w
      FROM documents
    ), tc AS (
      SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY w, doc_id
    ), term AS (
      SELECT w, CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS scc,
             CAST(count(*) AS BIGINT) AS df
      FROM tc GROUP BY w
    ), top AS (
      SELECT w, sc, scc, df,
             row_number() OVER (ORDER BY sc DESC, w) AS r
      FROM term
    ), nd AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    )
    SELECT w AS stopword, sc AS n_occurrences, df AS doc_freq,
           CAST(1000 * (nd.n * scc - sc * sc) // (nd.n * sc) AS BIGINT)
             AS vmr_milli
    FROM top CROSS JOIN nd
    WHERE r <= 200
      AND 1000 * (nd.n * scc - sc * sc) // (nd.n * sc) < 2500
    """,
)
def x90_derived_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("w"),
    )
    tc = tok.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    term = tc.groupBy("w").agg(
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    top = term.orderBy(F.desc("sc"), "w").limit(200)
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    joined = top.crossJoin(F.broadcast(nd)).withColumn(
        "vmr_milli", F.expr("1000 * (n * scc - sc * sc) div (n * sc)")
    )
    return joined.filter(F.col("vmr_milli") < 2500).select(
        F.col("w").alias("stopword"),
        F.col("sc").alias("n_occurrences"),
        F.col("df").alias("doc_freq"),
        "vmr_milli",
    )


# ---------------------------------------------------------------------------
# X91 — intra-document code-switching detection: x8's stopword
# language scorer applied per 20-token SEGMENT instead of per
# document, then rolled up to mixing statistics — segment count,
# distinct segment languages, adjacent-segment switches, and the
# majority language's share (bp). The multilingual-curation gate
# x8 cannot express: a doc that is half 'en' half 'es' looks 'en'
# to x8 but shows n_langs=2 / majority~5000bp here.
#
# Scale: segment scoring is one groupBy(doc_id, seg) with map-side
# combine; switch counting is a doc-partitioned lag window; the
# majority join is doc_id-vs-doc_id (co-partitioned, no broadcast
# needed, no global windows).
# ---------------------------------------------------------------------------
@register(
    "x91_code_switching",
    oracle=f"""
    WITH a AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents),
    tok AS (
      SELECT doc_id, arr[i] AS w, CAST((i - 1) // 20 AS BIGINT) AS seg
      FROM a, unnest(range(1, len(arr) + 1)) AS t(i)
    ), sc AS (
      SELECT doc_id, seg,
        sum(CASE WHEN {_in_list('w', STOPWORDS_EN)} THEN 1 ELSE 0 END) AS en,
        sum(CASE WHEN {_in_list('w', STOPWORDS_ES)} THEN 1 ELSE 0 END) AS es,
        sum(CASE WHEN {_in_list('w', STOPWORDS_FR)} THEN 1 ELSE 0 END) AS fr
      FROM tok GROUP BY doc_id, seg
    ), g AS (
      SELECT doc_id, seg,
        CASE WHEN en >= es AND en >= fr AND en > 0 THEN 'en'
             WHEN es >= fr AND es > 0 THEN 'es'
             WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_seg
      FROM sc
    ), seq AS (
      SELECT doc_id, lang_seg,
             lag(lang_seg) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
      FROM g
    ), per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_segs,
             CAST(count(DISTINCT lang_seg) AS BIGINT) AS n_langs,
             CAST(sum(CASE WHEN prev IS NOT NULL AND lang_seg <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
      FROM seq GROUP BY doc_id
    ), maj AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS max_c FROM (
        SELECT doc_id, lang_seg, count(*) AS c FROM g
        GROUP BY doc_id, lang_seg
      ) GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_segs, p.n_langs, p.n_switches,
           CAST(m.max_c * 10000 // p.n_segs AS BIGINT) AS majority_bp
    FROM per_doc p JOIN maj m ON p.doc_id = m.doc_id
    """,
)
def x91_code_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).select(
        "doc_id", F.expr("cast(pos div 20 as bigint)").alias("seg"), "w"
    )

    def hits(words: tuple[str, ...]) -> F.Column:
        return F.sum(F.when(F.col("w").isin(*words), 1).otherwise(0))

    sc = tok.groupBy("doc_id", "seg").agg(
        hits(STOPWORDS_EN).alias("en"),
        hits(STOPWORDS_ES).alias("es"),
        hits(STOPWORDS_FR).alias("fr"),
    )
    g = sc.select(
        "doc_id",
        "seg",
        F.when(
            (F.col("en") >= F.col("es"))
            & (F.col("en") >= F.col("fr"))
            & (F.col("en") > 0),
            "en",
        )
        .when((F.col("es") >= F.col("fr")) & (F.col("es") > 0), "es")
        .when(F.col("fr") > 0, "fr")
        .otherwise("und")
        .alias("lang_seg"),
    )
    seq = g.select(
        "doc_id",
        "lang_seg",
        F.lag("lang_seg")
        .over(W.partitionBy("doc_id").orderBy("seg"))
        .alias("prev"),
    )
    per_doc = seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segs"),
        F.countDistinct("lang_seg").cast("long").alias("n_langs"),
        F.sum(
            F.when(
                F.col("prev").isNotNull()
                & (F.col("lang_seg") != F.col("prev")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_switches"),
    )
    maj = (
        g.groupBy("doc_id", "lang_seg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("max_c"))
    )
    return per_doc.join(maj, "doc_id").select(
        "doc_id",
        "n_segs",
        "n_langs",
        "n_switches",
        F.expr("cast(max_c * 10000 div n_segs as bigint)").alias(
            "majority_bp"
        ),
    )


# ---------------------------------------------------------------------------
# X92 — inverted-index construction: for the 500 highest-df terms,
# the capped posting list (top-10 docs by tf, tf-desc then doc_id) as
# a comma-joined string plus the doc frequency — the retrieval-side
# artifact behind x78's BM25 scoring, materialized instead of scored.
#
# Scale: "top-10 docs per term" is the skew trap — a stopword's
# posting list is the whole corpus, so a term-partitioned rank window
# would sort billions of rows in one partition. Two-level salted
# top-k instead: rank within (term, doc_id % 64) cells (partition
# size df/64), keep 10 per cell, then rank the <=640 survivors per
# term. The global top-500-terms pick is orderBy+limit
# (TakeOrderedAndProject), never a global window.
# ---------------------------------------------------------------------------
@register(
    "x92_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        w -> w <> '')) AS w
      FROM documents
    ), tc AS (
      SELECT w, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY w, doc_id
    ), dfreq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS doc_freq FROM tc GROUP BY w
    ), rk AS (
      SELECT w, doc_id,
             row_number() OVER (PARTITION BY w
                                ORDER BY tf DESC, doc_id) AS r
      FROM tc
    ), post AS (
      SELECT w, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY r)
               AS top_docs
      FROM rk WHERE r <= 10 GROUP BY w
    ), top AS (
      SELECT d.w, d.doc_freq, p.top_docs,
             row_number() OVER (ORDER BY d.doc_freq DESC, d.w) AS tr
      FROM dfreq d JOIN post p ON d.w = p.w
    )
    SELECT w AS term, doc_freq, top_docs FROM top WHERE tr <= 500
    """,
)
def x92_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("w"),
    )
    tc = tok.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tc.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    # Level 1: rank inside salt cells (bounded df/64 partitions),
    # keep 10 — the global top-10 is a subset of the survivors.
    cell = W.partitionBy("w", F.expr("doc_id % 64")).orderBy(
        F.desc("tf"), "doc_id"
    )
    cand = tc.withColumn("cr", F.row_number().over(cell)).filter(
        F.col("cr") <= 10
    )
    # Level 2: exact rank over the <=640 candidates per term.
    rk = cand.withColumn(
        "r",
        F.row_number().over(W.partitionBy("w").orderBy(F.desc("tf"), "doc_id")),
    ).filter(F.col("r") <= 10)
    post = rk.groupBy("w").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "doc_id"))),
                lambda s: s.doc_id.cast("string"),
            ),
            ",",
        ).alias("top_docs")
    )
    return (
        dfreq.join(post, "w")
        .orderBy(F.desc("doc_freq"), "w")
        .limit(500)
        .select(F.col("w").alias("term"), "doc_freq", "top_docs")
    )


# ---------------------------------------------------------------------------
# X93 — repeated n-gram span index: for every 5-gram that occurs MORE
# than once inside a document, the occurrence count and the first/
# last start positions. x24 flags repetitive DOCS; this emits the
# span-level evidence a surgical filter needs to mask or trim the
# loops instead of dropping the whole document.
#
# Scale: gram extraction is the x42 slice-explode (bounded ~1 row per
# token); the rollup shuffles on (doc_id, gram) with map-side combine
# and only repeated grams survive, so output is proportional to the
# repetition actually present.
# ---------------------------------------------------------------------------
@register(
    "x93_repeated_ngram_spans",
    oracle="""
    WITH a AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents),
    grams AS (
      SELECT doc_id, CAST(s AS BIGINT) AS s,
             md5(array_to_string(list_slice(arr, s, s + 4), ' ')) AS gram_md5
      FROM a, unnest(generate_series(1, len(arr) - 4)) AS u(s)
    )
    SELECT doc_id, gram_md5,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(s) AS BIGINT) AS first_pos,
           CAST(max(s) AS BIGINT) AS last_pos
    FROM grams GROUP BY doc_id, gram_md5
    HAVING count(*) >= 2
    """,
)
def x93_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("arr"))
        # Guard BEFORE the sequence: Spark infers step -1 when
        # size(arr) - 4 < 1 (emitting phantom positions 1, 0, ...)
        # where DuckDB's generate_series is simply empty — a sub-
        # 5-token doc would diverge between engines without this.
        .filter(F.expr("size(arr) >= 5"))
        .select(
            "doc_id",
            "arr",
            F.explode(F.expr("sequence(1, size(arr) - 4)")).alias("s"),
        )
        .select(
            "doc_id",
            F.col("s").cast("long").alias("s"),
            F.md5(
                F.expr("cast(concat_ws(' ', slice(arr, s, 5)) as binary)")
            ).alias("gram_md5"),
        )
    )
    return (
        grams.groupBy("doc_id", "gram_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("s").cast("long").alias("first_pos"),
            F.max("s").cast("long").alias("last_pos"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )


# ---------------------------------------------------------------------------
# X95 — content-defined chunking (CDC): split every document at
# rolling-hash boundaries (8-byte polynomial window, boundary where
# H % 32 == 0, sentinel at end-of-doc) and report, per document, the
# chunk count and how many of its chunk instances are SHARED with at
# least one other document — the variable-size-chunk dedup primitive
# behind rsync/borg/venti-style storage dedup, where insertions shift
# fixed blocks but CDC boundaries re-align.
#
# Scale: chunking is a VECTORIZED mapInPandas stage (numpy sliding
# dot for the rolling hash, Arrow batches, partition-preserving, no
# shuffle); only the chunk-hash table shuffles, keyed on cmd5 with
# map-side combine. The oracle recomputes the same boundaries with
# eight explicit unicode()*31^k terms per position — per-char SQL is
# the CORRECTNESS mirror, not the scale path.
# ---------------------------------------------------------------------------
_X95_W = [31**7, 31**6, 31**5, 31**4, 31**3, 31**2, 31, 1]


def _x95_h_sql() -> str:
    terms = " + ".join(
        f"CAST(unicode(substr(text, CAST(p AS INTEGER) - {7 - k}, 1))"
        f" AS BIGINT) * {w}"
        for k, w in enumerate(_X95_W)
    )
    return f"({terms})"


@register(
    "x95_cdc_chunking",
    oracle=f"""
    WITH b0 AS (
      SELECT doc_id, CAST(p AS BIGINT) AS p
      FROM documents, unnest(generate_series(8, length(text))) g(p)
      WHERE {_x95_h_sql()} % 32 = 0
    ), b AS (
      SELECT doc_id, p FROM b0
      UNION
      SELECT doc_id, CAST(length(text) AS BIGINT) FROM documents
      WHERE length(text) >= 1
    ), bb AS (
      SELECT doc_id, p,
             coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0)
               AS prev
      FROM b
    ), ch AS (
      SELECT bb.doc_id,
             md5(substr(d.text, CAST(bb.prev + 1 AS INTEGER),
                        CAST(bb.p - bb.prev AS INTEGER))) AS cmd5
      FROM bb JOIN documents d ON bb.doc_id = d.doc_id
    ), dfc AS (
      SELECT cmd5, count(DISTINCT doc_id) AS nd FROM ch GROUP BY cmd5
    )
    SELECT ch.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN dfc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared
    FROM ch JOIN dfc ON ch.cmd5 = dfc.cmd5
    GROUP BY ch.doc_id
    """,
)
def x95_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import numpy as np
    import pandas as pd

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    weights = np.array(_X95_W, dtype=np.int64)

    def chunker(batches):
        for pdf in batches:
            ids, md5s = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                if n < 1:
                    continue
                codes = np.frombuffer(
                    text.encode("ascii", "replace"), dtype=np.uint8
                ).astype(np.int64)
                if n >= 8:
                    # H at 1-based end position p = i + 8 for window
                    # codes[i:i+8]; boundary where H % 32 == 0.
                    h = np.convolve(codes, weights[::-1], "valid")
                    bpos = (np.nonzero(h % 32 == 0)[0] + 8).tolist()
                else:
                    bpos = []
                if not bpos or bpos[-1] != n:
                    bpos.append(n)
                prev = 0
                for p in bpos:
                    md5s.append(
                        hashlib.md5(
                            text[prev:p].encode("ascii", "replace")
                        ).hexdigest()
                    )
                    ids.append(doc_id)
                    prev = p
            yield pd.DataFrame({"doc_id": ids, "cmd5": md5s})

    ch = docs.mapInPandas(chunker, "doc_id long, cmd5 string")
    dfc = ch.groupBy("cmd5").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        ch.join(dfc, "cmd5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
    )


# ---------------------------------------------------------------------------
# X96 — feature hashing (the hashing trick): project token counts
# into a FIXED 64-bucket space via a portable multiplicative hash
# over the token's md5 prefix, with a +/- sign bit to unbias
# collisions — the dimensionality-fixing featurizer that needs no
# vocabulary table, no fit step, and no driver state, which is why
# it scales where x16's TF-IDF vocabulary join cannot. Emits per-doc
# sparse-vector summaries (nnz, L1, net sum) plus the first four
# bucket values as spot checks.
#
# Scale: tokenize-explode -> one groupBy(doc_id, bucket) with
# map-side combine -> one groupBy(doc_id). No vocabulary join, no
# broadcast, nothing grows with corpus size except the data itself.
# ---------------------------------------------------------------------------
@register(
    "x96_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        w -> w <> '')) AS w
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(w), 1, 7) AS BIGINT)
                  * 2654435761 % 4294967296 AS BIGINT) AS hv
      FROM tok
    ), b AS (
      SELECT doc_id, hv % 64 AS bucket,
             CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM h
    ), vec AS (
      SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val
      FROM b GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
           CAST(sum(abs(val)) AS BIGINT) AS l1,
           CAST(sum(val) AS BIGINT) AS net,
           CAST(coalesce(sum(CASE WHEN bucket = 0 THEN val END), 0)
                AS BIGINT) AS b0,
           CAST(coalesce(sum(CASE WHEN bucket = 1 THEN val END), 0)
                AS BIGINT) AS b1,
           CAST(coalesce(sum(CASE WHEN bucket = 2 THEN val END), 0)
                AS BIGINT) AS b2,
           CAST(coalesce(sum(CASE WHEN bucket = 3 THEN val END), 0)
                AS BIGINT) AS b3
    FROM vec GROUP BY doc_id
    """,
)
def x96_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("w"),
    )
    h = tok.select(
        "doc_id",
        F.expr(
            "cast(conv(substr(md5(cast(w as binary)), 1, 7), 16, 10)"
            " as bigint) * 2654435761 % 4294967296"
        ).alias("hv"),
    )
    b = h.select(
        "doc_id",
        F.expr("hv % 64").alias("bucket"),
        F.expr("case when (hv div 64) % 2 = 0 then 1 else -1 end").alias(
            "sgn"
        ),
    )
    vec = b.groupBy("doc_id", "bucket").agg(
        F.sum("sgn").cast("long").alias("val")
    )
    pick = lambda k: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("bucket") == k, F.col("val"))), F.lit(0)
    ).cast("long")
    return vec.groupBy("doc_id").agg(
        F.sum(F.when(F.col("val") != 0, 1).otherwise(0))
        .cast("long")
        .alias("nnz"),
        F.sum(F.abs("val")).cast("long").alias("l1"),
        F.sum("val").cast("long").alias("net"),
        pick(0).alias("b0"),
        pick(1).alias("b1"),
        pick(2).alias("b2"),
        pick(3).alias("b3"),
    )


# ---------------------------------------------------------------------------
# X98 — winnowing-fingerprint overlap (MOSS-style): sample each
# document's 16-char window hashes by the mod-p rule (md5 low nibble
# == 0, ~1/16 of windows, position-independent so insertions don't
# shift the sample), then count SHARED fingerprints per document
# pair — the plagiarism/provenance detector that catches copied
# passages x2's whole-doc MinHash dilutes away. Pairs come from an
# equi-join on the fingerprint; fingerprints shared by more than 10
# docs are dropped first (boilerplate — they would contribute
# O(df^2) pairs and no signal), which is what keeps the pair volume
# linear-ish at corpus scale. Top-20 pairs by shared count.
#
# Scale: fingerprint extraction is a bounded stride explode; the df
# cap bounds per-fingerprint fanout at 45 pairs; the top-20 is
# TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------
@register(
    "x98_winnow_overlap",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS norm
      FROM documents
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id,
               md5(substr(norm, CAST(i AS INTEGER), 16)) AS fp
        FROM n, unnest(generate_series(1, greatest(length(norm) - 15, 1), 4))
             AS g(i)
      ) WHERE substr(fp, 32, 1) = '0'
    ), capped AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING count(*) BETWEEN 2 AND 10
    ), pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(count(*) AS BIGINT) AS shared_fps
      FROM fps a
      JOIN capped c ON a.fp = c.fp
      JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), ranked AS (
      SELECT id1, id2, shared_fps,
             row_number() OVER (ORDER BY shared_fps DESC, id1, id2) AS r
      FROM pairs
    )
    SELECT id1, id2, shared_fps FROM ranked WHERE r <= 20
    """,
)
def x98_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")
        ).alias("norm"),
    )
    raw = n.select(
        "doc_id",
        F.explode(
            F.expr("sequence(1, greatest(length(norm) - 15, 1), 4)")
        ).alias("i"),
        "norm",
    ).select(
        "doc_id",
        F.md5(F.expr("cast(substring(norm, i, 16) as binary)")).alias("fp"),
    ).filter(F.expr("substring(fp, 32, 1) = '0'"))
    # ONE aggregate replaces distinct + df-cap agg + fp self-join
    # (guide §2.3/§2.4, the _copurchase_edges shape): collect_set
    # dedups (doc_id, fp) exactly as the old .distinct() did, the set
    # SIZE is the old df cap, and the C(df,2) doc pairs per kept
    # fingerprint are emitted map-side from the sorted set — same
    # bounded 45-pairs-per-fp volume the equi-join produced, minus
    # one full Exchange (the distinct) and the join's probe-side
    # shuffle. Pair array is built in a projection and the explode
    # consumes the attribute (functions/ngrams.py discipline).
    # Skew bound (ADVICE r13): the per-fp set is built BEFORE the
    # df<=10 cap, so its size is bounded by data content (docs
    # sharing one 16-char window), not by a key column — a
    # 10^6-doc boilerplate window costs one ~8 MB aggregation
    # buffer (the a22 class), which a task absorbs; if a corpus
    # ever carries >10^7-doc shared windows, the remedy is the
    # two-pass shape (dedup (fp, doc_id) -> count per fp -> semi-
    # join 2..10 survivors -> collect_set over the capped set),
    # which bounds the buffer at 10 at the price of two more
    # exchanges. Not paid speculatively (guide §1.3).
    grouped = (
        raw.groupBy("fp")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= 10))
    )
    pairs = (
        grouped.withColumn(
            "prs",
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds) - i - 1),"
                " y -> struct(x AS id1, y AS id2))))"
            ),
        )
        .select(F.explode("prs").alias("p"))
        .select("p.id1", "p.id2")
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    return (
        pairs.orderBy(F.desc("shared_fps"), "id1", "id2")
        .limit(20)
        .select("id1", "id2", "shared_fps")
    )
