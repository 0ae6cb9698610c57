"""§2.B.9 — text analysis for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting over ``documents``. Everything is built-in
string/array expressions — per-row, embarrassingly parallel, scan-speed
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import global_rank, trunc_digits, spread_input
from tpctools_spark.registry import query


@query(
    "text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST(floor(CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 100) AS DOUBLE) / 100
             AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: docs, chars, tokens."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "n_chars",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            trunc_digits(
                F.sum(F.col("n_chars").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_chars"),
        )
    )


@query(
    "text_langid",
    oracle="""
    SELECT lang AS labeled_lang,
           CASE WHEN len(list_filter(string_split(lower(trim(text)), ' '),
                                     w -> w IN ('the', 'a', 'of'))) > 0
                THEN 'en' ELSE 'unknown' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-presence language-ID heuristic vs the labeled lang.

    A deliberately simple deterministic n-gram/stopword detector (the
    fixtures' text is synthetic English-like words, so the interesting
    output is the confusion table against the `lang` label). A real
    pipeline swaps the rule for a per-language stopword score — the
    Spark shape (per-row HOF + groupBy) is identical.
    """
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), " ")
    predicted = F.when(
        F.size(F.filter(words, lambda w: w.isin("the", "a", "of"))) > 0, "en"
    ).otherwise("unknown")
    return (
        docs.select(F.col("lang").alias("labeled_lang"), predicted.alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(floor(CAST(length(text) AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1) * 10000) AS DOUBLE) / 10000 AS avg_token_len,
           CAST(floor(CAST(len(list_filter(string_split(lower(text), ' '),
                          w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1) * 10000) AS DOUBLE) / 10000 AS stopword_ratio,
           CASE WHEN length(text) BETWEEN 100 AND 400
                 AND len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END AS quality_pass
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: length, token stats, stopword ratio,
    and a pass/fail gate — the standard pre-training filter shape."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    lower_words = F.split(F.lower(F.col("text")), " ")
    n_tokens = F.size(words)
    stop = F.size(
        F.filter(lower_words, lambda w: w.isin("the", "a", "of", "and", "to"))
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        n_tokens.cast("bigint").alias("n_tokens"),
        trunc_digits(
            F.length("text").cast("double") / F.greatest(n_tokens, F.lit(1)), 4
        ).alias("avg_token_len"),
        trunc_digits(stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 4).alias(
            "stopword_ratio"
        ),
        F.when(
            F.length("text").between(100, 400) & (n_tokens >= 20), 1
        )
        .otherwise(0)
        .alias("quality_pass"),
    )


@query(
    "text_tokens",
    oracle="""
    SELECT word, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM (
      SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents
    )
    GROUP BY word
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex tokenizer: term and document
    frequency over the whole corpus (the wordcount of LLM pipelines)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z0-9]+)"), 1)
            ).alias("word"),
        )
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH prep AS (
      SELECT doc_id, lower(trim(text)) AS t,
             string_split(lower(trim(text)), ' ') AS words
      FROM documents
    ), g AS (
      SELECT doc_id, md5(t) AS content_fp,
             CASE WHEN len(words) >= 4 THEN
               [md5(concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3]))
                for i in range(1, len(words) - 2)]
             ELSE CAST([] AS VARCHAR[]) END AS gh
      FROM prep
    )
    SELECT doc_id, content_fp,
           list_aggregate(gh, 'min') AS min_shingle_fp,
           list_aggregate(gh, 'max') AS max_shingle_fp,
           CAST(len(gh) AS BIGINT) AS n_shingles
    FROM g
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content digest + winnowed shingle
    fingerprint (min/max of rolling 4-gram digests) for copy detection.

    Uses md5 (hex strings) so both engines produce identical digests;
    at 100 TB swap ``F.md5`` for ``F.xxhash64`` — 8-byte ints instead
    of 32-char strings, same plan shape, engine-specific values.
    """
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), " ")
    # Lambda-free 4-gram digests (r12): the old shape ran md5 INSIDE a
    # transform() lambda — HOF lambdas evaluate interpreted per
    # element, the exact pattern the DSIR profile measured 8-10× worse
    # than codegen. arrays_zip pairs each word with its next three
    # natively, the struct array explodes in codegen, and md5 runs
    # post-explode inside WSCG; min/max/count regroup per doc (gram
    # rows for one doc are partition-contiguous, so the partial
    # aggregate collapses to one row per doc before the exchange) and
    # a left join re-attaches the <4-word docs with NULL fingerprints
    # and n_shingles 0 — byte-identical output to the row-local form
    # (and the oracle). The trade is two doc-keyed exchanges of tiny
    # (doc_id, 2×32-char, count) rows for the removal of every
    # interpreted md5 call — the right side of the CPU/shuffle ledger
    # at any scale.
    def _tail(k: int) -> F.Column:
        return F.slice(
            words, k, F.greatest(F.size(words) - (k - 1), F.lit(0))
        ).alias(f"w{k}")

    quads = F.arrays_zip(words.alias("w1"), _tail(2), _tail(3), _tail(4))
    gram_rows = (
        docs.select("doc_id", F.explode(quads).alias("p"))
        .filter(F.col("p.w4").isNotNull())
        .select(
            "doc_id",
            F.md5(
                F.encode(
                    F.concat_ws(
                        " ",
                        F.col("p.w1"),
                        F.col("p.w2"),
                        F.col("p.w3"),
                        F.col("p.w4"),
                    ),
                    "utf-8",
                )
            ).alias("gh"),
        )
    )
    per_doc = gram_rows.groupBy("doc_id").agg(
        F.min("gh").alias("min_shingle_fp"),
        F.max("gh").alias("max_shingle_fp"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    return (
        docs.select(
            "doc_id",
            F.md5(F.encode(F.lower(F.trim(F.col("text"))), "utf-8")).alias(
                "content_fp"
            ),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "content_fp",
            "min_shingle_fp",
            "max_shingle_fp",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias(
                "n_shingles"
            ),
        )
    )


@query(
    "text_fuzzy_match",
    oracle="""
    WITH prep AS (
      SELECT doc_id, lang, CAST(n_chars // 100 AS BIGINT) AS band,
             substring(lower(trim(text)), 1, 40) AS head
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head) AS edit_dist
    FROM prep a JOIN prep b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 12
    """,
)
def text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy document pairing by edit distance on normalized prefixes.

    Blocking keys (language × length band) bound the candidate space —
    the quadratic levenshtein only runs inside blocks, never across the
    corpus; at 100 TB the band width is the knob that trades recall for
    join fan-out. Both engines implement plain Levenshtein (unit costs),
    so the integer distances agree exactly.
    """
    prep = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("band"),
        F.substring(F.lower(F.trim(F.col("text"))), 1, 40).alias("head"),
    )
    a = prep.select(
        F.col("doc_id").alias("doc_a"), "lang", "band", F.col("head").alias("head_a")
    )
    b = prep.select(
        F.col("doc_id").alias("doc_b"), "lang", "band", F.col("head").alias("head_b")
    )
    dist = F.levenshtein("head_a", "head_b")
    return (
        a.join(b, ["lang", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(dist <= 12)
        .select("doc_a", "doc_b", dist.alias("edit_dist"))
    )


@query(
    "text_sentences_udtf",
    oracle="""
    WITH sents AS (
      SELECT doc_id, UNNEST(string_split(text, '. ')) AS sent
      FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_sentences,
           MAX(length(sent)) AS max_sent_chars
    FROM sents
    GROUP BY doc_id
    """,
)
def text_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation through a Python UDTF (table function).

    Demonstrates the UDTF surface: a class-based table function applied
    per input row via LATERAL join, fanning each document out to its
    sentences, then re-aggregated. The literal '. ' split matches
    DuckDB's string_split exactly (Python str.split, not regex), so the
    per-doc counts oracle-check. For hot paths prefer the codegen'd
    explode(split(...)) — a UDTF is row-at-a-time Python and earns its
    keep only when the expansion logic outgrows SQL expressions.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_chars: int")
    class SplitSentences:
        def eval(self, text: str):
            for s in (text or "").split(". "):
                yield (len(s),)

    name = "split_sentences_tpctools"
    spark.udtf.register(name, SplitSentences)
    table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id,
               COUNT(*) AS n_sentences,
               MAX(s.sent_chars) AS max_sent_chars
        FROM udtf_docs d, LATERAL {name}(d.text) s
        GROUP BY d.doc_id
        """
    )


@query(
    "text_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, lang, UNNEST(string_split(lower(trim(text)), ' ')) AS tok
      FROM documents
    ), stats AS (
      SELECT lang, tok,
             COUNT(*) AS tf,
             COUNT(DISTINCT doc_id) AS df
      FROM tokens WHERE tok <> '' GROUP BY lang, tok
    ), ranked AS (
      SELECT lang, tok, tf, df,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY tf DESC, df ASC, tok) AS rk
      FROM stats
    )
    SELECT lang, tok, tf, df, rk FROM ranked WHERE rk <= 5
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top terms by frequency with rarity tiebreak.

    The TF-IDF shape kept in exact integer arithmetic: rank by raw term
    frequency, break ties by ascending document frequency (rarer wins,
    the IDF direction) then by token — no logarithms, so the ordering is
    engine-exact and the top-5 cannot flip on FP. One explode feeds one
    (lang, tok) aggregation computing tf and df together; the window
    ranks within each language's (small) vocabulary slice.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    stats = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok")
    )
    return (
        stats.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "tok", "tf", "df", "rk")
    )


@query(
    "text_tfidf_keywords",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, UNNEST(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tokens WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE) / df AS score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS rk
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, score, rk FROM scored WHERE rk <= 3
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf-idf.

    Uses the raw-idf variant (idf = N/df, no logarithm): with the
    constant N dropped, the ranking score is tf/df — ONE IEEE division
    of two exact integers, so the score doubles are bit-identical
    across engines and the ranking can never flip on FP rounding (the
    log-idf variant would hinge on last-ulp ln() agreement). Shape:
    tf aggregate on (doc, term) → df aggregate on term (vocabulary-
    sized, broadcast back) → per-doc ROW_NUMBER with a term tiebreak,
    where the rank-≤-3 filter pushes into the window sort
    (WindowGroupLimit): each task keeps 3 rows per doc, never the full
    posting list.
    """
    from pyspark.sql import Window

    tf = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id", "term", "tf", "df",
            score.alias("score"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    freqs AS (
      SELECT word, COUNT(*) AS freq FROM words
      WHERE word <> '' GROUP BY word
    ),
    ranked AS (
      SELECT word, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS rank
      FROM freqs
    )
    SELECT COUNT(*) AS n_terms,
           (CAST(floor(regr_slope(ln(freq), ln(rank)) * 10000) AS DOUBLE) / 10000)
             AS zipf_slope,
           (CAST(floor(regr_r2(ln(freq), ln(rank)) * 10000) AS DOUBLE) / 10000)
             AS fit_r2
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level Zipf fit: regress log-frequency on log-rank over the
    vocabulary — natural text follows slope ≈ −1, so a corpus whose
    slope drifts far from it (template spam: too flat; boilerplate
    dups: too steep) fails the health check. A standard one-number
    screen on web-scale training corpora.

    Term counting map-side combines; vocabulary grows with the corpus,
    so the global frequency rank uses the two-pass distributed form
    (``global_rank``: range-partitioned local windows + broadcast
    per-partition offsets) rather than a single-partition window; the
    regression is a single ``regr_slope``/``regr_r2`` aggregate — no
    driver-side math. Output truncated to 4 decimals (cross-engine
    float contract).
    """
    d = table(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_rank(
        freqs, [F.desc("freq"), F.asc("word")], rn="rank"
    )
    lf, lr = F.log("freq"), F.log("rank")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        trunc_digits(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        trunc_digits(F.regr_r2(lf, lr), 4).alias("fit_r2"),
    )


@query(
    "text_rake_keyphrases",
    oracle="""
    WITH phrases AS (
      SELECT DISTINCT trim(p) AS phrase
      FROM (
        SELECT unnest(string_split(
                 regexp_replace(lower(trim(text)), '\\b(a|the)\\b', '|', 'g'),
                 '|')) AS p
        FROM documents
      ) WHERE trim(p) <> ''
    ),
    occurrences AS (
      SELECT trim(p) AS phrase
      FROM (
        SELECT unnest(string_split(
                 regexp_replace(lower(trim(text)), '\\b(a|the)\\b', '|', 'g'),
                 '|')) AS p
        FROM documents
      ) WHERE trim(p) <> ''
    ),
    words AS (
      SELECT phrase, unnest(string_split(phrase, ' ')) AS word,
             len(string_split(phrase, ' ')) AS plen
      FROM occurrences
    ),
    stats AS (
      SELECT word, COUNT(*) AS freq, SUM(plen) AS deg
      FROM words WHERE word <> '' GROUP BY word
    ),
    scored AS (
      SELECT p.phrase,
             SUM((1000000 * s.deg) // s.freq) AS score_ppm
      FROM phrases p,
           unnest(string_split(p.phrase, ' ')) AS u(word)
      JOIN stats s ON s.word = u.word
      WHERE u.word <> ''
      GROUP BY p.phrase
    )
    SELECT phrase, CAST(score_ppm AS BIGINT) AS score_ppm
    FROM scored
    ORDER BY score_ppm DESC, phrase ASC
    LIMIT 15
    """,
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction: split documents into candidate
    phrases at stopword boundaries, score each word by
    degree/frequency over the whole corpus, rank phrases by the sum of
    their word scores — the classic unsupervised keyphrase extractor.

    All set-level aggregations: phrase splitting is one codegen'd
    regexp projection; word stats (freq, degree = Σ phrase length over
    occurrences) map-side combine; phrase scores join the corpus-wide
    word-stat table (vocabulary-sized — broadcast) back to the distinct
    phrase list. Scores are integers (ppm units, floor division) so the
    ranking is bit-identical in both engines — no float accumulation
    across the word sum.
    """
    d = table(spark, sf_dir, "documents")
    split_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\b(a|the)\b", "|"),
        r"\|",
    )
    occ = (
        d.select(F.explode(split_expr).alias("p"))
        .select(F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    words = occ.select(
        "phrase",
        F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split("phrase", " ")).alias("plen"),
    ).filter(F.col("word") != "")
    stats = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    phrase_words = (
        occ.distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    scored = (
        phrase_words.join(F.broadcast(stats), "word")
        .groupBy("phrase")
        .agg(F.sum(F.expr("(1000000 * deg) div freq")).alias("score_ppm"))
    )
    return (
        scored.orderBy(F.desc("score_ppm"), F.asc("phrase"))
        .limit(15)
        .select("phrase", "score_ppm")
    )


@query(
    "text_novelty_ratio",
    oracle="""
    WITH grams AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
              FROM documents)
      ) WHERE gram IS NOT NULL
    ),
    first_seen AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           COUNT(*) FILTER (f.first_doc = g.doc_id) AS n_novel,
           (CAST(floor(CAST(COUNT(*) FILTER (f.first_doc = g.doc_id) AS DOUBLE)
                 / COUNT(*) * 10000) AS DOUBLE) / 10000) AS novelty
    FROM grams g JOIN first_seen f USING (gram)
    GROUP BY g.doc_id
    """,
)
def text_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's word-3-grams that
    no earlier document (lower doc_id = earlier ingest) contains — the
    marginal-contribution score used to prioritize which documents add
    information to a training corpus vs merely repeating it.

    Gram → first-seen-doc is one map-side-combinable MIN aggregation
    over the (doc, gram) postings; the novelty fraction is the postings
    re-joined to that table (vocabulary-keyed shuffle, AQE-splittable
    on hot grams) and counted per doc. Reuses the same distinct-gram
    shingling as the Jaccard family; no pairwise comparisons anywhere —
    novelty is corpus-global but computed in two aggregate passes.
    """
    docs = spread_input(table(spark, sf_dir, "documents"))
    from tpctools_spark.queries.dedup import _shingles_rx

    grams = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(_shingles_rx())).alias("gram")
        )
    )
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    joined = grams.join(first_seen, "gram")
    novel = F.count_if(F.col("first_doc") == F.col("doc_id"))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        novel.alias("n_novel"),
        trunc_digits(novel.cast("double") / F.count(F.lit(1)), 4).alias("novelty"),
    )


@query(
    "text_repetition_ratio",
    oracle="""
    WITH grams AS (
      SELECT doc_id, gram FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
              FROM documents)
      ) WHERE gram IS NOT NULL
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_grams,
             COUNT(DISTINCT gram) AS n_distinct
      FROM grams GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_distinct,
           (CAST(floor(CAST(n_grams - n_distinct AS DOUBLE) / n_grams * 10000)
                 AS DOUBLE) / 10000) AS rep_ratio,
           (CAST(n_grams - n_distinct AS DOUBLE) / n_grams > 0.30) AS flag_repetitive
    FROM per_doc
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: the fraction of a doc's word-3-grams
    that are repeats of an earlier gram IN THE SAME DOC — the Gopher
    repetition signal that catches keyword-stuffed spam and
    generation-loop text, which length/stopword quality gates miss.

    Unlike the corpus-level novelty/dedup family this needs no join at
    all: occurrences and distinct counts aggregate per doc in one
    exploded pass (count distinct is doc-local, so the expand stays
    inside each doc's rows). Flag threshold 30% duplicated grams.
    """
    from tpctools_spark.queries.dedup import _shingles_rx

    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(_shingles_rx()).alias("gram")
    )
    per_doc = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("gram").alias("n_distinct"),
    )
    dup_frac = (F.col("n_grams") - F.col("n_distinct")).cast("double") / F.col(
        "n_grams"
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        trunc_digits(dup_frac, 4).alias("rep_ratio"),
        (dup_frac > 0.30).alias("flag_repetitive"),
    )


@query(
    "text_collocations_pmi",
    oracle="""
    WITH words AS (
      SELECT doc_id, w, idx FROM (
        SELECT doc_id, unnest(a) AS w, unnest(range(1, len(a) + 1)) AS idx
        FROM (
          SELECT doc_id, string_split(lower(trim(text)), ' ') AS a
          FROM documents
        )
      ) WHERE w <> ''
    ),
    bigrams AS (
      SELECT l.w AS w1, r.w AS w2
      FROM words l JOIN words r
        ON l.doc_id = r.doc_id AND r.idx = l.idx + 1
    ),
    uni AS (
      SELECT w, COUNT(*) AS c FROM words GROUP BY w
    ),
    bi AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    ),
    tot AS (
      SELECT (SELECT SUM(c) FROM uni) AS n_uni,
             (SELECT SUM(c12) FROM bi) AS n_bi
    )
    SELECT b.w1, b.w2, CAST(b.c12 AS BIGINT) AS n_pair,
           (CAST(floor(
              ln((CAST(b.c12 AS DOUBLE) / t.n_bi)
                 / ((CAST(u1.c AS DOUBLE) / t.n_uni)
                    * (CAST(u2.c AS DOUBLE) / t.n_uni))) * 10000
            ) AS DOUBLE) / 10000) AS pmi
    FROM bi b
    JOIN uni u1 ON b.w1 = u1.w
    JOIN uni u2 ON b.w2 = u2.w
    CROSS JOIN tot t
    WHERE b.c12 >= 5
    ORDER BY pmi DESC, b.w1, b.w2
    LIMIT 25
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: word pairs
    that co-occur far above chance (PMI = log P(w1,w2)/(P(w1)P(w2)),
    min support 5) — the corpus-linguistics primitive behind phrase
    detection and multi-word tokenizer entries.

    Bigrams come from position-adjacent explode (posexplode + self
    shift, doc-local); unigram and bigram counts map-side combine; the
    PMI projection joins two vocabulary-sized count tables (broadcast)
    plus a one-row total. Top-25 by truncated PMI with full lexical
    tie-break — deterministic in both engines.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), " ")).alias("idx", "w"),
    ).filter(F.col("w") != "")
    nxt = words.select(
        F.col("doc_id").alias("r_doc"),
        (F.col("idx") - 1).alias("r_idx"),
        F.col("w").alias("w2"),
    )
    bigrams = words.join(
        nxt,
        (words.doc_id == nxt.r_doc) & (words.idx == nxt.r_idx),
    ).select(F.col("w").alias("w1"), "w2")
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    tot = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bi.agg(F.sum("c12").alias("n_bi"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c12").cast("double") / F.col("n_bi"))
        / (
            (F.col("c1").cast("double") / F.col("n_uni"))
            * (F.col("c2").cast("double") / F.col("n_uni"))
        )
    )
    return (
        bi.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("n_pair"),
            trunc_digits(pmi, 4).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# text_source_divergence

_JS_SRC_A = "src0"
_JS_SRC_B = "src1"


@query(
    "text_source_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, UNNEST(string_split(lower(trim(text)), ' ')) AS w
      FROM documents WHERE source IN ('{_JS_SRC_A}', '{_JS_SRC_B}')
    ), counts AS (
      SELECT w,
             CAST(SUM(CASE WHEN source = '{_JS_SRC_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN source = '{_JS_SRC_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM counts
    ), probs AS (
      SELECT (CAST(c1 + 1 AS DOUBLE) / (n1 + v)) AS p,
             (CAST(c2 + 1 AS DOUBLE) / (n2 + v)) AS q,
             tot.v AS v
      FROM counts, tot
    ), terms AS (
      SELECT v,
             CAST((CAST(floor((0.5 * p * ln(p / ((p + q) * 0.5))
                    + 0.5 * q * ln(q / ((p + q) * 0.5))) * 1000000)
                    AS DOUBLE) / 1000000) AS DECIMAL(18,6)) AS term
      FROM probs
    )
    SELECT '{_JS_SRC_A}' AS source_a, '{_JS_SRC_B}' AS source_b,
           v AS vocab_size, CAST(SUM(term) AS DOUBLE) AS js_nats
    FROM terms GROUP BY v
    """,
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between two sources' unigram
    distributions — the symmetric, bounded corpus-comparison metric
    (0 = identical mixes, ln 2 = disjoint) used to decide whether a
    new crawl slice actually adds distributional novelty. Complements
    the PSI screens, which bin NUMERIC columns; this compares the
    text itself.

    Laplace-smoothed over the union vocabulary so neither side's
    missing terms blow up the logs; each JS term is truncated to 6
    digits and decimal-summed (the addition-order-proof pattern), so
    both engines hash identically. Dataflow: one token count per
    (term, side) — map-side combinable — a one-row totals broadcast,
    and a vocabulary-sized term table; nothing scales with document
    count beyond the first aggregation.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(_JS_SRC_A, _JS_SRC_B))
        .select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"),
        )
    )
    counts = toks.groupBy("w").agg(
        F.sum(F.when(F.col("source") == _JS_SRC_A, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("source") == _JS_SRC_B, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    p = (F.col("c1") + 1).cast("double") / (F.col("n1") + F.col("v"))
    q = (F.col("c2") + 1).cast("double") / (F.col("n2") + F.col("v"))
    m = (p + q) * 0.5
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "v", trunc_digits(term, 6).cast("decimal(18,6)").alias("term")
    )
    return terms.groupBy("v").agg(
        F.sum("term").cast("double").alias("js_nats")
    ).select(
        F.lit(_JS_SRC_A).alias("source_a"),
        F.lit(_JS_SRC_B).alias("source_b"),
        F.col("v").alias("vocab_size"),
        "js_nats",
    )


@query(
    "text_ngram_coverage",
    oracle="""
    WITH grams AS (
      SELECT DISTINCT doc_id, source, gram FROM (
        SELECT doc_id, source,
               UNNEST(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM (SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS w
              FROM documents)
      ) WHERE gram IS NOT NULL
    ), eval_grams AS (
      SELECT DISTINCT source, gram FROM grams WHERE doc_id % 7 = 0
    ), train_grams AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 7 <> 0
    )
    SELECT e.source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (t.gram IS NOT NULL) AS BIGINT) AS n_covered,
           CAST(floor(CAST(COUNT(*) FILTER (t.gram IS NOT NULL) AS DOUBLE)
                 / COUNT(*) * 1000000) AS DOUBLE) / 1000000 AS coverage
    FROM eval_grams e LEFT JOIN train_grams t ON e.gram = t.gram
    GROUP BY e.source
    """,
)
def text_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-coverage diagnostic: per source, the fraction of the eval
    split's distinct word-3-grams that also occur in the train split
    (eval split = ``doc_id % 7 == 0`` — 7 is coprime with the
    fixture's source cycle, so every source contributes eval docs). High coverage means the eval
    slice is redundant with training data (a leakage/contamination
    smell at the SPLIT level — the aggregate complement of
    ``pipeline_contamination``'s per-document pair report); low
    coverage means the split actually holds out novel text.

    Scale: both sides reduce to DISTINCT gram sets before the join —
    the train side is gram-keyed (vocabulary-sized, Zipf-bounded, far
    smaller than postings) and the eval side is the small split by
    construction, so the join input is bounded by vocabulary, not
    corpus. One gram-keyed shuffle each side + one |sources|-group
    aggregate; text is read once, projection-pruned.
    """
    from tpctools_spark.queries.dedup import _shingles_rx

    docs = spread_input(table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_shingles_rx())).alias("gram"),
    )
    eval_g = (
        grams.filter(F.col("doc_id") % 7 == 0).select("source", "gram").distinct()
    )
    train_g = (
        grams.filter(F.col("doc_id") % 7 != 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    covered = F.count("hit")
    return (
        eval_g.join(train_g, "gram", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            covered.alias("n_covered"),
            trunc_digits(
                covered.cast("double") / F.count(F.lit(1)), 6
            ).alias("coverage"),
        )
    )
