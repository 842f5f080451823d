"""Inverted-index full-text search (S10) — the Spark-native replacement
for the reference's Elasticsearch sink + queries
(app/elastic_search_client.py:6-37: index document, match query, term
query, exclusion filter).

Instead of shipping crawled text to an external search cluster, the
posting-list table IS a DataFrame: ``build_inverted_index`` explodes
whitespace tokens into (term, doc_id, tf) rows — one shuffle keyed on
(term, doc_id) with map-side partial counts.  Query operators are then
plain semi-/anti-join + aggregate shapes over the index:

  term_query     — ES "term" query: postings of one term
  match_query    — ES "match" with AND/OR semantics over several terms,
                   optional exclusion list (the reference's
                   must_not/exclude clause), tf-sum scoring

Scale shape: the index build is a single hash aggregate (no joins);
query terms are literal IN-lists, so Catalyst pushes them into the
posting scan (partition/row-group pruning on a term-partitioned or
bucketed index table).  Multi-term conjunctions use count-distinct
over matched terms instead of an N-way self-join — one pass, one
aggregate, any number of terms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.functions.textstats import tokens


def build_inverted_index(
    df: DataFrame, id_col: str, text_col: str | Column
) -> DataFrame:
    """Posting-list table (term, doc_id, tf) over whitespace tokens of
    the lower-cased text.  tf = term frequency in the document."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(text))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def write_inverted_index(index: DataFrame, path: str) -> None:
    """Persist the posting table partitioned by the term's first
    character (`tp`): a term query then reads ONE partition directory
    (partition pruning — the at-scale substitute for ES's term
    routing).  At 10^10-document scale the same layout bucket-sorts
    within partitions by (term, doc_id) for row-group skipping."""
    index.withColumn("tp", F.substring("term", 1, 1)).write.mode(
        "overwrite"
    ).partitionBy("tp").parquet(path)


def read_inverted_index(spark, path: str) -> DataFrame:
    """Read back a partitioned posting table; adds the pruning
    predicate helper column transparently."""
    return spark.read.parquet(path)


def _prune(index: DataFrame, terms: list[str]) -> DataFrame:
    """When the index carries the partition column (`tp`), add the
    first-character predicate so Catalyst prunes partitions before the
    term filter (no-op on unpartitioned indexes)."""
    if "tp" in index.columns:
        return index.where(
            F.col("tp").isin(sorted({t[:1] for t in terms if t}))
        )
    return index


def term_query(index: DataFrame, term: str) -> DataFrame:
    """Documents containing `term`, scored by tf
    (elastic_search_client.py term-query analog)."""
    term = term.lower()
    return _prune(index, [term]).where(F.col("term") == term).select(
        "doc_id", F.col("tf").alias("score")
    )


def match_query(
    index: DataFrame,
    terms: list[str],
    mode: str = "all",
    exclude: list[str] | None = None,
) -> DataFrame:
    """Documents matching `terms` (mode="all": every term present;
    mode="any": at least one), minus any document containing a term of
    `exclude` (the ES must_not clause).  Score = total tf over matched
    query terms.  Returns (doc_id, n_matched, score).

    One posting scan + one aggregate for the match side (the IN-list is
    pushed into the scan), one anti-join for the exclusion."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    terms = [t.lower() for t in terms]
    hits = (
        _prune(index, terms)
        .where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_matched"),
            F.sum("tf").cast("long").alias("score"),
        )
    )
    if mode == "all":
        hits = hits.where(F.col("n_matched") == len(terms))
    if exclude:
        excl = [t.lower() for t in exclude]
        banned = (
            _prune(index, excl)
            .where(F.col("term").isin(excl))
            .select("doc_id")
        )
        hits = hits.join(banned, "doc_id", "left_anti")
    return hits


def tfidf_topk(index: DataFrame, n_docs: int, k: int = 3) -> DataFrame:
    """Per-document top-``k`` salient terms by tf-idf with LINEAR idf:
    score = tf * n_docs / df.  Linear rather than log idf keeps the
    score one exact int64 product plus one IEEE-754 division — both
    engines round-to-nearest identically, so a SQL oracle matches the
    doubles bit-for-bit (``ln()`` is not reproducible to the last ulp
    across engines); the ranking is what tf-idf is used for, and a
    monotone idf variant preserves the per-term ordering semantics.
    Ties break on term ASC.  Returns (doc_id, term, tf, df, score, rk).

    Scale shape: df is a second hash aggregate OF THE INDEX (no re-scan
    of the text); the tf⋈df join keys on term — vocabulary-sized and
    Zipf-skewed, so stopword keys are the hot partitions: left to AQE
    skew-join splitting, which handles it without a salting pass.  The
    per-doc top-k is one window over the doc_id shuffle (rank pushed by
    Spark's WindowGroupLimit, so only k rows per doc survive the
    sort)."""
    from pyspark.sql import Window

    dfreq = index.groupBy("term").agg(F.count("*").alias("df"))
    scored = index.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        ((F.col("tf") * F.lit(int(n_docs))).cast("double") / F.col("df")).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(k))
    )


def repetition_stats(
    index: DataFrame,
    max_top_frac: float = 0.10,
    max_dup_frac: float = 0.80,
    min_uniq_frac: float = 0.40,
) -> DataFrame:
    """Gopher-style word-level repetition filter (Rae et al. 2021,
    app. A1.1 repetition rules, reduced to word granularity): per
    document, from the posting table alone —

      top_frac  = tf of the most frequent word / total words
      dup_frac  = mass of words occurring >= 2 times / total words
      uniq_frac = distinct words / total words
      keep      = top_frac <= max_top_frac AND dup_frac <= max_dup_frac
                  AND uniq_frac >= min_uniq_frac

    One hash aggregate over the index (no joins, no text re-scan);
    every fraction is a single int->double cast + one IEEE division, so
    a SQL oracle reproduces keep decisions bit-for-bit.  Returns
    (doc_id, n_words, n_uniq, top_frac, dup_frac, uniq_frac, keep)."""
    per = index.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_words"),
        F.max("tf").cast("long").alias("top_tf"),
        F.count("*").alias("n_uniq"),
        F.sum(F.when(F.col("tf") >= 2, F.col("tf")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_mass"),
    )
    per = per.select(
        "doc_id",
        "n_words",
        "n_uniq",
        (F.col("top_tf").cast("double") / F.col("n_words")).alias("top_frac"),
        (F.col("dup_mass").cast("double") / F.col("n_words")).alias("dup_frac"),
        (F.col("n_uniq").cast("double") / F.col("n_words")).alias("uniq_frac"),
    )
    return per.select(
        "*",
        (
            (F.col("top_frac") <= F.lit(float(max_top_frac)))
            & (F.col("dup_frac") <= F.lit(float(max_dup_frac)))
            & (F.col("uniq_frac") >= F.lit(float(min_uniq_frac)))
        ).alias("keep"),
    )


def ngram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Corpus bigram language-model fluency score per document — the
    KenLM/CCNet perplexity-filter stage (Wenzek et al. 2020 score
    corpus text with an n-gram LM and keep by perplexity tercile)
    reduced to an engine-exact integer form.

    The score is the document's mean bigram MLE conditional
    probability, scaled e6: for each bigram occurrence (w1, w2),
    p_e6 = c(w1 w2) * 1e6 DIV c(w1) (corpus-wide counts — the bigram
    MLE P(w2|w1) without smoothing, floor-scaled), and
    lm_score_e6 = Σ p_e6 DIV n_bigrams.  Monotone in the true MLE
    average, int64 end-to-end: unlike a log-space perplexity (IEEE
    ln() sums are partition-order-dependent), this is hash-checkable
    across engines — the q68 oracle restates it and matches
    bit-for-bit.  High score = predictable, fluent word transitions;
    boilerplate/gibberish scores low.  A trained LM would swap the
    count-derived p for a broadcast-joined probability table without
    changing the plan shape.

    Plan: the q54 single-regex-pass ordered-bigram extract (doc id
    retained), occurrences pre-aggregated per (doc, pair) BEFORE the
    vocabulary joins — so the Zipf-skewed pair/unigram joins move one
    row per distinct pair per doc, not one per occurrence; marginals
    fetched by two vocabulary-keyed joins (AQE skew splitting, the
    q43/q54 analysis); final per-doc rollup is map-side combined.
    Docs with fewer than two tokens have no bigrams and are absent
    from the output (the oracle agrees).  Returns
    (id_col, n_bigrams, lm_score_e6).
    """
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    occ = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(norm, F.lit(r"(?:^| )(?=([^ ]+ [^ ]+))"), 1)
        ).alias("pair"),
    )
    per_doc = occ.groupBy(id_col, "pair").agg(F.count("*").cast("long").alias("m"))
    cp = occ.groupBy("pair").agg(F.count("*").cast("long").alias("c_pair"))
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term")
    ).where(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    cu = toks.groupBy("term").agg(F.count("*").cast("long").alias("c_left"))
    scored = (
        per_doc.join(cp, "pair")
        .withColumn("lt", F.split("pair", " ").getItem(0))
        .join(cu.withColumnRenamed("term", "lt"), "lt")
        .select(
            id_col,
            "m",
            F.expr("c_pair * 1000000 DIV c_left").alias("p_e6"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.expr("sum(m * p_e6) DIV sum(m)").alias("lm_score_e6"),
    )


def collocations_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_pair: int = 2,
) -> DataFrame:
    """Corpus-level collocation (phrase) mining: adjacent word pairs
    ranked by the cosine association score cxy^2 / (cx * cy) — the
    integer-exact member of the PMI family (PMI itself needs ln();
    cosine association ranks identically for fixed corpus size and
    stays in int64: score_e6 = cxy*cxy*1e6 DIV (cx*cy), headroom to
    ~3e5 pair occurrences).  The phrase-mining pass a training corpus
    runs before tokenizer training (wordpiece/unigram-LM seeding).

    Plan: one ordered bigram extract (the same single-regex-pass idiom
    as textstats.shingles, non-distinct), two map-side-combined counts
    (pairs; unigrams), then TWO vocabulary-keyed joins to fetch the
    marginals — Zipf-skewed like every term join, left to AQE skew
    splitting.  Final global top-k is a TakeOrderedAndProject (no full
    sort).  Ties: score desc, pair asc.  Returns
    (pair, c_pair, c_left, c_right, score_e6).
    """
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    pairs = df.select(
        F.explode(
            F.regexp_extract_all(norm, F.lit(r"(?:^| )(?=([^ ]+ [^ ]+))"), 1)
        ).alias("pair")
    )
    cp = pairs.groupBy("pair").agg(F.count("*").alias("c_pair"))
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term")
    ).where(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    cu = toks.groupBy("term").agg(F.count("*").alias("c"))
    scored = (
        cp.where(F.col("c_pair") >= min_pair)
        .withColumn("lt", F.split("pair", " ").getItem(0))
        .withColumn("rt", F.split("pair", " ").getItem(1))
        .join(cu.select(F.col("term").alias("lt"), F.col("c").alias("c_left")), "lt")
        .join(cu.select(F.col("term").alias("rt"), F.col("c").alias("c_right")), "rt")
        .select(
            "pair",
            F.col("c_pair").cast("long").alias("c_pair"),
            F.col("c_left").cast("long").alias("c_left"),
            F.col("c_right").cast("long").alias("c_right"),
            F.expr(
                "CAST(c_pair AS BIGINT) * c_pair * 1000000"
                " DIV (CAST(c_left AS BIGINT) * c_right)"
            ).alias("score_e6"),
        )
    )
    return scored.orderBy(F.col("score_e6").desc(), F.col("pair").asc()).limit(k)
