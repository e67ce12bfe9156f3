"""Corpus relevance / fluency scoring for LLM-data pipelines
(BASELINE.json north-star extension; the reference is pure energy
telemetry and has no text tier — see SURVEY.md §2 extensions).

Two corpus-statistics operators that sit beside ``text/stats.py``'s
per-row signals:

* :func:`tfidf_topk` — per-document top-k salient terms by tf-idf,
  the classic keyword-extraction / relevance primitive (and the
  feature front-end of linear quality classifiers).
* :func:`bigram_lm_scores` — an add-one-smoothed corpus bigram
  language model scoring every document by average token log-prob;
  the deterministic stand-in for the KenLM-style perplexity filters
  used by CCNet/Gopher-class cleaning pipelines.

Scale shape (both): token/bigram explode → map-side-combined counts
(vocab-sized aggregates, never corpus-sized state), count-table joins
back onto the exploded stream on term keys (AQE broadcasts them while
they fit, sort-merge beyond), one per-doc aggregate. No Python in the
path; everything whole-stage-codegens.

Cross-engine determinism: counts are integers; the single
non-portable scalar op is ``ln`` — its result feeds a fixed-point
``floor(x*1e6+0.5)`` quantization, so a last-ulp ``ln`` difference
between engines only matters on an exact rounding boundary. Per-doc
log-prob SUMS are taken over the *quantized* bigint micro-units, so
they are addition-order-independent (double-sum order drift, the
classic distributed-float trap, cannot occur). Rankings order by the
quantized score with integer/lexicographic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from energydatalake_spark.portable import portable_round as _r
from energydatalake_spark.text.stats import tokens


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf (idf = ln(N/df); ties
    break on the rounded score then lexicographic term).

    Plan: ONE token explode feeds the (doc, term) tf aggregate; the
    vocab-sized df aggregate and the scoring join each re-derive that
    subtree (column pruning gives them different canonical subplans,
    so exchange reuse does not fire — r20 verified). An r20 A/B of
    persisting tf measured the cache barrier COSTLIER than the second
    cheap token explode at sf0.1 (0.86 -> 1.01 s), so the recompute
    stays — unlike the md5-heavy shingle/line explodes, which persist.
    N rides in as a broadcast one-row aggregate, never a driver
    round-trip. The final top-k is a per-doc window over the (already
    doc-partitioned) tf frame.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # One row per (doc, term) ⇒ count(*) per term IS the doc frequency.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            _r(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode each document into its (w1, w2) adjacent-token bigrams
    (docs with <2 tokens contribute nothing). Pure codegen: a
    slice/transform struct zip, no Python."""
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("t")
    ).filter(F.size("t") >= 2)
    pair = F.explode(
        F.expr(
            "transform(slice(t, 1, size(t) - 1), (w, i) -> "
            "struct(w as w1, t[i + 1] as w2))"
        )
    ).alias("b")
    return toks.select(F.col(id_col), pair).select(
        id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document by its average bigram log-probability under
    an add-one-smoothed corpus bigram model:

        P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)

    with V = |distinct continuation vocabulary|. Low scores flag
    disfluent / out-of-distribution text — the perplexity-filter
    primitive of CCNet-style cleaning, built from two count tables
    instead of an external LM binary.

    Docs with <2 tokens have no bigrams and are absent from the
    output (a perplexity over zero events is undefined — callers
    treat absence as "no signal", not "bad").

    Determinism: per-bigram log-probs are quantized to bigint
    micro-nats BEFORE the per-doc sum, so the reduction is
    order-independent; c(w1) rides the c2 count table as a window sum
    (one vocab-sized pass, no second corpus aggregation or join).
    """
    bg = bigrams(docs, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # c(w1) as a WINDOW over the c2 count table, not a groupBy+join
    # branch (r20; the hashed_tfidf norm idiom): a separate c1 frame
    # re-derives the whole corpus explode for its consumer — column
    # pruning gives each branch a different canonical subplan, so
    # exchange reuse never fires (verified in the executed plan: four
    # independent Generate stages before this change). The window runs
    # on the vocab-sized c2 rows; a w1 partition is bounded by that
    # word's distinct continuations (vocab-, not corpus-sized).
    c2w = c2.withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
    # V from the c2 count table, NOT from bg: the distinct continuation
    # words in c2's keys ARE the distinct w2 of the raw bigram stream,
    # and re-deriving from c2 prunes the scan branch to vocab shape —
    # still one extra explode locally (no exchange reuse), but the
    # aggregate above it is vocab-sized.
    vsz = c2.agg(F.countDistinct("w2").alias("vsz"))
    lp_micro = F.floor(
        F.log(
            (F.col("c2") + F.lit(1)).cast("double")
            / (F.col("c1") + F.col("vsz")).cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    term = (
        bg.join(c2w, ["w1", "w2"])
        .join(F.broadcast(vsz))
        .select(F.col(id_col), lp_micro.alias("lp"))
    )
    per_doc = term.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("lp_sum")
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        _r(
            F.col("lp_sum") / F.lit(1e6) / F.col("n_bigrams").cast("double"),
            6,
        ).alias("avg_logp"),
    )


def hashed_tfidf(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing (hashing-trick) tf-idf vectorizer — the
    text→vector bridge of a training pipeline (fastText/Vowpal-style):
    every term hashes to one of ``dim`` buckets with a ±1 sign, its
    tf·idf adds into the bucket, and the resulting per-document vector
    is L2-normalized. Emitted SPARSE, one row per non-zero bucket:
    ``(id_col, dim_idx, weight)`` — the natural shuffle-friendly shape
    at corpus scale, and directly consumable by the ANN/similarity
    tier (which accepts dense arrays via a one-line pivot).

    Bucket and sign both derive from ONE 60-bit md5 of the term
    (sign = parity, bucket = h/2 mod dim) so the mapping is
    engine-portable and collision behavior is explicit.

    Cross-engine determinism (the lm_score idiom): each term's
    non-negative tf·idf is quantized to bigint micro-units BEFORE the
    signed bucket sum, making the reduction addition-order-independent;
    the norm is likewise a bigint sum of per-bucket quantized squares.

    Scale shape: one token explode feeds the (doc, term) tf aggregate;
    the vocab-sized df table joins back (AQE broadcasts while it
    fits); the bucket reduction is a map-side-combined (doc, bucket)
    aggregate — never wider than dim rows per doc; the norm rides a
    per-doc aggregate over ≤dim rows and rejoins batch-sized.
    """
    from energydatalake_spark.text.stats import _hex15_to_long

    # tf re-derives for the df branch and the scoring join (no
    # exchange reuse across pruned branches); an r20 persist A/B
    # regressed (1.33 -> 1.48 s at sf0.1) — see tfidf_topk.
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
    h = _hex15_to_long(F.md5(F.col("term")))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            # shiftright, NOT h/2: true division would round the
            # 60-bit hash through a 53-bit double mantissa.
            (F.shiftright(h, 1) % F.lit(dim)).cast("int").alias("dim_idx"),
            (
                (F.lit(1) - (h % F.lit(2)) * F.lit(2))
                * F.floor(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("wq"),
        )
    )
    bucket = (
        scored.groupBy(id_col, "dim_idx")
        .agg(F.sum("wq").alias("wq"))
        .filter(F.col("wq") != 0)
    )
    # Quantized square per bucket → exact bigint norm² sum per doc,
    # taken as a WINDOW over the ≤dim-rows-per-doc bucket frame: a
    # groupBy+join would re-derive the whole tf→bucket subtree for the
    # second consumer (measured 13 exchanges vs 5 this way).
    nq = F.floor(
        F.pow(F.col("wq").cast("double") / F.lit(1e6), F.lit(2.0))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    nsum = F.sum(nq).over(Window.partitionBy(id_col))
    return bucket.select(
        id_col,
        "dim_idx",
        _r(
            (F.col("wq").cast("double") / F.lit(1e6))
            / F.sqrt(nsum.cast("double") / F.lit(1e6)),
            6,
        ).alias("weight"),
    )
