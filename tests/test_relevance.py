"""Known-answer tests for text/relevance.py (tf-idf, bigram LM) and
the embedding cluster-assignment / length-outlier operators."""

from __future__ import annotations

import math

import pytest

from energydatalake_spark.text.relevance import bigram_lm_scores, bigrams, tfidf_topk


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a b"),
        (2, "a c"),
        (3, "b b c c"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tfidf_known(spark, docs):
    out = tfidf_topk(docs, k=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # df: a→2 docs, b→2, c→2; N=3 ⇒ idf = ln(3/2) for every term.
    idf = math.log(3 / 2)
    d1 = {r.term: r for r in by_doc[1]}
    assert d1["a"].tf == 2 and d1["a"].df == 2
    assert d1["a"].tfidf == _r6(2 * idf)
    assert d1["b"].tfidf == _r6(1 * idf)
    # rank: higher score first, term asc on ties
    assert [r.term for r in sorted(by_doc[1], key=lambda r: r.rank)] == ["a", "b"]
    d3 = {r.term: r for r in by_doc[3]}
    assert d3["b"].tf == 2 and d3["c"].tf == 2
    # equal scores → lexicographic term order
    assert [r.term for r in sorted(by_doc[3], key=lambda r: r.rank)] == ["b", "c"]


def test_tfidf_k_cap(spark, docs):
    out = tfidf_topk(docs, k=1).collect()
    assert {r.doc_id: r.term for r in out} == {1: "a", 2: "a", 3: "b"}
    assert all(r.rank == 1 for r in out)


def test_bigrams_explode(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, "p q")], "doc_id bigint, text string"
    )
    got = {(r.doc_id, r.w1, r.w2) for r in bigrams(df).collect()}
    # doc 2 has one token → no bigrams
    assert got == {(1, "a", "b"), (1, "b", "c"), (3, "p", "q")}


def test_bigram_lm_known(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "x")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    # bigrams: d1 (a,b)(b,a)(a,b), d2 (b,a); c2[(a,b)]=2, c2[(b,a)]=2,
    # c1[a]=2, c1[b]=2, V=|{a,b}|=2 ⇒ every P = (2+1)/(2+2)=0.75.
    lp = math.floor(math.log(0.75) * 1e6 + 0.5)  # quantized micro-nats
    assert 3 not in out  # single-token doc has no bigrams
    assert out[1].n_bigrams == 3
    assert out[1].avg_logp == _r6(3 * lp / 1e6 / 3)
    assert out[2].n_bigrams == 1
    assert out[2].avg_logp == _r6(lp / 1e6 / 1)


def test_bigram_lm_flags_disfluent(spark):
    """A shuffled/disfluent doc scores below a doc made of corpus-
    frequent transitions."""
    rows = [(i, "the cat sat on the mat") for i in range(1, 9)]
    rows.append((9, "mat the on sat cat the"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r.avg_logp for r in bigram_lm_scores(df).collect()}
    assert out[9] < out[1]


def test_assign_cells_matches_bruteforce(spark):
    import numpy as np

    from energydatalake_spark.similarity.search import assign_cells

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r.vec_id: r.cell_id for r in assign_cells(df, n_cells=4).collect()}
    v64 = vecs.astype("float64")
    cents = v64[:4]
    for i in range(40):
        cos = (cents @ v64[i]) / (
            np.linalg.norm(cents, axis=1) * np.linalg.norm(v64[i])
        )
        assert got[i] == int(np.argmax(cos)), f"vec {i}"


def test_assign_cells_no_shuffle(spark):
    """Assignment must stay map-side: no Exchange in the plan."""
    from energydatalake_spark.similarity.search import assign_cells

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id bigint, embedding array<float>",
    )
    plan = (
        assign_cells(df, n_cells=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_doc_outliers_band(spark, tmp_path):
    """Rows outside the exact [p5, p95] n_chars band flag by side."""
    import numpy as np

    from energydatalake_spark.plans.llm_ops import q_doc_outliers

    # Write a miniature documents table; lengths 10..109 (100 rows).
    rows = [(i, "x" * (10 + i), "en", "web", 10 + i) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_doc_outliers(spark, str(tmp_path)).collect()
    lens = np.array([10 + i for i in range(100)], dtype="float64")
    lo = math.floor(np.percentile(lens, 5) * 1e6 + 0.5) / 1e6
    hi = math.floor(np.percentile(lens, 95) * 1e6 + 0.5) / 1e6
    expect = {
        (int(n), "short" if n < lo else "long")
        for n in lens
        if n < lo or n > hi
    }
    assert {(r.n_chars, r.side) for r in out} == expect
    assert all(r.lo == lo and r.hi == hi for r in out)


def test_lm_buckets_tercile_semantics(spark, tmp_path):
    """Per-lang head/middle/tail assignment: buckets are ordered by
    score (every head doc scores >= every middle doc >= every tail doc
    within its language), cutpoints are per-language (the same score
    can land in different buckets across langs), and sizes split
    roughly in thirds."""
    from collections import Counter

    from energydatalake_spark.plans.llm_ops import q_lm_buckets

    rows = []
    # lang A: 9 fluent-ish docs with varying repetition; lang B: 6 docs
    for i in range(9):
        rows.append((i, "the cat sat " * (i + 1) + "on the mat", "A", "web", 1))
    for i in range(6):
        rows.append((100 + i, "x y z " * (i + 1) + "q r", "B", "web", 1))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_lm_buckets(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in out} == {r[0] for r in rows}
    order = {"tail": 0, "middle": 1, "head": 2}
    for lang in ("A", "B"):
        got = [r for r in out if r.lang == lang]
        # bucket ordering respects score ordering
        for a in got:
            for b in got:
                if a.avg_logp > b.avg_logp:
                    assert order[a.bucket] >= order[b.bucket]
        sizes = Counter(r.bucket for r in got)
        n = len(got)
        for b in ("head", "middle", "tail"):
            assert sizes[b] >= n // 3 - 1  # within one of a third


def test_quality_probe_matches_numpy_lstsq(spark, tmp_path):
    """The one-pass Cramer solve must equal numpy's least-squares on
    the same integer-quantized features, and the per-doc scores must
    follow w0 + w1*x1 + w2*x2. Also sanity: with lang strongly
    separable by stopword fraction, English docs score higher."""
    import numpy as np

    from energydatalake_spark.plans.llm_ops import q_quality_probe

    rows = []
    for i in range(12):  # English-ish: real stopwords present
        rows.append((i, "the cat and the dog in a house " * (i % 3 + 1),
                     "en", "web", 1))
    for i in range(12):  # non-English: no English stopwords
        rows.append((100 + i, "xq zr vb nm kp wt " * (i % 3 + 1),
                     "de", "web", 1))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in q_quality_probe(spark, str(tmp_path)).collect()}
    assert len(out) == 24

    X = np.array([[1.0, out[i].x1, out[i].x2] for i in sorted(out)])
    yv = np.array([float(out[i].y) for i in sorted(out)])
    w = np.linalg.lstsq(X, yv, rcond=None)[0]
    scores = X @ w
    got = np.array([out[i].score for i in sorted(out)])
    assert np.allclose(got, scores, atol=1e-5)
    # separability: every English doc outscores every non-English doc
    en = [out[i].score for i in sorted(out) if out[i].lang == "en"]
    de = [out[i].score for i in sorted(out) if out[i].lang == "de"]
    assert min(en) > max(de)
    assert all(out[i].predicted == (out[i].score >= 0.5) for i in out)


def test_lm_buckets_percentile_parity_on_edge_shapes(spark, tmp_path):
    """The tercile cutpoints rest on exact percentile interpolation
    agreeing between Spark and DuckDB. The registry oracle checks one
    corpus; this stresses the edge shapes where type-7 interpolation
    actually interpolates: tiny languages (1-4 docs), duplicate scores
    (ties AT the cutpoint), and counts on either side of the h=(n-1)q
    integer boundary."""
    import duckdb

    from energydatalake_spark.plans.llm_ops import SQL_LM_BUCKETS, q_lm_buckets

    corpora = {
        "one_doc_lang": [("a b c d", "xx")],
        "two_docs": [("a b a b", "xx"), ("b a b a b", "xx")],
        "three_docs_tied": [("a b a b", "xx")] * 3,
        "four_docs": [
            ("a b " * k + "c d", "xx") for k in (1, 2, 3, 4)
        ],
        "mixed_langs": [
            ("the cat sat on the mat", "en"),
            ("the dog sat", "en"),
            ("le chat " * 3, "fr"),
            ("le chien le chat", "fr"),
            ("x y " * 5, "zz"),
        ],
    }
    for name, docs in corpora.items():
        rows = [
            (i, t, lang, "web", len(t)) for i, (t, lang) in enumerate(docs)
        ]
        d = str(tmp_path / name)
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.mode("overwrite").parquet(d + "/documents.parquet")
        got = sorted(
            (r.doc_id, r.lang, r.avg_logp, r.bucket)
            for r in q_lm_buckets(spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')"
        )
        want = sorted(
            tuple(r) for r in con.execute(SQL_LM_BUCKETS).fetchall()
        )
        assert got == want, f"corpus {name}: {got} != {want}"


def test_hashed_tfidf_unit_norm_and_partition_invariance(spark):
    """Every document's sparse hashed-tfidf vector must be
    L2-normalized (≈1 up to the documented micro-unit quantization),
    and the output must not depend on input partitioning (the bigint
    micro-unit sums make the reduction order-free)."""
    from pyspark.sql import functions as F

    from energydatalake_spark.io.readers import read_table
    from energydatalake_spark.text.relevance import hashed_tfidf

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = hashed_tfidf(docs, dim=16)
    norms = (
        out.groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("weight")).alias("n2"))
        .collect()
    )
    assert norms
    for r in norms:
        assert abs(r.n2 - 1.0) < 1e-3, f"doc {r.doc_id} norm² {r.n2}"
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, hashed_tfidf(docs.repartition(13), dim=16).collect()))
    assert a == b
