"""Known-answer tests for the r6 corpus ops: per-source dataset-card
rollup, incremental ingest dedup, and the boilerplate phrase filter."""

from __future__ import annotations

import math

import pytest

from energydatalake_spark.plans.llm_ops import (
    q_boilerplate_filter,
    q_corpus_increment,
    q_source_profile,
)


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_source_profile_rollup(spark, tmp_path):
    rows = [
        (1, "the cat sat on the mat", "en", "web", 22),
        (2, "the dog ran", "en", "web", 11),
        (3, "le chat est la", "fr", "books", 14),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {(r.source, r.lang): r for r in q_source_profile(spark, sf).collect()}
    web = out[("web", "en")]
    assert web.n_docs == 2
    assert web.total_tokens == 6 + 3
    assert web.total_chars == 22 + 11
    assert web.pct_docs == math.floor(2 / 3 * 100 * 1e6 + 0.5) / 1e6
    books = out[("books", "fr")]
    assert books.n_docs == 1 and books.pct_docs == math.floor(1 / 3 * 100 * 1e6 + 0.5) / 1e6
    # avg_quality stays in the score's [0,1] range
    assert 0.0 < web.avg_quality <= 1.0


def test_corpus_increment_verdicts(spark, tmp_path):
    base = "the cat sat on the mat and the dog ran around today"
    rows = [
        # existing corpus (doc_id % 5 != 0)
        (1, base, "en", "web", len(base)),
        (2, "completely different text with unrelated words here now", "en", "web", 55),
        # incoming batch (doc_id % 5 == 0)
        (5, base, "en", "web", len(base)),  # exact dup of 1
        (10, base.replace("ran around", "walked home"), "en", "web", 50),  # near-dup of 1
        (15, "nothing in common with anything else at all whatsoever", "en", "web", 54),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_corpus_increment(spark, sf).collect()}
    assert set(out) == {5, 10, 15}
    assert out[5].verdict == "exact" and out[5].matched_doc_id == 1
    assert out[10].verdict == "near_dup" and out[10].matched_doc_id == 1
    assert out[15].verdict == "accept" and out[15].matched_doc_id is None


def test_corpus_increment_exact_beats_near(spark, tmp_path):
    """A doc that is BOTH an exact dup and an LSH near-dup candidate
    reports the exact verdict (precedence)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "en", "web", len(base)),
        (5, base, "en", "web", len(base)),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_corpus_increment(spark, sf).collect()}
    assert out[5].verdict == "exact" and out[5].matched_doc_id == 1


def test_boilerplate_filter_known(spark, tmp_path):
    # 'copyright all rights reserved' contributes shingles shared by
    # 3+ docs → df > BOILER_DF(=2) → boilerplate.
    boiler = "copyright all rights reserved"
    rows = [
        (1, f"unique words one {boiler}", "en", "web", 1),
        (2, f"other tokens two {boiler}", "en", "web", 1),
        (3, f"more stuff three {boiler}", "en", "web", 1),
        (4, boiler, "en", "web", 1),  # pure boilerplate → keep = False
        (5, "entirely fresh content with no repeats in it", "en", "web", 1),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_boilerplate_filter(spark, sf).collect()}
    # doc 4: shingles = ('copyright all rights', 'all rights reserved'),
    # each in all 4 docs → both boilerplate.
    assert out[4].n_shingles == 2 and out[4].n_boiler == 2
    assert out[4].keep is False
    assert out[5].n_boiler == 0 and out[5].keep is True
    # mixed docs keep: 5 shingles, 2 boilerplate → 2*2 <= 5
    assert out[1].keep is True and out[1].n_boiler == 2


def test_boilerplate_filter_short_docs_absent(spark, tmp_path):
    rows = [
        (1, "one two", "en", "web", 7),  # < 3 tokens → no shingles
        (2, "alpha beta gamma delta", "en", "web", 22),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id for r in q_boilerplate_filter(spark, sf).collect()}
    assert out == {2}


def test_json_extract_malformed_tolerant(spark, tmp_path):
    """from_json yields NULL for malformed/missing fields instead of
    failing the job; the null-parse count audits feed health."""
    from pyspark.sql import functions as F

    from energydatalake_spark.plans.registry import q_json_extract

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, '{"k": 7}'),
        (2, "2024-01-01 00:00:01", 1, "click", 1.0, "not json at all"),
        (3, "2024-01-01 00:00:02", 1, "click", 1.0, '{"other": 1}'),
        (4, "2024-01-01 00:00:03", 1, "view", 1.0, '{"k": 3}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in q_json_extract(spark, str(tmp_path)).collect()}
    click = out["click"]
    assert click.n_events == 3 and click.k_sum == 7 and click.n_null == 2
    assert out["view"].k_sum == 3 and out["view"].n_null == 0


def test_snapshot_diff_classes(spark, tmp_path):
    """Every change class on a handcrafted id space:
    id 35 (v1-only: %7==0 drops from... ) — derive expectations
    directly from the derivation rules."""
    rows = [(i, f"text number {i}", "en", "web", 10) for i in range(1, 80)]
    sf = _write_documents(spark, tmp_path, rows)
    from energydatalake_spark.plans.registry import q_snapshot_diff

    out = {r.change: r for r in q_snapshot_diff(spark, sf).collect()}
    ids = range(1, 80)
    v1 = {i for i in ids if i % 7 != 0}
    v2 = {i for i in ids if i % 5 != 0}
    expect = {
        "added": len(v2 - v1),
        "removed": len(v1 - v2),
        "modified": len({i for i in v1 & v2 if i % 11 == 0}),
        "unchanged": len({i for i in v1 & v2 if i % 11 != 0}),
    }
    assert {k: v.n_docs for k, v in out.items()} == expect
    assert out["modified"].first_doc_id == min(
        i for i in v1 & v2 if i % 11 == 0
    )


def _duck(sf_dir, sql, tables=("documents",)):
    import os

    import duckdb

    con = duckdb.connect()
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark writes a part-file directory
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).fetchall()


def test_source_profile_empty_text_matches_oracle(spark, tmp_path):
    """An empty-text doc must score NULL quality in BOTH engines (not
    Spark-NaN-cast-to-0 vs a DuckDB conversion error) and be excluded
    from the average's denominator."""
    from energydatalake_spark.plans.llm_ops import SQL_SOURCE_PROFILE

    rows = [
        (1, "the cat sat", "en", "web", 11),
        (2, "", "en", "web", 0),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {(r.source, r.lang): r for r in q_source_profile(spark, sf).collect()}
    web = got[("web", "en")]
    oracle = {(r[0], r[1]): r for r in _duck(sf, SQL_SOURCE_PROFILE)}
    o = oracle[("web", "en")]
    assert web.n_docs == 2 == o[2]
    assert web.avg_quality == o[5]  # averaged over the ONE scored doc
    assert web.avg_quality is not None


def test_json_extract_oracle_tolerates_malformed(spark, tmp_path):
    from pyspark.sql import functions as F

    from energydatalake_spark.plans.registry import SQL_JSON_EXTRACT, q_json_extract

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, '{"k": 7}'),
        (2, "2024-01-01 00:00:01", 1, "click", 1.0, "not json at all"),
        # engine-divergence candidates: single-quoted JSON (lenient
        # Jackson accepts, strict json_valid rejects — Spark is pinned
        # strict), string-typed and float-typed numbers (DuckDB
        # json_type gate must reject both, like from_json's BIGINT)
        (3, "2024-01-01 00:00:02", 1, "click", 1.0, "{'k': 5}"),
        (4, "2024-01-01 00:00:03", 1, "click", 1.0, '{"k": "7"}'),
        (5, "2024-01-01 00:00:04", 1, "click", 1.0, '{"k": 1.5}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r for r in q_json_extract(spark, str(tmp_path)).collect()}
    oracle = {r[0]: r for r in _duck(str(tmp_path), SQL_JSON_EXTRACT, ("events",))}
    assert got["click"].n_events == 5 == oracle["click"][1]
    assert got["click"].n_null == 4 == oracle["click"][5]
    assert got["click"].k_sum == 7 == oracle["click"][2]


def test_embedding_clusters_zero_norm_excluded(spark, tmp_path):
    from energydatalake_spark.plans.llm_ops import SQL_EMBEDDING_CLUSTERS
    from energydatalake_spark.similarity.search import assign_cells

    rows = [(i, [float(i + 1), 1.0]) for i in range(20)]
    rows.append((20, [0.0, 0.0]))  # zero-norm: no direction
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = assign_cells(df, n_cells=2).collect()
    assert {r.vec_id for r in out} == set(range(20))  # 20 excluded
    assert all(r.cell_id in (0, 1) for r in out)  # no -1 sentinel


def test_corpus_funnel_every_stage_drops(spark, tmp_path):
    """Handcrafted corpus where each gate drops somebody, and the
    funnel counts stay monotone: boilerplate-heavy doc, repetitive
    doc, exact duplicate — checked against the DuckDB twin."""
    from energydatalake_spark.plans.llm_ops import (
        _sql_corpus_funnel,
        q_corpus_funnel,
    )

    # Corpus-scale thresholds: the repetition gate needs top word
    # ≤ 12% of tokens, so clean docs use ≥ 9 all-distinct words.
    boiler = "copyright all rights reserved do not copy this page thanks"
    fluent = "quick brown foxes jump over lazy dogs every single day"
    rows = [
        (1, fluent, "en", "web", 1),
        (2, fluent, "en", "web", 1),            # exact dup of 1
        (3, "spam spam spam spam spam ham", "en", "web", 1),  # repetitive
        (4, boiler, "en", "web", 1),            # boilerplate ×3
        (5, boiler, "en", "web", 1),
        (6, boiler, "en", "web", 1),
        (7, "nine perfectly ordinary different words compose this varied sentence", "en", "web", 1),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = q_corpus_funnel(spark, sf).collect()[0].asDict()
    oracle = _duck(sf, _sql_corpus_funnel())[0]
    assert tuple(got.values()) == oracle
    n = list(got.values())
    assert n[0] == 7
    assert all(a >= b for a, b in zip(n, n[1:]))  # monotone funnel
    assert got["n_after_boilerplate"] == 4       # 4,5,6 drop
    assert got["n_after_repetition"] == 3        # 3 drops
    assert got["n_after_dedup"] == got["n_after_fluency"] - 1  # dup of 1 drops


def test_embedding_clusters_kmeans_partitions_corpus(spark):
    """The trained-codebook cluster profile covers every vector
    exactly once (it is a partition of the corpus)."""
    from conftest import SF_SMOKE

    from energydatalake_spark.plans.llm_ops import q_embedding_clusters_kmeans

    sf = SF_SMOKE
    out = q_embedding_clusters_kmeans(spark, sf).collect()
    import duckdb

    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r.n_members for r in out) == n_vecs
    assert len({r.cell_id for r in out}) == len(out)


def test_probe_weights_match_formula_strings():
    """_probe_weights (plain Python, no eval) must be bit-identical to
    evaluating the _PROBE_DET* expression strings — the strings stay
    the cross-engine source of truth, the function merely mirrors
    them (VERDICT r7 What's-wrong #4)."""
    import random

    from energydatalake_spark.plans.llm_ops import (
        _PROBE_DET,
        _PROBE_DET0,
        _PROBE_DET1,
        _PROBE_DET2,
        _probe_weights,
    )

    rnd = random.Random(7)
    for _ in range(50):
        env = {
            k: rnd.uniform(1.0, 1e6)
            for k in ("n", "s1", "s2", "q11", "q12", "q22", "b0", "b1", "b2")
        }
        det = eval(_PROBE_DET, {"__builtins__": {}}, dict(env))
        want = tuple(
            eval(e, {"__builtins__": {}}, dict(env)) / det
            for e in (_PROBE_DET0, _PROBE_DET1, _PROBE_DET2)
        )
        assert _probe_weights(env) == want  # bit-exact, not approx


def test_corpus_increment_batch_intra_tier(spark, tmp_path):
    """r9 (ADVICE r8): the intra-batch tier. Co-arriving duplicates —
    absent from the corpus — must resolve against the SMALLEST batch
    id through both tiers, so each cluster admits exactly one
    representative; corpus matches still win when their id is
    smaller. Plain corpus_increment (corpus-only contract) accepts
    all three co-arrivals — the documented contract difference."""
    from energydatalake_spark.plans.llm_ops import q_corpus_increment_batch

    novel = "entirely novel duplicated content arriving together in one batch"
    rows = [
        # corpus (doc_id % 5 != 0) — nothing matches the batch cluster
        (1, "the corpus holds only this unrelated text about parquet", "en", "web", 55),
        # batch (doc_id % 5 == 0): three co-arriving copies + one near
        (5, novel, "en", "web", len(novel)),
        (10, novel, "en", "web", len(novel)),
        (15, novel, "en", "web", len(novel)),
        (20, novel.replace("one batch", "a batch"), "en", "web", 60),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_corpus_increment_batch(spark, sf).collect()}
    assert out[5].verdict == "accept" and out[5].matched_doc_id is None
    assert out[10].verdict == "exact" and out[10].matched_doc_id == 5
    assert out[15].verdict == "exact" and out[15].matched_doc_id == 5
    assert out[20].verdict == "near_dup" and out[20].matched_doc_id == 5
    # corpus-only contract: all four sail through
    base = {r.doc_id: r for r in q_corpus_increment(spark, sf).collect()}
    assert all(base[d].verdict == "accept" for d in (5, 10, 15, 20))
