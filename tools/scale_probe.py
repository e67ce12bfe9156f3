"""sf1 scale probe for the heavy query family (VERDICT r7 #7).

Generates 1× and 10× synthetic ``documents`` / ``embeddings`` tables
with the driver testdata's distribution shape (sf0.1 profile: 5,000
docs × ~54 tokens over a 31-word vocab, 5 langs × 20 sources; 2,000
unit-norm 64-dim embeddings in 10 clusters — so 10× ≈ sf1), runs each
heavy query on BOTH via the registry build, and reports wall-clock plus
the scaling exponent  α = log(t₁₀/t₁)/log(10).  α ≈ 1 is linear; the
"scale-safe" claims in VERDICT/PLANS predict α ≲ 1.2 for every query
here (banded/bucketed dedup, model-sized k-means collects). Both
datasets come from the SAME generator, so the ratio is apples-to-apples
regardless of how closely the distribution matches the driver's.

Writes nothing under /root/testdata (read-only); probe data lives in a
temp dir. Usage:  python tools/scale_probe.py [query ...]

``--x100`` (VERDICT r9 #5) adds a THIRD decade: x1/x10/x100
(= 500k docs / 200k vectors ≈ sf10) from the same generators, keeps
the data under /tmp/sfgen/probe100 for reuse across runs, reports the
per-decade exponents α₁ (x1→x10) and α₂ (x10→x100), and writes the
full map to BENCHHEAVY_sf10.json at the repo root. One decade
amortizes fixed job overhead and flatters exponents; the second
decade is the evidence that actually supports a 100 TB claim.
Usage:  python tools/scale_probe.py --x100 [query ...]

``--fresh`` (with --x100) runs ONE subprocess per query so no query's
measurement inherits another's heap/GC state — the r11 sweep measured
hashed_tfidf at 182 s (α₂ 1.41) inside a shared session vs 47 s
(α₂ 0.79) clean. Prefer it for any number the ledger will cite.
Usage:  python tools/scale_probe.py --x100 --fresh [query ...]

``--heaps`` (VERDICT r11 #5) swaps the documents generator for a
Heaps-law one: vocabulary grows ~n^0.55 with the corpus under a
zipfian frequency profile, the way real crawl corpora behave. The
fixed 31-word VOCAB above is a useful adversarial corner (it
saturates the 3-gram shingle universe, making every LSH exponent
pessimistic — the corpus the band-geometry circuit breaker exists
for) but hides real-corpus behavior; the ledger publishes BOTH
exponent columns (``queries`` = saturated, ``queries_heaps`` = Heaps)
in BENCHHEAVY_sf10.json. Embeddings are generator-identical across
modes, so --heaps defaults to the document-driven heavy queries.
Usage:  python tools/scale_probe.py --x100 [--fresh] --heaps [query ...]

``--third`` (VERDICT r12 #2) measures the half-decade x100→x300
(1.5M docs / 600k vectors ≈ sf30) for the log-factor families whose
"stays ~linear at x1000" claims were analytic: the band-geometry
breaker path (minhash_pairs, dedup_clusters) and the multiprobe
fan-out (dedup_embedding_lsh). Writes ``queries_third`` /
``queries_third_heaps`` entries (t_x100, t_x300, alpha_x100_x300)
into BENCHHEAVY_sf10.json, stamped over the (100, 300) manifests.
x300 is the largest point a 64g local JVM holds; log₃ spacing is
enough to expose a tier that two full decades hid.
Usage:  python tools/scale_probe.py --third [--fresh] [--heaps] [query ...]

``--fourth`` (VERDICT r14 #5) measures the x300→x1000 ladder step
(5M docs / 2M vectors ≈ sf100) — the fourth-decade pilot for the
100-TB workhorse families; default query is minhash_pairs (its
x1000-stays-linear claim was two-thirds measured, and the band
breaker's next decade-boundary decision is exactly what a 100-TB
deployment hits first; breaker decisions print to stderr). Writes
``queries_fourth`` / ``queries_fourth_heaps`` entries (t_x300,
t_x1000, alpha_x300_x1000) stamped over the (300, 1000) manifests.
Budget ~1 h per query on a quiet machine.
Usage:  python tools/scale_probe.py --fourth [--fresh] [--heaps] [query ...]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "minhash_pairs",
    "hashed_tfidf",
    "vocab_coverage",
    "line_dedup",
    "substring_dedup",
    "dedup_clusters",
    "semantic_dedup",
    "similarity_ivf_kmeans",
    # r9 additions: the three queries the first full sf1 bench caught
    # super-linear (since rescaled — keep them watched).
    "ngram_jaccard",
    "dedup_recall",
    "simhash_pairs",
]

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "a", "the", "line", "sort", "window",
    "order", "data", "column", "join", "small", "customer", "query", "big",
    "stream", "group", "filter", "vector", "sessionize",
]


def gen_documents(path: str, n_docs: int, rng: np.random.Generator) -> None:
    """~54-token docs over the 31-word vocab; ~0.2% exact dups and a
    planted pool of shared 6-token spans (the sf0.1 corpus shows ~1k
    cross-doc spans at k=5-8) so dedup finds real structure."""
    spans = [
        list(rng.choice(VOCAB, size=6)) for _ in range(max(20, n_docs // 250))
    ]
    texts: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < 0.002:
            texts.append(texts[rng.integers(0, len(texts))])  # exact dup
            continue
        toks = list(rng.choice(VOCAB, size=int(rng.integers(40, 69))))
        if rng.random() < 0.3:  # plant a shared span mid-document
            span = spans[rng.integers(0, len(spans))]
            p = int(rng.integers(0, len(toks) - 6))
            toks[p : p + 6] = span
        texts.append(" ".join(toks))
    langs = rng.choice(["en", "de", "fr", "es", "pt"], size=n_docs)
    sources = rng.choice([f"src{i}" for i in range(20)], size=n_docs)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array(sources.tolist()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def gen_embeddings(path: str, n_vecs: int, rng: np.random.Generator) -> None:
    """Unit-norm 64-dim vectors in 10 clusters + ~2% planted near-dup
    twins (tiny perturbation of an earlier vector)."""
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, size=n_vecs)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_vecs, 64))
    dup = rng.random(n_vecs) < 0.02
    for i in np.flatnonzero(dup):
        if i == 0:
            continue
        j = int(rng.integers(0, i))
        vecs[i] = vecs[j] + 0.01 * rng.normal(size=64)
        labels[i] = labels[j]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, path)


def gen_documents_heaps(path: str, n_docs: int, rng: np.random.Generator) -> None:
    """Heaps-law documents: vocabulary of ~8·n^0.55 synthetic words
    under a zipf(1.1) frequency profile — distinct shingles keep
    growing with the corpus, the way real crawl text behaves (vs the
    fixed-VOCAB generator above, whose shingle universe saturates).
    Same planted structure: ~0.2% exact dups, a pool of shared 6-token
    spans, same doc-length profile, so the same dedup machinery has
    real work at every scale."""
    v = max(1_000, int(8 * n_docs**0.55))
    vocab = np.array([f"w{i}" for i in range(v)])
    p = 1.0 / np.arange(1, v + 1) ** 1.1
    p /= p.sum()
    # One inverse-CDF bulk draw for every token (per-doc rng.choice
    # with p re-cumsums the whole vocab per call — O(n_docs·v)).
    cdf = np.cumsum(p)
    lengths = rng.integers(40, 69, size=n_docs)
    pool = vocab[np.searchsorted(cdf, rng.random(int(lengths.sum())))]
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    spans = [
        list(vocab[np.searchsorted(cdf, rng.random(6))])
        for _ in range(max(20, n_docs // 250))
    ]
    texts: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < 0.002:
            texts.append(texts[rng.integers(0, len(texts))])  # exact dup
            continue
        toks = list(pool[starts[i] : starts[i] + lengths[i]])
        if rng.random() < 0.3:  # plant a shared span mid-document
            span = spans[rng.integers(0, len(spans))]
            pos = int(rng.integers(0, len(toks) - 6))
            toks[pos : pos + 6] = span
        texts.append(" ".join(toks))
    langs = rng.choice(["en", "de", "fr", "es", "pt"], size=n_docs)
    sources = rng.choice([f"src{i}" for i in range(20)], size=n_docs)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array(sources.tolist()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


#: x100 additions: the two remaining heavy similarity/CC queries worth
#: a second decade (the windowed eval ops ngram_jaccard/dedup_recall
#: stay in the x10 list but are ~constant by construction).
HEAVY_X100_EXTRA = ["dedup_embedding_lsh", "embedding_clusters_kmeans"]

#: --heaps default: the heavy queries the documents generator drives
#: (embeddings are generator-identical across modes).
HEAVY_DOCS = [
    "minhash_pairs",
    "hashed_tfidf",
    "vocab_coverage",
    "line_dedup",
    "substring_dedup",
    "dedup_clusters",
    "ngram_jaccard",
    "dedup_recall",
    "simhash_pairs",
]

SIZES = {
    1: (5_000, 2_000),
    10: (50_000, 20_000),
    100: (500_000, 200_000),
    # --third half-decade (VERDICT r12 #2): x300 = 1.5M docs / 600k
    # vectors ≈ sf30 — the largest point one 64g local JVM holds
    # comfortably; log₃ spacing is enough to expose a genuinely
    # super-linear tier that two full decades hid.
    300: (1_500_000, 600_000),
    # --fourth pilot (VERDICT r14 #5): x1000 = 5M docs ≈ sf100 — the
    # fourth-decade point for the 100-TB workhorse families (minhash
    # first); converts the "stays linear at x1000" claim from
    # two-thirds measured to fully measured and exercises the band
    # breaker at the next decade boundary.
    1000: (5_000_000, 2_000_000),
}

#: --third targets: the log-factor families whose x1000 stays-linear
#: claims were analytic until r13 (the breaker's bands·rows step; the
#: multiprobe (1+p) fan-out), the CC closure that consumes minhash
#: candidates, and (extended late r13) the remaining heavy dedup
#: families. dedup_embedding_lsh and semantic_dedup are
#: embedding-driven — their data is generator-identical across modes,
#: so they run once (saturated key) rather than per-generator.
#: --fourth default: the fourth-decade pilot family (one query by
#: design — budget ~1 h each; widen deliberately, not by default).
FOURTH_DECADE = [
    "minhash_pairs",
]

THIRD_DECADE = [
    "minhash_pairs",
    "dedup_clusters",
    "dedup_embedding_lsh",
    "semantic_dedup",
    "substring_dedup",
    "simhash_pairs",
]
THIRD_DECADE_HEAPS = [
    "minhash_pairs",
    "dedup_clusters",
    "substring_dedup",
    "simhash_pairs",
]


_GEN_SEED = 4242


def _gen_manifest(mult: int, heaps: bool = False) -> dict:
    """Identity of the data _gen_dir would produce right now: sizes,
    seed, generator mode, and a hash of the generator source.
    Persisted next to the parquet so reuse across --x100 runs only
    happens when the data an existing dir holds is the data this code
    would regenerate — otherwise a generator/SIZES change silently
    feeds stale rows into the committed BENCHHEAVY exponents (ADVICE
    r10)."""
    import hashlib
    import inspect

    # Hash the module-level inputs the generator closes over alongside
    # the function bodies — VOCAB only in saturated mode (r11 review:
    # editing it changes every document but not the function source;
    # r12 review: the heaps generator never reads it, so hashing it
    # there would spuriously invalidate byte-identical heaps data).
    gen_docs = gen_documents_heaps if heaps else gen_documents
    src = (
        inspect.getsource(gen_docs)
        + inspect.getsource(gen_embeddings)
        + ("" if heaps else repr(VOCAB))
    )
    return {
        "mode": "heaps" if heaps else "saturated",
        "sizes": list(SIZES[mult]),
        "seed": _GEN_SEED,
        "generator_md5": hashlib.md5(src.encode()).hexdigest(),
    }


def _manifest_stamp(heaps: bool, mults: tuple[int, ...] = (1, 10, 100)) -> str:
    """BENCHHEAVY entry stamp: hash of the full manifests of EVERY
    decade the run measures (mode + per-decade sizes + seed +
    generator source), not generator_md5 alone — a SIZES/seed change
    at ANY decade changes the timings and every exponent, so it must
    invalidate prior merged entries (ADVICE r11 #1; r12 review:
    hashing only the x100 manifest left SIZES[1]/SIZES[10] edits
    silently mixing corpora). --third stamps over (100, 300)."""
    import hashlib
    import json

    return hashlib.md5(
        json.dumps(
            [_gen_manifest(m, heaps) for m in mults], sort_keys=True
        ).encode()
    ).hexdigest()


def _gen_dir(base: str, mult: int, heaps: bool = False) -> str:
    import json

    d = os.path.join(base, f"x{mult}")
    docs = os.path.join(d, "documents.parquet")
    mpath = os.path.join(d, "manifest.json")
    want = _gen_manifest(mult, heaps)
    if os.path.exists(docs):  # reuse across --x100 runs (x100 gen ~min)
        have = None
        if os.path.exists(mpath):
            with open(mpath) as fh:
                have = json.load(fh)
        if have == want:
            print(f"x{mult}: reusing {d} (manifest match, sizes {want['sizes']})")
            return d
        print(f"x{mult}: manifest mismatch at {d} — regenerating")
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    n_docs, n_vecs = SIZES[mult]
    rng = np.random.default_rng(_GEN_SEED)  # same seed: x10 ⊃-shaped like x1
    (gen_documents_heaps if heaps else gen_documents)(docs, n_docs, rng)
    gen_embeddings(os.path.join(d, "embeddings.parquet"), n_vecs, rng)
    with open(mpath, "w") as fh:
        json.dump(want, fh)
    return d


def _run(queries: list[str], dirs: dict[int, str], mults: tuple[int, ...],
         flush=None):
    from energydatalake_spark.plans.registry import QUERIES
    from energydatalake_spark.session import get_spark
    from energydatalake_spark import release_caches

    # Fourth-decade runs (x1000 = 5M docs) exceed the container's ~80G
    # scratch with lz4 shuffle files — the first r15 pilot died on
    # ENOSPC mid-warm-run — so they (a) compress shuffle/spill with
    # zstd (~2-3x better on text-heavy exchanges; BOTH scales in the
    # run share the codec, so the exponent stays apples-to-apples,
    # and the entry is stamped with it) and (b) force a JVM GC after
    # every collect so the ContextCleaner reclaims the previous run's
    # shuffle files instead of stacking warm+timed scratch on disk.
    big = max(mults) >= 1000
    spark = get_spark(
        "scale_probe",
        extra_conf={"spark.io.compression.codec": "zstd"} if big else None,
    )

    import glob as _glob
    import tempfile as _tempfile

    # Resolve the ACTUAL scratch roots (ADVICE r15): hardcoding /tmp
    # measures 0 bytes under a nondefault spark.local.dir /
    # SPARK_LOCAL_DIRS, hits the <1 GiB early-exit after one poll,
    # and silently degrades to the fixed-sleep race the polling
    # reclaim loop was written to fix.
    roots: list[str] = []
    env_dirs = os.environ.get("SPARK_LOCAL_DIRS", "")
    roots += [p for p in env_dirs.split(",") if p.strip()]
    try:
        roots.append(spark.conf.get("spark.local.dir"))
    except Exception:
        pass
    roots = [r.strip() for r in roots if r and r.strip()] or [
        _tempfile.gettempdir()
    ]

    def _scratch_bytes() -> int:
        n = 0
        dirs_ = [
            d
            for root_dir in dict.fromkeys(roots)
            for d in _glob.glob(os.path.join(root_dir, "blockmgr-*"))
        ]
        for d in dirs_:
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        n += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return n

    def _reclaim_scratch() -> None:
        # ContextCleaner deletion is asynchronous and best-effort: one
        # advisory GC + fixed sleep is a race (r15 review) — a slow
        # disk can outlast it and the timed leg then starts over the
        # warm leg's scratch (ENOSPC, or deletion I/O inflating the
        # timed run). Poll the blockmgr footprint until it stops
        # shrinking, re-nudging the GC, bounded at 120 s.
        if not big:
            return
        deadline = time.time() + 120
        prev, stable = None, 0
        while time.time() < deadline:
            spark.sparkContext._jvm.System.gc()
            time.sleep(3)
            cur = _scratch_bytes()
            if cur < 1 << 30:  # near-drained: done
                break
            # two consecutive non-shrinking polls = deletion finished
            # (one is not enough: the first poll can race the cleaner
            # before it starts deleting at all)
            stable = stable + 1 if (prev is not None and cur >= prev) else 0
            if stable >= 2:
                break
            prev = cur

    import threading

    def _timed_with_peak(fn) -> tuple[float, int]:
        """Run fn(), sampling blockmgr scratch every 5 s on a daemon
        thread; returns (elapsed_sec, peak_scratch_bytes). The peak is
        the fourth-decade evidence the ledger logs (VERDICT r15 #1:
        shuffle + localCheckpoint disk footprint at scale) — sampling
        granularity means it is a floor, not an exact max. Only the
        fourth-decade tier samples: the walk itself is I/O the other
        tiers' cited timings should not carry (the peak is only
        reported for big runs anyway)."""
        if not big:
            t0 = time.perf_counter()
            fn()
            return time.perf_counter() - t0, 0
        peak = [0]
        stop = threading.Event()

        def _sample() -> None:
            while not stop.is_set():
                try:
                    peak[0] = max(peak[0], _scratch_bytes())
                except Exception:
                    pass
                stop.wait(5.0)

        th = threading.Thread(target=_sample, daemon=True)
        th.start()
        t0 = time.perf_counter()
        try:
            fn()
        finally:
            elapsed = time.perf_counter() - t0
            stop.set()
            th.join(timeout=10)
        peak[0] = max(peak[0], _scratch_bytes())
        return elapsed, peak[0]

    hdr = " ".join(f"{'t_x%d' % m:>9s}" for m in mults)
    print(f"{'query':28s} {hdr} {'alpha':>18s}")
    out = {}
    for name in queries:
        t = {}
        peaks = {}
        for mult in mults:
            QUERIES[name].build(spark, dirs[mult]).collect()  # warm
            release_caches()
            _reclaim_scratch()
            t[mult], peaks[mult] = _timed_with_peak(
                lambda: QUERIES[name].build(spark, dirs[mult]).collect()
            )
            release_caches()
            _reclaim_scratch()
        alphas = [
            math.log(t[b] / t[a]) / math.log(b / a)
            for a, b in zip(mults, mults[1:])
        ]
        cells = " ".join(f"{t[m]:9.2f}" for m in mults)
        astr = " ".join(f"{a:6.2f}" for a in alphas)
        print(f"{name:28s} {cells} {astr}")
        # alpha_1/alpha_2 for the canonical (1,10,100) ladder (the
        # names SURVEY/VERDICT cite); pair-labelled for anything else
        # (--third writes alpha_x100_x300).
        if tuple(mults) == (1, 10, 100) or tuple(mults) == (1, 10):
            akeys = [f"alpha_{i+1}" for i in range(len(alphas))]
        else:
            akeys = [f"alpha_x{a}_x{b}" for a, b in zip(mults, mults[1:])]
        out[name] = {
            **{f"t_x{m}": round(t[m], 4) for m in mults},
            **{k: round(a, 3) for k, a in zip(akeys, alphas)},
            # fourth-decade entries are measured under zstd (ENOSPC
            # mitigation) — not directly comparable to lz4 wall times.
            # scratch_sampled (ADVICE r16): the timed leg carries the
            # 5 s blockmgr os.walk sampler's I/O, which earlier rounds'
            # big-tier wall times did not — disclose it in the entry,
            # not just the docstring, so round-over-round readers see
            # the comparability caveat next to the number.
            **({"codec": "zstd", "scratch_sampled": True} if big else {}),
            # timed-leg blockmgr disk peak (5 s sampling floor): the
            # scratch evidence a fourth-decade entry must carry
            **(
                {
                    "scratch_peak_gb": {
                        f"x{m}": round(peaks[m] / 2**30, 2) for m in mults
                    }
                }
                if big
                else {}
            ),
        }
        if flush is not None:  # persist per-query: a dead JVM mid-run
            flush(out)         # must not lose the finished queries (r10)
    return out


def main() -> None:
    flags = ("--x100", "--fresh", "--heaps", "--third", "--fourth")
    args = [a for a in sys.argv[1:] if a not in flags]
    x100 = "--x100" in sys.argv[1:]
    fresh = "--fresh" in sys.argv[1:]
    heaps = "--heaps" in sys.argv[1:]
    third = "--third" in sys.argv[1:]
    fourth = "--fourth" in sys.argv[1:]
    if fourth:
        default_queries = FOURTH_DECADE
    elif third:
        default_queries = THIRD_DECADE_HEAPS if heaps else THIRD_DECADE
    else:
        default_queries = (
            HEAVY_DOCS
            if heaps
            else (HEAVY + HEAVY_X100_EXTRA if x100 else HEAVY)
        )
    if fresh and (x100 or third or fourth):
        # One subprocess (one JVM) per query: the r11 sweep showed a
        # shared 64g session contaminates later x100 measurements with
        # heap/GC pressure (hashed_tfidf 182 s shared vs 47 s clean).
        # Children merge into BENCHHEAVY_sf10.json one by one, so the
        # artifact is as crash-safe as the shared-session path.
        import subprocess

        for q in args or default_queries:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__),
                 "--fourth" if fourth else ("--third" if third else "--x100"),
                 q]
                + (["--heaps"] if heaps else [])
            )
            if rc != 0:
                print(f"--fresh: {q} exited {rc}; continuing", file=sys.stderr)
        return
    if x100 or third or fourth:
        # x100 is ~sf10 in one local JVM: 32 executor threads sharing
        # the driver heap OOM at the default 8g (first attempted run
        # died in minhash_pairs' shuffle at stage ~625). A real cluster
        # gives each executor its own heap; locally we emulate that by
        # sizing the shared JVM. Env still wins if the caller sets it.
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
        queries = args or default_queries
        base = "/tmp/sfgen/probe100h" if heaps else "/tmp/sfgen/probe100"
        mults = (
            (300, 1000) if fourth else (100, 300) if third else (1, 10, 100)
        )
        dirs = {m: _gen_dir(base, m, heaps) for m in mults}
        import json

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, "BENCHHEAVY_sf10.json")

        if fourth:
            qkey = "queries_fourth_heaps" if heaps else "queries_fourth"
        elif third:
            qkey = "queries_third_heaps" if heaps else "queries_third"
        else:
            qkey = "queries_heaps" if heaps else "queries"
        gen_id = _manifest_stamp(heaps, mults)

        def flush(results: dict) -> None:
            # Merge with any prior run so a restricted rerun (e.g. one
            # query that died last time) extends the artifact instead
            # of clobbering the full map — but only keep prior entries
            # stamped with the SAME full-manifest identity (mode +
            # sizes + seed + generator source — ADVICE r11 #1) and
            # still in the current query family (r11 review: without
            # the stamp, a generator/SIZES change would silently mix
            # two corpora in one committed exponent table). The two
            # generator modes keep separate maps ("queries" =
            # saturated VOCAB, "queries_heaps" = Heaps-law vocab).
            merged, extras = {}, {}
            if os.path.exists(path):
                try:
                    with open(path) as fh:
                        prior = json.load(fh)
                    merged = prior.get(qkey, {})
                    extras = {
                        k: v
                        for k, v in prior.items()
                        if k not in ("sizes", qkey)
                    }
                except Exception:
                    merged = {}
            known = (
                set(FOURTH_DECADE + THIRD_DECADE)
                if fourth or third
                else set(HEAVY) | set(HEAVY_X100_EXTRA)
            )
            merged = {
                k: v
                for k, v in merged.items()
                if v.get("gen") == gen_id and k in known
            }
            merged.update(
                {k: {**v, "gen": gen_id} for k, v in results.items()}
            )
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {**extras,
                     "sizes": {f"x{m}": SIZES[m] for m in (1, 10, 100)},
                     "sizes_third": {f"x{m}": SIZES[m] for m in (100, 300)},
                     "sizes_fourth": {f"x{m}": SIZES[m] for m in (300, 1000)},
                     qkey: merged},
                    fh, indent=1, sort_keys=True,
                )
                fh.write("\n")
            os.replace(tmp, path)

        _run(queries, dirs, mults, flush=flush)
        print(f"wrote {path}")
        return
    queries = args or (HEAVY_DOCS if heaps else HEAVY)
    base = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        dirs = {m: _gen_dir(base, m, heaps) for m in (1, 10)}
        _run(queries, dirs, (1, 10))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
