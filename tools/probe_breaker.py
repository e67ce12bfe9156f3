"""x3000 MinHash band-breaker decision probe (VERDICT r15 #3).

The x1000 fourth-decade run left the breaker's rows=3 margin at 7.8
cands/doc against the 16.0 bound — one escalation step of headroom.
This probe observes the NEXT decision (the rows=4 escalation, the
last untested breaker branch before the rows_max cap) at x3000 =
15M docs on the saturated corpus profile, WITHOUT running the full
pairs pipeline:

- Full-run disk math (why decision-only): the x1000 timed full run
  peaked 46G+ of blockmgr scratch under zstd (SURVEY §8-r15.8), and
  shuffle mass is ~linear in docs once the breaker bounds
  candidates/doc, so x3000 projects ~138G against this container's
  ~78G free — the full timed leg cannot fit, and a streaming-shard
  rewrite would change the measured operator. The arming path alone
  (shingle explode + per-geometry signature passes + bucket
  histograms — map-side-combined aggregates whose shuffles move
  doc-sized rows, never candidate pairs) fits comfortably.
- What it runs: EXACTLY minhash_pairs' arming sequence
  (text/dedup.py:296 builds ex -> sig0 -> _auto_band_rows) with the
  registry geometry (n=3, bands=16, rows=2, rows_max=4,
  max_cand_per_doc=16.0), capturing every breaker decision line.
- Corpus: the scale_probe saturated generator profile at 3x the
  x1000 sizes, written CHUNKED (15M docs x ~270 chars is ~4 GB of
  string data — a single pa.array would overflow 32-bit offsets).

Writes a ``breaker_x3000`` entry into BENCHHEAVY_sf10.json.
Usage:  python tools/probe_breaker.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import VOCAB, _GEN_SEED  # noqa: E402

N_DOCS = 15_000_000
BASE = "/tmp/sfgen/probe100/x3000breaker"
CHUNK = 1_000_000


def gen_documents_chunked(path: str, n_docs: int) -> None:
    """scale_probe.gen_documents' per-doc logic (spans pool, 0.2%
    exact dups against full history, 30% planted 6-token spans, 40-68
    tokens over the 31-word vocab), streamed through a ParquetWriter
    in 1M-doc chunks so no single Arrow string array crosses the 2 GB
    offset limit. SAME-DISTRIBUTION, not same-stream: the per-chunk
    lang/source draws interleave with the text draws, so from chunk 2
    onward the rng stream diverges from what gen_documents(seed)
    would produce — do not expect byte-identical prefixes against an
    unchunked run (r16 self-review).

    Driver RSS is bounded (ADVICE r16): the 0.2% exact-dup draws
    sample from a 200k-text reservoir (Algorithm R over the full
    history), not from a full in-memory history list — keeping every
    generated text for 15M docs is ~5+ GB of Python strings and can
    OOM hosts smaller than the 64g assumption. A uniform reservoir is
    statistically equivalent for the breaker's purpose (it preserves
    the 0.2% dup MASS and the uniform-over-history draw law; dup
    chains still occur because dup copies re-enter the reservoir).
    The r16 breaker_x3000 artifact was generated with the full-history
    variant — same distribution, different rng consumption."""
    rng = np.random.default_rng(_GEN_SEED)
    RESERVOIR = 200_000
    spans = [
        list(rng.choice(VOCAB, size=6)) for _ in range(max(20, n_docs // 250))
    ]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    reservoir: list[str] = []
    seen = 0
    writer = pq.ParquetWriter(path, schema)
    t0 = time.time()
    try:
        for start in range(0, n_docs, CHUNK):
            stop = min(start + CHUNK, n_docs)
            chunk_texts: list[str] = []
            for _ in range(start, stop):
                if reservoir and rng.random() < 0.002:
                    text = reservoir[rng.integers(0, len(reservoir))]
                else:
                    toks = list(
                        rng.choice(VOCAB, size=int(rng.integers(40, 69)))
                    )
                    if rng.random() < 0.3:
                        span = spans[rng.integers(0, len(spans))]
                        pos = int(rng.integers(0, max(1, len(toks) - 6)))
                        toks[pos : pos + 6] = span
                    text = " ".join(toks)
                chunk_texts.append(text)
                # Algorithm R: every doc (dups included, preserving dup
                # chains) is reservoir-eligible with probability R/seen.
                seen += 1
                if len(reservoir) < RESERVOIR:
                    reservoir.append(text)
                else:
                    j = int(rng.integers(0, seen))
                    if j < RESERVOIR:
                        reservoir[j] = text
            langs = rng.choice(
                ["en", "de", "fr", "es", "pt"], size=stop - start
            )
            sources = rng.choice(
                [f"src{i}" for i in range(20)], size=stop - start
            )
            writer.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(range(start, stop), pa.int64()),
                        "text": pa.array(chunk_texts),
                        "lang": pa.array(langs.tolist()),
                        "source": pa.array(sources.tolist()),
                        "n_chars": pa.array(
                            [len(t) for t in chunk_texts], pa.int64()
                        ),
                    },
                    schema=schema,
                )
            )
            print(
                f"# gen: {stop}/{n_docs} docs ({time.time() - t0:.0f}s)",
                file=sys.stderr,
            )
    finally:
        writer.close()


class _Tee(io.TextIOBase):
    """stderr tee capturing the breaker's decision lines."""

    def __init__(self, inner):
        self.inner = inner
        self.lines: list[str] = []
        self._buf = ""

    def write(self, s: str) -> int:
        self._buf += s
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line.startswith("# minhash breaker"):
                self.lines.append(line)
        return self.inner.write(s)

    def flush(self) -> None:
        self.inner.flush()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    os.makedirs(BASE, exist_ok=True)
    docs_path = os.path.join(BASE, "documents.parquet")
    manifest_path = os.path.join(BASE, "manifest.json")
    want = {
        "mode": "saturated-chunked",
        "n_docs": N_DOCS,
        "seed": _GEN_SEED,
        "chunk": CHUNK,
    }
    have = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            have = json.load(fh)
    if have != want or not os.path.exists(docs_path):
        print(f"# generating {N_DOCS} docs at {docs_path}", file=sys.stderr)
        gen_documents_chunked(docs_path, N_DOCS)
        with open(manifest_path, "w") as fh:
            json.dump(want, fh)
    else:
        print(f"# reusing {docs_path} (manifest match)", file=sys.stderr)

    from pyspark.sql import functions as F

    from energydatalake_spark import release_caches
    from energydatalake_spark.io.readers import read_table
    from energydatalake_spark.session import get_spark
    from energydatalake_spark.text import dedup as D
    from energydatalake_spark.text.stats import _hex15_to_long

    spark = get_spark(
        "probe_breaker",
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    docs = read_table(spark, BASE, "documents")

    # minhash_pairs' arming sequence verbatim (text/dedup.py:296):
    # persisted 16-byte shingle explode, starting-geometry signatures,
    # then the breaker decides.
    md = F.md5(F.col("shingle"))
    ex = D._persist_shingles(
        D._exploded_shingles(docs, "text", "doc_id", 3).select(
            F.col("doc_id"),
            D._hash_long(md).alias("h0"),
            _hex15_to_long(md).alias("sh"),
        )
    )
    from pyspark.storagelevel import StorageLevel

    sig0 = (
        ex.groupBy("doc_id")
        .agg(*D._minhash_sig_cols(16 * 2), F.count(F.lit(1)).alias("n_shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    D._SHINGLE_CACHE.append(sig0)

    tee = _Tee(sys.stderr)
    sys.stderr = tee
    t0 = time.perf_counter()
    try:
        chosen = D._auto_band_rows(
            ex, "doc_id", 16, 2, 4, 16.0, first_sig=sig0
        )
    finally:
        sys.stderr = tee.inner
    arming_sec = time.perf_counter() - t0

    # Footprint while the persisted explode + signatures are still
    # resident — the arming path's disk high-water mark (modulo
    # already-cleaned intermediate shuffles), measured BEFORE release.
    # Scratch roots resolved like scale_probe (r16 self-review: a
    # hardcoded /tmp reads 0 bytes under a nondefault spark.local.dir
    # and silently weakens the disk-math evidence this entry carries).
    import glob as _glob
    import tempfile as _tempfile

    roots = [
        p for p in os.environ.get("SPARK_LOCAL_DIRS", "").split(",")
        if p.strip()
    ]
    try:
        roots.append(spark.conf.get("spark.local.dir"))
    except Exception:
        pass
    roots = [r.strip() for r in roots if r and r.strip()] or [
        _tempfile.gettempdir()
    ]
    peak = 0
    for d in (
        g
        for root_dir in dict.fromkeys(roots)
        for g in _glob.glob(os.path.join(root_dir, "blockmgr-*"))
    ):
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    peak += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    release_caches()

    entry = {
        "mode": (
            "decision-only: minhash_pairs' arming path (explode + "
            "per-geometry signature passes + bucket histograms); the "
            "full pairs pipeline is NOT run"
        ),
        "n_docs": N_DOCS,
        "geometry": {"n": 3, "bands": 16, "rows_start": 2, "rows_max": 4,
                     "max_cand_per_doc": 16.0},
        "chosen_rows": chosen,
        "breaker_log": tee.lines,
        "arming_sec": round(arming_sec, 1),
        "scratch_after_arming_gb": round(peak / 2**30, 2),
        "codec": "zstd",
        "full_run_refusal": (
            "x1000 timed full run peaked 46G+ blockmgr scratch under "
            "zstd (ledger r15.8); shuffle mass is ~linear in docs at "
            "breaker-bounded candidates/doc, so x3000 projects ~138G "
            "against this container's ~78G free — the full timed leg "
            "cannot fit without changing the measured operator "
            "(streaming shards). Decision-only is the honest ceiling."
        ),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCHHEAVY_sf10.json")
    with open(path) as fh:
        data = json.load(fh)
    data["breaker_x3000"] = entry
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
