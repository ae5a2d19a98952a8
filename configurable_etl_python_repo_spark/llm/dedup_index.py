"""Incremental cross-corpus near-duplicate detection: a PERSISTED
MinHash-LSH signature index and a probe that deduplicates a new batch
against it without recomputing the old corpus.

The production shape of dedup at 100 TB is not "dedup the corpus once";
it is "dedup TODAY'S batch against YESTERDAY'S corpus, every day". The
one-shot operators (minhash_lsh_pairs) recompute every signature on
every run — a daily ingest would re-shingle 100 TB to admit 100 GB.
This module is the write-side dual, mirroring the IVF index pattern
(similarity.py ivf_build_index/ivf_search_index):

- ``minhash_build_index`` runs the fused signature aggregate ONCE and
  persists two relations under ``path``: the LSH band buckets
  (id, band, key), physically partitioned by a md5-derived bucket of
  (band, key) so a probe can PARTITION-PRUNE its scan, and the per-doc
  shingle arrays the exact-Jaccard verify step needs. Hash parameters
  are stored alongside so a probe can never run with a mismatched
  family.
- ``dedup_against_index`` computes signatures for the NEW batch only,
  collects its <= key_buckets distinct partition values (a constant-
  bounded driver list, the ivf_search_index probe trick), scans only
  those bucket partitions, joins on (band, key), and verifies
  candidates with the same integer-math Jaccard as the one-shot path.
  Probe cost scales with the BATCH, not the corpus: the corpus is
  touched only through the pruned bucket partitions and the candidate
  ids' array rows.
- ``minhash_extend_index`` appends the batch's signatures after
  admission, so tomorrow's probe sees today's docs — the daily
  roll-forward.

Because build and probe share minhash_sigarr (dedup.py) — the same
md5-derived hash family, gram stream, and band keys — the probe's
verified pairs are BIT-EQUAL to the cross-corpus subset of
minhash_lsh_pairs on the union (pinned in tests), and the whole
pipeline replays in ANSI SQL for the oracle gate.

Reference parity: the reference has no persisted state between runs at
all (/root/reference/Configurable_ETL_Python.py re-reads every source
per execution); this is part of the LLM-curation extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _jaccard_from_arrays,
    _scope_cache,
    explode_band_keys,
    minhash_sigarr,
)

#: default physical partition count for the bucket store — small enough
#: that a tiny probe prunes to a few directories, large enough that one
#: partition of a 100 TB corpus's buckets stays executor-sized
_DEFAULT_KEY_BUCKETS = 64

#: physical-layout version stamped into _meta: probe/extend REFUSE a
#: tree written under a different layout instead of mis-reading it (an
#: extend appending a new layout into an old tree would corrupt the
#: store — 'Conflicting directory structures' on the next read)
_LAYOUT = "kb-ab-v1"


def _kb_col(key_buckets: int):
    """md5-derived physical partition of an LSH (band, key) bucket —
    deterministic, so the build side and every later probe/extend
    agree on the layout without coordination."""
    from .sampling import md5_mod

    return md5_mod(
        F.concat_ws("#", F.col("band").cast("string"), F.col("key")),
        key_buckets,
    ).alias("kb")


def _ab_col(id_expr, buckets: int):
    """md5-derived physical partition of the arrays store BY DOC ID, so
    the verify step can prune its scan to the candidate ids' buckets —
    without this the probe's verify full-scanned the corpus-sized
    shingle arrays and broke the batch-scaling contract."""
    from .sampling import md5_mod

    return md5_mod(id_expr.cast("string"), buckets).alias("ab")


def _read_meta(spark: SparkSession, path: str, expected_layout: str = None):
    from ._store import read_meta

    return read_meta(
        spark, path, expected_layout or _LAYOUT, kind="signature index"
    )


def _batch_buckets(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    meta,
) -> "tuple[DataFrame, DataFrame]":
    """(cached signature relation, bucket rows) for a batch under the
    index's stored hash parameters."""
    sig = _scope_cache(
        minhash_sigarr(
            batch, id_col, text_col, int(meta.n),
            int(meta.bands) * int(meta.rows_per_band),
        )
    )
    buckets = explode_band_keys(
        sig, int(meta.bands), int(meta.rows_per_band)
    ).withColumn("kb", _kb_col(int(meta.key_buckets)))
    return sig, buckets


def minhash_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    key_buckets: int = _DEFAULT_KEY_BUCKETS,
) -> None:
    """WRITE-SIDE MinHash-LSH index: one pass over the corpus persists
    everything a future probe needs under ``path``:

    - ``buckets/`` — (id, band, key) LSH bucket rows, physically
      partitioned by kb = md5(band#key) % key_buckets. The probe prunes
      to its own kb set at the file listing, so un-probed partitions
      cost zero I/O (the ivf_build_index property).
    - ``arrays/`` — (id, arr) distinct shingle arrays for the exact-
      Jaccard verify of candidates (bounded by document length per
      row), physically partitioned by ab = md5(id) % key_buckets so
      the verify scan prunes to the candidate ids' buckets.
    - ``_meta/`` — the hash-family parameters (n, bands, rows_per_band,
      key_buckets), read back by probe/extend so a family mismatch is
      structurally impossible.

    Build cost equals the one-shot minhash_lsh_pairs signature pass
    (shared minhash_sigarr aggregate); every subsequent daily probe
    amortizes it."""
    if key_buckets < 1:
        raise ValueError(f"key_buckets must be >= 1, got {key_buckets}")
    sig = _scope_cache(
        minhash_sigarr(corpus, id_col, text_col, n, bands * rows_per_band)
    )
    buckets = explode_band_keys(sig, bands, rows_per_band).withColumn(
        "kb", _kb_col(key_buckets)
    )
    # repartition on the partition column BEFORE partitionBy: without
    # it every shuffle task writes a sliver into every kb directory
    # (tasks x key_buckets small files — measured dominating the build
    # at sf0.1); aligned writers emit ~one file per directory
    buckets.repartition("kb").write.mode("overwrite").partitionBy(
        "kb"
    ).parquet(path + "/buckets")
    sig.select(
        "id", "arr", _ab_col(F.col("id"), key_buckets)
    ).repartition("ab").write.mode("overwrite").partitionBy(
        "ab"
    ).parquet(path + "/arrays")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(n, bands, rows_per_band, key_buckets, _LAYOUT)],
        "n int, bands int, rows_per_band int, key_buckets int, "
        "layout string",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/_meta")


def minhash_extend_index(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Roll the index forward: append the batch's bucket rows and
    shingle arrays under the index's OWN stored hash parameters (read
    from _meta — callers cannot desynchronize the family). Appended
    bucket rows land in the same kb partition directories, so pruning
    and probe semantics are identical to a fresh full build — pinned in
    tests as probe(index(A) extended with B) == probe(index(A ∪ B)).

    The caller decides WHAT to append (typically the admitted subset of
    the batch, after dropping near-dups the probe found). NOT atomic on
    failure (see llm/_store.py's durability contract): rebuild on a
    partial extend."""
    spark = batch.sparkSession
    meta = _read_meta(spark, path)
    sig, buckets = _batch_buckets(batch, id_col, text_col, meta)
    buckets.repartition("kb").write.mode("append").partitionBy(
        "kb"
    ).parquet(path + "/buckets")
    sig.select(
        "id", "arr", _ab_col(F.col("id"), int(meta.key_buckets))
    ).repartition("ab").write.mode("append").partitionBy(
        "ab"
    ).parquet(path + "/arrays")


def dedup_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Probe a persisted MinHash index with a NEW batch: near-duplicate
    (batch doc, indexed doc) pairs without recomputing any corpus
    signature.

    Output: (id_a, id_b[, inter, size_a, size_b]) where id_a is the
    BATCH doc and id_b the INDEXED doc — cross-corpus pairs only (the
    two id namespaces are independent; an id present on both sides is
    reported like any other match, which is what a re-ingest wants).
    Batch-internal duplicates are a one-shot minhash_lsh_pairs over the
    batch alone — a batch-sized job, not this one.

    Plan shape, 100 TB posture: the batch pays one signature aggregate
    (batch-sized). Its distinct kb values — at most key_buckets, a
    constant — are collected driver-side and pushed as a partition
    filter on the bucket store, so the corpus-side scan lists only the
    probed directories and reads (id, band, key) rows, never text. The
    (band, key) equi-join's batch side is batch-sized (AQE broadcasts a
    small morning batch); the verify scan of the stored arrays prunes
    to the candidate ids' ab partitions (a second constant-bounded
    probe set), so corpus array rows are read only from directories
    that can hold a matched doc. With verify=True the output is exactly
    {LSH candidates} ∩ {jaccard >= threshold}, same integer math as the
    one-shot path."""
    meta = _read_meta(spark, path)
    sig, b_buckets = _batch_buckets(batch, id_col, text_col, meta)
    # constant-bounded probe set (<= key_buckets values): the only
    # driver-side materialization in the pipeline, same trick as
    # ivf_search_index's probed-centroid list
    probed = sorted(
        r[0] for r in b_buckets.select("kb").distinct().collect()
    )
    idx = (
        spark.read.parquet(path + "/buckets")
        .where(F.col("kb").isin(probed))
        .withColumnsRenamed({"id": "__idx_id"})
    )
    cand = (
        idx.join(
            b_buckets.withColumnsRenamed({"id": "__batch_id"}),
            ["band", "key"],
        )
        .select(
            F.col("__batch_id").alias("id_a"),
            F.col("__idx_id").alias("id_b"),
        )
        .distinct()
    )
    if not verify:
        return cand
    # the candidate set feeds two consumers (the ab probe-set collect
    # and the verify join) — scope-cache it so the bucket join runs once
    cand = _scope_cache(cand)
    # second constant-bounded probe set: the candidates' index ids map
    # to <= key_buckets array partitions, so the verify scan reads only
    # the directories that can hold a matched doc's shingles — without
    # this the verify full-scanned the corpus-sized arrays store and
    # broke the "probe cost scales with the batch" contract
    ab = _ab_col(F.col("id_b"), int(meta.key_buckets))
    probed_ab = sorted(
        r[0] for r in cand.select(ab).distinct().collect()
    )
    idx_arrays = (
        spark.read.parquet(path + "/arrays")
        .where(F.col("ab").isin(probed_ab))
        .select("id", "arr")
    )
    return _jaccard_from_arrays(
        cand, sig.select("id", "arr"), threshold, arrays_b=idx_arrays
    )


# ---------------------------------------------------------------------------
# SimHash incremental index (the hamming-metric dual of the MinHash index)
# ---------------------------------------------------------------------------

#: SimHash store layout version (bands/ partitioned by kb, fingerprint
#: halves denormalized onto every band row)
_SH_LAYOUT = "sh-kb-v1"


def simhash_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    key_buckets: int = _DEFAULT_KEY_BUCKETS,
) -> None:
    """WRITE-SIDE SimHash index: one fingerprint pass persists the
    Manku pigeonhole band rows (id, sh_hi, sh_lo, band, key) under
    ``path``/bands, physically partitioned by kb = md5(band#key) %
    key_buckets — the MinHash index's layout applied to the hamming
    metric. The fingerprint halves ride every band row, so a probe
    verifies hamming INSIDE the band join and needs no second store
    (no arrays/ dual here). ``_meta`` pins (max_hamming, key_buckets,
    layout); max_hamming is a BUILD-time parameter because it fixes
    the band count — probing at a larger k than the index was built
    for would miss pairs, so the probe reads k from the index."""
    from .dedup import simhash64, simhash_band_rows

    if key_buckets < 1:
        raise ValueError(f"key_buckets must be >= 1, got {key_buckets}")
    if not (0 <= max_hamming <= 15):
        raise ValueError(
            f"max_hamming must be in [0, 15], got {max_hamming}"
        )
    fp = simhash64(corpus, id_col, text_col)
    rows = simhash_band_rows(fp, max_hamming).withColumn(
        "kb", _kb_col(key_buckets)
    )
    rows.repartition("kb").write.mode("overwrite").partitionBy(
        "kb"
    ).parquet(path + "/bands")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(max_hamming, key_buckets, _SH_LAYOUT)],
        "max_hamming int, key_buckets int, layout string",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/_meta")


def simhash_extend_index(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Roll the SimHash index forward: append the batch's band rows
    under the index's OWN stored (max_hamming, key_buckets) — pinned in
    tests as probe(index(A) extended with B) == probe(index(A ∪ B)). NOT atomic on
    failure (see llm/_store.py's durability contract): rebuild on a
    partial extend."""
    from .dedup import simhash64, simhash_band_rows

    spark = batch.sparkSession
    meta = _read_meta(spark, path, _SH_LAYOUT)
    fp = simhash64(batch, id_col, text_col)
    rows = simhash_band_rows(fp, int(meta.max_hamming)).withColumn(
        "kb", _kb_col(int(meta.key_buckets))
    )
    rows.repartition("kb").write.mode("append").partitionBy(
        "kb"
    ).parquet(path + "/bands")


def simhash_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe a persisted SimHash index with a NEW batch: (batch doc,
    indexed doc) pairs within the index's max_hamming — EXACT for the
    fingerprint metric (pigeonhole bound) and bit-equal to the
    cross-side subset of the one-shot simhash_pairs on the union
    (pytest-pinned; shared simhash64 + band machinery).

    Plan shape: the batch pays one fingerprint aggregate; its <=
    key_buckets distinct kb values prune the band-store scan at the
    file listing; the hamming verify runs INSIDE the (band, key)
    equi-join on the denormalized fingerprint halves — the corpus text
    and fingerprints are never recomputed, and no second store is
    touched. Output: (id_a batch, id_b index, hamming)."""
    from .dedup import simhash64, simhash_band_rows, simhash_distance

    meta = _read_meta(spark, path, _SH_LAYOUT)
    k = int(meta.max_hamming)
    fp = _scope_cache(simhash64(batch, id_col, text_col))
    b_rows = simhash_band_rows(fp, k).withColumn(
        "kb", _kb_col(int(meta.key_buckets))
    )
    probed = sorted(
        r[0] for r in b_rows.select("kb").distinct().collect()
    )
    idx = (
        spark.read.parquet(path + "/bands")
        .where(F.col("kb").isin(probed))
        .select("id", "sh_hi", "sh_lo", "band", "key")
    )
    dist = simhash_distance("a", "b")
    a = b_rows.alias("a")
    b = idx.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (dist <= k),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("long").alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding (cosine) incremental index — the vector-metric member of the
# family: MinHash = shingle Jaccard, SimHash = hamming, this = cosine.
# ---------------------------------------------------------------------------

#: embedding store layout version (vectors/ partitioned by IVF centroid id,
#: centroid table + params alongside)
_EMB_LAYOUT = "emb-cid-v1"


def embedding_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
) -> None:
    """WRITE-SIDE embedding index for incremental SEMANTIC dedup: assign
    every corpus vector to its nearest hash-order-sample centroid
    (similarity.ivf_build_index's coarse quantizer — same deterministic
    init, same 6dp/smaller-cid tiebreak the SQL oracles replay) and
    persist under ``path``:

    - ``vectors/`` — (id, vec) rows physically partitioned by cid, so a
      probe's n_probe lists prune at the file listing (the IVF property:
      un-probed lists cost zero I/O).
    - ``_centroids/`` — the coarse quantizer itself (<= n_centroids rows).
    - ``_meta/`` — (n_centroids, layout); probe/extend REFUSE a tree
      with a different layout instead of mis-reading it.

    Vectors are stored as array<double> (exact float->double widening)
    so extend-appended batches can never fork the store's schema.

    Like FAISS's IVF `add`, extending does NOT retrain the quantizer:
    the centroid sample is fixed at build time, which is what makes a
    probe against an extended index bit-equal to a probe against a
    fresh build over the union UNDER THE SAME CENTROIDS (pinned in
    tests). Rebuild when the corpus distribution drifts.

    SCALE POLICY (the d11/SemDeDup rule): size n_centroids WITH the
    corpus — n_centroids ~ N / target_list_size — so per-list size
    stays constant; a PINNED n_centroids makes every probe score
    batch x N/n_centroids pairs, quadratic as both sides grow
    (measured at sf1: pinned-8 probe exponent 0.85 vs 0.04 under the
    policy, BENCH_sf1_r08.json). The catalog fixture pins 8 only to
    share the n3 oracle's centroid math.

    Reference parity: the reference persists no state between runs
    (/root/reference/Configurable_ETL_Python.py re-reads every source per
    execution); extension surface, same rationale as the MinHash index."""
    from .similarity import _hash_order_sample, ivf_assignments_arrow

    if n_centroids < 1:
        raise ValueError(f"n_centroids must be >= 1, got {n_centroids}")
    cents = _hash_order_sample(corpus, n_centroids, id_col, vec_col)
    assign1 = ivf_assignments_arrow(cents, n_best=1)
    rows = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("vec"),
    ).withColumn("cid", assign1(F.col("vec"))[0])
    # repartition on the partition column BEFORE partitionBy (the
    # MinHash-index lesson: unaligned writers emit tasks x lists files)
    rows.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(path + "/vectors")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "cid long, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/_centroids")
    spark.createDataFrame(
        [(len(cents), _EMB_LAYOUT)], "n_centroids int, layout string"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/_meta")


def _stored_centroids(spark: SparkSession, path: str):
    rows = spark.read.parquet(path + "/_centroids").collect()
    return sorted((int(r.cid), list(r.cvec)) for r in rows)


def embedding_extend_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Roll the embedding index forward: assign the batch under the
    index's OWN stored centroids (read back — callers cannot
    desynchronize the quantizer) and append into the same cid partition
    directories. Pruning and probe semantics after an extend are
    identical to a fresh build over the union with the original
    centroid sample (pytest-pinned). NOT atomic on
    failure (see llm/_store.py's durability contract): rebuild on a
    partial extend."""
    from .similarity import ivf_assignments_arrow

    spark = batch.sparkSession
    _read_meta(spark, path, _EMB_LAYOUT)
    cents = _stored_centroids(spark, path)
    assign1 = ivf_assignments_arrow(cents, n_best=1)
    rows = batch.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("vec"),
    ).withColumn("cid", assign1(F.col("vec"))[0])
    rows.repartition("cid").write.mode("append").partitionBy(
        "cid"
    ).parquet(path + "/vectors")


def embedding_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_probe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Probe a persisted embedding index with a NEW batch: (batch vec,
    indexed vec) pairs with cosine >= threshold, without recomputing
    any corpus-side state — incremental SemDeDup's candidate step, the
    operation a daily multimodal/embedding ingest runs against
    yesterday's corpus.

    Output: (id_a, id_b, sim) where id_a is the BATCH vector and id_b
    the INDEXED one; sim is the exact cosine rounded to round_digits
    (the threshold compares against the rounded value, so the set is
    engine-portable). Recall is the IVF trade: a pair is found iff the
    indexed vector's list is among the batch vector's n_probe nearest
    lists — EXACT duplicates are always found at any n_probe >= 1
    (identical vectors share a top-1 list under the shared
    deterministic tiebreak); n_probe = n_centroids is exhaustive and
    equals the brute-force cross join (pytest-pinned).

    Plan shape, 100 TB posture: the batch pays one Arrow quantizer pass
    (batch-sized; the centroid table is a constant-bounded driver
    list). Its distinct probed cids — at most n_centroids, a constant —
    prune the vectors/ scan at the file listing. The cid equi-join's
    batch side is batch-sized (AQE broadcasts a small morning batch and
    skew-splits a hot list); norms are computed once per vector before
    the join, and each (batch, indexed) pair is scored exactly once
    (an indexed vector lives in exactly ONE list, so no post-join
    distinct is needed)."""
    from .similarity import _sim, _with_norm, ivf_assignments_arrow

    _read_meta(spark, path, _EMB_LAYOUT)
    cents = _stored_centroids(spark, path)
    if not (1 <= n_probe <= len(cents)):
        raise ValueError(
            f"n_probe must be in [1, {len(cents)}], got {n_probe}"
        )
    probe = ivf_assignments_arrow(cents, n_best=n_probe)
    q = batch.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("qv"),
        F.explode(probe(F.col(vec_col))).alias("cid"),
    )
    q = _scope_cache(q)
    # constant-bounded probe set (<= n_centroids values): the only
    # data-dependent driver materialization, same trick as the MinHash
    # probe's kb list
    probed = sorted(
        int(r[0]) for r in q.select("cid").distinct().collect()
    )
    stored = (
        spark.read.parquet(path + "/vectors")
        .where(F.col("cid").isin(probed))
        .select("cid", F.col("id").alias("id_b"), F.col("vec").alias("cv"))
    )
    c = _with_norm(stored, "cv", "nc")
    qn = _with_norm(q, "qv", "nq")
    return (
        c.join(qn, "cid")
        .withColumn(
            "sim",
            _sim(F.col("qv"), F.col("cv"), F.col("nq"), F.col("nc"),
                 round_digits),
        )
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
