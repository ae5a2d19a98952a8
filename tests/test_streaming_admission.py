"""Streaming incremental-dedup admission (streaming/admission.py):
availableNow stream == sequential batch admissions, epoch tags make
at-least-once redelivery exactly-once (no double-admit, no
double-extend), and every crash point inside the epoch body is safe."""

import glob

import pytest
from pyspark.sql import functions as F

import configurable_etl_python_repo_spark.llm._store as ST
from configurable_etl_python_repo_spark.llm.dedup_index import (
    minhash_build_index,
)
from configurable_etl_python_repo_spark.streaming.admission import (
    admission_batch,
    admit_against_index,
    start_index_admission,
)

_LSH = dict(n=3, bands=4, rows_per_band=2)
_T = 0.2


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )


def _fixture(spark, sf_dir):
    """corpus = even ids (indexed); two ingest epochs:
    e1 = ids % 4 == 1 plus replicas of % 10 == 0 evens (cross-corpus
    dups -> must be REJECTED); e2 = ids % 4 == 3 plus replicas of e1's
    % 20 == 1 docs under another namespace (dups of EPOCH-1 ADMISSIONS
    -> must be rejected only because e1's admitted docs were extended
    into the index: the sequential-extend semantics)."""
    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    e1 = docs.where(F.col("doc_id") % 4 == 1).unionByName(
        docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    e2 = docs.where(F.col("doc_id") % 4 == 3).unionByName(
        docs.where(F.col("doc_id") % 20 == 1).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
    )
    return corpus, e1, e2


def _run_sequential(spark, corpus, epochs, idx, out):
    minhash_build_index(corpus, idx, **_LSH)
    for i, e in enumerate(epochs):
        admission_batch(e, i, idx, out, threshold=_T)
    return {
        (r.doc_id, r.epoch)
        for r in spark.read.parquet(out).select("doc_id", "epoch")
        .collect()
    }


def test_two_epoch_sequential_admission_semantics(
    spark, sf_dir, tmp_path
):
    """Epoch 2 probes an index ALREADY extended with epoch 1's
    admissions: replicas of corpus docs are rejected in epoch 1,
    replicas of epoch-1 admissions are rejected in epoch 2."""
    corpus, e1, e2 = _fixture(spark, sf_dir)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    got = _run_sequential(spark, corpus, [e1, e2], idx, out)

    # corpus replicas (1000000-namespace) all rejected in epoch 1
    assert not {d for d, ep in got if d >= 1000000 and d < 2000000}
    # epoch-2 replicas of epoch-1 docs (2000000-namespace) all rejected
    # — ONLY possible because e1's admissions were extended in between
    assert not {d for d, ep in got if d >= 2000000}
    # non-duplicate docs flow through with their epoch stamp
    e1_clean = {r.doc_id for r in e1.where(
        (F.col("doc_id") % 4 == 1)).collect()}
    admitted1 = {d for d, ep in got if ep == 0}
    assert admitted1 <= e1_clean and len(admitted1) > 0
    # every admitted doc is in the index now: re-admitting epoch 1
    # under a new epoch id admits NOTHING
    again = admission_batch(e1, 7, idx, out, threshold=_T)
    assert again is not None and again.count() == 0


def test_stream_equals_sequential_batches(spark, sf_dir, tmp_path):
    """availableNow + maxFilesPerTrigger=1 over two epoch files ==
    the sequential admission_batch loop, bit-for-bit (modulo the
    epoch column: the stream numbers epochs by micro-batch id)."""
    corpus, e1, e2 = _fixture(spark, sf_dir)

    seq_idx, seq_out = str(tmp_path / "sidx"), str(tmp_path / "sout")
    want = _run_sequential(spark, corpus, [e1, e2], seq_idx, seq_out)

    src = str(tmp_path / "src")
    # one file per epoch, named so the file source discovers e1 first
    e1.coalesce(1).write.parquet(src + "/batch=0")
    e2.coalesce(1).write.parquet(src + "/batch=1")
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    minhash_build_index(corpus, idx, **_LSH)
    q = start_index_admission(
        spark, src + "/batch=*", e1.schema, idx, out,
        checkpoint=str(tmp_path / "ckpt"), threshold=_T,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got = {
        (r.doc_id, r.epoch)
        for r in spark.read.parquet(out).select("doc_id", "epoch")
        .collect()
    }
    assert {d for d, _ in got} == {d for d, _ in want}
    assert got == want  # file order == epoch order on this source
    # index state converged too: probing either index with a replica
    # of an admitted doc matches identically
    probe = e1.limit(5).select(
        (F.col("doc_id") + 9000000).alias("doc_id"), "text"
    )
    a = {r.doc_id for r in admit_against_index(
        spark, idx, probe, threshold=_T).collect()}
    b = {r.doc_id for r in admit_against_index(
        spark, seq_idx, probe, threshold=_T).collect()}
    assert a == b


def _text_index(family, corpus, idx):
    """Build the text-modality index of the given admission family —
    the crash/retry/idempotence trio runs identically over both
    (same composition, different probe/extend adapters)."""
    if family == "minhash":
        minhash_build_index(corpus, idx, **_LSH)
        return dict(threshold=_T)
    from configurable_etl_python_repo_spark.llm.dedup_index import (
        simhash_build_index,
    )

    simhash_build_index(corpus, idx, max_hamming=3)
    return dict(family="simhash")


@pytest.mark.parametrize("family", ["minhash", "simhash"])
def test_epoch_retry_after_commit_is_full_noop(
    spark, sf_dir, tmp_path, family
):
    """At-least-once redelivery of a COMMITTED epoch: the tag check
    short-circuits the whole body — no probe, no output rewrite, no
    second segment; output and index byte-stable."""
    corpus, e1, _ = _fixture(spark, sf_dir)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    kw = _text_index(family, corpus, idx)
    first = admission_batch(e1, 0, idx, out, **kw)
    assert first is not None
    v1, man1 = ST.read_manifest(idx)
    files1 = sorted(glob.glob(out + "/epoch=0/*.parquet"))

    assert admission_batch(e1, 0, idx, out, **kw) is None
    assert ST.read_manifest(idx) == (v1, man1)  # no double-extend
    assert sorted(glob.glob(out + "/epoch=0/*.parquet")) == files1
    rows = spark.read.parquet(out).groupBy("doc_id").count()
    assert rows.where(F.col("count") > 1).count() == 0  # no dup docs


class _Crash(RuntimeError):
    pass


@pytest.mark.parametrize("family", ["minhash", "simhash"])
def test_crash_between_output_and_extend_then_retry(
    spark, sf_dir, tmp_path, monkeypatch, family
):
    """The dangerous crash point: output written, extend not
    committed. The retry re-probes the unchanged index, overwrites the
    same partition (no double rows), and commits exactly one
    segment."""
    corpus, e1, e2 = _fixture(spark, sf_dir)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    kw = _text_index(family, corpus, idx)

    real = ST.commit_extend
    monkeypatch.setattr(
        ST, "commit_extend",
        lambda *a, **k: (_ for _ in ()).throw(_Crash()),
    )
    with pytest.raises(_Crash):
        admission_batch(e1, 0, idx, out, **kw)
    # output partition exists (it precedes the extend), index unchanged
    assert glob.glob(out + "/epoch=0/*.parquet")
    assert len(ST.read_manifest(idx)[1]["segments"]) == 1
    monkeypatch.setattr(ST, "commit_extend", real)

    retried = admission_batch(e1, 0, idx, out, **kw)
    assert retried is not None
    _, man = ST.read_manifest(idx)
    assert len(man["segments"]) == 2  # build + exactly ONE extend
    assert man["tags"] == {"admit-0": man["segments"][-1]}
    rows = spark.read.parquet(out).groupBy("doc_id").count()
    assert rows.where(F.col("count") > 1).count() == 0
    # and the next epoch sees epoch 1's admissions exactly once
    admission_batch(e2, 1, idx, out, **kw)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert not {d for d in got if d >= 2000000}


def test_admit_config_op_matches_library(spark, sf_dir, tmp_path):
    """ADMIT AGAINST INDEX as a config op == the library transform
    (same function body); chains with MINHASH EXTEND INDEX."""
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    corpus, e1, _ = _fixture(spark, sf_dir)
    idx = str(tmp_path / "idx")
    minhash_build_index(corpus, idx, **_LSH)
    want = {r.doc_id for r in admit_against_index(
        spark, idx, e1, threshold=_T).collect()}

    eng = Engine(spark)
    eng.bind("batch", e1)
    out = eng.run_op(OpSpec(
        "ADMIT AGAINST INDEX", "adm", ["batch"],
        {"path": idx, "threshold": _T, "id_column": "doc_id",
         "text_column": "text"}))
    assert {r.doc_id for r in out.collect()} == want
    with pytest.raises(ValueError, match="path"):
        eng.run_op(OpSpec("ADMIT AGAINST INDEX", "bad", ["batch"], {}))


def test_new_stream_incarnation_does_not_collide_with_old_tags(
    spark, sf_dir, tmp_path
):
    """Epoch ids restart at 0 for every fresh checkpoint; the default
    tag prefix is derived from the checkpoint path, so a SECOND stream
    incarnation against the same index must still admit its own epoch
    0 instead of skipping it as the first incarnation's committed
    tag."""
    corpus, e1, e2 = _fixture(spark, sf_dir)
    idx = str(tmp_path / "idx")
    minhash_build_index(corpus, idx, **_LSH)

    def run(src_df, name):
        src = str(tmp_path / f"src_{name}")
        src_df.coalesce(1).write.parquet(src + "/batch=0")
        out = str(tmp_path / f"out_{name}")
        q = start_index_admission(
            spark, src + "/batch=*", src_df.schema, idx, out,
            checkpoint=str(tmp_path / f"ckpt_{name}"), threshold=_T,
        )
        q.awaitTermination(180)
        return {r.doc_id
                for r in spark.read.parquet(out).select("doc_id")
                .collect()}

    first = run(e1, "one")
    assert first
    # a NEW incarnation (fresh checkpoint + source) reuses epoch id 0:
    # with a shared bare prefix its epoch 0 would be silently skipped
    second = run(e2, "two")
    clean_e2 = {r.doc_id for r in e2.where(
        F.col("doc_id") % 4 == 3).collect()}
    assert second and second <= clean_e2
    # both incarnations' tags coexist in the manifest
    _, man = ST.read_manifest(idx)
    assert len(man["tags"]) == 2 and len(set(man["tags"])) == 2


# ---------------------------------------------------------------------------
# Embedding family (the x25/x29 modality) through the same composition
# ---------------------------------------------------------------------------

from configurable_etl_python_repo_spark.llm.dedup_index import (  # noqa: E402
    embedding_build_index,
)

_ENC, _ET, _EP = 8, 0.9, 2


def _vec_fixture(spark, sf_dir):
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    e1 = emb.where(F.col("vec_id") % 4 == 1).unionByName(
        emb.where(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"))
    e2 = emb.where(F.col("vec_id") % 4 == 3).unionByName(
        emb.where(F.col("vec_id") % 20 == 1).select(
            (F.col("vec_id") + 2000000).alias("vec_id"), "embedding"))
    return corpus, e1, e2


def test_embedding_stream_equals_sequential_batches(
    spark, sf_dir, tmp_path
):
    """family='embedding' through the SAME admission composition:
    availableNow stream == sequential admission_batch loop; epoch-2
    replicas of epoch-1 admissions rejected (the extend landed in
    between, assigned under the ORIGINAL centroids)."""
    corpus, e1, e2 = _vec_fixture(spark, sf_dir)
    kw = dict(family="embedding", threshold=_ET, n_probe=_EP)

    seq_idx = str(tmp_path / "sidx")
    seq_out = str(tmp_path / "sout")
    embedding_build_index(corpus, seq_idx, n_centroids=_ENC)
    for i, e in enumerate([e1, e2]):
        admission_batch(e, i, seq_idx, seq_out, **kw)
    want = {(r.vec_id, r.epoch)
            for r in spark.read.parquet(seq_out)
            .select("vec_id", "epoch").collect()}
    # corpus replicas rejected in epoch 1; epoch-1-admission replicas
    # rejected in epoch 2
    assert not {v for v, ep in want if 1000000 <= v < 2000000}
    assert not {v for v, ep in want if v >= 2000000}
    assert {v for v, ep in want if ep == 0}

    src = str(tmp_path / "src")
    e1.coalesce(1).write.parquet(src + "/batch=0")
    e2.coalesce(1).write.parquet(src + "/batch=1")
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    embedding_build_index(corpus, idx, n_centroids=_ENC)
    q = start_index_admission(
        spark, src + "/batch=*", e1.schema, idx, out,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
        **kw,
    )
    assert q.awaitTermination(180)
    got = {(r.vec_id, r.epoch)
           for r in spark.read.parquet(out)
           .select("vec_id", "epoch").collect()}
    assert got == want


def test_embedding_admission_over_pq_store_equals_int8(
    spark, sf_dir, tmp_path
):
    """family='embedding' admission against a quantize='pq' store: the
    layout dispatch inside embedding_against_index makes the SAME
    admission composition run the two-stage ADC-shortlist + int8
    rerank probe — admitted sets and the final index answers must be
    BIT-EQUAL to an int8-store stream (the d22 exact-threshold
    contract carried into streaming)."""
    corpus, e1, e2 = _vec_fixture(spark, sf_dir)
    kw = dict(family="embedding", threshold=_ET, n_probe=_EP)
    outs = {}
    for name, q in (("i8", True), ("pq", "pq")):
        idx = str(tmp_path / f"idx_{name}")
        out = str(tmp_path / f"out_{name}")
        embedding_build_index(corpus, idx, n_centroids=_ENC,
                              quantize=q, m_subspaces=8, n_codes=16)
        for i, e in enumerate([e1, e2]):
            admission_batch(e, i, idx, out, **kw)
        outs[name] = {(r.vec_id, r.epoch)
                      for r in spark.read.parquet(out)
                      .select("vec_id", "epoch").collect()}
    assert outs["pq"] == outs["i8"] and outs["i8"]


def test_admission_family_validation(spark, sf_dir, tmp_path):
    corpus, e1, _ = _vec_fixture(spark, sf_dir)
    idx = str(tmp_path / "idx")
    embedding_build_index(corpus, idx, n_centroids=_ENC)
    # simhash graduated to a real family in r11 — use a name that
    # stays unknown
    with pytest.raises(ValueError, match="unknown admission family"):
        admit_against_index(spark, idx, e1, family="bloom")
    # family defaults resolve id/value columns per store
    out = admit_against_index(spark, idx, e1, family="embedding",
                              threshold=_ET, n_probe=_EP)
    assert set(out.columns) == {"vec_id", "embedding"}
    # and the config op threads family + vector_column
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("batch", e1)
    got = eng.run_op(OpSpec(
        "ADMIT AGAINST INDEX", "adm", ["batch"],
        {"path": idx, "family": "embedding", "threshold": _ET,
         "n_probe": _EP, "id_column": "vec_id",
         "vector_column": "embedding"}))
    assert ({r.vec_id for r in got.collect()}
            == {r.vec_id for r in out.collect()})


# ---------------------------------------------------------------------------
# SimHash family (the d17 probe) through the same composition
# ---------------------------------------------------------------------------


def test_simhash_stream_equals_sequential_batches(
    spark, sf_dir, tmp_path
):
    """family='simhash' through the SAME admission composition:
    availableNow stream == sequential admission_batch loop; corpus
    replicas rejected in epoch 1 (hamming 0 <= max_hamming), epoch-2
    replicas of epoch-1 admissions rejected because the extend landed
    in between."""
    corpus, e1, e2 = _fixture(spark, sf_dir)
    kw = dict(family="simhash")

    seq_idx = str(tmp_path / "sidx")
    seq_out = str(tmp_path / "sout")
    _text_index("simhash", corpus, seq_idx)
    for i, e in enumerate([e1, e2]):
        admission_batch(e, i, seq_idx, seq_out, **kw)
    want = {(r.doc_id, r.epoch)
            for r in spark.read.parquet(seq_out)
            .select("doc_id", "epoch").collect()}
    assert not {d for d, ep in want if 1000000 <= d < 2000000}
    assert not {d for d, ep in want if d >= 2000000}
    assert {d for d, ep in want if ep == 0}

    src = str(tmp_path / "src")
    e1.coalesce(1).write.parquet(src + "/batch=0")
    e2.coalesce(1).write.parquet(src + "/batch=1")
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    _text_index("simhash", corpus, idx)
    q = start_index_admission(
        spark, src + "/batch=*", e1.schema, idx, out,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
        **kw,
    )
    assert q.awaitTermination(180)
    got = {(r.doc_id, r.epoch)
           for r in spark.read.parquet(out)
           .select("doc_id", "epoch").collect()}
    assert got == want


def test_simhash_family_rejects_threshold(spark, sf_dir, tmp_path):
    """max_hamming is a build-time parameter of the simhash index —
    passing an admission threshold would silently not apply, so it
    raises instead."""
    corpus, e1, _ = _fixture(spark, sf_dir)
    idx = str(tmp_path / "idx")
    _text_index("simhash", corpus, idx)
    with pytest.raises(ValueError, match="no threshold"):
        admit_against_index(spark, idx, e1, family="simhash",
                            threshold=0.5)
    # and without one it admits
    out = admit_against_index(spark, idx, e1, family="simhash")
    assert out.count() > 0


def test_wiped_checkpoint_incarnation_gets_fresh_tags(
    spark, sf_dir, tmp_path
):
    """The routine stream-reset hazard: wipe the checkpoint dir and
    start a new stream AT THE SAME PATH. Epoch ids restart at 0; with
    a path-keyed prefix the new incarnation's epoch 0 of brand-new
    documents would be silently skipped as the old incarnation's
    committed tag. The run-id file inside the checkpoint keys the
    prefix to the INCARNATION, so the second run admits."""
    import shutil

    corpus, e1, e2 = _fixture(spark, sf_dir)
    idx = str(tmp_path / "idx")
    minhash_build_index(corpus, idx, **_LSH)
    ckpt = str(tmp_path / "ckpt")

    def run(src_df, name):
        src = str(tmp_path / f"src_{name}")
        src_df.coalesce(1).write.parquet(src + "/batch=0")
        out = str(tmp_path / f"out_{name}")
        q = start_index_admission(
            spark, src + "/batch=*", src_df.schema, idx, out,
            checkpoint=ckpt, threshold=_T,
        )
        q.awaitTermination(180)
        if not glob.glob(out + "/epoch=*/*.parquet"):
            return set()  # skipped epoch writes nothing at all
        return {r.doc_id
                for r in spark.read.parquet(out).select("doc_id")
                .collect()}

    first = run(e1, "one")
    assert first
    # the reset: same checkpoint PATH, fresh incarnation
    shutil.rmtree(ckpt)
    second = run(e2, "two")
    clean_e2 = {r.doc_id for r in e2.where(
        F.col("doc_id") % 4 == 3).collect()}
    assert second and second <= clean_e2
    # both incarnations' epoch-0 tags coexist in the manifest
    _, man = ST.read_manifest(idx)
    assert len(man["tags"]) == 2 and len(set(man["tags"])) == 2
    # and a RESTART (checkpoint intact) keeps the same prefix: the
    # redelivered epoch is skipped, no third tag appears
    third = run(e2, "three")
    assert third == set()  # nothing new written to a fresh out dir
    _, man2 = ST.read_manifest(idx)
    assert man2["tags"] == man["tags"]


def test_stream_with_maintenance_equals_stream_without(
    spark, sf_dir, tmp_path
):
    """maintain_every_n_epochs makes the stream self-maintaining:
    admitted rows are IDENTICAL with and without it (maintenance is a
    policy, never a correctness step), and the maintained index ends
    compacted — the manifest proves the policy actually fired."""
    corpus, e1, e2 = _fixture(spark, sf_dir)

    def run(name, **extra):
        src = str(tmp_path / f"src_{name}")
        e1.coalesce(1).write.parquet(src + "/batch=0")
        e2.coalesce(1).write.parquet(src + "/batch=1")
        import os as _os
        import time as _time
        now = _time.time()
        for i in (0, 1):
            for f in _os.listdir(f"{src}/batch={i}"):
                _os.utime(f"{src}/batch={i}/{f}",
                          (now + 10 * i, now + 10 * i))
        idx, out = str(tmp_path / f"idx_{name}"), str(
            tmp_path / f"out_{name}")
        minhash_build_index(corpus, idx, **_LSH)
        q = start_index_admission(
            spark, src + "/batch=*", e1.schema, idx, out,
            checkpoint=str(tmp_path / f"ckpt_{name}"), threshold=_T,
            max_files_per_trigger=1, **extra,
        )
        assert q.awaitTermination(180)
        return idx, {
            (r.doc_id, r.epoch)
            for r in spark.read.parquet(out)
            .select("doc_id", "epoch").collect()
        }

    plain_idx, want = run("plain")
    maint_idx, got = run(
        "maint", maintain_every_n_epochs=1,
        maintain_args=dict(max_segments=2, retention_s=0.0),
    )
    assert got == want
    # the policy fired: build + 2 extends would be 3 segments, the
    # maintained index holds fewer (each epoch's tick compacts)
    _, man_m = ST.read_manifest(maint_idx)
    _, man_p = ST.read_manifest(plain_idx)
    assert len(man_p["segments"]) == 3
    assert len(man_m["segments"]) < 3
    # tags survive compaction (carried forward): a redelivered epoch
    # is still recognized after its segment was folded away (prefixes
    # differ per incarnation — compare the epoch suffixes)
    def epochs(man):
        return sorted(t.rsplit("-", 1)[1] for t in man["tags"])

    assert epochs(man_m) == epochs(man_p) == ["0", "1"]
    # the default metrics table landed next to the checkpoint: one
    # receipt per epoch, counts matching the output, and maintenance
    # ticks recorded with their fired status
    from configurable_etl_python_repo_spark.streaming.admission import (
        admission_metrics,
    )

    em, mm = admission_metrics(
        spark, str(tmp_path / "ckpt_maint" / "__admission_metrics")
    )
    rows = {r.epoch: r for r in em.collect()}
    assert set(rows) == {0, 1}
    out_counts = {
        r.epoch: r["count"]
        for r in spark.read.parquet(str(tmp_path / "out_maint"))
        .groupBy("epoch").count().collect()
    }
    for ep, r in rows.items():
        assert r.n_admitted == out_counts[ep]
        assert r.n_rejected == r.n_input - r.n_admitted > 0
    ticks = {r.epoch: r for r in mm.collect()}
    assert set(ticks) == {0, 1} and ticks[1].fired
    assert all(not r.raced for r in ticks.values())


def test_metrics_receipts_are_exact_across_crash_and_retry(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Counter exactness across the crash table (verdict r11 item 5):
    the receipt precedes the extends, so (a) a crash between output
    and extend leaves a row the retry OVERWRITES with the identical
    recomputation, (b) a redelivery of a committed epoch tag-skips and
    leaves the committed attempt's row untouched, and (c) an empty
    epoch records nothing. One row per epoch, counts equal to the
    on-disk truth, always."""
    from configurable_etl_python_repo_spark.streaming.admission import (
        admission_metrics,
    )

    corpus, e1, e2 = _fixture(spark, sf_dir)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    met = str(tmp_path / "metrics")
    minhash_build_index(corpus, idx, **_LSH)
    kw = dict(threshold=_T, metrics_path=met)

    real = ST.commit_extend
    monkeypatch.setattr(
        ST, "commit_extend",
        lambda *a, **k: (_ for _ in ()).throw(_Crash()),
    )
    with pytest.raises(_Crash):
        admission_batch(e1, 0, idx, out, **kw)
    em, _ = admission_metrics(spark, met)
    first = em.collect()
    assert len(first) == 1 and first[0].epoch == 0
    monkeypatch.setattr(ST, "commit_extend", real)

    assert admission_batch(e1, 0, idx, out, **kw) is not None
    em, _ = admission_metrics(spark, met)
    rows = em.collect()
    assert len(rows) == 1  # overwritten, not appended
    r = rows[0]
    n_out = spark.read.parquet(out).where("epoch = 0").count()
    assert (r.n_input, r.n_admitted) == (e1.count(), n_out)
    assert r.n_rejected == r.n_input - r.n_admitted > 0
    assert r.pre_segments == 1 and r.pre_tombstones == 0

    # committed-epoch redelivery: full no-op, row byte-identical
    before = {tuple(x) for x in em.collect()}
    assert admission_batch(e1, 0, idx, out, **kw) is None
    em, _ = admission_metrics(spark, met)
    assert {tuple(x) for x in em.collect()} == before

    # empty epoch: no receipt
    assert admission_batch(
        e1.where(F.lit(False)), 5, idx, out, **kw) is None
    em, _ = admission_metrics(spark, met)
    assert {x.epoch for x in em.collect()} == {0}

    # second epoch appends its own partition; the rollup query is the
    # docstring's "what did the stream do last night"
    admission_batch(e2, 1, idx, out, **kw)
    em, _ = admission_metrics(spark, met)
    roll = em.agg(
        F.count("*").alias("epochs"),
        F.sum("n_input").alias("n_in"),
        F.sum("n_admitted").alias("n_ok"),
    ).first()
    assert roll.epochs == 2
    assert roll.n_ok == spark.read.parquet(out).count()
    assert roll.n_in == e1.count() + e2.count()


def test_metered_epoch_checkpoints_batch_once(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r12 ADVICE regression: with metrics on, the epoch receipt's
    n_input count must read the CHECKPOINTED batch, not re-scan every
    input file of the micro-batch a second time. Pinned by counting
    localCheckpoint calls: metrics on = 2 (batch + admitted), metrics
    off = 1 (admitted only) — remove the batch checkpoint and the
    count drops while the receipt path still runs, failing this."""
    corpus, e1, _ = _fixture(spark, sf_dir)
    minhash_build_index(corpus, str(tmp_path / "idx"), **_LSH)
    calls = []
    cls = type(e1)  # the CONCRETE DataFrame class (Spark 4 splits the
    # public pyspark.sql.DataFrame into a base + classic/connect
    # subclasses; patching the base would miss the override)
    real = cls.localCheckpoint

    def counting(self, *a, **k):
        calls.append(1)
        return real(self, *a, **k)

    monkeypatch.setattr(cls, "localCheckpoint", counting)
    admission_batch(
        e1, 0, str(tmp_path / "idx"), str(tmp_path / "out"),
        threshold=_T, metrics_path=str(tmp_path / "metrics"),
    )
    with_metrics = len(calls)
    calls.clear()
    admission_batch(
        e1, 1, str(tmp_path / "idx"), str(tmp_path / "out"),
        threshold=_T,
    )
    assert (with_metrics, len(calls)) == (2, 1)


def test_legacy_checkpoint_migration_keeps_path_keyed_tags(tmp_path):
    """A checkpoint that predates the run-id marker (Spark's offsets/
    dir present, no marker) committed its epochs under the LEGACY
    path-only prefix — the incarnation id must reproduce that digest
    input exactly, or a redelivered epoch would miss its tag and
    double-extend. Only a genuinely fresh checkpoint mints a uuid."""
    import os

    from configurable_etl_python_repo_spark.streaming.admission import (
        _incarnation_id,
    )

    legacy = tmp_path / "old_ckpt"
    (legacy / "offsets").mkdir(parents=True)
    want = os.path.abspath(str(legacy))
    assert _incarnation_id(str(legacy)) == want
    assert _incarnation_id(str(legacy)) == want  # stable across calls

    fresh = tmp_path / "new_ckpt"
    rid = _incarnation_id(str(fresh))
    assert rid != os.path.abspath(str(fresh)) and "\x1f" in rid
    assert _incarnation_id(str(fresh)) == rid  # marker persisted
    # wiping the fresh checkpoint (marker included) mints a NEW id
    import shutil

    shutil.rmtree(fresh)
    assert _incarnation_id(str(fresh)) != rid


# ---------------------------------------------------------------------------
# Searchable admission (r11): admitted docs also roll a BM25 index
# ---------------------------------------------------------------------------


def _bm25_rows(spark, idx, q):
    from configurable_etl_python_repo_spark.llm.search import (
        bm25_search_index,
    )

    return sorted(
        (r.doc_id, r.rank, r.score)
        for r in bm25_search_index(spark, idx, q, k=10).collect()
    )


def test_searchable_admission_equals_offline_build(
    spark, sf_dir, tmp_path
):
    """Two epochs with search_index_path: the rolled-forward BM25
    index answers bit-identically to a fresh offline build over
    corpus ∪ all admitted docs (the extend == rebuild contract,
    through the admission composition)."""
    from configurable_etl_python_repo_spark.llm.search import (
        bm25_build_index,
    )

    corpus, e1, e2 = _fixture(spark, sf_dir)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    sidx = str(tmp_path / "sidx")
    minhash_build_index(corpus, idx, **_LSH)
    bm25_build_index(corpus, sidx)
    for i, e in enumerate([e1, e2]):
        admission_batch(e, i, idx, out, threshold=_T,
                        search_index_path=sidx)
    admitted = spark.read.parquet(out).select("doc_id", "text")
    offline = str(tmp_path / "offline")
    bm25_build_index(corpus.unionByName(admitted), offline)
    q = "the data pipeline processing"
    got = _bm25_rows(spark, sidx, q)
    assert got == _bm25_rows(spark, offline, q) and got


def test_search_leg_crash_between_extends_is_exactly_once(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The new crash point: BM25 extend committed, dedup extend not.
    The retry must SKIP the BM25 extend (its tag is in its own
    manifest) and commit the dedup extend — neither store
    double-appends the epoch."""
    from configurable_etl_python_repo_spark.llm.search import (
        bm25_build_index,
    )

    corpus, e1, _ = _fixture(spark, sf_dir)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    sidx = str(tmp_path / "sidx")
    minhash_build_index(corpus, idx, **_LSH)
    bm25_build_index(corpus, sidx)

    real = ST.commit_extend
    state = {"calls": 0}

    def crash_second(*a, **k):
        state["calls"] += 1
        if state["calls"] == 2:  # first = BM25 leg, second = dedup
            raise _Crash()
        return real(*a, **k)

    monkeypatch.setattr(ST, "commit_extend", crash_second)
    with pytest.raises(_Crash):
        admission_batch(e1, 0, idx, out, threshold=_T,
                        search_index_path=sidx)
    monkeypatch.setattr(ST, "commit_extend", real)
    _, sman = ST.read_manifest(sidx)
    assert len(sman["segments"]) == 2          # BM25 leg committed
    assert len(ST.read_manifest(idx)[1]["segments"]) == 1  # dedup didn't

    retried = admission_batch(e1, 0, idx, out, threshold=_T,
                              search_index_path=sidx)
    assert retried is not None
    _, sman2 = ST.read_manifest(sidx)
    assert sman2["segments"] == sman["segments"]  # SKIPPED, not doubled
    _, man = ST.read_manifest(idx)
    assert len(man["segments"]) == 2
    # the search answer equals an offline build over corpus + admitted
    # (no doc indexed twice — doubled tf/df would shift scores)
    offline = str(tmp_path / "offline")
    bm25_build_index(
        corpus.unionByName(retried.select("doc_id", "text")), offline
    )
    q = "the data pipeline processing"
    assert _bm25_rows(spark, sidx, q) == _bm25_rows(spark, offline, q)


def test_search_leg_rejects_vector_family(spark, sf_dir, tmp_path):
    corpus, e1, _ = _vec_fixture(spark, sf_dir)
    idx = str(tmp_path / "idx")
    embedding_build_index(corpus, idx, n_centroids=_ENC)
    with pytest.raises(ValueError, match="TEXT value column"):
        admission_batch(e1, 0, idx, str(tmp_path / "out"),
                        family="embedding", threshold=_ET,
                        search_index_path=str(tmp_path / "sidx"))
