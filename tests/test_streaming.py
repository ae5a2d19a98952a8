"""Structured Streaming: ingestion foreachBatch + windowed rollups run as
REAL streaming queries (file source, availableNow trigger)."""

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.sources.bronze import read_bronze
from configurable_etl_python_repo_spark.sources.files import read_events
from configurable_etl_python_repo_spark.streaming.ingest import (
    ingest_batch,
    route_view,
    start_file_ingest,
    with_file_metadata,
)
from configurable_etl_python_repo_spark.streaming.windows import (
    session_rollup,
    start_stream_rollup,
    tumbling_rollup,
)


def test_route_view():
    views = ["ENROL", "IxRS", "DS", "CLINICALVIEWS"]
    assert route_view("DG001_ENROL_20210101.csv", views) == "ENROL"
    assert route_view("dg001_ixrs_dump.csv", views) == "IxRS"
    assert route_view("unrelated.csv", views) is None


def test_ingest_batch_idempotent(spark, tmp_path):
    """Re-processing the same file must not duplicate bronze rows — dynamic
    partition overwrite == the reference's idempotent put_item."""
    bronze = str(tmp_path / "bronze")
    df = spark.createDataFrame(
        [Row(Subject="S2", val="b"), Row(Subject="S1", val="a")]
    ).withColumn("view_name", F.lit("DS"))
    for _ in range(2):  # at-least-once delivery: process twice
        ingest_batch(df, bronze, "ST1", view_col="view_name",
                     key_columns=["Subject"])
    back = read_bronze(spark, bronze, study_code="ST1", view="DS")
    rows = [(r.Subject, r.val) for r in back.orderBy("Subject").collect()]
    assert rows == [("S1", "a"), ("S2", "b")]  # no dup, key-sorted nest


def test_file_metadata_extraction(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame([Row(a=1)]).write.parquet(f"{src}/DG001002003_DS_x")
    df = with_file_metadata(spark.read.parquet(f"{src}/DG001002003_DS_x"))
    r = df.collect()[0]
    assert r.study_code_extracted == "DG001002003"
    assert r.load_timestamp is not None


def test_streaming_ingest_end_to_end(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    bronze = str(tmp_path / "stream_bronze")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [Row(Subject="S1", val="x", view_name="EX"),
         Row(Subject="S2", val="y", view_name="DS")]
    )
    df.write.parquet(src)
    q = start_file_ingest(spark, src, df.schema, bronze, ckpt,
                          study_code="ST9", view_col="view_name",
                          key_columns=["Subject"])
    q.awaitTermination(120)
    got = read_bronze(spark, bronze, study_code="ST9")
    assert {(r.view, r.Subject) for r in got.collect()} == {("EX", "S1"), ("DS", "S2")}


def test_tumbling_rollup_stream_matches_batch(spark, sf_dir, tmp_path):
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    # micro-second parquet copy so the stream source needs no nanos conf
    src = str(tmp_path / "events_us")
    ev.write.parquet(src)
    batch = {tuple(r) for r in tumbling_rollup(ev).collect()}

    q = start_stream_rollup(spark, src, spark.read.parquet(src).schema,
                            str(tmp_path / "ck2"), transform=tumbling_rollup,
                            output_table="t_rollup")
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("t_rollup").collect()}
    assert stream == batch


def test_sliding_rollup_stream_matches_batch(spark, sf_dir, tmp_path):
    from configurable_etl_python_repo_spark.streaming.windows import (
        sliding_rollup,
    )

    ev = read_events(spark, f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_us")
    ev.write.parquet(src)
    batch = {tuple(r) for r in sliding_rollup(ev).collect()}
    # each event falls into exactly window/slide = 4 overlapping windows
    n_assignments = sum(r[2] for r in batch)
    assert n_assignments == ev.count() * 4

    q = start_stream_rollup(spark, src, spark.read.parquet(src).schema,
                            str(tmp_path / "ck3"), transform=sliding_rollup,
                            output_table="s_rollup")
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("s_rollup").collect()}
    assert stream == batch


def test_session_rollup_counts(spark, sf_dir):
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    out = session_rollup(ev)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()  # every event lands in exactly one session


def test_text_ops_stream_matches_batch(spark, sf_dir, tmp_path):
    """The curation text operators are stateless Column transforms, so
    the SAME functions run under readStream unchanged — streaming
    quality-gating of an arriving corpus produces exactly the batch
    answer."""
    from configurable_etl_python_repo_spark.llm.scrub import (
        pii_scrub, url_blocklist_filter,
    )
    from configurable_etl_python_repo_spark.llm.text import (
        classifier_score, language_id, language_id_ngram, quality_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def transform(df):
        out = language_id(quality_filter(pii_scrub(df)))
        out = out.withColumnRenamed("lang_pred", "lang_sw").drop(
            "lang_pred_hits"
        )
        out = url_blocklist_filter(language_id_ngram(out),
                                   ["spam.example"])
        return classifier_score(out).select(
            "doc_id", "keep", "lang_sw", "lang_pred", "pii_total",
            "blocked", "quality_score", "quality_keep",
        )

    batch = {tuple(r) for r in transform(docs).collect()}
    src = str(tmp_path / "docs_dir")
    docs.write.parquet(src)  # stream source needs a directory
    q = (transform(
            spark.readStream.format("parquet").schema(docs.schema).load(src))
         .writeStream.format("memory").queryName("txt_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_txt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("txt_stream").collect()}
    assert stream == batch


def test_session_window_equals_lag_based_sessionize(spark, sf_dir):
    """The native F.session_window defines the SAME sessions as e2's
    lag-based batch shape (the catalog's oracle-checked query) on the
    events fixture: identical (user, session_start, last-event ts, count)
    tuples, with session_window's end = last ts + gap by construction.
    Exact, not fixture-luck — the boundary case agrees too (next test)."""
    from configurable_etl_python_repo_spark.catalog import QUERIES

    lag_based = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in QUERIES["e2_sessionize_gap30m"](spark, sf_dir).collect()
    }
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    native = {
        (r.user_id, r.session_start,
         # session_window end is EXCLUSIVE: last event ts + gap
         r.session_end - __import__("datetime").timedelta(minutes=30),
         r.n_events)
        for r in session_rollup(ev, gap="30 minutes").collect()
    }
    assert native == lag_based


def test_session_window_boundary_semantics_pinned(spark):
    """Exact-gap boundary agreement, pinned: F.session_window MERGES a
    window that starts exactly at the previous window's end (touch ==
    overlap), so an event exactly `gap` after the previous one stays
    in-session — the same inclusive semantics as the lag shape's strict
    `>` comparison. One microsecond past the gap splits in both. This is
    what makes the equivalence above exact rather than
    fixture-dependent."""
    from datetime import datetime, timedelta

    def sessions(ts2):
        ev = spark.createDataFrame(
            [Row(user_id=1, event_id=1, ts=datetime(2024, 1, 1, 0, 0, 0)),
             Row(user_id=1, event_id=2, ts=ts2)]
        )
        native = session_rollup(ev, gap="30 minutes").count()
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        lag_splits = ev.withColumn(
            "new_session",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
             > 1_800_000_000).cast("int"),
        ).agg(F.sum("new_session")).first()[0]
        return native, 1 + lag_splits

    on_edge = datetime(2024, 1, 1, 0, 30, 0)
    assert sessions(on_edge) == (1, 1)                            # merged
    assert sessions(on_edge + timedelta(microseconds=1)) == (2, 2)  # split


def test_session_rollup_stream_matches_batch(spark, sf_dir, tmp_path):
    """F.session_window under a real readStream (availableNow) produces
    the same sessions as the batch plan — the streaming counterpart of
    the lag-based catalog shape in e2_sessionize_gap30m."""
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_us")
    ev.write.parquet(src)
    batch = {tuple(r) for r in session_rollup(ev).collect()}

    q = start_stream_rollup(spark, src, spark.read.parquet(src).schema,
                            str(tmp_path / "ck4"), transform=session_rollup,
                            output_table="sess_rollup")
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("sess_rollup").collect()}
    assert stream == batch


def test_config_program_sessionizes_a_stream(spark, sf_dir, tmp_path):
    """Streaming as a PROGRAM surface, not just a library call: a config
    program declares a parquet-stream scan and a SESSION WINDOW op; the
    engine lowers it to a streaming plan that runs under availableNow
    and matches the identical program run over the batch scan."""
    from configurable_etl_python_repo_spark.plans import (
        Engine, OpSpec, ScanSpec,
    )

    ev = read_events(spark, f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_cfg")
    ev.write.parquet(src)

    def run_program(source_kind):
        eng = Engine(spark)
        eng.run_scan(ScanSpec("ev", source_kind, src))
        eng.run_op(OpSpec("SESSION WINDOW", "sess", ["ev"],
                          {"gap": "30 minutes",
                           "timestamp_column": "ts"}))
        return eng.resolve("sess")

    batch = {tuple(r) for r in run_program("parquet").collect()}

    out = run_program("parquet-stream")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("cfg_sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_cfg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("cfg_sess").collect()}
    assert stream == batch and len(batch) > 0


def test_surprisal_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming surprisal (constant-folded LM map literal, integer
    micro-nat fold) produces exactly the batch smoothed scorer's
    answers under readStream append mode — including OOV words and a
    wordless row (kept with NULL by the stream, absent from batch)."""
    from configurable_etl_python_repo_spark.llm.text import (
        surprisal_lm_table,
        surprisal_score,
        surprisal_score_stream,
    )

    lm = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = lm.unionByName(
        spark.createDataFrame(
            [(20_000_001, "zzzzq unseen oovword the the"),
             (20_000_002, "   ")],
            schema="doc_id long, text string",
        )
    )
    batch = {
        (r["doc_id"], r["n_words"], r["avg_surprisal"])
        for r in surprisal_score(docs, lm_df=lm, alpha=1.0).collect()
    }

    table = surprisal_lm_table(lm, alpha=1.0)
    src = str(tmp_path / "docs_sup")
    docs.write.parquet(src)
    q = (
        surprisal_score_stream(
            spark.readStream.format("parquet").schema(docs.schema).load(src),
            table,
        )
        .select("doc_id", "n_words", "avg_surprisal")
        .writeStream.format("memory").queryName("sup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sup_stream").collect()
    stream = {
        (r["doc_id"], r["n_words"], r["avg_surprisal"])
        for r in rows if r["n_words"] > 0
    }
    assert stream == batch
    # the wordless row flows through with NULL instead of vanishing
    (empty,) = [r for r in rows if r["doc_id"] == 20_000_002]
    assert empty["n_words"] == 0 and empty["avg_surprisal"] is None


def test_config_program_streams_decontamination_and_surprisal(
    spark, sf_dir, tmp_path
):
    """The streaming duals are config ops too: a program declares a
    parquet-stream scan plus BATCH side inputs (eval corpus, LM corpus)
    and chains DECONTAMINATE STREAM -> SURPRISAL SCORE STREAM; the
    engine lowers it to one streaming plan whose availableNow drain
    matches the batch operators row-for-row."""
    from configurable_etl_python_repo_spark.llm.dedup import decontaminate
    from configurable_etl_python_repo_spark.llm.text import surprisal_score
    from configurable_etl_python_repo_spark.plans import (
        Engine, OpSpec, ScanSpec,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "docs_cfg2")
    docs.write.parquet(src)

    eng = Engine(spark)
    eng.run_scan(ScanSpec("stream", "parquet-stream", src))
    eng.run_scan(ScanSpec("batch", "parquet", src))
    eng.run_op(OpSpec(
        "FILTER", "evalset", ["batch"], {"condition": "doc_id < NUMBER(30)"},
    ))
    eng.run_op(OpSpec(
        "DECONTAMINATE STREAM", "flagged", ["stream", "evalset"],
        {"n": 5, "mode": "flag"},
    ))
    out = eng.run_op(OpSpec(
        "SURPRISAL SCORE STREAM", "scored", ["flagged", "batch"],
        {"alpha": 1.0},
    ))
    assert out.isStreaming
    q = (
        out.select("doc_id", "contaminated", "n_words", "avg_surprisal")
        .writeStream.format("memory").queryName("cfg_stream2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_cfg2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("cfg_stream2").collect()
              if r["n_words"] > 0}

    bd = decontaminate(docs, docs.where("doc_id < 30"), n=5)
    bs = surprisal_score(docs, lm_df=docs, alpha=1.0)
    batch = {
        tuple(r)
        for r in bd.select("doc_id", "contaminated")
        .join(bs, "doc_id")
        .select("doc_id", "contaminated", "n_words", "avg_surprisal")
        .collect()
    }
    assert stream == batch and len(batch) > 0


def test_decontaminate_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming decontamination (per-row Column math over an eval-gram
    literal) produces exactly the batch operator's answer, running under
    readStream append mode."""
    from configurable_etl_python_repo_spark.llm.dedup import (
        decontaminate, decontaminate_stream, eval_gram_set,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # rows with fewer than n words (and one empty) — a single short doc
    # used to abort the whole streaming query (slice start 0 from the
    # descending sequence [0,-1]); pin that they flow through as clean
    docs = docs.unionByName(
        spark.createDataFrame(
            [(10_000_001, "too short"), (10_000_002, ""),
             (10_000_003, "four words right here")],
            schema="doc_id long, text string",
        )
    )
    evalset = docs.where("doc_id % 17 = 0").select("doc_id", "text")
    n = 5  # small n so the sf0.001 fixture has real matches

    batch = {
        (r["doc_id"], r["contaminated"], r["n_contaminated_grams"])
        for r in decontaminate(docs, evalset, n=n).collect()
    }
    assert any(c for _, c, _ in batch)  # the eval docs themselves match

    grams = eval_gram_set(evalset, n=n)
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    q = (
        decontaminate_stream(
            spark.readStream.format("parquet").schema(docs.schema).load(src),
            grams, n=n,
        )
        .select("doc_id", "contaminated", "n_contaminated_grams")
        .writeStream.format("memory").queryName("decon_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_decon"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.table("decon_stream").collect()}
    assert stream == batch

    # drop mode keeps exactly the clean rows
    clean_batch = {r["doc_id"] for r in
                   decontaminate(docs, evalset, n=n, mode="drop").collect()}
    clean_rowset = {
        r["doc_id"]
        for r in decontaminate_stream(docs, grams, n=n, mode="drop").collect()
    }
    assert clean_rowset == clean_batch


def test_backoff_surprisal_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming bigram backoff surprisal (constant-folded unigram +
    bigram map literals, integer micro-nat fold) produces exactly the
    batch scorer's answers under readStream append mode — including
    unseen bigrams (backoff path), OOV words, and a wordless row (kept
    with NULL by the stream, absent from batch)."""
    from configurable_etl_python_repo_spark.llm.text import (
        backoff_lm_table,
        backoff_surprisal,
        backoff_surprisal_stream,
    )

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    lm = base.where("doc_id % 2 = 0")
    docs = base.unionByName(
        spark.createDataFrame(
            [(20_000_001, "zzzzq unseen oovword the the"),
             (20_000_002, "   ")],
            schema="doc_id long, text string",
        )
    )
    batch = {
        (r["doc_id"], r["n_words"], r["avg_surprisal"])
        for r in backoff_surprisal(docs, lm).collect()
    }

    table = backoff_lm_table(lm)
    src = str(tmp_path / "docs_bsup")
    docs.write.parquet(src)
    q = (
        backoff_surprisal_stream(
            spark.readStream.format("parquet").schema(docs.schema).load(src),
            table,
        )
        .select("doc_id", "n_words", "avg_surprisal")
        .writeStream.format("memory").queryName("bsup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_bsup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("bsup_stream").collect()
    stream = {
        (r["doc_id"], r["n_words"], r["avg_surprisal"])
        for r in rows if r["n_words"] > 0
    }
    assert stream == batch
    (empty,) = [r for r in rows if r["doc_id"] == 20_000_002]
    assert empty["n_words"] == 0 and empty["avg_surprisal"] is None


def test_backoff_stream_config_op(spark):
    from pyspark.sql import Row

    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("docs", spark.createDataFrame(
        [Row(doc_id=1, text="a b z")]))
    eng.bind("lm", spark.createDataFrame(
        [Row(doc_id=2, text="a b a c")]))
    out = eng.run_op(OpSpec(
        "SURPRISAL BACKOFF STREAM", "s", ["docs", "lm"], {},
    ))
    assert {"n_words", "avg_surprisal"} <= set(out.columns)
    import pytest

    with pytest.raises(ValueError, match="second"):
        eng.run_op(OpSpec("SURPRISAL BACKOFF STREAM", "s2", ["docs"], {}))
