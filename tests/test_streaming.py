"""Streaming CDC upsert + sessionization: the streamed result must equal
the batch operator's result (the reference's cross-layer-consistency idiom
applied to streaming)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.operators.cdc import (
    apply_cdc_upsert,
    synthetic_change_events,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table
from apache_iceberg_with_clickhouse_olake_spark.streaming import (
    run_cdc_upsert_stream,
    run_streaming_sessionization,
)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_cdc_stream_matches_batch(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 2000
    )
    events = synthetic_change_events(orders)

    events_dir = str(tmp_path / "events")
    # Split the stream into 3 chunks by seq to exercise multi-batch apply
    # (order matters: later seqs must override earlier state).
    for i, cond in enumerate(
        [F.col("_seq") == 0, F.col("_seq") == 1, F.col("_seq") >= 2]
    ):
        events.filter(cond).coalesce(1).write.mode("append").parquet(events_dir)

    state_dir = str(tmp_path / "state")
    run_cdc_upsert_stream(
        spark, events_dir, state_dir, str(tmp_path / "ckpt"), 1
    )

    got = spark.read.parquet(state_dir)
    want = apply_cdc_upsert(events)
    cols = ["key", "custkey", "price", "_op", "_seq", "_sync_ts_epoch"]
    assert _rows(got, cols) == _rows(want, cols)
    # Deletes dropped, latest version won.
    assert got.filter(F.col("_op") == "d").count() == 0


def test_cdc_stream_restart_is_idempotent(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 500
    )
    events = synthetic_change_events(orders)
    events_dir = str(tmp_path / "events")
    events.coalesce(1).write.parquet(events_dir)

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    run_cdc_upsert_stream(spark, events_dir, state_dir, ckpt, 10)
    first = _rows(spark.read.parquet(state_dir), ["key", "price"])
    # Restart with the same checkpoint: no new files -> state unchanged.
    run_cdc_upsert_stream(spark, events_dir, state_dir, ckpt, 10)
    assert _rows(spark.read.parquet(state_dir), ["key", "price"]) == first


def test_streaming_sessionization_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    flat = events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_epoch_us"),
        "user_id",
        "value",
    )
    events_dir = str(tmp_path / "events")
    flat.coalesce(2).write.parquet(events_dir)

    got = run_streaming_sessionization(
        spark, events_dir, str(tmp_path / "ckpt")
    )

    from apache_iceberg_with_clickhouse_olake_spark.operators.sessions import (
        sessionize,
    )

    batch = (
        sessionize(events)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.min(F.unix_micros("ts")) / 1_000_000)
            .cast("long")
            .alias("window_start_epoch"),
        )
    )
    cols = ["user_id", "window_start_epoch", "n_events"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_snapshot_backfill_then_cdc_tail(spark, sf_dir, tmp_path):
    """C1 (source.json:8-15): initial full snapshot as a BATCH write, then
    the continuous change stream applies on top -- final state must equal
    the batch operator applied to the full event log."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 1000
    )
    events = synthetic_change_events(orders)
    snapshot = events.filter(F.col("_seq") <= 0)  # initial load
    tail = events.filter(F.col("_seq") > 0)       # binlog tail

    state_dir = str(tmp_path / "state")
    # Phase 1: batch backfill of the snapshot (chunked reads modeled by
    # the writer's partitioning; the stream below uses maxFilesPerTrigger).
    from apache_iceberg_with_clickhouse_olake_spark.operators.cdc import (
        apply_cdc_upsert as upsert,
    )

    upsert(snapshot).write.parquet(state_dir)

    # Phase 2: stream the tail into the same state.
    events_dir = str(tmp_path / "events")
    tail.coalesce(2).write.parquet(events_dir)
    run_cdc_upsert_stream(
        spark, events_dir, state_dir, str(tmp_path / "ckpt"), 1
    )

    got = spark.read.parquet(state_dir)
    want = apply_cdc_upsert(events)
    cols = ["key", "custkey", "price", "_op", "_seq", "_sync_ts_epoch"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """Streaming tumbling windows must reproduce the batch bucket counts
    (same 15-min buckets as events_tumbling_windows)."""
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        run_streaming_tumbling,
    )

    events = load_table(spark, sf_dir, "events")
    flat = events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_epoch_us"),
        "user_id",
        "value",
    )
    events_dir = str(tmp_path / "events")
    flat.repartition(2).write.parquet(events_dir)

    got = run_streaming_tumbling(spark, events_dir, str(tmp_path / "ckpt"))
    batch = (
        events.groupBy(
            (F.expr("(unix_micros(ts) div 1000000) div 900") * 900).alias(
                "window_start_epoch"
            )
        )
        .agg(F.count("*").alias("n_events"))
    )
    g = {r.window_start_epoch: r.n_events for r in got.collect()}
    b = {r.window_start_epoch: r.n_events for r in batch.collect()}
    assert g == b


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming dropDuplicates(fingerprint) across micro-batches keeps
    exactly one row per distinct fingerprint -- the same set the batch
    dedup operator keeps."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import norm_text
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        run_streaming_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm_text(F.col("text"))).alias("fingerprint")
    )
    events_dir = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(events_dir)

    got = run_streaming_dedup(spark, events_dir, str(tmp_path / "ckpt"))
    assert got.count() == docs.select("fingerprint").distinct().count()
    # one row per fingerprint, each a real (doc_id, fingerprint) pair
    assert got.groupBy("fingerprint").count().filter("count > 1").count() == 0


def test_replace_state_crash_recovery(spark, tmp_path):
    """A crash between the two renames leaves '<dir>.old' and no live
    dir; _recover_state must restore the backup (the checkpoint had not
    committed that batch, so it replays) and clear stale staging dirs."""
    import os

    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        _recover_state,
        _replace_state,
    )

    state = str(tmp_path / "state")
    df = spark.range(5).withColumnRenamed("id", "key")
    _replace_state(df, state)
    assert spark.read.parquet(state).count() == 5

    # simulate the crash window: state renamed away, new state not yet in
    os.rename(state, state + ".old")
    os.makedirs(state + ".next")  # stale staging dir from the dead write
    _recover_state(state)
    assert spark.read.parquet(state).count() == 5
    assert not os.path.exists(state + ".old")
    assert not os.path.exists(state + ".next")

    # normal path: recovery with a live state dir is a no-op
    _recover_state(state)
    assert spark.read.parquet(state).count() == 5


def test_cdc_stream_crash_after_sink_before_commit_is_exactly_once(
    spark, sf_dir, tmp_path
):
    """The C6 chaos case: kill the stream INSIDE the danger window — the
    micro-batch's state write has landed but its checkpoint offset has
    not committed. On restart Structured Streaming replays that batch
    over the already-mutated state; the upsert body must be idempotent
    (latest-version-per-key over a union sees the replayed rows tie with
    their own prior application), so the final state must equal the
    batch oracle exactly — no dropped and no double-applied changes."""
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        CDC_EVENT_SCHEMA,
        _apply_batch,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 2000
    )
    events = synthetic_change_events(orders)
    events_dir = str(tmp_path / "events")
    for cond in [F.col("_seq") == 0, F.col("_seq") == 1, F.col("_seq") >= 2]:
        events.filter(cond).coalesce(1).write.mode("append").parquet(
            events_dir
        )

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    inner = _apply_batch(state_dir)
    crashed = []

    def poisoned(batch, batch_id):
        inner(batch, batch_id)  # sink write fully lands first
        if batch_id == 1 and not crashed:
            crashed.append(batch_id)
            raise RuntimeError(
                "injected crash after sink write, before checkpoint commit"
            )

    q = (
        spark.readStream.schema(CDC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .writeStream.foreachBatch(poisoned)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        q.awaitTermination()
    assert crashed == [1]
    # Prove the crash hit the danger window: the batch-1 (seq==1) rows
    # are already IN the state, though their offset never committed.
    mid = spark.read.parquet(state_dir)
    assert mid.filter(F.col("_seq") == 1).count() > 0

    # Restart without the poison: batch 1 replays over the mutated
    # state, then batch 2 applies, then tombstones compact.
    run_cdc_upsert_stream(spark, events_dir, state_dir, ckpt, 1)
    got = spark.read.parquet(state_dir)
    want = apply_cdc_upsert(events)
    cols = ["key", "custkey", "price", "_op", "_seq", "_sync_ts_epoch"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.filter(F.col("_op") == "d").count() == 0


def test_incremental_dedup_stream_builds_exact_index(spark, sf_dir, tmp_path):
    """Streamed ingestion dedup: three document chunks (with duplicates
    within and across chunks) drain through the fingerprint-index
    stream; the final index must hold each distinct fingerprint exactly
    once with its FIRST-seen doc_id, and a checkpointed restart with no
    new files must not grow it."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import norm_text
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        run_incremental_dedup_stream,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text", "source")
    )
    docs_dir = str(tmp_path / "docs")
    # chunk 0: doc_id < 100; chunk 1: 50..200 (overlaps 0); chunk 2: rest
    for cond in [
        F.col("doc_id") < 100,
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 200),
        F.col("doc_id") >= 150,
    ]:
        docs.filter(cond).coalesce(1).write.mode("append").parquet(docs_dir)

    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    run_incremental_dedup_stream(spark, docs_dir, index_dir, ckpt)

    got = spark.read.parquet(index_dir)
    want = (
        docs.select(
            "doc_id", F.md5(norm_text(F.col("text"))).alias("fp")
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert got.count() == want.count()
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert _rows(got, ["fp", "doc_id"]) == _rows(want, ["fp", "doc_id"])

    # restart with the drained checkpoint: index must not grow
    run_incremental_dedup_stream(spark, docs_dir, index_dir, ckpt)
    assert spark.read.parquet(index_dir).count() == want.count()


def test_incremental_dedup_stream_crash_replay_is_idempotent(
    spark, sf_dir, tmp_path
):
    """Chaos twin for the fingerprint-index stream: crash AFTER batch 1's
    index partition is written but BEFORE its offset commits; the replay
    overwrites the same batch=1 directory with identical content, so the
    final index must equal the batch oracle with no duplicated
    fingerprints."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import norm_text
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        DOC_STREAM_SCHEMA,
        run_incremental_dedup_stream,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text", "source")
    )
    docs_dir = str(tmp_path / "docs")
    for cond in [F.col("doc_id") < 80, (F.col("doc_id") >= 40) & (
        F.col("doc_id") < 150
    ), F.col("doc_id") >= 120]:
        docs.filter(cond).coalesce(1).write.mode("append").parquet(docs_dir)

    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # poisoned first pass: reuse the real body via a wrapper stream
    import os as _os

    from pyspark.sql import Window as _W

    crashed = []

    def poisoned(batch, batch_id):
        w = _W.partitionBy("fp").orderBy("doc_id")
        fresh = (
            batch.select(
                "doc_id",
                "source",
                F.md5(norm_text(F.col("text"))).alias("fp"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        if _os.path.isdir(index_dir) and any(
            n.startswith("batch=") for n in _os.listdir(index_dir)
        ):
            existing = (
                batch.sparkSession.read.parquet(index_dir)
                .where(F.col("batch") != batch_id)
                .select("fp")
            )
            fresh = fresh.join(existing, "fp", "left_anti")
        (
            fresh.withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(_os.path.join(index_dir, f"batch={batch_id}"))
        )
        if batch_id == 1 and not crashed:
            crashed.append(batch_id)
            raise RuntimeError("injected crash after index write")

    q = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.foreachBatch(poisoned)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        q.awaitTermination()
    assert crashed == [1]
    # danger window proven: batch=1 partition exists, offset uncommitted
    assert os.path.isdir(os.path.join(index_dir, "batch=1"))

    run_incremental_dedup_stream(spark, docs_dir, index_dir, ckpt)
    got = spark.read.parquet(index_dir)
    want = (
        docs.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert _rows(got, ["fp", "doc_id"]) == _rows(want, ["fp", "doc_id"])


def test_corpus_ingest_stream_converges_to_batch_build(
    spark, sf_dir, tmp_path
):
    """Streamed corpus ingestion (quality -> dedup -> shard, incremental)
    must converge to EXACTLY the corpus the batch build derives from the
    same documents: same kept doc_ids, same shard assignment, same token
    counts, no duplicate fingerprints — and a checkpointed restart must
    not grow it."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import (
        md5_int60,
        norm_text,
        tokens,
    )
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        run_corpus_ingest_stream,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text", "source")
    )
    docs_dir = str(tmp_path / "docs")
    for cond in [
        F.col("doc_id") < 150,
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 300),
        F.col("doc_id") >= 250,
    ]:
        docs.filter(cond).coalesce(1).write.mode("append").parquet(docs_dir)

    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    run_corpus_ingest_stream(spark, docs_dir, corpus_dir, ckpt)

    got = spark.read.parquet(corpus_dir)
    # batch twin: quality filter -> keep-first dedup -> shard
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace("text", "[^.!?,;:]", ""))
    punct_ratio = n_punct.cast("double") / F.when(
        F.length("text") == 0, F.lit(None)
    ).otherwise(F.length("text"))
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    want = (
        docs.filter(
            (n_tokens >= 5) & (n_tokens <= 10000) & (punct_ratio < 0.2)
        )
        .select(
            "doc_id",
            "source",
            n_tokens.cast("long").alias("n_toks"),
            (
                md5_int60(
                    F.concat(
                        F.lit("pack-"), F.col("doc_id").cast("string")
                    )
                )
                % 8
            ).cast("long").alias("shard"),
            F.md5(norm_text(F.col("text"))).alias("fp"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    cols = ["doc_id", "source", "n_toks", "shard", "fp"]
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert _rows(got, cols) == _rows(want, cols)

    run_corpus_ingest_stream(spark, docs_dir, corpus_dir, ckpt)
    assert spark.read.parquet(corpus_dir).count() == want.count()


def test_incremental_dedup_stream_torn_write_recovers(
    spark, sf_dir, tmp_path
):
    """Chaos twin for the kill the r5 ADVICE flagged as untested: the
    process dies MID-parquet-write, leaving a TORN file (garbage bytes,
    unreadable footer) in the uncommitted batch partition — not the
    complete-file crash the existing replay test injects. The restart
    must not wedge on schema inference/footer listing touching the
    corrupt sibling: the body deletes its own batch=<id> partition
    before reading the index, so the replay sees only committed
    partitions and converges to the batch oracle."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import norm_text
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        run_incremental_dedup_stream,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text", "source")
    )
    docs_dir = str(tmp_path / "docs")
    for cond in [F.col("doc_id") < 80, (F.col("doc_id") >= 40) & (
        F.col("doc_id") < 150
    ), F.col("doc_id") >= 120]:
        docs.filter(cond).coalesce(1).write.mode("append").parquet(docs_dir)

    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # First pass: batch 0 commits normally; the process "dies" MID-WRITE
    # of batch 1 — at the kill instant the batch=1 partition holds a torn
    # parquet file (garbage bytes, unreadable footer, no _SUCCESS) and
    # batch 1's offset never commits. This is the realistic torn state:
    # earlier batches are always committed before a later batch starts
    # writing.
    ran = []
    torn_dir = os.path.join(index_dir, "batch=1")

    def poisoned(batch, batch_id):
        from apache_iceberg_with_clickhouse_olake_spark.streaming import (
            _dedup_index_body,
        )

        if batch_id == 1 and not os.path.isdir(torn_dir):
            os.makedirs(torn_dir)
            with open(
                os.path.join(torn_dir, "part-torn.snappy.parquet"), "wb"
            ) as f:
                f.write(b"PAR1\x00\x13\x37garbage-not-a-footer")
            raise RuntimeError("injected kill mid-write of batch 1")
        _dedup_index_body(index_dir, batch, batch_id)
        ran.append(batch_id)

    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        DOC_STREAM_SCHEMA,
    )

    q = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.foreachBatch(poisoned)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        q.awaitTermination()
    assert ran == [0]
    # danger window proven: torn partition exists, batch 1 uncommitted
    assert os.path.exists(os.path.join(torn_dir, "part-torn.snappy.parquet"))

    # Restart: must read past the torn partition, rewrite batch=1, and
    # converge to the batch oracle with no duplicate fingerprints.
    run_incremental_dedup_stream(spark, docs_dir, index_dir, ckpt)
    got = spark.read.parquet(index_dir)
    want = (
        docs.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert _rows(got, ["fp", "doc_id"]) == _rows(want, ["fp", "doc_id"])


def test_corpus_ingest_stream_torn_write_recovers(spark, sf_dir, tmp_path):
    """Same torn-write chaos twin as the dedup index, for the corpus
    ingest stream: batch 0 commits, the process dies mid-write of
    batch 1 leaving a garbage parquet file in its partition, and the
    restart must converge to the batch-build corpus instead of wedging
    on the torn footer."""
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        DOC_STREAM_SCHEMA,
        _corpus_ingest_body,
        run_corpus_ingest_stream,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text", "source")
    )
    docs_dir = str(tmp_path / "docs")
    for cond in [
        F.col("doc_id") < 150,
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 300),
        F.col("doc_id") >= 250,
    ]:
        docs.filter(cond).coalesce(1).write.mode("append").parquet(docs_dir)

    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    torn_dir = os.path.join(corpus_dir, "batch=1")

    def poisoned(batch, batch_id):
        if batch_id == 1 and not os.path.isdir(torn_dir):
            os.makedirs(torn_dir)
            with open(
                os.path.join(torn_dir, "part-torn.snappy.parquet"), "wb"
            ) as f:
                f.write(b"PAR1\x00\x13\x37garbage-not-a-footer")
            raise RuntimeError("injected kill mid-write of batch 1")
        _corpus_ingest_body(corpus_dir, 8, batch, batch_id)

    q = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.foreachBatch(poisoned)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        q.awaitTermination()
    assert os.path.exists(os.path.join(torn_dir, "part-torn.snappy.parquet"))

    run_corpus_ingest_stream(spark, docs_dir, corpus_dir, ckpt)
    got = spark.read.parquet(corpus_dir)
    # converges: no duplicate fingerprints, same fingerprint set as the
    # batch twin (reuse the convergence test's oracle shape)
    from apache_iceberg_with_clickhouse_olake_spark.functions import (
        norm_text,
        tokens,
    )

    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace("text", "[^.!?,;:]", ""))
    punct_ratio = n_punct.cast("double") / F.when(
        F.length("text") == 0, F.lit(None)
    ).otherwise(F.length("text"))
    want_fps = (
        docs.filter(
            (n_tokens >= 5) & (n_tokens <= 10000) & (punct_ratio < 0.2)
        )
        .select(F.md5(norm_text(F.col("text"))).alias("fp"))
        .distinct()
    )
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert _rows(got.select("fp"), ["fp"]) == _rows(want_fps, ["fp"])


def test_dedup_index_backfill_batch_writes_multiple_files(
    spark, sf_dir, tmp_path
):
    """The r7 departition of the index write: the batch's fp-hash
    partitioning flows into the sink and AQE sizes it by bytes, so a
    trickle batch coalesces to one file while a backfill-sized batch
    fans across tasks instead of serializing through one core (the r6
    coalesce(1) wart). Sandbox batches are all tiny, so 'backfill-sized'
    is simulated by shrinking AQE's advisory partition size for the
    write -- the same mechanism that keeps ~64 MB tasks at production
    scale. A replay of the multi-file batch must overwrite to identical
    content (the idempotent-partitioned-sink contract survives k > 1).
    The streaming-trigger tests all ride maxFilesPerTrigger=1
    single-partition batches, so without this test the multi-file
    branch would ship driver-unexercised."""
    from apache_iceberg_with_clickhouse_olake_spark.functions import norm_text
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        _dedup_index_body,
    )

    index_dir = str(tmp_path / "index")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
    )
    # batch 0: a committed trickle batch -> AQE coalesces to one file
    trickle = docs.filter(F.col("doc_id") < 40).repartition(1)
    _dedup_index_body(index_dir, trickle, 0)
    part0 = os.path.join(index_dir, "batch=0")
    files0 = [f for f in os.listdir(part0) if f.endswith(".parquet")]
    assert len(files0) == 1, "trickle batch should still land one file"

    # batch 1: backfill-shaped relative to the advisory size
    # (overlapping fingerprints with batch 0) -> multi-file write
    advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    min_size = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    )
    backfill = docs.filter(F.col("doc_id") >= 20).repartition(8)
    try:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024"
        )
        _dedup_index_body(index_dir, backfill, 1)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", min_size
        )
    part1 = os.path.join(index_dir, "batch=1")
    files1 = [f for f in os.listdir(part1) if f.endswith(".parquet")]
    assert len(files1) > 1, (
        f"backfill batch wrote {len(files1)} file(s); the fp-keyed "
        "write should fan out once the batch outgrows the advisory size"
    )

    # Index correctness with the multi-file partition in place: each
    # distinct fingerprint exactly once, first-seen doc_id wins.
    got = spark.read.parquet(index_dir)
    want = (
        docs.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert _rows(got, ["fp", "doc_id"]) == _rows(want, ["fp", "doc_id"])

    # Replay of the multi-file batch (crash-after-write, before-commit):
    # content must be byte-identical in effect — same rows, still no
    # duplicated fingerprints.
    before = _rows(spark.read.parquet(index_dir), ["fp", "doc_id"])
    _dedup_index_body(index_dir, backfill, 1)
    after = _rows(spark.read.parquet(index_dir), ["fp", "doc_id"])
    assert before == after


def test_corpus_ingest_backfill_batch_writes_multiple_files(
    spark, sf_dir, tmp_path
):
    """r9 departition of the CORPUS ingest write (the r8 VERDICT's one
    remaining scale wart): same contract as the dedup-index twin above
    — a trickle batch still lands one file, a backfill-sized batch fans
    its corpus write across tasks via the fp partitioning + AQE byte
    sizing instead of serializing through coalesce(1), and a replay of
    the multi-file batch overwrites to identical content."""
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        _corpus_ingest_body,
    )

    corpus_dir = str(tmp_path / "corpus")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
    )
    trickle = docs.filter(F.col("doc_id") < 40).repartition(1)
    _corpus_ingest_body(corpus_dir, 8, trickle, 0)
    part0 = os.path.join(corpus_dir, "batch=0")
    files0 = [f for f in os.listdir(part0) if f.endswith(".parquet")]
    assert len(files0) == 1, "trickle batch should still land one file"

    advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    min_size = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    )
    backfill = docs.filter(F.col("doc_id") >= 20).repartition(8)
    try:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024"
        )
        _corpus_ingest_body(corpus_dir, 8, backfill, 1)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", min_size
        )
    part1 = os.path.join(corpus_dir, "batch=1")
    files1 = [f for f in os.listdir(part1) if f.endswith(".parquet")]
    assert len(files1) > 1, (
        f"backfill batch wrote {len(files1)} file(s); the fp-keyed "
        "write should fan out once the batch outgrows the advisory size"
    )

    # Corpus correctness with the multi-file partition in place: each
    # fingerprint exactly once across batches (anti-join + in-batch
    # keep-first), and a replay converges to identical content.
    got = spark.read.parquet(corpus_dir)
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    before = _rows(got, ["fp", "doc_id"])
    _corpus_ingest_body(corpus_dir, 8, backfill, 1)
    after = _rows(spark.read.parquet(corpus_dir), ["fp", "doc_id"])
    assert before == after


def test_watermark_stream_drops_late_and_emits_once(spark, sf_dir):
    """events_watermark_late_drop invariants beyond the oracle hash:
    every emitted window closed under the final watermark, no window
    emitted twice, and the held-back rows really were dropped (emitted
    totals are strictly below the all-rows batch rollup)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.registry import (
        REGISTRY,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.streaming_queries import (
        _WM_HOLD_DAYS,
        _WM_HOLD_MOD,
    )
    from apache_iceberg_with_clickhouse_olake_spark.streaming import (
        WM_DELAY_SECS,
        WM_WINDOW_SECS,
    )

    rows = REGISTRY["events_watermark_late_drop"].fn(spark, sf_dir).collect()
    assert rows
    starts = [r["window_start_epoch"] for r in rows]
    assert len(starts) == len(set(starts))  # exactly-once emission

    events = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp(F.col("ts").cast("timestamp"))
    min_es, max_es = events.agg(F.min(es), F.max(es)).first()
    wm = max_es - WM_DELAY_SECS
    t_hold = min_es + _WM_HOLD_DAYS * 86400
    assert all(s + WM_WINDOW_SECS <= wm for s in starts), (max(starts), wm)

    emitted_total = sum(r["n_events"] for r in rows)
    batch_total = events.filter(es + WM_WINDOW_SECS <= wm).count()
    held_dropped = events.filter(
        (F.col("event_id") % _WM_HOLD_MOD == 0) & (es < F.lit(t_hold))
    ).count()
    assert held_dropped > 0
    # emitted = on-time rows in closed windows; strictly fewer than the
    # all-rows batch count over the same horizon => drops really happened
    assert emitted_total < batch_total, (emitted_total, batch_total)
