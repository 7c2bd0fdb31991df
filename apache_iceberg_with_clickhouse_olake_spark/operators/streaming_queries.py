"""Driver-visible batch twins for the streaming surface (C2 chunked
reads, C3 micro-batch cadence, C6 restart/exactly-once; reference:
OLake's chunked snapshot reads olake-config/source.json:8-15 and the
restartable sync semantics of olake-config/destination.json:96-98).

Each query stages the deterministic CDC change stream
(:func:`..operators.cdc.synthetic_change_events`) as ONE parquet file
per sequence step, then drains it through the real Structured
Streaming pipeline (:func:`..streaming.run_cdc_upsert_stream`,
``maxFilesPerTrigger=1`` => one micro-batch per file), and returns a
bounded rollup of the final state. The DuckDB oracle computes the same
rollup from the batch merge-on-read apply — so a green row proves the
incremental, chunked (and for C6: interrupted-and-restarted) stream
converges to exactly the batch answer.

Scale notes: the streamed state apply shuffles once per micro-batch on
the upsert key (uniform); checkpointing bounds reprocessing on restart
to unread files only. Output rollups are O(1) rows.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql
from ..sources.parquet import load_table
from ..streaming import run_cdc_upsert_stream
from .cdc import _EVENTS_WITH_TS_SQL, synthetic_change_events
from .registry import query

_STATE_ROLLUP_SQL = f"""
    WITH state AS (
      SELECT key, custkey, price
      FROM ({_EVENTS_WITH_TS_SQL})
      QUALIFY row_number() OVER (PARTITION BY key ORDER BY _seq DESC) = 1
        AND _op != 'd'
    )
    SELECT COUNT(*) AS live_rows,
           COUNT(DISTINCT custkey) AS live_customers,
           {dsum_sql('price')} AS live_revenue
    FROM state
"""


def _stage_seq_files(
    spark: SparkSession, sf_dir: str, events_dir: str, seqs: list[int]
) -> None:
    """Materialize one parquet FILE per sequence step (named seq{s}.parquet
    with ascending mtimes) so the file stream source sees an ordered,
    chunked backlog — the batch equivalent of OLake's chunked snapshot."""
    orders = load_table(spark, sf_dir, "orders")
    ev = synthetic_change_events(orders)
    for s in sorted(seqs):
        stage = os.path.join(events_dir, f"_stage_{s}")
        (
            ev.filter(F.col("_seq") == s)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(events_dir, f"seq{s}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        # FileStreamSource orders by modification time; pin it so the
        # micro-batch order matches sequence order deterministically.
        os.utime(dst, (1_700_000_000 + s, 1_700_000_000 + s))


def _state_rollup(spark: SparkSession, state_dir: str) -> DataFrame:
    state = spark.read.parquet(state_dir)
    out = state.agg(
        F.count("*").alias("live_rows"),
        F.countDistinct("custkey").alias("live_customers"),
        dsum("price", "live_revenue"),
    )
    # Snapshot before the temp lake dir is deleted (bounded: 1 row).
    return spark.createDataFrame(out.collect(), out.schema)


@query(
    "streaming_chunked_state",
    oracle=_STATE_ROLLUP_SQL,
    tags=("C2", "C3"),
)
def streaming_chunked_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3: drain the change stream one file per micro-batch
    (maxFilesPerTrigger=1 => 4 micro-batches) through the checkpointed
    foreachBatch upsert; the final state rollup must equal the batch
    merge-on-read apply (oracle)."""
    tmp = tempfile.mkdtemp(prefix="spark_graft_c2_")
    try:
        events_dir = os.path.join(tmp, "events")
        os.makedirs(events_dir)
        _stage_seq_files(spark, sf_dir, events_dir, [0, 1, 2, 3])
        state_dir = os.path.join(tmp, "state")
        run_cdc_upsert_stream(
            spark,
            events_dir,
            state_dir,
            os.path.join(tmp, "ckpt"),
            max_files_per_trigger=1,
        )
        return _state_rollup(spark, state_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "streaming_restart_state",
    oracle=_STATE_ROLLUP_SQL,
    tags=("C6", "C2"),
)
def streaming_restart_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 restart/exactly-once: drain the first half of the backlog, stop
    (simulated crash between syncs), stage the rest, restart against the
    SAME checkpoint (only unread files replay), then restart once more
    with nothing new (must be a no-op). Final state rollup must equal the
    one-shot batch apply (oracle)."""
    tmp = tempfile.mkdtemp(prefix="spark_graft_c6_")
    try:
        events_dir = os.path.join(tmp, "events")
        os.makedirs(events_dir)
        state_dir = os.path.join(tmp, "state")
        ckpt = os.path.join(tmp, "ckpt")
        # Run 1: snapshot + first updates, then "crash".
        _stage_seq_files(spark, sf_dir, events_dir, [0, 1])
        run_cdc_upsert_stream(
            spark, events_dir, state_dir, ckpt, max_files_per_trigger=1
        )
        # Run 2 (restart): backlog grew; checkpoint skips seq 0-1.
        _stage_seq_files(spark, sf_dir, events_dir, [2, 3])
        run_cdc_upsert_stream(
            spark, events_dir, state_dir, ckpt, max_files_per_trigger=1
        )
        # Run 3 (restart, no new data): exactly-once => state unchanged.
        run_cdc_upsert_stream(
            spark, events_dir, state_dir, ckpt, max_files_per_trigger=1
        )
        return _state_rollup(spark, state_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
