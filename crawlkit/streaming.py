"""Structured Streaming surface over the crawl warehouse.

The reference is a request/response scraping service; the batch rebuild
makes a crawl a sequence of round jobs.  This module adds the engine's
continuous twin for consumers that want to TAIL a live crawl instead of
re-scanning committed rounds: file-source ingestion of the results
table, watermarked event-time rollups (late fetch records handled, not
dropped silently), stateful URL-seen dedupe with bounded state, and an
``applyInPandasWithState`` per-host budget — the custom-stateful-
operator shape (politeness quota) expressed in streaming form.

Scale notes: the file source lists only NEW files per trigger (the
round layout appends shard files, never rewrites), watermarks bound all
stateful stores, and per-host state is one counter row per host — the
same narrow keying as the batch politeness stage.  All operators work
under ``trigger(availableNow=True)`` for deterministic tests and
catch-up runs, and under continuous micro-batches in production.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .schema import RESULTS_SCHEMA
from .storage import Warehouse


def stream_results(spark: SparkSession, warehouse: str,
                   max_files_per_trigger: int | None = None,
                   committed_only: bool = True) -> DataFrame:
    """readStream over the warehouse results table.

    Default (``committed_only=True``): the source lists only rounds
    recorded in the warehouse manifest at stream-construction time, so
    a half-written (uncommitted) round is INVISIBLE — the same
    snapshot-isolation contract batch readers get.  This is the right
    mode for ``availableNow`` catch-up drains (build the stream fresh
    per drain; each run picks up rounds committed since).

    ``committed_only=False`` tails every shard file as it appears —
    read-uncommitted, for live monitoring of an in-flight round only.
    """
    reader = spark.readStream.schema(RESULTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.option("pathGlobFilter", "*.parquet")
    if not committed_only:
        return reader.parquet(f"{warehouse}/results/round=*")
    rounds = Warehouse(warehouse).committed_rounds("results")
    if not rounds:
        raise ValueError(
            f"no committed 'results' rounds in {warehouse} — "
            "commit a round first or pass committed_only=False"
        )
    alts = ",".join(str(r) for r in rounds)
    return reader.parquet(f"{warehouse}/results/round={{{alts}}}")


def windowed_status_rollup(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "3 hours",
    ts_col: str = "fetched_ts",
) -> DataFrame:
    """Event-time tumbling rollup of fetch outcomes with a late-data
    watermark (the streaming twin of the batch `w4` shape): rows per
    (window, status) plus exact byte volume.  Decimal-exact sum so the
    result is order-free — identical rows whether a window's data
    arrived in one trigger or ten."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "status")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.coalesce(F.col("page_len"), F.lit(0)).cast("decimal(38,0)"))
            .cast("long").alias("total_bytes"),
        )
        .select(F.col("w.start").alias("window_start"), "status",
                "n_pages", "total_bytes")
    )


def streaming_seen_dedupe(
    stream: DataFrame,
    watermark: str = "24 hours",
    ts_col: str = "fetched_ts",
) -> DataFrame:
    """Stateful URL-seen dedupe on a stream: first row per url_hash
    wins; ``dropDuplicatesWithinWatermark`` EVICTS per-key state once
    the key's event time falls behind the watermark (plain key-only
    ``dropDuplicates`` never expires state → OOM on an unbounded
    crawl).  A url seen again after the horizon re-emits — the
    streaming analog of the batch recrawl-freshness window."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )


_BUDGET_OUT = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), True),
        T.StructField("host_seq", T.LongType(), False),
        T.StructField("admitted", T.BooleanType(), False),
    ]
)
_BUDGET_STATE = T.StructType([T.StructField("n_seen", T.LongType(), False)])


def host_budget_stateful(stream: DataFrame, budget_per_host: int) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    running per-host admission counter (the politeness-budget shape,
    T4, as a streaming operator).  State is ONE counter per host —
    narrow, skew-proof keying; rows beyond the budget are emitted with
    ``admitted = false`` so downstream can defer them (never silently
    dropped)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values("url_canon", kind="mergesort")
            seqs = range(n + 1, n + len(pdf) + 1)
            out = pd.DataFrame(
                {
                    "host": host,
                    "url_canon": pdf["url_canon"].values,
                    "host_seq": list(seqs),
                    "admitted": [s <= budget_per_host for s in seqs],
                }
            )
            n += len(pdf)
            yield out
        state.update((n,))

    return (
        stream.select("host", "url_canon")
        .groupBy("host")
        .applyInPandasWithState(
            admit, _BUDGET_OUT, _BUDGET_STATE, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now_collect(
    stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "append",
) -> list:
    """Drain available data via ``foreachBatch`` and return the emitted
    rows.  Unlike the memory sink, foreachBatch supports RESUMING from
    a checkpoint, so repeated calls with the same checkpoint process
    only new input — the cron/catch-up tailing pattern (and how the
    tests prove state survives restarts).

    COLLECTS TO THE DRIVER — test/inspection helper for bounded
    deltas only.  The production drain is :func:`warehouse_sink`,
    which writes each epoch to the warehouse instead."""
    rows: list = []
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, _epoch: rows.extend(df.collect())
        )
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def run_available_now(
    stream_df: DataFrame, sink_table: str, checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """ONE-SHOT/TESTING ONLY: drain everything currently available
    through the streaming plan into an in-memory sink and return it as
    a DataFrame.  The memory sink cannot recover from a checkpoint — a
    second invocation reusing the same ``checkpoint_dir`` fails at
    start.  For cron-driven catch-up with a persistent checkpoint use
    :func:`run_available_now_collect` (driver-side rows) or
    :func:`warehouse_sink` (the production drain)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(sink_table)


def epoch_batch_writer(warehouse: str, table: str):
    """The idempotent micro-batch writer behind :func:`warehouse_sink`:
    epoch N always (re)writes ``{table}/epoch=N`` with mode=overwrite,
    so a replay after a mid-epoch crash (batch written, checkpoint not
    yet advanced) rewrites the SAME directory instead of appending
    duplicate rows — exactly-once output from at-least-once replay."""
    root = Path(warehouse) / table

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(str(root / f"epoch={epoch_id}"))

    return write_batch


def warehouse_sink(
    stream_df: DataFrame, warehouse: str, table: str, checkpoint_dir: str,
    output_mode: str = "append",
) -> str:
    """PRODUCTION drain: checkpointed ``foreachBatch`` into a parquet
    epoch layout under the warehouse.  Resumable (reuse the checkpoint
    dir across cron invocations — only new input is processed) and
    idempotent per epoch (see :func:`epoch_batch_writer`).  Returns the
    sink root; read it back with
    ``spark.read.parquet(f"{root}/epoch=*")``."""
    q = (
        stream_df.writeStream.foreachBatch(epoch_batch_writer(warehouse, table))
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return str(Path(warehouse) / table)


def read_epochs(spark: SparkSession, sink_root: str,
                latest_only: bool = False) -> DataFrame:
    """Read back a :func:`warehouse_sink` epoch layout.

    ``latest_only=False`` unions every epoch — correct for APPEND-mode
    sinks, where each epoch holds only that micro-batch's new rows.
    ``latest_only=True`` reads just the highest epoch — correct for
    COMPLETE-mode aggregate sinks, where every epoch rewrote the FULL
    result and earlier epochs are superseded snapshots."""
    root = Path(sink_root)
    epochs = sorted(
        int(p.name.split("=", 1)[1])
        for p in root.glob("epoch=*") if p.is_dir()
    )
    if not epochs:
        raise ValueError(f"no epochs under {sink_root}")
    if latest_only:
        return spark.read.parquet(str(root / f"epoch={epochs[-1]}"))
    return spark.read.parquet(*(str(root / f"epoch={e}") for e in epochs))
