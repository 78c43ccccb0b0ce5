"""Structured Streaming surface tests (crawlkit.streaming): warehouse
tailing, watermarked rollups, stateful dedupe, per-host budget state.
Everything runs under trigger(availableNow=True) so results are
deterministic; checkpoint reuse across runs proves state survival."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crawlkit.schema import RESULTS_SCHEMA


def _result_row(i: int, host: str, ts: dt.datetime, status: str = "ok",
                page_len: int = 100):
    url = f"https://{host}/p{i}"
    return (None, url, url, i, host, url, f"T{i}", {}, None, None,
            page_len, f"text {i}", "en", status, 0, ts, 1)


def _write_batch(spark, warehouse: str, rows, round_no: int = 1,
                 commit: bool = True) -> None:
    from crawlkit.storage import Warehouse

    spark.createDataFrame(rows, RESULTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{warehouse}/results/round={round_no}")
    if commit:
        wh = Warehouse(warehouse)
        wh.commit_round(round_no, {"results": wh.row_count("results", round_no)})


T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def test_windowed_rollup_matches_batch(spark, tmp_path):
    from crawlkit.streaming import (
        run_available_now, stream_results, windowed_status_rollup,
    )

    wh = str(tmp_path / "wh")
    rows = [
        _result_row(1, "a.example", T0, "ok", 100),
        _result_row(2, "a.example", T0 + dt.timedelta(minutes=20), "ok", 50),
        _result_row(3, "b.example", T0 + dt.timedelta(hours=1), "too_large", 7),
        _result_row(4, "b.example", T0 + dt.timedelta(hours=2), "ok", 9),
    ]
    _write_batch(spark, wh, rows)
    out = run_available_now(
        windowed_status_rollup(stream_results(spark, wh), "1 hour", "3 hours"),
        "rollup_sink", str(tmp_path / "ckpt"), output_mode="complete",
    ).toPandas().sort_values(["window_start", "status"], ignore_index=True)
    static = spark.read.schema(RESULTS_SCHEMA).parquet(
        f"{wh}/results/round=1"
    )
    batch = (
        static.groupBy(F.window("fetched_ts", "1 hour").alias("w"), "status")
        .agg(F.count("*").alias("n_pages"),
             F.sum("page_len").alias("total_bytes"))
        .select(F.col("w.start").alias("window_start"), "status",
                "n_pages", "total_bytes")
    ).toPandas().sort_values(["window_start", "status"], ignore_index=True)
    assert len(out) == 3
    assert out["n_pages"].tolist() == batch["n_pages"].tolist()
    assert out["total_bytes"].tolist() == batch["total_bytes"].tolist()
    assert out["window_start"].tolist() == batch["window_start"].tolist()


def test_streaming_seen_dedupe_state_survives_restart(spark, tmp_path):
    from crawlkit.streaming import (
        run_available_now_collect, stream_results, streaming_seen_dedupe,
    )

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    dedup = lambda: streaming_seen_dedupe(  # noqa: E731
        stream_results(spark, wh), watermark="24 hours"
    ).select("url_hash", "url_canon")

    _write_batch(spark, wh, [
        _result_row(1, "a.example", T0),
        _result_row(2, "a.example", T0 + dt.timedelta(minutes=1)),
    ])
    first = run_available_now_collect(dedup(), ckpt)
    assert sorted(r.url_hash for r in first) == [1, 2]

    # second batch: one duplicate url_hash (must NOT re-emit — dedupe
    # state lives in the checkpointed state store), one new
    _write_batch(spark, wh, [
        _result_row(1, "a.example", T0 + dt.timedelta(minutes=5)),
        _result_row(3, "a.example", T0 + dt.timedelta(minutes=6)),
    ], round_no=2)
    second = run_available_now_collect(dedup(), ckpt)
    assert sorted(r.url_hash for r in second) == [3]


def test_host_budget_stateful_counter_continues(spark, tmp_path):
    import pandas as pd

    from crawlkit.streaming import (
        host_budget_stateful, run_available_now_collect, stream_results,
    )

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    budget = lambda: host_budget_stateful(  # noqa: E731
        stream_results(spark, wh), budget_per_host=2
    )

    _write_batch(spark, wh, [
        _result_row(1, "a.example", T0),
        _result_row(2, "a.example", T0),
        _result_row(3, "a.example", T0),
        _result_row(9, "b.example", T0),
    ])
    first = pd.DataFrame(r.asDict() for r in run_available_now_collect(budget(), ckpt))
    a1 = first[first.host == "a.example"].sort_values("host_seq")
    assert a1.host_seq.tolist() == [1, 2, 3]
    assert a1.admitted.tolist() == [True, True, False]  # budget 2
    assert first[first.host == "b.example"].admitted.tolist() == [True]

    # new files: host a's counter must CONTINUE from checkpointed state
    _write_batch(spark, wh, [
        _result_row(4, "a.example", T0 + dt.timedelta(minutes=1)),
        _result_row(10, "b.example", T0 + dt.timedelta(minutes=1)),
    ], round_no=2)
    second = pd.DataFrame(r.asDict() for r in run_available_now_collect(budget(), ckpt))
    a2 = second[second.host == "a.example"]
    assert a2.host_seq.tolist() == [4] and a2.admitted.tolist() == [False]
    b2 = second[second.host == "b.example"]
    assert b2.host_seq.tolist() == [2] and b2.admitted.tolist() == [True]


def test_uncommitted_round_invisible_to_stream(spark, tmp_path):
    """VERDICT r2 #5: the streaming reader's default is the same
    snapshot isolation as batch — shard files of a round whose manifest
    commit has not happened yet must NOT be emitted."""
    import pytest as _pytest

    from crawlkit.streaming import run_available_now_collect, stream_results

    wh = str(tmp_path / "wh")
    _write_batch(spark, wh, [_result_row(1, "a.example", T0)], round_no=1)
    # round 2 staged but NOT committed
    _write_batch(spark, wh, [_result_row(2, "a.example", T0)], round_no=2,
                 commit=False)

    got = run_available_now_collect(
        stream_results(spark, wh).select("url_hash"),
        str(tmp_path / "ckpt1"),
    )
    assert sorted(r.url_hash for r in got) == [1]  # round 2 invisible

    # after commit, a fresh stream (new plan, new checkpoint) sees both
    from crawlkit.storage import Warehouse

    w = Warehouse(wh)
    w.commit_round(2, {"results": w.row_count("results", 2)})
    got = run_available_now_collect(
        stream_results(spark, wh).select("url_hash"),
        str(tmp_path / "ckpt2"),
    )
    assert sorted(r.url_hash for r in got) == [1, 2]

    # read-uncommitted tailing remains an explicit opt-in
    assert stream_results(spark, wh, committed_only=False) is not None

    # no committed rounds at all → loud error, not a silent empty stream
    with _pytest.raises(ValueError, match="no committed"):
        stream_results(spark, str(tmp_path / "empty-wh"))


def test_warehouse_sink_idempotent_across_restart(spark, tmp_path):
    """VERDICT r2 #5: crash AFTER an epoch's parquet write but BEFORE
    the checkpoint advances → the restarted query replays the epoch
    with the same epoch id, the writer overwrites the same directory,
    and the sink holds each input row exactly once."""
    import pytest as _pytest

    from crawlkit.streaming import (
        epoch_batch_writer, stream_results, warehouse_sink,
    )

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, wh, [
        _result_row(1, "a.example", T0),
        _result_row(2, "a.example", T0 + dt.timedelta(minutes=1)),
    ])

    # first attempt: the batch lands in the sink, then the query dies
    # before the commit (simulated downstream failure)
    writer = epoch_batch_writer(wh, "sink")

    def crashy(df, epoch_id):
        writer(df, epoch_id)
        raise RuntimeError("injected crash after write, before commit")

    q = (
        stream_results(spark, wh).select("url_hash", "url_canon")
        .writeStream.foreachBatch(crashy)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    first = spark.read.parquet(f"{wh}/sink/epoch=*")
    assert first.count() == 2  # rows written despite the crash

    # restart with the SAME checkpoint: epoch replayed idempotently
    root = warehouse_sink(
        stream_results(spark, wh).select("url_hash", "url_canon"),
        wh, "sink", ckpt,
    )
    final = spark.read.parquet(f"{root}/epoch=*")
    assert sorted(r.url_hash for r in final.collect()) == [1, 2]  # no dupes

    # further catch-up run with new data: only the delta is processed
    _write_batch(spark, wh, [_result_row(3, "b.example", T0)], round_no=2)
    warehouse_sink(
        stream_results(spark, wh).select("url_hash", "url_canon"),
        wh, "sink", ckpt,
    )
    final = spark.read.parquet(f"{root}/epoch=*")
    assert sorted(r.url_hash for r in final.collect()) == [1, 2, 3]
