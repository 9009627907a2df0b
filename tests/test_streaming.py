"""Structured Streaming parity: streaming window results must equal the
batch formulation on the same (static) input — the property that lets the
DuckDB oracle stand in for the streaming surface."""

from __future__ import annotations

import uuid

from ntd_gtfs_to_socrata_spark.queries.time_windows import tw_session, tw_tumbling
from ntd_gtfs_to_socrata_spark.streaming import event_windows as EW


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = EW.read_events_stream(spark, sf_dir)
    agg = EW.tumbling_counts(stream)
    name = f"tumb_{uuid.uuid4().hex[:8]}"
    EW.run_available_now_to_memory(agg, name, output_mode="complete")
    got = spark.sql(f"SELECT * FROM {name}")
    want = tw_tumbling(spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_session_equals_batch(spark, sf_dir):
    stream = EW.read_events_stream(spark, sf_dir)
    agg = EW.session_counts(stream)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    EW.run_available_now_to_memory(agg, name, output_mode="complete")
    got = spark.sql(f"SELECT user_id, session_start, n_events FROM {name}")
    want = tw_session(spark, sf_dir).selectExpr(
        "user_id", "session_start", "n_events"
    )
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    target = str(tmp_path / f"t_{uuid.uuid4().hex[:6]}")
    stream = EW.read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    q = EW.foreach_batch_upsert(stream, target, key="event_id")
    q.awaitTermination()
    first = spark.read.parquet(target)
    n_events = first.count()
    assert n_events > 0
    # second run over the same source converges to the same state
    q2 = EW.foreach_batch_upsert(
        EW.read_events_stream(spark, sf_dir).select("event_id", "user_id", "event_type"),
        target,
        key="event_id",
    )
    q2.awaitTermination()
    assert spark.read.parquet(target).count() == n_events


def test_dedupe_within_watermark_key_coverage(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.streaming import stateful as ST

    stream = EW.read_events_stream(spark, sf_dir)
    deduped = ST.dedupe_within_watermark(stream, ["user_id", "event_type"])
    name = f"dwm_{uuid.uuid4().hex[:8]}"
    EW.run_available_now_to_memory(deduped, name, output_mode="append")
    got = spark.sql(f"SELECT DISTINCT user_id, event_type FROM {name}")
    # batch truth: one surviving row per distinct key
    from ntd_gtfs_to_socrata_spark.io import load_table

    batch_keys = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    assert got.count() == batch_keys.count()
    n_dedup = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
    assert n_dedup >= batch_keys.count()


def test_apply_in_pandas_with_state_totals_equal_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.streaming import stateful as ST

    stream = EW.read_events_stream(spark, sf_dir)
    totals = ST.running_user_totals(stream)
    name = f"rut_{uuid.uuid4().hex[:8]}"
    EW.run_available_now_to_memory(totals, name, output_mode="update")
    # final state per user = row with max running count (update mode may
    # emit one row per user per micro-batch)
    got = spark.sql(
        f"""SELECT user_id, max_by(n_events, n_events) AS n,
                   round(max_by(total_value, n_events), 2) AS total
            FROM {name} GROUP BY user_id"""
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    assert _rows(got, ["user_id", "n", "total"]) == _rows(want, ["user_id", "n", "total"])


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Genuine late-data discard: run 1 advances the watermark past a
    window's end (closing it); run 2 — same checkpoint — delivers an event
    that falls inside the closed window but behind the persisted watermark.
    Append-mode output must contain the window exactly once, WITHOUT the
    late event."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.Series([pd.Timestamp(r[1]) for r in rows]).astype("datetime64[us]"),
                "event_type": ["click"] * len(rows),
            }
        )
        pdf.to_parquet(src / name)

    def run_once():
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, event_type string")
            .format("parquet")
            .load(str(src))
        )
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two events in [10:00, 10:10) + one at 11:00 that pushes the
    # watermark past the window end, closing it
    write_batch("b1.parquet", [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:09:00"), (3, "2024-01-01 11:00:00")])
    run_once()
    # run 2: event 4 is LATE (10:05 < persisted watermark 11:00) -> dropped;
    # event 5 keeps the 11:00 window open (never emitted)
    write_batch("b2.parquet", [(4, "2024-01-01 10:05:00"), (5, "2024-01-01 11:05:00")])
    run_once()

    result = spark.read.parquet(str(out)).collect()
    closed = [r for r in result if r["window_start"].minute == 0 and r["window_start"].hour == 10]
    assert len(closed) == 1, f"closed window must emit exactly once: {result}"
    assert closed[0]["n"] == 2, f"late event leaked into closed window: {result}"


def test_stream_incremental_lsh_equals_batch_pipeline(spark, sf_dir):
    """The streaming incremental dedup's post-drain verdict must equal the
    batch dedup_lsh_pipeline row-for-row — the equality the shared DuckDB
    oracle rests on (union of per-batch band collisions = full collision
    set; CC/keep-one are order-independent)."""
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import dedup_lsh_pipeline
    from ntd_gtfs_to_socrata_spark.streaming.dedup_stream import (
        incremental_lsh_dedup,
    )

    got = {
        (r["doc_id"], r["component_id"], r["kept"])
        for r in incremental_lsh_dedup(spark, sf_dir, n_batches=3).collect()
    }
    want = {
        (r["doc_id"], r["component_id"], r["kept"])
        for r in dedup_lsh_pipeline(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_dedup_epoch_write_idempotent(spark, tmp_path):
    """Replaying an epoch (task retry / foreachBatch re-execution) must
    rewrite its own partition, not duplicate state rows — the
    effectively-once contract of the epoch-partitioned dynamic
    overwrite."""
    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.streaming.dedup_stream import _write_epoch

    path = str(tmp_path / "state")
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    _write_epoch(df, path, 0)
    _write_epoch(df, path, 1)
    _write_epoch(df, path, 1)  # replay epoch 1
    out = spark.read.parquet(path)
    assert out.count() == 10
    assert out.groupBy("epoch").count().count() == 2
    # the dynamic-overwrite conf must not leak into the session
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )
