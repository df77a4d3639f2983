"""O-2: externally submitted URLs as a Structured Streaming source.

The reference accepts URLs on a TCP input port with a
"priority:%d depth:%u test:%u" header and one URL per line
(src/io/input.cxx:60-187): test=1 submissions dedup against the seen
set, test=0 force-set the seen bit; priority routes to the priority
queue. Here the same protocol rides a streaming source (file-drop
directory in tests — swap `format` for socket/kafka in production):
each line is `<priority> <depth> <test> <raw-url>`.

The stream canonicalizes (O-3 pandas UDF), computes the seen bucket,
and appends frontier-delta rows to a parquet staging directory that
the next crawl round unions in (entry point B joins the pipeline at
the sequencer, SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize_udf, url_bucket_udf


def parse_submissions(lines: DataFrame, hash_size: int = 64_000_000,
                      keep=(), url_tags: bool = False) -> DataFrame:
    """lines(value: string) -> frontier-delta rows with bucket ids.
    `keep`: extra input columns carried through (e.g. an ingest ts).
    url_tags: lines carry a URL_TAGS id before the url
    (`<priority> <depth> <test> <tag> <raw-url>` — the streaming form
    of the reference's "<id> <url>" tagged input, url.cxx:223-228);
    the tag column is 0 otherwise."""
    n_parts = 5 if url_tags else 4
    parts = F.split(F.col("value"), " ", n_parts)
    tag_col = (parts.getItem(3).cast("int") if url_tags
               else F.lit(0)).alias("tag")
    df = lines.select(
        parts.getItem(0).cast("int").alias("priority"),
        parts.getItem(1).cast("int").alias("depth"),
        parts.getItem(2).cast("int").alias("test"),
        tag_col,
        parts.getItem(n_parts - 1).alias("raw_url"), *keep)
    df = df.withColumn("c", canonicalize_udf(
        "raw_url", F.lit(None), F.lit(None), F.lit(None)))
    df = (df.filter(F.col("c.valid"))
          .select("priority", "depth", "test", "tag",
                  F.col("c.url").alias("url"), F.col("c.host").alias("host"),
                  F.col("c.port").alias("port"), F.col("c.path").alias("path"),
                  *keep))
    df = df.withColumn("bucket", url_bucket_udf(
        "host", "port", "path", F.lit(hash_size)))
    return df.withColumn(
        "queue", F.when(F.col("priority") > 0, "priority").otherwise("disk")) \
        .withColumn("force_seen", F.col("test") == 0)


def submission_stream(spark: SparkSession, drop_dir: str,
                      out_dir: str, checkpoint_dir: str,
                      hash_size: int = 64_000_000):
    """File-drop streaming intake -> parquet frontier staging.
    Returns the StreamingQuery (caller awaits/stops)."""
    lines = (spark.readStream.format("text")
             .option("maxFilesPerTrigger", 16)
             .load(drop_dir))
    delta = parse_submissions(lines, hash_size)
    return (delta.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_submission_rate(spark: SparkSession, drop_dir: str,
                             window: str = "10 seconds",
                             watermark: str = "30 seconds") -> DataFrame:
    """O-19 streaming analogue: per-host windowed submission counts
    with a watermark for late data (returns an unstarted streaming
    DataFrame; tests drive it with a memory sink)."""
    lines = (spark.readStream.format("text").load(drop_dir)
             .withColumn("ts", F.current_timestamp()))
    parts = F.split(F.col("value"), " ", 4)
    df = lines.select("ts", parts.getItem(3).alias("raw_url"))
    df = df.withColumn("c", canonicalize_udf(
        "raw_url", F.lit(None), F.lit(None), F.lit(None)))
    df = df.filter(F.col("c.valid")).select("ts", F.col("c.host").alias("host"))
    return (df.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "host")
            .agg(F.count("*").alias("n")))


def windowed_event_counts(events_stream: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window counts per event_type over any
    streaming DataFrame with (ts, event_type) — the O-19 windowed
    rate as a genuine Structured Streaming plan: watermark for late
    data, append output mode.

    Append-mode emission contract (pinned empirically + in the
    driver contract): a window row is emitted exactly when the final
    watermark passes its end, i.e. window_end <= max(event ts) -
    watermark delay. Trailing windows that the watermark never
    passes stay in state and are NOT emitted — that is the
    watermark semantics, not data loss; a live deployment emits
    them as later events arrive. (Spark truncates event times to
    ms when tracking the watermark, so the boundary is exact only
    away from sub-millisecond window-edge coincidences.)

    Scale: the streaming agg is a partial-agg + state-store update
    keyed on (window, event_type) — state is bounded by
    #types x #open-windows inside the watermark horizon, and the
    watermark evicts closed windows every batch.
    """
    from pyspark.sql.types import TimestampNTZType
    if isinstance(events_stream.schema["ts"].dataType, TimestampNTZType):
        # watermarks require TIMESTAMP; interpret parquet NTZ wall
        # time as UTC WITHOUT touching spark.sql.session.timeZone (a
        # plain cast shifts by the session zone and would misalign
        # the hour windows under a non-UTC driver)
        epoch_us = F.expr("timestampdiff(MICROSECOND, "
                          "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
        ts = F.timestamp_micros(epoch_us)
    else:
        ts = F.col("ts")
    return (events_stream.withColumn("ts", ts)
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n")))


SESSION_STATE_SCHEMA = "n_urls LONG, first_ts TIMESTAMP, last_ts TIMESTAMP"
SESSION_OUT_SCHEMA = ("host STRING, session_urls LONG, "
                      "session_seconds DOUBLE, closed BOOLEAN")


def host_session_tracker(spark: SparkSession, drop_dir: str,
                         gap_seconds: int = 30):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-host submission sessions with a gap timeout — the streaming
    analogue of the batch sessionize() in pipeline/analytics.py and
    the kind of per-key mutable state (NamedSite fifo occupancy,
    site.cxx:61-121) that has no built-in streaming counterpart.

    State per host = (url count, first-seen ts, last-seen ts). A host
    whose state sees no update for gap_seconds emits a closed session
    row via timeout and clears; the closed row's session_seconds is
    the REAL span last_ts - first_ts (not the gap constant). Returns
    an unstarted streaming DataFrame; drive with foreachBatch/memory
    sink + processingTime trigger.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout)

    lines = (spark.readStream.format("text").load(drop_dir)
             .withColumn("ts", F.current_timestamp()))
    parts = F.split(F.col("value"), " ", 4)
    df = lines.select("ts", parts.getItem(3).alias("raw_url"))
    df = df.withColumn("c", canonicalize_udf(
        "raw_url", F.lit(None), F.lit(None), F.lit(None)))
    df = df.filter(F.col("c.valid")) \
           .select("ts", F.col("c.host").alias("host"))

    def track(key, pdfs, state: GroupState):
        host = key[0]
        if state.hasTimedOut:
            (n, first_ts, last_ts) = state.get
            state.remove()
            dur = 0.0
            if first_ts is not None and last_ts is not None:
                dur = (last_ts - first_ts).total_seconds()
            yield pd.DataFrame({
                "host": [host], "session_urls": [n],
                "session_seconds": [dur],
                "closed": [True]})
            return
        n, first_ts, last_ts = (state.get if state.exists
                                else (0, None, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            t0 = pdf["ts"].min()
            t1 = pdf["ts"].max()
            first_ts = t0 if first_ts is None else min(first_ts, t0)
            last_ts = t1 if last_ts is None else max(last_ts, t1)
        state.update((n, first_ts, last_ts))
        state.setTimeoutDuration(gap_seconds * 1000)
        dur = 0.0
        if first_ts is not None and last_ts is not None:
            dur = (last_ts - first_ts).total_seconds()
        yield pd.DataFrame({
            "host": [host], "session_urls": [n],
            "session_seconds": [dur], "closed": [False]})

    return (df.groupBy("host").applyInPandasWithState(
        track, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
        "append", GroupStateTimeout.ProcessingTimeTimeout))


def deduped_submission_stream(spark: SparkSession, drop_dir: str,
                              out_dir: str, checkpoint_dir: str,
                              hash_size: int = 64_000_000,
                              watermark: str = "10 minutes"):
    """O-2 + O-6 in streaming form: intake with in-stream URL-seen
    dedup. dropDuplicatesWithinWatermark on the seen bucket keeps
    exactly one row per bucket among events inside the watermark —
    the streaming analogue of the batch first-wins dedup; the batch
    anti-join against the durable seen table still runs when the
    staged rows enter a crawl round (state here is bounded by the
    watermark, the authoritative set is the table).

    `test=0` rows (force-set) bypass the in-stream dedup — the
    reference sets the bit without checking (input.cxx:125-160)."""
    lines = (spark.readStream.format("text")
             .option("maxFilesPerTrigger", 16)
             .load(drop_dir)
             .withColumn("ts", F.current_timestamp()))
    delta = parse_submissions(lines, hash_size, keep=("ts",))
    test_rows = (delta.filter(~F.col("force_seen"))
                 .withWatermark("ts", watermark)
                 .dropDuplicatesWithinWatermark(["bucket"]))
    force_rows = delta.filter(F.col("force_seen"))
    out = test_rows.unionByName(force_rows).drop("ts")
    return (out.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
