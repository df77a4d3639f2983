"""O-2: streaming URL intake (file-drop source, availableNow trigger)
and the watermarked rate aggregation plan."""

import os

from pyspark.sql import functions as F

from larbin_spark.streaming.input_stream import (
    parse_submissions, submission_stream, windowed_submission_rate,
)


def test_parse_submissions_batch(spark):
    lines = spark.createDataFrame(
        [("1 5 1 http://EXample.com/a/../b.html",),
         ("0 3 0 http://other.org/x",),
         ("0 3 1 mailto:bob@x.com",),        # invalid -> dropped
         ("2 4 1 http://dup.com/",)],
        ["value"])
    out = parse_submissions(lines).collect()
    by_url = {r["url"]: r for r in out}
    assert "http://example.com/b.html" in by_url
    assert by_url["http://example.com/b.html"]["queue"] == "priority"
    assert by_url["http://other.org/x"]["queue"] == "disk"
    assert by_url["http://other.org/x"]["force_seen"] is True
    assert len(out) == 3  # mailto dropped
    assert all(r["bucket"] >= 0 for r in out)


def test_submission_stream_end_to_end(spark, tmp_path):
    drop = tmp_path / "drop"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    drop.mkdir()
    (drop / "batch1.txt").write_text(
        "1 5 1 http://a.com/one.html\n0 4 1 http://b.com/two.html\n")
    (drop / "batch2.txt").write_text("0 4 1 http://c.com/three.html\n")
    q = submission_stream(spark, str(drop), str(out), str(ckpt))
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    assert {r["url"] for r in rows} == {
        "http://a.com/one.html", "http://b.com/two.html",
        "http://c.com/three.html"}
    # exactly-once across a restart with no new files
    q2 = submission_stream(spark, str(drop), str(out), str(ckpt))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 3


def test_windowed_rate_plan_is_streaming(spark, tmp_path):
    drop = tmp_path / "drop2"
    drop.mkdir()
    (drop / "b.txt").write_text("0 4 1 http://a.com/x.html\n")
    df = windowed_submission_rate(spark, str(drop))
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("subrate")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # watermarked append-mode windows only emit once the watermark
    # passes; with a single micro-batch the table may be empty -- the
    # assertion is that the watermark+window plan executes
    assert spark.table("subrate").columns == ["window", "host", "n"]


def test_host_session_tracker_stateful(spark, tmp_path):
    """applyInPandasWithState: per-host state accumulates across
    micro-batches and emits running session rows."""
    from larbin_spark.streaming.input_stream import host_session_tracker
    drop = tmp_path / "drop3"
    drop.mkdir()
    (drop / "b1.txt").write_text(
        "0 4 1 http://a.com/x.html\n0 4 1 http://a.com/y.html\n"
        "0 4 1 http://b.com/z.html\n")
    df = host_session_tracker(spark, str(drop), gap_seconds=300)
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["host"]: r for r in spark.table("sessions").collect()}
    assert rows["a.com"]["session_urls"] == 2
    assert rows["b.com"]["session_urls"] == 1
    assert rows["a.com"]["closed"] is False


def test_deduped_submission_stream(spark, tmp_path):
    """In-stream URL-seen dedup: duplicate submissions inside the
    watermark collapse to one row; force-seen rows bypass."""
    from larbin_spark.streaming.input_stream import deduped_submission_stream
    drop = tmp_path / "drop4"
    drop.mkdir()
    (drop / "b1.txt").write_text(
        "0 4 1 http://a.com/x.html\n"
        "0 4 1 http://a.com/x.html\n"          # duplicate -> dropped
        "0 4 1 http://b.com/y.html\n"
        "0 4 0 http://a.com/x.html\n")         # force-seen -> kept
    out, ckpt = tmp_path / "out4", tmp_path / "ckpt4"
    q = deduped_submission_stream(spark, str(drop), str(out), str(ckpt))
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    urls = sorted((r["url"], r["force_seen"]) for r in rows)
    assert urls == [("http://a.com/x.html", False),
                    ("http://a.com/x.html", True),
                    ("http://b.com/y.html", False)]


def test_parse_submissions_url_tags(spark):
    """URL_TAGS line form: `<priority> <depth> <test> <tag> <url>`
    (the streaming form of the reference's tagged input,
    url.cxx:223-228)."""
    from larbin_spark.streaming.input_stream import parse_submissions
    lines = spark.createDataFrame(
        [("1 5 1 137 http://EX.com/a",),
         ("0 3 0 0 http://other.org/x",)], "value string")
    out = {r["url"]: r for r in
           parse_submissions(lines, url_tags=True).collect()}
    assert out["http://ex.com/a"]["tag"] == 137
    assert out["http://ex.com/a"]["priority"] == 1
    assert out["http://other.org/x"]["tag"] == 0
    assert out["http://other.org/x"]["force_seen"] is True
    # untagged form still yields tag 0
    lines2 = spark.createDataFrame([("0 5 1 http://y.org/p",)],
                                   "value string")
    out2 = parse_submissions(lines2).collect()[0]
    assert out2["tag"] == 0
