"""Plan-level guard for the phase-E fetch join: the documents dim
must never be a broadcast side (it is the largest table at crawl
scale); only the bounded scheduled batch (and the hit-set url list
derived from it) may be broadcast. Checks the actual physical plan of
the actual production function, with auto-broadcast disabled so every
BroadcastExchange in the plan comes from an explicit hint."""

import contextlib
import io
import re

from pyspark.sql import functions as F

from larbin_spark.plans.round import scale_safe_fetch_join


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _broadcast_inputs(plan: str):
    """Input column lists of every BroadcastExchange node (formatted
    explain details: '(N) BroadcastExchange' then 'Input [k]: [...]')."""
    out = []
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if b.startswith("BroadcastExchange"):
            m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
            out.append(m.group(1) if m else "")
    return out


def test_fetch_join_never_broadcasts_documents(spark):
    docs = spark.createDataFrame(
        [("http://a/1", [{"kind": "text", "text": "x", "media_ref": None,
                         "offset": 0}], 200, None, "text/html", 10, None),
         ("http://a/2", [], 200, None, "text/html", 5, None)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, d_status int, redirect_to string,"
        "content_type string, d_length int, set_cookie string")
    fetched = spark.createDataFrame(
        [("http://a/1", "a", 80, "/1", 3, None, 1, 2, 0, 0),
         ("http://gone/x", "gone", 80, "/x", 3, None, 1, 3, 1, 1)],
        "url string, host string, port int, path string, depth int,"
        "cookie string, slot_id int, ip_hash int, transfer_seq long,"
        "fetch_seq long")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = scale_safe_fetch_join(docs, fetched,
                                      materialize=lambda df: df)
        plan = _formatted_plan(pages)
        bc = _broadcast_inputs(plan)
        # both explicit broadcasts present (fetched batch + hit urls)
        assert len(bc) >= 2, plan
        for inputs in bc:
            assert "spans" not in inputs, inputs
            assert "doc_id" not in inputs, inputs
        assert "CartesianProduct" not in plan

        # outer semantics preserved: miss row survives with null doc
        rows = {r["url"]: r for r in pages.collect()}
        assert rows["http://a/1"]["doc_id"] == "http://a/1"
        assert rows["http://gone/x"]["doc_id"] is None
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
