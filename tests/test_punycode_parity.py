"""Punycode (O-4) coverage: kernel unit tests plus a Spark-vs-oracle
crawl over a fixture whose hosts include IDN names, with
cfg.punycode on (the reference's shipped test conf seeds an IDN URL,
larbin-test.conf:99)."""

import copy
import os

import pytest

from larbin_spark.config import CrawlConfig
from larbin_spark.fixtures.webgen import (gen_web, to_oracle_inputs,
                                          write_parquet)
from larbin_spark.kernels.urlnorm import punycode_host
from larbin_spark.oracle.simulator import CrawlOracle
from larbin_spark.plans.crawl import collect_results, run_crawl

IDN = "bücher0.example.com"


def test_punycode_host_kernel():
    assert punycode_host("bücher.example.com") == \
        "xn--bcher-kva.example.com"
    assert punycode_host("plain.example.com") == "plain.example.com"
    # per-label: only the IDN label is encoded
    assert punycode_host("café.shop.de") == "xn--caf-dma.shop.de"


def _idn_web():
    """gen_web with one host renamed to an IDN name; dim tables keyed
    by the punycode form (that is the name the resolver sees)."""
    web = copy.deepcopy(gen_web(n_hosts=8, base_pages=8))
    old = "site0.example.com"
    # Three forms of the same host, all computed via the kernels so
    # the fixture matches what the pipeline will produce:
    # - IDN (pretty, UTF-8): appears in seeds and span links; the
    #   canonicalizer keeps its raw bytes latin-1-style (C semantics)
    # - byte form: what canonicalized URLs carry -> doc_id keys
    # - punycode of the byte form: the resolver name -> dim keys
    from larbin_spark.kernels.urlnorm import parse_url
    byte_host = parse_url(f"http://{IDN}/", 0, None).host
    puny = punycode_host(byte_host)

    def sub_link(s):  # pretty form, goes through the canonicalizer
        return s.replace(old, IDN) if isinstance(s, str) else s

    def sub_doc(s):   # canonical byte form, matched against fetches
        return s.replace(old, byte_host) if isinstance(s, str) else s

    for d in web["documents"]:
        d["doc_id"] = sub_doc(d["doc_id"])
        d["redirect_to"] = sub_link(d.get("redirect_to"))
        for sp in d["spans"]:
            sp["text"] = sub_link(sp["text"])
            sp["media_ref"] = sub_link(sp["media_ref"])
    for h in web["hosts"]:
        if h["host"] == old:
            h["host"] = puny
    for r in web["robots"]:
        if r["host"] == old:
            r["host"] = puny
    for s in web["seeds"]:
        s["url"] = sub_link(s["url"])
    return web, byte_host


@pytest.fixture(scope="module")
def idn_setup(spark, tmp_path_factory):
    web, byte_host = _idn_web()
    d = tmp_path_factory.mktemp("idnweb")
    write_parquet(web, str(d))
    dims = {n: spark.read.parquet(os.path.join(str(d), f"{n}.parquet"))
            for n in ("documents", "hosts", "robots")}
    seeds = [s["url"] for s in sorted(web["seeds"],
                                      key=lambda s: s["order"])]
    return web, dims, seeds, byte_host


def test_idn_crawl_parity(spark, idn_setup):
    web, dims, seeds, byte_host = idn_setup
    cfg = CrawlConfig(punycode=True)
    st = run_crawl(spark, cfg, dims, list(seeds), max_rounds=5)
    sres = collect_results(st)

    docs, hosts, robots, _ = to_oracle_inputs(web)
    ores = CrawlOracle(CrawlConfig(punycode=True), docs, hosts,
                       robots).run(list(seeds), max_rounds=5)

    assert sres["ordering"] == ores["ordering"]
    assert set(sres["seen"]) == set(ores["seen"])
    assert sres["errors"] == ores["errors"]
    # the IDN host actually got crawled AND its pages resolved
    # (non-vacuous fixture: byte-form URLs match doc_ids)
    assert any(byte_host in u for _r, _s, u in sres["ordering"]), \
        "IDN host never fetched - fixture is vacuous"
    assert any(byte_host in u for _r, u, e in sres["fetch_log"]
               if e == "success"), "IDN fetches never succeeded"
