"""Oracle discipline tests (no Spark): invariants of the round model
(docs/ROUND_MODEL.md) on the deterministic synthetic web."""

from collections import defaultdict

import pytest

from larbin_spark.config import CrawlConfig
from larbin_spark.fixtures.webgen import gen_web, to_oracle_inputs
from larbin_spark.kernels.hashes import ip_hash, url_hash
from larbin_spark.kernels.urlnorm import parse_url
from larbin_spark.oracle.simulator import CrawlOracle


@pytest.fixture(scope="module")
def web():
    return gen_web(n_hosts=24, base_pages=14)


@pytest.fixture(scope="module")
def inputs(web):
    docs, hosts, robots, seeds = to_oracle_inputs(web)
    seeds = seeds + [f"http://site{h}.example.com/" for h in (5, 6, 7, 8, 9, 10, 11, 12)]
    return docs, hosts, robots, seeds


def run(inputs, cfg=None):
    docs, hosts, robots, seeds = inputs
    o = CrawlOracle(cfg or CrawlConfig(), docs, hosts, robots)
    return o.run(list(seeds), max_rounds=2000), o


def test_deterministic(inputs):
    r1, _ = run(inputs)
    r2, _ = run(inputs)
    assert r1 == r2


def test_terminates_with_empty_frontier(inputs):
    res, o = run(inputs)
    assert o._frontier_empty()
    assert res["rounds"] < 2000


def test_politeness_one_fetch_per_ip_bucket_per_round(inputs, web):
    res, o = run(inputs)
    host_ip = {h["host"]: h["ip"] for h in web["hosts"]}
    per_round = defaultdict(set)
    for rnd, _seq, url in res["ordering"]:
        p = parse_url(url, 0)
        b = ip_hash(host_ip[p.host])
        assert b not in per_round[rnd], f"bucket {b} fetched twice in round {rnd}"
        per_round[rnd].add(b)


def test_shared_ip_hosts_share_politeness_budget(inputs, web):
    """Hosts 0..5 share 3 IPs: two hosts on one IP can never both be
    fetched in the same round (the reference's per-IPSite rapid-fire
    guard, site.cxx:583-598)."""
    res, _ = run(inputs)
    host_ip = {h["host"]: h["ip"] for h in web["hosts"]}
    shared = defaultdict(list)
    for h, ip in host_ip.items():
        shared[ip].append(h)
    multi = {ip for ip, hs in shared.items() if len(hs) > 1}
    assert multi, "fixture must contain shared IPs"
    per_round_ip = defaultdict(set)
    for rnd, _seq, url in res["ordering"]:
        p = parse_url(url, 0)
        ip = host_ip[p.host]
        assert ip not in per_round_ip[rnd] or ip not in multi
        per_round_ip[rnd].add(ip)


def test_seen_contains_every_fetched_bucket(inputs):
    res, _ = run(inputs)
    seen = set(res["seen"])
    for _rnd, _seq, url in res["ordering"]:
        p = parse_url(url, 0)
        assert url_hash(p.host, p.port, p.path) in seen


def test_fetch_seq_dense_and_ordered(inputs):
    res, _ = run(inputs)
    seqs = [s for _r, s, _u in res["ordering"]]
    assert seqs == list(range(len(seqs)))
    rounds = [r for r, _s, _u in res["ordering"]]
    assert rounds == sorted(rounds)


def test_no_url_fetched_twice(inputs):
    res, _ = run(inputs)
    urls = [u for _r, _s, u in res["ordering"]]
    assert len(urls) == len(set(urls))


def test_error_taxonomy_coverage(inputs):
    res, _ = run(inputs)
    for err in ("success", "err30X", "err40X", "badType", "tooBig",
                "noDNS", "noConnection", "fastNoDns", "fastNoConn",
                "fastRobots", "forbiddenRobots", "urlDup"):
        assert res["errors"].get(err, 0) > 0, f"{err} not exercised"


def test_duplicate_and_tooDeep_variants(inputs):
    res, _ = run(inputs, CrawlConfig(page_no_duplicate=True, any_type=True,
                                     get_image=True, get_cgi=True))
    assert res["errors"].get("duplicate", 0) > 0
    assert res["errors"].get("tooDeep", 0) > 0


def test_lock_site_outsite(inputs):
    res, _ = run(inputs, CrawlConfig(lock_site=True))
    assert res["errors"].get("outSite", 0) > 0
    # with lockSite nothing crosses hosts: every fetched host is a seed host
    seed_hosts = {parse_url(s, 0).host for s in inputs[3]}
    for _r, _s, url in res["ordering"]:
        assert parse_url(url, 0).host in seed_hosts


def test_limit_page_stops(inputs):
    res, _ = run(inputs, CrawlConfig(limit_page=10))
    assert res["pages_ok"] <= 10 + 50  # stops at a round boundary


def test_redirects_are_followed_same_depth(inputs):
    """A 301's redirect target enters the frontier (err30X logged) and
    is eventually fetched if novel."""
    res, _ = run(inputs)
    redirected = [u for _r, u, e in
                  [(r, u, e) for r, u, e in res["fetch_log"]] if e == "err30X"]
    assert redirected
