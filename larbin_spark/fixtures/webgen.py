"""Deterministic synthetic-web generator (FIXTURES.md).

Produces the four fixture tables — documents (interleaved text+media
span arrays), hosts (DNS topology with shared IPs for politeness
collisions), robots (bodies exercising record selection + wildcards),
seeds — as plain Python rows, as pyarrow parquet files, and as the
dict form the oracle consumes. Seeded RNG: same seed -> same web.

Also provides gen_frontier(): a huge flat frontier (no link feedback)
for the scheduling+dedup throughput benchmark.
"""

from __future__ import annotations

import os
import random
import zlib
from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from ..oracle.simulator import Document

SPAN_FIELDS = [
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32()),
]
SPAN_TYPE = pa.struct(SPAN_FIELDS)

_TEXT_WORDS = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
               " eiusmod tempor incididunt ut labore et dolore magna aliqua").split()


def _mk_text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_TEXT_WORDS) for _ in range(n))


# one precomputed ~256-word paragraph, tiled for bulk page bodies:
# per-word rng draws at realistic page masses (hundreds of words x
# millions of pages) would dominate fixture generation time
_PARA = " ".join(_TEXT_WORDS[(i * 7) % len(_TEXT_WORDS)]
                 for i in range(256))


def _bulk_text(n_words: int) -> str:
    reps, rem = divmod(n_words, 256)
    parts = [_PARA] * reps
    if rem:
        parts.append(" ".join(_TEXT_WORDS[(i * 7) % len(_TEXT_WORDS)]
                              for i in range(rem)))
    return " ".join(parts)


def gen_web(seed: int = 42, n_hosts: int = 24, base_pages: int = 14,
            hot_hosts: int = 2, hot_factor: int = 8,
            page_links: int = 0, page_text_words: int = 0) -> dict:
    """Generate a linked synthetic web.

    Returns {"documents": [row...], "hosts": [...], "robots": [...],
    "seeds": [...]} where document rows carry the span arrays plus the
    simulation columns (status/redirect_to/content_type/length).

    `page_links` / `page_text_words` add realistic page mass — real
    pages carry tens of links and KBs of text, while the parity
    fixtures' 1-6 links / 3-20 words keep the oracle fast. Both
    default to 0: every existing fixture, digest and golden is
    byte-identical with the defaults. Extra anchors target existing
    pages (60% same-host, 40% cross-host, stride-deterministic); the
    bulk text span is prefixed with the page URL so hashDup's
    content hash stays unique per page.
    """
    rng = random.Random(seed)
    hosts: List[dict] = []
    # a few shared IPs force distinct hosts into one politeness bucket
    shared_ips = [f"10.0.0.{i}" for i in range(1, 4)]
    for h in range(n_hosts):
        name = f"site{h}.example.com" if h % 5 else f"SITE{h}.example.com".lower()
        if h < 6:
            ip = shared_ips[h % len(shared_ips)]  # pairs of hosts share an IP
        else:
            ip = f"10.{(h * 7) % 250}.{(h * 13) % 250}.{(h * 29) % 250 + 1}"
        hosts.append({
            "host": name, "port": 80,
            "dns_ok": (h % 11 != 7),      # a couple of dead-DNS hosts
            "ip": ip,
        })

    robots_rows: List[dict] = []
    for h, rec in enumerate(hosts):
        if h % 9 == 4:
            robots_rows.append({"host": rec["host"], "port": 80, "status": 404,
                                "body": "", "reachable": True})
        elif h % 13 == 6:
            robots_rows.append({"host": rec["host"], "port": 80, "status": 200,
                                "body": "", "reachable": False})
        elif h % 4 == 1:
            body = ("User-agent: googlebot\nDisallow: /google\n\n"
                    "User-agent: *\nDisallow: /private\nDisallow: *tmp\n")
            robots_rows.append({"host": rec["host"], "port": 80, "status": 200,
                                "body": body, "reachable": True})
        elif h % 4 == 3:
            body = ("User-agent: larbin\nDisallow: /no-larbin\n"
                    "User-agent: *\nDisallow: /\n")
            robots_rows.append({"host": rec["host"], "port": 80, "status": 200,
                                "body": body, "reachable": True})
        else:
            robots_rows.append({"host": rec["host"], "port": 80, "status": 200,
                                "body": "User-agent: *\nDisallow:\n",
                                "reachable": True})

    # page inventory: Zipf-ish sizes, hot hosts get hot_factor x pages
    pages: Dict[str, List[str]] = {}
    for h, rec in enumerate(hosts):
        n = base_pages * (hot_factor if h < hot_hosts else 1)
        n = max(2, int(n / (1 + (h % 5))))
        paths = ["/"]
        for p in range(1, n):
            # /private and *tmp* paths exist so robots gating fires
            d = rng.choice(["", "/docs", "/a/b", "/private", ""])
            suffix = "tmp.html" if p % 7 == 3 else ".html"
            paths.append(f"{d}/page{p}{suffix}")
        pages[rec["host"]] = paths

    all_pages = [(hrec["host"], p) for hrec in hosts for p in pages[hrec["host"]]]

    def page_url(host: str, path: str) -> str:
        return f"http://{host}{path}"

    documents: List[dict] = []
    for host, path in all_pages:
        url = page_url(host, path)
        # zlib.crc32, not hash(): str hashing is PYTHONHASHSEED-salted
        rng_doc = random.Random(zlib.crc32(f"{seed}|{url}".encode()))
        spans: List[dict] = []
        off = 0

        def add(kind, text=None, media_ref=None):
            nonlocal off
            spans.append({"kind": kind, "text": text,
                          "media_ref": media_ref, "offset": off})
            off += 1

        add("text", _mk_text(rng_doc, rng_doc.randint(3, 20)))
        own = pages[host]
        if path == "/":
            # hub page: dense same-host links (stresses the 64-slot
            # site fifo + wait-queue bounce on hot hosts)
            for target in own[1: 1 + min(len(own) - 1, 80)]:
                add("anchor", text=target)
            if host == hosts[0]["host"]:
                # cross-host links to robots-disallowed paths on
                # NOT-yet-resolved hosts: exercises forbiddenRobots at
                # transfer time (vs fastRobots at link time)
                for far in hosts[-3:]:
                    private = [p for p in pages[far["host"]]
                               if p.startswith("/private")]
                    if private:
                        add("anchor", text=page_url(far["host"], private[0]))
        n_links = rng_doc.randint(1, 6)
        for _ in range(n_links):
            r = rng_doc.random()
            if r < 0.55:
                # same-host link, often relative with canonicalizer noise
                target = rng_doc.choice(own)
                style = rng_doc.random()
                if style < 0.4:
                    add("anchor", text=page_url(host, target))
                elif style < 0.6 and target.startswith("/"):
                    add("anchor", text=target)          # absolute path
                elif style < 0.8:
                    noisy = target.replace("/", "/./", 1)
                    add("anchor", text=page_url(host, noisy) + "#frag")
                else:
                    add("anchor", text="." + target)    # relative-ish
            elif r < 0.85:
                oh = rng_doc.choice(hosts)["host"]
                target = rng_doc.choice(pages[oh])
                add("anchor", text=page_url(oh, target))
            elif r < 0.9:
                add("anchor", text=page_url(host, "/cgi-bin/q?x=1"))  # CGI
            elif r < 0.95:
                add("anchor", text="mailto:bob@" + host)             # protocol
            else:
                add("frame", text=page_url(host, rng_doc.choice(own)))
            if rng_doc.random() < 0.3:
                add("text", _mk_text(rng_doc, rng_doc.randint(2, 8)))
        if page_links:
            # realistic link mass: stride-deterministic targets (one
            # rng draw + crc per page, not per link — per-link draws
            # would dominate generation at millions of pages)
            base_i = rng_doc.randrange(len(own))
            page_crc = zlib.crc32(url.encode())
            for t in range(page_links):
                if t % 5 < 3:  # 60% same-host
                    add("anchor", text=page_url(
                        host, own[(base_i + t * 13 + 1) % len(own)]))
                else:
                    oh = hosts[(page_crc + t * 101) % len(hosts)]["host"]
                    op = pages[oh]
                    add("anchor", text=page_url(oh, op[(base_i + t) % len(op)]))
        if page_text_words:
            # bulk body mass; url prefix keeps the content hash unique
            k = page_text_words + (zlib.crc32(url.encode()) %
                                   (page_text_words // 4 + 1))
            add("text", url + " " + _bulk_text(k))
        if rng_doc.random() < 0.12:
            add("media", media_ref=page_url(host, f"/img{rng_doc.randint(0, 9)}.png"))
        if rng_doc.random() < 0.06:
            oh = rng_doc.choice(hosts)["host"]
            add("base", text=f"http://{oh}/rebased/")
            add("anchor", text="after-base.html")

        status, redirect_to, ctype, length = 200, None, "text/html", 1000
        sel = rng_doc.random() if path != "/" else 1.0  # hubs stay healthy
        if sel < 0.04:
            status = 301
            oh = rng_doc.choice(hosts)["host"]
            redirect_to = page_url(oh, rng_doc.choice(pages[oh]))
        elif sel < 0.07:
            status = 404
        elif sel < 0.09:
            ctype = "application/pdf"
        elif sel < 0.10:
            length = 9 * 1024 * 1024  # tooBig
        # slow servers (timeout, types.h:114) reuse `sel` — no extra
        # rng draw, so adding the taxonomy value left every other
        # fixture byte unchanged
        slow = 0.10 <= sel < 0.12
        # a deterministic subset of healthy pages sets a cookie (the
        # pre-';' value of a Set-Cookie header; useCookies path)
        set_cookie = (f"sid={zlib.crc32(url.encode()) & 0xFFFF}"
                      if status == 200 and rng_doc.random() < 0.25 else None)
        documents.append({
            "doc_id": url, "spans": spans, "status": status,
            "redirect_to": redirect_to, "content_type": ctype,
            "length": length, "set_cookie": set_cookie, "slow": slow,
        })

    # duplicate-content pair for the hashDup path: two clean same-host
    # hub-linked pages share identical spans
    clean = [i for i, d in enumerate(documents)
             if d["status"] == 200 and d["content_type"] == "text/html"
             and d["length"] == 1000 and not d["slow"]
             and d["doc_id"].startswith("http://site1.")]
    if len(clean) >= 2:
        documents[clean[1]]["spans"] = [dict(s) for s in documents[clean[0]]["spans"]]

    # deterministic timeout witness: the third seed's hub is a slow
    # server, so the `timeout` FetchError (types.h:114) fires in the
    # very first fetch round. Its pages stay reachable through
    # cross-host links (the 0.85 anchor branch), only the hub itself
    # times out.
    if n_hosts >= 3:
        slow_hub = page_url(hosts[2]["host"], "/")
        for d in documents:
            if d["doc_id"] == slow_hub:
                d["slow"] = True

    seeds = [{"url": page_url(hosts[i]["host"], "/"), "order": i}
             for i in range(min(4, n_hosts))]
    # a seed with canonicalizer noise + an uppercase host
    seeds.append({"url": f"http://{hosts[0]['host'].upper()}/docs/../", "order": len(seeds)})
    return {"documents": documents, "hosts": hosts,
            "robots": robots_rows, "seeds": seeds}


# ---- oracle adapters ----------------------------------------------

def to_oracle_inputs(web: dict) -> Tuple[dict, dict, dict, List[str]]:
    docs = {
        d["doc_id"]: Document(
            spans=[(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in d["spans"]],
            status=d["status"], redirect_to=d["redirect_to"],
            content_type=d["content_type"], length=d["length"],
            set_cookie=d.get("set_cookie"), slow=d.get("slow", False))
        for d in web["documents"]
    }
    hosts = {h["host"]: h for h in web["hosts"]}
    robots = {r["host"]: r for r in web["robots"]}
    seeds = [s["url"] for s in sorted(web["seeds"], key=lambda s: s["order"])]
    return docs, hosts, robots, seeds


# ---- parquet writers ----------------------------------------------

def write_parquet(web: dict, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    docs = web["documents"]
    doc_tbl = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
        "spans": pa.array([d["spans"] for d in docs], pa.list_(SPAN_TYPE)),
        "status": pa.array([d["status"] for d in docs], pa.int32()),
        "redirect_to": pa.array([d["redirect_to"] for d in docs], pa.string()),
        "content_type": pa.array([d["content_type"] for d in docs], pa.string()),
        "length": pa.array([d["length"] for d in docs], pa.int64()),
        "set_cookie": pa.array([d.get("set_cookie") for d in docs],
                               pa.string()),
        "slow": pa.array([d.get("slow", False) for d in docs], pa.bool_()),
    })
    # bounded row groups: a single giant row group is unsplittable,
    # which serializes the phase-E docs scan (the round deliberately
    # runs the per-page compute at SCAN partitioning — no repartition
    # — so scan parallelism is the input layout's job, exactly as on
    # a real cluster where tables arrive in many files/row groups)
    pq.write_table(doc_tbl, os.path.join(outdir, "documents.parquet"),
                   row_group_size=2048)
    hosts = web["hosts"]
    pq.write_table(pa.table({
        "host": pa.array([h["host"] for h in hosts], pa.string()),
        "port": pa.array([h["port"] for h in hosts], pa.int32()),
        "dns_ok": pa.array([h["dns_ok"] for h in hosts], pa.bool_()),
        "ip": pa.array([h["ip"] for h in hosts], pa.string()),
    }), os.path.join(outdir, "hosts.parquet"))
    robots = web["robots"]
    pq.write_table(pa.table({
        "host": pa.array([r["host"] for r in robots], pa.string()),
        "port": pa.array([r["port"] for r in robots], pa.int32()),
        "status": pa.array([r["status"] for r in robots], pa.int32()),
        "body": pa.array([r["body"] for r in robots], pa.string()),
        "reachable": pa.array([r["reachable"] for r in robots], pa.bool_()),
    }), os.path.join(outdir, "robots.parquet"))
    seeds = web["seeds"]
    pq.write_table(pa.table({
        "url": pa.array([s["url"] for s in seeds], pa.string()),
        "order": pa.array([s["order"] for s in seeds], pa.int32()),
    }), os.path.join(outdir, "seeds.parquet"))


def gen_frontier(n_urls: int, n_hosts: int, seed: int = 42,
                 dup_rate: float = 0.2) -> "pa.Table":
    """Flat synthetic frontier for the scheduling+dedup bench: Zipf
    host skew, a controlled duplicate rate. Generated vectorized in
    arrow; no link feedback."""
    import numpy as np
    import pyarrow.compute  # noqa: F401  (registers pa.compute)
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n_urls).astype(np.int64) % n_hosts
    page = rng.integers(0, max(1, int(n_urls * (1 - dup_rate))), size=n_urls)
    host = pa.compute.binary_join_element_wise(
        pa.array(["host"] * n_urls),
        pa.array(ranks.astype(str)),
        pa.array([".example.com"] * n_urls), "")
    url = pa.compute.binary_join_element_wise(
        pa.array(["http://"] * n_urls), host,
        pa.array(["/p"] * n_urls), pa.array(page.astype(str)),
        pa.array([".html"] * n_urls), "")
    return pa.table({"url": url, "host": host,
                     "depth": pa.array(np.full(n_urls, 5, np.int32))})
