"""Single-threaded Python oracle of the crawl-round discipline.

This is the executable specification (docs/ROUND_MODEL.md) that the
Spark pipeline must match exactly: same (round, seq, url) fetch
ordering, same final seen bucket set, same error taxonomy. It
re-states the reference crawler's queue semantics
(src/fetch/sequencer.cxx, src/fetch/site.cxx, src/fetch/checker.cxx,
src/fetch/file.cxx — see ROUND_MODEL.md for the full mapping) with
latency-free DNS/fetch and one round per politeness window.

Pure Python + the shared kernels; no Spark imports.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..config import CrawlConfig
from ..kernels.hashes import content_hash, ip_hash, site_hash, url_hash
from ..kernels.links import clean_redirect_text, extract_links, render_content
from ..kernels.robots import is_allowed, parse_robots
from ..kernels.urlfilter import filter1, match_priv_ext
from ..kernels.urlnorm import (ParsedUrl, give_base, merge_cookie,
                               parse_url, punycode_host)

# DnsState (site.h:29-34)
WAIT_DNS, DONE_DNS, ERROR_DNS, NOCONN_DNS = "wait", "done", "error", "noconn"

# FetchError taxonomy (types.h:108-127)
SUCCESS = "success"
TIMEOUT = "timeout"     # types.h:114, fed by timeoutPage/timeoutIncr
                        # (types.h:46-47, fetch_pipe.cxx:50-72); here a
                        # slow server times out before the status line
NO_DNS = "noDNS"
NO_CONNECTION = "noConnection"
FORBIDDEN_ROBOTS = "forbiddenRobots"
BAD_TYPE = "badType"
TOO_BIG = "tooBig"
ERR_30X = "err30X"
ERR_40X = "err40X"
DUPLICATE = "duplicate"
FAST_ROBOTS = "fastRobots"
FAST_NO_CONN = "fastNoConn"
FAST_NO_DNS = "fastNoDns"
TOO_DEEP = "tooDeep"
URL_DUP = "urlDup"
OUT_SITE = "outSite"


@dataclass
class QUrl:
    """A frontier URL with its queue position."""
    u: ParsedUrl
    qseq: int
    transfer_seq: int = -1
    cookie: Optional[str] = None   # url.h:126, useCookies only
    tag: int = 0                   # url.h:120-123 (URL_TAGS): user id
                                   # from the input port; redirects
                                   # inherit (file.cxx:551-553),
                                   # extracted links get 0 (ctor
                                   # url.cxx:185-187)


@dataclass
class Slot:
    """NamedSite slot (site.h:61-121): ONE identity at a time."""
    name: str = ""           # punycode host of the current identity
    port: int = 0
    dns_state: str = WAIT_DNS
    forbidden: List[str] = field(default_factory=list)
    nburls: int = 0
    fifo: deque = field(default_factory=deque)   # of QUrl
    in_dns: bool = False
    dns_expire_round: int = -1
    ip_hash: int = 0


@dataclass
class Bucket:
    """IPSite politeness bucket (site.h:123-147)."""
    fifo: deque = field(default_factory=deque)   # of QUrl
    last_fetch_round: int = -(10 ** 9)


class Document:
    __slots__ = ("spans", "status", "redirect_to", "content_type",
                 "length", "set_cookie", "slow")

    def __init__(self, spans, status=200, redirect_to=None,
                 content_type="text/html", length=0, set_cookie=None,
                 slow=False):
        self.spans = spans
        self.status = status
        self.redirect_to = redirect_to
        self.content_type = content_type
        self.length = length
        self.set_cookie = set_cookie
        # server too slow: the read deadline expires before the
        # status line arrives (timeoutPage, fetch_pipe.cxx:50-72)
        self.slow = slow


class CrawlOracle:
    """Round-based simulator. Inputs are plain dicts/lists mirroring
    the fixture tables (FIXTURES.md)."""

    def __init__(self, cfg: CrawlConfig,
                 documents: Dict[str, Document],
                 hosts: Dict[str, dict],       # host -> {dns_ok, ip}
                 robots: Dict[str, dict]):     # host -> {status, body, reachable}
        self.cfg = cfg
        self.documents = documents
        self.hosts = hosts
        self.robots = robots

        self.queues: Dict[str, deque] = {
            "priority_wait": deque(), "priority": deque(),
            "disk_wait": deque(), "disk": deque(),
        }
        self.slots: Dict[int, Slot] = {}
        self.buckets: Dict[int, Bucket] = {}
        self.seen: set[int] = set()
        self.dup_seen: set[int] = set()
        self.dns_queue: deque = deque()
        self.qseq = 0
        self.transfer_seq = 0
        self.fetch_seq = 0
        self.pages_ok = 0
        self.read_priority_wait = 0
        self.read_wait = 0
        # outputs
        self.ordering: List[Tuple[int, int, str]] = []   # (round, seq, url)
        self.fetch_log: List[Tuple[int, str, str]] = []  # (round, url, error)
        self.emitted: List[Tuple[int, int, str]] = []    # (round, seq, doc_id)
        self.cookies: List[Tuple[int, Optional[str]]] = []  # (seq, sent)
        self.tags: List[Tuple[int, int]] = []    # (seq, URL_TAGS id)
        self.errors: Dict[str, int] = {}

    # ---- helpers -------------------------------------------------

    def _slot(self, host: str) -> Slot:
        sid = site_hash(host, self.cfg.named_site_list_size)
        if sid not in self.slots:
            self.slots[sid] = Slot()
        return self.slots[sid]

    def _puny(self, host: str) -> str:
        return punycode_host(host) if self.cfg.punycode else host

    def _count_error(self, err: str) -> None:
        self.errors[err] = self.errors.get(err, 0) + 1

    def _forget(self, q: QUrl, reason: str, rnd: int) -> None:
        """forgetUrl (site.cxx:498-506): log + release slot RAM."""
        self._slot(q.u.host).nburls -= 1
        self.fetch_log.append((rnd, q.u.url, reason))
        self._count_error(reason)

    def _enqueue(self, u: ParsedUrl, queue: str,
                 cookie: Optional[str] = None, tag: int = 0) -> None:
        self.queues[queue].append(QUrl(u, self.qseq, cookie=cookie, tag=tag))
        self.qseq += 1

    def _urls_in_ram(self) -> int:
        return sum(s.nburls for s in self.slots.values())

    # ---- seed / check (checker.cxx:44-64) ------------------------

    def add_seed(self, raw: str) -> None:
        u = parse_url(raw, self.cfg.depth_in_site, None)
        if u is None:
            return
        self._check(u, None)

    def _check(self, u: ParsedUrl, rnd: Optional[int],
               cookie: Optional[str] = None, tag: int = 0) -> None:
        bucket = url_hash(u.host, u.port, u.path, self.cfg.hash_size)
        if bucket in self.seen:
            self._count_error(URL_DUP)
            return
        self.seen.add(bucket)
        if (self.cfg.specific_search and self.cfg.privileged_exts
                and match_priv_ext(u.path, self.cfg.privileged_exts)):
            self._enqueue(u, "priority", cookie, tag)
        else:
            self._enqueue(u, "disk", cookie, tag)

    def submit(self, raw: str, priority: int = 0, test: int = 1,
               tag: int = 0, depth: Optional[int] = None) -> None:
        """Entry point B: one input-port submission
        (input.cxx:125-160). test=1 -> testSet: an already-seen URL is
        dropped SILENTLY (no urlDup count — unlike checker.cxx);
        test=0 -> force-set the seen bit and enqueue regardless.
        priority>0 routes to URLsPriority. The tag is the URL_TAGS id
        parsed off the line (url.cxx:223-228)."""
        u = parse_url(raw, self.cfg.depth_in_site if depth is None else depth,
                      None)
        if u is None:
            return
        bucket = url_hash(u.host, u.port, u.path, self.cfg.hash_size)
        if test and bucket in self.seen:
            return
        self.seen.add(bucket)
        self._enqueue(u, "priority" if priority else "disk", None, tag)

    # ---- phase B: sequencer --------------------------------------

    _CLASS_LIMIT = {"priority_wait": 1, "priority": 5, "disk_wait": 10, "disk": 15}

    def _sequencer(self, rnd: int) -> None:
        budget = min(self.cfg.seq_per_round,
                     max(0, self.cfg.ram_urls - self._urls_in_ram()))
        taken: List[Tuple[str, QUrl]] = []
        while budget > 0:
            if self.read_priority_wait > 0 and self.queues["priority_wait"]:
                self.read_priority_wait -= 1
                taken.append(("priority_wait", self.queues["priority_wait"].popleft()))
            elif self.queues["priority"]:
                taken.append(("priority", self.queues["priority"].popleft()))
            elif self.read_wait > 0 and self.queues["disk_wait"]:
                self.read_wait -= 1
                taken.append(("disk_wait", self.queues["disk_wait"].popleft()))
            elif self.queues["disk"]:
                taken.append(("disk", self.queues["disk"].popleft()))
            else:
                break
            budget -= 1
        for cls, q in taken:
            self._put_generic(q, self._CLASS_LIMIT[cls], cls.startswith("priority"), rnd)

    def _put_generic(self, q: QUrl, limit: int, prio: bool, rnd: int) -> None:
        """NamedSite::putGenericUrl (site.cxx:136-207)."""
        cfg = self.cfg
        slot = self._slot(q.u.host)
        puny = self._puny(q.u.host)
        if slot.nburls > cfg.max_urls_by_site - limit:
            if slot.name == puny:
                if slot.dns_state == ERROR_DNS:
                    slot.nburls += 1
                    self._forget(q, NO_DNS, rnd)
                    return
                if slot.dns_state == NOCONN_DNS:
                    slot.nburls += 1
                    self._forget(q, NO_CONNECTION, rnd)
                    return
                if (q.u.port == slot.port and slot.dns_state == DONE_DNS
                        and not is_allowed(q.u.path, slot.forbidden, cfg.ignore_robots)):
                    slot.nburls += 1
                    self._forget(q, FORBIDDEN_ROBOTS, rnd)
                    return
            # bounce to the matching wait queue, fresh queue position
            self._enqueue(q.u, "priority_wait" if prio else "disk_wait",
                          q.cookie, q.tag)
            return
        slot.nburls += 1
        if (slot.dns_state == WAIT_DNS or slot.name != puny
                or slot.port != q.u.port or rnd > slot.dns_expire_round):
            slot.fifo.append(q)
            if not slot.in_dns:
                slot.in_dns = True
                self.dns_queue.append(site_hash(q.u.host, cfg.named_site_list_size))
        elif slot.dns_state == DONE_DNS:
            self._transfer(q, slot, rnd)
        elif slot.dns_state == ERROR_DNS:
            self._forget(q, NO_DNS, rnd)
        else:  # NOCONN_DNS
            self._forget(q, NO_CONNECTION, rnd)

    def _transfer(self, q: QUrl, slot: Slot, rnd: int) -> None:
        """NamedSite::transfer (site.cxx:482-496)."""
        if is_allowed(q.u.path, slot.forbidden, self.cfg.ignore_robots):
            q.transfer_seq = self.transfer_seq
            self.transfer_seq += 1
            b = self.buckets.setdefault(slot.ip_hash, Bucket())
            b.fifo.append(q)
        else:
            self._forget(q, FORBIDDEN_ROBOTS, rnd)

    # ---- phase C: DNS + robots -----------------------------------

    def _dns_round(self, rnd: int) -> None:
        cfg = self.cfg
        n = len(self.dns_queue)
        if cfg.dns_per_round:
            n = min(n, cfg.dns_per_round)
        for _ in range(n):
            sid = self.dns_queue.popleft()
            slot = self.slots[sid]
            if not slot.fifo:
                slot.in_dns = False
                continue
            # newId (site.cxx:395-408): identity := head of fifo
            head = slot.fifo[0]
            slot.name = self._puny(head.u.host)
            slot.port = head.u.port
            slot.dns_expire_round = rnd + max(
                1, (2 * 24 * 3600) // max(1, cfg.wait_duration))
            hostrec = self.hosts.get(slot.name)
            if hostrec is None or not hostrec.get("dns_ok", False):
                slot.dns_state = ERROR_DNS
                self._dns_err(slot, NO_DNS, rnd, sid)
                continue
            robrec = self.robots.get(slot.name)
            reachable = robrec.get("reachable", True) if robrec else True
            if not reachable:
                # robots fetch could not connect -> noConnDns
                slot.dns_state = NOCONN_DNS
                self._dns_err(slot, NO_CONNECTION, rnd, sid)
                continue
            slot.dns_state = DONE_DNS
            slot.ip_hash = ip_hash(hostrec["ip"], cfg.ip_site_list_size)
            if robrec is not None and 200 <= robrec.get("status", 404) < 300:
                slot.forbidden = parse_robots(
                    robrec.get("body", "") or "", cfg.user_agent, cfg.max_robots_item)
            # else: keep the previous forbidden list (the reference only
            # recycles it inside parseRobots, file.cxx:172-180)
            self._robots_result(slot, rnd, sid)

    def _dns_err(self, slot: Slot, err: str, rnd: int, sid: int) -> None:
        """NamedSite::dnsErr (site.cxx:345-380)."""
        residue = deque()
        for q in slot.fifo:
            if self._puny(q.u.host) == slot.name:
                self._forget(q, err, rnd)
            else:
                residue.append(q)
        slot.fifo = residue
        if slot.fifo:
            self.dns_queue.append(sid)
        else:
            slot.in_dns = False

    def _robots_result(self, slot: Slot, rnd: int, sid: int) -> None:
        """NamedSite::robotsResult (site.cxx:415-480), ok branch."""
        residue = deque()
        for q in slot.fifo:
            if self._puny(q.u.host) == slot.name:
                if slot.port == q.u.port:
                    self._transfer(q, slot, rnd)
                else:
                    residue.append(q)
            else:
                residue.append(q)
        slot.fifo = residue
        if slot.fifo:
            self.dns_queue.append(sid)
        else:
            slot.in_dns = False

    # ---- phase D: politeness schedule ----------------------------

    def _schedule(self, rnd: int) -> List[QUrl]:
        cfg = self.cfg
        eligible = []
        for bid, b in self.buckets.items():
            if b.fifo and b.last_fetch_round < rnd:
                eligible.append((b.fifo[0].transfer_seq, bid))
        eligible.sort()
        if cfg.fetch_cap_per_round:
            eligible = eligible[: cfg.fetch_cap_per_round]
        fetched = []
        for _, bid in eligible:
            b = self.buckets[bid]
            for _ in range(max(1, cfg.fetch_per_ip_per_round)):
                if not b.fifo:
                    break
                q = b.fifo.popleft()
                b.last_fetch_round = rnd
                # getUrl (site.cxx:552-563): release RAM for the host slot
                self._slot(q.u.host).nburls -= 1
                fetched.append(q)
        return fetched

    # ---- phase E: fetch + parse ----------------------------------

    def _fetch_parse(self, rnd: int, fetched: List[QUrl]) -> None:
        cfg = self.cfg
        for q in fetched:
            seq = self.fetch_seq
            self.fetch_seq += 1
            self.ordering.append((rnd, seq, q.u.url))
            # the Cookie header the request carried (site.cxx:612);
            # always null when use_cookies is off — recorded either
            # way so the parity compare is symmetric
            self.cookies.append((seq, q.cookie))
            self.tags.append((seq, q.tag))
            doc = self.documents.get(q.u.url)
            if doc is None:
                self.fetch_log.append((rnd, q.u.url, ERR_40X))
                self._count_error(ERR_40X)
                continue
            if doc.slow:
                # timeout preempts ALL parsing (including 30X): the
                # deadline fires before the status line is read
                self.fetch_log.append((rnd, q.u.url, TIMEOUT))
                self._count_error(TIMEOUT)
                continue
            if 300 <= doc.status < 400:
                if doc.redirect_to:
                    # parseHeader30X: same depth, isRedir=True; 30X
                    # headers do NOT capture cookies (addCookie is
                    # only called from parseHeader, file.cxx:469)
                    self._links(rnd, seq, q.u, [(doc.redirect_to, True)],
                                q.cookie, page_tag=q.tag)
                self.fetch_log.append((rnd, q.u.url, ERR_30X))
                self._count_error(ERR_30X)
                continue
            if not (200 <= doc.status < 300):
                self.fetch_log.append((rnd, q.u.url, ERR_40X))
                self._count_error(ERR_40X)
                continue
            ct = doc.content_type or ""
            if not ct.lower().startswith("text/html"):
                if cfg.any_type:
                    pass
                elif cfg.get_image and ct.lower().startswith("image"):
                    pass
                else:
                    self.fetch_log.append((rnd, q.u.url, BAD_TYPE))
                    self._count_error(BAD_TYPE)
                    continue
            if doc.length and doc.length > cfg.max_page_size:
                self.fetch_log.append((rnd, q.u.url, TOO_BIG))
                self._count_error(TOO_BIG)
                continue
            if cfg.page_no_duplicate:
                ch = content_hash(render_content(doc.spans), cfg.dup_size)
                if ch in self.dup_seen:
                    self.fetch_log.append((rnd, q.u.url, DUPLICATE))
                    self._count_error(DUPLICATE)
                    continue
                self.dup_seen.add(ch)
            # success: emit the document + its links in document order
            self.pages_ok += 1
            self.fetch_log.append((rnd, q.u.url, SUCCESS))
            self._count_error(SUCCESS)
            self.emitted.append((rnd, seq, q.u.url))
            links = extract_links(doc.spans, q.u, cfg.get_image, cfg.get_cgi)
            # 2xx headers were parsed (and cookies captured) before
            # the body, so links inherit the updated cookie
            page_cookie = (merge_cookie(q.cookie, doc.set_cookie)
                           if cfg.use_cookies else None)
            self._links(rnd, seq, q.u, [(l, False) for l in links],
                        page_cookie)

    def _links(self, rnd: int, seq: int, page: ParsedUrl, links,
               page_cookie: Optional[str] = None,
               page_tag: int = 0) -> None:
        """manageUrl + initOK + check per link (file.cxx:329-357,
        url.cxx:343-391, checker.cxx:44-64). Only redirect children
        inherit the page tag (file.cxx:551-553); extracted links get
        the ctor default 0."""
        cfg = self.cfg
        for item, is_redir in links:
            if isinstance(item, str):
                if not is_redir:
                    u = None
                else:
                    cleaned = clean_redirect_text(item, cfg.get_cgi)
                    u = (parse_url(cleaned, page.depth, give_base(page))
                         if cleaned else None)
            else:
                u = item
            if u is None:
                continue
            if not filter1(u.host, u.path, cfg.domains, cfg.forbidden_extensions):
                continue
            if not (cfg.external_links or is_redir or u.host == page.host):
                continue
            # initOK
            link_cookie = None
            if u.host != page.host:
                if cfg.lock_site:
                    self._count_error(OUT_SITE)
                    continue
                if cfg.depth_by_site:
                    u = u._replace(depth=cfg.depth_in_site)
            elif cfg.use_cookies:
                # same-site links inherit the cookie (url.cxx:358-364)
                link_cookie = page_cookie
            if u.depth < 0:
                self._count_error(TOO_DEEP)
                continue
            slot = self._slot(u.host)
            if slot.name == u.host and slot.port == u.port:
                if slot.dns_state == ERROR_DNS:
                    self._count_error(FAST_NO_DNS)
                    continue
                if slot.dns_state == NOCONN_DNS:
                    self._count_error(FAST_NO_CONN)
                    continue
                if (slot.dns_state == DONE_DNS
                        and not is_allowed(u.path, slot.forbidden, cfg.ignore_robots)):
                    self._count_error(FAST_ROBOTS)
                    continue
            self._check(u, rnd, link_cookie,
                        tag=page_tag if is_redir else 0)

    # ---- main loop -----------------------------------------------

    def _frontier_empty(self) -> bool:
        return (not any(self.queues.values())
                and not any(s.fifo for s in self.slots.values())
                and not any(b.fifo for b in self.buckets.values()))

    def run(self, seeds: List[str], max_rounds: Optional[int] = None,
            submissions: Optional[dict] = None) -> dict:
        """submissions: {round -> [(raw, priority, test, tag), ...]}
        delivered at the START of that round (entry point B joins the
        pipeline at the sequencer, SURVEY §3.2)."""
        for s in seeds:
            self.add_seed(s)
        cfg = self.cfg
        limit = max_rounds if max_rounds is not None else (cfg.max_rounds or 10 ** 9)
        rnd = 0
        while rnd < limit:
            if submissions and rnd in submissions:
                for raw, priority, test, tag in submissions[rnd]:
                    self.submit(raw, priority, test, tag)
            if self._frontier_empty():
                break
            if cfg.limit_page and self.pages_ok >= cfg.limit_page:
                break
            # phase A: valve (main.cxx:190-199)
            if rnd % cfg.valve_period == 0:
                self.read_priority_wait = len(self.queues["priority_wait"])
                self.read_wait = len(self.queues["disk_wait"])
            if rnd % cfg.valve_period == cfg.valve_open:
                self.read_priority_wait = 0
                self.read_wait = 0
            self._sequencer(rnd)
            self._dns_round(rnd)
            fetched = self._schedule(rnd)
            self._fetch_parse(rnd, fetched)
            rnd += 1
        return {
            "rounds": rnd,
            "ordering": self.ordering,
            "seen": sorted(self.seen),
            "errors": dict(sorted(self.errors.items())),
            "fetch_log": self.fetch_log,
            "emitted": self.emitted,
            "cookies": self.cookies,
            "tags": self.tags,
            "pages_ok": self.pages_ok,
        }
