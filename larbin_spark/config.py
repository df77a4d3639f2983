"""Crawl configuration.

Defaults mirror the reference crawler's compiled-in constants and
shipped configuration (src/types.h, src/global.cxx:157-163,
larbin.conf), plus the round-model parameters that translate the
1-second event-loop tick into batch crawl rounds (see
docs/ROUND_MODEL.md for the mapping and its justification).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import List, Optional

from .kernels.urlfilter import DEFAULT_FORBIDDEN_EXTENSIONS


@dataclass
class CrawlConfig:
    # --- reference semantics constants ---
    depth_in_site: int = 5          # global.cxx:159
    wait_duration: int = 60         # global.cxx:158 (politeness seconds/IP)
    max_urls_by_site: int = 64      # types.h:43 (per-site RAM fifo)
    ram_urls: int = 100_000         # types.h:39 (global in-RAM budget)
    hash_size: int = 64_000_000     # types.h:26 (seen-set buckets)
    dup_size: int = 64_000_000      # types.h:31 (content-dup buckets)
    named_site_list_size: int = 20_000  # types.h:35
    ip_site_list_size: int = 10_000     # types.h:36
    max_robots_item: int = 256      # types.h:61
    max_page_size: int = 8 * 1024 * 1024  # types.h:53
    user_agent: str = "larbin"      # global.cxx:160

    # behavior flags (conf-file booleans, global.cxx:355-388)
    external_links: bool = True     # noExternalLinks inverts
    depth_by_site: bool = False
    lock_site: bool = False
    ignore_robots: bool = False
    get_image: bool = False
    get_cgi: bool = False
    any_type: bool = False
    use_cookies: bool = False
    page_no_duplicate: bool = False
    specific_search: bool = False
    punycode: bool = False
    domains: Optional[List[str]] = None            # limitToDomain
    forbidden_extensions: List[str] = field(
        default_factory=lambda: list(DEFAULT_FORBIDDEN_EXTENSIONS))
    privileged_exts: List[str] = field(default_factory=list)

    # --- round model (1 round ~ one politeness window of
    # wait_duration seconds; see docs/ROUND_MODEL.md) ---
    seq_per_round: int = 6_000      # maxPerCall(100)/tick x wait_duration
    fetch_per_ip_per_round: int = 1  # one url per IPSite per waitDuration
    fetch_cap_per_round: int = 0     # 0 = unbounded (nb_conn is a latency
                                     # cap, meaningless with simulated fetch)
    dns_per_round: int = 0           # 0 = unbounded slot resolutions/round
    valve_period: int = 5            # rounds; analogue of the 300s window
    valve_open: int = 3              # first valve_open rounds of each period
                                     # drain the wait queues (main.cxx:190-199)

    # durable-commit cadence (O-16): snapshot every K round
    # boundaries. 1 = every round is durably resumable (the strictest
    # setting, default). The reference itself persists periodically,
    # not per-event (the seen hashtable is saved on a timer,
    # src/fetch/checker.cxx + global.cxx saveInterval; the disk fifos
    # sync in batches), so K>1 mirrors it while cutting ~7 parquet
    # write jobs from the per-round fixed cadence; resume lands on
    # the last committed boundary exactly. In-memory state between
    # commits stays localCheckpoint-truncated (plans/round.py:_lc),
    # so only the append-only tables carry K unions of lineage.
    snapshot_every: int = 1

    # write-behind durable commits (plans/crawl.py _AsyncCommitter):
    # the snapshot save at each boundary overlaps the next rounds'
    # compute on a background thread instead of blocking the round
    # loop — the reference likewise flushes its persistent fifos off
    # the crawl path (persistent_fifo.cxx write-behind rotation).
    # Resumability is unchanged (resume lands on the latest COMPLETED
    # snapshot; run_crawl joins all in-flight saves before
    # returning); results are bit-identical to the synchronous path
    # (parity tests run both). Synchronous boundaries still happen at
    # compactions and every RELOAD_ROUNDS rounds (stats reset).
    async_commit: bool = True

    # inline curation (pipeline/rowsigs): when True, phase F records a
    # per-page signature row (token count, quality, predicted
    # language, simhash, fingerprint) for every successful fetch into
    # the grow-only `curation` table. The signatures are per-row
    # column expressions fused into the projection over the round's
    # already-materialized pages — zero extra scans or shuffles per
    # round, vs re-reading the fetched corpus for each signature
    # after the crawl (the standalone pipeline/dedup/textstats
    # operators). Off by default: the reference crawler has no such
    # stage; this extends it toward the training-data pipeline.
    curate: bool = False

    # stop conditions (O-17)
    max_rounds: int = 0              # 0 = until frontier empty
    limit_page: int = 0              # 0 = unbounded successful pages
    limit_time_sec: int = 0          # 0 = unbounded; wall-clock budget
                                     # (limitTime, limit_time.cxx:30-48 —
                                     # the reference stops mid-flight; the
                                     # round model stops before the next
                                     # round, the nearest safe point)

    # seen-membership probe strategy (operators/membership.py): when
    # True and hash_size fits a broadcast (8 MB at the reference's
    # 64M), the per-round URL-seen probe is a broadcast-bitmap bit
    # test instead of a join against the seen table. Identical
    # semantics (bit set <-> bucket in seen); parity tests run both.
    seen_bitmap_broadcast: bool = False

    # widest bucket space the broadcast-bitmap probe is allowed to
    # carry: 2^33 buckets = 1 GiB of packed bits per executor — the
    # practical broadcast ceiling. Beyond it (SCALE.md §1 sizes the
    # 10^10 frontier at hash_size 2^40 = 128 GiB) the bitmap cannot
    # ride a broadcast; the exact range-sharded seen-table anti-join
    # is the path (a shard-per-executor bitmap would be the
    # engine-level alternative, not implemented here).
    MAX_BITMAP_BROADCAST_BUCKETS = 1 << 33

    def __post_init__(self) -> None:
        # the dup bitmap only exists when the content-dup gate is on
        # (plans/round.py builds bitmaps['dup_seen'] inside the
        # page_no_duplicate branch), so dup_size only constrains the
        # broadcast path in that case
        widest = max(self.hash_size,
                     self.dup_size if self.page_no_duplicate else 0)
        if self.seen_bitmap_broadcast and (
                widest > self.MAX_BITMAP_BROADCAST_BUCKETS):
            raise ValueError(
                "seen_bitmap_broadcast=True needs hash_size (and "
                "dup_size when page_no_duplicate=True) <= 2^33 "
                f"buckets (1 GiB of bits); got "
                f"hash_size={self.hash_size}, dup_size={self.dup_size}. "
                "Use the range-sharded seen-table join at scale-out "
                "bucket spaces (operators/membership.py docstring).")

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "CrawlConfig":
        return cls(**d)
