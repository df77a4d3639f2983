"""Hash kernels — bit-exact with the reference crawler.

These reproduce the C hash functions whose *collisions* are observable
behavior (dropped URLs / shared politeness buckets), so seen-set and
ordering parity require byte-identical arithmetic, including the
signed-char promotion of high-bit bytes and uint32 wraparound:

- url hash       -> hashes.url_hash        (url.cxx:474-482)
- site hash      -> hashes.site_hash       (url.cxx:40-46)
- ip hash        -> hashes.ip_hash         (site.cxx:424-436)
- content hash   -> hashes.content_hash    (hash_duplicate.cxx:83-95)

All return the bucket id (already reduced mod the table size); the
bucket id doubles as the distributed partition key for the exact
seen-set (SURVEY.md §1.3).
"""

from __future__ import annotations

HASH_SIZE = 64_000_000        # src/types.h:26 (seen set buckets)
DUP_SIZE = HASH_SIZE          # src/types.h:31 (content-dup buckets)
NAMED_SITE_LIST_SIZE = 20_000  # src/types.h:35
IP_SITE_LIST_SIZE = 10_000     # src/types.h:36

_U32 = 0xFFFFFFFF


def _signed(b: int) -> int:
    """char is signed in the reference: bytes >= 0x80 are negative."""
    return b - 256 if b >= 128 else b


def url_hash(host: str, port: int, path: str, hash_size: int = HASH_SIZE) -> int:
    """url::hashCode: h=port; h=31h+host[i]; h=31h+file[i]; h%hashSize."""
    h = port & _U32
    for b in host.encode("latin-1"):
        h = (31 * h + _signed(b)) & _U32
    for b in path.encode("latin-1"):
        h = (31 * h + _signed(b)) & _U32
    return h % hash_size


def site_hash(host: str, size: int = NAMED_SITE_LIST_SIZE) -> int:
    """siteHashCode: h = 37h + host[i]; h % namedSiteListSize."""
    h = 0
    for b in host.encode("latin-1"):
        h = (37 * h + _signed(b)) & _U32
    return h % size


def ip_hash(ip: str, size: int = IP_SITE_LIST_SIZE) -> int:
    """NamedSite::robotsResult ip hashing: over the 4 bytes of the
    in_addr (network byte order), ipHash = 31*ipHash + byte (signed),
    then % IPSiteListSize."""
    parts = [int(x) for x in ip.split(".")]
    h = 0
    for b in parts:
        h = (31 * h + _signed(b)) & _U32
    return h % size


def content_hash(doc: str | bytes, size: int = DUP_SIZE) -> int:
    """hashDup::testSet code: over chars strictly between 'A' and 'z'
    (signed chars, so high-bit bytes are excluded), with the modulo
    applied *inside* the loop: code = (23*code + c) % size."""
    if isinstance(doc, str):
        doc = doc.encode("utf-8", "surrogateescape")
    code = 0
    for b in doc:
        if 0x41 < b < 0x7A:  # 'A' < c < 'z'; b>=0x80 is negative -> excluded
            code = (23 * code + b) % size
    return code
