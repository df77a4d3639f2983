"""URL parsing + canonicalization kernel.

Pure-Python re-expression of the reference crawler's URL semantics
(ictxiangxin/larbin, `src/utils/url.cxx:82-172` fileNormalize,
`:488-529` parse, `:533-560` parseWithBase, `:566-594` normalize,
`:597-603` isProtocol, `:315-322` isValid, `:406-426` giveUrl).
These functions define the *canonical URL string* whose bytes feed the
seen-set hash (`hashes.py`), so they must be byte-exact with the C
semantics: hash parity == dedup parity == crawl-ordering parity.

No Spark imports here: kernels are shared by the Python oracle and by
the vectorized pandas UDFs (`larbin_spark/functions/udfs.py`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

MAX_URL_SIZE = 1024  # src/types.h:76
MAX_SITE_SIZE = 256  # src/types.h:77


class ParsedUrl(NamedTuple):
    host: str          # lowercased (ASCII A-Z only, like the reference)
    port: int
    path: str          # normalized path, always starts with '/'
    depth: int

    @property
    def url(self) -> str:
        """Canonical string form (reference giveUrl, url.cxx:409-426)."""
        if self.port == 80:
            return f"http://{self.host}{self.path}"
        return f"http://{self.host}:{self.port}{self.path}"


def _is_graph(c: int) -> bool:
    """C isgraph() in the C locale for a *signed char* argument.

    The reference passes a (possibly negative) char; glibc returns
    false for all negative non-EOF values, so bytes >= 0x80 are never
    "graph".
    """
    return 0x21 <= c <= 0x7E


def _hex_to_int(c: int) -> int:
    if 0x30 <= c <= 0x39:
        return c - 0x30
    if 0x61 <= c <= 0x66:
        return c - 0x61 + 10
    if 0x41 <= c <= 0x46:
        return c - 0x41 + 10
    return -1


def file_normalize(path: bytes) -> Optional[bytes]:
    """Normalize a path, reference fileNormalize (url.cxx:82-172).

    Collapses ``/./`` and ``//``, resolves ``/../`` (None if that
    escapes the root), truncates at ``#``, decodes ``%XX`` escapes
    whose value is a printable graph char, keeps ``%20``, rejects any
    other escape (bad hex, control chars, high-bit). Returns the
    normalized bytes or None if the URL must be rejected.

    Implemented as a faithful state machine over a NUL-terminated
    buffer so the in-place shifting semantics (including the decoded
    char being skipped, not re-examined) match exactly.
    """
    # 4 NUL sentinels: the reference's lookaheads (file[i+1..i+3]) may
    # inspect bytes past the terminator before a bounds-determining check
    buf = bytearray(path) + b"\x00\x00\x00\x00"

    def shift(dst: int, src: int) -> None:
        # for (j = src; buf[j] != 0; j++) buf[j - (src-dst)] = buf[j]
        j = src
        d = src - dst
        while buf[j] != 0:
            buf[j - d] = buf[j]
            j += 1
        buf[j - d] = 0

    i = 0
    while buf[i] != 0 and buf[i] != 0x23:  # '#'
        c = buf[i]
        if c == 0x2F:  # '/'
            if buf[i + 1] == 0x2E and buf[i + 2] == 0x2F:
                shift(i + 1, i + 3)            # suppress /./
            elif buf[i + 1] == 0x2F:
                shift(i + 1, i + 2)            # // -> /
            elif buf[i + 1] == 0x2E and buf[i + 2] == 0x2E and buf[i + 3] == 0x2F:
                if i == 0:
                    return None                # /../ at start: error
                j = i + 4
                i -= 1
                while i >= 0 and buf[i] != 0x2F:
                    i -= 1
                if i < 0:
                    return None                # no parent segment
                shift(i + 1, j)
            elif buf[i + 1] == 0x2E and buf[i + 2] == 0:
                return bytes(buf[: i + 1])     # trailing /.
            elif buf[i + 1] == 0x2E and buf[i + 2] == 0x2E and buf[i + 3] == 0:
                if i == 0:
                    return None                # /.. at start: error
                i -= 1
                while i >= 0 and buf[i] != 0x2F:
                    i -= 1
                if i < 0:
                    return None
                return bytes(buf[: i + 1])     # trailing /..
            else:
                i += 1
        elif c == 0x25:  # '%'
            v1 = _hex_to_int(buf[i + 1])
            v2 = _hex_to_int(buf[i + 2])
            if v1 < 0 or v2 < 0:
                return None
            dec = 16 * v1 + v2
            # signed char in the reference: >= 0x80 is negative
            dec_signed = dec - 256 if dec >= 128 else dec
            if _is_graph(dec_signed):
                buf[i] = dec
                shift(i + 1, i + 3)
                i += 1                         # decoded char is skipped
            elif dec_signed == 0x20:           # keep %20 escaped
                i += 3
            else:
                return None                    # bad url
        else:
            i += 1
    return bytes(buf[:i])


def percent_encode_high(path: bytes) -> bytes:
    """Reference normalize() second half (url.cxx:566-594): re-encode
    bytes with the high bit set as lowercase %xx escapes."""
    if all(b < 0x80 for b in path):
        return path
    out = bytearray()
    for b in path:
        if b >= 0x80:
            out += b"%%%02x" % b
        else:
            out.append(b)
    return bytes(out)


def normalize_path(path: bytes) -> Optional[bytes]:
    """fileNormalize + high-bit %-encoding (url.cxx:566-594)."""
    norm = file_normalize(path)
    if norm is None:
        return None
    return percent_encode_high(norm)


def _lower_ascii(b: int) -> int:
    """Reference lowerCase (text.cxx:33-39): A-Z only."""
    if 0x41 <= b <= 0x5A:
        return b + 0x20
    return b


def is_protocol(s: bytes) -> bool:
    """url::isProtocol (url.cxx:597-603): [alnum]* followed by ':'."""
    i = 0
    n = len(s)
    while i < n and (0x30 <= s[i] <= 0x39 or 0x41 <= s[i] <= 0x5A or 0x61 <= s[i] <= 0x7A):
        i += 1
    return i < n and s[i] == 0x3A


def _parse_hostport(arg: bytes, depth: int) -> Optional[ParsedUrl]:
    """url::parse (url.cxx:488-529), arg is the text after http://."""
    fin = 0
    n = len(arg)
    while fin < n and arg[fin] not in (0x2F, 0x3A):  # '/' ':'
        fin += 1
    if fin == 0:
        return None
    host = bytes(_lower_ascii(b) for b in arg[:fin])
    port = 80
    if fin < n and arg[fin] == 0x3A:
        port = 0
        fin += 1
        while fin < n and 0x30 <= arg[fin] <= 0x39:
            port = (port * 10 + arg[fin] - 0x30) & 0xFFFF  # uint16_t member
            fin += 1
    if fin >= n or arg[fin] != 0x2F:
        path = b"/"
    else:
        path = arg[fin:]
    return ParsedUrl(host.decode("latin-1"), port, path.decode("latin-1"), depth)


def parse_url(raw: str | bytes, depth: int,
              base: Optional[ParsedUrl] = None) -> Optional[ParsedUrl]:
    """The url(char*, int, url*) constructor (url.cxx:177-211).

    Absolute http:// URLs are parsed directly; other schemes are
    rejected; scheme-less strings are resolved against *base* (None
    base => rejected). Returns None for any invalid URL.
    """
    if isinstance(raw, str):
        raw = raw.encode("utf-8", "surrogateescape")
    if raw.startswith(b"http://"):
        p = _parse_hostport(raw[7:], depth)
        if p is None:
            return None
        norm = normalize_path(p.path.encode("latin-1"))
        if norm is None:
            return None
        return check_valid(p._replace(path=norm.decode("latin-1")))
    if base is None:
        return None
    if raw.startswith(b"http:"):
        return _parse_with_base(raw[5:], depth, base)
    if is_protocol(raw):
        return None  # mailto:, ftp:, javascript:, ...
    return _parse_with_base(raw, depth, base)


def _parse_with_base(u: bytes, depth: int, base: ParsedUrl) -> Optional[ParsedUrl]:
    """url::parseWithBase (url.cxx:533-560)."""
    if u.startswith(b"/"):
        path = u
    else:
        path = base.path.encode("latin-1") + u
    norm = normalize_path(path)
    if norm is None:
        return None
    return check_valid(
        ParsedUrl(base.host, base.port, norm.decode("latin-1"), depth))


def check_valid(p: Optional[ParsedUrl]) -> Optional[ParsedUrl]:
    """url::isValid (url.cxx:316-322)."""
    if p is None or not p.host:
        return None
    lh = len(p.host)
    if lh >= MAX_SITE_SIZE or lh + len(p.path) + 18 >= MAX_URL_SIZE:
        return None
    return p


def give_base(p: ParsedUrl) -> ParsedUrl:
    """url::giveBase (url.cxx:394-404): truncate path after last '/'."""
    path = p.path
    i = path.rfind("/")
    return p._replace(path=path[: i + 1], depth=0)


def punycode_host(host: str) -> str:
    """Per-label IDN->punycode (reference src/utils/punycode.cxx,
    applied per dot-separated label at url.cxx:331-338). Labels that
    fail to encode are kept as-is."""
    out = []
    for label in host.split("."):
        try:
            if all(ord(ch) < 128 for ch in label):
                out.append(label)
            else:
                out.append(label.encode("idna").decode("ascii"))
        except (UnicodeError, UnicodeDecodeError):
            out.append(label)
    return ".".join(out)


MAX_COOKIE_SIZE = 128  # types.h:80


def merge_cookie(old, new_val):
    """url::addCookie (url.cxx:605-631) for one captured Set-Cookie
    value (the part before ';' — headers WITHOUT a ';' are ignored by
    the reference, so the fixture's set_cookie column models only
    capturable values). Appends '; ' between values; the buffer is
    capped at maxCookieSize with a forced NUL at [max-1], i.e. 127
    content chars."""
    if new_val is None or new_val == "":
        return old
    s = new_val if old is None else f"{old}; {new_val}"
    return s[: MAX_COOKIE_SIZE - 1]
