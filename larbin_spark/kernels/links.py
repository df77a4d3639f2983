"""Link extraction over interleaved text+media span arrays.

The reference scans raw HTML for <a href>, <link href>, <frame src>,
<img src> and <base href> (file.cxx:597-798). Our payload is the span
model from BASELINE.json's input_hint: one document =
array<struct<kind,text,media_ref,offset>> with
kind in {text, anchor, base, frame, media}; anchor/frame spans carry
the raw outlink in `text`, media spans carry it in `media_ref`
(followed only under the getImage-equivalent config, cf.
file.cxx:696-699), and base spans rebase all subsequent links
(file.cxx:767-791).

The per-value cleaning reproduces parseContent (file.cxx:726-798):
backslash -> slash, stop at HTML value delimiters, drop the link
entirely when a CGI char (? = *) terminates it and getCGI is off, or
when it reaches maxUrlSize.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .urlnorm import MAX_URL_SIZE, ParsedUrl, check_valid, give_base, parse_url

_DELIMS = set('"\'\n >\r\t')
_CGI_CHARS = set("?=*")


def clean_link_text(raw: str, get_cgi: bool) -> Optional[str]:
    """parseContent value scan: returns the cleaned URL text, or None
    when the reference would skip this link."""
    out = []
    for i, ch in enumerate(raw):
        if i >= MAX_URL_SIZE:
            return None  # value hit maxUrlSize: forget it
        if ch in _DELIMS:
            return "".join(out)
        if ch in _CGI_CHARS and not get_cgi:
            return None  # CGI char terminates the scan: link skipped
        out.append("/" if ch == "\\" else ch)
    return "".join(out)


def clean_redirect_text(raw: str, get_cgi: bool) -> Optional[str]:
    """parseHeader30X location scan (file.cxx:541-556): stops at
    space/newline/CR; a CGI-char terminator (when getCGI is off)
    skips the redirect entirely."""
    out = []
    for ch in raw:
        if ch in " \n\r":
            return "".join(out)
        if ch in _CGI_CHARS and not get_cgi:
            return None
        out.append(ch)
    return "".join(out)


def rebase(base_text: str, get_cgi: bool) -> Optional[ParsedUrl] | bool:
    """<base href> handling (file.cxx:766-791).

    Returns a new ParsedUrl base, None when the new base is invalid
    (subsequent relative links die), or False when the tag is ignored
    (current base kept).
    """
    cleaned = clean_link_text(base_text, get_cgi)
    if cleaned is None or cleaned == "":
        return False
    end = len(cleaned) - 1
    while end > 7 and cleaned[end] != "/":
        end -= 1
    if end <= 7:
        return False  # base doesn't look good: keep the old one
    candidate = parse_url(cleaned[: end + 1], 0, None)
    if candidate is not None and check_valid(candidate) is not None:
        return candidate
    return None


def extract_links(spans: List[Tuple[str, Optional[str], Optional[str], int]],
                  page: ParsedUrl,
                  get_image: bool = False,
                  get_cgi: bool = False) -> List[ParsedUrl]:
    """Walk spans in offset order, maintaining the <base> state, and
    return the parsed outlinks in document order (depth = page.depth-1,
    matching file.cxx:764).

    spans: (kind, text, media_ref, offset) tuples.
    """
    base: Optional[ParsedUrl] = give_base(page)
    links: List[ParsedUrl] = []
    for kind, text, media_ref, _off in sorted(spans, key=lambda s: s[3]):
        if kind == "base":
            res = rebase(text or "", get_cgi)
            if res is not False:
                base = res  # may be None: kills later relative links
        elif kind in ("anchor", "frame"):
            cleaned = clean_link_text(text or "", get_cgi)
            if cleaned is None or cleaned == "":
                continue
            u = parse_url(cleaned, page.depth - 1, base)
            if u is not None:
                links.append(u)
        elif kind == "media":
            if get_image and media_ref:
                cleaned = clean_link_text(media_ref, get_cgi)
                if cleaned is None or cleaned == "":
                    continue
                u = parse_url(cleaned, page.depth - 1, base)
                if u is not None:
                    links.append(u)
        # kind == "text": no link
    return links


def render_content(spans: List[Tuple[str, Optional[str], Optional[str], int]]) -> str:
    """Deterministic page-text rendering used by the content-dup
    filter (the analogue of hashing the raw page buffer,
    file.cxx:583-588): concatenate span payloads in offset order."""
    parts = []
    for kind, text, media_ref, _off in sorted(spans, key=lambda s: s[3]):
        parts.append((media_ref if kind == "media" else text) or "")
    return "".join(parts)
