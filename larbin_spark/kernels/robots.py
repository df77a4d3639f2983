"""robots.txt kernel: wildcard matcher, record parser, gate.

Re-expression of the reference semantics:
- robotsMatch        -> robots_match       (text.cxx:52-73)
- robots::parseRobots-> parse_robots       (file.cxx:172-250)
- nextToken          -> _next_token        (text.cxx:173-212)
- NamedSite::testRobots -> is_allowed      (site.cxx:383-392)

The parser keeps the *most specific* matching User-agent record
(substring match of our agent beats '*' beats none), normalizes each
Disallow value (leading '*' -> '/', force leading '/', then
fileNormalize), and keeps at most MAX_ROBOTS_ITEM entries.
"""

from __future__ import annotations

from typing import List, Optional

from .urlnorm import file_normalize

MAX_ROBOTS_ITEM = 256  # src/types.h:61
USER_AGENT = "larbin"  # src/global.cxx:160


def robots_match(pattern: str, path: str) -> bool:
    """True if *path* is forbidden by *pattern* ('*' wildcard skips to
    the next occurrence of the following literal char; a trailing '*'
    matches through end of string)."""
    i = 0
    j = 0
    la = len(pattern)
    while i < la:
        if pattern[i] == "*":
            i += 1
            nxt = pattern[i] if i < la else "\x00"
            if nxt == "\x00":
                # strchr(b+j, '\0') finds the terminator: match
                return True
            k = path.find(nxt, j)
            if k < 0:
                return False
            j = k
        else:
            if j >= len(path) or pattern[i] != path[j]:
                return False
            i += 1
            j += 1
    return True


def is_allowed(path: str, forbidden: List[str], ignore_robots: bool = False) -> bool:
    """NamedSite::testRobots: allowed unless any pattern matches."""
    if ignore_robots:
        return True
    return not any(robots_match(f, path) for f in forbidden)


def _next_token(text: str, pos: int, sep: str = ":") -> tuple[Optional[str], int]:
    """text.cxx nextToken: skip sep/whitespace and #-comments, then
    read a word terminated by sep/whitespace (or a quoted string)."""
    n = len(text)
    while True:
        if pos >= n:
            return None, pos
        c = text[pos]
        if c == sep or c in " \t\r\n":
            pos += 1
        elif c == "#":
            nl = text.find("\n", pos)
            if nl < 0:
                return None, n
            pos = nl + 1
        else:
            break
    deb = pos
    if text[pos] == '"':
        deb += 1
        pos += 1
        while pos < n and text[pos] != '"':
            pos += 1
    else:
        while pos < n and text[pos] != sep and text[pos] not in " \t\r\n":
            pos += 1
        if pos == deb:
            return None, pos
    tok = text[deb:pos]
    if pos < n:
        pos += 1
    return tok, pos


_KEYWORDS = ("useragent", "user-agent")


def parse_robots(body: str, user_agent: str = USER_AGENT,
                 max_items: int = MAX_ROBOTS_ITEM) -> List[str]:
    """Parse a robots.txt body into the forbidden-prefix list the
    reference would keep for *user_agent*.

    State: 0 = not concerned, 1 = weakly concerned ('*' record or
    initial), 2 = strongly concerned (record naming our agent).
    A strongly-concerned record ends the scan when the next
    User-agent line starts.
    """
    forbidden: List[str] = []
    items = 0
    state = 1
    pos = 0
    tok, pos = _next_token(body, pos)
    while tok is not None:
        low = tok.lower()
        if low in _KEYWORDS:
            if state == 2:
                return forbidden  # end of the strong record
            state = 0
            tok, pos = _next_token(body, pos)
            while tok is not None and tok.lower() not in _KEYWORDS and tok.lower() != "disallow":
                if user_agent.lower() in tok.lower():  # caseContain
                    state = 2
                elif state == 0 and tok == "*":
                    state = 1
                tok, pos = _next_token(body, pos)
            if state:
                # better record than older ones: drop what we had
                forbidden = []
                items = 0
            else:
                # skip this record entirely
                while tok is not None and tok.lower() not in _KEYWORDS:
                    tok, pos = _next_token(body, pos)
            continue  # tok already points at the next keyword
        elif low == "disallow":
            tok, pos = _next_token(body, pos)
            while tok is not None and tok.lower() not in _KEYWORDS and tok.lower() != "disallow":
                items += 1
                if items <= max_items:
                    if tok.startswith("*"):
                        tok = "/" + tok[1:]
                    elif not tok.startswith("/"):
                        tok = "/" + tok
                    norm = file_normalize(tok.encode("latin-1", "replace"))
                    if norm is not None:
                        forbidden.append(norm.decode("latin-1"))
                tok, pos = _next_token(body, pos)
            continue
        else:
            tok, pos = _next_token(body, pos)
    return forbidden
