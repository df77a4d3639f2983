"""URL predicate kernel: extension / domain filter (filter1).

Reference: checker.cxx:70-90 plus the shipped forbidden-extension list
(larbin.conf:134-141, loaded lowercased by global::manageExt,
global.cxx:440-455). Suffix matching is case-insensitive and
period-inclusive; paths ending in 'html', 'htm' or '/' always pass.
"""

from __future__ import annotations

from typing import List, Optional

# larbin.conf:134-141, lowercased like global::manageExt does
DEFAULT_FORBIDDEN_EXTENSIONS = [
    ".tar", ".gz", ".tgz", ".zip", ".z", ".rpm", ".deb",
    ".ps", ".dvi", ".pdf",
    ".png", ".jpg", ".jpeg", ".bmp", ".smi", ".tiff", ".gif",
    ".mov", ".avi", ".mpeg", ".mpg", ".mp3", ".qt", ".wav", ".ram", ".rm",
    ".jar", ".java", ".class", ".diff",
    ".doc", ".xls", ".ppt", ".mdb", ".rtf", ".exe", ".pps", ".so", ".psd",
]


def ends_with_ignore_case(suffix_lower: str, s: str) -> bool:
    """endWithIgnoreCase (text.cxx:97-109): byte-wise b[i]|0x20
    comparison against an already-lowercase suffix."""
    la = len(suffix_lower)
    lb = len(s)
    if la > lb:
        return False
    tail = s[lb - la:]
    return all(suffix_lower[i] == chr(ord(tail[i]) | 0x20) for i in range(la))


def filter1(host: str, path: str,
            domains: Optional[List[str]] = None,
            forbidden_extensions: Optional[List[str]] = None) -> bool:
    """checker.cxx filter1: domain allow-list (suffix match on host),
    then extension gate on the path."""
    if domains is not None:
        if not any(host.endswith(d) for d in domains):
            return False
    if not path:
        return False
    if (ends_with_ignore_case("html", path)
            or ends_with_ignore_case("htm", path)
            or path.endswith("/")):
        return True
    exts = DEFAULT_FORBIDDEN_EXTENSIONS if forbidden_extensions is None else forbidden_extensions
    return not any(ends_with_ignore_case(e, path) for e in exts)


def match_priv_ext(path: str, privileged_exts: List[str]) -> bool:
    """matchPrivExt (text.cxx:215-223): privileged-extension routing
    for specificSearch mode."""
    return any(ends_with_ignore_case(e.lower(), path) for e in privileged_exts)
