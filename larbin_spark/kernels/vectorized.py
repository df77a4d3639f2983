"""Vectorized (numpy) fast paths for the hot kernels.

The seen-set hash (O-6) and canonicalizer (O-3) run on every URL of a
10^10-row frontier; a per-row Python loop inside the pandas UDF would
dominate the pipeline. These numpy implementations process whole
Arrow batches:

- url_hash_np: the Larbin polynomial hash as ~max_len masked
  vectorized ops over a padded byte matrix (signed-char semantics via
  +0xFFFFFF00 ≡ -256 mod 2^32; uint32 wraparound is numpy-native).
- canonicalize_batch: a vectorized pre-screen routes the overwhelming
  majority of already-clean absolute URLs through regex extraction;
  only URLs with escapes/dot-segments/etc fall back to the exact
  scalar kernel.

Parity: tests/test_vectorized.py fuzz-compares both against the
scalar kernels (which are themselves pinned to the C semantics).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from .hashes import HASH_SIZE
from .urlnorm import MAX_SITE_SIZE, MAX_URL_SIZE, parse_url


def _poly_fold(h: np.ndarray, mat: np.ndarray, lens: np.ndarray,
               mult: np.uint32) -> np.ndarray:
    """h = mult*h + signed(byte) column by column, masked by length."""
    n_cols = mat.shape[1]
    for j in range(n_cols):
        mask = lens > j
        if not mask.any():
            break
        c = mat[:, j].astype(np.uint32)
        c = c + np.where(c >= 128, np.uint32(0xFFFFFF00), np.uint32(0))
        h[mask] = h[mask] * mult + c[mask]
    return h


def _pad_matrix(strs: List[bytes]) -> Tuple[np.ndarray, np.ndarray]:
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=len(strs))
    width = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(strs), width), dtype=np.uint8)
    for i, s in enumerate(strs):
        mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    return mat, lens


def url_hash_np(host: pd.Series, port: pd.Series, path: pd.Series,
                hash_size: int = HASH_SIZE) -> np.ndarray:
    """Vectorized url::hashCode (url.cxx:474-482)."""
    hb = [(h or "").encode("latin-1") for h in host]
    pb = [(p or "").encode("latin-1") for p in path]
    h = port.to_numpy(dtype=np.int64).astype(np.uint32)
    m1, l1 = _pad_matrix(hb)
    h = _poly_fold(h, m1, l1, np.uint32(31))
    m2, l2 = _pad_matrix(pb)
    h = _poly_fold(h, m2, l2, np.uint32(31))
    return (h % np.uint32(hash_size)).astype(np.int64)


def site_hash_np(host: pd.Series, size: int = 20_000) -> np.ndarray:
    """Vectorized siteHashCode (url.cxx:40-46)."""
    hb = [(h or "").encode("latin-1") for h in host]
    m, lens = _pad_matrix(hb)
    h = np.zeros(len(hb), dtype=np.uint32)
    h = _poly_fold(h, m, lens, np.uint32(37))
    return (h % np.uint32(size)).astype(np.int32)


# --- canonicalizer fast path ---------------------------------------

# clean absolute url: http:// host [:port] / path where the path has
# no %-escape, no dot-segments, no //, no backslash, no fragment, no
# high-bit bytes, and the host needs only A-Z lowercasing
_FAST_RE = (r"^http://([A-Za-z0-9.\-]+)(?::(\d+))?"
            r"(/(?:[A-Za-z0-9_\-.~!$&'()*+,;=:@/]*)?)?$")
_SLOW_PATH_RE = r"(?:%|//|/\.|\\|#|\?)"


def canonicalize_batch(raw: pd.Series) -> pd.DataFrame:
    """Vectorized absolute-URL canonicalization with exact-kernel
    fallback. Returns columns host, port, path, url, valid."""
    s = raw.astype("string")
    m = s.str.extract(_FAST_RE)
    fast = m[0].notna()
    # fast path must not need path normalization
    path0 = m[2]
    fast &= ~path0.fillna("/").str.contains(_SLOW_PATH_RE, regex=True)
    # trailing '/.' or '/..' still need the state machine
    fast &= ~path0.fillna("/").str.endswith(".")

    host = m[0].str.lower()
    port = pd.to_numeric(m[1], errors="coerce").fillna(80).astype("int64") % 65536
    path = path0.fillna("/")
    # size caps (url.cxx:316-322)
    fast &= host.str.len() < MAX_SITE_SIZE
    fast &= (host.str.len() + path.str.len() + 18) < MAX_URL_SIZE

    n = len(s)
    out_host = np.empty(n, dtype=object)
    out_port = np.zeros(n, dtype=np.int64)
    out_path = np.empty(n, dtype=object)
    out_url = np.empty(n, dtype=object)
    out_valid = np.zeros(n, dtype=bool)

    fast_np = fast.fillna(False).to_numpy(dtype=bool)
    idx_fast = np.nonzero(fast_np)[0]
    if len(idx_fast):
        fh = host.to_numpy(dtype=object)
        fp = path.to_numpy(dtype=object)
        fport = port.to_numpy()
        # vectorized "http://host[:port]path" assembly
        port_sfx = pd.Series(
            np.where(fport == 80, "", ":" + port.astype(str)), dtype="string")
        furl = ("http://" + host + port_sfx + path).to_numpy(dtype=object)
        out_host[idx_fast] = fh[idx_fast]
        out_port[idx_fast] = fport[idx_fast]
        out_path[idx_fast] = fp[idx_fast]
        out_url[idx_fast] = furl[idx_fast]
        out_valid[idx_fast] = True
    for i in np.nonzero(~fast_np)[0]:
        u = parse_url(s.iloc[i] if s.iloc[i] is not pd.NA else "", 0, None)
        if u is None:
            out_valid[i] = False
        else:
            out_host[i], out_port[i], out_path[i] = u.host, u.port, u.path
            out_url[i] = u.url
            out_valid[i] = True
    return pd.DataFrame({
        "host": out_host, "port": out_port, "path": out_path,
        "url": out_url, "valid": out_valid})
