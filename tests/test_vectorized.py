"""Fuzz-parity of the numpy fast paths vs the scalar kernels (which
are themselves golden-pinned to the C semantics)."""

import random

import numpy as np
import pandas as pd

from larbin_spark.kernels.hashes import site_hash, url_hash
from larbin_spark.kernels.urlnorm import parse_url
from larbin_spark.kernels.vectorized import (
    canonicalize_batch, site_hash_np, url_hash_np,
)


def test_url_hash_np_parity():
    rng = random.Random(11)
    hosts, ports, paths = [], [], []
    for _ in range(800):
        hosts.append("".join(rng.choice("abcXYZ0129.-\xe9\xff")
                             for _ in range(rng.randint(1, 40))))
        ports.append(rng.choice([80, 8080, 0, 65535]))
        paths.append("/" + "".join(rng.choice("abz%./AZ09~\x80")
                                   for _ in range(rng.randint(0, 60))))
    got = url_hash_np(pd.Series(hosts), pd.Series(ports), pd.Series(paths))
    want = np.array([url_hash(h, p, f) for h, p, f in zip(hosts, ports, paths)])
    assert (got == want).all()


def test_site_hash_np_parity():
    hosts = ["example.com", "a", "\xe9\xff", "x" * 200, "HOST.org"]
    got = site_hash_np(pd.Series(hosts))
    want = np.array([site_hash(h) for h in hosts])
    assert (got == want).all()


def _rand_url(rng):
    kind = rng.random()
    host = "".join(rng.choice("abcXYZ09.-") for _ in range(rng.randint(1, 20)))
    path = "/" + "".join(rng.choice("abz%./AZ09~#\\=?xy")
                         for _ in range(rng.randint(0, 30)))
    port = rng.choice(["", ":8080", ":80", ":"])
    if kind < 0.75:
        return f"http://{host}{port}{path}"
    if kind < 0.85:
        return f"http://{host}{port}"
    if kind < 0.95:
        return f"mailto:{host}"
    return path  # relative without base -> invalid


def test_canonicalize_batch_parity():
    rng = random.Random(23)
    raws = [_rand_url(rng) for _ in range(1500)]
    raws += [
        "http://WWW.Example.COM/a/./b//c/../d.html#f",
        "http://example.com", "http://example.com:80/x",
        "http://example.com:8080/x", "http://example.com/%41",
        "http://example.com/%zz", "http://example.com/a/..",
        "http://example.com/a/.", "", None,
        "http://" + "h" * 300 + "/x",
        "http://ok.com/" + "p" * 1100,
        "http://ok.com/trailing.",
        # >5-digit / >18-digit ports: must route to the exact scalar
        # kernel (iterated uint16 arithmetic), and one such row must
        # not knock the whole batch off the arrow fast path
        "http://a.com:99999/x",
        "http://a.com:999999/x",
        "http://a.com:99999999999999999999/x",
        "http://a.com:18446744073709551617/x",
    ]
    out = canonicalize_batch(pd.Series(raws, dtype="object"))
    for i, raw in enumerate(raws):
        want = parse_url(raw or "", 0, None)
        if want is None:
            assert not out["valid"].iloc[i], f"{raw!r} should be invalid"
        else:
            assert out["valid"].iloc[i], f"{raw!r} should be valid"
            assert out["url"].iloc[i] == want.url, raw
            assert out["host"].iloc[i] == want.host
            assert int(out["port"].iloc[i]) == want.port
            assert out["path"].iloc[i] == want.path


def test_fast_path_actually_fast():
    """The clean-URL majority must take the vectorized branch (guard
    against a regression that silently routes everything through the
    scalar fallback)."""
    import time
    n = 20000
    raws = pd.Series([f"http://host{i % 997}.example.com/p/{i}.html"
                      for i in range(n)])
    t0 = time.time()
    out = canonicalize_batch(raws)
    dt = time.time() - t0
    assert out["valid"].all()
    assert dt < 2.0, f"fast path too slow: {dt:.2f}s for {n} rows"


def test_long_port_stays_on_arrow_path():
    """A single >18-digit-port row must not fail the arrow batch (the
    int64 cast is guarded), and both the arrow path and the pandas
    fallback must agree with the scalar kernel on long ports."""
    from larbin_spark.kernels.vectorized import (
        _canonicalize_batch_arrow, _canonicalize_batch_pandas,
    )
    raws = pd.Series([
        "http://clean.com/x",
        "http://a.com:99999999999999999999/x",
        "http://b.com:123456/y",
    ], dtype="object")
    for impl in (_canonicalize_batch_arrow, _canonicalize_batch_pandas):
        out = impl(raws)
        for i, raw in enumerate(raws):
            want = parse_url(raw, 0, None)
            assert out["valid"].iloc[i] == (want is not None), (impl, raw)
            if want is not None:
                assert out["url"].iloc[i] == want.url, (impl, raw)
                assert int(out["port"].iloc[i]) == want.port, (impl, raw)


def test_content_hash_np_matches_scalar():
    """Fuzz parity of the vectorized content hash against the pinned
    scalar kernel across doc shapes (empty, boundary chars 'A'/'z',
    non-ASCII multi-byte, short/long/skewed) and bucket sizes (the
    real DUP_SIZE, small primes, 1, and the 2^40 space some tests
    configure, which disables the uint32 column path)."""
    import random

    from larbin_spark.kernels.hashes import DUP_SIZE, content_hash
    from larbin_spark.kernels.vectorized import content_hash_np

    rng = random.Random(11)
    cases = ["", "a", "A", "B", "y", "z", "B" * 5000, "Q" * 256,
             "Q" * 257, "héllo wörld é" * 50, "xy" * 30000,
             " ".join(f"word{i}" for i in range(800))]
    for _ in range(300):
        cases.append("".join(chr(rng.randint(1, 0x2FF))
                             for _ in range(rng.randint(0, 600))))
    s = pd.Series(cases)
    for size in (DUP_SIZE, 997, 1, (1 << 27) + 1, 1 << 40):
        got = list(content_hash_np(s, size))
        want = [content_hash(x, size) for x in cases]
        assert got == want, size


def test_content_hash_np_null_and_batchwise():
    """Nulls hash like empty strings (the render feeds '' for null
    spans), and a mixed skewed batch routes long docs through the dot
    path and short docs through the column path with exact results."""
    from larbin_spark.kernels.hashes import DUP_SIZE, content_hash
    from larbin_spark.kernels.vectorized import content_hash_np

    s = pd.Series([None, "short doc here", "xy " * 200000, None,
                   "B" * 300], dtype="object")
    got = list(content_hash_np(s, DUP_SIZE))
    want = [content_hash(x or "", DUP_SIZE) for x in s]
    assert got == want
