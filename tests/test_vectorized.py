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
