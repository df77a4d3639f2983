"""larbin_spark: a PySpark-native URL-frontier + fetch-scheduler
engine with the query/data-processing capabilities of the reference
crawler (ictxiangxin/larbin), rebuilt Spark-first.

Layers:
- kernels/    pure-Python parity kernels (canonicalizer, hashes,
              robots, link extraction, filters) shared by the oracle
              and the vectorized UDFs
- oracle/     single-threaded round-discipline simulator (the spec)
- fixtures/   deterministic synthetic-web generator
- functions/  pandas/Arrow UDFs wrapping the kernels
- operators/  DataFrame transformations (sequencer, politeness,
              dedup, extraction)
- plans/      crawl-round assembly + multi-round driver
- sources/    snapshot catalog (checkpoint/resume)
- pipeline/   training-data operators (dedup families, ANN,
              text analysis, multimodal plumbing)
"""

from .config import CrawlConfig

__all__ = ["CrawlConfig"]
__version__ = "0.1.0"
