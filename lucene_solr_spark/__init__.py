"""lucene_solr_spark — a PySpark-native full-text indexing & search engine.

A from-scratch re-expression of the capabilities of the upmem/lucene-solr
reference (Lucene core indexing/search + Solr distributed query/aggregation
layers) on top of Apache Spark DataFrames and vectorized Arrow UDFs.

Layers
------
- ``functions``  : pure numpy kernels (SmallFloat norm encoding, delta+varint
                   block codec with impacts, float32-exact BM25) plus the
                   analysis chain (tokenize/lowercase/stop) as pandas UDFs.
- ``operators``  : distributed operators — index build (per-partition posting
                   runs), tiered segment merge, BM25 top-k search, dedup,
                   similarity search, text statistics.
- ``plans``      : query AST (TermQuery/BooleanQuery/...) + classic query
                   parser subset.
- ``sources``    : corpus readers and the deterministic transcripts fixture
                   generator (FIXTURES.md).
- ``streaming``  : incremental index maintenance via Structured Streaming.

Nothing here ports reference code; reference files are cited in docstrings
(``reference path:line``) only to pin down the semantics being re-implemented.
"""

__version__ = "0.1.0"
