"""Distributed inverted-index build.

Spark-first re-expression of the reference indexing chain
(``reference lucene/core/src/java/org/apache/lucene/index/
DefaultIndexingChain.java:385-441``, flush ``FreqProxTermsWriter.java:69-91``,
codec ``codecs/lucene50/Lucene50PostingsWriter.java:223-377``):

- one Spark task == one DWPT (``index/DocumentsWriterPerThread.java``): each
  input partition is analyzed and "flushed" into sorted, block-compressed
  posting runs entirely locally — **no shuffle touches raw postings**;
- one Arrow batch == one flush (a "run" ≈ a Lucene segment); ``run_id``
  encodes (partition, flush-seq) like Lucene segment names;
- collection/term statistics are plain DataFrame aggregations over the
  block summaries (``docCount``, ``sumTotalTermFreq`` per
  ``search/IndexSearcher.java:772,788``) — never over raw postings;
- the commit is an atomic write of the run files (Iceberg snapshot / parquet
  directory), the analog of ``IndexWriter.commit`` two-phase
  (``index/IndexWriter.java:3126-3164``).

Scale notes (10^12 turns / 1000 executors):
- the only shuffles in the whole build are (a) the optional
  ``repartitionByRange(doc_id)`` placement step and (b) the tiny ``terms`` /
  ``stats`` aggregations over block *summaries* (1 row per 128 postings,
  partial-aggregated map-side);
- term skew never concentrates on one task at build time because postings of
  a hot term stay split across runs (the salting axis is the run, analogous
  to the reference's per-segment postings; see merge.py for the bounded
  re-merge);
- doc_ids are globally stable, derived from the corpus order — never from
  ``monotonically_increasing_id`` — so results are invariant to partitioning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import unquote

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.analysis import Analyzer, standard_analyzer
from ..functions.bm25 import avg_field_length
from ..functions.codec import BLOCK_SIZE, pack_postings_blocks
from ..functions.smallfloat import int_to_byte4

# tagged-union schema emitted by the single-pass build UDF:
# row_type 0 = posting block; row_type 1 = doc metadata
_BUILD_SCHEMA = (
    "row_type int, term string, run_id bigint, block_id int, doc_id_base bigint, "
    "doc_id_max bigint, "
    "count int, doc_ids binary, tfs binary, norms binary, max_tf int, min_norm int, sum_tf bigint, "
    "positions binary, payloads binary"
)

POSTINGS_COLUMNS = [
    "term",
    "run_id",
    "block_id",
    "doc_id_base",
    "doc_id_max",
    "count",
    "doc_ids",
    "tfs",
    "norms",
    "max_tf",
    "min_norm",
    "sum_tf",
    "positions",
    "payloads",
]


@dataclass
class IndexConfig:
    analyzer: Analyzer = field(default_factory=standard_analyzer)
    text_col: str = "text"
    id_col: str = "doc_id"
    block_size: int = BLOCK_SIZE
    n_partitions: Optional[int] = None  # index partitions ("segments"); None = keep input
    index_positions: bool = False  # DOCS_AND_FREQS vs DOCS_AND_FREQS_AND_POSITIONS
    # per-occurrence payload stream (the .pay-file analog): None = off;
    # "pos_mod8" = token position & 7 (a TokenOffsetPayloadTokenFilter-class
    # payload: derived from the token stream, varies per occurrence);
    # "token_length" = len(term) (a NumericPayloadTokenFilter-class payload).
    # Implies index_positions semantics for the occurrence stream layout only
    # (positions themselves are stored independently).
    payload_mode: Optional[str] = None
    # analysis strategy: "regex" (pandas str.findall + factorize) or
    # "encoded" (byte-level numpy tokenizer -> dictionary codes, zero
    # per-token PyObjects).  Both are bit-identical (property-tested).
    # "regex" is the default: measured on this sandbox's VM, the encoded
    # path's large fresh-buffer allocations hit a pathological kernel
    # page-fault cost (~70% sys time) and lose 3x in-context despite
    # winning on allocation count; on bare-metal executors the encoded
    # path is the faster choice.
    analysis_mode: str = "regex"
    # postings block codec (PostingsFormat-SPI analog): "varint" (default)
    # or "for128" (bit-packed FOR blocks + ALL_VALUES_EQUAL, Lucene's format)
    codec: str = "varint"


@dataclass
class InvertedIndex:
    """The queryable index: four DataFrames + bound global stats.

    Analog of an ``IndexReader`` over a committed ``SegmentInfos``
    (``reference lucene/core/src/java/org/apache/lucene/index/
    SegmentInfos.java``).
    """

    postings: DataFrame  # term, run_id, block_id, doc_id_base, count, doc_ids, tfs, norms, max_tf, min_norm, sum_tf
    docs: DataFrame  # doc_id, dl, norm_byte
    terms: DataFrame  # term, df, ttf
    doc_count: int
    sum_ttf: int
    config: IndexConfig
    # live-docs analog: doc_ids deleted but not yet reclaimed by a merge
    # (reference index/IndexWriter.java deletes flip bits; stats keep counting
    # deleted docs until merge reclaims them — same here until expunge)
    deletes: Optional[DataFrame] = None

    @property
    def avgdl(self) -> np.float32:
        return avg_field_length(self.sum_ttf, max(self.doc_count, 1))

    def persist(self) -> "InvertedIndex":
        self.postings = self.postings.persist()
        self.docs = self.docs.persist()
        self.terms = self.terms.persist()
        return self

    def write(self, path: str, mode: str = "overwrite") -> None:
        """Commit the index to storage (parquet locally; Iceberg on a cluster).

        Postings are range-partitioned and sorted by term so term lookups
        prune at file + row-group level via min/max stats — the role the
        block-tree term dictionary + FST plays in the reference
        (``codecs/blocktree/BlockTreeTermsWriter.java:192-202``).
        """
        (
            self.postings.repartitionByRange("term")
            .sortWithinPartitions("term", "run_id", "block_id")
            .write.mode(mode)
            .parquet(f"{path}/postings")
        )
        self.docs.repartitionByRange(self.docs.rdd.getNumPartitions(), "doc_id").write.mode(mode).parquet(
            f"{path}/docs"
        )
        self.terms.write.mode(mode).parquet(f"{path}/terms")
        spark = self.postings.sparkSession
        stats_pdf = pd.DataFrame([{"doc_count": self.doc_count, "sum_ttf": self.sum_ttf}])
        spark.createDataFrame(stats_pdf).coalesce(1).write.mode(mode).parquet(f"{path}/stats")

    @staticmethod
    def read(spark: SparkSession, path: str, config: Optional[IndexConfig] = None) -> "InvertedIndex":
        stats = spark.read.parquet(f"{path}/stats").collect()[0]
        return InvertedIndex(
            postings=spark.read.parquet(f"{path}/postings"),
            docs=spark.read.parquet(f"{path}/docs"),
            terms=spark.read.parquet(f"{path}/terms"),
            doc_count=int(stats["doc_count"]),
            sum_ttf=int(stats["sum_ttf"]),
            config=config or IndexConfig(),
        )


def partition_offsets(placed: DataFrame) -> dict:
    """Per-partition cumulative row bases for an already-placed (range-
    partitioned + locally sorted, persisted) DataFrame — the tiny collect of
    the two-pass rank scheme, shared by :func:`assign_doc_ids` and
    ``sampling.shard_assign`` so the cache-recompute/partition-id-stability
    reasoning lives in one place."""
    counts = (
        placed.groupBy(F.spark_partition_id().alias("pid")).count().orderBy("pid").collect()
    )
    bases, acc = {}, 0
    for row in counts:
        bases[int(row["pid"])] = acc
        acc += int(row["count"])
    return bases


def assign_doc_ids(df: DataFrame, order_cols=("conv_id", "turn_idx"), n_partitions: Optional[int] = None) -> DataFrame:
    """Assign globally stable dense doc_ids from the stable corpus order.

    Two-pass partition-offset scheme (SURVEY.md §7): range-partition + sort by
    the stable key, count rows per partition (tiny collect), then add each
    partition's cumulative base to a local running index.  Equivalent to
    Lucene's ingestion-order per-segment docIDs + segment bases
    (``reference lucene/core/src/java/org/apache/lucene/index/
    DocIDMerger.java``) but global and reproducible at any partitioning —
    no global window, no ``monotonically_increasing_id``.
    """
    cols = list(order_cols)
    n = n_partitions or df.rdd.getNumPartitions() or 8
    # one shuffle + columnar cache; the cache feeds both the counting pass and
    # the id-assignment pass (SQL plans do not reuse exchanges across actions)
    placed = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    placed = placed.persist()
    bases = partition_offsets(placed)

    out_schema = "doc_id bigint, " + ", ".join(f"{f_.name} {f_.dataType.simpleString()}" for f_ in placed.schema.fields)

    def add_ids(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bases.get(pid, 0)
        seen = 0
        for pdf in iterator:
            ids = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            out = pdf.copy()
            out.insert(0, "doc_id", ids)
            yield out

    return placed.mapInPandas(add_ids, schema=out_schema)


def assign_doc_ids_sorted_source(
    spark: SparkSession, path: str, order_cols=("conv_id", "turn_idx")
) -> DataFrame:
    """Shuffle-free doc_id assignment for a SORTED source table.

    Fast path for the production layout: the transcripts table is written
    sorted by the stable key with range-disjoint files (Iceberg ``sortedBy``
    — SURVEY §4 index-sort row: "our stable (conv_id, turn_idx) sort IS the
    index sort").  Then global doc_ids follow from per-file row counts alone:

    1. a metadata pass aggregates (file, count, min_key) — a map-side count
       per file, shuffling ~1 row per file;
    2. files ordered by min_key give cumulative bases; rows get
       ``base[file] + position_in_file`` inside ``mapInPandas``.

    File splitting is disabled for the read (one task never sees a partial
    file), so in-file positions are well-defined.  Produces bit-identical
    doc_ids to :func:`assign_doc_ids` on the same (sorted) data — tested.
    """
    df, bases = _sorted_source_scan(spark, path, order_cols)
    src = df.withColumn("_file", F.input_file_name())
    out_schema = "doc_id bigint, " + ", ".join(
        f"{f_.name} {f_.dataType.simpleString()}" for f_ in df.schema.fields
    )

    def add_ids(iterator):
        seen: dict = {}
        for pdf in iterator:
            ids = _ids_for_batch(pdf["_file"].to_numpy(dtype=object), bases, seen)
            out = pdf.drop(columns=["_file"])
            out.insert(0, "doc_id", ids)
            yield out

    return src.mapInPandas(add_ids, schema=out_schema)


def _footer_file_meta(path: str, cols) -> Optional[list]:
    """Per-file (name, count, min_tuple, max_tuple) from parquet FOOTERS —
    no data scan at all.  Returns None when the layout or statistics make the
    footer route unsafe (non-local path, partitioned subdirs, missing or
    truncation-risky min/max), signalling the caller to fall back to the
    Spark metadata scan.

    Safe because it reproduces the Spark job's semantics exactly: the scan
    aggregates INDEPENDENT per-column min/max per file, which is what footer
    column statistics store, and both Spark (UTF8String) and parquet
    (UNSIGNED byte order) compare strings by UTF-8 bytes — which matches
    Python ``str`` code-point order for valid UTF-8.  String stats >= 60
    bytes trigger the fallback: parquet writers may truncate long binary
    min/max, and a truncated bound could mask a range overlap.

    Scale note: one footer read per file on the driver is the same metadata
    Iceberg keeps in its manifests; at 10^5+ files this loop becomes a tiny
    Spark job over file names (or an Iceberg manifest scan), never a data
    scan.
    """
    local = path[7:] if path.startswith("file://") else path
    if "://" in local or any(ch in local for ch in "*?["):
        return None
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(local):
            names = sorted(os.listdir(local))
            if any(
                os.path.isdir(os.path.join(local, n)) for n in names
            ):  # hive-partitioned layout: keys live in dir names, not footers
                return None
            files = [
                os.path.join(local, n)
                for n in names
                if not n.startswith(("_", ".")) and not n.endswith(".crc")
            ]
        elif os.path.isfile(local):
            files = [local]
        else:
            return None
        if not files:
            return None
        meta = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
            if any(c not in idx for c in cols):
                return None
            mins: dict = {}
            maxs: dict = {}
            for rg in range(md.num_row_groups):
                for c in cols:
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        return None
                    lo, hi = st.min, st.max
                    # writer-side stat truncation happens at a BYTE threshold
                    # (~64), so the guard must measure bytes: a multibyte
                    # UTF-8 stat truncated to 64 bytes can decode to <60 chars
                    if isinstance(lo, bytes):
                        if len(lo) >= 60 or len(hi) >= 60:
                            return None  # possible writer-side truncation
                        lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                    elif isinstance(lo, str) and (
                        len(lo.encode("utf-8")) >= 60 or len(hi.encode("utf-8")) >= 60
                    ):
                        return None  # possible writer-side truncation
                    mins[c] = lo if c not in mins else min(mins[c], lo)
                    maxs[c] = hi if c not in maxs else max(maxs[c], hi)
            if md.num_rows > 0 and md.num_row_groups == 0:
                return None
            key_min = tuple(mins[c] for c in cols) if md.num_row_groups else ()
            key_max = tuple(maxs[c] for c in cols) if md.num_row_groups else ()
            meta.append((os.path.basename(f), int(md.num_rows), key_min, key_max))
        return [m for m in meta if m[1] > 0]
    except Exception:
        return None


def _sorted_source_scan(spark: SparkSession, path: str, order_cols) -> tuple:
    """(df, file->base dict keyed by file BASENAME) for a sorted,
    range-disjoint parquet table — the shared metadata pass of the
    sorted-source fast paths.

    Fast route: per-file row counts and sort-key min/max come straight from
    parquet footers (:func:`_footer_file_meta`) — zero Spark jobs, so the
    build's only full pass over the corpus is the fused analyze+pack scan.
    Fallback (non-local storage, partitioned dirs, absent statistics): a
    2-column Spark aggregation keyed by ``input_file_name``.
    """
    cols = list(order_cols)
    # one task per file: no splitting (maxPartitionBytes >> file size) and no
    # packing (openCost == bin size). Session-level on purpose — the setting
    # must still hold when the returned (lazy) DataFrame is executed.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024**3))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024**3))
    df = spark.read.parquet(path)

    meta = _footer_file_meta(path, cols)
    if meta is None:
        rows = (
            df.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count("*").alias("cnt"),
                *[F.min(c).alias(f"_min_{c}") for c in cols],
                *[F.max(c).alias(f"_max_{c}") for c in cols],
            )
            .collect()
        )
        # input_file_name() yields a percent-encoded URI; unquote so both
        # routes (footer = raw fs basename, scan = URI basename) key bases
        # by the same raw name the executor-side lookup derives
        meta = [
            (
                unquote(r["file"].rsplit("/", 1)[-1]),
                int(r["cnt"]),
                tuple(r[f"_min_{c}"] for c in cols),
                tuple(r[f"_max_{c}"] for c in cols),
            )
            for r in rows
        ]
    if len({m[0] for m in meta}) != len(meta):
        # basename keys assume one directory of files; a multi-dir glob can
        # repeat part-file names and silently corrupt the id bases — refuse
        raise ValueError(
            "duplicate file basenames across the source — read a single "
            "table directory, or use assign_doc_ids (shuffle path)"
        )
    meta.sort(key=lambda m: m[2])
    # files must be range-disjoint in the sort key, or doc ids would not
    # reproduce the global order — refuse and point at the shuffle path
    for prev_m, m in zip(meta, meta[1:]):
        if m[2] < prev_m[3]:
            raise ValueError(
                "source files overlap in the sort key — not a sorted table; "
                "use assign_doc_ids (shuffle path) instead"
            )
    bases, acc = {}, 0
    for name, cnt, _lo, _hi in meta:
        bases[name] = acc
        acc += cnt
    return df, bases


def _ids_for_batch(files: np.ndarray, bases: dict, seen: dict) -> np.ndarray:
    """Global doc ids for one Arrow batch of a whole-files-per-task scan:
    ``base[file] + running offset within file`` (files appear in contiguous
    runs because a task never sees a partial file).  ``bases`` is keyed by
    RAW file basename — ``input_file_name()`` URIs are percent-encoded, so
    the lookup unquotes the URI basename before indexing ``bases``."""
    ids = np.empty(len(files), dtype=np.int64)
    start = 0
    while start < len(files):
        f_name = files[start]
        end = start
        while end < len(files) and files[end] == f_name:
            end += 1
        off = seen.get(f_name, 0)
        base = bases[unquote(str(f_name).rsplit("/", 1)[-1])]
        ids[start:end] = base + off + np.arange(end - start, dtype=np.int64)
        seen[f_name] = off + (end - start)
        start = end
    return ids


def _flush_run_frames(doc_ids_batch: np.ndarray, texts, run_id: np.int64, config: IndexConfig):
    """One DWPT flush: yield the doc-metadata frame and (when any term
    exists) the packed postings frame for one Arrow batch — the shared body
    of :func:`build_index` and :func:`build_index_sorted_source`."""
    analyzer = config.analyzer
    encoded_analysis = config.analysis_mode == "encoded"
    if encoded_analysis:
        term_codes, uniques, rows, dl, tok_pos = analyzer.analyze_batch_encoded(texts)
    else:
        flat, rows, dl, tok_pos = analyzer.analyze_batch_with_positions(texts)
        term_codes, uniq_idx = (
            pd.factorize(pd.Series(flat), sort=True) if flat.size else (np.empty(0, np.int64), pd.Index([]))
        )
        uniques = uniq_idx.to_numpy(dtype=object)
    norm_bytes = int_to_byte4(dl)

    # doc metadata rows (norms column-stride analog)
    yield pd.DataFrame(
        {
            "row_type": np.int32(1),
            "term": None,
            "run_id": run_id,
            "block_id": np.int32(0),
            "doc_id_base": doc_ids_batch,
            "doc_id_max": doc_ids_batch,
            "count": dl.astype(np.int32),
            "doc_ids": None,
            "tfs": None,
            "norms": None,
            "max_tf": norm_bytes.astype(np.int32),
            "min_norm": np.int32(0),
            "sum_tf": np.int64(0),
            "positions": None,
            "payloads": None,
        }
    )

    if term_codes.size == 0:
        return
    # in-memory postings + sorted flush (TermsHashPerField /
    # FreqProxTermsWriter analog, all vectorized)
    order = np.lexsort((rows, term_codes))
    tc, rr = term_codes[order], rows[order]
    new = np.empty(tc.size, dtype=bool)
    new[0] = True
    new[1:] = (tc[1:] != tc[:-1]) | (rr[1:] != rr[:-1])
    starts = np.flatnonzero(new)
    tfs = np.diff(np.append(starts, tc.size)).astype(np.int64)
    u_tc, u_rr = tc[starts], rr[starts]
    pay_flat = None
    if config.payload_mode == "pos_mod8":
        pay_flat = (tok_pos & 7)[order]
    elif config.payload_mode == "token_length":
        if encoded_analysis:
            term_lens = np.fromiter((len(t) for t in uniques), dtype=np.int64, count=len(uniques))
            pay_flat = term_lens[term_codes][order]
        else:
            pay_flat = np.fromiter((len(t) for t in flat), dtype=np.int64, count=flat.size)[order]
    elif config.payload_mode is not None:
        raise ValueError(f"unknown payload_mode {config.payload_mode!r}")
    packed = pack_postings_blocks(
        u_tc,
        doc_ids_batch[u_rr],
        tfs,
        norm_bytes[u_rr],
        block_size=config.block_size,
        positions=tok_pos[order] if config.index_positions else None,
        codec=config.codec,
        payloads=pay_flat,
    )
    terms_arr = np.asarray(uniques, dtype=object)[packed["term_code"]]
    yield pd.DataFrame(
        {
            "row_type": np.int32(0),
            "term": terms_arr,
            "run_id": run_id,
            "block_id": packed["block_id"],
            "doc_id_base": packed["doc_id_base"],
            "doc_id_max": packed["doc_id_max"],
            "count": packed["count"],
            "doc_ids": packed["doc_bytes"],
            "tfs": packed["tf_bytes"],
            "norms": packed["norm_bytes"],
            "max_tf": packed["max_tf"],
            "min_norm": packed["min_norm"],
            "sum_tf": packed["sum_tf"],
            "positions": packed["pos_bytes"],
            "payloads": packed["pay_bytes"],
        }
    )


def build_index(corpus: DataFrame, config: Optional[IndexConfig] = None) -> InvertedIndex:
    """Build an inverted index from a corpus DataFrame.

    The corpus must carry a stable ``config.id_col`` (int64).  Use
    :func:`assign_doc_ids` first for raw transcripts.
    """
    config = config or IndexConfig()
    text_col, id_col = config.text_col, config.id_col

    src = corpus.select(id_col, text_col)
    if config.n_partitions:
        # contiguous doc_id ranges per run keep deltas small and runs balanced
        src = src.repartitionByRange(config.n_partitions, id_col)
    src = src.sortWithinPartitions(id_col)

    def build(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        for pdf in iterator:
            run_id = np.int64(pid) * 1_000_000 + seq
            seq += 1
            doc_ids_batch = pdf[id_col].to_numpy(dtype=np.int64)
            yield from _flush_run_frames(doc_ids_batch, pdf[text_col], run_id, config)
        # reused workers keep the high-water-mark RSS of the biggest batch;
        # hand freed arena pages back so 32 concurrent workers don't ratchet
        # the host into the OOM killer over repeated builds
        from lucene_solr_spark.memutil import trim_task_memory

        trim_task_memory()

    raw = src.mapInPandas(build, schema=_BUILD_SCHEMA)
    raw = raw.persist()
    return _finalize_index(raw, config)


def _finalize_index(raw: DataFrame, config: IndexConfig) -> InvertedIndex:
    """Carve the persisted build output into postings/docs/terms + stats."""
    postings = raw.filter(F.col("row_type") == 0).select(*POSTINGS_COLUMNS)
    docs = raw.filter(F.col("row_type") == 1).select(
        F.col("doc_id_base").alias("doc_id"),
        F.col("count").alias("dl"),
        F.col("max_tf").alias("norm_byte"),
    )

    # term dictionary stats from block summaries (1 row per <=128 postings):
    # df = docs containing term, ttf = total term freq
    terms = postings.groupBy("term").agg(
        F.sum("count").cast("bigint").alias("df"),
        F.sum("sum_tf").cast("bigint").alias("ttf"),
    )

    # collection statistics — plain DataFrame aggregation (north star)
    stats_row = docs.agg(
        F.count(F.lit(1)).alias("doc_count"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_ttf")
    ).collect()[0]

    return InvertedIndex(
        postings=postings,
        docs=docs,
        terms=terms,
        doc_count=int(stats_row["doc_count"]),
        sum_ttf=int(stats_row["sum_ttf"]),
        config=config,
    )


def build_index_sorted_source(
    spark: SparkSession,
    path: str,
    config: Optional[IndexConfig] = None,
    order_cols=("conv_id", "turn_idx"),
) -> InvertedIndex:
    """FUSED sorted-source build: doc-id assignment + analysis + posting-run
    packing in ONE Python pass over the scan.

    :func:`assign_doc_ids_sorted_source` + :func:`build_index` crosses the
    JVM-Python Arrow boundary twice (once to stamp ids over every corpus
    column, once to analyze), and the id pass carries the non-text columns
    through Arrow both ways.  This path does the same metadata pass (per-file
    counts + range-disjointness check), then a single ``mapInPandas`` that
    computes each batch's global ids from the file bases and flushes the run
    directly - reading ONLY the file name and text column from the scan
    (column pruning reaches parquet).  Run/block layout, doc ids, norms, and
    stats are bit-identical to the two-step path (pinned by
    ``tests/test_sorted_source.py::test_fused_sorted_source_build_identical``).

    ``config.n_partitions`` is ignored: the source files ARE the runs, as in
    the two-step fast path with ``n_partitions=None``.
    """
    config = config or IndexConfig()
    df, bases = _sorted_source_scan(spark, path, order_cols)
    src = df.select(F.input_file_name().alias("_file"), F.col(config.text_col))
    text_col = config.text_col

    def build(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        seen: dict = {}
        for pdf in iterator:
            run_id = np.int64(pid) * 1_000_000 + seq
            seq += 1
            ids = _ids_for_batch(pdf["_file"].to_numpy(dtype=object), bases, seen)
            yield from _flush_run_frames(ids, pdf[text_col], run_id, config)
        from lucene_solr_spark.memutil import trim_task_memory

        trim_task_memory()

    raw = src.mapInPandas(build, schema=_BUILD_SCHEMA).persist()
    return _finalize_index(raw, config)
