"""Ingestion loaders and document-update semantics (the Solr update path).

Re-expression of the reference's update handlers:

- ``JsonLoader`` / ``CSVLoader`` (``reference solr/core/src/java/org/apache/
  solr/handler/loader/JsonLoader.java``, ``CSVLoader.java``): accept document
  payloads in JSON/CSV, map them onto the declared schema, reject malformed
  rows.  Spark-first: ``spark.read.schema(...).json/csv`` — the schema pushes
  into the parser, malformed rows split out declaratively instead of via
  per-doc exception handling.
- ``IndexWriter.updateDocuments`` = delete-by-term + add (``reference
  lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1276``) and
  ``DistributedUpdateProcessor`` version resolution (``reference solr/core/
  .../update/processor/DistributedUpdateProcessor.java:106`` — higher version
  wins, the optimistic-concurrency path): :func:`apply_updates`.
- Solr atomic updates (``set`` field command, ``AtomicUpdateDocumentMerger``):
  :func:`atomic_set`.

All set operations are id-keyed joins — at 10^12 docs the shuffle carries the
update batch (small) broadcast against the base, or an id-partitioned
sort-merge join when the batch is large; Catalyst/AQE picks per batch size.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = ["TRANSCRIPT_SCHEMA", "read_documents", "split_malformed", "apply_updates", "atomic_set"]

# the input_hint table shape: one row = one conversation turn
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    schema: Optional[T.StructType] = None,
) -> DataFrame:
    """Load a document batch in the declared schema (JsonLoader/CSVLoader).

    ``fmt``: "json" (JSON-lines), "csv" (with header), or "parquet".  The
    schema is enforced at parse time (predicate/column pruning reach the
    reader); unparsable values surface as nulls for :func:`split_malformed`
    rather than failing the batch — Solr's per-document error reporting,
    expressed declaratively.
    """
    schema = schema or TRANSCRIPT_SCHEMA
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    if fmt == "csv":
        return spark.read.schema(schema).option("header", True).csv(path)
    if fmt == "parquet":
        df = spark.read.parquet(path)
        return df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
    raise ValueError(f"unknown format {fmt!r} (expected json/csv/parquet)")


def split_malformed(df: DataFrame, required: Iterable[str] = ("conv_id", "turn_idx")) -> tuple:
    """(good, rejected): rows missing a required id field are rejected — the
    loader's per-document error channel."""
    pred = F.lit(True)
    for c in required:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred), df.filter(~pred)


def apply_updates(
    base: DataFrame,
    updates: DataFrame,
    id_cols: tuple = ("conv_id", "turn_idx"),
    version_col: Optional[str] = None,
) -> DataFrame:
    """``updateDocuments``: every update deletes the matching id and adds the
    new row (IndexWriter.java:1276).

    Without ``version_col``, updates always win (the IndexWriter contract).
    With it, the HIGHEST version per id wins across base ∪ updates, ties going
    to the update — DistributedUpdateProcessor's version resolution.
    """
    ids = list(id_cols)
    if version_col is None:
        kept = base.join(updates.select(*ids).distinct(), ids, "left_anti")
        return kept.unionByName(updates.select(*base.columns))
    tagged = base.withColumn("_is_update", F.lit(0)).unionByName(
        updates.select(*base.columns).withColumn("_is_update", F.lit(1))
    )
    w = Window.partitionBy(*ids).orderBy(F.desc(version_col), F.desc("_is_update"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )


def atomic_set(
    base: DataFrame,
    partial: DataFrame,
    id_cols: tuple = ("conv_id", "turn_idx"),
    set_cols: Optional[Iterable[str]] = None,
) -> DataFrame:
    """Solr atomic update, ``set`` command: overwrite only the listed fields
    of matching docs, preserve everything else (AtomicUpdateDocumentMerger).

    ``partial``: id columns + the fields to set.  Ids in ``partial`` absent
    from ``base`` are ignored (atomic updates target existing docs).
    """
    ids = list(id_cols)
    set_cols = list(set_cols) if set_cols is not None else [c for c in partial.columns if c not in ids]
    renamed = partial.select(*ids, *[F.col(c).alias(f"_set_{c}") for c in set_cols])
    out = base.join(renamed, ids, "left")
    exprs = []
    for c in base.columns:
        if c in set_cols:
            exprs.append(F.coalesce(F.col(f"_set_{c}"), F.col(c)).alias(c))
        else:
            exprs.append(F.col(c))
    return out.select(*exprs)
