"""Index invariant checker — the ``CheckIndex`` analog.

The reference validates every segment structure end-to-end before trusting
an index (``reference lucene/core/src/java/org/apache/lucene/index/
CheckIndex.java:84``).  Ours validates the committed DataFrame index with
distributed assertions (each check is one aggregation — no postings ever
reach the driver):

1. block invariants: count in [1, block_size], max_tf >= 1, min_norm >= 0,
   doc_id_base >= 0, non-empty payloads;
2. postings sorted + unique per (term, run): exact via a per-group
   re-decode pass that verifies strict doc_id monotonicity inside and
   across blocks;
3. stats consistency: terms.df == Σ block counts, terms.ttf == Σ block
   sum_tf, doc_count == |docs|, sum_ttf == Σ docs.dl;
4. impact soundness: decoded max(tf) == block max_tf and min(norm) ==
   block min_norm (block-max pruning is only sound if these hold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from ..functions.codec import unpack_blocks
from .indexer import InvertedIndex


class CheckIndexError(AssertionError):
    pass


def _fail(msg: str):
    raise CheckIndexError(msg)


def check_index(index: InvertedIndex, full: bool = True) -> dict:
    """Validate the index; returns a summary dict or raises CheckIndexError."""
    p = index.postings

    bad = p.filter(
        (F.col("count") < 1)
        | (F.col("count") > index.config.block_size)
        | (F.col("max_tf") < 1)
        | (F.col("min_norm") < 0)
        | (F.col("doc_id_base") < 0)
        | (F.col("doc_id_max") < F.col("doc_id_base"))
        | F.col("doc_ids").isNull()
        | F.col("tfs").isNull()
        | F.col("norms").isNull()
    ).count()
    if bad:
        _fail(f"{bad} block rows violate basic invariants")

    # stats consistency (terms table vs block summaries vs docs)
    t_from_blocks = p.groupBy("term").agg(
        F.sum("count").alias("df2"), F.sum("sum_tf").alias("ttf2")
    )
    mism = (
        index.terms.join(t_from_blocks, "term", "full")
        .filter(
            F.col("df").isNull()
            | F.col("df2").isNull()
            | (F.col("df") != F.col("df2"))
            | (F.col("ttf") != F.col("ttf2"))
        )
        .count()
    )
    if mism:
        _fail(f"{mism} terms disagree between terms table and block summaries")

    docs_stats = index.docs.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).collect()[0]
    if int(docs_stats["n"]) != index.doc_count:
        _fail(f"doc_count {index.doc_count} != |docs| {docs_stats['n']}")
    if int(docs_stats["s"]) != index.sum_ttf:
        _fail(f"sum_ttf {index.sum_ttf} != sum(docs.dl) {docs_stats['s']}")

    n_decode_errors = 0
    if full:
        codec = index.config.codec

        # decode pass: strict doc order within (term, run) + impact soundness
        def verify(iterator):
            errs = 0
            for pdf in iterator:
                for (_, _), g in pdf.groupby(["term", "run_id"], sort=False):
                    g = g.sort_values("block_id")
                    doc_ids, tfs, norms, blk = unpack_blocks(
                        g["doc_id_base"].to_numpy(dtype=np.int64),
                        g["count"].to_numpy(dtype=np.int64),
                        list(g["doc_ids"]),
                        list(g["tfs"]),
                        list(g["norms"]),
                        codec=codec,
                    )
                    if doc_ids.size > 1 and not (np.diff(doc_ids) > 0).all():
                        errs += 1
                    exp_max = np.maximum.reduceat(tfs, np.cumsum(g["count"].to_numpy()) - g["count"].to_numpy())
                    if not (exp_max == g["max_tf"].to_numpy()).all():
                        errs += 1
                    exp_min = np.minimum.reduceat(norms, np.cumsum(g["count"].to_numpy()) - g["count"].to_numpy())
                    if not (exp_min == g["min_norm"].to_numpy()).all():
                        errs += 1
                    # skip-entry soundness: stored last doc == decoded last doc
                    last_idx = np.cumsum(g["count"].to_numpy()) - 1
                    if not (doc_ids[last_idx] == g["doc_id_max"].to_numpy()).all():
                        errs += 1
            yield pd.DataFrame({"errs": [errs]})

        n_decode_errors = int(
            p.repartition("term", "run_id")
            .mapInPandas(verify, schema="errs bigint")
            .agg(F.sum("errs"))
            .collect()[0][0]
            or 0
        )
        if n_decode_errors:
            _fail(f"{n_decode_errors} (term, run) groups fail decode/order/impact checks")

    return {
        "n_blocks": p.count(),
        "n_terms": index.terms.count(),
        "doc_count": index.doc_count,
        "sum_ttf": index.sum_ttf,
        "decode_checked": bool(full),
    }
