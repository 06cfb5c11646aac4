"""Bounded k-way segment (run) merge with a TieredMergePolicy-modeled planner.

The reference merges immutable segments under a tier-geometry budget with a
skew-scored candidate search (``reference lucene/core/src/java/org/apache/
lucene/index/TieredMergePolicy.java:96-103`` defaults, ``:380-401`` budget,
``:566-623`` candidate scoring ``skew * totAfterMergeBytes^0.05`` — the
delete-ratio factor is 1 here because our runs are immutable and deletes are
snapshot-level).  We keep the same *decision structure* but re-express the
merge itself as a Spark job:

- the planner is driver-side pure Python over the **run manifest** (one row
  per run: id, bytes, postings) — it never sees postings;
- one merge = ``postings.filter(run_id in candidate) .groupBy(term[, salt])
  .applyInPandas(repack)`` — a bounded shuffle of at most
  ``max_merge_at_once`` runs' blocks, producing one new run;
- **hot-term salting** (north rule / SURVEY §4 skew row): terms whose merged
  postings would exceed ``salt_block_budget`` postings are split by
  ``doc_id_base`` *range* (not hash!) so every salted sub-group holds a
  contiguous doc_id range — delta encoding stays valid and the per-group work
  is bounded regardless of how Zipf-skewed the term distribution is.  At query
  time nothing changes: a term's blocks are simply spread over more rows, and
  block rows are already the unit of parallelism.

Merging never changes doc_ids (they are global, unlike the reference's
per-segment ids remapped by ``DocIDMerger``), so term/collection statistics
are invariant under merge — asserted in tests by rank-identity before/after.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.codec import (
    BLOCK_SIZE,
    _within_group_ranges,
    pack_postings_blocks,
    unpack_blocks,
    unpack_payloads,
    unpack_positions,
)
from .indexer import POSTINGS_COLUMNS, InvertedIndex

_POSTINGS_SCHEMA = (
    "term string, run_id bigint, block_id int, doc_id_base bigint, doc_id_max bigint, "
    "count int, "
    "doc_ids binary, tfs binary, norms binary, max_tf int, min_norm int, sum_tf bigint, "
    "positions binary, payloads binary"
)


@dataclass(frozen=True)
class RunInfo:
    """One immutable run (segment analog) from the manifest."""

    run_id: int
    size_bytes: int
    n_postings: int


@dataclass(frozen=True)
class MergeSpec:
    """A planned merge: which runs fuse into which new run."""

    inputs: tuple[int, ...]
    new_run_id: int


@dataclass
class TieredMergePolicy:
    """Driver-side port of the reference tier-budget + skew scoring.

    Defaults per ``TieredMergePolicy.java:96-103``; the floor is lowered to
    256 KB because our local runs are far smaller than on-disk Lucene
    segments (the *geometry* is what matters, not the absolute floor).
    """

    max_merge_at_once: int = 10
    segs_per_tier: float = 10.0
    floor_segment_bytes: int = 256 * 1024
    max_merged_segment_bytes: int = 5 * 1024**3

    def _floored(self, b: int) -> float:
        return float(max(b, self.floor_segment_bytes))

    def allowed_seg_count(self, sizes: list[int]) -> int:
        """Tier-geometry budget (TieredMergePolicy.java:380-401)."""
        total = sum(self._floored(b) for b in sizes)
        level = self._floored(self.floor_segment_bytes)
        allowed = 0.0
        while True:
            seg_count_level = total / level
            if seg_count_level < self.segs_per_tier:
                allowed += np.ceil(seg_count_level)
                break
            allowed += self.segs_per_tier
            total -= self.segs_per_tier * level
            level *= self.max_merge_at_once
        return int(allowed)

    def score(self, cand: list[RunInfo]) -> float:
        """Candidate score — lower is better (TieredMergePolicy.java:566-623):
        skew = biggest/floored-total, times totAfterMergeBytes^0.05."""
        tot = sum(c.size_bytes for c in cand)
        tot_floored = sum(self._floored(c.size_bytes) for c in cand)
        skew = self._floored(cand[0].size_bytes) / tot_floored
        return skew * (tot**0.05)

    def find_merges(self, runs: list[RunInfo]) -> Optional[list[RunInfo]]:
        """Pick the best single merge, or None if within budget.

        Runs over half the max merged size are "too big" — excluded from
        both the tier budget and merge eligibility, as in the reference's
        tooBigCount handling (TieredMergePolicy.java:405-420)."""
        mergeable = [r for r in runs if r.size_bytes <= self.max_merged_segment_bytes // 2]
        if len(mergeable) <= self.allowed_seg_count([r.size_bytes for r in mergeable]):
            return None
        # run_id tie-break: equal-size runs otherwise sort in manifest order,
        # which is a collect() order — nondeterministic across clusters
        eligible = sorted(mergeable, key=lambda r: (-r.size_bytes, r.run_id))
        best, best_score = None, None
        for start in range(len(eligible)):
            cand: list[RunInfo] = []
            tot = 0
            for r in eligible[start:]:
                if len(cand) >= self.max_merge_at_once:
                    break
                if tot + r.size_bytes > self.max_merged_segment_bytes and cand:
                    continue
                cand.append(r)
                tot += r.size_bytes
            if len(cand) < 2:
                continue
            s = self.score(cand)
            if best_score is None or s < best_score:
                best, best_score = cand, s
        return best


def run_manifest(index: InvertedIndex) -> list[RunInfo]:
    """Tiny per-run aggregation (1 row per run) — the SegmentInfos analog."""
    rows = (
        index.postings.groupBy("run_id")
        .agg(
            (
                F.sum(F.octet_length("doc_ids") + F.octet_length("tfs") + F.octet_length("norms"))
            ).alias("bytes"),
            F.sum("count").alias("np"),
        )
        .collect()
    )
    return [RunInfo(int(r["run_id"]), int(r["bytes"]), int(r["np"])) for r in rows]


def _repack_group(
    pdf: pd.DataFrame,
    term: str,
    run_id: int,
    salt: int,
    drop_doc_ids: Optional[np.ndarray],
    block_size: int,
    codec: str = "varint",
) -> pd.DataFrame:
    """Unpack all block rows of one term group, drop `drop_doc_ids` (sorted
    array), re-sort by docID, and re-pack into fresh blocks under `run_id`."""
    doc_ids, tfs, norms, _ = unpack_blocks(
        pdf["doc_id_base"].to_numpy(dtype=np.int64),
        pdf["count"].to_numpy(dtype=np.int64),
        list(pdf["doc_ids"]),
        list(pdf["tfs"]),
        list(pdf["norms"]),
        codec=codec,
    )
    sel = np.argsort(doc_ids, kind="stable")  # runs hold disjoint ranges; cheap
    if drop_doc_ids is not None and drop_doc_ids.size:
        pos_in = np.searchsorted(drop_doc_ids, doc_ids[sel])
        pos_in[pos_in == drop_doc_ids.size] = 0
        sel = sel[drop_doc_ids[pos_in] != doc_ids[sel]]
    has_pos = len(pdf) > 0 and pdf["positions"].notna().all()
    has_pay = len(pdf) > 0 and pdf["payloads"].notna().all()
    pos_sorted = pay_sorted = gather = None
    if has_pos or has_pay:
        # occurrence-stream gather to the merged posting order (shared by
        # the position and payload streams — they are index-aligned)
        occ_starts = np.cumsum(tfs) - tfs
        gather = np.repeat(occ_starts[sel], tfs[sel]) + _within_group_ranges(tfs[sel])
    if has_pos:
        pos_sorted = unpack_positions(tfs, list(pdf["positions"]))[gather]
    if has_pay:
        pay_sorted = unpack_payloads(list(pdf["payloads"]))[gather]
    packed = pack_postings_blocks(
        np.zeros(sel.size, dtype=np.int64),
        doc_ids[sel],
        tfs[sel],
        norms[sel],
        block_size=block_size,
        positions=pos_sorted,
        codec=codec,
        payloads=pay_sorted,
    )
    n = packed["block_id"].size
    return pd.DataFrame(
        {
            "term": np.repeat(np.asarray([term], dtype=object), n),
            "run_id": np.int64(run_id),
            # salt in the high bits keeps block_id unique within the run
            "block_id": (packed["block_id"] + salt * (1 << 20)).astype(np.int32),
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


def _make_repack(
    new_run_id: int, block_size: int, drop_doc_ids: Optional[np.ndarray] = None, codec: str = "varint"
):
    """applyInPandas fn: all block rows of one (term[, salt]) group from the
    candidate runs -> merged, re-blocked rows under `new_run_id`; postings of
    `drop_doc_ids` (sorted array) are reclaimed (delete expunge)."""

    def repack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        salt = int(key[1]) if len(key) > 1 else 0
        return _repack_group(pdf, key[0], new_run_id, salt, drop_doc_ids, block_size, codec)

    return repack


def _make_expunge_repack(block_size: int, codec: str = "varint"):
    """applyInPandas fn for the distributed expunge: one (run_id, term) group
    whose delete ids arrive as a packed int64 ``__dels`` binary column (same
    value on every row of the group)."""

    def repack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dels = np.frombuffer(pdf["__dels"].iloc[0], dtype=np.int64)
        return _repack_group(pdf, key[1], int(key[0]), 0, dels, block_size, codec)

    return repack


def expunge_deletes(index: InvertedIndex, max_driver_deletes: int = 100_000) -> InvertedIndex:
    """Reclaim deleted docs: rewrite every run without them and recompute
    statistics — the merge-time delete reclamation of the reference
    (``SegmentMerger`` skipping non-live docs; ``TieredMergePolicy``
    deletesPctAllowed decides *when*, this is the *how*).

    The delete set rides to executors as a broadcast numpy array — fine for
    snapshot-scale delete batches, a driver-OOM hazard for massive ones, so
    any delete set larger than ``max_driver_deletes`` automatically delegates
    to :func:`expunge_deletes_distributed` (equivalent results, delete ids
    never pass through the driver).  The size probe is a count aggregate, not
    a collect.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    if index.deletes is None:
        return index
    n_deletes = index.deletes.select("doc_id").distinct().count()
    if n_deletes == 0:
        return replace(index, deletes=None)
    if n_deletes > max_driver_deletes:
        return expunge_deletes_distributed(index)
    # distinct BEFORE collect — the count gate above is on distinct ids, so
    # a duplicate-heavy delete log (overlapping delete_by_query batches)
    # must not smuggle its raw row count onto the driver
    deleted = np.sort(
        np.array(
            [r["doc_id"] for r in index.deletes.select("doc_id").distinct().collect()],
            dtype=np.int64,
        )
    )

    ids = [r.run_id for r in run_manifest(index)]
    kept = merge_runs(index, ids, new_run_id=max(ids) + 3_000_000_000, drop_doc_ids=deleted)
    kept = kept.persist()
    docs = index.docs.join(index.deletes.select("doc_id"), "doc_id", "left_anti").persist()
    terms = kept.groupBy("term").agg(
        F.sum("count").cast("bigint").alias("df"), F.sum("sum_tf").cast("bigint").alias("ttf")
    )
    stats = docs.agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")).collect()[0]
    return replace(
        index,
        postings=kept,
        docs=docs,
        terms=terms,
        doc_count=int(stats["n"]),
        sum_ttf=int(stats["s"]),
        deletes=None,
    )


def expunge_deletes_distributed(index: InvertedIndex) -> InvertedIndex:
    """Delete reclamation at 100 TB scale: delete ids never pass through the
    driver, and ONLY the (run, term) groups whose per-block docID ranges
    ``[doc_id_base, doc_id_max]`` overlap a delete are rewritten — every other
    block row passes through untouched (its bytes never leave the scan).

    This is the live-docs shape of the reference (``SegmentMerger`` skips
    non-live docs per segment; skip entries carry the block's last doc,
    ``Lucene50SkipWriter.java``), re-expressed as:

    1. deletes are routed to their run by the run's doc range (runs hold
       disjoint contiguous doc_id ranges; the run→lo map is manifest-scale,
       ≤ 1 row per run);
    2. a metadata-only cogroup per run (term, doc_id_base, doc_id_max — no
       byte payloads) finds touched terms with numpy searchsorted and slices
       each term the delete sub-array covering its doc range;
    3. touched groups join their delete slice and re-pack via applyInPandas;
       untouched blocks are kept as-is with an anti-join.

    Work scales with the number of delete-adjacent blocks, not index size.
    (A term whose group was previously salt-split is repacked whole here;
    re-salting inside expunge would bound that too — the hot path bound is
    merge_runs' salting, documented there.)
    """
    if index.deletes is None:
        return index

    dels = index.deletes.select(F.col("doc_id").cast("long").alias("__del")).distinct()

    # run → doc-range lower bound (manifest-scale aggregation, ≤ 1 row per run)
    run_lo = index.postings.groupBy("run_id").agg(F.min("doc_id_base").alias("lo"))
    lo_rows = run_lo.collect()
    if not lo_rows:
        return replace(index, deletes=None)
    runs_sorted = sorted((int(r["lo"]), int(r["run_id"])) for r in lo_rows)
    los = [lo for lo, _ in runs_sorted]
    rids = [rid for _, rid in runs_sorted]
    run_idx = F.lit(0)
    for lo in los[1:]:
        run_idx = run_idx + F.when(F.col("__del") >= F.lit(lo), 1).otherwise(0)
    dels_by_run = dels.withColumn(
        "run_id", F.element_at(F.array(*[F.lit(r) for r in rids]), run_idx + 1).cast("bigint")
    )

    meta = index.postings.select("run_id", "term", "doc_id_base", "doc_id_max")

    def find_touched(key, meta_pdf: pd.DataFrame, dels_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "run_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype=object),
                "__dels": pd.Series([], dtype=object),
            }
        )
        if meta_pdf.empty or dels_pdf.empty:
            return empty
        d = np.sort(dels_pdf["__del"].to_numpy(dtype=np.int64))
        base = meta_pdf["doc_id_base"].to_numpy(dtype=np.int64)
        mx = meta_pdf["doc_id_max"].to_numpy(dtype=np.int64)
        hit = np.searchsorted(d, base, "left") < np.searchsorted(d, mx, "right")
        if not hit.any():
            return empty
        g = (
            pd.DataFrame({"term": meta_pdf["term"].to_numpy(dtype=object)[hit], "lo": base[hit], "hi": mx[hit]})
            .groupby("term", sort=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
        )
        dels_bytes = [
            d[np.searchsorted(d, lo, "left") : np.searchsorted(d, hi, "right")].tobytes()
            for lo, hi in zip(g["lo"], g["hi"])
        ]
        return pd.DataFrame(
            {
                "run_id": np.int64(key[0]),
                "term": g.index.to_numpy(dtype=object),
                "__dels": dels_bytes,
            }
        )

    touched = (
        meta.groupBy("run_id")
        .cogroup(dels_by_run.groupBy("run_id"))
        .applyInPandas(find_touched, schema="run_id bigint, term string, __dels binary")
        .persist()
    )

    blk = index.postings
    rewritten = (
        blk.join(touched, ["run_id", "term"], "inner")
        .groupBy("run_id", "term")
        .applyInPandas(_make_expunge_repack(index.config.block_size, index.config.codec), schema=_POSTINGS_SCHEMA)
    )
    kept = (
        blk.join(touched.select("run_id", "term"), ["run_id", "term"], "left_anti")
        .select(*POSTINGS_COLUMNS)
        .unionByName(rewritten.select(*POSTINGS_COLUMNS))
        .persist()
    )
    docs = index.docs.join(index.deletes.select("doc_id"), "doc_id", "left_anti").persist()
    terms = kept.groupBy("term").agg(
        F.sum("count").cast("bigint").alias("df"), F.sum("sum_tf").cast("bigint").alias("ttf")
    )
    stats = docs.agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")).collect()[0]
    return replace(
        index,
        postings=kept,
        docs=docs,
        terms=terms,
        doc_count=int(stats["n"]),
        sum_ttf=int(stats["s"]),
        deletes=None,
    )


def merge_runs(
    index: InvertedIndex,
    run_ids: list[int],
    new_run_id: int,
    salt_block_budget: int = 512 * BLOCK_SIZE,
    drop_doc_ids: Optional[np.ndarray] = None,
) -> DataFrame:
    """Fuse `run_ids` into one new run; returns the new postings rows.

    Skew control: the shuffle key is (term, salt) where salt buckets a hot
    term's blocks by doc_id range so no single task ever re-packs more than
    ~salt_block_budget postings. Cold terms (the overwhelming majority) get
    salt 0 and merge whole.
    """
    cand = index.postings.filter(F.col("run_id").isin([int(r) for r in run_ids]))

    # per-term merged posting count (tiny agg over block summaries)
    hot = (
        cand.groupBy("term")
        .agg(F.sum("count").alias("np"), F.min("doc_id_base").alias("lo"), F.max("doc_id_base").alias("hi"))
        .filter(F.col("np") > salt_block_budget)
        .select(
            "term",
            (F.ceil(F.col("np") / F.lit(salt_block_budget))).cast("int").alias("n_salts"),
            "lo",
            (F.col("hi") - F.col("lo") + 1).alias("span"),
        )
    )
    with_salt = cand.join(F.broadcast(hot), "term", "left").withColumn(
        "salt",
        F.when(
            F.col("n_salts").isNotNull(),
            F.least(
                ((F.col("doc_id_base") - F.col("lo")) * F.col("n_salts") / F.col("span")).cast("int"),
                F.col("n_salts") - 1,
            ),
        ).otherwise(F.lit(0)),
    )
    return (
        with_salt.select(*POSTINGS_COLUMNS, "salt")
        .groupBy("term", "salt")
        .applyInPandas(
            _make_repack(new_run_id, index.config.block_size, drop_doc_ids, index.config.codec),
            schema=_POSTINGS_SCHEMA,
        )
    )


def maybe_merge(
    index: InvertedIndex,
    policy: Optional[TieredMergePolicy] = None,
    max_rounds: int = 20,
    size_by: str = "bytes",
) -> InvertedIndex:
    """Run the merge loop to budget (findMerges → merge → re-manifest).

    Returns a new InvertedIndex sharing docs/terms/stats (merge is
    statistics-invariant because doc_ids are global — no remap).

    ``size_by="postings"`` feeds the policy postings counts instead of byte
    sizes — the policy geometry is unit-agnostic (Lucene's byte sizes are
    estimates to begin with), and postings counts are derivable by an
    independent SQL oracle, making the cascade end-to-end checkable.
    """
    policy = policy or TieredMergePolicy()
    postings = index.postings
    runs = run_manifest(index)
    if size_by == "postings":
        runs = [RunInfo(r.run_id, r.n_postings, r.n_postings) for r in runs]
    elif size_by != "bytes":
        raise ValueError("size_by must be 'bytes' or 'postings'")
    next_id = max((r.run_id for r in runs), default=0) + 1_000_000_000
    for _ in range(max_rounds):
        cand = policy.find_merges(runs)
        if not cand:
            break
        ids = [c.run_id for c in cand]
        merged = merge_runs(replace(index, postings=postings), ids, next_id)
        postings = postings.filter(~F.col("run_id").isin(ids)).unionByName(merged).persist()
        postings.count()
        runs = [r for r in runs if r.run_id not in set(ids)] + [
            RunInfo(next_id, sum(c.size_bytes for c in cand), sum(c.n_postings for c in cand))
        ]
        next_id += 1
    return replace(index, postings=postings)


def force_merge(index: InvertedIndex, max_runs: int = 1, policy: Optional[TieredMergePolicy] = None) -> InvertedIndex:
    """forceMerge analog (``IndexWriter.forceMerge``): fuse down to
    `max_runs` runs with bounded k-way rounds (FixedSizeMergePolicy's
    uniform-segment goal is the `max_runs=N` case, ``reference lucene/core/
    src/java/org/apache/lucene/dpu/FixedSizeMergePolicy.java:36,91``)."""
    policy = policy or TieredMergePolicy()
    postings = index.postings
    runs = run_manifest(index)
    next_id = max((r.run_id for r in runs), default=0) + 2_000_000_000
    while len(runs) > max_runs:
        k = min(policy.max_merge_at_once, len(runs) - max_runs + 1)
        cand = sorted(runs, key=lambda r: r.size_bytes)[:k]
        ids = [c.run_id for c in cand]
        merged = merge_runs(replace(index, postings=postings), ids, next_id)
        postings = postings.filter(~F.col("run_id").isin(ids)).unionByName(merged).persist()
        postings.count()
        runs = [r for r in runs if r.run_id not in set(ids)] + [
            RunInfo(next_id, sum(c.size_bytes for c in cand), sum(c.n_postings for c in cand))
        ]
        next_id += 1
    return replace(index, postings=postings)


# ----------------------------------------------------------- index splitting
def _make_split_blocks(lo: int, hi: Optional[int], codec: str):
    """mapInPandas fn for boundary-straddling block rows: decode each block
    INDEPENDENTLY (no shuffle — block rows are self-contained), keep the
    postings whose doc_id falls in [lo, hi), and re-pack the slice as one
    block carrying the ORIGINAL block_id.  Original block_ids are assigned in
    doc order at pack time, so the part's pass-through blocks and rewritten
    pieces interleave correctly under the CheckIndex (term, run, block_id)
    doc-order invariant, and each source block contributes at most one piece
    per part — ids stay unique."""

    def fn(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            counts = pdf["count"].to_numpy(dtype=np.int64)
            doc_ids, tfs, norms, _ = unpack_blocks(
                pdf["doc_id_base"].to_numpy(dtype=np.int64),
                counts,
                list(pdf["doc_ids"]),
                list(pdf["tfs"]),
                list(pdf["norms"]),
                codec=codec,
            )
            starts = np.cumsum(counts) - counts
            keep = doc_ids >= lo
            if hi is not None:
                keep &= doc_ids < hi
            has_pos = pdf["positions"].notna().all()
            has_pay = pdf["payloads"].notna().all()
            pos_flat = unpack_positions(tfs, list(pdf["positions"])) if has_pos else None
            pay_flat = unpack_payloads(list(pdf["payloads"])) if has_pay else None
            occ_starts = np.cumsum(tfs) - tfs
            rows = []
            for bi in range(len(pdf)):
                s, e = starts[bi], starts[bi] + counts[bi]
                m = keep[s:e]
                if not m.any():
                    continue
                d, t_, nr = doc_ids[s:e][m], tfs[s:e][m], norms[s:e][m]
                pos_slice = pay_slice = None
                if pos_flat is not None or pay_flat is not None:
                    occ_mask = np.repeat(m, tfs[s:e])
                    o_s = occ_starts[s]
                    o_e = occ_starts[e - 1] + tfs[e - 1]
                    if pos_flat is not None:
                        pos_slice = pos_flat[o_s:o_e][occ_mask]
                    if pay_flat is not None:
                        pay_slice = pay_flat[o_s:o_e][occ_mask]
                packed = pack_postings_blocks(
                    np.zeros(d.size, dtype=np.int64),
                    d,
                    t_,
                    nr,
                    block_size=int(d.size),  # one piece per source block
                    positions=pos_slice,
                    codec=codec,
                    payloads=pay_slice,
                )
                rows.append(
                    {
                        "term": pdf["term"].iloc[bi],
                        "run_id": np.int64(pdf["run_id"].iloc[bi]),
                        "block_id": np.int32(pdf["block_id"].iloc[bi]),
                        "doc_id_base": packed["doc_id_base"][0],
                        "doc_id_max": packed["doc_id_max"][0],
                        "count": packed["count"][0],
                        "doc_ids": packed["doc_bytes"][0],
                        "tfs": packed["tf_bytes"][0],
                        "norms": packed["norm_bytes"][0],
                        "max_tf": packed["max_tf"][0],
                        "min_norm": packed["min_norm"][0],
                        "sum_tf": packed["sum_tf"][0],
                        "positions": packed["pos_bytes"][0] if pos_flat is not None else None,
                        "payloads": packed["pay_bytes"][0] if pay_flat is not None else None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return fn


def split_index(index: InvertedIndex, boundaries: list[int]) -> list[InvertedIndex]:
    """Split one index into contiguous doc_id-range parts — the
    MultiPassIndexSplitter / PKIndexSplitter analog (``reference lucene/misc/
    src/java/org/apache/lucene/index/MultiPassIndexSplitter.java``,
    ``PKIndexSplitter.java``: the PK filter over our ingestion-ordered global
    doc_ids IS a doc-range predicate).  ``boundaries = [b1 < b2 < ...]``
    yields parts [0,b1), [b1,b2), …, [bk,∞) — the re-sharding primitive for
    moving an index from N to 4N executors.

    Scale shape: a block fully inside a part passes through BYTE-IDENTICAL
    (pure Catalyst filter, its payload never decoded); only blocks straddling
    a boundary — at most (runs x terms x boundaries) rows, manifest-scale —
    are decoded and re-packed, in a shuffle-free mapInPandas.  Per-part term
    stats are re-aggregated from block summaries (count/sum_tf), never from
    decoded postings."""
    bs = sorted(int(b) for b in boundaries)
    if not bs or bs != sorted(set(bs)):
        raise ValueError("boundaries must be a non-empty strictly-increasing list")
    ranges = [(0, bs[0])] + [(bs[i], bs[i + 1]) for i in range(len(bs) - 1)] + [(bs[-1], None)]
    p = index.postings
    out = []
    for lo, hi in ranges:
        inside = (F.col("doc_id_base") >= lo) & (
            F.lit(True) if hi is None else (F.col("doc_id_max") < hi)
        )
        overlaps = (F.col("doc_id_max") >= lo) & (
            F.lit(True) if hi is None else (F.col("doc_id_base") < hi)
        )
        pass_through = p.filter(inside)
        straddle = p.filter(overlaps & ~inside).mapInPandas(
            _make_split_blocks(lo, hi, index.config.codec), schema=p.schema
        )
        postings_i = pass_through.unionByName(straddle)
        docs_i = index.docs.filter(
            (F.col("doc_id") >= lo) & (F.lit(True) if hi is None else (F.col("doc_id") < hi))
        )
        terms_i = postings_i.groupBy("term").agg(
            F.sum("count").cast("bigint").alias("df"), F.sum("sum_tf").cast("bigint").alias("ttf")
        )
        stats = docs_i.agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")).collect()[0]
        deletes_i = None
        if index.deletes is not None:
            deletes_i = index.deletes.filter(
                (F.col("doc_id") >= lo) & (F.lit(True) if hi is None else (F.col("doc_id") < hi))
            )
        out.append(
            replace(
                index,
                postings=postings_i,
                docs=docs_i,
                terms=terms_i,
                doc_count=int(stats["n"]),
                sum_ttf=int(stats["s"]),
                deletes=deletes_i,
            )
        )
    return out


@dataclass
class LogDocMergePolicy:
    """The classic pre-Tiered merge geometry — ``reference lucene/core/src/
    java/org/apache/lucene/index/LogMergePolicy.java:176-263`` findMerges
    with the LogDocMergePolicy size measure (postings count): quantize each
    run's log_mergeFactor(size) into levels (a level spans LEVEL_LOG_SPAN =
    0.75 below the running maximum, floored at log(min_merge_size)), then
    record every full window of ``merge_factor`` consecutive runs inside a
    level, skipping windows containing a run at/over ``max_merge_size``.

    Driver-side planner over the run manifest, interchangeable with
    TieredMergePolicy in :func:`maybe_merge` (``find_merges`` returns the
    first viable window per call; the merge loop re-plans each round).
    """

    merge_factor: int = 10  # DEFAULT_MERGE_FACTOR (LogMergePolicy.java:58)
    min_merge_size: float = 0.0
    max_merge_size: float = float("inf")

    LEVEL_LOG_SPAN = 0.75

    def __post_init__(self):
        if self.merge_factor < 2:
            raise ValueError("mergeFactor cannot be less than 2")

    def _size(self, run: RunInfo) -> float:
        return float(max(run.n_postings, 1))

    def find_all_merges(self, runs: list[RunInfo]) -> list[list[RunInfo]]:
        """The full MergeSpecification for one findMerges call."""
        import math as _m

        n = len(runs)
        if n == 0:
            return []
        norm = _m.log(self.merge_factor)
        levels = [_m.log(self._size(r)) / norm for r in runs]
        level_floor = 0.0 if self.min_merge_size <= 0 else _m.log(self.min_merge_size) / norm

        spec: list[list[RunInfo]] = []
        start = 0
        while start < n:
            max_level = max(levels[start:])
            if max_level <= level_floor:
                level_bottom = -1.0
            else:
                level_bottom = max_level - self.LEVEL_LOG_SPAN
                if level_bottom < level_floor and max_level >= level_floor:
                    level_bottom = level_floor
            upto = n - 1
            while upto >= start and levels[upto] < level_bottom:
                upto -= 1
            end = start + self.merge_factor
            while end <= upto + 1:
                if not any(self._size(runs[i]) >= self.max_merge_size for i in range(start, end)):
                    spec.append(runs[start:end])
                start = end
                end = start + self.merge_factor
            start = upto + 1
        return spec

    def find_merges(self, runs: list[RunInfo]) -> Optional[list[RunInfo]]:
        """maybe_merge-compatible: the first viable window (re-planned each
        merge round, so the full spec still executes)."""
        spec = self.find_all_merges(runs)
        return spec[0] if spec else None
