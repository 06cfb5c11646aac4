"""Per-run term Bloom filters (BloomFilteringPostingsFormat / FuzzySet /
MurmurHash2 analogs): hash semantics, sizing curve, the no-false-negative
guarantee, search identity under pruning, and actual run skipping."""

import numpy as np
import pytest

from lucene_solr_spark.operators.bloom import (
    USABLE_BIT_SET_SIZES,
    build_term_blooms,
    may_contain,
    murmurhash2,
    nearest_set_size,
    positive_hash,
    prune_run_ids,
    rejected_run_ids,
)
from lucene_solr_spark.operators.searcher import IndexSearcher
from lucene_solr_spark.plans.query import BooleanQuery, TermQuery


def test_murmurhash2_java_int_semantics():
    # deterministic, int32-ranged, covers every tail length and signed bytes
    vals = {}
    for s in ["", "a", "ab", "abc", "abcd", "abcde", "scan", "merge", "käse", "日本語"]:
        h = murmurhash2(s.encode("utf-8"))
        assert -(2**31) <= h < 2**31
        assert murmurhash2(s.encode("utf-8")) == h
        vals[s] = h
    # distinct inputs should in practice hash apart
    assert len(set(vals.values())) == len(vals)


def test_positive_hash_min_value_edge():
    # Integer.MIN_VALUE * -1 overflows back to MIN_VALUE in Java; the later
    # AND uses the raw two's-complement bits
    assert positive_hash(-(2**31)) == 2**31
    assert positive_hash(-5) == 5
    assert positive_hash(7) == 7


def test_usable_sizes_all_ones():
    assert USABLE_BIT_SET_SIZES[:4] == [3, 7, 15, 31]
    for s in USABLE_BIT_SET_SIZES:
        assert (s & (s + 1)) == 0  # all-ones binary


def test_nearest_set_size_curve():
    # FuzzySet.getNearestSetSize(100, 0.10): 511 estimates ~53 uniques, 1023
    # estimates ~108 -> first size whose estimate exceeds 100 is 1023
    assert nearest_set_size(100, 0.10) == 1023
    assert nearest_set_size(50, 0.10) == 511
    # monotone in max_values
    sizes = [nearest_set_size(n, 0.10) for n in (10, 100, 1000, 10000)]
    assert sizes == sorted(sizes)


@pytest.fixture(scope="module")
def blooms(index8):
    b = build_term_blooms(index8).persist()
    b.count()
    return b


def test_no_false_negatives(index8, blooms):
    """Every (run, term) actually indexed MUST pass its run's bloom — the
    FuzzySet NO answer is definitive."""
    pairs = index8.postings.select("run_id", "term").distinct().toPandas()
    bm = {r["run_id"]: (r["bloom_size"], r["bits"]) for _, r in blooms.toPandas().iterrows()}
    assert set(pairs["run_id"]) == set(bm)
    for run_id, term in pairs.itertuples(index=False):
        size, bits = bm[run_id]
        assert may_contain(bytes(bits), int(size), term), (run_id, term)


def test_saturation_under_control(blooms):
    for _, r in blooms.toPandas().iterrows():
        bits = np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
        saturation = int(np.unpackbits(bits).sum()) / float(r["bloom_size"])
        assert saturation < 0.5  # sized for ~10%, generous bound


def test_search_identity_with_blooms(index8, spark_corpus, blooms, oracle):
    s = IndexSearcher(index8, spark_corpus)
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    rare = min(oracle.postings, key=lambda t: (len(oracle.postings[t]), t))
    for q in (
        TermQuery(rare),
        TermQuery(hot),
        BooleanQuery.build(should=[TermQuery(hot), TermQuery(rare)]),
        BooleanQuery.build(must=[TermQuery(hot), TermQuery(rare)]),
    ):
        plain = s.set_term_blooms(None).search(q, 10).collect()
        pruned = s.set_term_blooms(blooms).search(q, 10).collect()
        assert plain == pruned, q
    s.set_term_blooms(None)


def test_prune_actually_skips_runs(index8, blooms, oracle):
    """A term confined to few runs must not pass every run's bloom (with
    ~10% saturation the chance of all runs false-positive is negligible)."""
    total_runs = blooms.count()
    rare = min(oracle.postings, key=lambda t: (len(oracle.postings[t]), t))
    actual_runs = (
        index8.postings.filter(index8.postings.term == rare).select("run_id").distinct().count()
    )
    passing = prune_run_ids(blooms, [rare])
    assert actual_runs <= len(passing) < total_runs
    # and pruning with a nonsense term passes (almost surely) no runs
    ghost = prune_run_ids(blooms, ["zzqqxxyy_not_a_term_0427"])
    assert len(ghost) <= total_runs // 2


def test_stale_bloom_fails_open(index8, spark_corpus, blooms, oracle):
    """A bloom table missing some runs (built before newer runs flushed or
    attached to a different index) must never drop those runs' postings:
    pruning uses NOT IN (definitively-rejecting runs), so uncovered runs
    always pass and results stay identical."""
    rare = min(oracle.postings, key=lambda t: (len(oracle.postings[t]), t))
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    run_with_rare = (
        index8.postings.filter(index8.postings.term == rare)
        .select("run_id")
        .first()["run_id"]
    )
    # Drop the bloom row of a run that actually holds the rare term — the
    # old IN(passing) predicate would silently lose that run's hits.
    stale = blooms.filter(blooms.run_id != run_with_rare)
    assert stale.count() == blooms.count() - 1
    s = IndexSearcher(index8, spark_corpus)
    for q in (TermQuery(rare), BooleanQuery.build(should=[TermQuery(hot), TermQuery(rare)])):
        plain = s.set_term_blooms(None).search(q, 10).collect()
        pruned = s.set_term_blooms(stale).search(q, 10).collect()
        assert plain == pruned, q
    s.set_term_blooms(None)
    # rejected_run_ids never names a run absent from the table
    rej = rejected_run_ids(stale, ["zzqqxxyy_not_a_term_0427"])
    assert run_with_rare not in rej
    # and complements prune_run_ids over the covered runs
    covered = {r["run_id"] for r in stale.select("run_id").collect()}
    passing = set(prune_run_ids(stale, [rare]))
    assert set(rej).isdisjoint(passing)
    assert set(rejected_run_ids(stale, [rare])) == covered - passing


def test_prune_metrics_observability(index8, spark_corpus, oracle):
    """prune_metrics reports the θ block-skip rate and stays consistent with
    the identical-results guarantee."""
    s = IndexSearcher(index8, spark_corpus, prune_min_postings=0)
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    m = s.prune_metrics(TermQuery(hot), k=5)
    assert m["pruning_applied"]
    assert 0 < m["surviving_blocks"] <= m["blocks"]
    assert 0 < m["surviving_postings"] <= m["postings"]
    assert m["block_skip_rate"] == round(1 - m["surviving_blocks"] / m["blocks"], 4)
    # the pruned evaluation still returns the exact same top-k
    assert s.search(TermQuery(hot), 5, prune=True).collect() == s.search(
        TermQuery(hot), 5, prune=False
    ).collect()
    # cost gate: huge threshold -> exhaustive scan, no metrics
    gated = IndexSearcher(index8, spark_corpus, prune_min_postings=10**9)
    assert gated.prune_metrics(TermQuery(hot), k=5) == {"pruning_applied": False}
    import pytest as _pytest

    from lucene_solr_spark.plans.query import PhraseQuery

    with _pytest.raises(ValueError):
        s.prune_metrics(PhraseQuery(("a", "b")))


def test_facet_query_buckets(index8, spark_corpus, oracle):
    """facet.query: (base AND bucket) counts incl. zero buckets, one plan."""
    s = IndexSearcher(index8, spark_corpus)
    terms = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    base, b1, b2 = terms[0], terms[1], terms[2]
    got = {
        r["bucket"]: r["cnt"]
        for r in s.facet_query(
            TermQuery(base),
            {"one": TermQuery(b1), "and2": BooleanQuery.build(must=[TermQuery(b1), TermQuery(b2)]), "ghost": TermQuery("zz_nothing")},
        ).collect()
    }
    base_set = set(oracle.postings[base])
    s1 = set(oracle.postings[b1]) & base_set
    s2 = set(oracle.postings[b1]) & set(oracle.postings[b2]) & base_set
    assert got == {"one": len(s1), "and2": len(s2), "ghost": 0}
    # base=None counts over the whole collection
    got2 = {r["bucket"]: r["cnt"] for r in s.facet_query(None, {"one": TermQuery(b1)}).collect()}
    assert got2 == {"one": len(oracle.postings[b1])}
