"""Terms enumeration (TermsComponent) and term vectors vs the oracle's
postings dictionary."""


def test_terms_enum_count_and_index_order(searcher, oracle):
    expect = sorted(
        ((t, len(p)) for t, p in oracle.postings.items() if t.startswith("s") and len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:15]
    got = [(r["term"], r["df"]) for r in searcher.terms_enum(prefix="s", min_count=2, limit=15).collect()]
    assert got == expect

    expect_ix = sorted(t for t in oracle.postings if "m" <= t < "q")[:10]
    got_ix = [r["term"] for r in searcher.terms_enum(lower="m", upper="q", sort="index", limit=10).collect()]
    assert got_ix == expect_ix


def test_term_vectors_match_oracle(searcher, oracle):
    ids = [3, 17, 40]
    expect = sorted(
        (d, t, p[d])
        for t, p in oracle.postings.items()
        for d in ids
        if d in p
    )
    got = [
        (r["doc_id"], r["term"], r["tf"])
        for r in searcher.term_vectors(ids).orderBy("doc_id", "term").collect()
    ]
    assert got == expect


def test_elevate_pins_and_bans(searcher, oracle):
    from lucene_solr_spark.plans.query import TermQuery

    by_df = sorted(oracle.postings.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    hot = by_df[0][0]
    organic = [d for d, _ in oracle.search(TermQuery(hot), 20)]
    pin = [organic[5], organic[2]]
    ban = [organic[0]]
    got = searcher.elevate(TermQuery(hot), pin, k=8, exclude_ids=ban).collect()
    assert [r["doc_id"] for r in got][:2] == pin  # pinned order preserved
    assert all(r["elevated"] for r in got[:2]) and not any(r["elevated"] for r in got[2:])
    expect_tail = [d for d in organic if d not in set(pin) | set(ban)][:6]
    assert [r["doc_id"] for r in got[2:]] == expect_tail
    assert [r["rank"] for r in got] == list(range(1, 9))
