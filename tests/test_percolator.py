"""Percolator (MemoryIndex single-doc matching + monitor-style trigger-term
pruning): the matched doc set per registered query must equal the engine's
own search over the same corpus."""

import pytest

from lucene_solr_spark.operators.percolator import Percolator, trigger_terms
from lucene_solr_spark.plans.query import (
    BooleanQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermQuery,
    WildcardQuery,
)

QUERIES = {
    "q_term": TermQuery("wuloze"),
    "q_bool": BooleanQuery.build(must=[TermQuery("ge0")], must_not=[TermQuery("wuloze")]),
    "q_phrase": PhraseQuery(("vecodu", "ge0")),
    "q_sloppy": PhraseQuery(("vecodu", "numa"), slop=3),
    "q_prefix": PrefixQuery("wu"),
    "q_syn": SynonymQuery(("wuloze", "tepira")),
    "q_mm": BooleanQuery.build(
        should=[TermQuery("vecodu"), TermQuery("numa"), TermQuery("wehu")],
        minimum_should_match=2,
    ),
    "q_neg": BooleanQuery.build(should=[MatchAllQuery()], must_not=[TermQuery("ge0")]),
}


@pytest.fixture(scope="module")
def matches(searcher, spark_corpus):
    p = Percolator(QUERIES, searcher.index.config.analyzer)
    out = p.match(spark_corpus).collect()
    by_q: dict = {qid: set() for qid in QUERIES}
    for r in out:
        by_q[r["query_id"]].add(r["doc_id"])
    return by_q


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_percolate_matches_engine_search(matches, searcher, qid):
    want = {
        r["doc_id"] for r in searcher.search(QUERIES[qid], 10_000_000).df.collect()
    }
    assert matches[qid] == want, qid


def test_trigger_terms_soundness():
    assert trigger_terms(TermQuery("a")) == {"a"}
    assert trigger_terms(PhraseQuery(("a", "b"))) == {"a"}
    assert trigger_terms(QUERIES["q_bool"]) == {"ge0"}  # MUST clause prunes
    assert trigger_terms(QUERIES["q_mm"]) == {"vecodu", "numa", "wehu"}
    assert trigger_terms(QUERIES["q_neg"]) is None  # pure negation: always test
    assert trigger_terms(PrefixQuery("wu")) is None
    assert trigger_terms(WildcardQuery("w?hu")) is None


def test_pruning_still_complete(searcher, spark_corpus):
    """Pruned candidate evaluation must not lose matches: compare against a
    no-pruning percolator (every query always a candidate)."""
    p = Percolator(QUERIES, searcher.index.config.analyzer)
    p.triggers = {qid: None for qid in QUERIES}  # disable pruning
    brute = {(r["doc_id"], r["query_id"]) for r in p.match(spark_corpus).collect()}
    pruned = Percolator(QUERIES, searcher.index.config.analyzer)
    fast = {(r["doc_id"], r["query_id"]) for r in pruned.match(spark_corpus).collect()}
    assert fast == brute


def test_streaming_percolation_foreachbatch(spark, fixture_corpus_pdf, searcher, tmp_path_factory):
    """Percolation over a file stream: two micro-batches through foreachBatch
    must produce exactly the batch match set (exactly-once via checkpoint)."""
    base = tmp_path_factory.mktemp("percolate")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    pdf = fixture_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf = pdf.assign(doc_id=range(len(pdf)))[["doc_id", "text"]]
    half = len(pdf) // 2
    p = Percolator({"q_term": QUERIES["q_term"], "q_mm": QUERIES["q_mm"]}, searcher.index.config.analyzer)

    def percolate_batch(batch_df, _bid):
        p.match(batch_df).write.mode("append").parquet(out)

    schema = spark.createDataFrame(pdf).schema
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src + f"/c{i}")
        q = (
            spark.readStream.schema(schema).parquet(src + "/c*")
            .writeStream.foreachBatch(percolate_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got = {(r["doc_id"], r["query_id"]) for r in spark.read.parquet(out).collect()}
    want = {
        (r["doc_id"], r["query_id"])
        for r in p.match(spark.createDataFrame(pdf)).collect()
    }
    assert got == want and got
