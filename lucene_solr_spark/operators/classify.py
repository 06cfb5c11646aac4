"""Index-backed text classification — ``lucene/classification`` analog.

- :class:`SimpleNaiveBayesClassifier` — add-one-smoothed naive Bayes whose
  sufficient statistics come straight out of the inverted-index build
  (reference ``lucene/classification/src/java/org/apache/lucene/
  classification/SimpleNaiveBayesClassifier.java:147,203-270``):

      score(d, c) = [ln df(c) - ln N_labeled]                    (log prior)
                  + Σ_w tf_w(d) · ln( (hits(w,c) + 1) / den(c) ) (likelihood)
      den(c)     = avgUniqueTermsPerDoc · df(c) + N_labeled
      hits(w,c)  = #docs of class c containing w   (doc freq, not term freq)

- :class:`KNearestNeighborClassifier` — MLT top-k neighbour vote (reference
  ``KNearestNeighborClassifier.java:130-236``): per class,
  score = Σ(hit_score / max_score) / k, scaled by k/sumdoc when fewer than
  k hits return.

Scale design.  Training is two distributed aggregations over the tokenized
corpus: per-class doc counts (|classes| rows) and per-(term, class) doc
frequencies (bounded by the postings count — same magnitude as the index's
terms table).  Scoring avoids the |doc_terms| × |classes| cross-product by
splitting the likelihood into a dense part that only needs the document
length (every word contributes -tf·ln den(c) when hits = 0) and a sparse
part from an inner join with the (term, class) table — so the only shuffle
is on term, and the tiny per-class constants broadcast.

Determinism.  Floating sums over shuffled rows are order-dependent, so the
exact contract path quantizes each word's float32 log-contribution to a
2^-20 fixed-point BIGINT and sums integers (order-free, bitwise-reproducible
on any cluster and in the DuckDB oracle).  ``score`` keeps the reference's
double-precision formulation for parity tests.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

Q_BITS = 20
Q_SCALE = 1 << Q_BITS


def _q(col):
    """floor(float32(x) · 2^20) as BIGINT — exact: a float32 times 2^20 is
    exactly representable in float64, so floor is unambiguous."""
    return F.floor(col.cast("float").cast("double") * F.lit(float(Q_SCALE))).cast("bigint")


def _doc_terms(corpus: DataFrame, config) -> DataFrame:
    """(doc_id, term, tf) via the index's own vectorized analyzer."""
    import pandas as pd

    analyzer = config.analyzer
    id_col, text_col = config.id_col, config.text_col

    def explode(iterator):
        for pdf in iterator:
            rows = {"doc_id": [], "term": [], "tf": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                counts: dict = {}
                for t in analyzer.tokens(text):
                    counts[t] = counts.get(t, 0) + 1
                rows["doc_id"].extend([did] * len(counts))
                rows["term"].extend(counts.keys())
                rows["tf"].extend(counts.values())
            yield pd.DataFrame(rows)

    return corpus.select(id_col, text_col).mapInPandas(
        explode, "doc_id long, term string, tf long"
    )


class SimpleNaiveBayesClassifier:
    def __init__(self, index, corpus: DataFrame, class_col: str):
        self.index = index
        self.corpus = corpus
        self.class_col = class_col
        cfg = index.config
        id_col = cfg.id_col
        labeled = corpus.filter(F.col(class_col).isNotNull())
        # per-class doc counts (docCount(term) / countDocsWithClass,
        # SimpleNaiveBayesClassifier.java:160-178,266-270)
        self.class_stats = labeled.groupBy(F.col(class_col).alias("cls")).agg(
            F.count("*").cast("bigint").alias("df_c")
        )
        self.doc_terms = _doc_terms(corpus, cfg)
        # hits(w, c): docs of class c containing w (:250-264) — one shuffle
        # keyed (term, cls); magnitude == the index's term/doc pair count
        self.word_class = (
            self.doc_terms.join(
                labeled.select(F.col(id_col).alias("doc_id"), F.col(class_col).alias("cls")),
                "doc_id",
            )
            .groupBy("term", "cls")
            .agg(F.count("*").cast("bigint").alias("hits"))
        )

    def _consts(self):
        """Per-class scalars: prior, den(c) — computed once, broadcast."""
        terms = self.index.terms
        # avg # unique terms per doc = sumDocFreq / docCount (:231-241)
        agg = terms.agg(F.sum("df").alias("sdf")).collect()[0]
        avg_unique = float(agg["sdf"]) / float(self.index.doc_count)
        cls = self.class_stats
        n_labeled = cls.agg(F.sum("df_c")).collect()[0][0]
        return (
            cls.withColumn("den", F.lit(avg_unique) * F.col("df_c") + F.lit(float(n_labeled)))
            .withColumn("prior", F.log(F.col("df_c").cast("double")) - F.log(F.lit(float(n_labeled))))
        )

    def scores(self, docs: Optional[DataFrame] = None, quantized: bool = True) -> DataFrame:
        """(doc_id, cls, score) for every candidate class of each doc.

        quantized=True → score is the order-free fixed-point BIGINT contract
        path; False → the reference's float64 formulation.
        """
        consts = self._consts()
        id_col = self.index.config.id_col
        dt = self.doc_terms
        if docs is not None:
            dt = dt.join(docs.select(F.col(id_col).alias("doc_id")), "doc_id")
        doc_len = dt.groupBy("doc_id").agg(F.sum("tf").alias("dlen"))

        if quantized:
            zero_c = _q(F.log(F.lit(1.0) / F.col("den")))  # per-word hits=0 term
            consts_q = consts.select(
                "cls", "den", _q(F.col("prior")).alias("prior_q"), zero_c.alias("zero_q")
            )
            # dense part: prior + dlen·zero_q  (every word at its hits=0 value)
            dense = doc_len.crossJoin(F.broadcast(consts_q)).select(
                "doc_id", "cls", "den", "zero_q",
                (F.col("prior_q") + F.col("dlen") * F.col("zero_q")).alias("base_q"),
            )
            # sparse correction where hits > 0: tf · (q(ln((hits+1)/den)) - zero_q)
            sparse = (
                dt.join(self.word_class, "term")
                .join(F.broadcast(consts_q.select("cls", "den", "zero_q")), "cls")
                .select(
                    "doc_id", "cls",
                    (
                        F.col("tf")
                        * (_q(F.log((F.col("hits") + 1).cast("double") / F.col("den"))) - F.col("zero_q"))
                    ).alias("corr_q"),
                )
                .groupBy("doc_id", "cls")
                .agg(F.sum("corr_q").alias("corr_q"))
            )
            return (
                dense.join(sparse, ["doc_id", "cls"], "left")
                .select(
                    "doc_id", "cls",
                    (F.col("base_q") + F.coalesce(F.col("corr_q"), F.lit(0))).cast("bigint").alias("score"),
                )
            )

        consts_d = consts.select("cls", "den", "prior")
        dense = doc_len.crossJoin(F.broadcast(consts_d)).select(
            "doc_id", "cls", "den",
            (F.col("prior") - F.col("dlen") * F.log("den")).alias("base"),
        )
        sparse = (
            dt.join(self.word_class, "term")
            .join(F.broadcast(consts_d.select("cls")), "cls", "left_semi")
            .groupBy("doc_id", "cls")
            .agg(F.sum(F.col("tf") * F.log((F.col("hits") + 1).cast("double"))).alias("corr"))
        )
        return (
            dense.join(sparse, ["doc_id", "cls"], "left")
            .select("doc_id", "cls", (F.col("base") + F.coalesce(F.col("corr"), F.lit(0.0))).alias("score"))
        )

    def classify(self, docs: Optional[DataFrame] = None, quantized: bool = True) -> DataFrame:
        """(doc_id, cls, score): the argmax class per doc (ties → cls asc)."""
        s = self.scores(docs, quantized=quantized)
        from pyspark.sql.window import Window

        w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
        return (
            s.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "cls", "score")
        )


class KNearestNeighborClassifier:
    """MLT-neighbour vote (``KNearestNeighborClassifier.java:130-236``)."""

    def __init__(self, searcher, class_col: str, k: int = 10, max_query_terms: int = 5):
        self.searcher = searcher
        self.class_col = class_col
        self.k = k
        self.max_query_terms = max_query_terms

    def classify_doc(self, doc_id: int):
        """Assign a class to an indexed doc via its MLT query; returns
        (cls, score) or None when the doc has no neighbours."""
        s = self.searcher
        mlt = s.more_like_this(doc_id, self.max_query_terms)
        top = s.search(mlt, self.k, exclude_doc_ids=[doc_id])
        id_col = s.index.config.id_col
        hits = (
            top.df.join(
                s.corpus.select(F.col(id_col).alias("doc_id"), F.col(self.class_col).alias("cls")),
                "doc_id",
            )
            .select("cls", "score")
            .collect()
        )
        if not hits:
            return None
        max_score = max(h["score"] for h in hits)
        sumdoc = len(hits)
        agg: dict = {}
        for h in hits:
            agg[h["cls"]] = agg.get(h["cls"], 0.0) + h["score"] / max_score
        scores = {c: v / self.k for c, v in agg.items()}
        if sumdoc < self.k:  # correction (:228-233)
            scores = {c: v * self.k / sumdoc for c, v in scores.items()}
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        return best
