"""classification/utils analogs: ConfusionMatrixGenerator, DatasetSplitter,
the kNN quantized contract vote, and the deterministic training-shard export.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.operators.classify import (
    KNearestNeighborClassifier,
    SimpleNaiveBayesClassifier,
    classification_metrics,
    confusion_matrix,
    split_dataset,
)
from lucene_solr_spark.operators.sampling import K, P, shard_assign


@pytest.fixture(scope="module")
def nb_assigned(index8, spark_corpus):
    nb = SimpleNaiveBayesClassifier(index8, spark_corpus, "role")
    return nb.classify().persist()


def test_confusion_matrix_counts(nb_assigned, spark_corpus):
    cm = confusion_matrix(nb_assigned, spark_corpus, "role").toPandas()
    # brute: pandas crosstab of the same argmax output
    got = nb_assigned.select("doc_id", "cls").toPandas()
    actual = spark_corpus.select("doc_id", "role").toPandas()
    merged = got.merge(actual, on="doc_id")
    brute = (
        merged.groupby(["role", "cls"]).size().reset_index(name="n")
    )
    lhs = {(r.role, r.cls): r.n for r in brute.itertuples()}
    rhs = {(r.actual, r.assigned): r.n for r in cm.itertuples()}
    assert lhs == rhs
    assert cm["n"].sum() == spark_corpus.count()


def test_classification_metrics(nb_assigned, spark_corpus):
    cm = confusion_matrix(nb_assigned, spark_corpus, "role").collect()
    m = classification_metrics(cm)
    assert m["total"] == spark_corpus.count()
    assert 0.0 <= m["accuracy"] <= 1.0
    # accuracy equals the diagonal mass by definition
    diag = sum(int(r["n"]) for r in cm if r["actual"] == r["assigned"])
    assert m["accuracy"] == diag / m["total"]
    for stats in m["per_class"].values():
        for v in stats.values():
            assert 0.0 <= v <= 1.0


def test_split_dataset_deterministic_and_banded(spark_corpus):
    s1 = split_dataset(spark_corpus, test_ppm=200_000, cv_ppm=100_000)
    s2 = split_dataset(spark_corpus.repartition(13), test_ppm=200_000, cv_ppm=100_000)
    p1 = s1.select("doc_id", "split").toPandas().sort_values("doc_id").reset_index(drop=True)
    p2 = s2.select("doc_id", "split").toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)
    # every row lands in exactly one band, and the band matches the hash replay
    for r in p1.itertuples():
        band = ((r.doc_id % P) * K) % P % 1_000_000
        want = "test" if band < 200_000 else ("cv" if band < 300_000 else "train")
        assert r.split == want


def test_split_dataset_validation(spark_corpus):
    with pytest.raises(ValueError):
        split_dataset(spark_corpus, test_ppm=600_000, cv_ppm=500_000)
    with pytest.raises(ValueError):
        split_dataset(spark_corpus, test_ppm=-1)


def test_knn_quantized_matches_float_argmax(searcher):
    knn = KNearestNeighborClassifier(searcher, "role")
    for d in (3, 17, 40):
        f = knn.classify_doc(d)
        q = knn.classify_doc_quantized(d)
        assert (f is None) == (q is None)
        if f is not None:
            assert f[0] == q[0]
            assert isinstance(q[1], int)


def test_knn_batched_matches_single(searcher):
    knn = KNearestNeighborClassifier(searcher, "role")
    targets = (3, 17, 40, 55)
    batched = knn.classify_docs_quantized(targets)
    for d in targets:
        assert batched[d] == knn.classify_doc_quantized(d)


def test_shard_assign_brute_and_invariance(spark_corpus):
    out = shard_assign(spark_corpus.select("doc_id"), 7, n_partitions=8).toPandas()
    # brute replay: rank in (hash, id) order, floor-divided into shards
    ids = sorted(out["doc_id"], key=lambda i: (((i % P) * K) % P, i))
    want = {i: (rk // 7, rk % 7) for rk, i in enumerate(ids)}
    for r in out.itertuples():
        assert want[r.doc_id] == (r.shard_id, r.shard_pos)
    # exact shard sizes: all full except possibly the last
    sizes = out.groupby("shard_id").size()
    assert (sizes.iloc[:-1] == 7).all() if len(sizes) > 1 else True
    assert sizes.sum() == len(out)
    # partitioning invariance
    out2 = shard_assign(
        spark_corpus.select("doc_id").repartition(3), 7, n_partitions=5
    ).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_shard_assign_validation(spark_corpus):
    with pytest.raises(ValueError):
        shard_assign(spark_corpus, 0)


def _brute_perceptron(spark_corpus, index8, label_of, batch_size=1):
    """Pure-Python replay of BooleanPerceptronClassifier.java's loop."""
    analyzer = index8.config.analyzer
    pdf = spark_corpus.select("doc_id", "text").toPandas().sort_values("doc_id")
    doc_tf = {}
    for r in pdf.itertuples():
        counts = {}
        for t in analyzer.tokens(r.text):
            counts[t] = counts.get(t, 0) + 1
        doc_tf[int(r.doc_id)] = counts
    w = {}
    for counts in doc_tf.values():
        for t, tf in counts.items():
            w[t] = w.get(t, 0) + tf  # totalTermFreq init
    sum_ttf = sum(w.values())
    bias = sum_ttf / len(doc_tf)
    fst = dict(w)
    batch_count = 0
    for did in sorted(doc_tf):
        counts = doc_tf[did]
        output = sum(tf * fst.get(t, 0) for t, tf in counts.items())
        assigned = output >= bias
        correct = label_of(did)
        modifier = (correct > assigned) - (correct < assigned)
        if modifier != 0:
            for t, tf in counts.items():
                # reference :174-180: read the STALE fst snapshot, overwrite
                # the live map with max(0, snapshot + modifier*tf) — later
                # same-term updates within a batch window replace, not add
                w[t] = max(0, fst.get(t, 0) + modifier * tf)
            if batch_count % batch_size == 0:
                fst = dict(w)
        batch_count += 1
    outputs = {
        did: sum(tf * w.get(t, 0) for t, tf in counts.items())
        for did, counts in doc_tf.items()
    }
    return w, bias, outputs


def test_perceptron_reference_parity(spark_corpus, index8):
    from lucene_solr_spark.operators.classify import BooleanPerceptronClassifier

    labeled = spark_corpus.withColumn("is_user", F.col("role") == "user")
    p = BooleanPerceptronClassifier(index8, labeled, "is_user")
    weights = {r["term"]: int(r["weight"]) for r in p.train(n_partitions=1).collect()}
    roles = dict(
        (int(r["doc_id"]), r["role"] == "user")
        for r in spark_corpus.select("doc_id", "role").collect()
    )
    brute_w, brute_bias, brute_out = _brute_perceptron(
        spark_corpus, index8, lambda did: roles[did]
    )
    assert p.bias == brute_bias
    assert weights == brute_w
    got = {
        int(r["doc_id"]): (int(r["output"]), bool(r["assigned"]))
        for r in p.classify().collect()
    }
    for did, out in brute_out.items():
        assert got[did] == (out, out >= brute_bias)


def test_perceptron_mixing_deterministic(spark_corpus, index8):
    from lucene_solr_spark.operators.classify import BooleanPerceptronClassifier

    labeled = spark_corpus.withColumn("is_user", F.col("role") == "user")
    a = BooleanPerceptronClassifier(index8, labeled, "is_user")
    b = BooleanPerceptronClassifier(index8, labeled, "is_user")
    wa = {r["term"]: int(r["weight"]) for r in a.train(n_partitions=4).collect()}
    wb = {r["term"]: int(r["weight"]) for r in b.train(n_partitions=4).collect()}
    assert wa == wb
    assert wa  # non-trivial vocabulary


def test_perceptron_empty_doc_and_batch_timing(spark):
    """A doc with no indexed terms must still advance the batch ordinal
    (reference batchCount++), and classify() must emit output=0 for it."""
    import pandas as pd

    from lucene_solr_spark.operators.classify import BooleanPerceptronClassifier
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index

    rows = [
        ("c0", 0, "alpha alpha beta", True),
        ("c1", 0, "...", False),  # tokenizes to nothing
        ("c2", 0, "beta gamma", False),
        ("c3", 0, "alpha gamma gamma", True),
        # repeated-term False docs drive a weight to exactly zero through
        # successive -1 overwrites.  (The reference's max(0, ...) clamp at
        # BooleanPerceptronClassifier.java:176 is provably a defensive
        # no-op under totalTermFreq init: every doc updates a term at most
        # once by at most its own tf, so fst[t] >= the sum of unprocessed
        # tfs and never goes negative; the port mirrors the clamp anyway.)
        ("c4", 0, "delta delta delta delta", False),
        ("c5", 0, "delta delta beta beta beta", False),
        ("c6", 0, "beta beta beta delta", False),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "lbl"])
    corpus = assign_doc_ids(spark.createDataFrame(pdf), ("conv_id", "turn_idx"), 2).persist()
    idx = build_index(corpus, IndexConfig(n_partitions=2)).persist()
    for bs in (1, 2, 3):
        p = BooleanPerceptronClassifier(idx, corpus, "lbl", batch_size=bs)
        weights = {r["term"]: int(r["weight"]) for r in p.train(n_partitions=1).collect()}
        brute_w, brute_bias, brute_out = _brute_perceptron(
            corpus, idx, lambda did, _m={int(r["doc_id"]): r["lbl"] for r in corpus.collect()}: _m[did],
            batch_size=bs,
        )
        assert weights == brute_w, f"batch_size={bs}"
        got = {int(r["doc_id"]): int(r["output"]) for r in p.classify().collect()}
        assert got == brute_out  # includes the empty doc at output 0


def test_knn_batched_empty_text_target(spark):
    """A target whose text tokenizes to nothing gets None from the batched
    path, same as the single path (MatchNoDocsQuery short-circuit)."""
    import pandas as pd

    from lucene_solr_spark.operators.classify import KNearestNeighborClassifier
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    rows = [
        ("c0", 0, "alpha beta", "x"),
        ("c1", 0, "???", "y"),
        ("c2", 0, "alpha gamma", "x"),
        ("c3", 0, "beta gamma", "y"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "role"])
    corpus = assign_doc_ids(spark.createDataFrame(pdf), ("conv_id", "turn_idx"), 2).persist()
    s = IndexSearcher(build_index(corpus, IndexConfig(n_partitions=2)), corpus, prune_min_postings=0)
    empty_id = next(int(r["doc_id"]) for r in corpus.collect() if r["text"] == "???")
    other_id = next(int(r["doc_id"]) for r in corpus.collect() if r["text"] == "alpha beta")
    knn = KNearestNeighborClassifier(s, "role", k=3)
    res = knn.classify_docs_quantized([empty_id, other_id])
    assert res[empty_id] is None
    assert res[other_id] == knn.classify_doc_quantized(other_id)


def test_bm25nb_null_class_and_missing_target(spark):
    import pandas as pd

    from lucene_solr_spark.operators.classify import BM25NBClassifier
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    rows = [
        ("c0", 0, "alpha beta", "x"),
        ("c1", 0, "beta gamma", None),  # unlabeled row must not crash
        ("c2", 0, "alpha gamma", "y"),
        ("c3", 0, "...", "x"),  # term-less doc -> reference's prior-only row
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "role"])
    corpus = assign_doc_ids(spark.createDataFrame(pdf), ("conv_id", "turn_idx"), 2).persist()
    s = IndexSearcher(build_index(corpus, IndexConfig(n_partitions=2)), corpus, prune_min_postings=0)
    empty_id = next(int(r["doc_id"]) for r in corpus.collect() if r["text"] == "...")
    out = BM25NBClassifier(s, "role").classify([0, empty_id, 999])  # 999 absent -> no row
    assert [t for t, _, _ in out] == sorted([0, empty_id])
    by_id = {t: (c, sc) for t, c, sc in out}
    assert by_id[0][0] in ("x", "y")
    # the term-less doc classifies by prior alone: argmax_c q20(ln(cl_c))
    assert by_id[empty_id][0] in ("x", "y")


def test_temperature_mixture_many_strata_path(spark_corpus):
    """>64 strata takes the broadcast-threshold join; results must equal the
    literal-filter replay."""
    import math

    from lucene_solr_spark.operators.sampling import temperature_mixture

    df = spark_corpus.withColumn("stratum", (F.col("doc_id") % 70).cast("string"))
    kept = temperature_mixture(df, "stratum", tau=0.5, target_fraction=0.5)
    got = set(r["doc_id"] for r in kept.select("doc_id").collect())
    pdf = df.select("doc_id", "stratum").toPandas()
    sizes = pdf.groupby("stratum").size().to_dict()
    w = {s: math.sqrt(float(n)) for s, n in sizes.items()}
    wt = 0.0
    for s in sorted(w):
        wt += w[s]
    target = 0.5 * float(len(pdf))
    ppm = {
        s: int(math.floor(min(1.0, target * w[s] / (wt * sizes[s])) * 1_000_000))
        for s in sizes
    }
    want = {
        int(r.doc_id)
        for r in pdf.itertuples()
        if ((r.doc_id % P) * K) % P % 1_000_000 < ppm[r.stratum]
    }
    assert got == want


def test_nearest_fuzzy_leaves_brute(searcher, spark_corpus):
    """Independent replay of NearestFuzzyQuery.rewrite: expansion set, f32
    boost/score chain, per-term and global caps, df fallback."""
    import numpy as np

    from lucene_solr_spark.functions import bm25
    from lucene_solr_spark.functions.editdist import levenshtein
    from lucene_solr_spark.operators.classify import nearest_fuzzy_leaves

    analyzer = searcher.index.config.analyzer
    pdf = spark_corpus.select("text").toPandas()
    df_map = {}
    for text in pdf["text"]:
        for t in set(analyzer.tokens(text)):
            df_map[t] = df_map.get(t, 0) + 1
    n_docs = spark_corpus.count()

    text = "vecodu numma qzqzq"  # exact + misspelled + no-expansion tokens
    cands = []
    for src in ["vecodu", "numma", "qzqzq"]:
        pre, suf = src[:2], src[2:]
        vs, n_var, tot, df_src = [], 0, 0, 0
        for term, df in df_map.items():
            if not term.startswith(pre) or levenshtein(term[2:], suf) > 1:
                continue
            n_var += 1
            tot += df
            if term == src:
                df_src = df
                b = np.float32(1.0)
            else:
                b = np.float32(1.0) - np.float32(1) / np.float32(min(len(term), len(src)))
            vs.append((float(b), term))
        if not n_var:
            continue
        dfu = df_src if df_src > 0 else tot // n_var
        idf_src = np.float32(np.log((n_docs + 1) / (dfu + 1.0)) + 1.0)
        vs.sort(key=lambda x: (-x[0], x[1]))
        for b, term in vs[:50]:
            b32 = np.float32(b)
            cands.append((float(np.float32(np.float32(b32 * b32) * idf_src)), term, src))
    cands.sort(key=lambda x: (-x[0], x[1]))
    idf1 = bm25.idf(1, n_docs)
    want = [
        (src, term, float(np.float32(np.float32(st) * idf1)))
        for st, term, src in cands[:300]
    ]
    got = nearest_fuzzy_leaves(searcher, text)
    assert got == want
    assert any(t == "vecodu" for _, t, _ in got)  # exact source survives
    assert all(t[:2] in ("ve", "nu") for _, t, _ in got)  # qzqzq expands to nothing


def test_fuzzy_like_this_ignore_tf_brute(searcher, spark_corpus):
    """FLT ignoreTF: doc score == float sum of matched constant-score leaf
    boosts, independent of tf/norm; parameterized leaves at maxEdits=2."""
    import numpy as np

    from lucene_solr_spark.operators.classify import (
        fuzzy_like_this_search,
        nearest_fuzzy_leaves,
    )

    text = "vecodu numma"
    leaves = nearest_fuzzy_leaves(
        searcher, text, max_edits=2, prefix_length=2, df_one_weight=False
    )
    assert leaves and all(w > 0 for _, _, w in leaves)
    top = fuzzy_like_this_search(
        searcher, text, 10, max_edits=2, prefix_length=2, ignore_tf=True
    ).collect()
    assert top
    analyzer = searcher.index.config.analyzer
    texts = {int(r["doc_id"]): r["text"] for r in spark_corpus.select("doc_id", "text").collect()}
    for r in top:
        toks = set(analyzer.tokens(texts[int(r["doc_id"])]))
        want = float(np.float32(sum(float(w) for _, t, w in leaves if t in toks)))
        assert r["score"] == want
    # maxEdits=2 admits suffix-distance-2 variants a maxEdits=1 pass rejects
    l1 = nearest_fuzzy_leaves(searcher, text, max_edits=1, df_one_weight=False)
    assert {t for _, t, _ in l1} <= {t for _, t, _ in leaves}


def test_knn_fuzzy_classifier_deterministic(searcher):
    from lucene_solr_spark.operators.classify import KNearestFuzzyClassifier

    knn = KNearestFuzzyClassifier(searcher, "role", k=5)
    r1 = knn.classify_text_quantized("vecodu numma")
    r2 = knn.classify_text_quantized("vecodu numma")
    assert r1 == r2 and r1 is not None
    cls, vote = r1
    assert isinstance(vote, int) and vote > 0
    assert knn.classify_text_quantized("qzqzq") is None


def test_bm25nb_brute(searcher, spark_corpus, oracle):
    """BM25NBClassifier vs an independent replay that literally takes the
    per-(class, word) max over the control engine's exact term scores."""
    import math

    import numpy as np

    from lucene_solr_spark.functions import bm25
    from lucene_solr_spark.functions.smallfloat import int_to_byte4
    from lucene_solr_spark.operators.classify import BM25NBClassifier, Q_SCALE

    targets = (3, 17)
    got = BM25NBClassifier(searcher, "role").classify(targets)

    roles = {int(r["doc_id"]): r["role"] for r in spark_corpus.select("doc_id", "role").collect()}
    classes = sorted(set(roles.values()))
    n_docs = len(roles)
    analyzer = searcher.index.config.analyzer
    texts = {
        int(r["doc_id"]): r["text"] for r in spark_corpus.select("doc_id", "text").collect()
    }
    cache1 = bm25.norm_cache(np.float32(1.0))[int_to_byte4(1) & 0xFF]
    t1 = np.float32(np.float64(1.0) / (1.0 + np.float64(cache1)))
    df_c = {c: sum(1 for v in roles.values() if v == c) for c in classes}
    cl = {c: float(np.float32(bm25.idf(df_c[c], n_docs) * t1)) for c in classes}

    def q20(x):
        return math.floor(float(np.float32(x)) * float(Q_SCALE))

    want = []
    for t in targets:
        counts: dict = {}
        for w in analyzer.tokens(texts[t]):
            counts[w] = counts.get(w, 0) + 1
        best = None
        for c in classes:
            score = q20(math.log(cl[c]))
            for w, tf in counts.items():
                # control engine: exact f32 term scores per doc
                scores = oracle._term_scores(w, 1.0)
                mx = max(
                    (s for d, s in scores.items() if roles[d] == c), default=0.0
                )
                tp = float(np.float32(cl[c] + mx))
                score += tf * q20(math.log(tp))
            if best is None or score > best[1]:
                best = (c, score)
        want.append((t, best[0], best[1]))
    assert got == want


def test_temperature_mixture_brute_and_flattening(spark_corpus):
    import math

    from lucene_solr_spark.operators.sampling import temperature_mixture

    kept = temperature_mixture(spark_corpus, "role", tau=0.5, target_fraction=0.5)
    got = kept.select("doc_id", "role").toPandas()
    # brute replay of the threshold computation + hash filter
    pdf = spark_corpus.select("doc_id", "role").toPandas()
    sizes = pdf.groupby("role").size().to_dict()
    w = {s: math.sqrt(float(n)) for s, n in sizes.items()}
    wt = 0.0
    for s in sorted(w):
        wt += w[s]
    target = 0.5 * float(len(pdf))
    ppm = {
        s: int(math.floor(min(1.0, target * w[s] / (wt * sizes[s])) * 1_000_000))
        for s in sizes
    }
    want = {
        int(r.doc_id)
        for r in pdf.itertuples()
        if ((r.doc_id % P) * K) % P % 1_000_000 < ppm[r.role]
    }
    assert set(got["doc_id"]) == want
    # tau < 1 flattens: smaller strata keep a rate >= larger strata
    rates = {
        s: len(got[got["role"] == s]) / n for s, n in sizes.items() if n > 0
    }
    by_size = sorted(sizes, key=sizes.get)
    for small, big in zip(by_size, by_size[1:]):
        assert rates[small] >= rates[big] - 0.05  # hash granularity slack
    with pytest.raises(ValueError):
        temperature_mixture(spark_corpus, "role", tau=0.5, target_fraction=0.0)
    with pytest.raises(ValueError):
        temperature_mixture(spark_corpus, "role", tau=-1.0)
