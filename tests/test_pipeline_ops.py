"""Unit tests for the training-pipeline operators (dedup / ANN / textstats).

The DuckDB contract gate (scripts/check_contract.py) cross-checks these
against independent SQL; here we pin the *semantic* properties on tiny
hand-built corpora.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
        (3, "completely different text about spark engines and indexes"),
        (4, "the quick brown fox"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dup_groups(docs):
    from lucene_solr_spark.operators.dedup import exact_dup_groups

    got = exact_dup_groups(docs).collect()
    assert len(got) == 1
    assert got[0]["n_copies"] == 2 and got[0]["keep_id"] == 0


def test_ngram_jaccard_finds_near_dups(docs):
    from lucene_solr_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs  # exact dup: jaccard 1.0
    assert (0, 2) in pairs and (1, 2) in pairs  # one-token change
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates(docs):
    from lucene_solr_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    sigs = {r["doc_id"]: [r[f"sig_{i}"] for i in range(16)] for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # identical shingle sets -> identical signature
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def _ham64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_simhash_properties(docs):
    from lucene_solr_spark.operators.dedup import simhash, simhash_near_pairs

    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fps[0] == fps[1]
    assert _ham64(fps[0], fps[2]) < _ham64(fps[0], fps[3])  # near-dup closer
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=0).collect()}
    assert pairs.get((0, 1)) == 0
    with pytest.raises(ValueError):
        simhash_near_pairs(docs, max_hamming=4)  # beyond the 6-choose-3 guarantee


def test_simhash_block_layout_and_pigeonhole():
    """The 6-block layout tiles all 64 bits without straddling the 32-bit
    halves, and for ANY fingerprint pair at hamming <= 3 some 3-of-6 block
    combination key matches (Manku pigeonhole — complete recall)."""
    from itertools import combinations

    from lucene_solr_spark.operators.dedup import simhash_blocks

    blocks = simhash_blocks(64, 6)
    covered = []
    for off, size in blocks:
        assert (off < 32) == (off + size <= 32)  # no half straddle
        covered.extend(range(off, off + size))
    assert sorted(covered) == list(range(64))

    def keys(fp: int) -> list:
        out = []
        for combo in combinations(range(6), 3):
            k = 0
            for bi in combo:
                off, size = blocks[bi]
                k = (k << size) | ((fp >> off) & ((1 << size) - 1))
            out.append(k)
        return out

    rng = np.random.default_rng(11)
    for _ in range(300):
        fp = int(rng.integers(0, 1 << 63)) | (int(rng.integers(0, 2)) << 63)
        n_flip = int(rng.integers(0, 4))  # hamming 0..3
        flipped = fp
        for pos in rng.choice(64, size=n_flip, replace=False):
            flipped ^= 1 << int(pos)
        ka, kb = keys(fp), keys(flipped)
        assert any(x == y for x, y in zip(ka, kb)), (hex(fp), hex(flipped))


def test_simhash_near_pairs_no_missed_pair(spark):
    """End-to-end recall identity: on a corpus with many mutated copies,
    simhash_near_pairs(max_hamming=3) returns EXACTLY the brute-force set of
    fingerprint pairs at hamming <= 3."""
    from lucene_solr_spark.operators.dedup import simhash, simhash_near_pairs

    rng = np.random.default_rng(5)
    words = [f"tok{i}" for i in range(50)]
    rows = []
    did = 0
    for base in range(12):
        toks = list(rng.choice(words, size=30))
        for copy in range(3):  # mutate a few tokens per copy
            t = list(toks)
            for _ in range(copy):
                t[int(rng.integers(0, len(t)))] = str(rng.choice(words))
            rows.append((did, " ".join(t)))
            did += 1
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = {
        (a, b, _ham64(fps[a], fps[b]))
        for a in fps
        for b in fps
        if a < b and _ham64(fps[a], fps[b]) <= 3
    }
    assert want  # the corpus must actually contain near pairs
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert got == want


def test_lsh_params_autosizing():
    """lsh_params_for grows planes with log2(n) (candidates/table stays
    linear in n), restores recall through tables, and caps the fan-out."""
    import math

    from lucene_solr_spark.operators.similarity import (
        LSH_MAX_TABLES,
        lsh_params_for,
    )

    for n in (10**3, 10**6, 10**8, 10**9, 10**10):
        p, tables = lsh_params_for(n, target_cos=0.99, recall_target=0.9)
        assert p >= math.ceil(math.log2(n)) + 4
        assert n * n / 2**p <= n / 16 + 1  # candidate join linear in n
        # the recall budget really is met at the target cosine
        p_plane = 1 - math.acos(0.99) / math.pi
        assert (1 - p_plane**p) ** tables <= 0.1 + 1e-12 or tables == LSH_MAX_TABLES
    p9, l9 = lsh_params_for(10**9)
    p3, l3 = lsh_params_for(10**3)
    assert p9 > p3  # planes actually grow
    assert l9 >= l3  # harder plane count -> at least as many tables
    # low-cosine targets hit the declared cap instead of exploding
    _, l_low = lsh_params_for(10**9, target_cos=0.3)
    assert l_low == LSH_MAX_TABLES


def test_simhash_oversized_bucket_guard_identical_output(spark):
    """The collapse_identical guard (banded join over distinct fingerprints,
    expanded back) must be row-identical to the direct path — including on a
    corpus with heavy exact-duplicate skew, the case the guard exists for."""
    from lucene_solr_spark.operators.dedup import simhash_near_pairs

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(40)]
    base = list(rng.choice(words, size=25))
    rows = [(i, " ".join(base)) for i in range(30)]  # 30 exact dupes: one fp floods
    did = 30
    for _ in range(8):  # near copies at small mutation counts
        t = list(base)
        for _ in range(int(rng.integers(1, 3))):
            t[int(rng.integers(0, len(t)))] = str(rng.choice(words))
        rows.append((did, " ".join(t)))
        did += 1
    for _ in range(10):  # unrelated docs
        rows.append((did, " ".join(rng.choice(words, size=25))))
        did += 1
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    direct = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(docs, max_hamming=3, collapse_identical=False).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(docs, max_hamming=3, collapse_identical=True).collect()
    }
    assert 30 * 29 // 2 <= len(direct)  # the flood really is in the answer set
    assert guarded == direct


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 8)).astype(np.float32)
    base[1] = base[0] + 0.001  # vec 1 ~ vec 0
    pdf = pd.DataFrame({"vec_id": range(10), "embedding": [list(map(float, v)) for v in base]})
    return spark.createDataFrame(pdf)


def test_brute_force_topk(embs):
    from lucene_solr_spark.operators.similarity import brute_force_topk

    got = brute_force_topk(embs, [0], k=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert got[0]["neighbor_id"] == 1  # the planted near-duplicate wins
    assert got[0]["dot"] >= got[1]["dot"] >= got[2]["dot"]


def test_lsh_topk_subset_of_brute(embs):
    from lucene_solr_spark.operators.similarity import brute_force_topk, lsh_topk

    brute = {(r["query_id"], r["neighbor_id"]): r["dot"] for r in brute_force_topk(embs, [0], k=9).collect()}
    lsh = lsh_topk(embs, [0], k=9).collect()
    # every LSH result is a true neighbor with the exact same dot product
    for r in lsh:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["dot"]
    # the planted near-dup shares the bucket (same direction => same signs)
    assert any(r["neighbor_id"] == 1 for r in lsh)


def _unit_rows(rng, n, dim):
    v = rng.normal(size=(n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_embedding_neardup_recall_multitable(spark):
    """Verdict criterion: >= 0.9 pair recall vs brute force at the caller's
    own threshold under the AUTO-SIZED production defaults (planes from the
    corpus count, tables from the recall budget at cos = min_dot/1e6).
    Also exactness: every returned pair is a true >=min_dot pair."""
    from lucene_solr_spark.operators.similarity import embedding_neardup_pairs, quantize
    from pyspark.sql import functions as F  # noqa: F811

    rng = np.random.default_rng(3)
    dim, n_base, n_dup = 64, 240, 60
    base = _unit_rows(rng, n_base, dim)
    dup_src = base[:n_dup]
    # noise norm ~0.012*sqrt(64) ≈ 0.1 → cos(v, v') ≈ 0.995, above threshold
    dups = dup_src + 0.012 * rng.normal(size=(n_dup, dim))
    dups = dups / np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups])
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]})
    embs = spark.createDataFrame(pdf)

    qm = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    dots = qm @ qm.T
    min_dot = 950_000  # ~cos 0.95 at the quantized scale
    want = {
        (a, b) for a in range(len(vecs)) for b in range(a + 1, len(vecs)) if dots[a, b] >= min_dot
    }
    assert len(want) >= n_dup  # the planted pairs are all above threshold
    got = {
        (r["vec_a"], r["vec_b"]): r["dot"]
        for r in embedding_neardup_pairs(embs, min_dot=min_dot).collect()
    }
    assert set(got) <= want  # exact verify: no false positives
    for (a, b), d in got.items():
        assert d == int(dots[a, b])
    recall = len(got) / len(want)
    assert recall >= 0.9, recall


def test_ivf_recall_clustered(spark):
    """Trained-IVF recall: on a clustered corpus the sqrt(n)-centroid k-means
    lists + 2-probe search recover >= 0.9 of the brute-force top-5."""
    from lucene_solr_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(9)
    dim, n_clusters, per = 16, 20, 20
    centers = _unit_rows(rng, n_clusters, dim) * 10.0
    vecs = np.vstack(
        [centers[c] + 0.3 * rng.normal(size=(per, dim)) for c in range(n_clusters)]
    )
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]})
    embs = spark.createDataFrame(pdf)
    queries = [0, 25, 50, 111, 222, 333, 399]
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in brute_force_topk(embs, queries, k=5).collect()
    }
    ivf = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(embs, queries, k=5).collect()}
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.9, recall


def test_pq_topk_recall_and_exact_rerank(spark):
    """PQ ADC + exact re-rank: on a clustered corpus the 4x16-code ADC scan
    with k*refine re-rank recovers >= 0.9 of the brute-force top-5, and every
    returned dot is the TRUE dot (the re-rank stage is exact by design)."""
    from lucene_solr_spark.operators.similarity import brute_force_topk, pq_topk

    rng = np.random.default_rng(17)
    dim, n_clusters, per = 64, 20, 20
    centers = _unit_rows(rng, n_clusters, dim) * 10.0
    vecs = np.vstack(
        [centers[c] + 0.3 * rng.normal(size=(per, dim)) for c in range(n_clusters)]
    )
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]})
    embs = spark.createDataFrame(pdf)
    queries = [0, 25, 50, 111, 222, 333, 399]
    qm = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    dots = qm @ qm.T
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in brute_force_topk(embs, queries, k=5).collect()
    }
    pq = pq_topk(embs, queries, k=5).collect()
    for r in pq:
        assert r["dot"] == int(dots[r["query_id"], r["neighbor_id"]])  # exact re-rank
    recall = len({(r["query_id"], r["neighbor_id"]) for r in pq} & brute) / len(brute)
    assert recall >= 0.9, recall


def test_pq_codebooks_deterministic_grouped(spark):
    """pq_codebooks is partitioning-independent, trains one ks-entry codebook
    per subspace, and matches per-subspace kmeans_centroids exactly (the
    grouped training is a pure batching of the ungrouped recipe)."""
    from lucene_solr_spark.operators.similarity import kmeans_centroids, pq_codebooks, quantize
    from pyspark.sql import functions as F  # noqa: F811

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(80, 64)) * 3
    pdf = pd.DataFrame({"vec_id": range(80), "embedding": [list(map(float, v)) for v in vecs]})
    q = quantize(spark.createDataFrame(pdf)).select("vec_id", "qvec")
    b1 = {(r["sub"], r["cent_id"]): list(r["cvec"]) for r in pq_codebooks(q, ks=8).collect()}
    b2 = {
        (r["sub"], r["cent_id"]): list(r["cvec"])
        for r in pq_codebooks(q.repartition(7), ks=8).collect()
    }
    assert b1 == b2  # deterministic under any partitioning
    assert {s for s, _ in b1} == {0, 1, 2, 3} and all(len(v) == 16 for v in b1.values())
    # grouped == ungrouped: subspace 2 trained alone gives the same codebook
    sub2 = q.select("vec_id", F.slice("qvec", 33, 16).alias("qvec"))
    solo = {r["cent_id"]: list(r["cvec"]) for r in kmeans_centroids(sub2, k=8).collect()}
    assert solo == {c: v for (s, c), v in b1.items() if s == 2}


def test_kmeans_centroids_deterministic_and_trained(spark):
    """kmeans_centroids is partitioning-independent and actually moves the
    codebook off its seed vectors (trained, not the first-k stand-in)."""
    from lucene_solr_spark.operators.similarity import kmeans_centroids, quantize

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(100, 8)) * 5
    pdf = pd.DataFrame({"vec_id": range(100), "embedding": [list(map(float, v)) for v in vecs]})
    embs = spark.createDataFrame(pdf)
    q = quantize(embs).select("vec_id", "qvec")
    c1 = {r["cent_id"]: list(r["cvec"]) for r in kmeans_centroids(q, k=10).collect()}
    c2 = {
        r["cent_id"]: list(r["cvec"])
        for r in kmeans_centroids(q.repartition(7), k=10).collect()
    }
    assert c1 == c2  # deterministic under any partitioning
    seeds = {tuple(v) for v in np.floor(vecs.astype(np.float64) * 1000).astype(np.int64).tolist()}
    moved = sum(1 for v in c1.values() if tuple(v) not in seeds)
    assert moved > 0  # Lloyd rounds changed at least some centroids


def test_textstats(docs):
    from lucene_solr_spark.functions.textstats import fingerprint, lang_id, quality_score, token_counts

    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[0]["n_tokens"] == 9 and q[0]["n_unique"] == 8  # 'the' twice
    assert q[4]["n_tokens"] == 4 and q[4]["quality_bucket"] == 10

    tc = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert tc[0]["ws_tokens"] == 9 and tc[0]["bpe_tokens"] == 9

    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]  # order-sensitive content id

    li = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert li[0] == "en"  # 'the'/'a' markers


def test_multimodal_plumbing(docs):
    from lucene_solr_spark.operators.multimodal import extract_media_meta, sample_frames, with_payload

    p = with_payload(docs)
    meta = {r["doc_id"]: r for r in extract_media_meta(p).collect()}
    assert meta[0]["byte_len"] == len("the quick brown fox jumps over the lazy dog")
    assert meta[0]["width"] == 64 + meta[0]["byte_len"] % 512
    frames = sample_frames(p, every_n_bytes=10).collect()
    assert all(0 <= r["frame_byte"] < 256 for r in frames)
    assert {r["doc_id"] for r in frames} == {0, 1, 2, 3, 4}


def test_duplicate_components_chain_cycle_and_singleton_pair(spark):
    # chain 10-11-12-13 (forces >1 propagation round without pointer jumps),
    # cycle 20-21-22-20, isolated pair (30, 31)
    from lucene_solr_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (20, 21), (21, 22), (20, 22), (30, 31)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["component"] for r in duplicate_components(pairs).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_duplicate_components_long_chain_converges(spark):
    # a 33-node chain: plain label propagation needs 32 rounds; pointer
    # jumping must converge within the max_rounds budget (O(log n))
    from lucene_solr_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(100, 132)], "doc_a long, doc_b long")
    got = duplicate_components(pairs, max_rounds=10).collect()
    assert {r["component"] for r in got} == {100}
    assert len(got) == 33


def test_ngram_contamination_brute(spark):
    from lucene_solr_spark.operators.dedup import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark engines"),
            (3, "quick brown fox appears here too with more words"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "we saw a quick brown fox jumps far away")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_shingles"], r["n_hits"]) for r in ngram_contamination(train, ev).collect()}

    def shingle_set(text, k=3):
        toks = text.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    ev_sh = shingle_set("we saw a quick brown fox jumps far away")
    for doc_id, text in [(1, "the quick brown fox jumps over the lazy dog"),
                         (2, "completely unrelated text about spark engines"),
                         (3, "quick brown fox appears here too with more words")]:
        s = shingle_set(text)
        assert got[doc_id] == (len(s), len(s & ev_sh)), doc_id


def test_stratified_sample_deterministic(spark):
    from lucene_solr_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr")) for i in range(2000)]
    rates = {"en": 2, "de": 5}
    picks = []
    for n_part in (2, 16):
        df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(n_part)
        picks.append(sorted(r["doc_id"] for r in stratified_sample(df, "lang", rates, default_rate=10).collect()))
    assert picks[0] == picks[1]  # partitioning-stable
    # brute-force the hash
    p, k = 100000007, 2654435761
    want = sorted(
        i
        for i, lang in rows
        if ((i % p) * k) % p % {"en": 2, "de": 5}.get(lang, 10) == 0
    )
    assert picks[0] == want
    # rate 1 keeps a stratum whole; missing strata drop without default
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    only_en = stratified_sample(df, "lang", {"en": 1})
    assert only_en.groupBy("lang").count().collect()[0]["lang"] == "en"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 0})
    with _pytest.raises(ValueError):
        stratified_sample(df, "lang", {})
    with _pytest.raises(ValueError):
        # zero default_rate must raise like any other invalid rate, not
        # silently drop all non-listed strata via NULL h % 0
        stratified_sample(df, "lang", {"en": 1}, default_rate=0)


def test_chunk_documents_brute(spark):
    from lucene_solr_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "solo"), (3, ""), (4, "a b c d e")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, max_tokens=4, overlap=1).collect()
    }
    def brute(text, mx=4, ov=1):
        toks = text.lower().split()
        out, step = {}, mx - ov
        # starts stop at the first window covering the tail: s + ov < len
        for ci, s in enumerate(range(0, max(len(toks) - ov - 1, 0) + 1, step)):
            piece = toks[s : s + mx]
            out[ci] = (s, len(piece), " ".join(piece))
        return out
    want = {}
    for doc_id, text in [(1, " ".join(f"w{i}" for i in range(10))), (2, "solo"), (4, "a b c d e")]:
        for ci, v in brute(text).items():
            want[(doc_id, ci)] = v
    assert got == want  # doc 3 (empty) emits nothing
    # overlap > 0 never emits a window that is a pure suffix of its
    # predecessor: 10 tokens / max 8 / overlap 4 -> [0,8) and [4,10) only
    got84 = sorted(
        (r["start_token"], r["n_tokens"])
        for r in chunk_documents(docs.where("doc_id = 1"), max_tokens=8, overlap=4).collect()
    )
    assert got84 == [(0, 8), (4, 6)]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)
    # shuffle-free plan: no Exchange in the explain
    plan = chunk_documents(docs, 4, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_select_survivors_brute(spark):
    from lucene_solr_spark.operators.dedup import select_survivors

    comp = spark.createDataFrame(
        [(10, 10), (11, 10), (12, 10), (20, 20), (21, 20)], "doc_id long, component long"
    )
    docs = spark.createDataFrame(
        [(10, 5), (11, 9), (12, 9), (20, 3), (21, 1)], "doc_id long, q long"
    )
    got = {r["doc_id"]: r["survivor"] for r in select_survivors(comp, docs, "q").collect()}
    # cluster 10: max q=9 tie between 11 and 12 -> lowest id 11
    assert got == {10: 11, 11: 11, 12: 11, 20: 20, 21: 20}


def test_redact_pii_brute(spark):
    import re

    from lucene_solr_spark.functions.textstats import PII_PATTERNS, redact_pii

    rows = [
        (1, "mail me at john.doe+x@corp.example.org or visit https://a.b/c?d=1 now"),
        (2, "call 555 123-4567 89 or 4111 1111 1111 1111 thanks"),
        (3, "clean text with no pii at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(docs).collect()}
    for doc_id, text in rows:
        red = text
        for name, pat in PII_PATTERNS:
            assert got[doc_id][f"n_{name}"] == len(re.findall(pat, text)), (doc_id, name)
        for name, pat in PII_PATTERNS:
            red = re.sub(pat, f"<{name.upper()}>", red)
        assert got[doc_id]["redacted"] == red, doc_id
    assert got[3]["redacted"] == rows[2][1]  # clean text untouched


def test_pack_sequences_brute(spark):
    import re

    from lucene_solr_spark.operators.chunking import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 13))) for i in range(40)]
    rows.append((100, ""))  # empty doc: excluded
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["token_start"], r["first_block"], r["last_block"])
        for r in pack_sequences(docs, block_tokens=16, n_partitions=5).collect()
    }
    # brute: global running token count over doc_id order
    want, cum = {}, 0
    for doc_id, text in sorted(rows):
        n = len(re.findall(r"[a-z0-9]+", text.lower()))
        if n == 0:
            continue
        want[doc_id] = (n, cum, cum // 16, (cum + n - 1) // 16)
        cum += n
    assert got == want
    assert 100 not in got
    # partitioning must not change the placement (two-pass cumsum is global)
    got1 = {
        r["doc_id"]: (r["n_tokens"], r["token_start"], r["first_block"], r["last_block"])
        for r in pack_sequences(docs, block_tokens=16, n_partitions=1).collect()
    }
    assert got1 == got


def test_pack_sequences_validates(spark):
    import pytest as _pytest

    from lucene_solr_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        pack_sequences(docs, block_tokens=0)


def test_semdedup_brute(spark):
    import numpy as np

    from lucene_solr_spark.operators import similarity

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 8))
    vecs = []
    for i in range(60):
        v = base[i % 6] + rng.normal(scale=(0.01 if i % 3 == 0 else 0.8), size=8)
        v = v / np.linalg.norm(v)
        vecs.append((i, [float(x) for x in v]))
    embs = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    thr = 900_000
    cents = [
        (r["cent_id"], r["cvec"])
        for r in similarity.kmeans_centroids(
            similarity.quantize(embs).select("vec_id", "qvec"), 6
        ).collect()
    ]
    got = {
        r["vec_id"]: (r["cent_id"], r["is_dup"])
        for r in similarity.semdedup(embs, thr, centroids=cents).collect()
    }
    # brute replay in numpy: same quantization, same assignment rule
    Q = {vid: np.floor(np.array(v, dtype=np.float64) * 1000).astype(np.int64) for vid, v in vecs}
    C = {cid: np.array(cv, dtype=np.int64) for cid, cv in cents}
    assign = {}
    for vid, qv in Q.items():
        best = min(C, key=lambda c: (int(((qv - C[c]) ** 2).sum()), c))
        assign[vid] = best
    want = {}
    for vid in Q:
        dup = any(
            assign[o] == assign[vid] and o < vid and int(Q[o] @ Q[vid]) >= thr for o in Q
        )
        want[vid] = (assign[vid], 1 if dup else 0)
    assert got == want
    # the near-identical replicas (every i % 3 == 0 beyond the first per
    # cluster) must actually produce dups — the test is not vacuous
    assert sum(d for _, d in got.values()) > 0
    # survivor rule: within every cluster the smallest id is never a dup
    for cid in set(c for c, _ in got.values()):
        members = sorted(v for v, (c, _) in got.items() if c == cid)
        assert got[members[0]][1] == 0


def test_minhash_128_perm_production_path(spark):
    """The production 128-perm / 16-band path: prefix-compatible signatures,
    higher banding selectivity at the same recall for true near-dups."""
    import numpy as np

    from lucene_solr_spark.functions.hashing import minhash_perm_constants
    from lucene_solr_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    # corpus: 20 doc pairs that are near-dups (one token changed out of 30)
    # plus 60 unrelated docs
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    did = 0
    true_pairs = set()
    for _ in range(20):
        toks = list(rng.choice(vocab, size=30, replace=False))
        alt = list(toks)
        alt[15] = "mutated"
        rows.append((did, " ".join(toks)))
        rows.append((did + 1, " ".join(alt)))
        true_pairs.add((did, did + 1))
        did += 2
    for _ in range(60):
        rows.append((did, " ".join(rng.choice(vocab, size=30, replace=False))))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    a, b = minhash_perm_constants(128)
    assert len(set(a.tolist())) == 128 and (a != 0).all()
    s16 = minhash_signatures(docs, n_perms=16).orderBy("doc_id").toPandas()
    s128 = minhash_signatures(docs, n_perms=128).orderBy("doc_id").toPandas()
    for i in range(16):  # first 16 lanes are the contract literals
        assert (s16[f"sig_{i}"] == s128[f"sig_{i}"]).all()

    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, n_bands=16, n_perms=128).collect()
    }
    # 1-of-30-shingle edits => Jaccard ~0.79; 8-row bands at 128 perms catch
    # essentially all of them
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.9
    # and the candidate set stays tight: unrelated 30-token docs share no
    # 8-row band
    false_cands = got - true_pairs
    assert len(false_cands) <= 2


def test_cap_per_stratum_brute(spark):
    from lucene_solr_spark.operators.sampling import cap_per_stratum

    p, k = 100000007, 2654435761
    # skewed strata: s0 huge, s1 exactly at cap, s2 under cap
    rows = (
        [(i, "s0") for i in range(300)]
        + [(1000 + i, "s1") for i in range(12)]
        + [(2000 + i, "s2") for i in range(5)]
    )

    def brute(cap):
        kept = []
        for stratum in ("s0", "s1", "s2"):
            ids = [i for i, s in rows if s == stratum]
            ids.sort(key=lambda i: (((i % p) * k) % p, i))
            kept += ids[:cap]
        return sorted(kept)

    for n_part in (2, 16):
        df = spark.createDataFrame(rows, "doc_id long, source string").repartition(n_part)
        got = sorted(r["doc_id"] for r in cap_per_stratum(df, "source", cap=12).collect())
        assert got == brute(12)
    # under-cap strata survive whole
    assert set(i for i in got if i >= 2000) == {2000 + i for i in range(5)}
    import pytest as _pytest

    df = spark.createDataFrame(rows, "doc_id long, source string")
    with _pytest.raises(ValueError):
        cap_per_stratum(df, "source", cap=0)


def test_dsir_weights_brute(spark):
    import math
    import re

    from lucene_solr_spark.functions.hashing import P_MOD
    from lucene_solr_spark.operators.sampling import dsir_weights
    from pyspark.sql import functions as F

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", True),
        (1, "quick brown foxes jump over lazy dogs daily", True),
        (2, "import numpy as np and call np dot product", False),
        (3, "the quick brown fox returns to the lazy dog", False),
        (4, "stack trace at line 42 in module spark executor", False),
        (5, "!!! ***", False),  # zero features -> omitted
    ]
    B = 16

    def feats(text):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def poly31(s):
        h = 0
        for c in s:
            h = (h * 31 + ord(c)) % P_MOD
        return h

    # brute: bucket counts, quantized lambdas, per-doc integer weights
    cq, cp = [0] * B, [0] * B
    for _i, text, is_t in rows:
        for f in feats(text):
            b = poly31(f) % B
            cq[b] += 1
            if is_t:
                cp[b] += 1
    tq, tp = sum(cq), sum(cp)
    lam = [
        math.floor(
            float(np.float32(math.log(((cp[b] + 1.0) / (tp + B)) / ((cq[b] + 1.0) / (tq + B)))))
            * (1 << 20)
        )
        for b in range(B)
    ]
    want = {}
    for i, text, _t in rows:
        fs = feats(text)
        if fs:
            want[i] = (len(fs), sum(lam[poly31(f) % B] for f in fs))

    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = dsir_weights(df, F.col("is_t"), n_buckets=B)
    got = {r["doc_id"]: (r["n_feats"], r["weight_q"]) for r in out.collect()}
    assert got == want
    # the target-distribution doc outranks the code-like doc on average ratio
    avg = lambda i: got[i][1] / got[i][0]
    assert avg(3) > avg(2)


def test_line_dedup_brute(spark):
    from collections import Counter

    from lucene_solr_spark.operators.dedup import line_dedup

    hdr = "subscribe to our newsletter"
    rows = [
        (1, f"{hdr}\nunique content one\n\n{hdr} twice? no"),
        (2, f"{hdr}\nunique content two\nshared body line"),
        (3, f"shared body line\nunique content three\n{hdr}"),
        (4, "only original material here"),
        (5, "   \nwhitespace only line kept\n   "),
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), min_df=2
        ).collect()
    }
    # brute: df over distinct docs per non-blank line; blanks always kept
    df = Counter()
    for _, text in rows:
        for ln in set(l for l in text.split("\n") if l.strip()):
            df[ln] += 1
    want = {}
    for doc_id, text in rows:
        kept = [l for l in text.split("\n") if not l.strip() or df[l] < 2]
        want[doc_id] = ("\n".join(kept), len(text.split("\n")), len(kept))
    assert got == want
    # the planted boilerplate line is gone everywhere, content survives
    assert hdr not in got[1][0].split("\n")
    assert "unique content one" in got[1][0].split("\n")
    # blank / whitespace-only lines are never dropped (doc 5 keeps all 3)
    assert got[5][2] == 3
    # min_df above any line's df keeps every doc verbatim
    all_kept = line_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), min_df=99
    ).collect()
    assert all(r["clean_text"] == dict(rows)[r["doc_id"]] for r in all_kept)


def test_line_dedup_paragraph_delim(spark):
    from lucene_solr_spark.operators.dedup import line_dedup

    rows = [
        (1, "shared para\n\nunique one"),
        (2, "shared para\n\nunique two"),
        (3, "solo\n\nshared para"),
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_df=2,
            delim="\n\n",
        ).collect()
    }
    assert got == {
        1: ("unique one", 2, 1),
        2: ("unique two", 2, 1),
        3: ("solo", 2, 1),
    }


def test_sft_pairs_mask_and_context(spark):
    """sft_pairs: the loss-mask span recovers the target byte-for-byte from
    the rendered example, context is exactly the last-3 prior turns, and
    non-target-role turns emit no row."""
    from lucene_solr_spark.operators.sft import render_example, sft_pairs

    rows = [
        ("c1", 1, "user", "hello there"),
        ("c1", 2, "assistant", "hi how can I help"),
        ("c1", 3, "user", "run the scan"),
        ("c1", 4, "assistant", "scanning now"),
        ("c1", 5, "user", "thanks"),
        ("c1", 6, "assistant", "done"),
        ("c2", 1, "assistant", "opening greeting"),  # first-turn target: empty context
    ]
    turns = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {(r["conv_id"], r["turn_idx"]): r for r in sft_pairs(turns, max_context_turns=3).collect()}

    assert set(got) == {("c1", 2), ("c1", 4), ("c1", 6), ("c2", 1)}
    for r in got.values():
        ex = render_example(r["context"], r["target"])
        assert ex[r["loss_start"] : r["loss_start"] + r["loss_len"]] == r["target"]
    # last-3 truncation: turn 6 sees turns 3..5 only, in order
    assert got[("c1", 6)]["context"] == "<user> run the scan\n<assistant> scanning now\n<user> thanks"
    assert got[("c1", 2)]["context"] == "<user> hello there"
    assert got[("c2", 1)]["context"] == "" and got[("c2", 1)]["loss_start"] == 12


def test_ivfpq_recall_clustered(spark):
    """IVFADC (coarse lists + PQ in-list ADC + exact re-rank): on a
    clustered corpus it recovers >= 0.9 of the brute-force top-5 and every
    returned dot is the TRUE dot (re-rank exactness)."""
    from lucene_solr_spark.operators.similarity import brute_force_topk, ivfpq_topk

    rng = np.random.default_rng(23)
    dim, n_clusters, per = 64, 20, 20
    centers = _unit_rows(rng, n_clusters, dim) * 10.0
    vecs = np.vstack(
        [centers[c] + 0.3 * rng.normal(size=(per, dim)) for c in range(n_clusters)]
    )
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]})
    embs = spark.createDataFrame(pdf)
    queries = [0, 25, 50, 111, 222, 333, 399]
    qm = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    dots = qm @ qm.T
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in brute_force_topk(embs, queries, k=5).collect()
    }
    got = ivfpq_topk(embs, queries, k=5).collect()
    for r in got:
        assert r["dot"] == int(dots[r["query_id"], r["neighbor_id"]])
    recall = len({(r["query_id"], r["neighbor_id"]) for r in got} & brute) / len(brute)
    assert recall >= 0.9, recall


def test_sft_pairs_null_text_keeps_turn_slot(spark):
    """A NULL-text turn renders as '<role> ' instead of silently vanishing
    from the context window (collect_list skips nulls — the coalesce guard
    keeps the last-n slice aligned)."""
    from lucene_solr_spark.operators.sft import sft_pairs

    rows = [
        ("c1", 1, "user", "one"),
        ("c1", 2, "assistant", "two"),
        ("c1", 3, "user", None),
        ("c1", 4, "assistant", "four"),
    ]
    turns = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {r["turn_idx"]: r for r in sft_pairs(turns, max_context_turns=3).collect()}
    assert got[4]["context"] == "<user> one\n<assistant> two\n<user> "
    assert got[4]["loss_start"] == len(got[4]["context"]) + 1 + 12


def test_c4_clean_rules(spark):
    """Each C4 rule fires independently: unpunctuated lines drop, short
    lines drop, javascript lines drop, brace/lorem docs drop wholesale,
    and a doc with < min_lines survivors drops even with clean lines."""
    from lucene_solr_spark.operators.cleaning import c4_clean

    good = "alpha beta gamma delta epsilon zeta."
    rows = [
        (0, "\n".join([good, "one two three four five six", good, good])),  # no-punct line drops
        (1, "\n".join([good, "too short.", good, good])),  # short line drops
        (2, "\n".join([good, "enable JavaScript to continue please now.", good, good])),
        (3, "\n".join([good, good, good]) + " {"),  # brace kills the doc
        (4, "\n".join([good, good, good]) + "\nsee Lorem Ipsum text here ok."),
        (5, "\n".join([good, good])),  # only 2 survivors < min_lines=3
        (6, "\n".join([good, good, good, good])),  # fully clean
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in c4_clean(docs).collect()}

    assert got[0]["n_lines"] == 4 and got[0]["n_kept"] == 3 and got[0]["kept_doc"] == 1
    assert got[1]["n_kept"] == 3 and "short" not in got[1]["clean_text"]
    assert got[2]["n_kept"] == 3 and "JavaScript" not in got[2]["clean_text"]
    assert got[3]["kept_doc"] == 0  # brace
    assert got[4]["kept_doc"] == 0  # lorem ipsum (case-insensitive)
    assert got[5]["n_kept"] == 2 and got[5]["kept_doc"] == 0
    assert got[6]["kept_doc"] == 1 and got[6]["clean_text"] == rows[6][1]


def test_gopher_quality_rules(spark):
    """Each Gopher rule fires independently on a crafted doc while the
    control doc passes all of them (integer-exact inequalities)."""
    from lucene_solr_spark.operators.cleaning import gopher_quality

    good = "the quick brown fox jumps over all lazy dogs of this earth today " * 2  # 26 w
    rows = [
        (0, good),
        (1, "the of tiny"),  # < 20 words
        (2, "the of " + "extraordinarily " * 20),  # mean word len > 10
        (3, good + " # # # #"),  # 30 words, 4 symbols -> 40 > 30
        (4, "\n".join(["- " + good] * 3)),  # all lines bullets
        (5, "\n".join([good + "...", good + "...", good])),  # 2/3 ellipsis ends
        (6, "zork quux blarg " * 8),  # no stop words
        (7, good + " " + "12345 " * 30),  # 56 words, 26 alpha -> 130 < 224
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in gopher_quality(docs, min_words=20).collect()}

    assert got[0]["kept"] == 1 and got[0]["n_stop"] >= 2
    assert got[1]["kept"] == 0 and got[1]["n_words"] < 20
    assert got[2]["kept"] == 0 and got[2]["chars"] > 10 * got[2]["n_words"]
    assert got[3]["kept"] == 0 and got[3]["n_symbols"] == 4
    assert got[4]["kept"] == 0 and got[4]["n_bullet"] == got[4]["n_lines"]
    assert got[5]["kept"] == 0 and got[5]["n_ell_end"] == 2
    assert got[6]["kept"] == 0 and got[6]["n_stop"] == 0
    assert got[7]["kept"] == 0 and 5 * got[7]["n_alpha"] < 4 * got[7]["n_words"]
