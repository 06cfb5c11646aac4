"""Driver-contract registry, part 2: pipeline + aggregation operators.

``pipeline_queries`` — the training-data operators (dedup families, ANN,
text analysis, multimodal plumbing) over ``documents`` / ``embeddings``.
``agg_queries`` — the Solr JSON-facet / streaming-expression relational
surface (facets, stats, grouping, rollups, time series) over
``events`` / ``orders`` / ``lineitem``
(reference ``solr/core/src/java/org/apache/solr/search/facet/`` aggs and
``solr/solrj/.../io/stream/`` RollupStream/FacetStream/TimeSeriesStream).

Oracle determinism policy: every compared column is an integer or string.
Doubles only ever appear inside *elementwise* expressions (``floor(x*100)``)
whose IEEE semantics are identical in Spark and DuckDB; sums/ranks happen on
the resulting exact integers.  All string hashing follows
:mod:`.functions.hashing` so the SQL re-derives identical values.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.hashing import LSH_BANDS, MINHASH_A, MINHASH_B, N_MINHASH, P_MOD

# --------------------------------------------------------------------------
# shared oracle SQL fragments
# --------------------------------------------------------------------------
# char-level polynomial hash (functions/hashing.py poly31; base 37 is the
# independent second stream used for SimHash's high 32 fingerprint bits)
def _H(expr: str, mod: int = P_MOD, base: int = 31) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({expr})+1), "
        f"i -> CAST(unicode(substr({expr}, i, 1)) AS BIGINT)), (a, b) -> (a*{base}+b) % {mod})"
    )


_TOK = "tok2 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)"

_SHINGLES = f"""
{_TOK},
shl AS (SELECT doc_id, list_transform(range(1, len(toks)-1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shs FROM tok2),
shd AS (SELECT DISTINCT doc_id, {_H('s')} AS shingle_hash
        FROM (SELECT doc_id, unnest(shs) AS s FROM shl))
"""

_QV = (
    "qv AS (SELECT vec_id, list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q FROM embeddings)"
)

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 5
LSH_DEMO_P, LSH_DEMO_L = 6, 4  # contract-scale LSH: 2^6 buckets x 4 tables
PQ_M, PQ_KS, PQ_REFINE = 4, 16, 4  # contract-scale PQ: 4 subspaces x 16 codes


def _dot_sql(a: str, b: str, dim: int = 64) -> str:
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> {a}[i]*{b}[i]))"


# --------------------------------------------------------------------------
# pipeline queries (Spark side)
# --------------------------------------------------------------------------
def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )


def pipeline_queries() -> dict:
    from .functions import textstats
    from .operators import dedup, multimodal, similarity

    q: dict = {}

    def dd_exact_stats(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        groups = docs.groupBy(F.md5("text").alias("h")).agg(F.count("*").alias("c"))
        return groups.agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_groups"),
        )

    q["dd_exact_stats"] = dd_exact_stats

    def dd_ngram_jaccard(spark, sf_dir):
        out = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)
        return out.select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            F.col("n_inter").cast("long"),
            F.col("sz_a").cast("long"),
            F.col("sz_b").cast("long"),
        ).orderBy("doc_a", "doc_b")

    q["dd_ngram_jaccard"] = dd_ngram_jaccard

    def dd_decontam(spark, sf_dir):
        """Benchmark decontamination: training docs sharing >= 1 distinct
        3-gram shingle with the held-out eval slice (doc_id % 23 == 0)."""
        docs = _docs(spark, sf_dir)
        ev = docs.filter(F.col("doc_id") % 23 == 0)
        train = docs.filter(F.col("doc_id") % 23 != 0)
        out = dedup.ngram_contamination(train, ev)
        return (
            out.filter(F.col("n_hits") > 0)
            .select("doc_id", "n_shingles", "n_hits")
            .orderBy("doc_id")
        )

    q["dd_decontam"] = dd_decontam

    def ta_stratified(spark, sf_dir):
        """Deterministic stratified downsampling: per-lang keep rates over
        the documents table, verified by per-stratum counts."""
        from .operators.sampling import stratified_sample

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("long").alias("doc_id"), "lang"
        )
        kept = stratified_sample(docs, "lang", {"en": 2, "de": 5}, default_rate=10)
        return kept.groupBy("lang").agg(F.count("*").cast("bigint").alias("kept")).orderBy("lang")

    q["ta_stratified"] = ta_stratified

    def ta_shards(spark, sf_dir):
        """Deterministic training-shard export (sampling.shard_assign): the
        seeded global permutation over documents cut into 64-doc shards,
        ranked by the two-pass partition-offset scheme."""
        from .operators.sampling import shard_assign

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("long").alias("doc_id")
        )
        out = shard_assign(docs, 64, n_partitions=8)
        return out.select("doc_id", "shard_id", "shard_pos").orderBy("doc_id")

    q["ta_shards"] = ta_shards

    def ta_mixture(spark, sf_dir):
        """Temperature mixture resampling (tau=0.5, target half the corpus):
        per-lang survivor counts under the n^tau stratum reweighting."""
        from .operators.sampling import temperature_mixture

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("long").alias("doc_id"), "lang"
        )
        kept = temperature_mixture(docs, "lang", tau=0.5, target_fraction=0.5)
        return kept.groupBy("lang").agg(F.count("*").cast("bigint").alias("kept")).orderBy("lang")

    q["ta_mixture"] = ta_mixture

    def ta_source_cap(spark, sf_dir):
        """Per-source document cap (RefinedWeb-style per-host limit): keep at
        most 12 docs per source by the deterministic hash order; verified by
        the exact surviving id set."""
        from .operators.sampling import cap_per_stratum

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("long").alias("doc_id"), "source"
        )
        kept = cap_per_stratum(docs, "source", cap=12)
        return kept.select("doc_id", "source").orderBy("doc_id")

    q["ta_source_cap"] = ta_source_cap

    def ta_dsir(spark, sf_dir):
        """DSIR importance resampling weights (Xie et al. 2023): hashed
        unigram+bigram bucket log-likelihood ratios against a 3-source
        curated target; 25 most target-like docs by quantized weight."""
        from .operators.sampling import dsir_weights

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
        )
        out = dsir_weights(
            docs, F.col("source").isin("src0", "src1", "src2"), n_buckets=64
        )
        return out.orderBy(F.desc("weight_q"), F.asc("doc_id")).limit(25)

    q["ta_dsir"] = ta_dsir

    def ta_chunking(spark, sf_dir):
        """Context-window chunking: 40-token windows with 8-token overlap,
        doc-slice subset for bounded output."""
        from .operators.chunking import chunk_documents

        docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60)
        out = chunk_documents(docs, max_tokens=40, overlap=8)
        return out.orderBy("doc_id", "chunk_id")

    q["ta_chunking"] = ta_chunking

    def ta_packing(spark, sf_dir):
        """Concat-then-chunk sequence packing: place every doc in the global
        token stream cut into 64-token training blocks (two-pass
        partition-offset cumsum — no global window)."""
        from .operators.chunking import pack_sequences

        return pack_sequences(_docs(spark, sf_dir), block_tokens=64).orderBy("doc_id")

    q["ta_packing"] = ta_packing

    def ta_sft_pairs(spark, sf_dir):
        """SFT example extraction (operators/sft.py): synthesize transcript
        turns from `documents` (conversation = source, turn order = doc_id,
        roles alternating user/assistant), then render each assistant turn
        into (context, target, loss_start, loss_len) — last-3-turn context,
        byte-exact loss-mask offsets."""
        from pyspark.sql.window import Window

        from .operators.sft import sft_pairs

        w = Window.partitionBy("source").orderBy("doc_id")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
        )
        turns = docs.select(
            F.col("source").alias("conv_id"),
            F.row_number().over(w).cast("int").alias("turn_idx"),
            F.col("text"),
        )
        turns = turns.withColumn(
            "role", F.when(F.col("turn_idx") % 2 == 1, "user").otherwise("assistant")
        )
        out = sft_pairs(turns, max_context_turns=3)
        return out.select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            "context",
            "target",
            "loss_start",
            "loss_len",
        ).orderBy("conv_id", "turn_idx")

    q["ta_sft_pairs"] = ta_sft_pairs

    def ta_c4_clean(spark, sf_dir):
        """C4 cleaning rules (operators/cleaning.py): synthesize a
        multi-line corpus from `documents` (8-token lines; every third line
        left unpunctuated, every seventh salted with 'javascript', doc-level
        curly-brace / lorem-ipsum injections) so all five rules fire, then
        apply the line + doc passes."""
        from .operators.cleaning import c4_clean

        docs = _docs(spark, sf_dir)
        synth = docs.withColumn("t", F.split("text", " ")).select(
            "doc_id",
            F.expr(
                "concat("
                " array_join(transform(sequence(0, cast(ceil(size(t)/8.0) AS INT) - 1),"
                "   i -> concat(array_join(slice(t, 8*i+1, 8), ' '),"
                "               CASE WHEN (doc_id + i) % 7 = 0 THEN ' javascript' ELSE '' END,"
                "               CASE WHEN (doc_id + i) % 3 < 2 THEN '.' ELSE '' END)), '\\n'),"
                " CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END,"
                " CASE WHEN doc_id % 23 = 0 THEN ' lorem ipsum' ELSE '' END)"
            ).alias("text"),
        )
        return c4_clean(synth).orderBy("doc_id")

    q["ta_c4_clean"] = ta_c4_clean

    def ta_gopher_quality(spark, sf_dir):
        """Gopher doc-quality rules (operators/cleaning.py): synthesize
        bullets (every fifth line), ellipsis endings (every fourth), '#'
        symbol runs (doc_id % 11) and a stop-word line (even doc_ids) so
        each rule can fire; every ratio is an exact integer inequality."""
        from .operators.cleaning import gopher_quality

        docs = _docs(spark, sf_dir)
        synth = docs.withColumn("t", F.split("text", " ")).select(
            "doc_id",
            F.expr(
                "concat("
                " array_join(transform(sequence(0, cast(ceil(size(t)/8.0) AS INT) - 1),"
                "   i -> concat("
                "     CASE WHEN (doc_id + i) % 5 = 0 THEN '- ' ELSE '' END,"
                "     array_join(slice(t, 8*i+1, 8), ' '),"
                "     CASE WHEN (doc_id + i) % 4 = 3 THEN '...' ELSE '' END)), '\\n'),"
                " CASE WHEN doc_id % 2 = 0 THEN concat('\\n', 'that is all of the data.') ELSE '' END,"
                " CASE WHEN doc_id % 11 = 0 THEN ' # # # # # # #' ELSE '' END)"
            ).alias("text"),
        )
        return gopher_quality(synth, min_words=20).orderBy("doc_id")

    q["ta_gopher_quality"] = ta_gopher_quality

    # fixed contract merge table: three round-0 merges over pairwise-disjoint
    # characters, so the oracle's per-pattern occurrence arithmetic is exact
    # (no cross-pattern interaction); multi-level merge chains are pinned by
    # the brute-parity pytest instead (test_bpe.py)
    BPE_CONTRACT_MERGES = [("s", "c"), ("e", "r"), ("d", "a")]

    def ta_bpe_pairs(spark, sf_dir):
        """BPE training round 0: adjacent-character pair frequencies over
        word occurrences (the statistic the first merge maximizes), top 30
        by (count desc, pair asc).  Vocab-scale pair explosion off the
        word-count table — the corpus contributes one groupBy."""
        from .operators.bpe import bpe_pair_counts

        return (
            bpe_pair_counts(_docs(spark, sf_dir))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(30)
        )

    q["ta_bpe_pairs"] = ta_bpe_pairs

    def ta_bpe_encode(spark, sf_dir):
        """BPE encoding under a fixed merge table: per-doc word/token counts.
        The merge loop runs once per DISTINCT word (vocab-scale mapInPandas);
        corpus-side work is explode + join + groupBy(doc)."""
        from .operators.bpe import bpe_encode_counts

        return bpe_encode_counts(_docs(spark, sf_dir), BPE_CONTRACT_MERGES).orderBy("doc_id")

    q["ta_bpe_encode"] = ta_bpe_encode

    def dd_survivors(spark, sf_dir):
        """Dedup survivor selection: min-label components of the MinHash-LSH
        candidate graph, survivor = highest n_chars (ties -> lowest id)."""
        docs = _docs(spark, sf_dir)
        pairs = dedup.minhash_lsh_pairs(docs, n_bands=LSH_BANDS, n_perms=N_MINHASH)
        comp = dedup.duplicate_components(pairs)
        quality = docs.select("doc_id", F.length("text").cast("long").alias("nch"))
        out = dedup.select_survivors(comp, quality, "nch")
        return out.select("doc_id", "component", "survivor").orderBy("doc_id")

    q["dd_survivors"] = dd_survivors

    def dd_substring_spans(spark, sf_dir):
        """Exact substring dedup (Lee et al. 2022 suffix-array analog,
        `operators/dedup.py::duplicated_spans`): per-doc count + token
        coverage of maximal duplicated k-gram spans (k=10)."""
        spans = dedup.duplicated_spans(_docs(spark, sf_dir), k=10)
        return (
            spans.groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_spans"),
                F.sum("span_len").cast("bigint").alias("dup_tokens"),
            )
            .select(F.col("doc_id").cast("long"), "n_spans", "dup_tokens")
            .orderBy("doc_id")
        )

    q["dd_substring_spans"] = dd_substring_spans

    def ta_bigram_ppl(spark, sf_dir):
        """Perplexity filtering (KenLM role in C4/CCNet cleaning;
        `operators/lm.py`): add-one bigram LM trained on the corpus, per-doc
        quantized log-likelihood — 20 worst-predicted docs by average."""
        from .operators.lm import bigram_logprob

        out = bigram_logprob(_docs(spark, sf_dir))
        return (
            out.select(
                F.col("doc_id").cast("long"),
                "n_bigrams",
                "logprob_q",
            )
            .orderBy(
                (F.col("logprob_q") / F.col("n_bigrams")).asc(),
                F.col("doc_id").asc(),
            )
            .limit(20)
        )

    q["ta_bigram_ppl"] = ta_bigram_ppl

    def ta_redact(spark, sf_dir):
        """PII redaction over deterministically-synthesized contact lines
        (the corpus itself is clean, so both engines inject the same PII
        from the doc id before scrubbing)."""
        from .functions.textstats import redact_pii

        docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
        salted = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com see https://ex.org/p/"),
                F.col("doc_id").cast("string"),
                F.lit(" call 555-000"),
                F.lpad(F.col("doc_id").cast("string"), 5, "0"),
            ).alias("text"),
        )
        return redact_pii(salted).orderBy("doc_id")

    q["ta_redact"] = ta_redact

    def dd_minhash_sigs(spark, sf_dir):
        sigs = dedup.minhash_signatures(_docs(spark, sf_dir).filter(F.col("doc_id") < 50), n_perms=N_MINHASH)
        return sigs.select("doc_id", *[F.col(f"sig_{i}").cast("long") for i in range(N_MINHASH)]).orderBy(
            "doc_id"
        )

    q["dd_minhash_sigs"] = dd_minhash_sigs

    def dd_minhash_lsh(spark, sf_dir):
        pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir), n_bands=LSH_BANDS, n_perms=N_MINHASH)
        return pairs.select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), "first_band").orderBy(
            "doc_a", "doc_b"
        )

    q["dd_minhash_lsh"] = dd_minhash_lsh

    def dd_dedup_clusters(spark, sf_dir):
        """Duplicate-cluster formation: connected components of the MinHash-LSH
        candidate graph (min-label propagation + pointer jumping); component
        id = canonical survivor doc_id."""
        pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir), n_bands=LSH_BANDS, n_perms=N_MINHASH)
        comp = dedup.duplicate_components(pairs)
        return comp.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
        ).orderBy("doc_id")

    q["dd_dedup_clusters"] = dd_dedup_clusters

    def dd_simhash(spark, sf_dir):
        return dedup.simhash(_docs(spark, sf_dir)).orderBy("doc_id")

    q["dd_simhash"] = dd_simhash

    def dd_simhash_pairs(spark, sf_dir):
        pairs = dedup.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)
        return pairs.select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), "hamming").orderBy(
            "doc_a", "doc_b"
        )

    q["dd_simhash_pairs"] = dd_simhash_pairs

    def sim_ann_brute(spark, sf_dir):
        return similarity.brute_force_topk(_embs(spark, sf_dir), ANN_QUERY_IDS, ANN_K).orderBy(
            "query_id", "rank"
        )

    q["sim_ann_brute"] = sim_ann_brute

    def sim_ann_lsh(spark, sf_dir):
        # demo-scale LSH params (64 buckets x 4 tables) so a ~500-vector
        # corpus yields candidates; production defaults are 16 planes x 8
        # tables (see operators/similarity.py)
        return similarity.lsh_topk(
            _embs(spark, sf_dir), ANN_QUERY_IDS, ANN_K, n_planes=LSH_DEMO_P, n_tables=LSH_DEMO_L
        ).orderBy("query_id", "rank")

    q["sim_ann_lsh"] = sim_ann_lsh

    # trained IVF codebook per sf_dir — k-means is deterministic, so repeat
    # bench/driver invocations (and the semdedup query, which clusters the
    # same space) reuse the same centroids instead of retraining
    _ivf_cent_cache: dict = {}

    def _trained_cents(spark, sf_dir):
        import math

        cents = _ivf_cent_cache.get(sf_dir)
        if cents is None:
            qv = similarity.quantize(_embs(spark, sf_dir)).select("vec_id", "qvec").persist()
            n_centroids = int(math.ceil(math.sqrt(qv.count())))
            cents = [
                (r["cent_id"], r["cvec"])
                for r in similarity.kmeans_centroids(qv, n_centroids).collect()
            ]
            qv.unpersist()
            _ivf_cent_cache[sf_dir] = cents
        return cents

    def sim_ann_ivf(spark, sf_dir):
        return similarity.ivf_topk(
            _embs(spark, sf_dir), ANN_QUERY_IDS, ANN_K, centroids=_trained_cents(spark, sf_dir)
        ).orderBy("query_id", "rank")

    q["sim_ann_ivf"] = sim_ann_ivf

    # trained PQ codebooks per sf_dir — deterministic, shared by repeat calls
    _pq_book_cache: dict = {}

    def _trained_pq(spark, sf_dir):
        books = _pq_book_cache.get(sf_dir)
        if books is None:
            qv = similarity.quantize(_embs(spark, sf_dir)).select("vec_id", "qvec")
            books = [
                (r["sub"], r["cent_id"], r["cvec"])
                for r in similarity.pq_codebooks(qv, m=PQ_M, ks=PQ_KS).collect()
            ]
            _pq_book_cache[sf_dir] = books
        return books

    def sim_ann_pq(spark, sf_dir):
        """PQ ANN (ADC scan over m=4 subspace codes + exact re-rank of the
        top k·refine): the compressed-candidate-generation path — the scan
        reads 4 small ints per vector instead of the 64-dim raw embedding."""
        return similarity.pq_topk(
            _embs(spark, sf_dir),
            ANN_QUERY_IDS,
            ANN_K,
            m=PQ_M,
            ks=PQ_KS,
            refine=PQ_REFINE,
            codebooks=_trained_pq(spark, sf_dir),
        ).orderBy("query_id", "rank")

    q["sim_ann_pq"] = sim_ann_pq

    def sim_ann_ivfpq(spark, sf_dir):
        """IVFADC: trained coarse lists (2-probe) + PQ-compressed in-list
        ADC + exact re-rank — the candidate count AND the per-candidate
        payload both shrink (the 10^12-vector ANN shape)."""
        return similarity.ivfpq_topk(
            _embs(spark, sf_dir),
            ANN_QUERY_IDS,
            ANN_K,
            m=PQ_M,
            ks=PQ_KS,
            refine=PQ_REFINE,
            centroids=_trained_cents(spark, sf_dir),
            codebooks=_trained_pq(spark, sf_dir),
        ).orderBy("query_id", "rank")

    q["sim_ann_ivfpq"] = sim_ann_ivfpq

    def dd_embedding_neardup(spark, sf_dir):
        # min_dot ~ cos 0.3 at the floor(1000x) quantized scale (unit vectors)
        pairs = similarity.embedding_neardup_pairs(
            _embs(spark, sf_dir), min_dot=300_000, n_planes=LSH_DEMO_P, n_tables=LSH_DEMO_L
        )
        return pairs.select(
            F.col("vec_a").cast("long"), F.col("vec_b").cast("long"), F.col("dot").cast("long")
        ).orderBy("vec_a", "vec_b")

    q["dd_embedding_neardup"] = dd_embedding_neardup

    def dd_semdedup(spark, sf_dir):
        """SemDeDup: trained k-means clusters as blocking, within-cluster
        keep-lowest-id dedup at quantized dot >= 320k (cos ~0.32)."""
        return similarity.semdedup(
            _embs(spark, sf_dir), threshold_dot=320_000, centroids=_trained_cents(spark, sf_dir)
        ).orderBy("vec_id")

    q["dd_semdedup"] = dd_semdedup

    def ta_langid(spark, sf_dir):
        return textstats.lang_id(_docs(spark, sf_dir)).orderBy("doc_id")

    q["ta_langid"] = ta_langid

    def ta_quality(spark, sf_dir):
        return textstats.quality_score(_docs(spark, sf_dir)).orderBy("doc_id")

    q["ta_quality"] = ta_quality

    def ta_token_counts(spark, sf_dir):
        return textstats.token_counts(_docs(spark, sf_dir)).orderBy("doc_id")

    q["ta_token_counts"] = ta_token_counts

    def ta_fingerprint(spark, sf_dir):
        return textstats.fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")

    q["ta_fingerprint"] = ta_fingerprint

    def ta_porter_stem(spark, sf_dir):
        """Full EnglishAnalyzer chain (possessive → lower → stop → Porter,
        ``reference analysis/common/.../en/EnglishAnalyzer.java:103-110``)
        over the documents corpus: top stems by collection frequency.
        FULL oracle: the corpus vocabulary is fixed (31 words at every sf),
        so the oracle stems by a literal mapping derived independently of
        the engine — reference porterTestData.zip golden vectors for the 21
        covered words, hand-applied Porter 1980 for the rest; the stemmer
        itself is additionally pinned against the reference's 23,531-word
        test vocabulary in tests/test_porter.py."""
        from .functions.analysis import english_analyzer_porter

        an = english_analyzer_porter()

        def gen(it):
            import pandas as _pd

            for pdf in it:
                flat, _rows, _dl, _pos = an.analyze_batch_with_positions(pdf["text"])
                if flat.size == 0:
                    continue
                vc = _pd.Series(flat).value_counts()
                yield _pd.DataFrame({"stem": vc.index.to_numpy(dtype=object), "n": vc.to_numpy()})

        docs = _docs(spark, sf_dir).select("text")
        out = docs.mapInPandas(gen, "stem string, n long").groupBy("stem").agg(F.sum("n").alias("n"))
        return out.orderBy(F.desc("n"), F.asc("stem")).limit(40).select("stem", F.col("n").cast("long"))

    q["ta_porter_stem"] = ta_porter_stem

    def mm_decode_meta(spark, sf_dir):
        payloads = multimodal.with_payload(_docs(spark, sf_dir))
        return multimodal.extract_media_meta(payloads).orderBy("doc_id")

    q["mm_decode_meta"] = mm_decode_meta

    def mm_frame_sample(spark, sf_dir):
        payloads = multimodal.with_payload(_docs(spark, sf_dir).filter(F.col("doc_id") < 20))
        return multimodal.sample_frames(payloads).orderBy("doc_id", "offset")

    q["mm_frame_sample"] = mm_frame_sample

    def mm_bmp_roundtrip(spark, sf_dir):
        """REAL image decode (`operators/media_codecs.py` from-scratch BMP
        codec): payloads synthesized from doc_id arithmetic, encoded to
        actual BI_RGB bytes, decoded back, features extracted — the oracle
        re-derives every feature from doc_id alone, so a match proves the
        full encode→decode→feature chain byte-for-byte."""
        docs = _docs(spark, sf_dir)
        payloads = multimodal.synthesize_bmp_payloads(docs)
        return multimodal.decode_images(payloads).orderBy("doc_id")

    q["mm_bmp_roundtrip"] = mm_bmp_roundtrip

    def mm_wav_roundtrip(spark, sf_dir):
        """REAL audio decode (RIFF PCM-16 codec): same round-trip contract
        as mm_bmp_roundtrip, for the audio path."""
        docs = _docs(spark, sf_dir)
        payloads = multimodal.synthesize_wav_payloads(docs)
        return multimodal.decode_audio(payloads).orderBy("doc_id")

    q["mm_wav_roundtrip"] = mm_wav_roundtrip

    def mm_resize(spark, sf_dir):
        """REAL nearest-neighbor resize to 8x8 over the synthesized BMPs:
        resized[y,x,c] = src[y*H//8, x*W//8, c] and src pixels have the
        closed form (id + x + 31y + 7c) mod 256, so the oracle re-derives
        the resized px_sum / probe pixel entirely from doc_id arithmetic —
        a match proves decode + the exact resample index mapping."""
        docs = _docs(spark, sf_dir)
        payloads = multimodal.synthesize_bmp_payloads(docs)
        return multimodal.resize_images(payloads, 8, 8).orderBy("doc_id")

    q["mm_resize"] = mm_resize

    def dd_line_dedup(spark, sf_dir):
        """CCNet-style line-level boilerplate dedup
        (`operators/dedup.py::line_dedup`): each doc's token stream is cut
        into 10-token lines; docs with doc_id % 3 == 0 get a shared header
        line, doc_id % 5 == 0 a shared footer — min_df=2 drops exactly the
        boilerplate (any line in >= 2 distinct docs) and keeps content."""
        docs = _docs(spark, sf_dir)
        base = (
            docs.withColumn("t", F.split("text", " "))
            .withColumn(
                "body",
                F.expr(
                    "transform(sequence(0, cast(ceil(size(t) / 10.0) AS INT) - 1),"
                    " i -> array_join(slice(t, 10 * i + 1, 10), ' '))"
                ),
            )
            .withColumn(
                "text",
                F.array_join(
                    F.concat(
                        F.when(
                            F.col("doc_id") % 3 == 0,
                            F.array(F.lit("follow us on spark social")),
                        ).otherwise(F.array().cast("array<string>")),
                        F.col("body"),
                        F.when(
                            F.col("doc_id") % 5 == 0,
                            F.array(F.lit("copyright acme data systems")),
                        ).otherwise(F.array().cast("array<string>")),
                    ),
                    "\n",
                ),
            )
            .select("doc_id", "text")
        )
        return dedup.line_dedup(base, min_df=2).orderBy("doc_id")

    q["dd_line_dedup"] = dd_line_dedup

    return q


# --------------------------------------------------------------------------
# pipeline oracles (DuckDB SQL)
# --------------------------------------------------------------------------
def pipeline_oracle_sql() -> dict:
    o: dict = {}

    # EnglishAnalyzer chain over the corpus's FIXED 31-word vocabulary
    # (identical at every sf of the deterministic generator): drop the two
    # ENGLISH_STOP_WORDS_SET members present ('a', 'the'), stem the rest by
    # a literal mapping derived INDEPENDENTLY of the engine — 21 words from
    # the reference's own porterTestData.zip golden vectors, the 10 absent
    # ones (agg column data dup filter group hash merge query vector)
    # hand-derived from Porter 1980 (merge→merg by step 5a m=1 ∧ ¬*o;
    # query→queri by step 1c; the rest are fixed points).  A token outside
    # the mapping surfaces as '<token>!unmapped' and hash-mismatches loudly
    # instead of passing silently.
    _stem_map = {
        "agg": "agg", "batch": "batch", "big": "big", "column": "column",
        "customer": "custom", "data": "data", "dup": "dup", "fast": "fast",
        "filter": "filter", "group": "group", "hash": "hash", "join": "join",
        "key": "kei", "line": "line", "merge": "merg", "order": "order",
        "part": "part", "query": "queri", "row": "row", "scan": "scan",
        "slow": "slow", "small": "small", "sort": "sort", "spark": "spark",
        "stream": "stream", "table": "tabl", "value": "valu",
        "vector": "vector", "window": "window",
    }
    _stem_vals = ", ".join(f"('{w}', '{s}')" for w, s in sorted(_stem_map.items()))
    o["ta_porter_stem"] = f"""
WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
sm(word, stem) AS (VALUES {_stem_vals}),
mapped AS (SELECT coalesce(sm.stem, term || '!unmapped') AS stem
           FROM tok LEFT JOIN sm ON tok.term = sm.word
           WHERE term NOT IN ('a', 'the'))
SELECT stem, CAST(count(*) AS BIGINT) AS n FROM mapped
GROUP BY stem ORDER BY n DESC, stem ASC LIMIT 40
"""

    o["dd_exact_stats"] = """
WITH g AS (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)
SELECT CAST(sum(c) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups FROM g
"""

    o["dd_decontam"] = f"""
WITH {_SHINGLES},
ev AS (SELECT DISTINCT shingle_hash FROM shd WHERE doc_id % 23 = 0),
tr AS (SELECT * FROM shd WHERE doc_id % 23 <> 0),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM tr GROUP BY doc_id),
ht AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
       FROM tr JOIN ev USING (shingle_hash) GROUP BY doc_id)
SELECT CAST(sz.doc_id AS BIGINT) AS doc_id, sz.n_shingles, ht.n_hits
FROM sz JOIN ht ON sz.doc_id = ht.doc_id WHERE ht.n_hits > 0 ORDER BY doc_id
"""
    # exact substring spans: same k-gram → duplicated-position → merged-span
    # program on the gram STRINGS (engine-independent; Spark keys the
    # exchange by xxhash64 of the same strings, collision-free at this scale)
    o["dd_substring_spans"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+9], ' ') AS g
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 9)) AS u(i)
        WHERE len(t) >= 10),
dup AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
dp AS (SELECT doc_id, pos FROM pos JOIN dup USING (g)),
isl AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 10
             THEN 0 ELSE 1 END AS brk FROM dp),
grp AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        FROM isl),
sp AS (SELECT doc_id, gid, min(pos) AS s, max(pos) + 10 AS e
       FROM grp GROUP BY doc_id, gid)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(e - s) AS BIGINT) AS dup_tokens
FROM sp GROUP BY doc_id ORDER BY doc_id
"""

    # line-level dedup: the oracle replays the synthesized multi-line corpus
    # (10-token body lines + planted header/footer boilerplate) and the
    # df >= 2 drop rule on line STRINGS — engine-independent, exact
    o["dd_line_dedup"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id,
         array_to_string(
           (CASE WHEN doc_id % 3 = 0 THEN ['follow us on spark social']
                 ELSE [] END)
           || list_transform(range(0, CAST(ceil(len(t) / 10.0) AS INT)),
                             i -> array_to_string(t[10*i+1 : 10*i+10], ' '))
           || (CASE WHEN doc_id % 5 = 0 THEN ['copyright acme data systems']
                    ELSE [] END),
           chr(10)) AS text2
         FROM toks),
lines AS (SELECT doc_id, generate_subscripts(p, 1) AS pos, unnest(p) AS line
          FROM (SELECT doc_id, string_split(text2, chr(10)) AS p FROM base)),
dup AS (SELECT line FROM lines WHERE trim(line) <> ''
        GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
         LEFT JOIN dup d ON l.line = d.line
         WHERE d.line IS NULL OR trim(l.line) = ''),
reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(len(string_split(b.text2, chr(10))) AS BIGINT) AS n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
FROM base b LEFT JOIN reb r USING (doc_id) ORDER BY doc_id
"""

    # bigram LM: identical counts → identical double ln input; per-bigram
    # float32+2^-20 quantization before the sum makes it order-free (the
    # classify.py contract trick), so sums match bitwise
    o["ta_bigram_ppl"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
       WHERE len(t) >= 2),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
lq AS (SELECT doc_id,
       CAST(floor(CAST(CAST(ln((c12 + 1.0) / (c1 + v.v)) AS FLOAT) AS DOUBLE)
                  * 1048576) AS BIGINT) AS lq
       FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(sum(lq) AS BIGINT) AS logprob_q FROM lq GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_bigrams, logprob_q FROM agg
ORDER BY CAST(logprob_q AS DOUBLE) / n_bigrams ASC, doc_id ASC LIMIT 20
"""

    o["ta_shards"] = """
WITH h AS (SELECT doc_id, ((doc_id % 100000007) * 2654435761) % 100000007 AS hv FROM documents),
r AS (SELECT doc_id, row_number() OVER (ORDER BY hv, doc_id) - 1 AS rk FROM h)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(floor(rk / 64) AS BIGINT) AS shard_id,
       CAST(rk % 64 AS BIGINT) AS shard_pos FROM r ORDER BY doc_id
"""

    o["ta_mixture"] = """
WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents WHERE lang IS NOT NULL GROUP BY lang),
w AS (SELECT lang, n, sqrt(n) AS w FROM c),
tot AS (SELECT sum(n) AS nt, sum(w ORDER BY lang) AS wt FROM w),
th AS (SELECT lang, CAST(floor(least(1.0, (0.5 * (SELECT nt FROM tot)) * w / ((SELECT wt FROM tot) * n)) * 1000000) AS BIGINT) AS ppm FROM w)
SELECT d.lang, CAST(count(*) AS BIGINT) AS kept FROM documents d JOIN th USING (lang)
WHERE ((d.doc_id % 100000007) * 2654435761) % 100000007 % 1000000 < th.ppm
GROUP BY d.lang ORDER BY d.lang
"""

    o["ta_stratified"] = """
WITH h AS (SELECT lang, ((doc_id % 100000007) * 2654435761) % 100000007 AS hv FROM documents),
kept AS (SELECT lang FROM h WHERE
  (lang = 'en' AND hv % 2 = 0) OR (lang = 'de' AND hv % 5 = 0)
  OR (lang NOT IN ('en', 'de') AND hv % 10 = 0))
SELECT lang, CAST(count(*) AS BIGINT) AS kept FROM kept GROUP BY lang ORDER BY lang
"""
    o["ta_source_cap"] = """
WITH r AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
             ORDER BY ((doc_id % 100000007) * 2654435761) % 100000007 ASC, doc_id ASC) AS rn
           FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM r WHERE rn <= 12 ORDER BY doc_id
"""

    o["ta_dsir"] = f"""
WITH tok2 AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents),
fe AS (SELECT doc_id, source, unnest(toks) AS f FROM tok2
       UNION ALL
       SELECT doc_id, source,
              unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS f
       FROM tok2 WHERE len(toks) >= 2),
fb AS (SELECT doc_id, (source IN ('src0', 'src1', 'src2')) AS is_t, {_H('f')} % 64 AS b FROM fe),
cnt AS (SELECT b, count(*) AS cq, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS cp FROM fb GROUP BY b),
tot AS (SELECT sum(cq) AS tq, sum(cp) AS tp FROM cnt),
lam AS (SELECT b, CAST(floor(CAST(CAST(ln(((cp + 1.0) / (tp + 64.0)) / ((cq + 1.0) / (tq + 64.0)))
                 AS FLOAT) AS DOUBLE) * 1048576) AS BIGINT) AS lam_q FROM cnt CROSS JOIN tot),
w AS (SELECT doc_id, count(*) AS n_feats, sum(lam_q) AS weight_q
      FROM fb JOIN lam USING (b) GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_feats AS BIGINT) AS n_feats,
       CAST(weight_q AS BIGINT) AS weight_q
FROM w ORDER BY weight_q DESC, doc_id ASC LIMIT 25
"""

    o["dd_ngram_jaccard"] = f"""
WITH {_SHINGLES.strip()},
sz AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
cap AS (SELECT shingle_hash FROM shd GROUP BY shingle_hash HAVING count(*) <= 1000),
j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shd a JOIN shd b USING (shingle_hash) JOIN cap USING (shingle_hash)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(n_inter AS BIGINT) AS n_inter, CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b
FROM j JOIN sz sa ON j.doc_a = sa.doc_id JOIN sz sb ON j.doc_b = sb.doc_id
WHERE n_inter >= 0.2 * (sa.sz + sb.sz - n_inter)
ORDER BY doc_a, doc_b
"""

    sig_exprs = ", ".join(
        f"min((CAST({int(MINHASH_A[i])} AS BIGINT)*shingle_hash+{int(MINHASH_B[i])}) % {P_MOD}) AS sig_{i}"
        for i in range(N_MINHASH)
    )
    o["dd_minhash_sigs"] = f"""
WITH {_SHINGLES.strip()},
mh AS (SELECT doc_id, {sig_exprs} FROM shd GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {', '.join(f'CAST(sig_{i} AS BIGINT) AS sig_{i}' for i in range(N_MINHASH))}
FROM mh WHERE doc_id < 50 ORDER BY doc_id
"""

    band_rows = N_MINHASH // 4
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS band_key FROM mh".format(
            b=b, cols=", ".join(f"sig_{b * band_rows + r}" for r in range(band_rows))
        )
        for b in range(4)
    )
    o["dd_minhash_lsh"] = f"""
WITH {_SHINGLES.strip()},
mh AS (SELECT doc_id, {sig_exprs} FROM shd GROUP BY doc_id),
bands AS ({band_selects})
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(min(a.band) AS INT) AS first_band
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id GROUP BY 1, 2 ORDER BY doc_a, doc_b
"""

    # duplicate clusters: same LSH pair derivation, closed transitively by a
    # recursive CTE; component = min reachable doc_id (matches the engine's
    # min-label fixpoint definitionally)
    o["dd_dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLES.strip()},
mh AS (SELECT doc_id, {sig_exprs} FROM shd GROUP BY doc_id),
bands AS ({band_selects}),
prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
edges AS (SELECT doc_a AS a, doc_b AS b FROM prs UNION SELECT doc_b, doc_a FROM prs),
reach(a, b) AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT CAST(a AS BIGINT) AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
FROM reach GROUP BY a ORDER BY doc_id
"""

    # survivor selection over the same transitive closure: best (nch, -id)
    o["dd_survivors"] = f"""
WITH RECURSIVE {_SHINGLES.strip()},
mh AS (SELECT doc_id, {sig_exprs} FROM shd GROUP BY doc_id),
bands AS ({band_selects}),
prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
edges AS (SELECT doc_a AS a, doc_b AS b FROM prs UNION SELECT doc_b, doc_a FROM prs),
reach(a, b) AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
cq AS (SELECT c.doc_id, c.component, length(d.text) AS nch
       FROM comp c JOIN documents d USING (doc_id)),
best AS (SELECT component, doc_id AS survivor,
                row_number() OVER (PARTITION BY component ORDER BY nch DESC, doc_id ASC) AS rn
         FROM cq)
SELECT CAST(cq.doc_id AS BIGINT) AS doc_id, CAST(cq.component AS BIGINT) AS component,
       CAST(b.survivor AS BIGINT) AS survivor
FROM cq JOIN (SELECT component, survivor FROM best WHERE rn = 1) b USING (component)
ORDER BY doc_id
"""

    # PII redaction: the same pattern literals, replayed with DuckDB's
    # regexp_extract_all / regexp_replace(..., 'g')
    from .functions.textstats import PII_PATTERNS

    _salted = (
        "text || ' u' || CAST(doc_id AS VARCHAR) || '@example.com see https://ex.org/p/' "
        "|| CAST(doc_id AS VARCHAR) || ' call 555-000' || lpad(CAST(doc_id AS VARCHAR), 5, '0')"
    )
    _counts = ", ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}" for name, pat in PII_PATTERNS
    )
    _red = "t"
    for _name, _pat in PII_PATTERNS:
        _red = f"regexp_replace({_red}, '{_pat}', '<{_name.upper()}>', 'g')"
    o["ta_redact"] = f"""
WITH salted AS (SELECT doc_id, {_salted} AS t FROM documents WHERE doc_id < 50)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {_counts}, {_red} AS redacted
FROM salted ORDER BY doc_id
"""

    # chunking: same token definition, starts = multiples of the stride up to
    # the first window covering the tail (start + overlap < len — no trailing
    # window that is a pure suffix of its predecessor), chunk text =
    # space-joined 1-based inclusive list slice
    o["ta_chunking"] = f"""
WITH {_TOK},
nz AS (SELECT doc_id, toks FROM tok2 WHERE len(toks) > 0 AND doc_id < 60),
st AS (SELECT doc_id, toks,
              unnest(range(0, greatest(len(toks) - 9, 0) + 1, 32)) AS start_token FROM nz)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(start_token // 32 AS INT) AS chunk_id,
       CAST(start_token AS INT) AS start_token,
       CAST(least(40, len(toks) - start_token) AS INT) AS n_tokens,
       array_to_string(toks[start_token + 1 : start_token + 40], ' ') AS chunk_text
FROM st ORDER BY doc_id, chunk_id
"""

    # packing: same token definition; the partition-offset cumsum is, by
    # construction, the plain global running sum over doc_id order
    o["ta_packing"] = f"""
WITH {_TOK},
nz AS (SELECT doc_id, len(toks) AS n_tokens FROM tok2 WHERE len(toks) > 0),
c AS (SELECT doc_id, n_tokens,
      sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS token_start
      FROM nz)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(token_start AS BIGINT) AS token_start,
       CAST(token_start // 64 AS BIGINT) AS first_block,
       CAST((token_start + n_tokens - 1) // 64 AS BIGINT) AS last_block
FROM c ORDER BY doc_id
"""

    # SFT pairs (operators/sft.py): ordered-window list of '<role> text'
    # renders, last-3 slice joined by \n, loss offsets over the rendered
    # example context + '\n' + '<assistant> ' + target (12 = header length)
    o["ta_sft_pairs"] = """
WITH t AS (SELECT source AS conv_id,
                  CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS turn_idx,
                  text FROM documents),
r AS (SELECT conv_id, turn_idx,
             CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role, text FROM t),
c AS (SELECT conv_id, turn_idx, role, text,
             coalesce(list('<' || role || '> ' || text)
                      OVER (PARTITION BY conv_id ORDER BY turn_idx
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      CAST([] AS VARCHAR[])) AS ctxl
      FROM r),
x AS (SELECT conv_id, turn_idx, role, text,
             array_to_string(list_slice(ctxl, greatest(1, len(ctxl) - 2), len(ctxl)), chr(10)) AS context
      FROM c)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, context, text AS target,
       CAST(length(context) + (CASE WHEN length(context) > 0 THEN 1 ELSE 0 END) + 12 AS BIGINT) AS loss_start,
       CAST(length(text) AS BIGINT) AS loss_len
FROM x WHERE role = 'assistant' ORDER BY conv_id, turn_idx
"""

    # C4 cleaning: replay the synthesized multi-line corpus + the five rules
    # (terminal punct, min words, javascript line, brace/lorem doc, min kept)
    o["ta_c4_clean"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
synth AS (SELECT doc_id,
   array_to_string(list_transform(range(0, CAST(ceil(len(t)/8.0) AS INT)),
     i -> array_to_string(t[8*i+1 : 8*i+8], ' ')
          || (CASE WHEN (doc_id + i) % 7 = 0 THEN ' javascript' ELSE '' END)
          || (CASE WHEN (doc_id + i) % 3 < 2 THEN '.' ELSE '' END)), chr(10))
   || (CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END)
   || (CASE WHEN doc_id % 23 = 0 THEN ' lorem ipsum' ELSE '' END) AS text2
   FROM toks),
lines AS (SELECT doc_id, generate_subscripts(p, 1) AS pos, unnest(p) AS line
          FROM (SELECT doc_id, string_split(text2, chr(10)) AS p FROM synth)),
kept AS (SELECT doc_id, pos, line FROM lines
         WHERE regexp_matches(rtrim(line), '[.!?"]$')
           AND len(regexp_extract_all(line, '\\S+')) >= 5
           AND NOT contains(lower(line), 'javascript')),
reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(len(string_split(s.text2, chr(10))) AS BIGINT) AS n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(CASE WHEN NOT (contains(s.text2, '{') OR contains(lower(s.text2), 'lorem ipsum'))
                  AND coalesce(r.n_kept, 0) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS kept_doc
FROM synth s LEFT JOIN reb r USING (doc_id) ORDER BY doc_id
"""

    # Gopher rules: same synthesis, every ratio cross-multiplied to integers
    o["ta_gopher_quality"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
synth AS (SELECT doc_id,
   array_to_string(list_transform(range(0, CAST(ceil(len(t)/8.0) AS INT)),
     i -> (CASE WHEN (doc_id + i) % 5 = 0 THEN '- ' ELSE '' END)
          || array_to_string(t[8*i+1 : 8*i+8], ' ')
          || (CASE WHEN (doc_id + i) % 4 = 3 THEN '...' ELSE '' END)), chr(10))
   || (CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'that is all of the data.' ELSE '' END)
   || (CASE WHEN doc_id % 11 = 0 THEN ' # # # # # # #' ELSE '' END) AS text2
   FROM toks),
cnt AS (SELECT doc_id,
   CAST(len(regexp_extract_all(text2, '\\S+')) AS BIGINT) AS n_words,
   CAST(list_sum(list_transform(regexp_extract_all(text2, '\\S+'), w -> length(w))) AS BIGINT) AS chars,
   CAST(len(list_filter(regexp_extract_all(text2, '\\S+'), w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
   CAST(len(regexp_extract_all(text2, '#')) + len(regexp_extract_all(text2, '\\.\\.\\.')) AS BIGINT) AS n_symbols,
   CAST(len(string_split(text2, chr(10))) AS BIGINT) AS n_lines,
   CAST(len(list_filter(string_split(text2, chr(10)), l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS n_bullet,
   CAST(len(list_filter(string_split(text2, chr(10)), l -> regexp_matches(rtrim(l), '\\.\\.\\.$'))) AS BIGINT) AS n_ell_end,
   CAST(len(list_intersect(list_distinct(regexp_extract_all(lower(text2), '[a-z0-9]+')),
            ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop
   FROM synth)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_words, chars, n_alpha, n_symbols, n_lines,
       n_bullet, n_ell_end, n_stop,
       CAST(CASE WHEN n_words >= 20 AND n_words <= 100000
                  AND 3*n_words <= chars AND chars <= 10*n_words
                  AND 10*n_symbols <= n_words
                  AND 5*n_alpha >= 4*n_words
                  AND 10*n_bullet <= 9*n_lines
                  AND 10*n_ell_end <= 3*n_lines
                  AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM cnt ORDER BY doc_id
"""

    # BPE round-0 pair counts: every adjacent 2-char window of every word
    # occurrence — identical to the Spark side's (word-type pairs × count)
    o["ta_bpe_pairs"] = """
WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
p AS (SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INT), 2))) AS pair
      FROM w WHERE length(w) >= 2)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p
GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 30
"""

    # BPE encode under the fixed disjoint-character merges ('s','c'),
    # ('e','r'), ('d','a'): because no character appears in two pairs, each
    # pair's merge count is exactly its non-overlapping substring count in
    # the raw word, so n_tokens = length - sum of pattern occurrences
    o["ta_bpe_encode"] = """
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
e AS (SELECT doc_id,
      length(w)
      - (length(w) - length(replace(w, 'sc', ''))) // 2
      - (length(w) - length(replace(w, 'er', ''))) // 2
      - (length(w) - length(replace(w, 'da', ''))) // 2 AS n_tokens
      FROM w)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM e GROUP BY doc_id ORDER BY doc_id
"""

    # 64-bit SimHash: two independent 32-bit char-poly streams (base 31 ->
    # fp_lo = bits 0-31, base 37 -> fp_hi = bits 32-63); tf is grouped per
    # distinct (th_lo, th_hi) token hash exactly like the numpy kernel
    _SIMHASH = f"""
{_TOK},
tokh AS (SELECT doc_id, {_H('t', 1 << 32)} AS th_lo, {_H('t', 1 << 32, base=37)} AS th_hi
         FROM (SELECT doc_id, unnest(toks) AS t FROM tok2)),
tfh AS (SELECT doc_id, th_lo, th_hi, count(*) AS tf FROM tokh GROUP BY doc_id, th_lo, th_hi),
bits AS (SELECT doc_id, j,
         CASE WHEN sum(tf * (2*((th_lo >> j) & 1) - 1)) > 0 THEN 1 ELSE 0 END AS bl,
         CASE WHEN sum(tf * (2*((th_hi >> j) & 1) - 1)) > 0 THEN 1 ELSE 0 END AS bh
         FROM tfh CROSS JOIN (SELECT unnest(range(0, 32)) AS j) GROUP BY doc_id, j),
sh AS (SELECT doc_id, CAST(sum(bl << j) AS BIGINT) AS fp_lo, CAST(sum(bh << j) AS BIGINT) AS fp_hi
       FROM bits GROUP BY doc_id)
"""
    # the int64 two's-complement reinterpretation the Spark side returns
    _SIMHASH_SIGNED = (
        "fp_lo + CASE WHEN fp_hi >= 2147483648 THEN (fp_hi - 4294967296) * 4294967296 "
        "ELSE fp_hi * 4294967296 END"
    )
    o["dd_simhash"] = (
        f"WITH {_SIMHASH.strip()}\nSELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST({_SIMHASH_SIGNED} AS BIGINT) AS simhash FROM sh ORDER BY doc_id"
    )

    # Manku C(6,3)=20 block-combination tables; block layout mirrors
    # operators/dedup.simhash_blocks (each 32-bit half -> 3 blocks, sizes
    # 10/11/11, so extraction is sign-free integer division on fp_lo/fp_hi)
    from itertools import combinations as _combos

    from .operators.dedup import simhash_blocks as _sh_blocks

    def _block_sql(off: int, size: int) -> str:
        col, rel = ("fp_lo", off) if off < 32 else ("fp_hi", off - 32)
        return f"(({col} // {1 << rel}) % {1 << size})"

    _blocks64 = _sh_blocks(64, 6)
    _band_selects = []
    for _t, _combo in enumerate(_combos(range(6), 3)):
        key = "0"
        for _bi in _combo:
            _off, _size = _blocks64[_bi]
            key = f"(({key}) * {1 << _size} + {_block_sql(_off, _size)})"
        _band_selects.append(
            f"SELECT doc_id, fp_lo, fp_hi, {_t} AS band, {key} AS band_key FROM sh"
        )
    _BANDS64 = "\nUNION ALL ".join(_band_selects)

    o["dd_simhash_pairs"] = f"""
WITH {_SIMHASH.strip()},
bands AS ({_BANDS64})
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi)) AS INT) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi)) <= 3
ORDER BY doc_a, doc_b
"""

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    o["sim_ann_brute"] = f"""
WITH {_QV},
qs AS (SELECT vec_id AS query_id, q AS qq FROM qv WHERE vec_id IN ({ids})),
scored AS (SELECT qs.query_id, v.vec_id AS neighbor_id, {_dot_sql('v.q', 'qs.qq')} AS dot
           FROM qv v CROSS JOIN qs WHERE v.vec_id <> qs.query_id),
r AS (SELECT query_id, neighbor_id, dot,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(dot AS BIGINT) AS dot
FROM r WHERE rank <= {ANN_K} ORDER BY query_id, rank
"""

    # multi-table LSH buckets (operators/similarity.lsh_buckets): global
    # plane index j, table = j // P, bit = j % P — same LCG literals
    _BK = """
planes AS (SELECT j, list_transform(range(0, 64),
           i -> CASE WHEN (1103515245*(i + 64*j) + 12345) % 2147483648 < 1073741824
                THEN 1 ELSE -1 END) AS p
           FROM (SELECT unnest(range(0, {LP})) AS j)),
proj AS (SELECT v.vec_id, pl.j // {P} AS tbl, pl.j % {P} AS bit, {dot} AS pr
         FROM qv v CROSS JOIN planes pl),
bk AS (SELECT vec_id, tbl, CAST(sum(CASE WHEN pr >= 0 THEN (1 << bit) ELSE 0 END) AS BIGINT) AS bucket
       FROM proj GROUP BY vec_id, tbl),
qb AS (SELECT qv.vec_id, qv.q, bk.tbl, bk.bucket FROM qv JOIN bk USING (vec_id))
""".format(dot=_dot_sql("v.q", "pl.p"), P=LSH_DEMO_P, LP=LSH_DEMO_P * LSH_DEMO_L)

    o["sim_ann_lsh"] = f"""
WITH {_QV},
{_BK.strip()},
qs AS (SELECT vec_id AS query_id, q AS qq, tbl, bucket FROM qb WHERE vec_id IN ({ids})),
scored AS (SELECT DISTINCT qs.query_id, v.vec_id AS neighbor_id, {_dot_sql('v.q', 'qs.qq')} AS dot
           FROM qb v JOIN qs ON v.tbl = qs.tbl AND v.bucket = qs.bucket
           WHERE v.vec_id <> qs.query_id),
r AS (SELECT query_id, neighbor_id, dot,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(dot AS BIGINT) AS dot
FROM r WHERE rank <= {ANN_K} ORDER BY query_id, rank
"""

    o["dd_embedding_neardup"] = f"""
WITH {_QV},
{_BK.strip()}
SELECT DISTINCT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
       CAST({_dot_sql('a.q', 'b.q')} AS BIGINT) AS dot
FROM qb a JOIN qb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_dot_sql('a.q', 'b.q')} >= 300000
ORDER BY vec_a, vec_b
"""

    # trained IVF (operators/similarity.kmeans_centroids): hash-spread init
    # of ceil(sqrt(n)) centroids + two unrolled integer Lloyd rounds (exact
    # L2 assignment, elementwise floor-division means)
    def _l2_sql(a: str, b: str, dim: int = 64) -> str:
        return f"list_sum(list_transform(range(1, {dim + 1}), i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))"

    _lloyd = []
    for _r in (1, 2):
        _prev = "c0" if _r == 1 else "c1"
        _lloyd.append(
            f"""
s{_r} AS (SELECT v.vec_id, v.q, c.cent_id, {_l2_sql('v.q', 'c.cvec')} AS l2 FROM qv v CROSS JOIN {_prev} c),
a{_r} AS (SELECT vec_id, q, cent_id FROM
          (SELECT vec_id, q, cent_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM s{_r})
          WHERE rn = 1),
m{_r} AS (SELECT cent_id, i, sum(q[i]) AS s, count(*) AS c
          FROM a{_r} CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY cent_id, i),
c{_r} AS (SELECT cent_id, list((s - ((s % c + c) % c)) // c ORDER BY i) AS cvec FROM m{_r} GROUP BY cent_id)"""
        )
    _LLOYD = ",".join(_lloyd)

    o["sim_ann_ivf"] = f"""
WITH {_QV},
ranked0 AS (SELECT q AS cvec,
            row_number() OVER (ORDER BY ((vec_id % 100000007) * 2654435761) % 100000007 ASC, vec_id ASC) - 1 AS cent_id
            FROM qv),
c0 AS (SELECT CAST(cent_id AS INT) AS cent_id, cvec FROM ranked0
       WHERE cent_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM qv)),
{_LLOYD.strip()},
sf AS (SELECT v.vec_id, v.q, c.cent_id, {_l2_sql('v.q', 'c.cvec')} AS l2 FROM qv v CROSS JOIN c2 c),
rf AS (SELECT vec_id, q, cent_id,
       row_number() OVER (PARTITION BY vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM sf),
assigned AS (SELECT vec_id, q, cent_id FROM rf WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, q AS qq, cent_id FROM rf
           WHERE rn <= 2 AND vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})),
cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id, {_dot_sql('a.q', 'p.qq')} AS dot
         FROM assigned a JOIN probes p ON a.cent_id = p.cent_id WHERE a.vec_id <> p.query_id),
r AS (SELECT query_id, neighbor_id, dot,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank
      FROM cand)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(dot AS BIGINT) AS dot
FROM r WHERE rank <= {ANN_K} ORDER BY query_id, rank
"""

    # PQ (operators/similarity.pq_codebooks / pq_topk): per-subspace grouped
    # k-means (same hash-spread init + two integer Lloyd rounds, subdim 16),
    # ADC sum over the m=4 code lookups, exact re-rank of the top k*refine
    _sd = 64 // PQ_M
    _pq_lloyd = []
    for _r in (1, 2):
        _prev = f"pc{_r - 1}"
        _pq_lloyd.append(
            f"""
ps{_r} AS (SELECT v.vec_id, v.sub, v.q, c.cent_id, {_l2_sql('v.q', 'c.cvec', _sd)} AS l2
           FROM sv v JOIN {_prev} c ON v.sub = c.sub),
pa{_r} AS (SELECT vec_id, sub, q, cent_id FROM
           (SELECT vec_id, sub, q, cent_id,
                   row_number() OVER (PARTITION BY sub, vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM ps{_r})
           WHERE rn = 1),
pm{_r} AS (SELECT sub, cent_id, i, sum(q[i]) AS s, count(*) AS c
           FROM pa{_r} CROSS JOIN (SELECT unnest(range(1, {_sd + 1})) AS i) GROUP BY sub, cent_id, i),
pc{_r} AS (SELECT sub, cent_id, list((s - ((s % c + c) % c)) // c ORDER BY i) AS cvec FROM pm{_r} GROUP BY sub, cent_id)"""
        )
    _PQ_LLOYD = ",".join(_pq_lloyd)

    o["sim_ann_pq"] = f"""
WITH {_QV},
sv AS (SELECT vec_id, s.sub, list_slice(q, s.sub*{_sd}+1, s.sub*{_sd}+{_sd}) AS q
       FROM qv CROSS JOIN (SELECT CAST(unnest(range(0, {PQ_M})) AS INT) AS sub) s),
pranked0 AS (SELECT vec_id,
             row_number() OVER (ORDER BY ((vec_id % 100000007) * 2654435761) % 100000007 ASC, vec_id ASC) - 1 AS cent_id
             FROM qv),
pseed AS (SELECT vec_id, CAST(cent_id AS INT) AS cent_id FROM pranked0 WHERE cent_id < {PQ_KS}),
pc0 AS (SELECT sv.sub, p.cent_id, sv.q AS cvec FROM sv JOIN pseed p USING (vec_id)),
{_PQ_LLOYD.strip()},
psf AS (SELECT v.vec_id, v.sub, c.cent_id, {_l2_sql('v.q', 'c.cvec', _sd)} AS l2
        FROM sv v JOIN pc2 c ON v.sub = c.sub),
codes AS (SELECT vec_id, sub, cent_id FROM
          (SELECT vec_id, sub, cent_id,
                  row_number() OVER (PARTITION BY sub, vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM psf)
          WHERE rn = 1),
lut AS (SELECT sv.vec_id AS query_id, sv.sub, c.cent_id, {_dot_sql('sv.q', 'c.cvec', _sd)} AS pdot
        FROM sv JOIN pc2 c ON sv.sub = c.sub WHERE sv.vec_id IN ({ids})),
adc AS (SELECT l.query_id, cd.vec_id, sum(l.pdot) AS adc_dot
        FROM codes cd JOIN lut l ON cd.sub = l.sub AND cd.cent_id = l.cent_id
        WHERE cd.vec_id <> l.query_id GROUP BY l.query_id, cd.vec_id),
cand AS (SELECT query_id, vec_id FROM
         (SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, vec_id ASC) AS rn FROM adc)
         WHERE rn <= {ANN_K * PQ_REFINE}),
rer AS (SELECT c.query_id, v.vec_id AS neighbor_id, {_dot_sql('v.q', 'qq.q')} AS dot
        FROM cand c JOIN qv v ON v.vec_id = c.vec_id JOIN qv qq ON qq.vec_id = c.query_id),
r AS (SELECT query_id, neighbor_id, dot,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank
      FROM rer)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(dot AS BIGINT) AS dot
FROM r WHERE rank <= {ANN_K} ORDER BY query_id, rank
"""

    # IVFADC = the IVF oracle's coarse block (qv..assigned/probes) + the PQ
    # oracle's code block (sv..codes/lut), ADC restricted to probed-list
    # members, exact re-rank — CTE name sets are disjoint by construction
    o["sim_ann_ivfpq"] = f"""
WITH {_QV},
ranked0 AS (SELECT q AS cvec,
            row_number() OVER (ORDER BY ((vec_id % 100000007) * 2654435761) % 100000007 ASC, vec_id ASC) - 1 AS cent_id
            FROM qv),
c0 AS (SELECT CAST(cent_id AS INT) AS cent_id, cvec FROM ranked0
       WHERE cent_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM qv)),
{_LLOYD.strip()},
sf AS (SELECT v.vec_id, v.q, c.cent_id, {_l2_sql('v.q', 'c.cvec')} AS l2 FROM qv v CROSS JOIN c2 c),
rf AS (SELECT vec_id, q, cent_id,
       row_number() OVER (PARTITION BY vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM sf),
assigned AS (SELECT vec_id, cent_id AS list_id FROM rf WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cent_id AS list_id FROM rf
           WHERE rn <= 2 AND vec_id IN ({ids})),
in_list AS (SELECT p.query_id, a.vec_id FROM assigned a JOIN probes p ON a.list_id = p.list_id
            WHERE a.vec_id <> p.query_id),
sv AS (SELECT vec_id, s.sub, list_slice(q, s.sub*{_sd}+1, s.sub*{_sd}+{_sd}) AS q
       FROM qv CROSS JOIN (SELECT CAST(unnest(range(0, {PQ_M})) AS INT) AS sub) s),
pranked0 AS (SELECT vec_id,
             row_number() OVER (ORDER BY ((vec_id % 100000007) * 2654435761) % 100000007 ASC, vec_id ASC) - 1 AS cent_id
             FROM qv),
pseed AS (SELECT vec_id, CAST(cent_id AS INT) AS cent_id FROM pranked0 WHERE cent_id < {PQ_KS}),
pc0 AS (SELECT sv.sub, p.cent_id, sv.q AS cvec FROM sv JOIN pseed p USING (vec_id)),
{_PQ_LLOYD.strip()},
psf AS (SELECT v.vec_id, v.sub, c.cent_id, {_l2_sql('v.q', 'c.cvec', _sd)} AS l2
        FROM sv v JOIN pc2 c ON v.sub = c.sub),
codes AS (SELECT vec_id, sub, cent_id FROM
          (SELECT vec_id, sub, cent_id,
                  row_number() OVER (PARTITION BY sub, vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM psf)
          WHERE rn = 1),
lut AS (SELECT sv.vec_id AS query_id, sv.sub, c.cent_id, {_dot_sql('sv.q', 'c.cvec', _sd)} AS pdot
        FROM sv JOIN pc2 c ON sv.sub = c.sub WHERE sv.vec_id IN ({ids})),
adc AS (SELECT il.query_id, cd.vec_id, sum(l.pdot) AS adc_dot
        FROM codes cd JOIN in_list il ON cd.vec_id = il.vec_id
        JOIN lut l ON l.query_id = il.query_id AND l.sub = cd.sub AND l.cent_id = cd.cent_id
        GROUP BY il.query_id, cd.vec_id),
cand AS (SELECT query_id, vec_id FROM
         (SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, vec_id ASC) AS rn FROM adc)
         WHERE rn <= {ANN_K * PQ_REFINE}),
rer AS (SELECT c.query_id, v.vec_id AS neighbor_id, {_dot_sql('v.q', 'qq.q')} AS dot
        FROM cand c JOIN qv v ON v.vec_id = c.vec_id JOIN qv qq ON qq.vec_id = c.query_id),
r AS (SELECT query_id, neighbor_id, dot,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank
      FROM rer)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(dot AS BIGINT) AS dot
FROM r WHERE rank <= {ANN_K} ORDER BY query_id, rank
"""

    # SemDeDup: same trained codebook + assignment as sim_ann_ivf; a vector
    # is a dup iff some same-cluster vector with a smaller id is within the
    # dot threshold (keep-lowest-id survivor rule)
    o["dd_semdedup"] = f"""
WITH {_QV},
ranked0 AS (SELECT q AS cvec,
            row_number() OVER (ORDER BY ((vec_id % 100000007) * 2654435761) % 100000007 ASC, vec_id ASC) - 1 AS cent_id
            FROM qv),
c0 AS (SELECT CAST(cent_id AS INT) AS cent_id, cvec FROM ranked0
       WHERE cent_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM qv)),
{_LLOYD.strip()},
sf AS (SELECT v.vec_id, v.q, c.cent_id, {_l2_sql('v.q', 'c.cvec')} AS l2 FROM qv v CROSS JOIN c2 c),
rf AS (SELECT vec_id, q, cent_id,
       row_number() OVER (PARTITION BY vec_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM sf),
assigned AS (SELECT vec_id, q, cent_id FROM rf WHERE rn = 1),
dups AS (SELECT DISTINCT b.vec_id
         FROM assigned a JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         WHERE {_dot_sql('a.q', 'b.q')} >= 320000)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id, CAST(a.cent_id AS BIGINT) AS cent_id,
       CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
ORDER BY vec_id
"""

    from .functions.textstats import LANG_MARKERS, STOPWORDS

    lang_values = ", ".join(
        "('{l}', [{ms}])".format(l=lang, ms=", ".join(f"'{m}'" for m in LANG_MARKERS[lang]))
        for lang in sorted(LANG_MARKERS)
    )
    o["ta_langid"] = f"""
WITH {_TOK},
langs(lang, markers) AS (VALUES {lang_values}),
scores AS (SELECT t.doc_id, l.lang,
           CAST(len(list_filter(t.toks, x -> list_contains(l.markers, x))) AS BIGINT) AS score
           FROM tok2 t CROSS JOIN langs l),
best AS (SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM scores)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS pred_lang, score FROM best WHERE rn = 1 ORDER BY doc_id
"""

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    o["ta_quality"] = f"""
WITH {_TOK},
m AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nu,
      list_sum(list_transform(toks, t -> len(t))) AS tot_len,
      len(list_filter(toks, t -> list_contains([{stop_list}], t))) AS n_stop
      FROM tok2)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(nu AS BIGINT) AS n_unique,
       CAST((100*tot_len) // greatest(n, 1) AS BIGINT) AS mean_tok_len_x100,
       CAST((100*n_stop) // greatest(n, 1) AS BIGINT) AS stop_ratio_x100,
       CAST(least((10*nu) // greatest(n, 1), 10) AS BIGINT) AS quality_bucket
FROM m ORDER BY doc_id
"""

    o["ta_token_counts"] = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents ORDER BY doc_id
"""

    o["ta_fingerprint"] = f"""
WITH {_TOK}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(list_reduce(list_transform(toks, t -> {_H('t')}),
            (f, h) -> (CAST(f AS BIGINT)*131 + h) % {P_MOD}), 0) AS BIGINT) AS fp
FROM tok2 ORDER BY doc_id
"""

    o["mm_decode_meta"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS byte_len,
       CAST(64 + length(text) % 512 AS BIGINT) AS width,
       CAST(64 + (length(text)*31) % 512 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, length(text)+1),
            i -> unicode(substr(text, i, 1)))) % 2147483648 AS BIGINT) AS checksum
FROM documents ORDER BY doc_id
"""

    o["mm_frame_sample"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(o AS BIGINT) AS "offset",
       CAST(unicode(substr(text, o+1, 1)) AS BIGINT) AS frame_byte
FROM (SELECT doc_id, text, unnest(range(0, length(text), 64)) AS o FROM documents WHERE doc_id < 20)
ORDER BY doc_id, o
"""

    # real BMP round trip: every feature is a closed form in doc_id — the
    # oracle never parses a byte, so agreement pins the actual codec
    o["mm_bmp_roundtrip"] = """
WITH dims AS (SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
              FROM documents),
px AS (SELECT d.doc_id, d.w, d.h,
              (d.doc_id + x.x + 31*y.y + 7*c.c) % 256 AS v
       FROM dims d,
            LATERAL unnest(range(0, d.w)) AS x(x),
            LATERAL unnest(range(0, d.h)) AS y(y),
            LATERAL unnest(range(0, 3)) AS c(c))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(any_value(w) AS BIGINT) AS width,
       CAST(any_value(h) AS BIGINT) AS height,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(max(v) AS BIGINT) AS px_max
FROM px GROUP BY doc_id ORDER BY doc_id
"""

    # resized pixel (y, x, c) samples the source at (y*h//8, x*w//8) —
    # identical floor mapping as resize_images; probe = resized (3, 5, 1)
    o["mm_resize"] = """
WITH dims AS (SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
              FROM documents),
px AS (SELECT d.doc_id,
              (d.doc_id + (x.x * d.w) // 8 + 31 * ((y.y * d.h) // 8) + 7*c.c) % 256 AS v,
              x.x AS x, y.y AS y, c.c AS c
       FROM dims d,
            LATERAL unnest(range(0, 8)) AS x(x),
            LATERAL unnest(range(0, 8)) AS y(y),
            LATERAL unnest(range(0, 3)) AS c(c))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(max(CASE WHEN x = 5 AND y = 3 AND c = 1 THEN v END) AS BIGINT) AS px_probe
FROM px GROUP BY doc_id ORDER BY doc_id
"""

    o["mm_wav_roundtrip"] = """
WITH dims AS (SELECT doc_id, 256 + doc_id % 128 AS n,
                     8000 + 4000*(doc_id % 4) AS rate FROM documents),
s AS (SELECT d.doc_id, d.n, d.rate,
             ((7*d.doc_id + 13*i.i) % 4096) - 2048 AS v
      FROM dims d, LATERAL unnest(range(0, d.n)) AS i(i))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(any_value(rate) AS BIGINT) AS sample_rate,
       CAST(any_value(n) AS BIGINT) AS n_samples,
       CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
       CAST(min(v) AS BIGINT) AS s_min,
       CAST(max(v) AS BIGINT) AS s_max
FROM s GROUP BY doc_id ORDER BY doc_id
"""
    return o


# --------------------------------------------------------------------------
# aggregation queries (Solr facet / streaming-expression surface)
# --------------------------------------------------------------------------
def agg_queries() -> dict:
    q: dict = {}

    def _events(spark, sf_dir):
        # the oracle (DuckDB) formats naive timestamps; pin the session tz so
        # date_format agrees regardless of the caller's session defaults
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return spark.read.parquet(f"{sf_dir}/events.parquet")

    def agg_facet_field(spark, sf_dir):
        """JSON facet: terms facet on event_type with count + sum metrics
        (SumAgg/MinMaxAgg analogs, reference solr/.../facet/SumAgg.java)."""
        return (
            _events(spark, sf_dir)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("cnt"),
                F.sum(F.floor(F.col("value") * 1e6).cast("long")).cast("bigint").alias("sum_value_x1e6"),
                F.min("user_id").cast("bigint").alias("min_user"),
                F.max("user_id").cast("bigint").alias("max_user"),
            )
            .orderBy("event_type")
        )

    q["agg_facet_field"] = agg_facet_field

    def agg_stats_numeric(spark, sf_dir):
        """StatsComponent analog: count/sum/min/max/exact-median over
        lineitem.l_extendedprice, integer-quantized."""
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("p100")
        )
        from .operators.ranks import nearest_rank_values

        # exact median without a single-partition global window (see ranks.py);
        # n comes out of the bucket-count pass — no separate count job
        med = nearest_rank_values(li, "p100", {"median_x100": lambda n: (n + 1) // 2})
        stats = li.agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("p100").cast("bigint").alias("sum_x100"),
            F.min("p100").cast("bigint").alias("min_x100"),
            F.max("p100").cast("bigint").alias("max_x100"),
        )
        return stats.crossJoin(med)

    q["agg_stats_numeric"] = agg_stats_numeric

    def agg_group_topn(spark, sf_dir):
        """Grouping / field-collapse analog (reference lucene/grouping two-pass
        collectors): top-3 events by value per event_type."""
        w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
        return (
            _events(spark, sf_dir)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 3)
            .select("event_type", "rank", F.col("event_id").cast("bigint"))
            .orderBy("event_type", "rank")
        )

    q["agg_group_topn"] = agg_group_topn

    def agg_range_facet(spark, sf_dir):
        """RangeFacetProcessor analog: width-100 buckets over value."""
        return (
            _events(spark, sf_dir)
            .groupBy(F.floor(F.col("value") / 100).cast("long").alias("bucket"))
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .orderBy("bucket")
        )

    q["agg_range_facet"] = agg_range_facet

    def agg_range_other(spark, sf_dir):
        """FacetRangeOther (reference solr/core/.../request/SimpleFacets /
        RangeFacetProcessor `facet.range.other=all`): BEFORE / AFTER overflow
        buckets plus the in-range width-100 buckets, all labeled in ONE scan
        via a CASE expression — no second pass for the outliers."""
        lab = (
            F.when(F.col("value") < 100, F.lit("BEFORE"))
            .when(F.col("value") >= 500, F.lit("AFTER"))
            .otherwise(
                F.concat(F.lit("b"), F.floor(F.col("value") / 100).cast("long").cast("string"))
            )
        )
        return (
            _events(spark, sf_dir)
            .groupBy(lab.alias("bucket"))
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .orderBy("bucket")
        )

    q["agg_range_other"] = agg_range_other

    def agg_time_series(spark, sf_dir):
        """TimeSeriesStream analog: daily count + quantized sum."""
        return (
            _events(spark, sf_dir)
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(
                F.count("*").cast("bigint").alias("cnt"),
                F.sum(F.floor(F.col("value") * 100).cast("long")).cast("bigint").alias("sum_value_x100"),
            )
            .orderBy("day")
        )

    q["agg_time_series"] = agg_time_series

    def agg_pivot(spark, sf_dir):
        """PivotFacetProcessor analog: event_type x day counts."""
        return (
            _events(spark, sf_dir)
            .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .orderBy("event_type", "day")
        )

    q["agg_pivot"] = agg_pivot

    def agg_unique(spark, sf_dir):
        """UniqueAgg exact path (HLLAgg is the approx variant —
        approx_count_distinct, not oracle-comparable)."""
        return (
            _events(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
            .orderBy("event_type")
        )

    q["agg_unique"] = agg_unique

    def agg_percentiles(spark, sf_dir):
        """PercentileAgg analog (reference solr/.../facet/PercentileAgg.java
        uses t-digest; exact nearest-rank here so the oracle can replay it)."""
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("p100")
        )
        from .operators.ranks import nearest_rank_values

        qs = {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p95": 0.95}
        # exact nearest-rank via value histogram + partitioned running counts —
        # the full table is never globally windowed (see operators/ranks.py)
        return nearest_rank_values(
            li, "p100", {name: (lambda n, q=q: max(1, int(n * q))) for name, q in qs.items()}
        )

    q["agg_percentiles"] = agg_percentiles

    def agg_intersect(spark, sf_dir):
        """IntersectStream analog: users with BOTH event types (set intersect)."""
        e = _events(spark, sf_dir)
        types = [r[0] for r in e.select("event_type").distinct().orderBy("event_type").limit(2).collect()]
        a = e.filter(F.col("event_type") == types[0]).select("user_id").distinct()
        b = e.filter(F.col("event_type") == types[1]).select("user_id").distinct()
        return a.intersect(b).select(F.col("user_id").cast("long")).orderBy("user_id")

    q["agg_intersect"] = agg_intersect

    def agg_complement(spark, sf_dir):
        """ComplementStream analog: users of the first event type none of
        whose events (of that type) exceed value 400."""
        e = _events(spark, sf_dir)
        t0 = e.select("event_type").distinct().orderBy("event_type").limit(1).collect()[0][0]
        a = e.filter(F.col("event_type") == t0).select("user_id").distinct()
        b = e.filter((F.col("event_type") == t0) & (F.col("value") > 400)).select("user_id").distinct()
        return a.exceptAll(b).distinct().select(F.col("user_id").cast("long")).orderBy("user_id")

    q["agg_complement"] = agg_complement

    def agg_cartesian(spark, sf_dir):
        """CartesianProductStream analog: region x nation cross product."""
        r = spark.read.parquet(f"{sf_dir}/region.parquet").select(F.col("r_name"))
        n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(F.col("n_name"))
        return r.crossJoin(n).orderBy("r_name", "n_name")

    q["agg_cartesian"] = agg_cartesian

    def agg_week_facet(spark, sf_dir):
        """Date-range facet with week gaps (RangeFacetProcessor date path)."""
        return (
            _events(spark, sf_dir)
            .groupBy(F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"))
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .orderBy("week")
        )

    q["agg_week_facet"] = agg_week_facet

    def agg_join_rollup(spark, sf_dir):
        """Streaming-expression HashJoinStream + RollupStream analog:
        revenue per order priority. The dimension side would be broadcast on
        a cluster; keys are uniform so no salting needed."""
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_orderpriority")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey",
            F.floor(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100)
            .cast("long")
            .alias("rev100"),
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("n_items"), F.sum("rev100").cast("bigint").alias("revenue_x100"))
            .orderBy("o_orderpriority")
        )

    q["agg_join_rollup"] = agg_join_rollup

    def sql_surface(spark, sf_dir):
        """Solr Calcite SQL module analog (``reference solr/core/src/java/org/
        apache/solr/handler/sql/SolrRules.java``): the full declarative SQL
        surface with filter/project/aggregate/sort pushdowns is Spark SQL
        itself — one registered view and a pure-SQL query, Catalyst does the
        pushdowns the SolrRules planner hand-codes."""
        spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("sql_documents")
        return spark.sql(
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM sql_documents WHERE n_chars >= 100 GROUP BY lang ORDER BY lang"
        )

    q["sql_surface"] = sql_surface

    _edge_cache: dict = {}

    def _tpch_edges(spark, sf_dir):
        """Directed node graph over the star schema: customer → order →
        part → supplier, node ids namespaced by prefix letter.  Materialized
        once per sf_dir: the BFS rescans the edge table every level, and
        recomputing the union+distinct per level would shuffle the whole
        graph max_depth times (at production scale this is a pre-built,
        sorted edge table, not a derived view)."""
        if sf_dir in _edge_cache:
            return _edge_cache[sf_dir]
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        e1 = orders.select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("O"), F.col("o_orderkey")).alias("dst"),
        )
        e2 = li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
        )
        e3 = li.select(
            F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        )
        edges = e1.unionByName(e2).unionByName(e3).distinct().persist()
        edges.count()
        _edge_cache[sf_dir] = edges
        return edges

    def graph_shortest_path(spark, sf_dir):
        """ShortestPathStream analog (``reference solr/solrj/.../io/graph/
        ShortestPathStream.java:292-402``): all shortest paths C7 → S59 over
        the customer→order→part→supplier edge graph, BFS joins + distributed
        parent-map walk-back."""
        from .operators.graph import shortest_path

        paths = shortest_path(_tpch_edges(spark, sf_dir), "C7", "S59", "src", "dst", max_depth=4)
        return paths.select(
            F.array_join(F.col("path"), "->").alias("path"), F.col("depth").cast("int")
        ).orderBy("path")

    q["graph_shortest_path"] = graph_shortest_path

    def graph_gather(spark, sf_dir):
        """GatherNodesStream analog (``reference solr/solrj/.../io/graph/
        GatherNodesStream.java:542-604``): gather the parts reached from
        customer 7's orders with count/sum metrics and trackTraversal
        ancestors."""
        from .operators.graph import gather_nodes

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        roots = orders.where(F.col("o_custkey") == 7).select(
            F.concat(F.lit("O"), F.col("o_orderkey")).alias("node")
        )
        edges = li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
            F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        )
        out = gather_nodes(
            edges,
            roots,
            "src",
            "dst",
            metrics={"cnt": F.count(F.lit(1)).cast("long"), "qty": F.sum("qty").cast("long")},
            track_ancestors=True,
        )
        return out.select(
            "node",
            F.col("level").cast("int"),
            F.array_join(F.col("ancestors"), ",").alias("ancestors"),
            "cnt",
            "qty",
        ).orderBy("node")

    q["graph_gather"] = graph_gather

    def graph_score_nodes(spark, sf_dir):
        """ScoreNodesStream analog (``reference solr/solrj/.../io/stream/
        ScoreNodesStream.java:227-246``): tf-idf relevance of the parts
        gathered from customer 7's orders against their global frequency in
        the order→part edge collection."""
        from .operators.graph import gather_nodes, score_nodes

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        roots = orders.where(F.col("o_custkey") == 7).select(
            F.concat(F.lit("O"), F.col("o_orderkey")).alias("node")
        )
        edges = li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
        )
        nodes = gather_nodes(
            edges, roots, "src", "dst", metrics={"cnt": F.count(F.lit(1)).cast("long")}
        )
        scored = score_nodes(nodes, edges, "dst", "cnt")
        w = Window.orderBy(F.desc("nodeScore"), F.asc("node"))
        return scored.select(
            F.row_number().over(w).cast("int").alias("rank"),
            "node",
            F.col("cnt").cast("long"),
            F.col("docFreq").cast("long").alias("doc_freq"),
        ).orderBy("rank")

    q["graph_score_nodes"] = graph_score_nodes

    def graph_traversal(spark, sf_dir):
        """Solr GraphQuery / {!graph} (``reference solr/core/src/java/org/
        apache/solr/search/join/GraphQuery.java:56-260``): traverse from
        customer C7's edge docs through order → part → supplier to fixpoint
        (maxDepth=-1) over a doc set whose supplier docs carry no out-edge,
        returning onlyLeafNodes — the reachable suppliers."""
        from .operators.graph import graph_query

        supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        docs = _tpch_edges(spark, sf_dir).unionByName(
            supplier.select(
                F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
                F.lit(None).cast("string").alias("dst"),
            )
        )
        out = graph_query(docs, F.col("src") == "C7", "src", "dst", max_depth=-1, only_leaf_nodes=True)
        return out.select(F.col("src").alias("node")).orderBy("node")

    q["graph_traversal"] = graph_traversal

    return q


def agg_oracle_sql() -> dict:
    o: dict = {}
    o["agg_facet_field"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(floor(value*1000000.0) AS BIGINT)) AS BIGINT) AS sum_value_x1e6,
       CAST(min(user_id) AS BIGINT) AS min_user, CAST(max(user_id) AS BIGINT) AS max_user
FROM events GROUP BY event_type ORDER BY event_type
"""
    o["agg_stats_numeric"] = """
WITH p AS (SELECT CAST(floor(l_extendedprice*100) AS BIGINT) AS p100 FROM lineitem),
r AS (SELECT p100, row_number() OVER (ORDER BY p100) AS rn FROM p),
n AS (SELECT count(*) AS n FROM p)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS cnt,
       CAST((SELECT sum(p100) FROM p) AS BIGINT) AS sum_x100,
       CAST((SELECT min(p100) FROM p) AS BIGINT) AS min_x100,
       CAST((SELECT max(p100) FROM p) AS BIGINT) AS max_x100,
       CAST((SELECT p100 FROM r WHERE rn = ((SELECT n FROM n)+1)//2) AS BIGINT) AS median_x100
"""
    o["agg_group_topn"] = """
WITH r AS (SELECT event_type, event_id,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS INT) AS rank
           FROM events)
SELECT event_type, rank, CAST(event_id AS BIGINT) AS event_id FROM r WHERE rank <= 3
ORDER BY event_type, rank
"""
    o["agg_range_facet"] = """
SELECT CAST(floor(value/100) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1 ORDER BY bucket
"""
    o["agg_range_other"] = """
SELECT CASE WHEN value < 100 THEN 'BEFORE' WHEN value >= 500 THEN 'AFTER'
       ELSE 'b' || CAST(CAST(floor(value/100) AS BIGINT) AS VARCHAR) END AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1 ORDER BY bucket
"""
    o["agg_time_series"] = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_x100
FROM events GROUP BY 1 ORDER BY day
"""
    o["agg_pivot"] = """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2 ORDER BY event_type, day
"""
    o["agg_unique"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""
    o["agg_percentiles"] = """
WITH p AS (SELECT CAST(floor(l_extendedprice*100) AS BIGINT) AS p100 FROM lineitem),
r AS (SELECT p100, row_number() OVER (ORDER BY p100) AS rn FROM p),
n AS (SELECT count(*) AS n FROM p)
SELECT (SELECT p100 FROM r WHERE rn = greatest(1, CAST(floor((SELECT n FROM n)*0.25) AS BIGINT))) AS p25,
       (SELECT p100 FROM r WHERE rn = greatest(1, CAST(floor((SELECT n FROM n)*0.50) AS BIGINT))) AS p50,
       (SELECT p100 FROM r WHERE rn = greatest(1, CAST(floor((SELECT n FROM n)*0.75) AS BIGINT))) AS p75,
       (SELECT p100 FROM r WHERE rn = greatest(1, CAST(floor((SELECT n FROM n)*0.95) AS BIGINT))) AS p95
"""
    o["agg_intersect"] = """
WITH t AS (SELECT event_type FROM events GROUP BY 1 ORDER BY 1 LIMIT 2),
a AS (SELECT DISTINCT user_id FROM events WHERE event_type = (SELECT min(event_type) FROM t)),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = (SELECT max(event_type) FROM t))
SELECT CAST(user_id AS BIGINT) AS user_id FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
ORDER BY user_id
"""
    o["agg_complement"] = """
WITH t0 AS (SELECT min(event_type) AS t FROM events),
a AS (SELECT DISTINCT user_id FROM events WHERE event_type = (SELECT t FROM t0)),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = (SELECT t FROM t0) AND value > 400)
SELECT CAST(user_id AS BIGINT) AS user_id FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
ORDER BY user_id
"""
    o["agg_cartesian"] = """
SELECT r.r_name AS r_name, n.n_name AS n_name FROM region r CROSS JOIN nation n
ORDER BY r_name, n_name
"""
    o["agg_week_facet"] = """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1 ORDER BY week
"""
    o["agg_join_rollup"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_x100
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    o["sql_surface"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE n_chars >= 100 GROUP BY lang ORDER BY lang
"""
    # all shortest paths C7 → S59: the layered C→O→P→S graph is a DAG with
    # one depth per node class, so BFS-with-visited-pruning and exhaustive
    # recursive-CTE walks enumerate the same set (min-depth filter applied)
    _edges = """
edges AS (
  SELECT DISTINCT 'C' || o_custkey AS src, 'O' || o_orderkey AS dst FROM orders
  UNION SELECT DISTINCT 'O' || l_orderkey, 'P' || l_partkey FROM lineitem
  UNION SELECT DISTINCT 'P' || l_partkey, 'S' || l_suppkey FROM lineitem
)"""
    o["graph_shortest_path"] = f"""
WITH RECURSIVE {_edges},
walk AS (
  SELECT 'C7' AS node, 'C7' AS path, 0 AS depth
  UNION ALL
  SELECT e.dst, walk.path || '->' || e.dst, walk.depth + 1
  FROM walk JOIN edges e ON e.src = walk.node
  WHERE walk.depth < 4 AND walk.node <> 'S59'
    AND NOT (('->' || walk.path || '->') LIKE ('%->' || e.dst || '->%'))
),
found AS (SELECT path, depth FROM walk WHERE node = 'S59')
SELECT path, CAST(depth AS INT) AS depth FROM found
WHERE depth = (SELECT min(depth) FROM found) ORDER BY path
"""
    o["graph_gather"] = """
WITH roots AS (SELECT 'O' || o_orderkey AS node FROM orders WHERE o_custkey = 7),
hop AS (
  SELECT 'P' || l_partkey AS node, 'O' || l_orderkey AS root,
         CAST(floor(l_quantity) AS BIGINT) AS qty
  FROM lineitem JOIN roots ON 'O' || l_orderkey = roots.node
)
SELECT node, CAST(1 AS INT) AS level,
       array_to_string(list_sort(list(DISTINCT root)), ',') AS ancestors,
       CAST(count(*) AS BIGINT) AS cnt, CAST(sum(qty) AS BIGINT) AS qty
FROM hop GROUP BY node ORDER BY node
"""
    # nodeScore = f32(ln(tf)+1) * f32(ln((numDocs+1)/(docFreq+1))+1), float32
    # product (ScoreNodesStream.java:243)
    o["graph_score_nodes"] = """
WITH roots AS (SELECT 'O' || o_orderkey AS node FROM orders WHERE o_custkey = 7),
alledges AS (SELECT 'O' || l_orderkey AS src, 'P' || l_partkey AS dst FROM lineitem),
nodes AS (SELECT dst AS node, count(*) AS cnt
          FROM alledges JOIN roots ON alledges.src = roots.node GROUP BY dst),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM alledges),
dfq AS (SELECT dst AS node, count(*) AS doc_freq FROM alledges GROUP BY dst),
scored AS (
  SELECT n.node, n.cnt, d.doc_freq,
         CAST(CAST(ln(CAST(n.cnt AS DOUBLE)) + 1.0 AS REAL)
              * CAST(ln(((SELECT n FROM nd) + 1.0) / (CAST(d.doc_freq AS DOUBLE) + 1.0)) + 1.0 AS REAL)
              AS REAL) AS score
  FROM nodes n JOIN dfq d USING (node))
SELECT CAST(row_number() OVER (ORDER BY score DESC, node ASC) AS INT) AS rank,
       node, CAST(cnt AS BIGINT) AS cnt, CAST(doc_freq AS BIGINT) AS doc_freq
FROM scored ORDER BY rank
"""
    # GraphQuery fixpoint: value-level reachability is exactly the recursive
    # CTE closure; leaf docs = NULL out-edge (supplier rows)
    o["graph_traversal"] = f"""
WITH RECURSIVE {_edges},
docs AS (SELECT src, dst FROM edges
         UNION SELECT 'S' || s_suppkey AS src, NULL AS dst FROM supplier),
reach(val) AS (
  SELECT DISTINCT dst FROM docs WHERE src = 'C7' AND dst IS NOT NULL
  UNION
  SELECT d.dst FROM docs d JOIN reach r ON d.src = r.val WHERE d.dst IS NOT NULL
)
SELECT src AS node FROM docs
WHERE (src = 'C7' OR src IN (SELECT val FROM reach)) AND dst IS NULL
ORDER BY node
"""
    return o
