"""Deterministic synthetic `transcripts` corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — one row per conversation turn; one turn = one document.

Generation is pure numpy with ``seed=42`` — same args always produce the same
corpus, at any scale, with no external data. Properties (FIXTURES.md):

- turns/conversation ~ 1 + Zipf(1.3) capped at 40;
- text: 5-120 tokens from a 30k-word vocabulary with Zipf(1.07) frequencies
  (realistic hot terms for skew testing);
- ~1% of turns embed a 300-char unbroken token (exercises the 255-char
  max-token rule, reference StandardTokenizer.java:142-166);
- mixed case + punctuation so lowercase/tokenize rules are observable;
- a few stopword-only turns;
- role cycles user/assistant with ~10% tool turns; tool ∈ {bash, read,
  write, grep, edit} on tool turns, else null;
- ts = 2026-01-01T00:00:00Z + 37s * global_turn_index (strictly increasing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 30_000
_STOPWORDY = ["the", "and", "of", "to", "a", "in", "is", "it"]
_TOOLS = np.array(["bash", "read", "write", "grep", "edit"], dtype=object)


def _vocab(rng: np.ndarray | None = None) -> np.ndarray:
    """Deterministic 30k-word vocabulary: pronounceable-ish random words."""
    r = np.random.default_rng(SEED)
    cons = np.array(list("bcdfghjklmnpqrstvwz"))
    vow = np.array(list("aeiou"))
    n_syll = r.integers(1, 4, VOCAB_SIZE)
    words = []
    for i in range(VOCAB_SIZE):
        k = n_syll[i]
        c = cons[r.integers(0, len(cons), k)]
        v = vow[r.integers(0, len(vow), k)]
        words.append("".join(a + b for a, b in zip(c, v)) + f"{i % 97}" * (i % 13 == 0))
    return np.asarray(words, dtype=object)


def generate_transcripts(n_convs: int, seed: int = SEED, conv_offset: int = 0) -> pd.DataFrame:
    """Generate the deterministic transcripts corpus as a pandas DataFrame."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()

    # turns per conversation: 1 + Zipf(1.3) capped at 40
    lens = 1 + np.minimum(rng.zipf(1.3, n_convs), 39)
    total = int(lens.sum())
    conv_idx = np.repeat(np.arange(n_convs), lens)
    turn_idx = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)

    # roles: alternate user/assistant, ~10% of turns become 'tool'
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_turns = rng.random(total) < 0.10
    role[tool_turns] = "tool"
    tool = np.full(total, None, dtype=object)
    tool[tool_turns] = _TOOLS[rng.integers(0, len(_TOOLS), int(tool_turns.sum()))]

    # text: 5-120 zipf-vocab tokens, mixed case + punctuation
    n_tokens = rng.integers(5, 121, total)
    flat_ids = (rng.zipf(1.07, int(n_tokens.sum())) - 1) % VOCAB_SIZE
    flat = vocab[flat_ids]
    # mixed case on ~10% of tokens, trailing punctuation on ~8%
    up = rng.random(flat.size) < 0.10
    flat[up] = np.char.capitalize(flat[up].astype(str)).astype(object)
    punct = rng.random(flat.size) < 0.08
    marks = np.array([",", ".", "!", "?", ";"], dtype=object)
    flat[punct] = flat[punct] + marks[rng.integers(0, 5, int(punct.sum()))]

    bounds = np.cumsum(n_tokens)[:-1]
    texts = np.array([" ".join(chunk) for chunk in np.split(flat, bounds)], dtype=object)

    # ~1% of turns get a 300-char unbroken token appended
    long_tok = rng.random(total) < 0.01
    texts[long_tok] = texts[long_tok] + (" " + "q" * 300)
    # a few stopword-only turns (first turn of every 97th conversation)
    stop_only = (conv_idx % 97 == 0) & (turn_idx == 0)
    texts[stop_only] = " ".join(_STOPWORDY)

    ts = np.datetime64("2026-01-01T00:00:00") + np.arange(total) * np.timedelta64(37, "s")

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv", np.char.zfill((conv_idx + conv_offset).astype(str), 8)).astype(object),
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def transcripts_df(spark, n_convs: int, seed: int = SEED, n_partitions: int | None = None):
    """Transcripts corpus as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql import types as T

    pdf = generate_transcripts(n_convs, seed)
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(pdf, schema=schema)
    if n_partitions:
        df = df.repartition(n_partitions, "conv_id")
    return df


def transcripts_df_dist(spark, n_convs: int, n_partitions: int = 64, seed: int = SEED):
    """Deterministic transcripts corpus generated ON THE EXECUTORS.

    For bench-scale corpora (10^6+ turns) driver-side generation is the
    bottleneck; here each task generates a disjoint conv-id range with a
    per-partition seed (seed+pid) — still fully deterministic for a given
    (n_convs, n_partitions, seed), which is all the bench protocol needs.
    """
    import pandas as pd

    per = (n_convs + n_partitions - 1) // n_partitions
    parts = [(p, p * per, min((p + 1) * per, n_convs)) for p in range(n_partitions) if p * per < n_convs]
    # range-place the generation plan so every output file covers one
    # contiguous, internally-sorted conv range (sorted-table layout — the
    # property assign_doc_ids_sorted_source relies on)
    plan = (
        spark.createDataFrame(pd.DataFrame(parts, columns=["pid", "lo", "hi"]))
        .repartitionByRange(len(parts), "pid")
        .sortWithinPartitions("pid")
    )

    def gen(iterator):
        for pdf in iterator:
            for _, row in pdf.iterrows():
                n = int(row["hi"]) - int(row["lo"])
                if n > 0:
                    yield generate_transcripts(n, seed=seed + int(row["pid"]), conv_offset=int(row["lo"]))
        from lucene_solr_spark.memutil import trim_task_memory

        trim_task_memory()

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    return plan.mapInPandas(gen, schema=schema)
