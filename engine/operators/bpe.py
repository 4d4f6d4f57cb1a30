"""Deterministic distributed BPE merge learning.

Tokenizer training as a first-class engine job — the missing piece
between the text-analysis layer (token counts, `token_count_bpeish`)
and a production data pipeline that ships its own vocabulary. The
reference has no analog (SURVEY.md §2.3); this is Layer-B capability
in the spirit of Sennrich et al. 2016 (arXiv:1508.07909).

Algorithm (classic BPE over the word-frequency table):
  1. words = lowercased alphanumeric whitespace tokens with corpus
     frequencies — the ONE corpus-sized aggregation; everything after
     runs on the vocabulary table (bounded: |distinct words|, not
     corpus tokens — the reason BPE training distributes trivially).
  2. Each word starts as its character sequence. For BPE_MERGES
     rounds: count adjacent symbol pairs weighted by word frequency,
     take the most frequent pair (ties: lexicographically smallest),
     merge it left-to-right non-overlapping in every word.
  3. Output: one row per learned merge (step, merge_left,
     merge_right, pair_count).

Cross-engine determinism (the DuckDB oracle replays every round):
 - symbol sequences are delimiter-wrapped strings ``|a||bc||d|``, so
   the merge is a plain string replace of ``|a||bc|`` with ``|abc|``
   — each symbol carries its own delimiters, which makes SQL
   replace()'s left-to-right non-overlapping scan EXACTLY the BPE
   merge rule even for immediately-adjacent occurrences (with a
   shared separator, ``a b a b`` would merge only once because the
   first match consumes the separator the second needs);
 - pair counts are integer sums of integer frequencies (order-free);
 - the argmax is ORDER BY count DESC, left, right LIMIT 1 on both
   engines (byte-wise ordering on lowercase alphanumerics).

100 TB shape: the corpus is touched once (token count, one shuffle).
Each round is one pair-count shuffle over the vocabulary table plus a
1-row TakeOrdered broadcast back into the next round — no driver-side
data loop, the whole K-round chain is one lazy plan like the k-means
operators. The vocabulary table is persisted once.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import query

BPE_MERGES = 6
# Anchored with \A..\z, not ^..$: Java regex find-semantics let a
# non-MULTILINE $ match BEFORE a final newline, so a token like
# "foo\n" would pass the Spark rlike filter while DuckDB's
# regexp_full_match rejects it — diverging word counts and therefore
# learned merges on any corpus with trailing-newline text. \A/\z
# anchor at the true string ends in Java; the DuckDB side keeps
# regexp_full_match of the bare body (full-match by construction).
_WORD_RE = "\\A[a-z0-9]+\\z"
_WORD_RE_BODY = "[a-z0-9]+"

# seq string -> adjacent (a, b) symbol pairs, exploded (Spark SQL).
_SPARK_TOKS = "split(substring(seq, 2, length(seq) - 2), '\\\\|\\\\|')"


def _spark_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word").rlike(_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn(
            "seq",
            F.expr(
                "concat_ws('', transform(sequence(1, length(word)),"
                " i -> concat('|', substring(word, i, 1), '|')))"
            ),
        )
    )


def _spark_pairs(words: DataFrame) -> DataFrame:
    return (
        words.select(
            "freq",
            F.explode(
                F.expr(
                    f"""zip_with(
                        slice({_SPARK_TOKS}, 1, size({_SPARK_TOKS}) - 1),
                        slice({_SPARK_TOKS}, 2, size({_SPARK_TOKS}) - 1),
                        (x, y) -> struct(x AS a, y AS b))"""
                )
            ).alias("p"),
        )
        .filter(F.col("p.b").isNotNull())
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


_DUCK_TOKS = "string_split(seq[2:len(seq) - 1], '||')"


def _duck_chain_parts() -> list[str]:
    """CTE chain w0..w{BPE_MERGES} (+ per-round pair counts p{t} and
    argmax b{t}) shared by the learn and encode oracles."""
    toks = _DUCK_TOKS
    parts = [
        f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         list_aggregate(list_transform(range(1, len(word) + 1),
                        i -> '|' || word[i] || '|'), 'string_agg', '') AS seq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE regexp_full_match(word, '{_WORD_RE_BODY}')
  GROUP BY word
)"""
    ]
    for t in range(BPE_MERGES):
        parts.append(
            f"""p{t} AS (
  SELECT t[i] AS a, t[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, {toks} AS t FROM w{t})
  CROSS JOIN unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i)
  GROUP BY 1, 2
)""",
        )
        parts.append(
            f"b{t} AS (SELECT a, b, cnt FROM p{t}"
            f" ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"""w{t + 1} AS (
  SELECT word, freq,
         replace(seq, '|' || x.a || '||' || x.b || '|',
                 '|' || x.a || x.b || '|') AS seq
  FROM w{t} CROSS JOIN b{t} x
)"""
        )
    return parts


def _duck_bpe_sql() -> str:
    selects = [
        f"SELECT CAST({t} AS BIGINT) AS step, a AS merge_left,"
        f" b AS merge_right, cnt AS pair_count FROM b{t}"
        for t in range(BPE_MERGES)
    ]
    joined = ",\n".join(_duck_chain_parts())
    return "WITH " + joined + "\n" + "\nUNION ALL\n".join(selects)


@query(
    "bpe_merges",
    oracle=_duck_bpe_sql(),
    tags=("text", "tokenizer", "bpe"),
    exported=False,
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_MERGES byte-pair merges of the corpus (see
    module docstring for the algorithm, determinism, and scale
    contracts)."""
    words = _spark_words(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    return learn_chain(words)[0]


def learn_chain(words: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Run the K-round merge-learning chain once, returning BOTH the
    per-step merge table and the final vocabulary state — so consumers
    that need both (the federated ``bpe_pipeline``) pay for one chain,
    not two.

    Each round's 1-row argmax is persisted: it has TWO consumers (the
    output merge table and the next round's vocabulary replace), so
    without the cache every consumer re-expands the whole prior chain
    and the executed plan grows 2^K-fold — the un-persisted form showed
    128 distinct exchanges at K=6 where the linear chain needs ~K+3.
    The chain stays fully lazy (persist defers to the first action);
    nothing is collected driver-side."""
    out = None
    for t in range(BPE_MERGES):
        best = (
            _spark_pairs(words)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        row = best.select(
            F.lit(t).cast("bigint").alias("step"),
            F.col("a").alias("merge_left"),
            F.col("b").alias("merge_right"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionAll(row)
        words = words.crossJoin(F.broadcast(best)).select(
            "word",
            "freq",
            F.expr(
                "replace(seq, concat('|', a, '||', b, '|'),"
                " concat('|', a, b, '|'))"
            ).alias("seq"),
        )
    return out, words


def _duck_encode_sql() -> str:
    parts = _duck_chain_parts()
    parts.append(
        f"""enc AS (
  SELECT word, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_syms
  FROM w{BPE_MERGES}
)"""
    )
    parts.append(
        f"""fw AS (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE regexp_full_match(word, '{_WORD_RE_BODY}')
)"""
    )
    from engine.functions.rounding import duck_round_he

    ratio = duck_round_he(
        "CAST(sum(e.n_syms) AS DOUBLE) / CAST(sum(len(f.word)) AS DOUBLE)", 6
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(f.word)) AS BIGINT) AS n_chars_alpha,
       CAST(sum(e.n_syms) AS BIGINT) AS n_tokens,
       {ratio} AS compression6
FROM fw f JOIN enc e USING (word)
GROUP BY f.doc_id"""
    )


@query(
    "bpe_encode_docs",
    oracle=_duck_encode_sql(),
    tags=("text", "tokenizer", "bpe"),
    exported=False,
)
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE merges back to the corpus: re-run the
    K-round learn chain to its final vocabulary state (word → merged
    symbol sequence), then join every document's words against that
    encoded vocabulary and aggregate per-doc token statistics
    (word/char/token counts, tokens-per-char compression ratio as an
    exact BIGINT-ratio with the shared IEEE rounding).

    This is the tokenize-the-corpus production step downstream of
    ``bpe_merges``. Scale: encoding state lives in the VOCABULARY
    table (|distinct words| rows, persisted once); the corpus is
    touched twice — once to build word frequencies, once to explode
    (doc_id, word) pairs for the vocab join (hash equi-join on word;
    hot stopwords are the classic AQE-skew case). No per-row Python:
    the merge replay is K chained JVM string replaces and the join is
    a plain equi-join."""
    words = _spark_words(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    _, words = learn_chain(words)
    return encode_from_vocab(spark, sf_dir, words)


def encode_from_vocab(
    spark: SparkSession, sf_dir: str, words: DataFrame
) -> DataFrame:
    """Per-doc token statistics from a fully-merged vocabulary state
    (the tail of ``bpe_encode_docs``, reusable by ``bpe_pipeline``)."""
    enc = words.select(
        "word", F.expr(f"size({_SPARK_TOKS})").cast("bigint").alias("n_syms")
    )
    docs = load_table(spark, sf_dir, "documents")
    fw = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word").rlike(_WORD_RE))
    from engine.functions.rounding import round_he

    return (
        fw.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars_alpha"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
            round_he(
                F.sum("n_syms").cast("double")
                / F.sum(F.length("word")).cast("double"),
                6,
            ).alias("compression6"),
        )
    )
