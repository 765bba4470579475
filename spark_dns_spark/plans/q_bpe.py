"""BPE tokenizer training — the merge-rule learning loop every LLM
pipeline runs before anything else, expressed the way MLlib runs
iterative algorithms (kmeans/pagerank convention in this repo):

- per-iteration state that must be globally agreed (the winning merge
  pair) is a ONE-ROW driver scalar, inlined as a literal into the next
  iteration's expressions;
- everything sized by the corpus stays distributed: the word-frequency
  relation, the symbol sequences, and the weighted pair counts
  (map-side-combinable ``groupBy(pair).sum(freq)``).

Sequences are space-delimited symbol strings (`` a b c ``), so a merge
is a literal ``replace(' a b ', ' ab ')`` — leftmost non-overlapping,
identical in Spark and DuckDB.  NB this deviates from upstream BPE on
back-to-back occurrences that share a delimiter space (`` a b a b ``
merges only the first pair per pass because the match consumes the
middle space, where reference tokenizers with zero-width boundaries
merge both); both engines, the sequential replay test, and the apply
query below share the semantics, so results agree everywhere — it is
a documented dialect, not an engine divergence.  Pair statistics count
every adjacent position (the standard BPE counting).  The winner is argmax by weighted count with a
lexicographic tie-break, so the whole run is deterministic and the
oracle — a finite chained-CTE unroll of the same three iterations —
matches on hash EQUALITY with no tolerance.

Scale: training corpora dedupe into word-type + frequency form first
(here the vocab relation), so iteration cost is O(vocab), not
O(corpus); the only driver traffic is K one-row argmax collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

#: Number of merge rules to learn.
N_MERGES = 3


def _pairs_sql(seq: str) -> str:
    """DuckDB: adjacent symbol pairs of a space-delimited sequence."""
    arr = f"string_split(trim({seq}), ' ')"
    return (
        f"list_transform(range(1, len({arr})), "
        f"i -> {arr}[i] || '|' || {arr}[i+1])"
    )


def _iter_sql(k: int) -> str:
    """One oracle iteration: weighted pair counts over s{k-1}, the
    argmax winner m{k}, and the merged sequences s{k}."""
    prev = f"s{k - 1}"
    return f"""
p{k} AS (
  SELECT pr, sum(f) AS c
  FROM (SELECT f, unnest({_pairs_sql("seq")}) AS pr FROM {prev})
  GROUP BY pr
), m{k} AS (
  SELECT pr, c FROM p{k} ORDER BY c DESC, pr LIMIT 1
), s{k} AS (
  SELECT word, f,
         replace(seq,
                 coalesce(' ' || replace((SELECT pr FROM m{k}), '|', ' ')
                              || ' ', ''),
                 coalesce(' ' || replace((SELECT pr FROM m{k}), '|', '')
                              || ' ', ''))
           AS seq
  FROM {prev}
)"""


#: Shared training CTE chain: word-type frequencies -> spaced symbol
#: sequences -> N_MERGES rounds of (pair count, argmax, merge).  The
#: final CTE ``s{N_MERGES}`` holds every word type's fully-merged
#: sequence — i.e. the trained tokenizer's output per type — which the
#: apply query reuses directly.
_CHAIN_CTES = (
    """
WITH freq AS (
  SELECT t AS word, count(*) AS f
  FROM documents, LATERAL unnest(string_split(text, ' ')) s(t)
  WHERE regexp_full_match(t, '[a-z]+')
  GROUP BY t
), s0 AS (
  SELECT word, f, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
  FROM freq
), """
    + ", ".join(_iter_sql(k) for k in range(1, N_MERGES + 1))
)

_BPE_SQL = (
    _CHAIN_CTES
    + "\n"
    + "\nUNION ALL ".join(
        f"""
SELECT {k}::BIGINT AS merge_no,
       string_split(pr, '|')[1] AS left_sym,
       string_split(pr, '|')[2] AS right_sym,
       replace(pr, '|', '') AS merged,
       c::BIGINT AS pair_count
FROM m{k}"""
        for k in range(1, N_MERGES + 1)
    )
)


@register(
    "vocab_bpe_merges",
    _BPE_SQL,
    doc="BPE tokenizer training (3 merge rules) the iterative-algorithm "
    "way: corpus deduped to a word-type+frequency relation, symbol "
    "sequences as space-delimited strings, each iteration = one "
    "map-side-combinable weighted pair count + a ONE-ROW driver argmax "
    "(lexicographic tie-break) inlined literally into the next "
    "iteration's replace().  Merges are leftmost non-overlapping "
    "string replaces, identical in both engines (NB: a documented "
    "dialect of upstream BPE for back-to-back pairs sharing a "
    "delimiter space — see module docstring); the oracle is a finite "
    "chained-CTE unroll matching on hash equality",
    tags=("text", "mlprep", "iterative", "bpe"),
)
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _train(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_no long, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


def _train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple], DataFrame]:
    """Run the merge-learning loop; returns (merge table rows, final
    word-type relation (word, f, seq) with every learned merge
    applied — the trained tokenizer as data)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("f"))
    )
    seqs = freq.select(
        "word",
        "f",
        F.expr("' ' || regexp_replace(word, '(.)', '$1 ')").alias("seq"),
    # vocab-sized state reused by every iteration's count AND the next
    # merge — persist once, released by the catalog's cache safety net
    ).persist()

    pairs_expr = (
        "CASE WHEN size(split(trim(seq), ' ')) < 2 THEN array() "
        "ELSE transform(sequence(1, size(split(trim(seq), ' ')) - 1), "
        "i -> concat(element_at(split(trim(seq), ' '), i), '|', "
        "element_at(split(trim(seq), ' '), i + 1))) END"
    )

    merges = []
    for k in range(1, N_MERGES + 1):
        counts = (
            seqs.select("f", F.explode(F.expr(pairs_expr)).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("f").alias("c"))
        )
        win = counts.orderBy(F.desc("c"), F.asc("pr")).first()
        if win is None:  # corpus empty / no pair left to merge
            break
        pr, c = win["pr"], int(win["c"])
        left_sym, right_sym = pr.split("|")
        merged = left_sym + right_sym
        merges.append((k, left_sym, right_sym, merged, c))
        old = seqs
        # inline the winner as literals (kmeans convention): the merge
        # is a map-only literal replace, no join, no extra shuffle
        seqs = old.select(
            "word",
            "f",
            F.expr(
                "replace(seq, ' "
                + left_sym
                + " "
                + right_sym
                + " ', ' "
                + merged
                + " ')"
            ).alias("seq"),
        ).persist()

    return merges, seqs


_APPLY_SQL = (
    _CHAIN_CTES
    + f"""
, toks AS (
  SELECT word, trim(seq) AS tok_str,
         len(string_split(trim(seq), ' ')) AS tok_cnt
  FROM s{N_MERGES}
), w AS (
  SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS word
  FROM documents,
       LATERAL unnest(generate_series(1, len(string_split(text, ' ')))) s(i)
)
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       sum(t.tok_cnt)::BIGINT AS n_tokens,
       string_agg(t.tok_str, ' ' ORDER BY pos) AS tok_seq
FROM w JOIN toks t USING (word)
GROUP BY doc_id
"""
)


@register(
    "vocab_bpe_apply",
    _APPLY_SQL,
    doc="BPE encode — the apply side of the tokenizer (VERDICT-r6 item "
    "3): the trained word-type -> token-sequence relation (the training "
    "loop's final state, no recompute) is broadcast onto the corpus "
    "(the vocab is the SMALL side at any scale: ~MBs at 100 TB), so "
    "tokenization is one broadcast join + one groupBy(doc_id) "
    "order-preserving reassembly; per-doc token counts and the full "
    "token sequence are exact in both engines.  Coverage note: output "
    "is one row per doc WITH at least one in-vocab word — all-OOV "
    "docs are dropped by the inner join in both engines (fertility's "
    "per-source n_oov accounts for them); this is a deliberate "
    "encode-what's-encodable contract, not full-corpus coverage",
    tags=("text", "mlprep", "bpe"),
)
def vocab_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, seqs = _train(spark, sf_dir)
    toks = seqs.select(
        "word",
        F.trim(F.col("seq")).alias("tok_str"),
        F.size(F.split(F.trim(F.col("seq")), " ")).cast("long").alias(
            "tok_cnt"
        ),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    # the inner join against the word-TYPE relation both tokenizes and
    # drops non-[a-z]+ words (they were never in the vocab) in one step
    joined = words.join(F.broadcast(toks), "word")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("tok_cnt").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok_str"))),
                lambda s: s["tok_str"],
            ),
            " ",
        ).alias("tok_seq"),
    )


_FERTILITY_SQL = (
    _CHAIN_CTES
    + f"""
, toks AS (
  SELECT word, len(string_split(trim(seq), ' ')) AS tok_cnt
  FROM s{N_MERGES}
), w AS (
  SELECT d.source, string_split(d.text, ' ')[i] AS word
  FROM documents d,
       LATERAL unnest(generate_series(1, len(string_split(d.text, ' ')))) s(i)
), j AS (
  SELECT w.source, w.word, t.tok_cnt
  FROM w LEFT JOIN toks t USING (word)
)
SELECT source,
       count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN tok_cnt IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_enc,
       sum(CASE WHEN tok_cnt IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       (sum(CASE WHEN tok_cnt IS NULL THEN 1 ELSE 0 END) * 1000
          // count(*))::BIGINT AS oov_per_mille,
       (sum(coalesce(tok_cnt, 0)) * 1000
          // greatest(sum(CASE WHEN tok_cnt IS NOT NULL THEN 1 ELSE 0 END), 1)
        )::BIGINT AS fertility_milli
FROM j GROUP BY source
"""
)


@register(
    "vocab_bpe_fertility",
    _FERTILITY_SQL,
    doc="tokenizer EVALUATION, closing train -> apply -> evaluate: "
    "per-source vocabulary coverage (words outside the tokenizer's "
    "character domain = OOV) and fertility (tokens emitted per "
    "encodable word, milli-units — the metric tokenizer teams tune "
    "for).  One broadcast join of the word-type relation onto the "
    "corpus + one per-source aggregate; all-integer output",
    tags=("text", "mlprep", "bpe", "metric"),
)
def vocab_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, seqs = _train(spark, sf_dir)
    toks = seqs.select(
        "word",
        F.size(F.split(F.trim(F.col("seq")), " ")).cast("long").alias(
            "tok_cnt"
        ),
    )
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    j = words.join(F.broadcast(toks), "word", "left")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tok_cnt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_enc"),
        F.sum(F.when(F.col("tok_cnt").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.coalesce("tok_cnt", F.lit(0))).alias("_tok_sum"),
    )
    # derive the ratios from the aggregated columns (one spelling of
    # each sum, not two)
    return agg.select(
        "source",
        "n_tokens",
        "n_enc",
        "n_oov",
        F.expr("CAST(n_oov * 1000 div n_tokens AS BIGINT)").alias(
            "oov_per_mille"
        ),
        F.expr(
            "CAST(_tok_sum * 1000 div greatest(n_enc, 1) AS BIGINT)"
        ).alias("fertility_milli"),
    )
