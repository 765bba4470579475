"""Statistical language-model quality scoring — the CCNet-style
perplexity filter of a training-data pipeline, as an integer-exact
bigram LM: the corpus trains bigram MLE probabilities, every document
is scored by its average bigram probability, and low scores flag
unusual/garbled text for the curation tier.

``quality_lm_bigram_score``: per doc, ``score_milli`` = floor-mean over
the doc's bigram occurrences of ``p_milli(w2|w1)`` =
``(c(w1,w2) * 1000) div c(w1,·)`` — MLE with milli fixed-point, every
step a positive-integer floor division, so the score is EXACTLY equal
in both engines (the standing convention: no ln()/float perplexity, the
monotone transform preserves every filtering decision).  Docs with no
bigram (fewer than 2 whitespace tokens) are deliberately DROPPED, not
scored 0 — stated here per the ADVICE-r7 coverage-drop convention.

100 TB story: one (w1,w2)-keyed aggregation trains the model (map-side
combine carries the load — the same shape as vocab_top_bigrams); the
prefix totals are a WINDOW over that vocab-sized count relation (the
w1 shuffle moves off the occurrence stream onto the bigram vocabulary,
sublinear in corpus — the r9 fix for the 5.2x-on-10x drift the
two-join shape showed in SCALE_SF1_r9); the fused probability dim
joins back onto the occurrence stream ONCE with NO pinned broadcast
hint (it grows with the corpus — ADVICE r8): AQE broadcasts it at
runtime while it fits its threshold and switches to a single
bigram-keyed shuffle join past it; the final score is one doc-keyed
aggregation.  The occurrence relation is persisted at its 2-consumer
fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

_LM_SQL = """
WITH t0 AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), t AS (
  SELECT doc_id, t FROM t0 WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM t, LATERAL unnest(generate_series(1, len(t) - 1)) s(i)
), cbi AS (
  SELECT w1, w2, count(*)::BIGINT AS cbi FROM occ GROUP BY w1, w2
), cpre AS (
  SELECT w1, sum(cbi)::BIGINT AS cpre FROM cbi GROUP BY w1
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       (sum((cbi.cbi * 1000) // cpre.cpre) // count(*))::BIGINT
         AS score_milli
FROM occ JOIN cbi USING (w1, w2) JOIN cpre USING (w1)
GROUP BY doc_id
"""


@register(
    "quality_lm_bigram_score",
    _LM_SQL,
    doc="bigram-LM quality score (integer-exact perplexity filtering): "
    "corpus-trained MLE p_milli(w2|w1) = (c(w1,w2)*1000) div c(w1,.), "
    "per-doc floor-mean over its bigram occurrences; one bigram-keyed "
    "training agg, count dims joined back (AQE-chosen strategy — no "
    "pinned broadcast of corpus-derived dims), one doc-keyed score agg; "
    "docs with <2 tokens are dropped (documented), low scores flag "
    "garbled text for the curation tier",
    tags=("text", "mlprep", "quality"),
)
def quality_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    # zip_with over two slices beats transform(sequence)+element_at:
    # no per-row index-array allocation, ~0.5 s off the sf1 corpus
    # (the explode IS this query's dominant cost — it is compute-bound
    # on the 2.6M-bigram stream, not shuffle-bound).
    occ = (
        t.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), "
                    "slice(t, 2, size(t) - 1), "
                    "(a, b) -> named_struct('w1', a, 'w2', b))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .persist()
    )
    # The prefix totals are a WINDOW over the vocab-sized bigram-count
    # relation, not a second join keyed on w1: past AQE's broadcast
    # threshold the old cbi-join + cpre-join shape shuffled the FULL
    # occurrence stream twice on different keys, which is what drove
    # the 5.2x wall-clock on 10x data in SCALE_SF1_r9 — now the only
    # occurrence-wide join is the single (w1, w2) probe below, and the
    # w1 shuffle moves to the bigram vocabulary (sublinear in corpus).
    w1w = Window.partitionBy("w1")
    probs = (
        occ.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cbi"))
        .withColumn("cpre", F.sum("cbi").over(w1w))
        .withColumn("p_milli", F.expr("(cbi * 1000) div cpre"))
        .select("w1", "w2", "p_milli")
    )
    # No broadcast HINT on the probability dim: it is corpus-derived
    # (the bigram vocabulary grows with the data), so a pinned hint
    # would OOM executors long before 100 TB (ADVICE r8).  AQE picks
    # the broadcast join at runtime while the dim fits its threshold
    # and falls back to ONE bigram-keyed shuffle join past it.
    return (
        occ.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(p_milli) div count(1)").alias("score_milli"),
        )
        .select("doc_id", "n_bigrams", "score_milli")
    )
