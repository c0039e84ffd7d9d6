"""N-gram language-model scoring — the CCNet-style quality signal.

CCNet (Wenzek et al. 2020), RedPajama and Dolma all bucket web documents by
language-model perplexity: fluent prose scores high, boilerplate/gibberish
scores low, and the pipeline keeps/weights by the score.  The reference has
no LM stage (pure geodata ETL), so the semantics anchor on the public
Stupid Backoff model (Brants et al. 2007 — the backoff LM built FOR
MapReduce-scale corpora, no normalization pass needed) over whitespace
tokens, the same tokenization every other textstats operator uses.

Model: bigram Stupid Backoff with factor ``alpha`` (default 0.4, the
paper's value)::

    S(w | prev) = c2(prev, w) / c1(prev)      if the bigram was seen
                = alpha * c1(w) / T           else if the unigram was seen
                = alpha / T                   else (unseen-token floor)
    S(w_first)  = c1(w) / T, floor 1 / T      (no left context)

Scale shape
-----------
* **Train** — two hash aggregates (token, and (prev, token)) over ONE
  explode of the corpus; counts are vocabulary-bounded (Heaps' law:
  sublinear in corpus size, but data-dependent — so the score joins below
  are plain shuffle joins by default, per the broadcast policy in
  ``merge.marker_join``; AQE broadcasts the measured-small case).  The
  optional ``vocab_k`` prunes the unigram table to an exact top-K (salted
  two-phase rank — never a single-partition window) and semi-filters the
  bigram table to pruned-vocab-consistent rows, making the model
  PARAMETER-bounded for the genuinely-huge-corpus case; pruned-away tokens
  fall through to the backoff floor.
* **Score** — the (w, prev) pairs are built INSIDE the token array by one
  ``transform`` and exploded once, so post-explode rows are two narrow
  strings (the whole-document array is never duplicated per token row);
  three key joins against the model; the corpus total rides the documented
  bounded one-row ``crossJoin``.
* **Determinism** — each position's log-probability is rounded to integer
  micro-nats FIRST, so the per-doc sum is exact integer arithmetic:
  bit-identical across partitionings and cluster sizes, and the DuckDB
  oracle restating the same rational-then-ln expression matches exactly
  (empirically: 0 micro-rounded mismatches across a 79,800-value ln sweep
  of count rationals, Spark JVM vs DuckDB libm on this host).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BigramLM", "lm_train", "lm_score"]


@dataclass(frozen=True)
class BigramLM:
    """Trained model: unigram counts, bigram counts, one-row total."""
    unigrams: DataFrame   # (__w, __c1)
    bigrams: DataFrame    # (__wp, __w, __c2)
    total: DataFrame      # (__t,) — ONE row, double


def _tokens(text_col: str) -> Column:
    """Non-empty whitespace tokens, as an array column."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))


def lm_train(docs: DataFrame, text_col: str = "text", *,
             vocab_k: int | None = None, n_salts: int = 64) -> BigramLM:
    """Count unigrams and bigrams over ``docs`` (see module docstring).

    ``vocab_k``: exact top-``vocab_k`` unigram pruning (by count DESC,
    token ASC) via the salted two-phase rank; bigrams are kept only when
    BOTH tokens survive, so a kept bigram always has its prefix unigram
    (the backoff chain can never hit a missing denominator)."""
    pairs = docs.select(_tokens(text_col).alias("__a")).select(
        F.explode(F.expr(
            "transform(__a, (x, i) -> struct("
            "x AS w, CASE WHEN i = 0 THEN CAST(NULL AS STRING) "
            "ELSE element_at(__a, i) END AS wp))")).alias("p")
    ).select(F.col("p.w").alias("__w"), F.col("p.wp").alias("__wp"))

    uni = pairs.groupBy("__w").agg(F.count(F.lit(1)).alias("__c1"))
    bi = (pairs.filter(F.col("__wp").isNotNull())
          .groupBy("__wp", "__w").agg(F.count(F.lit(1)).alias("__c2")))
    if vocab_k is not None:
        from .sample import global_topk_ranked
        uni = global_topk_ranked(
            uni, "__w", k=vocab_k,
            order_cols=[F.col("__c1").desc(), F.col("__w").asc()],
            n_salts=n_salts).drop("__rk")
        kept = uni.select("__w")
        bi = (bi.join(kept, "__w", "left_semi")
              .join(kept.withColumnRenamed("__w", "__wp"), "__wp",
                    "left_semi"))
    total = uni.agg(F.sum("__c1").cast("double").alias("__t"))
    return BigramLM(unigrams=uni, bigrams=bi, total=total)


def lm_score(docs: DataFrame, model: BigramLM, *, id_col: str = "doc_id",
             text_col: str = "text", alpha: float = 0.4) -> DataFrame:
    """Per-document Stupid-Backoff score: ``(id_col, lm_tokens,
    lm_logprob_micro6, lm_ppl)``.

    ``lm_logprob_micro6`` is the exact integer sum of per-position
    ``round(ln(S) * 1e6)`` (order-free — see module docstring);
    ``lm_ppl = exp(-logprob / tokens)`` is the familiar perplexity view
    (round 3; convenience only — exp re-introduces a transcendental, so
    cross-engine checks should compare the integer column).  Documents
    with zero tokens are absent (no positions to score)."""
    pos = docs.select(
        F.col(id_col), _tokens(text_col).alias("__a")
    ).select(
        id_col,
        F.explode(F.expr(
            "transform(__a, (x, i) -> struct("
            "x AS w, CASE WHEN i = 0 THEN CAST(NULL AS STRING) "
            "ELSE element_at(__a, i) END AS wp))")).alias("p"),
    ).select(id_col, F.col("p.w").alias("__w"), F.col("p.wp").alias("__wp"))

    c1w = model.unigrams.select(F.col("__w"), F.col("__c1").alias("__c1w"))
    c1p = model.unigrams.select(F.col("__w").alias("__wp"),
                                F.col("__c1").alias("__c1p"))
    joined = (pos.join(c1w, "__w", "left")
              .join(c1p, "__wp", "left")
              .join(model.bigrams, ["__wp", "__w"], "left")
              .crossJoin(F.broadcast(model.total)))  # bounded: ONE row

    a = F.lit(float(alpha))
    t = F.col("__t")
    p = (F.when(F.col("__wp").isNull(),
                F.when(F.col("__c1w").isNotNull(),
                       F.col("__c1w").cast("double") / t)
                .otherwise(F.lit(1.0) / t))
         .when(F.col("__c2").isNotNull(),
               F.col("__c2").cast("double") / F.col("__c1p").cast("double"))
         .when(F.col("__c1w").isNotNull(),
               a * F.col("__c1w").cast("double") / t)
         .otherwise(a / t))
    micro = F.round(F.log(p) * F.lit(1e6)).cast("long")
    agg = (joined.select(id_col, micro.alias("__m"))
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("lm_tokens"),
                F.sum("__m").alias("lm_logprob_micro6")))
    ppl = F.exp(-F.col("lm_logprob_micro6").cast("double") / F.lit(1e6)
                / F.col("lm_tokens").cast("double"))
    return agg.select(id_col, "lm_tokens", "lm_logprob_micro6",
                      F.round(ppl, 3).alias("lm_ppl"))
