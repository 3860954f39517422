package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus audit statistics — the per-shard report table every curation
  * run emits before and after filtering (the "data card" numbers:
  * document/token/char volumes, length distribution, duplication rate).
  * One pass, one partial+final aggregation on the shard key; the
  * duplicate rate rides in the same pass as an exact-hash count-distinct
  * (no second scan, no self-join).
  *
  * All derived values are integer-or-exact arithmetic except the
  * averages, which round to 4 decimals for stable cross-engine
  * comparison (the repo-wide oracle rounding convention).
  */
object Report {

  /** Per-shard corpus statistics: n_docs, n_tokens, n_chars, avg/min/max
    * doc length in tokens, distinct-text count and the exact-duplicate
    * rate derived from it. */
  def corpusStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String): DataFrame = {
    // null text counts as an empty document, not a null that poisons the
    // shard's sums (real corpora carry nulls; the oracle restates the
    // same coalesce)
    val txt = coalesce(col(textCol), lit(""))
    val toks = TextOps.tokens(txt)
    docs
      .select(col(shardCol).as("shard"),
        size(toks).cast("long").as("n_tok"),
        length(txt).cast("long").as("n_chr"),
        // 60-bit md5 hash, the repo-wide text identity (Dedup.exact key)
        TextOps.h60(txt).as("th"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chr")).as("n_chars"),
        round(avg(col("n_tok")), 4).as("avg_doc_tokens"),
        min(col("n_tok")).as("min_doc_tokens"),
        max(col("n_tok")).as("max_doc_tokens"),
        countDistinct(col("th")).as("n_distinct_texts"))
      .withColumn("dup_rate",
        round((col("n_docs") - col("n_distinct_texts")).cast("double") / col("n_docs"), 4))
  }
}
