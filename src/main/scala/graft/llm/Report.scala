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

  /** Cross-source duplicate-overlap matrix — the corpus-audit view of
    * leakage BETWEEN sources (which feeds dedup priorities and
    * decontamination scoping): for every unordered source pair, the
    * number of distinct text hashes present in BOTH, each side's
    * distinct-hash count, and the Jaccard of the two hash sets. Pairs
    * with zero overlap are omitted.
    *
    * Scale shape: ONE shuffle on the 60-bit text hash; the per-hash
    * state is a source SET bounded by the source count (collect_set is
    * map-side combinable), and the pair explosion is C(k,2) of that
    * bounded set — never a doc×doc self-join. The per-source totals are
    * a tiny broadcast. */
  def sourceOverlap(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val h = docs
      .select(col(sourceCol).as("source"),
        TextOps.h60(coalesce(col(textCol), lit(""))).as("th"))
      .distinct()
    val counts = h.groupBy("source").agg(count(lit(1)).as("n"))
    val sets = h.groupBy("th")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    val pairs = sets
      .select(col("ss"), posexplode(col("ss")).as(Seq("i", "src_a")))
      .select(col("src_a"),
        explode(slice(col("ss"), col("i") + 2, size(col("ss")))).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("overlap"))
    pairs
      .join(broadcast(counts.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(counts.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("overlap"), col("n_a"), col("n_b"),
        round(col("overlap").cast("double") /
          (col("n_a") + col("n_b") - col("overlap")), 6).as("jaccard"))
  }
}
