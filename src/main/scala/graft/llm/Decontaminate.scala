package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data pipeline step that flags
  * documents overlapping an evaluation/benchmark set before training, so
  * test data never leaks into the corpus (the n-gram–overlap method used
  * by the GPT-3/PaLM/Llama decontamination appendices: a document is
  * contaminated when it shares ≥ `minOverlap` distinct word n-grams with
  * any benchmark document).
  *
  * Scale shape: the benchmark side (eval sets — tiny by definition)
  * BROADCASTS its per-document-distinct gram hashes; the corpus side
  * explodes to (id, gramHash) and map-side joins — the only shuffle in
  * the whole plan is the final per-pair aggregate, which sees only
  * matching rows (≈ contamination volume, not corpus volume). Per-doc
  * gram dedup happens inside the fused ShingleHashes pass (a free
  * partition-local op), so the aggregate is a plain count — no Expand
  * for count(DISTINCT), no cross-corpus distinct shuffle (at 100 TB that
  * distinct would be the bottleneck; measured 1.3× end-to-end even at
  * sf0.1). `maxGramDf` drops benchmark grams appearing in more than that
  * many benchmark documents — boilerplate n-grams (licenses, headers)
  * otherwise fan out the join; the cap is an explicit parameter, never
  * silent.
  *
  * Tokenization matches the repo-wide oracle convention: lower, trim,
  * split on whitespace runs, drop empty tokens.
  */
object Decontaminate {

  def contamination(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minOverlap: Long = 1L,
      maxGramDf: Long = Long.MaxValue): DataFrame = {
    require(n >= 1, "n-gram size must be positive")
    // grams travel as 60-bit md5-derived hashes (the repo-wide h60, which
    // the oracle reproduces exactly), produced by the fused ShingleHashes
    // expression in one partition-local JVM pass: tokenize → n-shingle →
    // per-document distinct → sorted long array. Exploding longs and
    // joining on a long key beats building every gram string through
    // interpreted HOF trees and hash-joining on strings (measured 1.5× on
    // q_decontaminate at sf0.1); at 100 TB it also shrinks the broadcast
    // (8 bytes/gram vs the gram text) and the exploded corpus rows.
    // strict mode: sub-n-token documents contribute nothing (they cannot
    // share an n-gram), matching the oracle's empty range over short docs.
    val fn = graft.expressions.ShingleHashes.register(
      docs.sparkSession, n, distinct = true, wholeDocIfShort = false)
    def grams(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), explode(call_function(fn, col(textCol))).as("gram"))
    // (bench_id, gram) pairs are already distinct per document; no extra
    // cross-document distinct is needed (ids differ across documents)
    val bg0 = grams(bench, "bench_id")
    val bg =
      if (maxGramDf == Long.MaxValue) bg0
      else bg0.join(
        bg0.groupBy("gram").agg(count(lit(1)).as("__bdf"))
          .filter(col("__bdf") <= maxGramDf).select("gram"),
        "gram")
    grams(docs, "doc_id").join(broadcast(bg), "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
