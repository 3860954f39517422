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
  * Scale shape: an inverted-index equi-join on the n-gram — both sides
  * explode to (id, gram) with per-document `distinct`, the join key is the
  * gram string, and the overlap count is a pure post-join aggregate; no
  * pairwise comparison ever materializes. The benchmark side is tiny by
  * definition (eval sets), so Catalyst broadcasts it under AQE; the corpus
  * side streams through one shuffle on the gram. `maxGramDf` drops
  * benchmark grams appearing in more than that many benchmark documents —
  * boilerplate n-grams (licenses, headers) otherwise fan out the join at
  * 100 TB; capped grams are the standard practice and are reported by the
  * caller's choice, not silently (the cap is an explicit parameter).
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
    def grams(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(as), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n)))"))
        .as("gram"))
      .distinct()
    val bg0 = grams(bench, "bench_id")
    val bg =
      if (maxGramDf == Long.MaxValue) bg0
      else bg0.join(
        bg0.groupBy("gram").agg(count(lit(1)).as("__bdf"))
          .filter(col("__bdf") <= maxGramDf).select("gram"),
        "gram")
    grams(docs, "doc_id").join(bg, "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
