package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring for training-data quality filtering —
  * the CCNet/Gopher-style "perplexity filter" step: score every document
  * by its average per-token negative log-likelihood under a smoothed
  * unigram model of the corpus and drop (or bucket) the tails. A full
  * KenLM is out of scope for a SQL-oracle-checkable operator; the unigram
  * variant keeps the exact pipeline shape (train a model over the corpus,
  * broadcast it, score every document in one map pass) with arithmetic
  * every engine can restate.
  *
  * Scale shape (100 TB): training is ONE token-count aggregation — a
  * word-count with map-side partial aggregation, the canonical scalable
  * shuffle — followed by a driver collect bounded to `topV` rows (the
  * vocabulary is a model object, like the k-means centers and PQ
  * codebooks). Scoring is shuffle-free: the (token → log-prob) map rides
  * in the task binary as a literal and each document folds over its own
  * tokens. Nothing driver-side ever sees a document.
  *
  * Determinism: vocabulary = top `topV` tokens by (count DESC, token ASC)
  * — integer-ordered, no float boundary; probabilities are Laplace
  * (add-one) with a single OOV bucket, p(t) = (c_t + 1) / (T + V + 1),
  * where T counts ALL token occurrences and V = |vocab|; the per-document
  * sum is a left fold in token order so the oracle's `list_reduce`
  * reproduces the same double sequence.
  */
object LangModel {

  /** (token → ln p) for the vocabulary, plus the OOV log-prob. */
  case class UnigramModel(lp: Map[String, Double], oovLp: Double,
      total: Long, vocabSize: Int)

  /** Train on one aggregation pass + a bounded driver collect. */
  def unigramTrain(docs: DataFrame, textCol: String, topV: Int): UnigramModel = {
    require(topV > 0, "vocabulary size must be positive")
    val counts = docs
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val total = counts.agg(sum(col("cnt"))).head.getLong(0)
      val vocab = counts.orderBy(col("cnt").desc, col("token")).limit(topV)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val denom = (total + vocab.length + 1).toDouble
      UnigramModel(
        vocab.map { case (t, c) => t -> math.log((c + 1).toDouble / denom) }.toMap,
        math.log(1.0 / denom), total, vocab.length)
    } finally { counts.unpersist(blocking = false) }
  }

  /** Per-document average negative log-likelihood (natural log), rounded
    * to 5 decimals; empty-token documents are dropped (no defined score).
    * Output: (idCol, n_tok, avg_nll). */
  def avgNll(docs: DataFrame, idCol: String, textCol: String,
      model: UnigramModel): DataFrame = {
    val m = typedlit(model.lp)
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), size(col("toks")).cast("long").as("n_tok"),
        round(
          -aggregate(col("toks"), lit(0.0),
            (acc, t) => acc + coalesce(element_at(m, t), lit(model.oovLp)))
            / size(col("toks")),
          5).as("avg_nll"))
  }
}
