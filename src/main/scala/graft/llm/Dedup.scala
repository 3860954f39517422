package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash and exact n-gram Jaccard (inverted-index form).
  *
  * Scale posture (the whole point of these designs):
  *   - exact: one hash-shuffle on the content hash; no driver state.
  *   - minhash LSH: per-doc signature is map-side only; the only shuffle is
  *     the band-bucket self-join, whose key cardinality grows with corpus
  *     size so buckets stay small; estimated-Jaccard filtering happens
  *     before any full-text comparison.
  *   - simhash: candidate pairs come from chunk-collision blocking which is
  *     *lossless* for Hamming ≤ chunks-1 (pigeonhole), so no all-pairs
  *     comparison ever materializes.
  *   - ngram Jaccard: inverted index (explode shingles → equi-join) so only
  *     pairs sharing ≥1 shingle are generated; set sizes travel with the
  *     rows, making the final Jaccard a pure map-side computation.
  */
object Dedup {

  /** Exact duplicate marking: every row keeps its content hash and the
    * smallest doc_id bearing the same hash (`dup_of`); `is_dup` flags
    * non-canonical copies. One shuffle on the 128-bit content hash. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    val w = Window.partitionBy(col("content_hash"))
    docs.select(col(idCol), h.as("content_hash"))
      .withColumn("dup_of", min(col(idCol)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("dup_of")).cast("boolean"))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * k-component signatures over word-`shingleN` shingles, banded `bands` ×
    * `rows`; pairs colliding on ≥1 band are scored by signature agreement
    * and kept when the estimate reaches `threshold`. With bands=4, rows=4
    * the LSH S-curve crosses ~ (1/4)^(1/4) ≈ 0.71 true Jaccard.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      bands: Int = 4,
      rows: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(bands * rows == k, "bands*rows must equal k")
    val sigs = docs.select(
      col(idCol).as("doc_id"),
      TextOps.minhashSig(TextOps.shingleSet(col(textCol), 3), k).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(TextOps.minhashBands(col("sig"), bands, rows)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextOps.minhashEstimate(col("sig_a"), col("sig_b"), k), 6).as("est_jaccard"))
      .distinct() // a pair may collide on several bands
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs: 32-bit simhash, `chunks`-way blocking,
    * Hamming distance ≤ maxHamming (must be < chunks for the blocking to be
    * lossless). */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunks: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < chunks, "blocking is only lossless for maxHamming < chunks")
    val chunkBits = 32 / chunks
    val hashed = docs.select(col(idCol).as("doc_id"),
      TextOps.simhash32(TextOps.tokens(col(textCol))).as("sh"))
    val blocked = hashed.select(col("doc_id"), col("sh"),
      posexplode(array((0 until chunks).map(c =>
        TextOps.simhashChunk(col("sh"), c, chunkBits)): _*)).as(Seq("chunk_idx", "chunk")))
    val a = blocked.select(col("chunk_idx"), col("chunk"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("chunk_idx"), col("chunk"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.hamming(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard via inverted index: explode each document's
    * distinct shingle set, equi-join on the shingle, count common shingles
    * per pair, and compute |A∩B| / |A∪B| without ever materializing
    * non-overlapping pairs. */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      TextOps.shingleSet(col(textCol), n).as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))
    val inv = sets.select(col("doc_id"), col("nsh"), explode(col("sh")).as("shingle"))
    val a = inv.select(col("shingle"), col("doc_id").as("id_a"), col("nsh").as("n_a"))
    val b = inv.select(col("shingle"), col("doc_id").as("id_b"), col("nsh").as("n_b"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("n_a") + col("n_b") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("n_a"), col("n_b"), col("jaccard"))
  }
}
