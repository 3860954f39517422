package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exactness baseline, and a random-hyperplane LSH
  * variant as the scale path (bucketed candidate generation → only
  * same-bucket pairs are scored).
  *
  * Determinism: all arithmetic is float32-exactly-widened-to-double with
  * left-to-right summation, so an oracle engine reproducing the same fold
  * produces bit-identical doubles. The LSH hyperplanes are ±1 components
  * derived from md5 (see [[hyperplanes]]) — a pure function of (plane,
  * component) index that any engine can restate.
  */
object Similarity {

  /** Left-fold double dot product via the native codegen'd expression
    * (graft.expressions.DotProduct) — identical semantics to
    * `aggregate(zip_with(...))` but it stays inside whole-stage codegen,
    * which is the difference between interpreted HOF folds and a primitive
    * loop on an all-pairs similarity join. */
  def dot(a: Column, b: Column): Column = {
    graft.expressions.DotProduct.register(org.apache.spark.sql.SparkSession.active)
    call_function("graft_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given two vectors and their precomputed norms
    * (precompute norms per row *before* any join — at 100 TB you don't
    * recompute a norm once per candidate pair). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Top-`k` most similar vector pairs in the corpus — all-pairs scoring.
    * EXACTNESS BASELINE, test-only: the pair join is a cartesian product
    * with a filter and never finishes at corpus scale. The production
    * near-duplicate report is [[nearDupPairsLsh]]; LlmSpec uses this one
    * as its oracle on small data. */
  def topSimilarPairs(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.expressions.DotProduct.register(emb.sparkSession)
    val n = emb.select(col(idCol).as("vid"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val a = n.select(col("vid").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = n.select(col("vid").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosineWithNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")), 6))
    // distributed top-k (TakeOrderedAndProject: per-partition heads merged
    // on the driver) instead of a global rank window, which would sort the
    // full pair set on a single partition; ranks attach to the k survivors
    pairs
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos").desc, col("id_a"), col("id_b"))).cast("long"))
      .select(col("rk"), col("id_a"), col("id_b"), col("cos"))
  }

  /** Brute-force cosine k-NN: for each query vector, the `k` nearest
    * corpus vectors (self excluded). The query side is broadcast — the
    * corpus side streams through in one pass, no shuffle of the big side. */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String, queryPred: Column, k: Int): DataFrame = {
    graft.expressions.DotProduct.register(emb.sparkSession)
    // queryPred references the normalized id column "vid"
    val n = emb.select(col(idCol).as("vid"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val q = n.filter(queryPred)
      .select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    n.crossJoin(broadcast(q))
      .filter(col("vid") =!= col("query_id"))
      .withColumn("cos", round(cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vid"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vid").as("neighbor_id"), col("cos"))
  }

  /** IVF-flat approximate k-NN: corpus vectors are inverted-listed under
    * their nearest centroid; a query probes its `nprobe` nearest lists and
    * exact cosine re-ranks the candidates.
    *
    * `centroids` is the coarse quantizer — (cid, cvec) rows, normally
    * k-means output; any deterministic seeding works and the oracle entry
    * seeds with the first-nlist vectors. Scale shape: centroids broadcast
    * (a model object, O(nlist·dim)); assignment is a map-side broadcast
    * join + partial `max_by` per vector (one hash-agg keyed by the vector
    * id, no explode-rank, no collect); the probe join is an equi-join on
    * cid whose right side shrank to ~|corpus|/nlist·nprobe. */
  def knnIvf(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      centroids: DataFrame,
      nprobe: Int = 2): DataFrame = {
    graft.expressions.DotProduct.register(emb.sparkSession)
    val n = emb.select(col(idCol).as("vid"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val cents = centroids.select(col("cid"), col("cvec"), norm(col("cvec")).as("cnrm"))
    val sim = round(cosineWithNorms(col("v"), col("cvec"), col("nrm"), col("cnrm")), 6)
    // assignment: best centroid per vector — max_by over the broadcast fan-out
    val assigned = n.join(broadcast(cents))
      .groupBy("vid")
      .agg(max_by(col("cid"), struct(sim.as("s"), (-col("cid")).as("t"))).as("cid"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
    // probes: nprobe best centroids per query vector
    val probes = n.filter(queryPred).join(broadcast(cents))
      .withColumn("prk", row_number().over(
        Window.partitionBy(col("vid")).orderBy(sim.desc, col("cid"))))
      .filter(col("prk") <= nprobe)
      .select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("cid"))
    assigned.join(probes, "cid")
      .filter(col("vid") =!= col("query_id"))
      .withColumn("cos", round(cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vid"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vid").as("neighbor_id"), col("cos"))
  }

  // ------------------------------------------------------------ LSH ANN

  /** JVM-side md5-derived bit, identical to TextOps.h60(s) % 2. */
  private def h60bit(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(d.substring(0, 15), 16) % 2).toInt
  }

  /** `planes` random hyperplanes of ±1 components for `dim` dimensions,
    * derived deterministically from md5("h:j") so the oracle can embed the
    * identical literals. */
  def hyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until planes).map(h => (0 until dim).map(j => (2 * h60bit(s"$h:$j") - 1).toDouble))

  /** Sign-bucket of a vector under the hyperplane family: bit h is set when
    * dot(v, plane_h) >= 0. Vectors in the same bucket are ANN candidates. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, h) =>
      val d = dot(v, typedlit(p))
      when(d >= 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Seeded hyperplane family `f` — same construction as [[hyperplanes]]
    * in a per-family md5 namespace, so families are independent. */
  def hyperplanesSeeded(family: Int, planes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until planes).map(h => (0 until dim).map(j => (2 * h60bit(s"f$family:$h:$j") - 1).toDouble))

  /** Scale-path near-duplicate report: banded sign-LSH candidate
    * generation + exact cosine re-rank (the minhash-band pattern applied
    * to random-hyperplane signatures). A pair is a candidate when its
    * vectors share a sign-bucket under ANY of the `families` independent
    * hyperplane families; candidates get exact cosine and the global top-k
    * survives.
    *
    * Plan shape at 100 TB: the bucket table is narrow (id, family, bucket
    * — no vectors), the pair join is an equi-join on (family, bucket), and
    * vectors are fetched for the ~linear candidate set via two id
    * equi-joins. No cartesian anywhere; recall is the standard LSH
    * trade-off (1-(1-p^planes)^families per pair) — LlmSpec pins 100%
    * recall on planted near-duplicates, which is the workload this report
    * exists for. */
  def nearDupPairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      families: Int = 4,
      planesPerFamily: Int = 6,
      dim: Int = 64): DataFrame = {
    graft.expressions.DotProduct.register(emb.sparkSession)
    val n = emb.select(col(idCol).as("vid"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val famBuckets = (0 until families).map { f =>
      struct(lit(f).as("fam"), lshBucket(col("v"), hyperplanesSeeded(f, planesPerFamily, dim)).as("bucket"))
    }
    // narrow signature table; persisted because it feeds an aliased
    // self-join (both branches would otherwise recompute the signatures —
    // and it is the only state this operator materializes)
    val buckets = n.select(col("vid"), explode(array(famBuckets: _*)).as("fb"))
      .select(col("vid"), col("fb.fam").as("fam"), col("fb.bucket").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.fam") === col("b.fam") && col("a.bucket") === col("b.bucket") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
      .distinct()
    val scored = cand
      .join(n.select(col("vid").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), "id_a")
      .join(n.select(col("vid").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), "id_b")
      .withColumn("cos", round(cosineWithNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")), 6))
    val topk = scored
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos").desc, col("id_a"), col("id_b"))).cast("long"))
      .select(col("rk"), col("id_a"), col("id_b"), col("cos"))
    // the top-k result is tiny: pin it eagerly and release the bucket cache
    // so repeated invocations don't accumulate signature tables
    val out = topk.localCheckpoint(true)
    buckets.unpersist(false)
    out
  }

  /** LSH-bucketed approximate k-NN: candidates are corpus vectors sharing
    * the query's sign-bucket; exact cosine ranks within the bucket. With B
    * buckets the scored pairs shrink ~B× versus brute force, and the join
    * is a plain equi-join on the bucket key (shuffle keyed by bucket —
    * skew-safe for moderate `planes` counts, AQE handles the rest). */
  def knnLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      planes: Int = 8,
      dim: Int = 64): DataFrame = {
    graft.expressions.DotProduct.register(emb.sparkSession)
    val hp = hyperplanes(planes, dim)
    val n = emb.select(col(idCol).as("vid"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"), lshBucket(col(vecCol), hp).as("bucket"))
    val q = n.filter(queryPred)
      .select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    n.join(broadcast(q), Seq("bucket"))
      .filter(col("vid") =!= col("query_id"))
      .withColumn("cos", round(cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vid"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vid").as("neighbor_id"), col("cos"))
  }
}
