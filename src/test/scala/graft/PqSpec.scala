package graft

import graft.llm.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (IVF-PQ + ADC): codebook training on the
  * deterministic sample, shuffle-free encoding, and end-to-end recall
  * against the brute-force exact baseline — the quality gates for the
  * memory-scale ANN path (no SQL oracle can state a trained quantizer,
  * like kmeansTrain). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  private lazy val planted = {
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4) { c =>
      Array.tabulate(dim)(j => if (j / 4 == c) 10.0 else 0.0)
    }
    val rows = for { c <- 0 until 4; i <- 0 until 60 } yield {
      val v = centers(c).map(x => x + rnd.nextGaussian())
      (c.toLong * 60 + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pqTrain is deterministic; codebooks quantize the sample tightly") {
    val a = Pq.pqTrain(planted, "vec_id", "embedding", m = 4, ksub = 8)
    val b = Pq.pqTrain(planted, "vec_id", "embedding", m = 4, ksub = 8)
    assert(a == b)
    assert(a.m == 4 && a.ksub == 8 && a.subdim == 4)
    // reconstruction through the codebooks beats a degenerate 1-codeword
    // quantizer by a wide margin
    val coarse = Pq.pqTrain(planted, "vec_id", "embedding", m = 4, ksub = 1)
    def mse(model: Pq.PqModel): Double = {
      val rows = Pq.pqEncode(planted.select(col("embedding").as("v")), "v", model)
        .select("v", "codes").as[(Seq[Double], Seq[Int])].collect()
      rows.map { case (v, codes) =>
        val rec = codes.zipWithIndex.flatMap { case (c, s) => model.codebooks(s)(c) }
        v.zip(rec).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum / rows.length
    }
    assert(mse(a) < mse(coarse) / 4, s"mse(a)=${mse(a)} mse(1)=${mse(coarse)}")
  }

  test("pqEncode is shuffle-free (no Exchange in the plan)") {
    val model = Pq.pqTrain(planted, "vec_id", "embedding", m = 4, ksub = 8)
    val plan = Pq.pqEncode(planted.select(col("embedding").as("v")), "v", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("knnIvfPq reaches recall@10 >= 0.9 vs brute force on planted clusters") {
    val centroids = Similarity.kmeansTrain(planted, "vec_id", "embedding", k = 4,
      iterations = 6)
    val pq = Pq.pqTrain(planted, "vec_id", "embedding", m = 4, ksub = 16)
    val ivfpq = Pq.knnIvfPq(planted, "vec_id", "embedding",
        col("vid") < 10, k = 10, centroids = centroids, pq = pq, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.knnBrute(planted, "vec_id", "embedding",
        col("vid") < 10, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, exact) =>
      ivfpq.getOrElse(q, Set.empty).intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean")
    // every returned list is exactly k long and exact-ranked
    assert(ivfpq.values.forall(_.size == 10))
  }
}
