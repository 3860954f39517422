package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** k-means(||) trainer for the IVF coarse quantizer: planted-cluster
  * recovery, recall@10 of knnIvf seeded from TRAINED centroids against the
  * brute-force exact baseline, and determinism. (The correctness-gate
  * query q_knn_ivf keeps deterministic first-n seeds because a trained
  * quantizer cannot be restated in the SQL oracle — this spec is the
  * trainer's quality gate.) */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val nPerCluster = 60

  /** 4 well-separated planted centers on distinct axes groups, points
    * jittered deterministically around them. */
  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    val centers = Array.tabulate(4) { c =>
      Array.tabulate(dim)(j => if (j / 4 == c) 10.0 else 0.0)
    }
    val rows = for {
      c <- 0 until 4
      i <- 0 until nPerCluster
    } yield {
      val v = centers(c).map(x => x + rnd.nextGaussian())
      (c.toLong * nPerCluster + i, c, v)
    }
    (centers, rows.toDF("vec_id", "cluster", "embedding"))
  }

  test("trained centroids recover the planted clusters") {
    val (centers, df) = planted
    val trained = Similarity.kmeansTrain(df, "vec_id", "embedding", k = 4,
      iterations = 6)
      .select("cid", "cvec").as[(Int, Array[Double])].collect()
    assert(trained.length == 4)
    // every planted center has a trained centroid at cosine ~1
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val best = centers.map(c => trained.map(t => cos(c, t._2)).max)
    assert(best.forall(_ > 0.98), best.mkString(","))
    // and the four trained centroids are mutually distinct clusters
    val pairwise = for {
      i <- trained.indices; j <- trained.indices if i < j
    } yield cos(trained(i)._2, trained(j)._2)
    assert(pairwise.forall(_ < 0.9), pairwise.mkString(","))
  }

  test("knnIvf from trained centroids reaches recall@10 >= 0.9 vs brute force") {
    val (_, df) = planted
    val trained = Similarity.kmeansTrain(df, "vec_id", "embedding", k = 4,
      iterations = 6)
    val ivf = Similarity.knnIvf(df, "vec_id", "embedding",
        col("vid") < 10, k = 10, centroids = trained, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.knnBrute(df, "vec_id", "embedding",
        col("vid") < 10, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, exact) =>
      ivf.getOrElse(q, Set.empty).intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean")
  }

  test("centroid assignment is shuffle-free (no Exchange in the plan)") {
    // the literal-fold argmax (Similarity.assignToCenters) must not join
    // or aggregate — at 100 TB an exchange here reshuffles the corpus once
    // per trainer pass (×11) — so the physical plan is exchange-free
    val (centers, df) = planted
    val n = df.select(col("vec_id").cast("string").as("vid"),
        col("embedding").as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val model = centers.zipWithIndex.map { case (v, i) =>
      (i, v, math.sqrt(v.map(x => x * x).sum)) }.toSeq
    val assigned = Similarity.assignToCenters(n, model, prec = 9)
    val physical = assigned.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), physical)
    // and it still computes the right answer
    val byCluster = assigned
      .withColumn("planted", (col("vid").cast("long") / nPerCluster).cast("int"))
      .filter(col("cid") =!= col("planted")).count()
    assert(byCluster == 0)
  }

  test("training is deterministic for a fixed seed") {
    val (_, df) = planted
    def run() = Similarity.kmeansTrain(df, "vec_id", "embedding", k = 4,
      iterations = 3)
      .orderBy("cid").as[(Int, Array[Double])].collect()
      .map { case (c, v) => (c, v.toSeq) }.toSeq
    assert(run() == run())
  }
}
