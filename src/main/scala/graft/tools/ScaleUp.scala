package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-scale dataset (10× sf0.1) for SLOPE EVIDENCE ONLY —
  * correctness stays gated on the driver's read-only testdata; this tool
  * exists so the empirical scaling gate covers one more decade
  * (sf0.01 → sf0.1 → sf1).
  *
  * Ten key-shifted copies of every sf0.1 table, foreign keys shifted
  * consistently so joins land exactly as before. Three deliberate choices
  * that preserve WORKLOAD CHARACTER instead of degenerating it:
  *  - `documents.text` is STRIDE-PERMUTED per copy (copy 0 verbatim; see
  *    the inline note): token multisets — and every LM/stopword/quality
  *    statistic — are preserved per doc, while cross-copy shingle overlap
  *    collapses, so dedup pair volume scales 10× rather than ~45×
  *    (9 exact twins per doc would measure the synthetic corpus, not the
  *    operator).
  *  - `embeddings` copies 1-9 get a deterministic ±2% per-component
  *    jitter (see the inline note): near-dup-DENSE (each vector keeps 9
  *    cos≈0.999 twins) without being bit-identical — the workload the
  *    hot-bucket dedup guard exists for.
  *  - `events.ts` is kept, so the time range holds and window density
  *    grows 10× (more points per window — the realistic scale-up);
  *    `user_id`/`event_id` shift, so group cardinality grows 10× too.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val Shift = 100000000L // far above any sf0.1 key
    val spark = graft.Graft.session("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")

    def copyShift(df: DataFrame, keyCols: Seq[String], c: Int): DataFrame =
      keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Shift)))

    def scaled(name: String, keyCols: Seq[String],
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      // events must keep its RAW layout (ts as INT64 nanos under the
      // legacy conf) — routing through Graft.events would bake the shaped
      // (ts_ns, time) projection into the file and Graft.events could no
      // longer re-shape it
      val base =
        if (name == "events") {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$src/$name.parquet")
        } else graft.Graft.table(spark, src, name)
      val out = (0 until copies).map(c => perCopy(copyShift(base, keyCols, c), c))
        .reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"== $name → ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // fixed dimensions: one copy each
    Seq("region", "nation").foreach { t =>
      graft.Graft.table(spark, src, t).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    }
    // nation/region stay single-copy, so *_nationkey columns must NOT shift
    scaled("customer", Seq("c_custkey"))
    scaled("supplier", Seq("s_suppkey"))
    scaled("part", Seq("p_partkey"))
    scaled("orders", Seq("o_orderkey", "o_custkey"))
    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaled("events", Seq("event_id", "user_id"))
    // Copies 1-9 STRIDE-PERMUTE each document's tokens (j → j·p mod L,
    // p prime > L ⟹ bijective): the token MULTISET is exactly preserved —
    // language-ID, stopword, LM, and quality statistics are identical per
    // doc — while shingle overlap with the original and with every other
    // copy collapses (non-adjacent tokens juxtaposed), and a planted
    // near-dup pair stays a near-dup within its copy (the shared tokens
    // map to the same positions). Net: dedup pair volume scales 10×, not
    // 45×, and nothing LM-shaped shifts.
    val primes = Array(101, 103, 107, 109, 113, 127, 131, 137, 139)
    scaled("documents", Seq("doc_id"), (d, c) =>
      if (c == 0) d
      else {
        val p = primes(c - 1)
        val t = split(col("text"), " ")
        d.withColumn("text", array_join(
          transform(sequence(lit(0), size(t) - 1),
            i => element_at(t, pmod(i * lit(p), size(t)) + 1)), " "))
      })
    // Copies 1-9 get a deterministic per-copy ε-jitter (multiplicative,
    // ±2% per component, xxhash64-derived — no RNG): verbatim replication
    // would give every vector 9 exact cosine-1.0 twins, which (a) inflates
    // near-dup pair volume ~45× (measuring the synthetic corpus, not the
    // operator) and (b) masks whether the hot-bucket guard works on NEAR
    // duplicates — the workload it exists for. Jittered copies stay
    // near-dups of their original (cos ≈ 0.999) but are no longer
    // degenerate: the sf1 corpus is near-dup-DENSE, the realistic shape.
    scaled("embeddings", Seq("vec_id"), (d, c) =>
      if (c == 0) d
      else d.withColumn("embedding", transform(col("embedding"), (x, j) =>
        (x * (lit(1.0) + lit(0.02) *
          (pmod(xxhash64(col("vec_id"), lit(c), j), lit(2001)) - 1000).cast("double") / 1000.0))
          .cast("float"))))
    spark.stop()
  }
}
