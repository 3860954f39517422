package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The hot-bucket/hot-cell guard for embedding-space dedup
  * (Similarity.boundedGroupPairs): real web corpora contain exact-duplicate
  * embedding mega-clusters (boilerplate pages, mirrors — all embed
  * identically), which land in ONE LSH bucket per family / ONE k-means
  * cell and make uncapped within-group pairing Σ|group|² — the quadratic
  * mechanism the sf1 scale run measured at 11.9×/decade before the guard.
  * These tests plant that mega-cluster and pin:
  *   - candidate volume is O(N·anchors), not N²/2;
  *   - the min-id star preserves the full dedup verdict on the
  *     fully-connected (exact-duplicate) cluster — capped ≡ uncapped;
  *   - below the cap the pairing is EXHAUSTIVE and byte-identical to the
  *     uncapped operator (the gate-safety property: sf0.001/sf0.01 never
  *     reach the default 4096 cap, so the DuckDB oracles restate the
  *     uncapped algorithm verbatim).
  */
class SimilaritySkewSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vector from an id (no RNG).
    * Murmur-mixed per (id, j): a plain linear-congruential sequence here
    * makes different ids' vectors rotated slices of ONE periodic sequence
    * (accidental cos≈1.0 pairs that out-rank planted twins). */
  private def fakeVec(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      import scala.util.hashing.MurmurHash3
      val h = MurmurHash3.finalizeHash(
        MurmurHash3.mix(MurmurHash3.mix(0x9747b28c, id.toInt), j), 2)
      (math.floorMod(h, 1000L) - 500L) / 500.0
    }

  test("boundedGroupPairs: a planted mega-group yields O(N·anchors) candidates, not N²/2") {
    val n = 1500
    val hot = (0 until n).map(i => ("hot", 100L + i))
    val cold = for (g <- 0 until 10; i <- 0 until 5) yield (s"g$g", 10000L + g * 10 + i)
    val members = (hot ++ cold).toDF("grp", "vid")

    val capped = Similarity.boundedGroupPairs(members, Seq("grp"), maxGroup = 256, anchors = 4)
    val cnt = capped.count()
    val coldPairs = 10L * (5 * 4 / 2)
    assert(cnt <= n.toLong * 4 + coldPairs, s"candidate volume $cnt exceeds the N·anchors bound")
    assert(cnt < n.toLong * n / 8, s"candidate volume $cnt is still quadratic-ish")
    // the min-id anchor stars the whole hot group: every other member pairs
    // with it, so a fully-connected cluster keeps its uncapped canonical
    assert(capped.filter($"id_a" === 100L).select("id_b").distinct().count() == n - 1L)

    // below the cap the pairing is exhaustive — exactly C(n,2) per group
    val uncapped = Similarity.boundedGroupPairs(members, Seq("grp"), maxGroup = n + 1, anchors = 4)
    assert(uncapped.count() == n.toLong * (n - 1) / 2 + coldPairs)
    // cold groups are identical in both runs
    val coldSet = (df: org.apache.spark.sql.DataFrame) =>
      df.filter($"id_a" >= 10000L).as[(Long, Long)].collect().toSet
    assert(coldSet(capped) == coldSet(uncapped))
  }

  test("nearDupPairsLsh: planted exact-duplicate mega-cluster stays bounded and still surfaces cos=1 pairs") {
    val dup = fakeVec(7L, 8)
    val mega = (0 until 2000).map(i => (100L + i, dup))
    val rest = (0 until 30).map(i => (5000L + i, fakeVec(i.toLong, 8)))
    val emb = (mega ++ rest).toDF("vec_id", "embedding")

    // the guard's own candidate stage, with the operator's bucket layout:
    // every mega member lands in the same (fam, bucket) of BOTH families
    val famBuckets = (0 until 2).map { f =>
      struct(lit(f).as("fam"),
        Similarity.lshBucket(col("embedding"), Similarity.hyperplanesSeeded(f, 3, 8)).as("bucket"))
    }
    val buckets = emb.select(col("vec_id").as("vid"), explode(array(famBuckets: _*)).as("fb"))
      .select(col("vid"), col("fb.fam").as("fam"), col("fb.bucket").as("bucket"))
    val cand = Similarity.boundedGroupPairs(buckets, Seq("fam", "bucket"), maxGroup = 128, anchors = 4)
    val cnt = cand.count()
    // 2 families × (2000·4 anchor pairs + small-bucket exhaustive tail)
    assert(cnt <= 2L * (2000L * 4 + 30L * 29 / 2), s"LSH candidate volume $cnt not bounded")
    assert(cnt < 2000L * 2000 / 8, s"LSH candidate volume $cnt is still quadratic-ish")

    val top = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", k = 10,
        families = 2, planesPerFamily = 3, dim = 8, maxBucket = 128, bucketAnchors = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length == 10 && top.forall(_._4 == 1.0),
      s"top-k must be exact-duplicate pairs, got ${top.mkString(",")}")
  }

  test("semanticDedup: a hot cell of exact duplicates keeps the uncapped verdict under the cap") {
    val x = Array(1.0, 0.0, 0.0, 0.0)
    val y = Array(0.0, 1.0, 0.0, 0.0)
    val mega = (0 until 1200).map(i => (10L + i, x)) // fully-connected cell, min id 10
    val others = Seq((5000L, y), (5001L, y), (5002L, Array(0.1, 0.99, 0.0, 0.0)))
    val emb = (mega ++ others).toDF("vec_id", "embedding")
    val centroids = Seq((0, x), (1, y)).toDF("cid", "cvec")

    val capped = Similarity.semanticDedup(emb, "vec_id", "embedding", centroids,
        threshold = 0.999, maxCell = 128, cellAnchors = 4)
      .as[(Long, Int, Long, Boolean)].collect().toSet
    val uncapped = Similarity.semanticDedup(emb, "vec_id", "embedding", centroids,
        threshold = 0.999, maxCell = Int.MaxValue)
      .as[(Long, Int, Long, Boolean)].collect().toSet
    assert(capped == uncapped,
      "star pairing through the min-id anchor must preserve the fully-connected cell's verdict")
    val byId = capped.map(r => r._1 -> r).toMap
    assert(!byId(10L)._4 && byId(10L)._3 == 10L)
    (11L until 1210L).foreach(i => assert(byId(i)._4 && byId(i)._3 == 10L))
    assert(byId(5001L)._4 && byId(5001L)._3 == 5000L && !byId(5000L)._4)
  }

  test("boundedGroupPairs: randomized contract — subset, cold-exact, hot-star, partition invariance") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 12) {
      val nGroups = 3 + rnd.nextInt(6)
      val cap = 4 + rnd.nextInt(9)
      val anchors = 1 + rnd.nextInt(4)
      // unique vids across the corpus; group sizes straddle the cap
      var nextVid = 100L
      val memberRows = (0 until nGroups).flatMap { g =>
        val size = 1 + rnd.nextInt(3 * cap)
        (0 until size).map { _ => nextVid += 1; (s"g$g", nextVid) }
      }
      val bySize = memberRows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val members = rnd.shuffle(memberRows).toDF("grp", "vid")

      def pairsOf(df: org.apache.spark.sql.DataFrame, maxGroup: Int) =
        graft.llm.Similarity.boundedGroupPairs(df, Seq("grp"), maxGroup, anchors)
          .as[(Long, Long)].collect().toSet
      val capped = pairsOf(members, cap)
      val uncapped = pairsOf(members, Int.MaxValue)

      // ordering + same-group membership + subset of the exhaustive set
      assert(capped.forall { case (a, b) => a < b }, s"trial $trial: unordered pair")
      assert(capped.forall { case (a, b) =>
        bySize.values.exists(s => s(a) && s(b)) }, s"trial $trial: cross-group pair")
      assert(capped.subsetOf(uncapped), s"trial $trial: invented pair")
      bySize.foreach { case (g, vids) =>
        val within = capped.filter { case (a, b) => vids(a) && vids(b) }
        if (vids.size <= cap)
          // cold: exhaustive, exactly C(n,2)
          assert(within.size == vids.size * (vids.size - 1) / 2,
            s"trial $trial group $g cold pairing not exhaustive")
        else {
          // hot: bounded, and the min-id star is complete (the property that
          // preserves fully-connected-cluster verdicts under the cap)
          assert(within.size <= vids.size.toLong * anchors,
            s"trial $trial group $g hot pairing exceeds the anchor bound")
          val mn = vids.min
          assert(vids.filterNot(_ == mn).forall(v => within((mn, v))),
            s"trial $trial group $g min-id star incomplete")
        }
      }
      // results are a function of the membership SET, not its partitioning
      val repart = pairsOf(members.repartition(7), cap)
      assert(repart == capped, s"trial $trial: partitioning changed the result")
    }
  }

  test("recall survives scale-grown plane counts: planted near-dup twins are still found") {
    // The scale-aware granularity trades per-family collision probability
    // for bucket boundedness: a cos≈0.999 pair survives one family with
    // p^planes (p = 1 - θ/π ≈ 0.986), and the `families` OR-banding keeps
    // overall recall ≈ 1-(1-p^planes)^families ≈ 0.999 even at 9+ planes.
    // This pins it empirically: targetBucket=4 forces effPlanes ≈
    // ceil(log2(600/4)) = 8 ≫ the floor of 3, and every planted jittered
    // twin pair must still rank top-k by exact cosine.
    val base = (0 until 300).map(i => (i.toLong, fakeVec(i.toLong, 32)))
    // 20 planted twins: tiny deterministic jitter of vectors 0..19
    val twins = (0 until 20).map { i =>
      val v = fakeVec(i.toLong, 32)
      val j = v.zipWithIndex.map { case (x, k) =>
        x * (1.0 + 0.004 * (((i * 31 + k) % 7) - 3)) }
      (1000L + i, j)
    }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val top = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", k = 20,
        families = 4, planesPerFamily = 3, dim = 32, targetBucket = 4)
      .as[(Long, Long, Long, Double)].collect()
    val found = top.map(r => (r._2, r._3)).toSet
    val expected = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    assert(found == expected,
      s"grown-plane bucketing lost planted twins: missing ${expected -- found}")
    assert(top.forall(_._4 >= 0.999))
  }

  test("gate safety: default caps never fire below 4096 — capped ≡ uncapped on diverse data") {
    val emb = (0 until 200).map(i => (i.toLong, fakeVec(i.toLong, 16)))
      .toDF("vec_id", "embedding")
    val a = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", k = 15,
        families = 2, planesPerFamily = 3, dim = 16)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val b = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", k = 15,
        families = 2, planesPerFamily = 3, dim = 16, maxBucket = Int.MaxValue)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(a == b)

    val centroids = emb.filter($"vec_id" < 4).select($"vec_id".cast("int").as("cid"), $"embedding".as("cvec"))
    val c = Similarity.semanticDedup(emb, "vec_id", "embedding", centroids, threshold = 0.9)
      .as[(Long, Int, Long, Boolean)].collect().toSet
    val d = Similarity.semanticDedup(emb, "vec_id", "embedding", centroids, threshold = 0.9,
        maxCell = Int.MaxValue)
      .as[(Long, Int, Long, Boolean)].collect().toSet
    assert(c == d)
  }
}
