package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized invariants for the span/paragraph dedup family and the
  * terminal mixing steps — the class of bug the example-based LlmSpec
  * cases cannot catch: results must depend only on the corpus as a SET
  * (partitioning- and row-order-invariance), and the positional operators
  * must agree with a direct serial re-derivation of their contracts on
  * arbitrary corpora (small vocabulary so cross-document collisions are
  * dense).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._
  import graft.llm.{Dedup, Mix}

  private val rnd = new scala.util.Random(20260815L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu")

  /** Random corpus: 8-20 docs, 1-4 newline blocks of 2-14 tokens each,
    * some blocks copied verbatim from earlier docs so paragraph/span
    * duplication genuinely occurs. */
  private def randCorpus(): Seq[(Long, String)] = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    (1L to (8 + rnd.nextInt(13)).toLong).map { id =>
      val nb = 1 + rnd.nextInt(4)
      val doc = (0 until nb).map { _ =>
        if (blocks.nonEmpty && rnd.nextDouble() < 0.35) blocks(rnd.nextInt(blocks.length))
        else {
          val b = (0 until (2 + rnd.nextInt(13)))
            .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
          blocks += b
          b
        }
      }.mkString("\n")
      (id, doc)
    }
  }

  private def shuffledDf(corpus: Seq[(Long, String)], k: Int): DataFrame =
    rnd.shuffle(corpus).toDF("doc_id", "text").repartition(k)

  test("dedupParagraphs: partition/order invariance + serial re-derivation") {
    for (_ <- 0 until 6) {
      val corpus = randCorpus()
      // serial contract: a non-blank trimmed block is kept only by the
      // smallest doc that contains it (intra-doc repeats of the keeper
      // all survive); blank blocks always survive
      val claim = scala.collection.mutable.Map.empty[String, Long]
      corpus.foreach { case (id, t) =>
        t.split("\n", -1).foreach { b =>
          val tr = b.trim
          if (tr.nonEmpty && !claim.contains(tr)) claim(tr) = id
        }
      }
      val expected = corpus.map { case (id, t) =>
        val blocks = t.split("\n", -1)
        val kept = blocks.filter(b => b.trim.isEmpty || claim(b.trim) == id)
        (id, kept.mkString("\n"), blocks.length.toLong,
          (blocks.length - kept.length).toLong)
      }.toSet
      val outs = Seq(1 + rnd.nextInt(7), 1 + rnd.nextInt(7)).map { k =>
        Dedup.dedupParagraphs(shuffledDf(corpus, k), "doc_id", "text")
          .select($"doc_id", $"text", $"n_paras", $"n_removed")
          .as[(Long, String, Long, Long)].collect().toSet
      }
      assert(outs.head === outs.last) // partitioning/row order irrelevant
      assert(outs.head === expected)
    }
  }

  test("spanBadPositions + dedupSpans: invariance + serial re-derivation") {
    for (_ <- 0 until 6) {
      val corpus = randCorpus()
      val n = 2 + rnd.nextInt(3) // gram size 2-4
      def toks(t: String): Array[String] =
        t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      // serial contract: gram (n consecutive tokens) flagged at every
      // position in any doc other than the smallest doc containing it
      val bounds = scala.collection.mutable.Map.empty[String, (Long, Long)]
      corpus.foreach { case (id, t) =>
        toks(t).sliding(n).filter(_.length == n).foreach { g =>
          val k = g.mkString(" ")
          val (mn, mx) = bounds.getOrElse(k, (id, id))
          bounds(k) = (mn min id, mx max id)
        }
      }
      val expectedBad = corpus.flatMap { case (id, t) =>
        toks(t).sliding(n).zipWithIndex.collect {
          case (g, i) if g.length == n && {
            val (mn, mx) = bounds(g.mkString(" ")); mn != mx && id != mn
          } => (id, i + 1) // 1-based gram starts
        }
      }.toSet
      val badOuts = Seq(1 + rnd.nextInt(7), 1 + rnd.nextInt(7)).map { k =>
        Dedup.spanBadPositions(shuffledDf(corpus, k), "doc_id", "text", n)
          .select($"doc_id", explode($"badPos").as("p"))
          .as[(Long, Int)].collect().toSet
      }
      assert(badOuts.head === badOuts.last)
      assert(badOuts.head === expectedBad)
      // dedupSpans fragments: invariant, and per doc the fragments
      // concatenate to exactly the un-cut token runs in document order
      val fragOuts = Seq(1 + rnd.nextInt(7), 1 + rnd.nextInt(7)).map { k =>
        Dedup.dedupSpans(shuffledDf(corpus, k), "doc_id", "text", n = n)
          .select($"doc_id", $"frag_idx", $"frag_text", $"n_tok")
          .as[(Long, Long, String, Long)].collect().toSet
      }
      assert(fragOuts.head === fragOuts.last)
      val gotRejoined = fragOuts.head.groupBy(_._1).map { case (id, fs) =>
        id -> fs.toSeq.sortBy(_._2).map(_._3).mkString(" ")
      }
      val expRejoined = corpus.flatMap { case (id, t) =>
        val ts = toks(t)
        val cut = expectedBad.collect { case (d, p) if d == id =>
          (p to (p + n - 1)) }.flatten
        val kept = ts.zipWithIndex.collect {
          case (w, i) if !cut.contains(i + 1) => w }
        if (kept.isEmpty) None else Some(id -> kept.mkString(" "))
      }.toMap
      assert(gotRejoined === expRejoined)
      // dup-ratio: invariant arithmetic over the same gram bounds
      val ratios = Dedup.spanDupRatio(shuffledDf(corpus, 3), "doc_id", "text", n)
        .select($"doc_id", $"n_grams", $"n_dup_grams")
        .as[(Long, Long, Long)].collect()
      ratios.foreach { case (id, ng, nd) =>
        val ts = toks(corpus.find(_._1 == id).get._2)
        assert(ng === math.max(ts.length - n + 1, 0).toLong)
        val expDup = ts.sliding(n).count(g => g.length == n && {
          val (mn, mx) = bounds(g.mkString(" ")); mn != mx
        })
        assert(nd === expDup.toLong && nd <= ng)
      }
    }
  }

  test("exact + minhashLsh: partition/order invariance on random corpora") {
    for (_ <- 0 until 4) {
      val corpus = randCorpus()
      val exactOuts = Seq(1 + rnd.nextInt(7), 1 + rnd.nextInt(7)).map { k =>
        Dedup.exact(shuffledDf(corpus, k), "doc_id", "text")
          .select($"doc_id", $"dup_of", $"is_dup")
          .as[(Long, Long, Boolean)].collect().toSet
      }
      assert(exactOuts.head === exactOuts.last)
      // serial contract: dup_of = the smallest doc with identical text
      val firstByText = corpus.groupBy(_._2).map { case (t, ds) => t -> ds.map(_._1).min }
      val expected = corpus.map { case (id, t) =>
        (id, firstByText(t), id != firstByText(t)) }.toSet
      assert(exactOuts.head === expected)
      val lshOuts = Seq(1 + rnd.nextInt(7), 1 + rnd.nextInt(7)).map { k =>
        Dedup.minhashLsh(shuffledDf(corpus, k), "doc_id", "text")
          .select($"id_a", $"id_b", $"est_jaccard")
          .as[(Long, Long, Double)].collect().toSet
      }
      assert(lshOuts.head === lshOuts.last)
      // every emitted pair is ordered and self-pair-free; exact dups
      // (identical text ⇒ identical signature) must always surface
      lshOuts.head.foreach { case (a, b, est) =>
        assert(a < b && est >= 0.5 && est <= 1.0)
      }
      val exactPairs = corpus.groupBy(_._2).values.filter(_.size > 1)
        .flatMap(ds => ds.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      exactPairs.foreach { p =>
        assert(lshOuts.head.exists(r => (r._1, r._2) == p && r._3 == 1.0),
          s"exact twin pair $p missing from LSH output")
      }
    }
  }

  test("assignSplit: total, exclusive, deterministic, proportion-bounded") {
    val n = 4000
    val ids = (1L to n.toLong).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Mix.assignSplit(ids.repartition(7), "doc_id", splits)
      .as[(Long, String)].collect().toMap
    val b = Mix.assignSplit(ids.repartition(2), "doc_id", splits)
      .as[(Long, String)].collect().toMap
    assert(a === b)                       // per-row hash: partition-invariant
    assert(a.size === n)                  // total and exclusive by construction
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    // md5 myriad buckets: binomial(n, f) — 4σ bounds (σ = sqrt(n·f·(1−f)))
    splits.foreach { case (name, f) =>
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(counts(name) - n * f) <= 4 * sigma,
        s"$name: ${counts(name)} vs expected ${n * f}")
    }
    // a different seed reassigns (the shuffle is real), same proportions
    val c = Mix.assignSplit(ids, "doc_id", splits, seed = "other")
      .as[(Long, String)].collect().toMap
    assert(c !== a)
  }

  test("shuffleShards: uniform shards, dense per-shard positions, invariant") {
    val n = 3000
    val shards = 7
    val ids = (1L to n.toLong).toDF("doc_id")
    val out = Mix.shuffleShards(ids.repartition(5), "doc_id", shards)
      .select($"doc_id", $"shard", $"shard_pos")
      .as[(Long, Int, Long)].collect()
    assert(out.length === n)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until shards).toSet))
    // density: positions are exactly 0..count-1 within every shard
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length.toLong))
    }
    // uniformity: 4σ around n/shards
    val sigma = math.sqrt(n * (1.0 / shards) * (1 - 1.0 / shards))
    byShard.foreach { case (s, rows) =>
      assert(math.abs(rows.length - n.toDouble / shards) <= 4 * sigma, s"shard $s")
    }
    // repartitioning must not move a single row or rank
    val out2 = Mix.shuffleShards(ids.repartition(11), "doc_id", shards)
      .select($"doc_id", $"shard", $"shard_pos")
      .as[(Long, Int, Long)].collect()
    assert(out2.toSet === out.toSet)
  }
}
