package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection over a DOCUMENT STREAM — MinHash
  * LSH run continuously: as each document arrives, it pairs against the
  * signatures already seen in its LSH bucket, so an ingestion pipeline
  * flags a near-dup the moment the second copy shows up (no batch recompute
  * over the corpus).
  *
  * Input is the (doc_id, sig, band, bh) rows of
  * [[graft.llm.Dedup.signatureBands]] — the SAME signature front-end as the
  * batch self-join, so streaming and batch report identical pairs
  * (StreamingParitySpec pins it).
  *
  * Scale shape: state is keyed by (band, bucket-hash) and holds only that
  * bucket's signature roster — LSH buckets are small by construction (the
  * whole premise of banding), and `maxBucketDocs` hard-caps a degenerate
  * bucket (e.g. the empty-text bucket) so state cannot grow unboundedly;
  * overflow keeps the earliest docs, matching "first copy is canonical".
  * Each pair is emitted once per colliding band — consumers dedupe
  * cross-band repeats exactly like the batch path's `.distinct()`.
  */
object DedupStream {

  case class BandedSig(docId: Long, band: Int, bh: String, sig: Seq[Long])
  case class CandPair(idA: Long, idB: Long, estJaccard: Double)
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** @param overflow incremented once per document NOT added to a capped
    *   bucket roster — after overflow two NEW near-duplicates that both
    *   arrive late can no longer pair with each other, so parity with the
    *   batch self-join silently narrows; this counter (named in the Spark
    *   UI as `graft.dedup.bucketOverflow` when defaulted) makes that loss
    *   observable instead of silent. */
  def nearDupPairs(
      points: Dataset[BandedSig],
      k: Int,
      threshold: Double,
      maxBucketDocs: Int = 1024,
      overflow: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[CandPair] = {
    val spark = points.sparkSession
    import spark.implicits._
    val overflowAcc = overflow.getOrElse(
      spark.sparkContext.longAccumulator("graft.dedup.bucketOverflow"))
    points.groupByKey(p => (p.band, p.bh))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), it: Iterator[BandedSig], gs: GroupState[BucketState]) =>
          var st = gs.getOption.getOrElse(BucketState(Vector.empty, Vector.empty))
          val out = Seq.newBuilder[CandPair]
          // arrival order within the micro-batch: doc id (deterministic)
          it.toSeq.sortBy(_.docId).foreach { p =>
            require(p.sig.length == k,
              s"signature length ${p.sig.length} != k=$k — signatureBands and nearDupPairs must agree on k")
            if (!st.ids.contains(p.docId)) {
              var i = 0
              while (i < st.ids.length) {
                val sig = st.sigs(i)
                var agree = 0
                var j = 0
                while (j < k) { if (sig(j) == p.sig(j)) agree += 1; j += 1 }
                // HALF_UP like Spark's round(), so streamed estimates are
                // byte-identical to the batch self-join's
                val est = BigDecimal(agree.toDouble / k)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (est >= threshold) {
                  val (lo, hi) =
                    if (st.ids(i) < p.docId) (st.ids(i), p.docId) else (p.docId, st.ids(i))
                  out += CandPair(lo, hi, est)
                }
                i += 1
              }
              if (st.ids.length < maxBucketDocs)
                st = BucketState(st.ids :+ p.docId, st.sigs :+ p.sig)
              else overflowAcc.add(1L)
            }
          }
          gs.update(st)
          out.result().iterator
      }
  }
}
