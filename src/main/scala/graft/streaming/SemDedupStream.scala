package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental SEMANTIC dedup over an embedding stream — SemDeDup run
  * continuously: vectors are assigned to their nearest centroid upstream
  * (graft.llm.Similarity.assignToCenters — a shuffle-free literal fold
  * that runs unchanged on a streaming frame), and each arriving vector
  * compares against its cluster's roster, so an ingestion pipeline flags
  * a semantic duplicate the moment the second copy lands.
  *
  * Scale shape: state is keyed by cid and holds that cluster's
  * (id, vector) roster. SemDeDup's premise is k chosen so clusters stay
  * ~10³ vectors; `maxClusterDocs` hard-caps a degenerate cluster, and the
  * overflow accumulator makes any parity loss observable instead of
  * silent (same contract as DedupStream.nearDupPairs).
  *
  * Parity: for vectors arriving in id order the verdicts are exactly the
  * batch operator's (vec_id, cid, dup_of, is_dup) rows —
  * StreamingParitySpec pins it. Out-of-order arrival keeps the
  * first-copy-canonical rule on arrival order instead of id order, the
  * standard streaming relaxation.
  */
object SemDedupStream {

  case class AssignedVec(vecId: Long, cid: Int, v: Seq[Double], nrm: Double)

  /** `overflow = true` marks a verdict computed against a roster that had
    * already hit `maxClusterDocs`: "not a duplicate" then means "not a
    * duplicate OF THE FROZEN ROSTER" — post-cap near-identical arrivals
    * cannot pair with each other. Downstream consumers can distinguish
    * verified-unique from roster-was-full without watching the
    * accumulator. */
  case class DedupVerdict(vecId: Long, cid: Int, dupOf: Long, isDup: Boolean,
      overflow: Boolean)
  case class ClusterState(ids: Seq[Long], vecs: Seq[Seq[Double]], nrms: Seq[Double])

  def verdicts(
      points: Dataset[AssignedVec],
      threshold: Double,
      prec: Int = 6,
      maxClusterDocs: Int = 4096,
      overflow: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[DedupVerdict] = {
    val spark = points.sparkSession
    import spark.implicits._
    val overflowAcc = overflow.getOrElse(
      spark.sparkContext.longAccumulator("graft.semdedup.clusterOverflow"))
    points.groupByKey(_.cid)
      .flatMapGroupsWithState[ClusterState, DedupVerdict](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cid: Int, it: Iterator[AssignedVec], gs: GroupState[ClusterState]) =>
          var st = gs.getOption.getOrElse(ClusterState(Vector.empty, Vector.empty, Vector.empty))
          val out = Seq.newBuilder[DedupVerdict]
          // arrival order within the micro-batch: vec id (deterministic)
          it.toSeq.sortBy(_.vecId).foreach { p =>
            if (!st.ids.contains(p.vecId)) {
              var dupOf = Long.MaxValue
              var i = 0
              while (i < st.ids.length) {
                // batch compares a.vid < b.vid only: earlier ids judge later
                if (st.ids(i) < p.vecId) {
                  val w = st.vecs(i)
                  var dot = 0.0
                  var j = 0
                  val n = math.min(w.length, p.v.length)
                  while (j < n) { dot += w(j) * p.v(j); j += 1 }
                  // HALF_UP like Spark's round(), so streamed cosines hit
                  // the same threshold boundary as the batch equi-join's
                  val cos = BigDecimal(dot / (st.nrms(i) * p.nrm))
                    .setScale(prec, BigDecimal.RoundingMode.HALF_UP).toDouble
                  if (cos >= threshold && st.ids(i) < dupOf) dupOf = st.ids(i)
                }
                i += 1
              }
              val full = st.ids.length >= maxClusterDocs
              out += DedupVerdict(p.vecId, cid,
                if (dupOf == Long.MaxValue) p.vecId else dupOf,
                dupOf != Long.MaxValue, full)
              // duplicates join the roster too: in batch, a dup is still a
              // valid dup_of target for later, higher-id arrivals
              if (!full)
                st = ClusterState(st.ids :+ p.vecId, st.vecs :+ p.v, st.nrms :+ p.nrm)
              else overflowAcc.add(1L)
            }
          }
          gs.update(st)
          out.result().iterator
      }
  }
}
