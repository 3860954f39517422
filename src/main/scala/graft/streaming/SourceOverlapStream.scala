package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental cross-source duplicate-overlap counting over a document
  * STREAM — the streaming half of [[graft.llm.Report.sourceOverlap]]: as
  * each (text-hash, source) observation arrives, the hash's source
  * roster in the state store grows, and every NEW source joining a hash
  * emits one increment per source already on the roster. Summing the
  * increments per (srcA, srcB) — a plain downstream streaming aggregate
  * — reproduces the batch overlap matrix at any point in time
  * (StreamingParitySpec pins it).
  *
  * Scale shape: state is one bounded source set per distinct text hash
  * (the source count, not the corpus, bounds it — same keying as the
  * batch collect_set); re-observations of a (hash, source) pair emit
  * nothing and skip the state write.
  */
object SourceOverlapStream {

  case class HashObs(th: Long, source: String)
  /** One unit of overlap between an alphabetically ordered source pair. */
  case class PairInc(srcA: String, srcB: String)
  case class Roster(sources: Seq[String])

  def pairIncrements(obs: Dataset[HashObs]): Dataset[PairInc] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.th)
      .flatMapGroupsWithState[Roster, PairInc](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[HashObs], gs: GroupState[Roster]) =>
          var roster = gs.getOption.map(_.sources.toSet).getOrElse(Set.empty)
          val before = roster.size
          val out = Seq.newBuilder[PairInc]
          // deterministic intra-batch order so ties replay identically
          it.map(_.source).toSeq.distinct.sorted.foreach { src =>
            if (!roster.contains(src)) {
              roster.foreach { r =>
                val (a, b) = if (r < src) (r, src) else (src, r)
                out += PairInc(a, b)
              }
              roster += src
            }
          }
          if (roster.size != before)
            gs.update(Roster(roster.toSeq.sorted))
          out.result().iterator
      }
  }
}
