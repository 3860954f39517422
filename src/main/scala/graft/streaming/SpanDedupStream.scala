package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental cross-document duplicate-SPAN detection over a document
  * STREAM — the streaming half of [[graft.llm.Dedup.dedupSpans]]: as each
  * document arrives, its positional n-grams check a gram registry built
  * from everything seen so far; any position whose gram was first claimed
  * by an EARLIER document is flagged the moment the copy shows up, so an
  * ingestion pipeline can cut the span before the document lands.
  *
  * Input is the (docId, pos, gram) rows of
  * [[graft.llm.Decontaminate.positionalGrams]] — the SAME fused
  * ShingleHashes front-end as the batch aggregate, so streaming and batch
  * flag identical positions when documents arrive in id order
  * (StreamingParitySpec pins it). Canonical-copy semantics follow arrival:
  * the FIRST document to present a gram keeps it (ties inside one
  * micro-batch break by doc id, matching the batch min-id rule); a
  * later-arriving smaller id would be flagged instead — the same
  * first-copy-is-canonical convention [[DedupStream]] documents.
  *
  * Scale shape: state is keyed by the 60-bit gram hash and holds ONE long
  * (the claiming doc id) — no posting lists, no signatures. Unlike LSH
  * bucket rosters the registry grows with the corpus' distinct-gram
  * volume; that is the honest price of exact substring dedup run forever,
  * and the deployment levers are the state-store backend (RocksDB) and
  * restarting the registry per corpus epoch. `flagSameDocRepeats = false`
  * mirrors the batch rule that a gram repeated only WITHIN one document
  * is not a duplicate (that defect belongs to the repetition scorer).
  */
object SpanDedupStream {

  case class GramOcc(docId: Long, pos: Int, gram: Long)
  case class BadPos(docId: Long, pos: Int)
  case class GramState(keep: Long)

  /** Flag every (docId, pos) whose gram was already claimed by another
    * document.
    *
    * ARRIVAL-ORDER CONTRACT: the registry awards each gram to its FIRST
    * arrival (ties inside one micro-batch break by doc id). Only when
    * documents arrive in ascending doc-id order does this reproduce the
    * batch aggregate's min-id rule ([[graft.llm.Dedup.spanBadPositions]]
    * keeps the SMALLEST doc id). Under out-of-order arrival the result
    * is still a valid keep-one — exactly one copy of every duplicated
    * span survives unflagged — but the survivor is the earliest
    * ARRIVAL, not the minimum id, so positions flagged by streaming and
    * batch can differ (StreamingParitySpec pins both behaviors). Callers
    * needing batch-identical output under disorder should buffer to
    * id order per window before feeding the stream. */
  def badPositions(occ: Dataset[GramOcc]): Dataset[BadPos] = {
    val spark = occ.sparkSession
    import spark.implicits._
    occ.groupByKey(_.gram)
      .flatMapGroupsWithState[GramState, BadPos](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[GramOcc], gs: GroupState[GramState]) =>
          // deterministic intra-batch order: doc id, then position — the
          // smallest doc id in the first batch claims the gram, exactly
          // the batch aggregate's min-id rule under in-order arrival
          val sorted = it.toSeq.sortBy(o => (o.docId, o.pos))
          val out = Seq.newBuilder[BadPos]
          val hadClaim = gs.exists
          var keep = gs.getOption.map(_.keep)
          sorted.foreach { o =>
            keep match {
              case None => keep = Some(o.docId)
              case Some(k) if k != o.docId => out += BadPos(o.docId, o.pos)
              case _ => () // same doc re-presenting its own gram: not a dup
            }
          }
          // a claim never changes once set — skip the redundant state-store
          // write (one put per duplicated gram per batch otherwise)
          if (!hadClaim) keep.foreach(k => gs.update(GramState(k)))
          out.result().iterator
      }
  }
}
