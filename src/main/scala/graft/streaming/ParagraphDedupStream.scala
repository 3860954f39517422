package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental cross-document PARAGRAPH dedup over a document STREAM —
  * the streaming half of [[graft.llm.Dedup.dedupParagraphs]]: as each
  * document's newline blocks arrive, a block registry built from
  * everything seen so far flags blocks whose trimmed text was first
  * claimed by an EARLIER document, so an ingestion pipeline can drop the
  * repeated boilerplate before the document lands. Blank blocks never
  * reach the registry (structure, not content — the batch rule).
  *
  * Shares [[graft.llm.Dedup.paragraphOccurrences]] with the batch
  * operator, so streaming and batch flag identical blocks when documents
  * arrive in id order. ARRIVAL-ORDER CONTRACT (the
  * [[SpanDedupStream.badPositions]] convention): the first document to
  * present a block keeps it — and keeps ALL its copies, intra-document
  * repeats included; ties inside one micro-batch break by doc id,
  * reproducing the batch min-id rule under in-order arrival. Out of
  * order, the survivor is the earliest arrival: still a valid keep-one.
  *
  * Scale shape: state is one long per distinct block hash — no posting
  * lists; the registry grows with the corpus' distinct-block volume
  * (same honest price and levers as the span-gram registry).
  */
object ParagraphDedupStream {

  case class ParaOcc(docId: Long, pIdx: Int, ph: String)
  case class BadPara(docId: Long, pIdx: Int)
  case class ParaState(keep: Long)

  /** Flag every (docId, pIdx) whose block was already claimed by another
    * document. */
  def badParagraphs(occ: Dataset[ParaOcc]): Dataset[BadPara] = {
    val spark = occ.sparkSession
    import spark.implicits._
    occ.groupByKey(_.ph)
      .flatMapGroupsWithState[ParaState, BadPara](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[ParaOcc], gs: GroupState[ParaState]) =>
          val sorted = it.toSeq.sortBy(o => (o.docId, o.pIdx))
          val out = Seq.newBuilder[BadPara]
          val hadClaim = gs.exists
          var keep = gs.getOption.map(_.keep)
          sorted.foreach { o =>
            keep match {
              case None => keep = Some(o.docId)
              case Some(k) if k != o.docId => out += BadPara(o.docId, o.pIdx)
              case _ => () // the keeper's own repeats all survive
            }
          }
          if (!hadClaim) keep.foreach(k => gs.update(ParaState(k)))
          out.result().iterator
      }
  }
}
