package graft.tools

import graft.sources.UdfAgent
import graft.sources.UdfProto._

/** Runnable example agents built on [[graft.sources.UdfAgent]] — the
  * Scala analogs of the reference's `udf/agent/examples` (mirror,
  * moving_avg): real child processes the server-side runner spawns with
  * `java -cp <classpath> graft.tools.<Agent>`. They double as the
  * protocol's self-test: server half and agent half are independent code
  * paths meeting only on the wire (and both interoperate with the
  * spec's hand-rolled Python codec as a third implementation). */
object MirrorAgent {
  /** Echo every point back unchanged (examples/mirror). */
  def main(args: Array[String]): Unit =
    UdfAgent.run(new UdfAgent.Handler {
      def point(p: ProtoPoint, emit: ProtoPoint => Unit): Unit = emit(p)
    }, System.in, System.out)
}

object ScaleAgent {
  /** Multiply every double field by `.factor(f)` (init option or argv). */
  def main(args: Array[String]): Unit = {
    val argvFactor = args.headOption.map(_.toDouble)
    UdfAgent.run(new UdfAgent.Handler {
      private var factor = argvFactor.getOrElse(1.0)
      override def init(options: Seq[(String, Seq[OptVal])], taskId: String,
          nodeId: String): Either[String, Unit] = {
        options.collectFirst { case ("factor", Seq(OptDouble(f))) => f }
          .foreach(factor = _)
        Right(())
      }
      def point(p: ProtoPoint, emit: ProtoPoint => Unit): Unit =
        emit(p.copy(fieldsDouble = p.fieldsDouble.view.mapValues(_ * factor).toMap))
    }, System.in, System.out)
  }
}

object MovingAvgAgent {
  /** Per-(name, tags) moving average of `field` over a count window of
    * `size` — the reference's moving_avg example agent semantics: one
    * averaged point out per point in, averaging the last `size` values.
    * Options: .field('x') .size(n) .as('name') (init or argv). */
  def main(args: Array[String]): Unit = {
    UdfAgent.run(new UdfAgent.Handler {
      private var field = args.lift(0).getOrElse("value")
      private var size = args.lift(1).map(_.toInt).getOrElse(10)
      private var outAs = args.lift(2).getOrElse("avg")
      private val windows =
        scala.collection.mutable.Map.empty[(String, Map[String, String]), scala.collection.mutable.Queue[Double]]
      override def init(options: Seq[(String, Seq[OptVal])], taskId: String,
          nodeId: String): Either[String, Unit] = {
        options.foreach {
          case ("field", Seq(OptString(f))) => field = f
          case ("size", Seq(OptInt(n)))     => size = n.toInt
          case ("as", Seq(OptString(a)))    => outAs = a
          case (other, _) => return Left(s"unknown option $other")
        }
        if (size < 1) Left(s"size must be >= 1, got $size") else Right(())
      }
      def point(p: ProtoPoint, emit: ProtoPoint => Unit): Unit =
        p.fieldsDouble.get(field).foreach { v =>
          val q = windows.getOrElseUpdate((p.name, p.tags),
            scala.collection.mutable.Queue.empty[Double])
          q.enqueue(v)
          if (q.length > size) q.dequeue()
          emit(p.copy(fieldsDouble = Map(outAs -> q.sum / q.length)))
        }
    }, System.in, System.out)
  }
}
