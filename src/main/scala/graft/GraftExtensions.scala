package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extensions entry point: registers graft's native expressions at
  * session build time, so a cluster user enables the whole library with
  *   spark.sql.extensions=graft.GraftExtensions
  * and gets `graft_dot` / `graft_minhash16` in SQL and Column-land on every
  * session, no per-session registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.expressions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash16"),
      new ExpressionInfo(classOf[graft.expressions.MinHashSig].getName, "graft_minhash16"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.MinHashSig(exprs.head, graft.llm.TextOps.minhashConsts(16))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[graft.expressions.ShingleHashes].getName, "graft_shingles3"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.ShingleHashes(exprs.head, 3, distinct = true)))
    ext.injectFunction((
      new FunctionIdentifier("graft_isect"),
      new ExpressionInfo(classOf[graft.expressions.IntersectCountSorted].getName, "graft_isect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.IntersectCountSorted(exprs(0), exprs(1))))
  }
}
