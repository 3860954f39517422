package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The repo-wide tokenizer as ONE native expression — the exact value of
  *
  *   filter(split(lower(trim(text)), "\\s+"), t -> t <> "")
  *
  * Bit-parity is BY CONSTRUCTION, not by re-implementation: each step
  * calls the very UTF8String method the staged builtin evaluates —
  * StringTrim → `UTF8String.trim()` (0x20 only), Lower →
  * `UTF8String.toLowerCase()`, StringSplit → `UTF8String.split(re, -1)`
  * (java regex, trailing empties kept) — then drops empty tokens like the
  * ArrayFilter predicate (NativeExprParitySpec pins it on ASCII, unicode,
  * and whitespace-edge inputs).
  *
  * Why it exists (r22, guide §4): the staged chain's ArrayFilter is a
  * higher-order function — CodegenFallback — so EVERY Project that
  * tokenizes (perplexity scoring, packing counts, span reassembly,
  * chunking) fell out of WholeStageCodegen and paid an interpreted lambda
  * per token on the corpus-volume pass. One expression node also gives
  * subexpression elimination a single tree to deduplicate.
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft tokens expects string, got $t")
  }

  // the exact pattern functions.split compiles (StringSplit regex child)
  @transient private lazy val ws = UTF8String.fromString("\\s+")

  override def nullSafeEval(input: Any): Any =
    evalText(input.asInstanceOf[UTF8String])

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalText(input: UTF8String): ArrayData = {
    val parts = input.trim().toLowerCase().split(ws, -1)
    var keep = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) keep += 1
      i += 1
    }
    if (keep == parts.length) return new GenericArrayData(parts.asInstanceOf[Array[Any]])
    val out = new Array[Any](keep)
    var w = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { out(w) = parts(i); w += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Generates a real codegen call (r22): CodegenFallback disqualifies the
    * enclosing Project from WholeStageCodegen, splitting the fused span at
    * this expression; the generated code delegates to the same JVM eval
    * through a reference object, keeping the span intact. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokens", this, classOf[Tokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalText($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
