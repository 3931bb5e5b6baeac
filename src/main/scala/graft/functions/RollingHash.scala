package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes → 64-bit fingerprint.
  *
  * Native Catalyst expression (not a Scala UDF) so it participates in
  * whole-stage codegen: `doGenCode` emits a direct static call, keeping the
  * document-fingerprint pipeline (SURVEY.md §2.9 / LLM text ops) inside one
  * codegen stage at 100 TB scan scale. Registered as SQL `rolling_hash` via
  * [[graft.GraftExtensions]].
  *
  * Capability modeled on the reference's per-record hashing lambdas
  * (reference: src/main/scala/com/github/hosnimed/WordCountProcessorExample.scala:41-51
  * computes per-record state keys); the polynomial form itself is the
  * textbook Rabin-Karp construction.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** 64-bit polynomial hash: h = h*31 + byte, seeded with a large prime. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31L * h + (bytes(i) & 0xff)
      i += 1
    }
    h
  }
}
