package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * corpus-prep step EVERY multilingual text pipeline runs before
  * tokenization/dedup (the same logical string arrives as either a
  * precomposed code point or a base + combining-mark sequence; without
  * canonical composition, "café" hashes two ways and dedup/exact-match
  * silently misses). Spark ships no builtin for this, so the kernel
  * wraps `java.text.Normalizer` (Unicode TR-15 NFC, a public spec both
  * the JDK and DuckDB's `nfc_normalize` implement — which is what makes
  * the result cross-engine certifiable).
  *
  * Scale shape: per-row scan-local projection; the `isNormalized` fast
  * path makes the dominant case (already-NFC ASCII web text) a single
  * quick-check pass with NO reallocation, so the kernel adds ~nothing
  * to a scan over clean corpora and pays only on rows that actually
  * carry decomposed sequences.
  *
  * No extension-free Column fallback exists (Spark has no normalization
  * primitive to compose from); the equality witness in FunctionsSpec
  * calls the JVM normalizer directly on the corpus instead.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Kernel shared by interpreted eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
