package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text quality statistics: struct(n_tokens, n_subwords,
  * punct_ratio, stopword_ratio, mean_token_len, quality_ok) in ONE scan
  * over the document bytes — the [[TextFunctions]] quality surface
  * without its five separate regex/HOF expression chains (each of which
  * re-tokenizes the document; HOF chains get no common-subexpression
  * elimination).
  *
  * Byte-level semantics mirror the Column forms exactly for any text
  * whose tokens are ASCII (Java regex `\w`/`\s` are ASCII classes, so
  * word runs ARE ASCII; the one divergence is exotic non-ASCII
  * lowercasings like U+0130 that produce new ASCII letters — absent from
  * the corpus, and the FunctionsSpec equality test is the witness):
  * codepoints counted as non-continuation bytes, whitespace-token runs,
  * `\w` word runs, punctuation as the remaining codepoints, stopword hits
  * byte-compared case-folded. Ratios round HALF_UP at 4dp exactly like
  * `round(col, 4)`; `quality_ok` applies the same thresholds to the same
  * rounded values as [[TextFunctions.qualityOk]].
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false),
    StructField("quality_ok", BooleanType, nullable = false)))

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    def byteAt(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, off + i)

    var nChars = 0
    var wsTokens = 0     // whitespace-delimited tokens (\S+ runs)
    var punct = 0        // codepoints that are neither \w nor \s
    var nToks = 0        // \w+ word runs (the tokens() tokenization)
    var sumTokLen = 0L
    var stopHits = 0

    var inNonWs = false
    var wordStart = -1
    var i = 0
    while (i < n) {
      val b = byteAt(i)
      val cont = (b & 0xC0) == 0x80 // UTF-8 continuation byte: same codepoint
      val ws = isWsByte(b)
      val word = isWordByte(b)
      if (!cont) {
        nChars += 1
        if (!ws && !word) punct += 1 // non-ASCII lead bytes land here (non-word, non-space)
      }
      if (!ws && !inNonWs) { wsTokens += 1; inNonWs = true }
      else if (ws) inNonWs = false
      if (word && wordStart < 0) wordStart = i
      else if (!word && wordStart >= 0) {
        endToken(base, off, wordStart, i) match {
          case (len, stop) => nToks += 1; sumTokLen += len; if (stop) stopHits += 1
        }
        wordStart = -1
      }
      i += 1
    }
    if (wordStart >= 0) {
      val (len, stop) = endToken(base, off, wordStart, n)
      nToks += 1; sumTokLen += len; if (stop) stopHits += 1
    }

    val punctRatio = round4(punct.toDouble / math.max(nChars, 1).toDouble)
    val stopRatio = round4(stopHits.toDouble / math.max(nToks, 1).toDouble)
    val meanLen = round4(sumTokLen.toDouble / math.max(nToks, 1).toDouble)
    val qualityOk = nChars >= 20 && wsTokens >= 5 && punctRatio < 0.3 &&
      meanLen >= 2.0 && meanLen <= 12.0
    new GenericInternalRow(Array[Any](
      wsTokens, nToks + punct, punctRatio, stopRatio, meanLen, qualityOk))
  }

  /** (token char length, is-stopword) for the word run [start, end). Word
    * runs are pure ASCII, so char length == byte length and case folding
    * is `| 0x20`.
    */
  private def endToken(base: AnyRef, off: Long, start: Int, end: Int): (Int, Boolean) = {
    val len = end - start
    def lc(i: Int): Int = {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + start + i) & 0xFF
      if (b >= 'A' && b <= 'Z') b | 0x20 else b
    }
    // TextFunctions.stopwords: the a an and or of to in is
    val stop = len match {
      case 1 => lc(0) == 'a'
      case 2 =>
        val c0 = lc(0); val c1 = lc(1)
        (c0 == 'a' && c1 == 'n') || (c0 == 'o' && c1 == 'r') || (c0 == 'o' && c1 == 'f') ||
          (c0 == 't' && c1 == 'o') || (c0 == 'i' && c1 == 'n') || (c0 == 'i' && c1 == 's')
      case 3 =>
        val c0 = lc(0); val c1 = lc(1); val c2 = lc(2)
        (c0 == 't' && c1 == 'h' && c2 == 'e') || (c0 == 'a' && c1 == 'n' && c2 == 'd')
      case _ => false
    }
    (len, stop)
  }

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
}
