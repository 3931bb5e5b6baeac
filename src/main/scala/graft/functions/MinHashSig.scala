package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a PER-ROW expression (r19 optimization, guide
  * §2.4 "remove shuffles outright"): the signature is a pure function of
  * one document's shingle set, so the explode + `minhash_agg` groupBy —
  * a full hash exchange of every shingle-bearing row, paid once per
  * consumer — is unnecessary. This kernel streams the gram hashes (same
  * single-pass tokenizer + running XXH64 as [[ShingleHashes]]) and folds
  * the `numHashes` running minima in place: one pass over the document
  * bytes, zero exchanges, zero aggregation buffers, and `doGenCode`
  * keeps it inside whole-stage codegen.
  *
  * Signature values are BIT-IDENTICAL to
  * `explode(shingle_hashes(text,k))` + `minhash_agg(h, n)` (asserted in
  * FunctionsSpec): the permutation coefficients are the shared
  * [[graft.dedup.Dedup.minhashCoeffs]], a minimum is indifferent to the
  * duplicate gram occurrences `shingle_hashes` dedups, and the <k-token
  * fallback (token hashes) matches. The aggregate form emits NO row for
  * a doc with no tokens; to reproduce that exactly without a filter that
  * Catalyst would re-evaluate below the projection, the result is an
  * ARRAY of 0 or 1 signatures — callers `explode` it, and empty-token
  * docs vanish through the Generate exactly as they vanished through the
  * old explode. SQL: `minhash_sig(text, k, numHashes)` →
  * array<array<bigint>>.
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** [[MinHashSig]] plus the EXACT distinct-shingle count — the pair
  * [[graft.dedup.Dedup.containmentSketchPairs]] aggregates in one pass
  * (signature + |set| feed Broder's containment estimate). Same 0/1-row
  * array contract. SQL: `minhash_sig_size(text, k, numHashes)` →
  * array<struct<sig: array<bigint>, nset: bigint>>.
  */
case class MinHashSigSize(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("nset", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_size requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinHashSig.computeWithSize(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.computeWithSize($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigSize =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig_size"
}

/** 64-bit SimHash as a PER-ROW expression — the [[SimHashAgg]] fold over
  * one document's token hashes (all occurrences, document order
  * irrelevant: the per-bit counts are a sum), same 0/1-row array
  * contract as [[MinHashSig]] so no-token docs vanish through the
  * caller's explode exactly as they vanished through the aggregate
  * form's. Bit-identical to explode(token_hashes) + `simhash_agg`
  * (FunctionsSpec). SQL: `simhash_sig(text)` → array<bigint>.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinHashSig.computeSimHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.computeSimHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object MinHashSig {

  // one coefficient table per signature width, shared across rows/tasks
  // (deterministic — Dedup.minhashCoeffs seeds from 42); flattened to
  // [a0, b0, a1, b1, ...] so the hot loop indexes one primitive array
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def coeffs(n: Int): Array[Long] =
    coeffCache.computeIfAbsent(n, k => {
      val cs = graft.dedup.Dedup.minhashCoeffs(k)
      val flat = new Array[Long](2 * k)
      var i = 0
      cs.foreach { case (a, b) => flat(2 * i) = a; flat(2 * i + 1) = b; i += 1 }
      flat
    })

  /** Fold one gram/token hash into the running minima. */
  private def fold(sig: Array[Long], cs: Array[Long], x: Long): Unit = {
    var i = 0
    val n = sig.length
    while (i < n) {
      val h = cs(2 * i) * x + cs(2 * i + 1) // wrapping, as in minhash_agg
      if (h < sig(i)) sig(i) = h
      i += 1
    }
  }

  /** The shared per-doc pass: token hashes, then either streamed k-gram
    * hashes (running XXH64, duplicates folded — min is duplicate-blind)
    * or the <k-token token-hash fallback. Returns null when the doc has
    * no tokens (the aggregate form emitted no row). When `grams` is
    * non-null every gram/token hash is also appended to it (for the
    * distinct count in [[computeWithSize]]).
    */
  private def sigOf(text: UTF8String, k: Int, numHashes: Int,
                    grams: java.util.ArrayList[java.lang.Long]): Array[Long] = {
    val toks = ShingleHashes.tokenHashArray(text)
    val nTokens = toks.length
    if (nTokens == 0) return null
    val cs = coeffs(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (nTokens >= k) {
      var g = 0
      while (g <= nTokens - k) {
        var h = ShingleHashes.Seed
        var j = 0
        while (j < k) {
          h = XXH64.hashLong(toks(g + j), h)
          j += 1
        }
        fold(sig, cs, h)
        if (grams != null) grams.add(h)
        g += 1
      }
    } else {
      var t = 0
      while (t < nTokens) {
        fold(sig, cs, toks(t))
        if (grams != null) grams.add(toks(t))
        t += 1
      }
    }
    sig
  }

  /** Kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val sig = sigOf(text, k, numHashes, null)
    if (sig == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(Array[Any](new GenericArrayData(sig)))
  }

  /** [[compute]] plus the exact distinct gram count (sort + unique scan —
    * no boxed set; matches `count(*)` over exploded `shingle_hashes`,
    * whose output is per-doc distinct). */
  def computeWithSize(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val grams = new java.util.ArrayList[java.lang.Long]()
    val sig = sigOf(text, k, numHashes, grams)
    if (sig == null) return new GenericArrayData(Array.empty[Any])
    val gs = new Array[Long](grams.size())
    var i = 0
    while (i < gs.length) { gs(i) = grams.get(i); i += 1 }
    java.util.Arrays.sort(gs)
    var nset = 0L
    i = 0
    while (i < gs.length) {
      if (i == 0 || gs(i) != gs(i - 1)) nset += 1L
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(sig), nset))
    new GenericArrayData(Array[Any](row))
  }

  /** Per-row SimHash fold — exactly [[SimHashAgg]]'s update + eval over
    * this doc's token hashes. */
  def computeSimHash(text: UTF8String): ArrayData = {
    val toks = ShingleHashes.tokenHashArray(text)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Long])
    val counts = new Array[Long](64)
    var t = 0
    while (t < toks.length) {
      val h = toks(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    new GenericArrayData(Array(sig))
  }
}
