package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trie-compiled BPE apply — the production-size replacement for the
  * literal replace-chain in [[Bpe]] (VERDICT r10 #2): apply cost is
  * O(doc length + matches), FLAT in the merge count, where the chain is
  * O(nMerges × doc length) — the difference between a 64-merge demo and
  * a 32k-merge production tokenizer.
  *
  * How it stays bit-equal to the replace chain (the semantics the DuckDB
  * oracle replays) WITHOUT scanning per merge: the wrapped form's merge
  * `replace("<a><b>" → "<ab>")` can only fire where the concatenation
  * `a+b` occurs as a contiguous run of word chars — and merging never
  * changes the underlying character sequence, only the segmentation. So
  * an Aho–Corasick automaton over the merge concatenations, run ONCE per
  * word, yields the complete set of merges that could possibly apply;
  * every other merge is a provable no-op for that word. The kernel then
  * applies just those candidates in merge-list order, each left-to-right
  * non-overlapping over the segmentation — exactly the chain's schedule
  * with the no-ops skipped. This makes NO assumption about the merge
  * list (no reliance on the training invariant), so it is chain-equal
  * for any frozen model; FunctionsSpec pins kernel == chain on the real
  * corpus and BpeProbe measures the flat-vs-linear curve.
  *
  * Tokenization matches the wrapped form byte-for-byte: `lower(text)`
  * via `UTF8String.toLowerCase` (the same call Spark's `lower` makes),
  * then maximal runs of Java-regex `\w` = ASCII `[0-9A-Za-z_]` — every
  * non-word byte (all multi-byte UTF-8 units included) is a separator,
  * exactly what `\W+ → '#'` does. Merge strings are word-char-only by
  * construction, so patterns can never cross a separator.
  */
case class BpeSubwordCount(child: Expression,
    bc: Broadcast[Array[(String, String)]]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_subword_count requires a string argument, got ${child.dataType.catalogString}")

  // built once per deserialized instance (≈ once per executor core-batch);
  // lazy val init is synchronized, compute() itself is allocation-local
  // and thread-safe
  @transient private lazy val auto = new BpeAutomaton(bc.value)

  def compute(text: UTF8String): Long = {
    val bytes = text.toLowerCase.getBytes
    var total = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (!BpeAutomaton.isWordByte(bytes(i))) i += 1
      else {
        var j = i
        while (j < n && BpeAutomaton.isWordByte(bytes(j))) j += 1
        total += auto.countWord(bytes, i, j)
        i = j
      }
    }
    total
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this, classOf[BpeSubwordCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSubwordCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_subword_count"
}

/** Aho–Corasick automaton over the merge concatenations plus the
  * boundary-array merge applier. Patterns are ASCII word chars only
  * (the corpus guard [[Bpe]] documents), so the goto alphabet is 128.
  */
private[functions] final class BpeAutomaton(merges: Array[(String, String)]) {

  private val nPat = merges.length
  private val aBytes: Array[Array[Byte]] =
    merges.map(_._1.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private val bBytes: Array[Array[Byte]] =
    merges.map(_._2.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  // trie build: children(-1 = missing) → goto automaton via BFS fail links
  private val (gotoArr, outArr): (Array[Array[Int]], Array[Array[Int]]) = {
    val children = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.fill(128)(-1))
    val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    var p = 0
    while (p < nPat) {
      var node = 0
      for (arr <- Seq(aBytes(p), bBytes(p)); ch <- arr) {
        val c = ch & 0x7f
        if (children(node)(c) < 0) {
          children += Array.fill(128)(-1)
          out += Nil
          children(node)(c) = children.length - 1
        }
        node = children(node)(c)
      }
      out(node) = p :: out(node)
      p += 1
    }
    val fail = new Array[Int](children.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 128) {
      val v = children(0)(c)
      if (v < 0) children(0)(c) = 0
      else { fail(v) = 0; queue.enqueue(v) }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      var c = 0
      while (c < 128) {
        val v = children(u)(c)
        if (v < 0) children(u)(c) = children(fail(u))(c)
        else {
          fail(v) = children(fail(u))(c)
          out(v) = out(v) ::: out(fail(v))
          queue.enqueue(v)
        }
        c += 1
      }
    }
    (children.toArray, out.map(_.toArray).toArray)
  }

  /** Subword count of one word (`bytes[start, end)`) under the frozen
    * merges: AC scan collects candidate merge ids, candidates apply in
    * merge-list order, each left-to-right non-overlapping.
    */
  def countWord(bytes: Array[Byte], start: Int, end: Int): Int = {
    val len = end - start
    if (nPat == 0) return len
    // candidate collection (dedup via sort; counts are tiny per word)
    var cands: Array[Int] = null
    var nc = 0
    var state = 0
    var i = start
    while (i < end) {
      state = gotoArr(state)(bytes(i) & 0x7f)
      val hits = outArr(state)
      var k = 0
      while (k < hits.length) {
        if (cands == null) cands = new Array[Int](8)
        else if (nc == cands.length) cands = java.util.Arrays.copyOf(cands, nc * 2)
        cands(nc) = hits(k)
        nc += 1
        k += 1
      }
      i += 1
    }
    if (nc == 0) return len
    java.util.Arrays.sort(cands, 0, nc)

    // boundary array: bound(k) = a segment starts at word offset k
    val bound = new Array[Boolean](len + 1)
    java.util.Arrays.fill(bound, true)
    var ci = 0
    var prev = -1
    while (ci < nc) {
      val m = cands(ci)
      if (m != prev) {
        prev = m
        val a = aBytes(m); val b = bBytes(m)
        val la = a.length; val lb = b.length
        var i = 0
        while (i + la + lb <= len) {
          if (bound(i) && bound(i + la) && bound(i + la + lb) &&
              segmentIs(bytes, start, bound, i, a) &&
              segmentIs(bytes, start, bound, i + la, b)) {
            bound(i + la) = false
            i += la + lb // replace() resumes after the matched region
          } else i += 1
        }
      }
      ci += 1
    }
    var cnt = 0
    var k = 0
    while (k < len) { if (bound(k)) cnt += 1; k += 1 }
    cnt
  }

  /** The segment starting at word offset `off` is exactly `pat`: bytes
    * match and no internal boundary splits it. (Callers check the end
    * boundary.)
    */
  private def segmentIs(bytes: Array[Byte], start: Int, bound: Array[Boolean],
                        off: Int, pat: Array[Byte]): Boolean = {
    var j = 0
    while (j < pat.length) {
      if (bytes(start + off + j) != pat(j)) return false
      if (j > 0 && bound(off + j)) return false
      j += 1
    }
    true
  }
}

private[functions] object BpeAutomaton {
  /** Java-regex `\w` (default flags): ASCII `[0-9A-Za-z_]`. Signed-byte
    * comparison rejects every multi-byte UTF-8 unit (all ≥ 0x80).
    */
  def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      (b >= 'A' && b <= 'Z') || b == '_'
}
