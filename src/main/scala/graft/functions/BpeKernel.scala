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

  // shared per executor via the identity-keyed cache (r12): a
  // production-size 32k-merge trie is ~10^2 MB — one per deserialized
  // instance would multiply that by the task slots; the broadcast value
  // is one array instance per executor, so identity keying shares one
  // automaton across every task and both kernel forms
  @transient private lazy val auto = BpeAutomaton.forMerges(bc.value)

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

  /** Boundary array of one word (`bytes[start, end)`) under the frozen
    * merges, or null when every char stays its own segment (no merges,
    * or no candidate matched): AC scan collects candidate merge ids,
    * candidates apply in merge-list order, each left-to-right
    * non-overlapping. bound(k) = a segment starts at word offset k.
    */
  private def boundArray(bytes: Array[Byte], start: Int, end: Int): Array[Boolean] = {
    val len = end - start
    if (nPat == 0) return null
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
    if (nc == 0) return null
    java.util.Arrays.sort(cands, 0, nc)

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
    bound
  }

  /** Subword count of one word — segment count from [[boundArray]]. */
  def countWord(bytes: Array[Byte], start: Int, end: Int): Int = {
    val len = end - start
    val bound = boundArray(bytes, start, end)
    if (bound == null) return len
    var cnt = 0
    var k = 0
    while (k < len) { if (bound(k)) cnt += 1; k += 1 }
    cnt
  }

  // vocabulary for token-id encoding: merge PRODUCTS (a+b) in
  // first-occurrence order get ids after the 37-slot base alphabet —
  // one id per distinct string, the GPT-2-style string-keyed vocab
  // (two merges with the same product share the id)
  private lazy val productIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    var next = BpeAutomaton.BaseVocabSize
    while (i < nPat) {
      val p = new String(aBytes(i), java.nio.charset.StandardCharsets.US_ASCII) +
        new String(bBytes(i), java.nio.charset.StandardCharsets.US_ASCII)
      if (!m.containsKey(p)) { m.put(p, next); next += 1 }
      i += 1
    }
    m
  }

  /** Token ids of one word appended to `out` — segmentation from
    * [[boundArray]], single chars via the fixed base alphabet, merged
    * segments via the model vocabulary (always present: a multi-char
    * segment is by construction some merge's product).
    */
  def encodeWord(bytes: Array[Byte], start: Int, end: Int,
                 out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val len = end - start
    val bound = boundArray(bytes, start, end)
    if (bound == null) {
      var k = 0
      while (k < len) { out += BpeAutomaton.baseId(bytes(start + k)); k += 1 }
    } else {
      var k = 0
      while (k < len) {
        var j = k + 1
        while (j < len && !bound(j)) j += 1
        if (j - k == 1) out += BpeAutomaton.baseId(bytes(start + k))
        else out += productIds.get(
          new String(bytes, start + k, j - k, java.nio.charset.StandardCharsets.US_ASCII))
        k = j
      }
    }
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

  // one automaton per distinct merge-array INSTANCE (the broadcast
  // deserializes once per executor, so identity keying — WeakHashMap's
  // array equals — shares the build across tasks and kernel forms, and
  // the weak key lets the ContextCleaner reclaim it with the broadcast)
  private val cache =
    new java.util.WeakHashMap[Array[(String, String)], BpeAutomaton]()

  def forMerges(merges: Array[(String, String)]): BpeAutomaton =
    cache.synchronized {
      val got = cache.get(merges)
      if (got != null) got
      else {
        val a = new BpeAutomaton(merges)
        cache.put(merges, a)
        a
      }
    }

  /** Java-regex `\w` (default flags): ASCII `[0-9A-Za-z_]`. Signed-byte
    * comparison rejects every multi-byte UTF-8 unit (all ≥ 0x80).
    */
  def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      (b >= 'A' && b <= 'Z') || b == '_'

  /** Fixed base alphabet for token-id encoding, ASCII order over the
    * post-lowercase `\w` class: '0'-'9' → 0-9, '_' → 10, 'a'-'z' →
    * 11-36. Model-independent, so ids are stable as merges grow.
    */
  val BaseVocabSize: Int = 37

  def baseId(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b == '_') 10
    else 11 + (b - 'a')
}

/** Token-id encoding under the frozen merges — the [[BpeSubwordCount]]
  * automaton emitting the segmentation as vocabulary ids instead of a
  * count: base alphabet ids 0-36 ([[BpeAutomaton.baseId]]), merge
  * products (distinct, first-occurrence order) from 37 up. The actual
  * tokenizer output a training pipeline feeds the model, flat in the
  * merge count like the counting kernel.
  */
case class BpeEncode(child: Expression,
    bc: Broadcast[Array[(String, String)]]) extends UnaryExpression {

  override def dataType: DataType =
    DataTypes.createArrayType(DataTypes.IntegerType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${child.dataType.catalogString}")

  @transient private lazy val auto = BpeAutomaton.forMerges(bc.value)

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (!BpeAutomaton.isWordByte(bytes(i))) i += 1
      else {
        var j = i
        while (j < n && BpeAutomaton.isWordByte(bytes(j))) j += 1
        auto.encodeWord(bytes, i, j, out)
        i = j
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}
