package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frozen byte-pair-encoding model: `merges` in training order. */
final case class BpeModel(merges: Seq[(String, String)])

/** Learned BPE subword tokenization — the real version of the
  * [[TextFunctions.subwordCount]] estimate: train a merge list on the
  * corpus, then count true BPE subwords per document (the number that
  * drives context budgeting, packing, and mixture token accounting).
  *
  * TRAINING is the freeze-the-model seam (the [[graft.ann.Ann.trainIvf]]
  * recipe): word frequencies aggregate map-side, only the top
  * `vocabCap` (word, count) rows reach the driver — frequency-truncated
  * vocabulary training, the standard practice; the tail it drops
  * contributes negligible pair mass — and the merge loop runs in
  * memory. Deterministic end-to-end: the vocabulary cut is a total
  * order (count desc, word asc), pair counting is exact integer
  * arithmetic, and the best-pair tie-break is lexicographic — so a
  * frozen model is replayable by an external oracle.
  *
  * APPLY (the default, [[subwordCountBpe]]) is the trie-compiled
  * [[BpeSubwordCount]] kernel: an Aho–Corasick automaton over the merge
  * concatenations finds each word's possible merges in one scan, then
  * applies just those in merge-list order — O(doc length + matches),
  * FLAT in the merge count, the production-size path (a 32k-merge
  * tokenizer costs the same per byte as a 64-merge one).
  *
  * The SEMANTICS both the kernel and the DuckDB oracle implement is the
  * wrapped replace chain ([[subwordCountChain]], kept as the kernel's
  * equality witness): the document lowercases, delimiter runs collapse
  * to `#`, every word char wraps as `<c>`, and each merge (a, b) is one
  * literal `replace("<a><b>" -> "<ab>")`. String replace scans
  * left-to-right non-overlapping — exactly BPE's greedy merge order —
  * and word boundaries (`#`) can never match inside a pair, so merges
  * cannot cross words. The chain replays bit-for-bit in DuckDB
  * (replace/regexp_replace semantics agree; the corpus ASCII guard
  * covers the char class — and [[train]] splits by code point, so a
  * non-ASCII word could at worst train an inert merge, never a
  * divergent one). Subword count = number of `<` markers left. The
  * chain's apply cost is O(nMerges × doc length) — fine as a witness at
  * tens-to-hundreds of merges, which is why the kernel is the default
  * (BpeProbe measures the flat-vs-linear curve; FunctionsSpec pins
  * kernel == chain).
  */
object Bpe {

  /** Greedy left-to-right merge of one pair inside a symbol sequence. */
  private def mergePair(s: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  def train(docs: DataFrame, text: String, nMerges: Int = 64,
            vocabCap: Int = 50000): BpeModel = {
    val wc = docs
      .select(explode(TextFunctions.tokens(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc) // total order → deterministic cut
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // split by CODE POINT, not UTF-16 unit: tokens() words are ASCII by
    // construction (Java-regex \w), but if a caller feeds pre-tokenized
    // non-ASCII text a supplementary char must stay one symbol — split("")
    // would halve it into surrogates and train merges the apply side
    // (which works in code points) could never match (ADVICE r10)
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count; ties → lexicographically smallest pair
        val ((a, b), _) = pairCounts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        words = words.map { case (syms, c) => (mergePair(syms, a, b), c) }
      }
    }
    BpeModel(merges.toSeq)
  }

  /** The wrapped-char working form: delimiters → `#`, word char c →
    * `<c>`. `<`, `>`, `#` are all non-word chars, so any occurrence in
    * the source text is itself collapsed to `#` first — the markers can
    * never collide with content.
    */
  private def wrapped(text: Column): Column =
    regexp_replace(regexp_replace(lower(text), "\\W+", "#"), "(\\w)", "<$1>")

  /** Apply the frozen merges; returns the merged working form. */
  private def applied(text: Column, model: BpeModel): Column =
    model.merges.foldLeft(wrapped(text)) { case (c, (a, b)) =>
      replace(c, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }

  // ONE broadcast per frozen model per SparkContext: repeated
  // applications of the same model (probe arms, two branches of one
  // query) share a single handle — a per-call broadcast churned the
  // driver AND made equal-model BpeSubwordCount expressions
  // non-canonically-equal, defeating subtree dedup/ReuseExchange (the
  // silent-double-scan class). Weak keys: when the caller drops the
  // model the entry clears and the ContextCleaner reclaims the
  // broadcast; the stored context reference guards against a handle
  // from a stopped session leaking into a new one.
  private val bcCache = new java.util.WeakHashMap[BpeModel,
    (org.apache.spark.SparkContext, org.apache.spark.broadcast.Broadcast[Array[(String, String)]])]()

  /** The per-model per-context broadcast handle both kernel forms
    * ([[subwordCountBpe]], [[encodeBpe]]) share.
    */
  private def modelBroadcast(model: BpeModel)
      : org.apache.spark.broadcast.Broadcast[Array[(String, String)]] = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    bcCache.synchronized {
      bcCache.get(model) match {
        case (cachedSc, cached) if cachedSc eq sc => cached
        case _ =>
          val b = sc.broadcast(model.merges.toArray)
          bcCache.put(model, (sc, b))
          b
      }
    }
  }

  /** True BPE subword count per document under the frozen model — the
    * trie kernel ([[BpeSubwordCount]]): flat in nMerges, the default.
    */
  def subwordCountBpe(text: Column, model: BpeModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeSubwordCount(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        modelBroadcast(model)))

  /** The digit-enrichment device `txt_bpe_big`, BpeProbe, ScaleCheck and
    * FunctionsSpec share: append the doc id and a portable pseudo-hash
    * digit token so the synthetic corpus's 31-word vocabulary gains the
    * long-tail pair structure a real corpus has (measured capacity
    * ≥ 1300 merges at the smallest SF). ONE definition plus its SQL twin
    * — the certified query, the probes and the scale case stay in
    * lockstep by construction.
    */
  def enrichWithIdTokens(df: DataFrame, id: String = "doc_id",
                         text: String = "text", out: String = "btext"): DataFrame =
    // (ADVICE r11) reduce the id mod p BEFORE the multiply: pmod keeps the
    // product < 1e9 * 2.65e9 ≈ 2.65e18 < Long.MaxValue, so replica-offset
    // ids (~1e12) in the probes/ScaleCheck no longer wrap to negative
    // digit tokens. For ids < p the value is unchanged — the certified
    // small-SF query and its oracle are bit-identical.
    df.withColumn(out, concat(col(text), lit(" "), col(id).cast("string"), lit(" "),
      pmod(pmod(col(id), lit(1000000007L)) * lit(2654435761L), lit(1000000007L))
        .cast("string")))

  /** DuckDB expression twin of [[enrichWithIdTokens]]. */
  def enrichWithIdTokensSql(id: String = "doc_id", text: String = "text"): String =
    s"$text || ' ' || CAST($id AS VARCHAR) || ' ' || " +
      s"CAST((($id % 1000000007) * 2654435761) % 1000000007 AS VARCHAR)"

  /** The literal replace-chain form — O(nMerges × len), kept as the
    * kernel's equality witness and the oracle-side semantics reference.
    */
  def subwordCountChain(text: Column, model: BpeModel): Column = {
    val m = applied(text, model)
    (length(m) - length(replace(m, lit("<"), lit("")))).cast("long")
  }

  /** String-keyed vocabulary of the frozen model: the fixed 37-slot base
    * alphabet ('0'-'9' → 0-9, '_' → 10, 'a'-'z' → 11-36; ASCII order
    * over the post-lowercase `\w` class, so ids are stable as merges
    * grow) then distinct merge PRODUCTS in first-occurrence order from
    * 37 up — one id per distinct string, the GPT-2-style vocab (two
    * merges with the same product share the id). The single definition
    * the kernel ([[BpeEncode]]), the chain witness and the DuckDB
    * oracle all derive from.
    */
  def vocabIds(model: BpeModel): Seq[(String, Int)] = {
    val base = (('0' to '9').map(_.toString) :+ "_") ++ ('a' to 'z').map(_.toString)
    base.zipWithIndex ++
      model.merges.map { case (a, b) => a + b }.distinct.zipWithIndex
        .map { case (p, i) => (p, base.length + i) }
  }

  /** Token-id encoding per document under the frozen model — the
    * [[BpeEncode]] trie kernel (flat in nMerges): the actual tokenizer
    * output (array of vocabulary ids in document order) a training
    * pipeline feeds the model, where [[subwordCountBpe]] only budgets.
    */
  def encodeBpe(text: Column, model: BpeModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeEncode(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        modelBroadcast(model)))

  /** Fixed-`ctx` context windows over a token-id array — the training-
    * example split, built entirely inside the scan (sequence → slice →
    * per-window fold): an array of (n_ids, ids_sum, first_id, last_id)
    * structs, one per window, empty for an empty id array. Zero
    * exchanges: window membership is derivable per row, so no groupBy
    * is ever needed.
    */
  def ctxWindows(ids: Column, ctx: Int): Column = {
    require(ctx > 0, "ctxWindows: ctx must be positive")
    // null routes with empty: under legacy sizeOfNull, size(null) = -1
    // would slip past the === 0 guard and drive sequence(0, -1) into
    // two garbage windows (the size(tokens(null)) hazard class)
    when(ids.isNull || size(ids) === 0,
        array().cast(s"array<struct<n_ids:int,ids_sum:bigint,first_id:int,last_id:int>>"))
      .otherwise(transform(
        // inner transform materializes each window's slice ONCE; folding
        // slice(...) into every struct field would evaluate the O(ctx)
        // slice 4x per window (HOF lambdas run outside codegen CSE —
        // the ann_quantized replay-inside-lambda class)
        transform(
          sequence(lit(0), (ceil(size(ids).cast("double") / ctx) - 1).cast("int")),
          w => slice(ids, w * ctx + 1, lit(ctx))),
        s => struct(
          size(s).as("n_ids"),
          aggregate(s, lit(0L), (a, x) => a + x).as("ids_sum"),
          element_at(s, 1).as("first_id"),
          element_at(s, -1).as("last_id"))))
  }

  /** Replace-chain twin of [[encodeBpe]] — O(nMerges × len), the
    * kernel's equality witness: extract the merged working form's
    * `<sym>` groups and map each through the [[vocabIds]] literal map.
    */
  def encodeChain(text: Column, model: BpeModel): Column = {
    val m = applied(text, model)
    val syms = regexp_extract_all(m, lit("<([0-9a-z_]+)>"), lit(1))
    val vocab = map(vocabIds(model).flatMap { case (s, i) =>
      Seq(lit(s), lit(i)) }: _*)
    transform(syms, s => element_at(vocab, s))
  }
}
