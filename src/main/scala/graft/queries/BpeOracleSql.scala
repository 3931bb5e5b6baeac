package graft.queries

import graft.functions.BpeModel

/** DuckDB-SQL replay of the frozen-model BPE subword count
  * ([[graft.functions.Bpe]]) with the merge list embedded as literals
  * (the freeze-the-model device): the wrapped-char working form is two
  * regexp_replace calls (DuckDB's replacement syntax is `\1` where
  * Spark's is `$1` — same semantics), each merge is one literal
  * `replace`, and both engines' replace scans left-to-right
  * non-overlapping — BPE's greedy order. This is the replace-CHAIN
  * semantics; the Spark side runs the trie kernel
  * ([[graft.functions.BpeSubwordCount]]), whose chain-equality is pinned
  * in FunctionsSpec. Merge strings are word chars only, so the SQL
  * literals never need escaping; the corpus ASCII guard keeps the `\w`
  * char classes identical across engines.
  *
  * The chain nests in BLOCKS of replaces chained through CTEs rather
  * than one nMerges-deep expression. TWO DuckDB limits bound the block
  * geometry (both measured, r12): per-expression binder recursion is
  * 128 — so ≤ ~120 replaces may nest in one block — and the CTE CHAIN
  * itself counts toward max_expression_depth (default 1000) — so
  * ≤ ~990 blocks may chain. Default 32/block (the r11 geometry,
  * `txt_bpe_big` at 1024 merges); the 32k-merge oracle uses 96/block
  * (342 blocks — both limits comfortably cleared, capacity ≈ 990 × 120
  * ≈ 118k merges).
  */
object BpeOracleSql {

  /** The merged-working-form CTE chain (b0 → bN in 32-replace blocks) —
    * shared by every oracle that needs the per-doc chain result.
    * Returns (cte fragment, last cte name).
    */
  private def chainCtes(model: BpeModel, textSql: String,
                        perBlock: Int = 32): (String, String) = {
    val wrappedSql =
      s"""regexp_replace(regexp_replace(lower($textSql), '\\W+', '#', 'g'), '(\\w)', '<\\1>', 'g')"""
    val blocks = model.merges.grouped(perBlock).toList
    val ctes = new StringBuilder(
      s"b0 AS (SELECT doc_id, text, $wrappedSql AS m FROM documents)")
    blocks.zipWithIndex.foreach { case (blk, i) =>
      val merged = blk.foldLeft("m") { case (s, (a, b)) =>
        s"replace($s, '<$a><$b>', '<$a$b>')"
      }
      ctes.append(s", b${i + 1} AS (SELECT doc_id, text, $merged AS m FROM b$i)")
    }
    (ctes.toString, s"b${blocks.length}")
  }

  /** Oracle for `pp_pack_bpe`: packBins' deterministic prefix-sum
    * binning with the TRUE BPE subword count as the token measure —
    * the chain replay feeds the identical cumulative arithmetic.
    */
  def packBins(model: BpeModel, budget: Int): String = {
    val (ctes, last) = chainCtes(model, "text")
    s"""WITH $ctes,
            t AS (SELECT doc_id, CAST(length(m) - length(replace(m, '<', '')) AS BIGINT) AS n_tok FROM $last),
            c AS (SELECT doc_id, n_tok,
                         sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                  FROM t)
       SELECT doc_id, n_tok, CAST((cum - n_tok) // $budget AS BIGINT) AS bin FROM c"""
  }

  /** Oracle for `txt_fertility`: the chain replay's per-doc token count
    * joined back to documents for (lang, char length), aggregated per
    * language — integer sums plus a milli-fertility in integer floor
    * division, so no float crosses the engines.
    */
  def fertilityByLang(model: BpeModel): String = {
    val (ctes, last) = chainCtes(model, "text")
    s"""WITH $ctes,
            t AS (SELECT x.doc_id, dd.lang, length(dd.text) AS n_ch,
                         CAST(length(x.m) - length(replace(x.m, '<', '')) AS BIGINT) AS n_tok
                  FROM $last x JOIN documents dd ON dd.doc_id = x.doc_id
                  WHERE dd.doc_id IS NOT NULL AND dd.text IS NOT NULL)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_ch) AS BIGINT) AS sum_chars,
              CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
              CAST((sum(n_tok) * 1000) // sum(n_ch) AS BIGINT) AS fert_milli
       FROM t GROUP BY lang"""
  }

  /** Oracle for `pp_pack_mm`: [[packBins]] with a per-doc EXTRA token
    * term joined back from the documents table (`extraSql` may
    * reference `dd.*`) — the multimodal budget where image patch
    * tokens share the context window with text tokens.
    */
  def packBinsMm(model: BpeModel, budget: Int, extraSql: String): String = {
    val (ctes, last) = chainCtes(model, "text")
    s"""WITH $ctes,
            t AS (SELECT x.doc_id,
                         CAST(length(x.m) - length(replace(x.m, '<', '')) AS BIGINT)
                         + CAST(($extraSql) AS BIGINT) AS n_tok
                  FROM $last x JOIN documents dd ON dd.doc_id = x.doc_id),
            c AS (SELECT doc_id, n_tok,
                         sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                  FROM t)
       SELECT doc_id, n_tok, CAST((cum - n_tok) // $budget AS BIGINT) AS bin FROM c"""
  }

  /** Oracle for `txt_bpe_encode`: the chain replay's merged working
    * form → extract the `<sym>` groups in order → map each symbol
    * through the frozen vocabulary ([[graft.functions.Bpe.vocabIds]],
    * embedded as a VALUES table) → one (doc_id, pos, token_id) row per
    * token, pos 0-based like Spark's posexplode.
    */
  def encode(model: BpeModel, textSql: String = "text",
             perBlock: Int = 32): String = {
    val (ctes, last) = chainCtes(model, textSql, perBlock)
    val vocabRows = graft.functions.Bpe.vocabIds(model)
      .map { case (s, i) => s"('$s', $i)" }.mkString(", ")
    s"""WITH $ctes,
            tk AS (SELECT doc_id, regexp_extract_all(m, '<([0-9a-z_]+)>', 1) AS syms FROM $last),
            p AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, syms[i] AS sym
                  FROM tk, UNNEST(generate_series(1, len(syms))) AS u(i)),
            v AS (SELECT * FROM (VALUES $vocabRows) t(sym, id))
       SELECT p.doc_id, p.pos, CAST(v.id AS INTEGER) AS token_id
       FROM p JOIN v ON p.sym = v.sym"""
  }

  /** Oracle for `pp_ctx_windows`: the [[encode]] token rows grouped into
    * fixed `ctx`-id windows by integer position division — count, sum
    * and the positional first/last id per window (arg_min/arg_max over
    * the unique pos, deterministic).
    */
  def ctxWindows(model: BpeModel, ctx: Int): String = {
    val enc = encode(model)
    s"""WITH enc AS ($enc)
       SELECT doc_id, CAST(pos // $ctx AS INTEGER) AS window_idx,
              CAST(count(*) AS INTEGER) AS n_ids,
              CAST(sum(token_id) AS BIGINT) AS ids_sum,
              arg_min(token_id, pos) AS first_id,
              arg_max(token_id, pos) AS last_id
       FROM enc GROUP BY doc_id, pos // $ctx"""
  }

  /** Oracle for `txt_bpe` (includeWords = true) and `txt_bpe_big`
    * (includeWords = false, enriched textSql): doc_id [, n_words],
    * n_subwords. `textSql` is the DuckDB expression for the text the
    * model applies to (plain `text`, or the digit-enriched form).
    */
  def subwordCount(model: BpeModel, includeWords: Boolean = true,
                   textSql: String = "text"): String = {
    val (ctesStr, last) = chainCtes(model, textSql)
    val ctes = new StringBuilder("WITH " + ctesStr)
    val wordsCol = if (includeWords)
      """CAST(len(list_filter(string_split_regex(lower(text), '\W+'), w -> len(w) > 0)) AS INTEGER) AS n_words,
         """
    else ""
    s"""$ctes
       SELECT doc_id,
              $wordsCol CAST(length(m) - length(replace(m, '<', '')) AS BIGINT) AS n_subwords
       FROM $last"""
  }
}
