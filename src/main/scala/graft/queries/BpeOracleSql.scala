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
  * The chain nests in BLOCKS of 32 replaces chained through CTEs rather
  * than one nMerges-deep expression: DuckDB's max_expression_depth
  * defaults to 1000, which a production-size merge list
  * (`txt_bpe_big`, 1024 merges) would exceed as a single nesting.
  */
object BpeOracleSql {

  /** Oracle for `txt_bpe` (includeWords = true) and `txt_bpe_big`
    * (includeWords = false, enriched textSql): doc_id [, n_words],
    * n_subwords. `textSql` is the DuckDB expression for the text the
    * model applies to (plain `text`, or the digit-enriched form).
    */
  def subwordCount(model: BpeModel, includeWords: Boolean = true,
                   textSql: String = "text"): String = {
    val wrappedSql =
      s"""regexp_replace(regexp_replace(lower($textSql), '\\W+', '#', 'g'), '(\\w)', '<\\1>', 'g')"""
    val blocks = model.merges.grouped(32).toList
    val ctes = new StringBuilder(
      s"WITH b0 AS (SELECT doc_id, text, $wrappedSql AS m FROM documents)")
    blocks.zipWithIndex.foreach { case (blk, i) =>
      val merged = blk.foldLeft("m") { case (s, (a, b)) =>
        s"replace($s, '<$a><$b>', '<$a$b>')"
      }
      ctes.append(s", b${i + 1} AS (SELECT doc_id, text, $merged AS m FROM b$i)")
    }
    val last = s"b${blocks.length}"
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
