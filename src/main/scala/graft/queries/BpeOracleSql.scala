package graft.queries

import graft.functions.BpeModel

/** DuckDB-SQL replay of [[graft.functions.Bpe.subwordCountBpe]] with the
  * frozen merge list embedded as literals (the freeze-the-model device):
  * the wrapped-char working form is two regexp_replace calls (DuckDB's
  * replacement syntax is `\1` where Spark's is `$1` — same semantics),
  * each merge is one literal `replace`, and both engines' replace scans
  * left-to-right non-overlapping — BPE's greedy order. Merge strings are
  * word chars only, so the SQL literals never need escaping; the corpus
  * ASCII guard keeps the `\w` char classes identical across engines.
  */
object BpeOracleSql {

  /** Oracle for `txt_bpe`: (doc_id, n_words, n_subwords). */
  def subwordCount(model: BpeModel): String = {
    val wrapped =
      """regexp_replace(regexp_replace(lower(text), '\W+', '#', 'g'), '(\w)', '<\1>', 'g')"""
    val merged = model.merges.foldLeft(wrapped) { case (s, (a, b)) =>
      s"replace($s, '<$a><$b>', '<$a$b>')"
    }
    s"""SELECT doc_id,
              CAST(len(list_filter(string_split_regex(lower(text), '\\W+'), w -> len(w) > 0)) AS INTEGER) AS n_words,
              CAST(length(m) - length(replace(m, '<', '')) AS BIGINT) AS n_subwords
       FROM (SELECT doc_id, text, $merged AS m FROM documents)"""
  }
}
