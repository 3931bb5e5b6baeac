package graft.queries

import MinHashOracleSql.{chain, guardedDocs, signed, xxh64Str, Seed}

/** DuckDB-SQL replay of [[graft.functions.TextFunctions.classifierScore]],
  * bit-for-bit: per-token XXH64 (the [[MinHashOracleSql]] HUGEINT replay),
  * then the frozen hashed-linear weight rule in plain BIGINT arithmetic —
  * `((((h % K) + K) % K) * 2654435761 + 104729) % 2001 - 1000` milli-units
  * per token (every intermediate < 2^52 for any sane bucket count, so
  * signed-64 arithmetic is exact in both engines) — summed per document,
  * with the keep decision as the same integer cross-multiplication the
  * Spark side evaluates. Token-less documents surface through the left
  * join from `documents` with (0, 0, false).
  */
object ClassifierOracleSql {

  /** Oracle for `txt_classifier`: (doc_id, n_tokens, score_milli, kept). */
  def classifierScore(buckets: Int, thrMilli: Long): String = {
    val tokRows = chain(
      s"""SELECT doc_id, unnest(toks) AS tok
         FROM (SELECT doc_id, ${MinHashOracleSql.toks} AS toks FROM ($guardedDocs))""",
      xxh64Str("tok", Seed, "t_"))
    s"""WITH w AS (
         SELECT doc_id,
                ((((th % $buckets) + $buckets) % $buckets) * 2654435761 + 104729) % 2001 - 1000 AS wt
         FROM (SELECT doc_id, ${signed("t_f5")} AS th FROM ($tokRows))),
       per AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
                      CAST(sum(wt) AS BIGINT) AS score_milli
               FROM w GROUP BY doc_id)
       SELECT d.doc_id,
              coalesce(per.n_tokens, 0) AS n_tokens,
              CAST(coalesce(per.score_milli, 0) AS BIGINT) AS score_milli,
              (coalesce(per.n_tokens, 0) > 0 AND
               coalesce(per.score_milli, 0) >= $thrMilli * coalesce(per.n_tokens, 0)) AS kept
       FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""
  }
}
