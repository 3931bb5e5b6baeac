package graft.queries

import MinHashOracleSql.{chain, guardedDocs, signed, toks, xxh64Str, Seed}
import graft.functions.TextFunctions.detLnSql

/** DuckDB-SQL replay of [[graft.functions.TextFunctions.dsirWeights]],
  * bit-for-bit: unigram+bigram grams from the shared tokenizer, per-gram
  * XXH64 (the [[MinHashOracleSql]] HUGEINT replay) bucketed with Spark's
  * `pmod` sign fix, add-one-smoothed count models on both corpora, and
  * every logarithm quantized to integer micro-nats through [[detLnSql]]
  * BEFORE summation — so per-doc weights are exact BIGINT sums that can
  * never diverge across engines. The top-N resample pick replays as
  * ORDER BY (logw DESC, doc_id ASC) LIMIT N — the total order the Spark
  * side's TakeOrderedAndProject evaluates on identical integers.
  */
object DsirOracleSql {

  private def q6(k: String): String =
    s"CAST(floor(${detLnSql(k)} * 1000000.0e0) AS BIGINT)"

  /** Oracle for `pp_dsir`: the `topN` resampled docs (doc_id, n_grams,
    * logw_micro) from the raw pool, target = rows matching
    * `targetPredicate` (a SQL boolean over the documents columns).
    */
  def dsirWeights(buckets: Int, targetPredicate: String, topN: Int): String = {
    // (doc_id, bkt) — one row per gram INSTANCE (unigrams then bigrams)
    def gramRows(from: String): String = chain(
      s"""SELECT doc_id, unnest(grams) AS gram
         FROM (SELECT doc_id, list_concat(toks,
                 list_transform(generate_series(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i + 1])) AS grams
               FROM (SELECT doc_id, $toks AS toks FROM ($from)))""",
      xxh64Str("gram", Seed, "g_"))
    val rawBkt =
      s"""SELECT doc_id, ((th % $buckets) + $buckets) % $buckets AS bkt
         FROM (SELECT doc_id, ${signed("g_f5")} AS th FROM (${gramRows(guardedDocs)}))"""
    val tgtBkt =
      s"""SELECT doc_id, ((th % $buckets) + $buckets) % $buckets AS bkt
         FROM (SELECT doc_id, ${signed("g_f5")} AS th FROM (${gramRows(
        s"SELECT * FROM ($guardedDocs) WHERE doc_id IN (SELECT doc_id FROM documents WHERE $targetPredicate)")}))"""
    s"""WITH rtf AS (SELECT doc_id, bkt, CAST(count(*) AS BIGINT) AS tf
                     FROM ($rawBkt) GROUP BY doc_id, bkt),
          cr AS (SELECT bkt, CAST(sum(tf) AS BIGINT) AS cr FROM rtf GROUP BY bkt),
          ct AS (SELECT bkt, CAST(count(*) AS BIGINT) AS ct FROM ($tgtBkt) GROUP BY bkt),
          lam AS (SELECT coalesce(cr.bkt, ct.bkt) AS bkt,
                    ${q6("coalesce(ct, 0) + 1")} - ${q6("coalesce(cr, 0) + 1")} AS lam_micro
                  FROM cr FULL OUTER JOIN ct ON cr.bkt = ct.bkt),
          denom AS (SELECT ${q6(s"n_r + $buckets")} - ${q6(s"n_t + $buckets")} AS const_micro
                    FROM (SELECT CAST(sum(cr) AS BIGINT) AS n_r FROM cr)
                    CROSS JOIN (SELECT CAST(sum(ct) AS BIGINT) AS n_t FROM ct)),
          per AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_grams,
                         CAST(sum(tf * lam_micro) AS BIGINT) AS s
                  FROM rtf JOIN lam USING (bkt) GROUP BY doc_id),
          w AS (SELECT d.doc_id,
                       coalesce(per.n_grams, 0) AS n_grams,
                       CAST(coalesce(per.s, 0) + coalesce(per.n_grams, 0) * denom.const_micro AS BIGINT) AS logw_micro
                FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
                CROSS JOIN denom)
       SELECT doc_id, n_grams, logw_micro
       FROM w ORDER BY logw_micro DESC, doc_id ASC LIMIT $topN"""
  }
}
