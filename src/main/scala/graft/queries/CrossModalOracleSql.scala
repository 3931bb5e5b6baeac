package graft.queries

import MinHashOracleSql.{chain, guardedDocs, signed, xxh64Str, Seed}

/** DuckDB-SQL replay of [[graft.multimodal.Multimodal.textImageScore]],
  * bit-for-bit: the text tower re-derives per-token XXH64 (the
  * [[MinHashOracleSql]] HUGEINT replay) → hashed bucket → the frozen
  * LinearScore weight rule per (bucket, dim) slot in BIGINT arithmetic;
  * the image tower unnests the 64 fingerprint bits from the SHARED
  * dHash-replay CTE prefix (passed in by the caller so the image
  * certifications keep one definition) and weights each set bit's
  * (bit, dim) slot with the decorrelated image rule
  * (+224737 — [[graft.functions.CrossModalScore.imageWeight]]);
  * the score is the Σ_d t[d]·i[d] dot product and `kept` the same
  * integer cross-multiplied decision the Spark side evaluates. Every
  * intermediate stays well inside signed 64 bits (|t[d]| ≤ 1000·tokens,
  * |i[d]| ≤ 64000), so the replay is exact. Token-less documents
  * surface through the left join from `documents` with (0, 0, false).
  */
object CrossModalOracleSql {

  /** The tower/score CTE chain (tb → tn → tt → ib → it → sc), assuming
    * the caller's WITH already established the dHash `h` CTE. Shared by
    * the plain-score oracle and the gated-ingest oracle so the two
    * certifications can never drift.
    */
  private def scoreCtes(buckets: Int, dim: Int): String = {
    val tokRows = chain(
      s"""SELECT doc_id, unnest(toks) AS tok
         FROM (SELECT doc_id, ${MinHashOracleSql.toks} AS toks FROM ($guardedDocs))""",
      xxh64Str("tok", Seed, "t_"))
    s"""tb AS (
         SELECT doc_id, ((th % $buckets) + $buckets) % $buckets AS bkt
         FROM (SELECT doc_id, ${signed("t_f5")} AS th FROM ($tokRows))),
       tn AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens
              FROM tb GROUP BY 1),
       tt AS (
         SELECT doc_id, dims.dd AS dd,
                CAST(sum(((bkt * $dim + dims.dd) * 2654435761 + 104729) % 2001 - 1000) AS BIGINT) AS tv
         FROM tb, UNNEST(generate_series(0, ${dim - 1})) AS dims(dd)
         GROUP BY 1, 2),
       ib AS (
         SELECT asset_id, bits.b AS b,
                CASE WHEN bits.b < 32 THEN (dhash_lo >> bits.b) & 1
                     ELSE (dhash_hi >> (bits.b - 32)) & 1 END AS bit
         FROM h, UNNEST(generate_series(0, 63)) AS bits(b)),
       it AS (
         SELECT asset_id, dims.dd AS dd,
                CAST(sum(bit * (((b * $dim + dims.dd) * 2654435761 + 224737) % 2001 - 1000)) AS BIGINT) AS iv
         FROM ib, UNNEST(generate_series(0, ${dim - 1})) AS dims(dd)
         GROUP BY 1, 2),
       sc AS (
         SELECT tt.doc_id, CAST(sum(tt.tv * it.iv) AS BIGINT) AS score
         FROM tt JOIN it ON it.asset_id = tt.doc_id AND it.dd = tt.dd
         GROUP BY 1)"""
  }

  /** The per-document (doc_id, n_tokens, score, kept) projection over
    * [[scoreCtes]]' results.
    */
  private def scoredSelect(thrMilli: Long): String =
    s"""SELECT d.doc_id,
              coalesce(tn.n_tokens, 0) AS n_tokens,
              CAST(coalesce(sc.score, 0) AS BIGINT) AS score,
              (coalesce(tn.n_tokens, 0) > 0 AND
               coalesce(sc.score, 0) >= $thrMilli * coalesce(tn.n_tokens, 0)) AS kept
       FROM documents d
       LEFT JOIN tn ON tn.doc_id = d.doc_id
       LEFT JOIN sc ON sc.doc_id = d.doc_id"""

  /** Oracle for `mm_text_image_score` (and its streaming twin):
    * (doc_id, n_tokens, score, kept). `dhashCtes` is the caller's shared
    * g/h dHash replay prefix exposing h(asset_id, dhash_hi, dhash_lo).
    */
  def textImageScore(dhashCtes: String, buckets: Int, dim: Int,
                     thrMilli: Long): String =
    s"""WITH $dhashCtes,
       ${scoreCtes(buckets, dim)}
       ${scoredSelect(thrMilli)}"""

  /** Oracle for `pp_ingest_crossmodal`: the converged gated-ingest
    * output (asset_id, dhash_hi, dhash_lo). Gate-everywhere semantics —
    * the corpus store holds hashes of corpus docs that PASS the
    * consistency gate (the corpus was built by this same ingest chain),
    * and a batch doc survives iff it passes the gate, its hash is
    * absent from the gated corpus store, and it is the lowest-id holder
    * of its hash among surviving batch docs (ascending-id micro-batches
    * make first-accepted == keep-min — the pp_ingest_media law).
    */
  def crossModalIngest(dhashCtes: String, buckets: Int, dim: Int,
                       thrMilli: Long): String =
    s"""WITH $dhashCtes,
       ${scoreCtes(buckets, dim)},
       scored AS (${scoredSelect(thrMilli)}),
       keptids AS (SELECT doc_id FROM scored WHERE kept),
       bh AS (SELECT h.asset_id, h.dhash_hi, h.dhash_lo
              FROM h JOIN keptids k ON k.doc_id = h.asset_id
              WHERE h.asset_id % 10 = 0),
       ch AS (SELECT DISTINCT h.dhash_hi, h.dhash_lo
              FROM h JOIN keptids k ON k.doc_id = h.asset_id
              WHERE h.asset_id % 10 <> 0)
       SELECT min(bh.asset_id) AS asset_id, bh.dhash_hi, bh.dhash_lo
       FROM bh LEFT JOIN ch
         ON bh.dhash_hi = ch.dhash_hi AND bh.dhash_lo = ch.dhash_lo
       WHERE ch.dhash_hi IS NULL
       GROUP BY 2, 3"""
}
