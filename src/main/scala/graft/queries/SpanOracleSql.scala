package graft.queries

import MinHashOracleSql.{chain, guardedDocs, signed, unsigned, xxh64Long, xxh64Str, Seed}

/** DuckDB-SQL replay of [[graft.dedup.Dedup.spanStats]], bit-for-bit.
  *
  * Same replay machinery as [[MinHashOracleSql]] (token XXH64 via the
  * HUGEINT-mod-2⁶⁴ device, k-gram running `hashLong` chain), generalized
  * from the MinHash shingle size 3 to the span gram size `k`: each of the
  * k links is one `xxh64Long` projection layer seeded on the previous
  * link's result, exactly Spark's multi-argument `xxhash64` and exactly
  * the loop in `ShingleHashes.compute`. Per-doc gram sets are DISTINCT
  * (the kernel's LinkedHashSet), docs with fewer than k tokens fall back
  * to their distinct token hashes, and token-less docs surface with
  * `n_grams = 0, dup_frac = 0.0` via the left join from `documents` —
  * all mirroring the Spark operator clause for clause.
  */
object SpanOracleSql {

  /** Oracle for `dd_span_remove`: (doc_id, n_tokens, n_removed,
    * text_kept) — the removal replay: per-position gram chain, window
    * min/max over the gram value for the cross-doc/canonical test, the
    * gaps-and-islands span-length gate (runs of consecutive duplicated
    * gram starts shorter than `minSpanTokens - k + 1` grams survive —
    * grouping replayed with the same pos-minus-running-count device), a
    * trailing RANGE k-1 PRECEDING coverage window per doc, and the
    * filtered ordered string_agg rebuild; left join keeps token-less
    * docs as (0, 0, '').
    */
  def spanRemove(k: Int = 8, minSpanTokens: Int = 0): String = {
    require(k >= 2, s"the k-gram replay needs k >= 2, got $k")
    val minRun = math.max(minSpanTokens, k) - k + 1
    val tokRows = chain(
      s"""SELECT doc_id, unnest(toks) AS tok, unnest(generate_series(0, len(toks) - 1)) AS tok_idx
         FROM (SELECT doc_id, ${MinHashOracleSql.toks} AS toks FROM ($guardedDocs))""",
      xxh64Str("tok", Seed, "t_"))
    val thList =
      s"""SELECT doc_id, list(tok ORDER BY tok_idx) AS toks, list(th ORDER BY tok_idx) AS ths
         FROM (SELECT doc_id, tok_idx, tok, ${signed("t_f5")} AS th FROM ($tokRows))
         GROUP BY doc_id"""
    val xCols = (1 to k).map(j => s"${unsigned(s"ths[g+${j - 1}]")} AS x$j").mkString(", ")
    val links = (0 until k).flatMap { j =>
      xxh64Long(s"x${j + 1}", if (j == 0) Seed else s"k${j - 1}_f5", s"k${j}_")
    }
    val gramRows = chain(
      s"""SELECT doc_id, g, $xCols
         FROM (SELECT doc_id, ths, unnest(generate_series(1, len(ths) - ${k - 1})) AS g
               FROM th WHERE len(ths) >= $k)""",
      links)
    val spanGate =
      if (minRun <= 1) "fl AS (SELECT doc_id, g, rm FROM fl0)"
      else
        s"""fl1 AS (SELECT doc_id, g, rm,
                          g - sum(rm) OVER (PARTITION BY doc_id ORDER BY g
                                            ROWS UNBOUNDED PRECEDING) AS grp
                   FROM fl0),
           fl AS (SELECT doc_id, g,
                         CASE WHEN rm = 1 AND sum(rm) OVER (PARTITION BY doc_id, grp) >= $minRun
                              THEN 1 ELSE 0 END AS rm
                  FROM fl1)"""
    s"""WITH th AS ($thList),
          gr AS (SELECT doc_id, g, ${signed(s"k${k - 1}_f5")} AS gh FROM ($gramRows)),
          fl0 AS (SELECT doc_id, g,
                        CASE WHEN min(doc_id) OVER w <> max(doc_id) OVER w
                              AND doc_id <> min(doc_id) OVER w THEN 1 ELSE 0 END AS rm
                 FROM gr WINDOW w AS (PARTITION BY gh)),
          $spanGate,
          tr AS (SELECT doc_id, tok_idx + 1 AS p, tok
                 FROM (SELECT doc_id, unnest(toks) AS tok, unnest(generate_series(0, len(toks) - 1)) AS tok_idx
                       FROM th)),
          cv AS (SELECT tr.doc_id, tr.p, tr.tok,
                        max(coalesce(fl.rm, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.p
                          RANGE BETWEEN ${k - 1} PRECEDING AND CURRENT ROW) AS cov
                 FROM tr LEFT JOIN fl ON tr.doc_id = fl.doc_id AND tr.p = fl.g),
          per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                         CAST(sum(cov) AS BIGINT) AS n_removed,
                         coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE cov = 0), '') AS text_kept
                  FROM cv GROUP BY doc_id)
       SELECT d.doc_id,
              CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
              CAST(coalesce(per.n_removed, 0) AS BIGINT) AS n_removed,
              coalesce(per.text_kept, '') AS text_kept
       FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""
  }

  /** Oracle for `pp_decontam_spans`: the [[spanRemove]] replay with the
    * removal test swapped to eval-set membership — gram rows build over
    * BOTH splits from one chain, the eval side reduces to DISTINCT gram
    * hashes, corpus gram starts flag via a left join, and the gate /
    * coverage / rebuild replay unchanged over corpus docs only.
    * `corpusPred` / `evalPred` are SQL predicates over `doc_id` naming
    * the two splits (the pp_decontam convention).
    */
  def decontamSpans(k: Int = 8, minSpanTokens: Int = 0,
                    corpusPred: String = "doc_id % 10 <> 0",
                    evalPred: String = "doc_id % 10 = 0"): String = {
    require(k >= 2, s"the k-gram replay needs k >= 2, got $k")
    val minRun = math.max(minSpanTokens, k) - k + 1
    val tokRows = chain(
      s"""SELECT doc_id, unnest(toks) AS tok, unnest(generate_series(0, len(toks) - 1)) AS tok_idx
         FROM (SELECT doc_id, ${MinHashOracleSql.toks} AS toks FROM ($guardedDocs))""",
      xxh64Str("tok", Seed, "t_"))
    val thList =
      s"""SELECT doc_id, list(tok ORDER BY tok_idx) AS toks, list(th ORDER BY tok_idx) AS ths
         FROM (SELECT doc_id, tok_idx, tok, ${signed("t_f5")} AS th FROM ($tokRows))
         GROUP BY doc_id"""
    val xCols = (1 to k).map(j => s"${unsigned(s"ths[g+${j - 1}]")} AS x$j").mkString(", ")
    val links = (0 until k).flatMap { j =>
      xxh64Long(s"x${j + 1}", if (j == 0) Seed else s"k${j - 1}_f5", s"k${j}_")
    }
    val gramRows = chain(
      s"""SELECT doc_id, g, $xCols
         FROM (SELECT doc_id, ths, unnest(generate_series(1, len(ths) - ${k - 1})) AS g
               FROM th WHERE len(ths) >= $k)""",
      links)
    val spanGate =
      if (minRun <= 1) "fl AS (SELECT doc_id, g, rm FROM fl0)"
      else
        s"""fl1 AS (SELECT doc_id, g, rm,
                          g - sum(rm) OVER (PARTITION BY doc_id ORDER BY g
                                            ROWS UNBOUNDED PRECEDING) AS grp
                   FROM fl0),
           fl AS (SELECT doc_id, g,
                         CASE WHEN rm = 1 AND sum(rm) OVER (PARTITION BY doc_id, grp) >= $minRun
                              THEN 1 ELSE 0 END AS rm
                  FROM fl1)"""
    s"""WITH th AS ($thList),
          gr AS (SELECT doc_id, g, ${signed(s"k${k - 1}_f5")} AS gh FROM ($gramRows)),
          ev AS (SELECT DISTINCT gh FROM gr WHERE $evalPred),
          fl0 AS (SELECT gr.doc_id, gr.g,
                        CASE WHEN ev.gh IS NOT NULL THEN 1 ELSE 0 END AS rm
                 FROM gr LEFT JOIN ev ON gr.gh = ev.gh
                 WHERE $corpusPred),
          $spanGate,
          tr AS (SELECT doc_id, tok_idx + 1 AS p, tok
                 FROM (SELECT doc_id, unnest(toks) AS tok, unnest(generate_series(0, len(toks) - 1)) AS tok_idx
                       FROM th WHERE $corpusPred)),
          cv AS (SELECT tr.doc_id, tr.p, tr.tok,
                        max(coalesce(fl.rm, 0)) OVER (PARTITION BY tr.doc_id ORDER BY tr.p
                          RANGE BETWEEN ${k - 1} PRECEDING AND CURRENT ROW) AS cov
                 FROM tr LEFT JOIN fl ON tr.doc_id = fl.doc_id AND tr.p = fl.g),
          per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                         CAST(sum(cov) AS BIGINT) AS n_removed,
                         coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE cov = 0), '') AS text_kept
                  FROM cv GROUP BY doc_id)
       SELECT d.doc_id,
              CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
              CAST(coalesce(per.n_removed, 0) AS BIGINT) AS n_removed,
              coalesce(per.text_kept, '') AS text_kept
       FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       WHERE ${corpusPred.replace("doc_id", "d.doc_id")}"""
  }

  /** Oracle for `dd_span`: (doc_id, n_grams, n_dup, dup_frac). */
  def spanStats(k: Int = 8): String = {
    require(k >= 2, s"the k-gram replay needs k >= 2, got $k")
    val tokRows = chain(
      s"""SELECT doc_id, unnest(toks) AS tok, unnest(generate_series(0, len(toks) - 1)) AS tok_idx
         FROM (SELECT doc_id, ${MinHashOracleSql.toks} AS toks FROM ($guardedDocs))""",
      xxh64Str("tok", Seed, "t_"))
    val thList =
      s"""SELECT doc_id, list(th ORDER BY tok_idx) AS ths
         FROM (SELECT doc_id, tok_idx, ${signed("t_f5")} AS th FROM ($tokRows))
         GROUP BY doc_id"""
    // k-gram running hashLong chain, one projection layer per link;
    // prefixes k0_, k1_, ... — each seeded on the previous link's f5
    val xCols = (1 to k).map(j => s"${unsigned(s"ths[g+${j - 1}]")} AS x$j").mkString(", ")
    val links = (0 until k).flatMap { j =>
      xxh64Long(s"x${j + 1}", if (j == 0) Seed else s"k${j - 1}_f5", s"k${j}_")
    }
    val gramRows = chain(
      s"""SELECT doc_id, $xCols
         FROM (SELECT doc_id, ths, unnest(generate_series(1, len(ths) - ${k - 1})) AS g
               FROM ($thList) WHERE len(ths) >= $k)""",
      links)
    val grams =
      s"""SELECT DISTINCT doc_id, gh FROM (
           SELECT doc_id, ${signed(s"k${k - 1}_f5")} AS gh FROM ($gramRows)
           UNION ALL
           SELECT doc_id, unnest(ths) AS gh FROM ($thList) WHERE len(ths) < $k)"""
    s"""WITH g AS ($grams),
          cnt AS (SELECT gh, count(*) AS n_docs FROM g GROUP BY gh),
          per AS (SELECT doc_id, count(*) AS n_grams,
                         CAST(sum(CASE WHEN cnt.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
                  FROM g JOIN cnt USING (gh) GROUP BY doc_id)
       SELECT d.doc_id,
              CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
              CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup,
              CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
                   ELSE round(CAST(per.n_dup AS DOUBLE) / per.n_grams, 4) END AS dup_frac
       FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""
  }
}
