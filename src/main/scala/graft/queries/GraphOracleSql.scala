package graft.queries

/** DuckDB-SQL replay of [[graft.graph.Graph]] — the link-graph
  * authority family.
  *
  * Everything is integer arithmetic (truncated division on non-negative
  * BIGINTs: DuckDB `//` == Spark `div` there), so the replay is exact:
  * no float summation order can enter. The fixed-depth power iteration
  * unrolls as K chained CTEs; `n` and the edge list replay the
  * deterministic modular construction of
  * [[graft.graph.Graph.syntheticLinkGraph]].
  */
object GraphOracleSql {

  /** Shared CTE prefix: nn (vertex count) -> e0 (distinct edges: two hub
    * edges toward low ids + one modular long-range edge, the
    * [[graft.graph.Graph.syntheticLinkGraph]] construction) -> deg
    * (out-degrees). */
  private val edgeCtes: String =
    s"""nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
       e0 AS (SELECT DISTINCT src, dst FROM (
                SELECT d.doc_id AS src, d.doc_id // 2 AS dst FROM documents d
                UNION ALL SELECT d.doc_id, d.doc_id // 4 FROM documents d
                UNION ALL SELECT d.doc_id,
                       (d.doc_id * 131 + 7919) % (SELECT n FROM nn)
                FROM documents d)),
       deg AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY 1)"""

  /** r0..rK chained CTEs of the integer power iteration; `tpSql` is the
    * per-node teleport expression (may reference the base alias `b`). */
  private def rankCtes(iterations: Int, microScale: Long, damping: Int,
                       tpSql: String): String = {
    val r0 = s"r0 AS (SELECT doc_id AS node, CAST($microScale AS BIGINT) AS r FROM documents)"
    val rounds = (1 to iterations).map { k =>
      s"""r$k AS (SELECT b.node,
                    CAST(($tpSql) + ($damping * COALESCE(a.s, 0)) // 1000 AS BIGINT) AS r
             FROM r0 b LEFT JOIN
                  (SELECT e0.dst AS node, SUM(rr.r // deg.outdeg) AS s
                   FROM e0 JOIN r${k - 1} rr ON e0.src = rr.node
                        JOIN deg ON e0.src = deg.src
                   GROUP BY 1) a ON b.node = a.node)"""
    }
    (r0 +: rounds).mkString(",\n       ")
  }

  private def uniformTp(microScale: Long, damping: Int): String =
    (microScale * (1000L - damping) / 1000L).toString

  /** Oracle for `g_pagerank`: (node, rank_micro) after K rounds. */
  def pageRank(iterations: Int = 4,
               microScale: Long = 1000000L, damping: Int = 850): String =
    s"""WITH $edgeCtes,
       ${rankCtes(iterations, microScale, damping, uniformTp(microScale, damping))}
       SELECT node, r AS rank_micro FROM r$iterations"""

  /** Oracle for `g_pagerank_seeded`: the personalized variant — the
    * uniform teleport mass redistributes equally (integer div) over the
    * seed set (doc_id % `seedMod` = 0); non-seeds get none. */
  def personalizedPageRank(iterations: Int = 4, microScale: Long = 1000000L,
                           damping: Int = 850, seedMod: Int = 100): String = {
    val tp =
      s"""CASE WHEN b.node % $seedMod = 0
          THEN (${uniformTp(microScale, damping)} * (SELECT count(*) FROM documents))
               // (SELECT count(*) FROM documents WHERE doc_id % $seedMod = 0)
          ELSE 0 END"""
    s"""WITH $edgeCtes,
       ${rankCtes(iterations, microScale, damping, tp)}
       SELECT node, r AS rank_micro FROM r$iterations"""
  }

  /** Oracle for `g_lpa`: K rounds of deterministic synchronous label
    * propagation (most frequent neighbor label, ties to the MINIMUM —
    * row_number ordered (c DESC, label ASC) mirrors Spark's
    * max(struct(c, -label)) exactly); isolated nodes keep their own.
    */
  def labelPropagation(iterations: Int = 3): String = {
    val und =
      """und AS (SELECT DISTINCT a, b FROM (
                   SELECT src AS a, dst AS b FROM e0
                   UNION ALL SELECT dst AS a, src AS b FROM e0)
                 WHERE a <> b)"""
    val l0 = "l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)"
    val rounds = (1 to iterations).map { k =>
      s"""n$k AS (SELECT u.a, l.label, count(*) AS c
              FROM und u JOIN l${k - 1} l ON u.b = l.node GROUP BY 1, 2),
         w$k AS (SELECT a, label FROM (
                   SELECT a, label,
                          row_number() OVER (PARTITION BY a ORDER BY c DESC, label ASC) AS rn
                   FROM n$k) WHERE rn = 1),
         l$k AS (SELECT p.node, COALESCE(w.label, p.label) AS label
              FROM l${k - 1} p LEFT JOIN w$k w ON p.node = w.a)"""
    }
    s"""WITH $edgeCtes,
       $und,
       ${(l0 +: rounds).mkString(",\n       ")}
       SELECT node, label AS community FROM l$iterations"""
  }

  /** Oracle for `g_degree`: (node, outdeg, indeg) zero-filled. */
  def degrees: String =
    s"""WITH $edgeCtes,
       ind AS (SELECT dst AS node, count(*) AS indeg FROM e0 GROUP BY 1)
       SELECT d.doc_id AS node,
              CAST(COALESCE(deg.outdeg, 0) AS BIGINT) AS outdeg,
              CAST(COALESCE(ind.indeg, 0) AS BIGINT) AS indeg
       FROM documents d LEFT JOIN deg ON d.doc_id = deg.src
                        LEFT JOIN ind ON d.doc_id = ind.node"""

  /** Oracle for `g_authority`: rank mass rolled up to the `source`
    * (pseudo-host) grain — the per-domain authority table a curation
    * pipeline joins its quality priors against. */
  def authority(iterations: Int = 4,
                microScale: Long = 1000000L, damping: Int = 850): String =
    s"""WITH $edgeCtes,
       ${rankCtes(iterations, microScale, damping, uniformTp(microScale, damping))}
       SELECT d.source, count(*) AS n_docs,
              CAST(SUM(rr.r) AS BIGINT) AS auth_micro,
              CAST(SUM(rr.r) // count(*) AS BIGINT) AS mean_micro
       FROM documents d JOIN r$iterations rr ON d.doc_id = rr.node
       GROUP BY 1"""
}
