package graft.queries

import graft.ann.{IvfModel, IvfPqModel, PqModel}

/** DuckDB-SQL replay of the TRAINED-quantizer ANN searches — the
  * freeze-the-model oracles for `ann_ivf` / `ann_pq` / `ann_ivfpq`.
  *
  * Lloyd's float k-means TRAINING has no tractable SQL replay, but the
  * oracle does not need to train: the query entry trains the model once
  * (deterministically — hash-ordered sample, first-k init, fixed
  * tie-breaks), hands the SAME frozen model to both the Spark searcher
  * and this generator, and the generator embeds the centroids/codebooks
  * as double literals (the device [[EmbeddingOracleSql]] uses for the
  * SRP sign matrix). What remains — list assignment, PQ encode, ADC
  * lookup, exact re-rank — is deterministic arithmetic DuckDB replays
  * bit-for-bit:
  *
  *  - every Spark-side loop is a SEQUENTIAL double fold; `list_reduce`
  *    over `list_prepend(0.0, …)` replays the same IEEE order;
  *  - literals render via shortest-round-trip decimal + `e0` (so DuckDB
  *    types them DOUBLE, never DECIMAL) and parse back bit-identical;
  *  - argmin/argmax with strict-inequality updates ≡ `row_number` over
  *    (score, id) — ties to the lower id on both sides;
  *  - the exact re-rank cosine reuses the `list_cosine_similarity`
  *    equivalence already hash-proven by the `ann_brute` oracle.
  *
  * Registration: the PipelineQueries entries call [[register]] at query
  * BUILD time (training happens eagerly there), and
  * `PipelineQueries.oracles` appends [[registered]] — so `Verify`, which
  * dumps oracle_sql.json AFTER running the queries, ships SQL whose
  * literals are the very model the dumped parquet was computed with.
  */
object AnnOracleSql {

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(name: String, sql: String): Unit = reg.put(name, sql)

  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    reg.asScala.toMap
  }

  /** Shortest round-trip decimal + `e0` marker: parses back to the
    * identical double in any engine, and the exponent marker makes DuckDB
    * type it DOUBLE rather than DECIMAL (same device as
    * TextFunctions.sqlDouble).
    */
  private def d(x: Double): String = {
    val s = java.lang.Double.toString(x)
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  private def arr(a: Array[Double]): String = a.map(d).mkString("[", ", ", "]")

  /** Sequential left fold `0.0 + x_1 + x_2 + …` — Scala's
    * `Array[Double].sum` / the UDFs' `while` accumulators in the same
    * IEEE order.
    */
  private def foldSum(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), (a, b) -> a + b)"

  /** Dim-guarded corpus CTE (loud failure on a corpus-dimension drift —
    * the literals are generated for exactly `dim`). The FLOAT[] hop
    * mirrors Graft.embeddings' defensive double→float narrowing: if a
    * double-typed corpus ever ships, both engines see the same narrowed
    * values (identity on today's float corpus).
    */
  private def embCte(dim: Int): String =
    s"""e AS (SELECT vec_id,
               CASE WHEN len(embedding) <> $dim
                    THEN error('ann oracle: expected dim $dim, got ' || len(embedding) || ' for vec ' || vec_id)
                    ELSE CAST(CAST(embedding AS FLOAT[]) AS DOUBLE[]) END AS v
             FROM embeddings)"""

  /** Unit-normalization CTE over `e` — replays `unitVec` (norm from the
    * sequential square fold; zero-norm vectors pass through).
    */
  private def unitCte: String =
    s"""u AS (SELECT vec_id,
               CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x / nrm) END AS u
             FROM (SELECT vec_id, v, sqrt(${foldSum("list_transform(v, x -> x * x)")}) AS nrm FROM e))"""

  /** The shared frozen-centroid cosine-assignment CTE prefix (cent → n
    * → sc) every assignment replay builds on — ONE definition so the
    * ivfTopK / semanticDedup / clusterSample twins can't drift apart
    * (the int8QuantizeCtes precedent). `nullGuard` adds the
    * `v IS NOT NULL` filter for oracles whose Spark twin excludes
    * null-embedding rows explicitly (the kernel null-propagates; inner
    * joins drop those rows for free in ivfTopK, the others must guard).
    */
  private def assignmentCtes(model: IvfModel, nullGuard: Boolean): String = {
    val dim = model.centroids(0).length
    val cent = model.centroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      s"($i, ${arr(c)}, ${d(cn)})"
    }.mkString(",\n               ")
    val guard = if (nullGuard) " WHERE v IS NOT NULL" else ""
    s"""cent AS (SELECT * FROM (VALUES
               $cent) t(list, c, cn)),
          n AS (SELECT vec_id, v, sqrt(${foldSum("list_transform(v, x -> x * x)")}) AS vn FROM e$guard),
          sc AS (SELECT vec_id, v, list,
                   CASE WHEN vn = 0 OR cn = 0 THEN CAST(0.0 AS DOUBLE)
                        ELSE ${foldSum(s"list_transform(generate_series(1, $dim), i -> v[i] * c[i])")} / (vn * cn)
                   END AS s
                 FROM n CROSS JOIN cent)"""
  }

  /** Oracle for `ann_ivf`: frozen centroids (+ their precomputed norms,
    * exactly the values the Spark broadcast carries) → cosine list
    * assignment / probing → in-list exact cosine top-k. Queries are
    * `vec_id < 10`, as in the PipelineQueries entry.
    */
  def ivfTopK(model: IvfModel, k: Int, nProbe: Int): String = {
    val dim = model.centroids(0).length
    s"""WITH ${embCte(dim)},
          ${assignmentCtes(model, nullGuard = false)},
          asg AS (SELECT vec_id AS neighbor_id, v AS cv, list FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r FROM sc)
                  WHERE r = 1),
          prb AS (SELECT vec_id AS query_id, v AS qv, list FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r
                     FROM sc WHERE vec_id < 10)
                  WHERE r <= $nProbe),
          scored AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cosr
                     FROM prb JOIN asg USING (list)
                     WHERE neighbor_id <> query_id)
       SELECT query_id, neighbor_id, rank, cos FROM (
         SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY cosr DESC, neighbor_id ASC) AS rank,
                round(cosr, 6) AS cos
         FROM scored)
       WHERE rank <= $k"""
  }

  /** Oracle for `ann_contrastive`: the ivfTopK replay split by probe
    * rank — rank-1 probe (the query's own cluster) scores the 'pos'
    * branch (top-1), ranks 2..nProbe score the 'neg' branch (top-kNeg
    * hard negatives from cluster-foreign lists).
    */
  def contrastivePairs(model: IvfModel, kNeg: Int, nProbe: Int): String = {
    val dim = model.centroids(0).length
    s"""WITH ${embCte(dim)},
          ${assignmentCtes(model, nullGuard = false)},
          asg AS (SELECT vec_id AS neighbor_id, v AS cv, list FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r FROM sc)
                  WHERE r = 1),
          prb AS (SELECT vec_id AS query_id, v AS qv, list, r FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r
                     FROM sc WHERE vec_id < 10)
                  WHERE r <= $nProbe),
          scored AS (SELECT query_id, CASE WHEN r = 1 THEN 'pos' ELSE 'neg' END AS role,
                            neighbor_id, list_cosine_similarity(qv, cv) AS cosr
                     FROM prb JOIN asg USING (list)
                     WHERE neighbor_id <> query_id)
       SELECT query_id, role, neighbor_id, rank, cos FROM (
         SELECT query_id, role, neighbor_id,
                row_number() OVER (PARTITION BY query_id, role ORDER BY cosr DESC, neighbor_id ASC) AS rank,
                round(cosr, 6) AS cos
         FROM scored)
       WHERE (role = 'pos' AND rank <= 1) OR (role = 'neg' AND rank <= $kNeg)"""
  }

  /** Oracle for the bare cluster-assignment op (`ann_assign_streaming`):
    * frozen-centroid cosine argmax per vector, ties to the lowest list —
    * exactly the IvfAssign kernel's fold order the other replays share.
    */
  def assignOnly(model: IvfModel): String = {
    val dim = model.centroids(0).length
    s"""WITH ${embCte(dim)},
          ${assignmentCtes(model, nullGuard = true)}
       SELECT vec_id, CAST(list AS INT) AS cluster FROM
         (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r FROM sc)
       WHERE r = 1"""
  }

  /** Oracle for `dd_semantic` (SemDeDup): frozen centroids → argmax-
    * cosine cluster assignment (carrying the centroid similarity the
    * keeper rule compares) → within-cluster dominator join — u drops v
    * iff same cluster, round(cos, 6) ≥ threshold and (u.cdot, u.id) <
    * (v.cdot, v.id) — with the `maxCluster` cap replayed as a cluster-
    * size window count on the dominator side only, exactly the Spark
    * operator's r-side-only contract. cdot values are bit-identical on
    * both engines (same sequential folds as the ivf assignment, already
    * hash-proven), so the float comparisons in the dominance rule can
    * never diverge.
    */
  def semanticDedup(model: IvfModel, threshold: Double, maxCluster: Int): String = {
    val dim = model.centroids(0).length
    // maxCluster <= 0 is capBuckets' uncapped opt-out — the bsz filter
    // must vanish, not drop everything
    val capFilter = if (maxCluster > 0) s"WHERE bsz <= $maxCluster" else ""
    s"""WITH ${embCte(dim)},
          ${assignmentCtes(model, nullGuard = true)},
          asg AS (SELECT vec_id, v, list AS cluster, s AS cdot FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r FROM sc)
                  WHERE r = 1),
          capd AS (SELECT vec_id, v, cluster, cdot FROM
                     (SELECT *, count(*) OVER (PARTITION BY cluster) AS bsz FROM asg)
                   $capFilter),
          drp AS (SELECT DISTINCT a.vec_id
                  FROM asg a JOIN capd u
                    ON u.cluster = a.cluster AND u.vec_id <> a.vec_id
                   AND (u.cdot < a.cdot OR (u.cdot = a.cdot AND u.vec_id < a.vec_id))
                   AND round(list_cosine_similarity(u.v, a.v), 6) >= ${d(threshold)})
       SELECT a.vec_id, a.cluster, (dr.vec_id IS NULL) AS keep
       FROM asg a LEFT JOIN drp dr ON dr.vec_id = a.vec_id"""
  }

  /** CTE fragment replaying [[graft.ann.Ann.crossSemanticDup]] over the
    * embeddings table for an ingest chain (r12): frozen-centroid
    * assignment of every vector, then `sem(doc_id)` = NEW-side ids
    * (`newPred`) with any capped CORPUS-side (`corpusPred`) vector in
    * the same cluster at round(cos, 6) ≥ threshold. The cap replays the
    * Spark operator's corpus-side-only whole-bucket contract, with
    * cluster sizes counted over the corpus subset (exactly what
    * capBuckets sees there). Callers splice the fragment into a WITH
    * chain and filter on `doc_id NOT IN (SELECT doc_id FROM sem)`.
    */
  def ingestSemanticCtes(model: IvfModel, threshold: Double, maxCluster: Int,
                         newPred: String, corpusPred: String): String = {
    val dim = model.centroids(0).length
    s"""${embCte(dim)},
          ${assignmentCtes(model, nullGuard = true)},
          sasg AS (SELECT vec_id, v, list AS cluster FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r FROM sc)
                   WHERE r = 1),
          scapd AS (SELECT vec_id, v, cluster FROM
                      (SELECT *, count(*) OVER (PARTITION BY cluster) AS bsz
                       FROM sasg WHERE $corpusPred)
                    WHERE bsz <= $maxCluster),
          sem AS (SELECT DISTINCT b.vec_id AS doc_id
                  FROM sasg b JOIN scapd u ON u.cluster = b.cluster
                  WHERE $newPred
                    AND round(list_cosine_similarity(b.v, u.v), 6) >= ${d(threshold)})"""
  }

  /** Oracle for `dd_semantic_resolve`: the [[semanticDedup]] replay's
    * keepers joined back to the corpus — the end-to-end removal form.
    */
  def semanticResolve(model: IvfModel, threshold: Double, maxCluster: Int): String = {
    val base = semanticDedup(model, threshold, maxCluster)
    s"""SELECT emb.vec_id, emb.label
       FROM embeddings emb JOIN ($base) k ON k.vec_id = emb.vec_id AND k.keep"""
  }

  /** Oracle for `pp_cluster_sample`: frozen centroids → cosine list
    * assignment (the [[ivfTopK]] replay, bit-proven) → per-list
    * exactly-`nPer` deterministic sample ranked by the md5 60-bit
    * prefix of the id, ties by id — pp_sample_n's engine-portable hash
    * inside the assignment replay.
    */
  def clusterSample(model: IvfModel, nPer: Int): String = {
    val dim = model.centroids(0).length
    s"""WITH ${embCte(dim)},
          ${assignmentCtes(model, nullGuard = true)},
          asg AS (SELECT vec_id, list FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS r FROM sc)
                  WHERE r = 1),
          h AS (SELECT list, vec_id,
                  ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS hk
                FROM asg)
       SELECT list, vec_id, rank_in_list FROM (
         SELECT list, vec_id,
                row_number() OVER (PARTITION BY list ORDER BY hk, vec_id) AS rank_in_list
         FROM h)
       WHERE rank_in_list <= $nPer"""
  }

  /** Oracle for `ann_pq`: frozen sub-codebooks → unit-normalize → encode
    * (per-subspace argmin L2, reconstruction norm via the flattened
    * chosen-centroid fold — the UDF's exact element order) → per-query
    * LUT → ADC estimate → top-refineK → exact cosine re-rank.
    */
  def pqTopK(model: PqModel, k: Int, refineK: Int): String = {
    val dim = model.bounds.last
    // per-subspace (lo, ln) come from the model's OWN bounds — trainPq
    // uses floor-based slicing (s*dim/m), so slices are UNEQUAL whenever
    // dim % m != 0; a fixed dim/m stride would replay wrong offsets
    val pq = (for {
      s <- model.books.indices
      c <- model.books(s).indices
    } yield s"($s, $c, ${model.bounds(s)}, ${model.bounds(s + 1) - model.bounds(s)}, ${arr(model.books(s)(c))})")
      .mkString(",\n               ")
    val cap = math.max(refineK, k)
    s"""WITH ${embCte(dim)},
          pq AS (SELECT * FROM (VALUES
               $pq) t(s, c, lo, ln, ctr)),
          $unitCte,
          dist AS (SELECT u.vec_id, pq.s, pq.c, pq.ctr,
                     ${foldSum(s"list_transform(generate_series(1, pq.ln), j -> (u[pq.lo + j] - ctr[j]) * (u[pq.lo + j] - ctr[j]))")} AS dd
                   FROM u CROSS JOIN pq),
          code AS (SELECT vec_id, s, c, ctr FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd ASC, c ASC) AS r FROM dist)
                   WHERE r = 1),
          enc AS (SELECT vec_id,
                    sqrt(${foldSum("list_transform(flatten(list(ctr ORDER BY s)), x -> x * x)")}) AS xnorm
                  FROM code GROUP BY vec_id),
          lut AS (SELECT q.vec_id AS query_id, pq.s, pq.c,
                    ${foldSum(s"list_transform(generate_series(1, pq.ln), j -> uq[pq.lo + j] * ctr[j])")} AS dt
                  FROM (SELECT vec_id, u AS uq FROM u WHERE vec_id < 10) q CROSS JOIN pq),
          acc AS (SELECT l.query_id, cd.vec_id AS neighbor_id,
                    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.dt ORDER BY cd.s)), (a, b) -> a + b) AS accv
                  FROM code cd JOIN lut l ON l.s = cd.s AND l.c = cd.c
                  WHERE cd.vec_id <> l.query_id
                  GROUP BY l.query_id, cd.vec_id),
          est AS (SELECT query_id, neighbor_id,
                    CASE WHEN xnorm = 0 THEN CAST(0.0 AS DOUBLE) ELSE accv / xnorm END AS est
                  FROM acc JOIN enc ON enc.vec_id = acc.neighbor_id),
          cand AS (SELECT query_id, neighbor_id FROM
                     (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY est DESC, neighbor_id ASC) AS r FROM est)
                   WHERE r <= $cap),
          ref AS (SELECT cand.query_id, cand.neighbor_id,
                    list_cosine_similarity(qe.v, ne.v) AS cosr
                  FROM cand
                  JOIN e qe ON qe.vec_id = cand.query_id
                  JOIN e ne ON ne.vec_id = cand.neighbor_id)
       SELECT query_id, neighbor_id, rank, cos FROM (
         SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY cosr DESC, neighbor_id ASC) AS rank,
                round(cosr, 6) AS cos
         FROM ref)
       WHERE rank <= $k"""
  }

  /** Oracle for `ann_recall_report`: recall@k of every approximate path
    * against exact brute force, composed from the per-method replay SQL
    * (each already hash-proven equal to its Spark search, so the
    * intersection counts — and therefore the recall values — match by
    * construction). Sub-queries nest as CTE subselects; truth∩approx is
    * an inner join on (query_id, neighbor_id) (both sides duplicate-free
    * top-k sets).
    */
  def recallReport(bruteSql: String, methods: Seq[(String, String)]): String = {
    val sel = methods.map { case (name, sql) =>
      s"SELECT '$name' AS method, query_id, neighbor_id FROM ($sql)"
    }.mkString("\n          UNION ALL ")
    val names = methods.map { case (n, _) => s"('$n')" }.mkString(", ")
    s"""WITH truth AS (SELECT query_id, neighbor_id FROM ($bruteSql)),
          sel AS (
          $sel),
          hits AS (SELECT method, count(*) AS n_hit
                   FROM sel JOIN truth USING (query_id, neighbor_id)
                   GROUP BY method),
          n AS (SELECT count(*) AS n_truth FROM truth)
       SELECT m.method,
              round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / n.n_truth, 4) AS recall_at_10
       FROM (VALUES $names) m(method)
       LEFT JOIN hits h ON h.method = m.method
       CROSS JOIN n"""
  }

  /** Oracle for `ann_ivfpq`: frozen coarse centroids + residual
    * codebooks → argmax-dot list assignment → residual PQ encode (recon
    * norm over c_list + chosen residual centroids) → nProbe probing with
    * the query-centroid dot carried → ADC estimate seeded at qdotc →
    * top-refineK → exact cosine re-rank.
    */
  def ivfPqTopK(model: IvfPqModel, k: Int, nProbe: Int, refineK: Int): String = {
    val dim = model.bounds.last
    val cent = model.centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${arr(c)})" }.mkString(",\n               ")
    // per-subspace (lo, ln) from the model's bounds — see pqTopK: slices
    // are unequal whenever dim % m != 0
    val pq = (for {
      s <- model.books.indices
      c <- model.books(s).indices
    } yield s"($s, $c, ${model.bounds(s)}, ${model.bounds(s + 1) - model.bounds(s)}, ${arr(model.books(s)(c))})")
      .mkString(",\n               ")
    val cap = math.max(refineK, k)
    s"""WITH ${embCte(dim)},
          cent AS (SELECT * FROM (VALUES
               $cent) t(list, cl)),
          pq AS (SELECT * FROM (VALUES
               $pq) t(s, c, lo, ln, ctr)),
          $unitCte,
          qd AS (SELECT vec_id, u, list, cl,
                   ${foldSum(s"list_transform(generate_series(1, $dim), i -> u[i] * cl[i])")} AS dt
                 FROM u CROSS JOIN cent),
          asg AS (SELECT vec_id, u, list, cl FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dt DESC, list ASC) AS r FROM qd)
                  WHERE r = 1),
          rdist AS (SELECT a.vec_id, pq.s, pq.c, pq.ctr,
                      ${foldSum(s"list_transform(generate_series(1, pq.ln), j -> ((u[pq.lo + j] - cl[pq.lo + j]) - ctr[j]) * ((u[pq.lo + j] - cl[pq.lo + j]) - ctr[j]))")} AS dd
                    FROM asg a CROSS JOIN pq),
          code AS (SELECT vec_id, s, c, ctr FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd ASC, c ASC) AS r FROM rdist)
                   WHERE r = 1),
          enc AS (SELECT ch.vec_id, a.list,
                    sqrt(${foldSum(s"list_transform(generate_series(1, $dim), i -> (cl[i] + chv[i]) * (cl[i] + chv[i]))")}) AS xnorm
                  FROM (SELECT vec_id, flatten(list(ctr ORDER BY s)) AS chv FROM code GROUP BY vec_id) ch
                  JOIN asg a USING (vec_id)),
          prb AS (SELECT vec_id AS query_id, list, dt AS qdotc FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dt DESC, list ASC) AS r
                     FROM qd WHERE vec_id < 10)
                  WHERE r <= $nProbe),
          lut AS (SELECT q.vec_id AS query_id, pq.s, pq.c,
                    ${foldSum(s"list_transform(generate_series(1, pq.ln), j -> uq[pq.lo + j] * ctr[j])")} AS dt
                  FROM (SELECT vec_id, u AS uq FROM u WHERE vec_id < 10) q CROSS JOIN pq),
          pairs AS (SELECT p.query_id, en.vec_id AS neighbor_id, p.qdotc, en.xnorm
                    FROM prb p JOIN enc en USING (list)
                    WHERE en.vec_id <> p.query_id),
          acc AS (SELECT pr.query_id, pr.neighbor_id, pr.qdotc, pr.xnorm,
                    list_reduce(list_prepend(pr.qdotc, list(l.dt ORDER BY cd.s)), (a, b) -> a + b) AS accv
                  FROM pairs pr
                  JOIN code cd ON cd.vec_id = pr.neighbor_id
                  JOIN lut l ON l.query_id = pr.query_id AND l.s = cd.s AND l.c = cd.c
                  GROUP BY pr.query_id, pr.neighbor_id, pr.qdotc, pr.xnorm),
          est AS (SELECT query_id, neighbor_id,
                    CASE WHEN xnorm = 0 THEN CAST(0.0 AS DOUBLE) ELSE accv / xnorm END AS est
                  FROM acc),
          cand AS (SELECT query_id, neighbor_id FROM
                     (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY est DESC, neighbor_id ASC) AS r FROM est)
                   WHERE r <= $cap),
          ref AS (SELECT cand.query_id, cand.neighbor_id,
                    list_cosine_similarity(qe.v, ne.v) AS cosr
                  FROM cand
                  JOIN e qe ON qe.vec_id = cand.query_id
                  JOIN e ne ON ne.vec_id = cand.neighbor_id)
       SELECT query_id, neighbor_id, rank, cos FROM (
         SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY cosr DESC, neighbor_id ASC) AS rank,
                round(cosr, 6) AS cos
         FROM ref)
       WHERE rank <= $k"""
  }
}
