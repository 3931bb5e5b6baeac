package graft

/** Static driver-contract invariants — cheap checks that catch the
  * failure modes the round gate can only surface late and expensively:
  * an oracle keyed to a missing query (silently zero coverage), a
  * duplicate query name across the two registries (one silently wins),
  * or the flagship entry going empty.
  */
class ContractSpec extends GraftTest {

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("core and pipeline query names never collide") {
    val dup = graft.queries.CoreQueries.all.keySet
      .intersect(graft.queries.PipelineQueries.all.keySet)
    assert(dup.isEmpty, s"duplicate query names (one registry shadows the other): $dup")
    val dupO = graft.queries.CoreQueries.oracles.keySet
      .intersect(graft.queries.PipelineQueries.oracles.keySet)
    assert(dupO.isEmpty, s"duplicate oracle names: $dupO")
  }

  test("bench headline names all resolve to queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"bench names without a query: $missing")
  }

  test("oracle SQL strings contain no control chars that survive JSON escaping badly") {
    // Verify.q() escapes them, but a stray vertical tab or null byte in
    // builder-authored SQL is always a mistake worth failing fast on
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n' && c != '\t' && c != '\r'),
        s"$k oracle contains an exotic control character")
    }
  }

  test("flagship entry returns rows (driver smoke-check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
