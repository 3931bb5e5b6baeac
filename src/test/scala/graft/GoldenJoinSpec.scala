package graft

import graft.operators.{Joins, TableView}
import org.apache.spark.sql.functions._

/** The clicks-per-region golden case — the most semantically loaded
  * assertion in the reference's integration suite (reference:
  * src/test/scala/com/github/hosnimed/utils/StreamToTableJoinTestData.scala:33-59,
  * StreamToTableJoinScalaIntegrationTestBase.scala:102-135): a clicks
  * stream joins a region changelog table where one user MOVES region
  * mid-stream; every one of that user's clicks must count toward their
  * LATEST region (table upsert semantics), and the final per-region sums
  * must match exactly.
  */
class GoldenJoinSpec extends GraftTest {

  test("bucketized range join equals the naive non-equi join (boundaries included)") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 31.9), (3L, 32.0), (4L, 47.9), (5L, 48.0),
        (6L, 95.9), (7L, 96.0), (8L, -1.0), (9L, 500.0))
      .toDF("pid", "p")
    val intervals = Seq((10L, 0.0, 48.0), (11L, 32.0, 80.0), (12L, 32.0, 33.0),
        (13L, 90.0, 96.0))
      .toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(points, "p", intervals, "lo", "hi", cellWidth = 32.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, s"got $got want $want")
    // hi is exclusive, lo inclusive: point 5 (48.0) must NOT match [0,48)
    assert(!got.contains((5L, 10L)) && got.contains((3L, 11L)))
  }

  test("stream-table join honors table upsert semantics (late region move)") {
    import spark.implicits._

    // clicks: (user, clicks, ts)
    val clicks = Seq(
      ("uma", 10L, 1L), ("vic", 20L, 2L), ("uma", 5L, 3L),
      ("wes", 40L, 4L), ("vic", 7L, 5L), ("uma", 2L, 6L)
    ).toDF("user", "clicks", "ts")

    // region changelog: uma starts in north, MOVES to south at ts=9
    val regionUpdates = Seq(
      ("uma", "north", 1L), ("vic", "east", 2L), ("wes", "west", 3L),
      ("uma", "south", 9L) // the upsert: latest wins for ALL of uma's clicks
    ).toDF("user", "region", "uts")

    val regionTable = TableView.latestPerKey(regionUpdates, Seq("user"), col("uts"), col("uts"))
    val joined = Joins.streamTableJoin(clicks, regionTable.withColumnRenamed("user", "tuser"),
      "user", "tuser", "inner")
    val perRegion = joined.groupBy("region").agg(sum("clicks").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // uma's 10+5+2=17 all count toward south (not north)
    assert(perRegion === Map("south" -> 17L, "east" -> 27L, "west" -> 40L))
  }

  test("table-table join reflects both sides' latest values") {
    import spark.implicits._
    val left = Seq(("k1", 1L, 1L), ("k1", 2L, 2L), ("k2", 5L, 1L)).toDF("k", "v", "ts")
    val right = Seq(("k1", 10L, 1L), ("k3", 30L, 1L)).toDF("k", "v", "ts")
    val lt = TableView.latestPerKey(left, Seq("k"), col("ts"), col("v"))
      .select(col("k"), col("v").as("lv"))
    val rt = TableView.latestPerKey(right, Seq("k"), col("ts"), col("v"))
      .select(col("k").as("rk"), col("v").as("rv"))

    val outer = Joins.tableTableJoin(lt, rt, "k", "rk", "outer")
      .select(coalesce(col("k"), col("rk")).as("key"), col("lv"), col("rv"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(outer === Set(
      ("k1", Some(2L), Some(10L)), // k1 latest on the left is 2, not 1
      ("k2", Some(5L), None),
      ("k3", None, Some(30L))))
  }

  test("J9 dispatch maps the reference join-type vocabulary") {
    assert(Joins.sparkJoinType("inner") === "inner")
    assert(Joins.sparkJoinType("left") === "left_outer")
    assert(Joins.sparkJoinType("outer") === "full_outer")
  }

  test("windowed stream-stream join matches only within the time window") {
    import spark.implicits._
    val l = Seq((1L, "k", 1000000L), (2L, "k", 9000000L)).toDF("id", "k", "ts_us")
    val r = Seq((10L, "k", 1500000L), (11L, "k", 99000000L), (12L, "z", 1000000L)).toDF("id", "k", "ts_us")
    val inner = Joins.windowedJoin(l, r, "k", "ts_us", "id", 1000000L, "inner")
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(inner === Set((1L, 10L))) // only pair within ±1s on the same key

    val left = Joins.windowedJoin(l, r, "k", "ts_us", "id", 1000000L, "left")
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    assert(left === Set((1L, Some(10L)), (2L, None)))

    val outer = Joins.windowedJoin(l, r, "k", "ts_us", "id", 1000000L, "outer")
      .select("l_id", "r_id").collect()
      .map(x => (Option(x.get(0)), Option(x.get(1)))).toSet
    assert(outer === Set(
      (Some(1L), Some(10L)), (Some(2L), None), (None, Some(11L)), (None, Some(12L))))
  }

  test("as-of join attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val trades = Seq((1L, "k", 1000L), (2L, "k", 5000L), (3L, "k", 100L)).toDF("id", "k", "ts_us")
    val quotes = Seq((10L, "k", 500L), (11L, "k", 4000L), (12L, "k", 9999L), (13L, "z", 1L))
      .toDF("id", "k", "ts_us")
    val out = Joins.asofJoin(trades, quotes, "k", "ts_us", "left")
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out === Map(
      1L -> Some(10L),  // latest quote <= 1000 is 500
      2L -> Some(11L),  // latest quote <= 5000 is 4000 (not 9999)
      3L -> None))      // no quote at or before 100
    val inner = Joins.asofJoin(trades, quotes, "k", "ts_us", "inner")
    assert(inner.count() === 2)
  }

  test("as-of join is inclusive at equal timestamps") {
    import spark.implicits._
    val l = Seq((1L, "k", 1000L)).toDF("id", "k", "ts_us")
    val r = Seq((10L, "k", 1000L)).toDF("id", "k", "ts_us")
    val out = Joins.asofJoin(l, r, "k", "ts_us", "left").select("r_id").collect()
    assert(out.head.getLong(0) === 10L)
  }

  test("windowed join boundary is inclusive on both edges") {
    import spark.implicits._
    val l = Seq((1L, "k", 5000000L)).toDF("id", "k", "ts_us")
    val r = Seq((10L, "k", 4000000L), (11L, "k", 6000000L), (12L, "k", 6000001L)).toDF("id", "k", "ts_us")
    val inner = Joins.windowedJoin(l, r, "k", "ts_us", "id", 1000000L, "inner")
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(inner === Set(10L, 11L)) // exactly ±window matches; +window+1µs does not
  }
}
