package graft

import graft.sources.Npy
import graft.crawl.Robots
import org.apache.spark.sql.functions._

/** Byte-level npy contract + RFC 9309 verdict edge cases. */
class NpyRobotsSpec extends GraftTest {

  test("npy: roundtrip header + data, 64-byte alignment, 1-tuple shape form") {
    val data = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0)
    val b = Npy.encode("<i8", Seq(2L), data)
    val (h, off) = Npy.parseHeader(b)
    assert(h.descr === "<i8" && h.shape === Seq(2L) && !h.fortran)
    assert(off % 64 === 0, "data must start 64-byte aligned")
    assert(java.util.Arrays.equals(java.util.Arrays.copyOfRange(b, off, b.length), data))
    // the header dict uses the python 1-tuple spelling "(2,)"
    assert(new String(b, 10, off - 10, "US-ASCII").contains("(2,)"))
  }

  private def expectBad(b: Array[Byte], fragment: String): Unit = {
    val e = intercept[IllegalArgumentException](Npy.parseHeader(b))
    assert(e.getMessage.startsWith("npy:") && e.getMessage.contains(fragment), e.getMessage)
  }

  test("npy: strict validation failures") {
    val good = Npy.encode("<f4", Seq(1L, 2L), Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    expectBad(badMagic, "bad magic")
    // unsupported version
    val badVer = good.clone(); badVer(6) = 3
    expectBad(badVer, "unsupported version")
    // torn data (shape disagrees with remaining bytes)
    expectBad(java.util.Arrays.copyOf(good, good.length - 4), "shape")
    // fortran order rejected
    val f = new String(good, 10, good.length - 10 - 8, "US-ASCII")
      .replace("False", "True ")
    val fortran = java.util.Arrays.copyOf(good, good.length)
    System.arraycopy(f.getBytes("US-ASCII"), 0, fortran, 10, f.length)
    expectBad(fortran, "fortran_order")
  }

  test("robots: longest match, equal-length Allow tie, no-match allowed, bare-host path is /") {
    import spark.implicits._
    val urls = Seq(
      "https://h.com/p1",        // Disallow /p1
      "https://h.com/p12",       // /p12 allow carve-out beats /p1
      "https://h.com/other",     // no matching rule -> allowed
      "https://h.com",           // bare host -> path "/", no rule on "/" for h.com
      "https://tie.com/x7",      // equal-length /x7 allow+disallow -> Allow wins
      "https://blanket.org/any"  // blanket Disallow /
    ).toDF("u")
    val rules = Seq(
      ("h.com", "/p1", false), ("h.com", "/p12", true),
      ("tie.com", "/x7", false), ("tie.com", "/x7", true),
      ("blanket.org", "/", false)).toDF("host", "prefix", "allow")
    val got = Robots.verdicts(urls, "u", rules)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("https://h.com/p1") === false)
    assert(got("https://h.com/p12") === true, "longer Allow must win")
    assert(got("https://h.com/other") === true)
    assert(got("https://h.com") === true, "bare host normalizes to path /")
    assert(got("https://tie.com/x7") === true, "RFC 9309: Allow wins equal-length ties")
    assert(got("https://blanket.org/any") === false)
    // filter form keeps exactly the allowed set
    val kept = Robots.filter(urls, "u", rules).collect().map(_.getString(0)).toSet
    assert(kept === got.filter(_._2).keySet)
  }
}
