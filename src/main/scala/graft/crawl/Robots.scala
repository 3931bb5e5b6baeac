package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-politeness URL filtering per RFC 9309 (the Robots Exclusion
  * Protocol): each URL is judged by ITS HOST's rule group — among the
  * rules whose path prefix matches the URL's path, the LONGEST prefix
  * wins; at equal length, Allow beats Disallow; a URL with no matching
  * rule is allowed. (The `$`-anchor and `*`-wildcard extensions are out
  * of scope here — plain-prefix rules are the overwhelming majority of
  * real robots.txt lines and are what this stage certifies.)
  *
  * Scale shape: robots corpora are tiny relative to URL sets (a few KB
  * of rules per host vs billions of URLs), so the rules BROADCAST and
  * the whole verdict is one broadcast join + one per-URL aggregation
  * riding the join's output — no per-URL window over raw data, no
  * shuffle of the URL set beyond its own aggregation exchange.
  */
object Robots {

  /** Verdict per distinct URL: (url, allowed, matched_prefix).
    * `rules` must carry (host, prefix, allow).
    */
  def verdicts(urls: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val u = urls.select(col(urlCol).as("url")).distinct()
      .withColumn("host", regexp_extract(col("url"), "^https?://([^/]+)", 1))
      .withColumn("path",
        when(length(regexp_extract(col("url"), "^https?://[^/]+(/.*)$", 1)) > 0,
          regexp_extract(col("url"), "^https?://[^/]+(/.*)$", 1))
          .otherwise(lit("/")))
    // ONE LEFT join, ONE aggregation — `u` has a single consumer, so the
    // URL extraction scan runs once (the inner-join + join-back form
    // read it twice: the inner join's inferred filters and pruning
    // specialized one branch apart — r16 plan audit). A URL with no
    // matching rule keeps null rule fields; its winner struct is
    // all-null and loses to any real match (struct ordering ranks null
    // fields first), and coalesce turns a never-matched URL into the
    // RFC's default ALLOW.
    u.join(broadcast(rules),
        u("host") === rules("host") && col("path").startsWith(col("prefix")),
        "left")
      // winner: max(struct(prefix length, allow, prefix)) — longest
      // match first, Allow beats Disallow at equal length (RFC 9309
      // §2.2.2), the prefix string itself as a deterministic tiebreak
      .groupBy(col("url"))
      .agg(max(struct(length(col("prefix")).as("l"), col("allow").as("a"),
        col("prefix").as("p"))).as("w"))
      .select(col("url"),
        coalesce(col("w.a"), lit(true)).as("allowed"),
        col("w.p").as("matched_prefix"))
  }

  /** The filter form: keep only crawlable URLs. */
  def filter(urls: DataFrame, urlCol: String, rules: DataFrame): DataFrame =
    verdicts(urls, urlCol, rules).where(col("allowed")).select(col("url").as(urlCol))
}
