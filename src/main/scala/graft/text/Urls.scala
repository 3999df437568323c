package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing, normalization, and the registrable-domain heuristic —
  * the crawl pipeline's grouping key factory: dedup quotas, domain
  * blocklists, per-site quality priors and crawl budgets all key on the
  * REGISTERED domain, not the raw host ([[graft.ops.Splits.byGroup]]'s
  * natural `groupCol`). No java.net.URI, no public-suffix list file:
  * the whole pass is portable-regex column algebra (codegen'd,
  * SQL-replayable — the [[Extract]] convention), with the suffix rule
  * approximated by the standard "{co,com,org,net,ac,gov,edu}.<cc>"
  * second-level heuristic (a real PSL swap-in is a broadcast join on
  * the same host column).
  *
  * Normalization: scheme and host lowercased, userinfo and explicit
  * ports dropped, fragment dropped, tracking params (utm_*, fbclid,
  * gclid) filtered in place (order preserved), trailing slash trimmed.
  * Everything row-local — one projection, no shuffle.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):"
  private val HostportRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"
  private val CcSldRe = "([^.]+\\.(?:co|com|org|net|ac|gov|edu)\\.[a-z][a-z])$"
  private val PlainRe = "([^.]+\\.[^.]+)$"
  private val TrackRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  /** Adds scheme, host, registered_domain, path, depth, n_params,
    * url_norm. Malformed rows (no scheme://host) yield empty host and
    * pass through flagged by host = '' — never failed.
    */
  def parse(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val hostport = lower(regexp_extract(u, HostportRe, 1))
    val host = regexp_replace(regexp_replace(hostport, "^[^@]*@", ""), ":[0-9]+$", "")
    val bare = regexp_replace(col("host"), "^www\\.", "")
    val regDomain = when(col("host") === "", lit(""))
      .otherwise(coalesce(
        when(regexp_extract(bare, CcSldRe, 1) =!= "", regexp_extract(bare, CcSldRe, 1)),
        when(regexp_extract(bare, PlainRe, 1) =!= "", regexp_extract(bare, PlainRe, 1)),
        bare))
    val path = regexp_extract(u, PathRe, 1)
    val query = regexp_extract(u, QueryRe, 1)
    val kept = filter(
      split(col("__q"), "&"),
      p => p =!= "" && !p.rlike(TrackRe))
    val pathNorm = when(col("path").rlike(".+/$"), expr("substring(path, 1, length(path) - 1)"))
      .otherwise(col("path"))

    df.withColumn("scheme", scheme)
      .withColumn("host", host)
      .withColumn("registered_domain", regDomain)
      .withColumn("path", path)
      .withColumn("depth", regexp_count(col("path"), lit("[^/]+")).cast("long"))
      .withColumn("__q", query)
      .withColumn("n_params", regexp_count(col("__q"), lit("[^&]+")).cast("long"))
      .withColumn("__kept", array_join(kept, "&"))
      .withColumn("url_norm",
        when(col("host") === "", lit(""))
          .otherwise(concat(
            col("scheme"), lit("://"), col("host"), pathNorm,
            when(col("__kept") =!= "", concat(lit("?"), col("__kept"))).otherwise(lit("")))))
      .drop("__q", "__kept")
  }

  /** Per registered domain: url count, distinct hosts, mean path depth
    * (4dp), tracking-param url share (4dp) — the crawl-budget
    * dashboard. One parse projection + one keyed aggregate.
    */
  def domainStats(df: DataFrame, urlCol: String): DataFrame =
    parse(df, urlCol)
      .where(col("host") =!= "")
      .withColumn("__tracked",
        when(regexp_extract(col(urlCol), QueryRe, 1).rlike("(^|&)(utm_|fbclid=|gclid=)"), 1)
          .otherwise(0))
      .groupBy(col("registered_domain"))
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"),
        round(avg(col("depth").cast("double")), 4).as("avg_depth"),
        round(avg(col("__tracked").cast("double")), 4).as("tracked_share"))
}
