package graft.text

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String) =
    Urls.parse(Seq((1L, url)).toDF("id", "url"), "url").collect().head

  test("full URL decomposes; tracking params dropped in place; fragment and port gone") {
    val r = one("HTTPS://www.news.example.com:8080/world/2024/story-1/?utm_source=x&id=7&gclid=z#frag")
    assert(r.getAs[String]("scheme") == "https")
    assert(r.getAs[String]("host") == "www.news.example.com")
    assert(r.getAs[String]("registered_domain") == "example.com")
    assert(r.getAs[String]("path") == "/world/2024/story-1/")
    assert(r.getAs[Long]("depth") == 3L)
    assert(r.getAs[Long]("n_params") == 3L)
    assert(r.getAs[String]("url_norm") == "https://www.news.example.com/world/2024/story-1?id=7")
  }

  test("co.uk second-level heuristic; bare domain; userinfo stripped") {
    assert(one("https://shop.brand.co.uk/a").getAs[String]("registered_domain") == "brand.co.uk")
    assert(one("https://example.org").getAs[String]("registered_domain") == "example.org")
    assert(one("https://user:pw@secure.example.net/x").getAs[String]("host") == "secure.example.net")
  }

  test("malformed rows flag as empty host, never fail") {
    val r = one("not a url")
    assert(r.getAs[String]("host") == "" && r.getAs[String]("url_norm") == "")
    assert(r.getAs[Long]("depth") == 0L)
  }

  test("domainStats aggregates by registered domain across hosts") {
    val urls = Seq(
      (1L, "https://www.a.example.com/x/y?utm_source=1"),
      (2L, "https://b.example.com/x"),
      (3L, "https://example.com/"),
      (4L, "https://other.org/deep/path/here"),
      (5L, "bad")).toDF("id", "url")
    val m = Urls.domainStats(urls, "url").collect()
      .map(r => r.getAs[String]("registered_domain") ->
        ((r.getAs[Long]("n_urls"), r.getAs[Long]("n_hosts"), r.getAs[Double]("tracked_share"))))
      .toMap
    assert(m("example.com") == ((3L, 3L, 0.3333)))
    assert(m("other.org") == ((1L, 1L, 0.0)))
    assert(!m.contains(""))
  }
}
