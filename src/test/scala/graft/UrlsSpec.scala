package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize($"u")).as[String].collect().toSeq

  test("canonicalize: case, default ports, dot-segments, tracking params, " +
      "fragments") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/./b/../c?utm_source=x&z=1&a=2#frag",
      "http://h.org:8080/kept/port",
      "hTtp://h.org:80/x",
      "http://h.org",
      "http://h.org/../../up/above/root",
      "http://h.org/x/y/",                    // trailing slash collapses
      "http://h.org/x?gclid=1&utm_medium=m",  // tracking-only query drops ?
      "http://h.org/x?b=2&a=1&a=0"            // byte-sort, duplicates kept
    ) === Seq(
      "https://www.example.com/a/c?a=2&z=1",
      "http://h.org:8080/kept/port",
      "http://h.org/x",
      "http://h.org/",
      "http://h.org/up/above/root",
      "http://h.org/x/y",
      "http://h.org/x",
      "http://h.org/x?a=0&a=1&b=2"))
  }

  test("canonicalize: unparseable and schemeless inputs go to NULL") {
    val got = Seq("not a url at all ://", "relative/path/only", "")
      .toDF("u").select(Urls.canonicalize($"u")).collect().map(_.isNullAt(0))
    assert(got.forall(identity), "junk inputs must canonicalize to NULL")
  }

  test("registrableDomain: longest suffix wins; suffix-only hosts are NULL; " +
      "unknown TLDs fail closed to the host") {
    val suffixes = Seq("uk", "co.uk", "com")
    val got = Seq("shop.site3.co.uk", "site3.co.uk", "co.uk", "uk",
        "www.example.com", "deep.a.b.example.com", "host.internal")
      .toDF("h")
      .select(Urls.registrableDomain($"h", suffixes)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got === Seq("site3.co.uk", "site3.co.uk", null, null,
      "example.com", "example.com", "host.internal"))
  }

  test("q237 schedule: every doc slotted once, per-host slots advance by " +
      "exactly the host's delay, rounds fold at 10s") {
    val out = SparkEntry.queries("q237_crawl_schedule")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2).sorted ===
      Tables.load(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted.toSeq)
    out.groupBy(_._1).foreach { case (host, g) =>
      val d = 250L * (1 + host.length % 4)
      assert(g.forall(_._4 == d), host)
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._3) === (1L to g.size).toSeq, host)
      byRank.foreach { r =>
        assert(r._5 === (r._3 - 1) * d, host)
        assert(r._6 === r._5 / 10000, host)
      }
    }
    // politeness is host-local: distinct hosts may share slot 0
    assert(out.count(_._5 == 0L) === out.map(_._1).distinct.size)
  }

  test("q224 fixture collapses the corpus ~21:1 onto 24 canonical URLs " +
      "with full dedup-group coverage") {
    val out = SparkEntry.queries("q224_url_canonicalize")(spark, sfDir)
      .collect()
    assert(out.length === 24)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.load(spark, sfDir, "documents").count())
  }
}
