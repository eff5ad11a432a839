package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._

/** Per-check arithmetic and the one-pass fusion contract of the
  * data-contract engine (q350 hash-gates the planted corpus census).
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Option("a"), 5.0, "ok", "O"),
    (2L, None, -1.0, "ok", "O"),       // null name, range breach
    (3L, Option("c"), 5.0, "bad!", "X"), // regex + set breach
    (3L, Option("d"), 5.0, "ok", "F"), // duplicate key
    (4L, Option("e"), 99.0, "ok", "P") // range breach (hi)
  ).toDF("id", "name", "score", "tag", "status")

  private def census(checks: Seq[Check]): Map[(String, String), Long] =
    Expectations.validate(fixture, checks).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("row-local checks count exactly the planted violations") {
    val c = census(Seq(NotNull("name"), InRange("score", 0.0, 10.0),
      Matches("tag", "[a-z]+"), InSet("status", Seq("O", "F", "P"))))
    assert(c(("not_null", "name")) === 1L)
    assert(c(("in_range", "score")) === 2L)
    assert(c(("matches", "tag")) === 1L)
    assert(c(("in_set", "status")) === 1L)
  }

  test("unique-key counts rows beyond the first; ref-integrity counts orphans") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val c = census(Seq(UniqueKey(Seq("id")), RefIntegrity("id", dim, "k")))
    assert(c(("unique_key", "id")) === 1L, "one excess row for key 3")
    assert(c(("ref_integrity", "id")) === 1L, "id 4 has no dim match")
  }

  test("a clean frame validates to all-zero violations with full n_rows") {
    val clean = fixture.filter($"id" === 1L)
    val rows = Expectations.validate(clean, Seq(NotNull("name"),
      InRange("score", 0.0, 10.0), UniqueKey(Seq("id")))).collect()
    assert(rows.forall(_.getLong(2) == 0L))
    assert(rows.forall(_.getLong(3) == 1L))
  }

  test("row-local checks fuse into ONE scan (never a job per check)") {
    val o = Tables.load(spark, sfDir, "orders")
    val plan = Expectations.validate(o, Seq(NotNull("o_orderdate"),
      InRange("o_totalprice", 0.0, 1e9),
      InSet("o_orderstatus", Seq("O", "F", "P"))))
      .queryExecution.executedPlan.toString()
    val nScans = "Scan parquet".r.findAllIn(plan).length
    assert(nScans === 1,
      s"expected one fused scan for 3 row-local checks, got $nScans")
  }

  test("NULL values pass range/regex/set checks (not-null is its own check)") {
    val d = Seq((1L, Option.empty[String])).toDF("id", "v")
    val c = Expectations.validate(d, Seq(Matches("v", ".*"),
      InSet("v", Seq("x")))).collect()
    assert(c.forall(_.getLong(2) == 0L),
      "NULL must not count against value-shape checks")
  }
}
