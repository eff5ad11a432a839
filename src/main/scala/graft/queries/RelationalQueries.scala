package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator battery — every SURVEY.md §2 operator class
  * (scan, projection, filter, join, aggregation, sort/limit) re-expressed
  * over the driver testdata, each with a DuckDB oracle.
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *  - every floating aggregate is `round(...)`-ed (sum→2dp, avg/ratio→6dp)
  *    because double addition is order-sensitive under parallel partial
  *    aggregation;
  *  - every query ends in a total ORDER BY, mirrored in the oracle;
  *  - every computed column is aliased identically on both sides.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val queries: Map[String, Q] = Map(
    // CMS join-size estimation gate — the planner question "how big is
    // this join" answered from two depth×width sketches instead of
    // running the join (Cormode-Muthukrishnan inner-product estimator).
    // Two laws gate it: est ≥ exact ALWAYS (counters only over-count —
    // a deterministic inequality), and est ≤ exact + e·N_a·N_b/width
    // (Markov over the min of depth rows; fixed seeds over fixed data
    // make it deterministic here). Cases: the orders⋈lineitem FK join
    // and the events.user_id SELF-join size (= F2, the quantity that
    // prices a skewed shuffle). Sketches merge by element-wise add, so
    // at 100 TB each side builds map-side in one pass; the referee
    // joins are sf-bounded gate work only.
    "q188_cms_joinsize_gate" -> ((s, dir) => {
      import graft.operators.Sketches
      val depth = 5; val width = 4096
      def sk(df: DataFrame, c: String) =
        Sketches.cmsSketch(df.select(col(c).as("k")).withColumn("g", lit(1)),
          Seq("g"), "k", depth, width).select(col("cms"))
      def exactJoin(a: DataFrame, ac: String, b: DataFrame, bc: String) =
        a.groupBy(col(ac).as("k")).agg(count(lit(1)).as("ca"))
          .join(b.groupBy(col(bc).as("k")).agg(count(lit(1)).as("cb")), "k")
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_v"))
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val ev = Tables.load(s, dir, "events")
      val cases = Seq(
        ("orders_lineitem",
          sk(li, "l_orderkey"), sk(o, "o_orderkey"),
          exactJoin(li, "l_orderkey", o, "o_orderkey"),
          li.count() * o.count()),
        ("events_selfjoin",
          sk(ev, "user_id"), sk(ev, "user_id"),
          exactJoin(ev, "user_id", ev, "user_id"),
          ev.count() * ev.count()))
      cases.map { case (label, sa, sb, exact, nanb) =>
        sa.crossJoin(sb.withColumnRenamed("cms", "cmsb"))
          .crossJoin(exact)
          .select(lit(label).as("label"), col("exact_v"),
            Sketches.cmsJoinSize(col("cms"), col("cmsb"), depth, width)
              .as("est_v"),
            round(lit(math.E * nanb.toDouble / width), 6).as("slack"))
      }.reduce(_.unionByName(_))
        .filter(col("est_v") < col("exact_v") ||
          col("est_v") > col("exact_v") + col("slack"))
        .orderBy("label")
    }),

    // Universe (join-consistent) sampling — BlinkDB/Quickr's move for
    // approximating JOINS: independent per-table Bernoulli samples
    // destroy join pairs (P both survive = p²), so both tables instead
    // keep a row iff the multiplicative hash of the JOIN KEY falls in
    // the same 1/8 slice — the sampled fact joins the sampled dim with
    // ZERO orphans BY CONSTRUCTION (same key ⇒ same hash ⇒ same
    // decision), no coordination, no key exchange: each side filters
    // map-side at the scan. The n_orphans audit column pins the
    // integrity claim inside the gate; the aggregate over the sampled
    // join is hash-checked exactly (the q45/q70 hash, engine-shared).
    "q196_universe_sample" -> ((s, dir) => {
      def keep(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        pmod(k * lit(2654435761L), lit(4294967296L)) < lit(536870912L)
      val o = t(s, dir, "orders").filter(keep(col("o_orderkey")))
      val l = t(s, dir, "lineitem").filter(keep(col("l_orderkey")))
      val orphans = broadcast(
        l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphans")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("net"))
        .crossJoin(orphans)
        .orderBy("o_orderpriority")
    }),

    // A1/A9 hash aggregation (reference transform_spark.py:127-136 shape):
    // partial+final agg, one shuffle on the group keys.
    "q01_agg_returnflag" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          round(max("l_extendedprice"), 2).as("max_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A9/O4 top-k: TakeOrderedAndProject — no global sort at scale.
    "q02_topk_customers" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(round(sum("o_totalprice"), 2).as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(desc("total_spend"), asc("o_custkey"))
        .limit(10)
    }),

    // A10 avg by group (reference notebook Q2 shape).
    "q03_avg_by_priority" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(avg("o_totalprice"), 6).as("avg_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // A2 countDistinct (reference agg_store_type_year shape).
    "q04_countdistinct_status" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          round(sum("o_totalprice"), 2).as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // A3 holidays_vs_normal shape: group by derived year + category.
    "q05_events_yearly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"), year(col("ts")).cast("bigint").as("yr"),
          month(col("ts")).cast("bigint").as("mth"))
        .agg(round(sum("value"), 2).as("sum_value"),
          round(avg("value"), 6).as("avg_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "yr", "mth")
    }),

    // A5 full-row DISTINCT on a narrow projection.
    "q06_distinct_flags" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A6/F2 HAVING-style duplicate-group detection
    // (reference quality_checks.py:90).
    "q07_dup_groups" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("o_custkey")
    }),

    // A8 null-fraction profiler — single-pass rewrite of the reference's
    // N+1-job version (quality_checks.py:73-79): one aggregate job for
    // all columns. At 100 TB this is 1 scan instead of N+1.
    "q08_null_profile" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def frac(c: String) =
        round(avg(when(col(c).isNull || col(c) === "", 1.0d).otherwise(0.0d)), 9)
      d.agg(
        frac("text").as("frac_text"),
        frac("lang").as("frac_lang"),
        frac("source").as("frac_source"),
        count(lit(1)).as("n_rows"))
    }),

    // J1 composite-key LEFT join (reference transform_spark.py:96-100):
    // fact left-joined to a keyed derived table on two equi keys.
    "q09_join_composite" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val g = o.groupBy(col("o_custkey").as("ck"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n_same"),
          round(sum("o_totalprice"), 2).as("grp_total"))
      o.join(g, o("o_custkey") === g("ck") && o("o_orderstatus") === g("st"), "left")
        .select(o("o_orderkey"), o("o_custkey"), o("o_orderstatus"),
          g("n_same"), g("grp_total"))
        .orderBy("o_orderkey")
    }),

    // J2 USING-style join: single shared key column collapses in output
    // (reference transform_spark.py:102).
    "q10_join_using" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
      l.join(o, Seq("l_orderkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"),
          round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")), 4).as("net"))
        .orderBy("l_orderkey", "l_linenumber", "net")
    }),

    // Broadcast-hash joins: dims are tiny → explicit broadcast() so the
    // plan never shuffles the fact side (SURVEY §2.4 physical note).
    "q11_broadcast_dims" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val sup = t(s, dir, "supplier")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // Star-schema multi-join: fact → orders → customer → nation → region,
    // dims broadcast, one shuffle for the final agg.
    "q12_star_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // Window functions: row_number + running sum per key (deterministic
    // frame ordering → the running double sum is order-pinned).
    "q13_window_funcs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("bigint").as("rn"),
          round(sum(col("o_totalprice")).over(wf), 2).as("running_spend"))
        .orderBy("o_custkey", "rn")
    }),

    // Declarative referential-integrity audit (the dbt-test / data-
    // contract layer a warehouse runs after every load): each rule is
    // ONE anti-join (FK) or keyed aggregate (uniqueness, not-null),
    // and the audit emits a rule-count-sized violations table — at
    // 100 TB the FK anti-joins broadcast the dim or shuffle on the key
    // like any join, and the counts fold map-side. The clean synthetic
    // schema would make every FK rule vacuous, so the lineitem→orders
    // check runs against a PLANTED lost partition (orders with
    // o_orderkey % 97 == 0 dropped — the "one file of the dim didn't
    // land" incident): orphan counts emerge deterministically and the
    // oracle mirrors the plant.
    "q169_integrity_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val ordLossy = ord.filter(col("o_orderkey") % 97 =!= 0)
      def one(name: String, viol: DataFrame) =
        viol.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"))
      Seq(
        one("fk_lineitem_orders_after_loss",
          li.join(ordLossy, col("l_orderkey") === col("o_orderkey"),
            "left_anti")),
        one("fk_orders_customer",
          ord.join(cust, col("o_custkey") === col("c_custkey"),
            "left_anti")),
        one("unique_orderkey",
          ord.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)),
        one("notnull_l_orderkey", li.filter(col("l_orderkey").isNull)))
        .reduce(_ unionByName _)
        .orderBy("check_name")
    }),

    // ROLLUP grouping sets with explicit grouping flags.
    "q14_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast("bigint").as("g"),
          round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(col("g"), col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("g"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Set operations: INTERSECT / EXCEPT / UNION ALL in one result.
    "q15_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
      val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
      f.intersect(p).withColumn("tag", lit("both"))
        .unionAll(f.except(p).withColumn("tag", lit("f_only")))
        .unionAll(p.except(f).withColumn("tag", lit("o_only")))
        .select(col("tag"), col("o_custkey"))
        .orderBy("tag", "o_custkey")
    }),

    // P1 rename-by-map projection incl. missing-column null fill
    // (reference transform_spark.py:38-45 semantics).
    "q16_rename_project" -> ((s, dir) => {
      val mapping = Seq(
        "c_custkey" -> "customer_id",
        "c_name" -> "name",
        "c_mktsegment" -> "segment",
        "loyalty_tier" -> "loyalty_tier") // absent in source -> typed null
      val c = t(s, dir, "customer")
      c.select(mapping.map { case (o, n) =>
        if (c.columns.contains(o)) col(o).as(n)
        else lit(null).cast("string").as(n)
      }: _*).orderBy("customer_id")
    }),

    // P2 schema-enforcing projection: cast present, add missing as typed
    // null, prune+reorder (reference quality_checks.py:49-63).
    "q17_schema_enforce" -> ((s, dir) => {
      val expected = Seq( // declared (name, type) like pipeline_config.yaml:28-52
        "p_partkey" -> "bigint",
        "p_name" -> "string",
        "p_size" -> "double",   // declared wider than the source int
        "p_retailprice" -> "double",
        "p_category" -> "string") // missing in source -> typed null
      val p0 = t(s, dir, "part")
      val withCasts = expected.foldLeft(p0) { case (df, (c, ty)) =>
        if (df.columns.contains(c)) df.withColumn(c, col(c).cast(ty))
        else df.withColumn(c, lit(null).cast(ty))
      }
      withCasts.select(expected.map(e => col(e._1)): _*).orderBy("p_partkey")
    }),

    // P5 derived date parts (reference transform_spark.py:54-61).
    "q18_date_parts" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"),
          year(col("o_orderdate")).cast("bigint").as("yr"),
          month(col("o_orderdate")).cast("bigint").as("mth"),
          quarter(col("o_orderdate")).cast("bigint").as("qtr"),
          weekofyear(col("o_orderdate")).cast("bigint").as("wk"))
        .orderBy("o_orderkey")
    }),

    // F1 predicate filter — pushed into the parquet scan (verified via
    // .explain PushedFilters in the spec).
    "q19_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01 00:00:00").cast("timestamp")
          && col("l_discount") >= 0.05d && col("l_quantity") < 10.0d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")), 4).as("net"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "net")
    }),

    // Semi-structured: JSON field extraction + aggregation.
    "q20_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(sum("k").as("sum_k"), round(avg("k"), 6).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // PIVOT: one column per pivoted key value (explicit value list keeps
    // the schema static — the scale-safe form; inferring values needs an
    // extra pass).
    "q51_pivot_status" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0.0)).as("f_total"),
          coalesce(col("O"), lit(0.0)).as("o_total"),
          coalesce(col("P"), lit(0.0)).as("p_total"))
        .orderBy("o_orderpriority")
    }),

    // CUBE grouping sets (all 4 combinations) with grouping flags.
    "q52_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("bigint").as("g"),
          round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
        .select(col("g"), col("o_orderstatus"), col("o_orderpriority"),
          col("total"), col("n"))
        .orderBy(col("g"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // The SQL surface end-to-end: temp view + spark.sql text using the
    // GraftExtensions-registered kernel functions — proves the SQL path
    // (parser → our FunctionRegistry entries → codegen) under the same
    // oracle gate as the Column API.
    "q53_sql_surface" -> ((s, dir) => {
      graft.GraftSession.tune(s)
      Tables.load(s, dir, "documents").createOrReplaceTempView("docs_v")
      s.sql(
        """SELECT doc_id,
          |  rolling_fingerprint(text) AS fp,
          |  size(shingle_hash_set(text, 3)) AS n_shingles
          |FROM docs_v ORDER BY doc_id""".stripMargin)
    }),

    // Bucketed co-located join: both sides persisted bucketed+sorted on
    // the key, so the join plans with NO exchange and no sort — the
    // pay-the-shuffle-once-at-write-time strategy for repeatedly-joined
    // 100 TB fact tables (BucketingSpec asserts the zero-Exchange plan;
    // here the RESULT is under the hash gate). Broadcast is disabled for
    // the join so the bucket layout, not a broadcast, replaces the
    // exchange — the plan shape that matters when neither side fits in
    // memory. The merge hint (not a session-conf flip, which a lazy
    // DataFrame would outlive) pins the sort-merge path the buckets
    // accelerate.
    "q63_bucketed_join" -> ((s, dir) => {
      graft.Bucketing.ensureBucketedTable(
        t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "bq_lineitem", buckets = 8, key = "l_orderkey",
        token = dir + "|" + graft.Tables.sourceToken(dir, "lineitem"))
      graft.Bucketing.ensureBucketedTable(
        t(s, dir, "orders").select("o_orderkey", "o_orderstatus"),
        "bq_orders", buckets = 8, key = "o_orderkey",
        token = dir + "|" + graft.Tables.sourceToken(dir, "orders"))
      s.table("bq_lineitem").hint("merge")
        .join(s.table("bq_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Runtime Bloom-filter join pruning — the shuffle-side complement to
    // q65's dynamic PARTITION pruning: when the join key is not a
    // partition column, Catalyst can still build a Bloom filter from the
    // selective dim side at runtime and apply it to the fact side
    // BEFORE the shuffle, so non-matching fact rows never enter the
    // exchange. At 100 TB (urgent orders ≈ 20% of keys) that is the
    // difference between shuffling the whole fact table and a fifth of
    // it. Demo-regime pinning, like SkewJoinSpec: at sf0.1 both sides
    // are broadcast-small and the injection heuristics would correctly
    // say "don't bother", so broadcast is disabled and the scan-size
    // floor dropped WHILE THE PLAN IS OPTIMIZED (then restored) to
    // reproduce the both-sides-huge regime where SMJ + Bloom is the
    // real plan. Semantics are a plain join — exactly what the oracle
    // checks; the might_contain filter is plan-asserted in PlanSpec.
    "q68_bloom_join" -> ((s, dir) => {
      val scanFloor = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
      val bcast = "spark.sql.autoBroadcastJoinThreshold"
      val prevFloor = s.conf.get(scanFloor)
      val prevBcast = s.conf.get(bcast)
      s.conf.set(scanFloor, "0")
      s.conf.set(bcast, "-1")
      try {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        val df = li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy("l_returnflag")
        // Pin THIS QueryExecution's optimized plan under the demo confs.
        // Honesty note: a downstream write/count builds a fresh
        // QueryExecution under the restored production confs, where the
        // injection heuristics correctly say "just broadcast" at this
        // scale — so Verify/Bench execute the plain join (same answer,
        // which is what the oracle checks) while the Bloom-filtered plan
        // is executed and result-checked through this df in PlanSpec.
        // At real scale no pinning exists: both sides exceed the
        // thresholds and the heuristics choose SMJ + Bloom on their own.
        df.queryExecution.optimizedPlan
        df
      } finally {
        s.conf.set(scanFloor, prevFloor)
        s.conf.set(bcast, prevBcast)
      }
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q21_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0d)
      val withBig = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey")).withColumn("tag", lit("has_big_order"))
      val noBig = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey")).withColumn("tag", lit("no_big_order"))
      withBig.unionAll(noBig).select(col("tag"), col("c_custkey"))
        .orderBy("tag", "c_custkey")
    }),

    // PageRank over the customer–supplier trading graph (orders ⋈
    // lineitem, symmetrized; node ids disjoint by parity), 5 damped
    // power-iteration rounds — THE iterative-join workload class
    // (GraphX/Pregel). Fixed rounds keep it a deterministic function of
    // the graph, so the oracle can unroll the identical recurrence as 5
    // CTE layers and take a full hash gate. Edge list + out-degrees are
    // checkpointed once; each round is one keyed join + one dst-keyed
    // aggregation over the node-sized rank relation.
    "q126_pagerank" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val e0 = o.join(l, "o_orderkey").select("src", "dst")
      val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graphs.pageRank(e, "src", "dst", iters = 5)
        .orderBy("node")
    }),

    // Personalized PageRank from a seed set (nation-0 customers):
    // graph-proximity relevance over the same trading graph — the
    // "find nodes like these seeds" selection primitive. Same fixed-
    // round/unrolled-CTE contract as q126; restart normalizes over
    // seeds ∩ nodes so out-of-graph seeds are inert.
    // Market-basket co-purchase lift — the co-occurrence mining op (the
    // relational analog of q101's PMI): per ORDER basket, distinct
    // supplier pairs, and lift = P(a,b)/(P(a)·P(b)) in exact ppm
    // (1e6·n_ab·n_orders div (n_a·n_b)). Baskets are orders, so the
    // per-basket quadratic is bounded by order width (~items per
    // order), NOT by customer history — the blocking that keeps
    // co-occurrence linear-ish at any corpus size; the pair relation
    // shuffles once into its census. Support floor 5, top-100 by
    // (lift, a, b) — a total order, so the cut cannot flip.
    "q263_copurchase_lift" -> ((s, dir) => {
      // The deduped basket feeds FOUR consumers (both self-join sides,
      // item counts, the order total) — cut once so lineitem scans
      // once, not once per consumer.
      val basket = graft.operators.Checkpoints.cut(
        t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("supp"))
          .distinct())
      val nOrders = broadcast(basket.select("ok").distinct()
        .agg(count(lit(1)).as("n_orders")))
      val item = basket.groupBy("supp").agg(count(lit(1)).as("n_item"))
      val pairs = basket.as("a")
        .join(basket.as("b"), col("a.ok") === col("b.ok")
          && col("a.supp") < col("b.supp"))
        .groupBy(col("a.supp").as("supp_a"), col("b.supp").as("supp_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      pairs
        .join(broadcast(item.select(col("supp").as("supp_a"),
          col("n_item").as("n_a"))), Seq("supp_a"))
        .join(broadcast(item.select(col("supp").as("supp_b"),
          col("n_item").as("n_b"))), Seq("supp_b"))
        .crossJoin(nOrders)
        .withColumn("lift_ppm",
          expr("(1000000 * n_ab * n_orders) div (n_a * n_b)"))
        .select("supp_a", "supp_b", "n_ab", "n_a", "n_b", "lift_ppm")
        .orderBy(col("lift_ppm").desc, col("supp_a"), col("supp_b"))
        .limit(100)
    }),

    // HITS hubs & authorities over the DIRECTED customer→supplier
    // trading graph (multiplicity kept: repeat trades endorse more
    // strongly) — the link-analysis complement of q126: PageRank ranks
    // by received mass, HITS separates good BUYERS (hubs) from good
    // SELLERS (authorities) by mutual reinforcement. Two exact-integer
    // rounds (see Graphs.hits: unnormalized scores stay BIGINT, so the
    // gate is a full hash with zero float-order hazard, unlike any
    // L2-normalized form). Per round: one keyed join + one agg over
    // the checkpointed edge invariant — the q126 cost profile.
    "q262_hits" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val e = o.join(l, "o_orderkey").select("src", "dst")
      graft.operators.Graphs.hits(e, "src", "dst", iters = 2)
        .orderBy("kind", "node")
    }),

    "q143_personalized_pagerank" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val e0 = o.join(l, "o_orderkey").select("src", "dst")
      val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "customer").filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("node"))
      graft.operators.Graphs.personalizedPageRank(e, "src", "dst",
          seeds, "node", iters = 5)
        .orderBy("node")
    }),

    // ANALYZE-style equi-height histogram (the CBO stats pass): 16
    // buckets over o_totalprice via an EXACT distributed global rank —
    // two-phase bin-offset prefix count, never a whole-table window
    // (PlanSpec pins the detail window to per-bin partitions). The
    // oracle states the semantics as the plain single-window
    // row_number + integer bucket arithmetic; the operator must be
    // indistinguishable. binSize=10000 forces ~50 real bins on the
    // fixture, so the gate exercises the multi-bin offset path.
    "q125_equiheight_histogram" -> ((s, dir) => {
      graft.operators.Profile.equiHeightHistogram(t(s, dir, "orders"),
          "o_totalprice", "o_orderkey", buckets = 16, binSize = 10000)
        .orderBy("bucket")
    })
  )

  val oracles: Map[String, String] = Map(
    // Referee gate: violations of the never-under / Markov-band laws —
    // correct sketch arithmetic makes it EMPTY.
    "q188_cms_joinsize_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS label, CAST(NULL AS BIGINT) AS exact_v,
        |  CAST(NULL AS BIGINT) AS est_v, CAST(NULL AS DOUBLE) AS slack
        |WHERE FALSE""".stripMargin,
    "q196_universe_sample" ->
      """WITH so AS (SELECT * FROM orders
        |    WHERE (o_orderkey * 2654435761) % 4294967296 < 536870912),
        | sl AS (SELECT * FROM lineitem
        |    WHERE (l_orderkey * 2654435761) % 4294967296 < 536870912),
        | orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans FROM sl
        |    WHERE NOT EXISTS (SELECT 1 FROM so WHERE o_orderkey = l_orderkey))
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(COUNT(DISTINCT so.o_orderkey) AS BIGINT) AS n_orders,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS net,
        |  (SELECT n_orphans FROM orph) AS n_orphans
        |FROM sl JOIN so ON sl.l_orderkey = so.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q169_integrity_audit" ->
      """WITH lost AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0),
        | a AS (SELECT 'fk_lineitem_orders_after_loss' AS check_name,
        |    COUNT(*) AS n_violations FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM lost o
        |    WHERE o.o_orderkey = l.l_orderkey)),
        | b AS (SELECT 'fk_orders_customer' AS check_name,
        |    COUNT(*) AS n_violations FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |    WHERE c.c_custkey = o.o_custkey)),
        | c AS (SELECT 'unique_orderkey' AS check_name,
        |    COUNT(*) AS n_violations FROM
        |    (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)),
        | d AS (SELECT 'notnull_l_orderkey' AS check_name,
        |    COUNT(*) AS n_violations FROM lineitem WHERE l_orderkey IS NULL)
        |SELECT * FROM a UNION ALL SELECT * FROM b
        |UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d
        |ORDER BY check_name""".stripMargin,
    // Ranks on the raw (value, id) order — both engines read identical
    // parquet doubles, so rank and min/max are exact; only avg is
    // accumulation-order-sensitive and 6dp-rounded. Bucket assignment is
    // pure BIGINT arithmetic (no float division to drift).
    // q126's unrolled recurrence with the restart mass sent to the
    // seed distribution instead of uniform: 0.15·r(v) + 0.85·mass.
    "q143_personalized_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        | e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        | deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        | nodes AS (SELECT DISTINCT src AS node FROM e),
        | sd AS (SELECT DISTINCT c_custkey * 2 AS node FROM customer
        |        WHERE c_nationkey = 0
        |        INTERSECT SELECT node FROM nodes),
        | ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM sd),
        | r AS (SELECT nodes.node,
        |         CASE WHEN sd.node IS NOT NULL THEN 1.0 / ns.ns
        |           ELSE 0.0 END AS restart
        |       FROM nodes CROSS JOIN ns LEFT JOIN sd ON nodes.node = sd.node),
        | p0 AS (SELECT node, restart AS pr FROM r),
        | c1 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p0 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p1 AS (SELECT r.node, 0.15 * r.restart + 0.85 * COALESCE(c1.mass, 0) AS pr
        |        FROM r LEFT JOIN c1 ON r.node = c1.node),
        | c2 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p1 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p2 AS (SELECT r.node, 0.15 * r.restart + 0.85 * COALESCE(c2.mass, 0) AS pr
        |        FROM r LEFT JOIN c2 ON r.node = c2.node),
        | c3 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p2 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p3 AS (SELECT r.node, 0.15 * r.restart + 0.85 * COALESCE(c3.mass, 0) AS pr
        |        FROM r LEFT JOIN c3 ON r.node = c3.node),
        | c4 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p3 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p4 AS (SELECT r.node, 0.15 * r.restart + 0.85 * COALESCE(c4.mass, 0) AS pr
        |        FROM r LEFT JOIN c4 ON r.node = c4.node),
        | c5 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p4 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p5 AS (SELECT r.node, 0.15 * r.restart + 0.85 * COALESCE(c5.mass, 0) AS pr
        |        FROM r LEFT JOIN c5 ON r.node = c5.node)
        |SELECT node, ROUND(pr, 6) AS ppr FROM p5 ORDER BY node""".stripMargin,
    // The engine's 5 power-iteration rounds unrolled as CTE layers —
    // identical recurrence (residual + damped mass over out-degree),
    // rounding only at the final projection on both sides.
    // Baskets, pair census, lift arithmetic restated; the top-100 cut
    // uses the same (lift, a, b) total order.
    "q263_copurchase_lift" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS supp
        |  FROM lineitem),
        | n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
        |   FROM b),
        | it AS (SELECT supp, CAST(COUNT(*) AS BIGINT) AS n_item
        |   FROM b GROUP BY 1),
        | p AS (SELECT a.supp AS supp_a, c.supp AS supp_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.supp < c.supp
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT supp_a, supp_b, n_ab,
        |  ia.n_item AS n_a, ib.n_item AS n_b,
        |  CAST(1000000 * n_ab * n.n_orders
        |    // (ia.n_item * ib.n_item) AS BIGINT) AS lift_ppm
        |FROM p JOIN it ia ON p.supp_a = ia.supp
        |  JOIN it ib ON p.supp_b = ib.supp CROSS JOIN n
        |ORDER BY lift_ppm DESC, supp_a, supp_b LIMIT 100""".stripMargin,
    // Two unrolled mutual-reinforcement rounds, all BIGINT (the
    // unnormalized form — see Graphs.hits).
    "q262_hits" ->
      """WITH e AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        | h1 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS s
        |   FROM e GROUP BY 1),
        | a1 AS (SELECT e.dst, CAST(SUM(h1.s) AS BIGINT) AS s
        |   FROM e JOIN h1 USING (src) GROUP BY 1),
        | h2 AS (SELECT e.src, CAST(SUM(a1.s) AS BIGINT) AS s
        |   FROM e JOIN a1 USING (dst) GROUP BY 1),
        | a2 AS (SELECT e.dst, CAST(SUM(h2.s) AS BIGINT) AS s
        |   FROM e JOIN h2 USING (src) GROUP BY 1)
        |SELECT 'hub' AS kind, CAST(src AS BIGINT) AS node, s AS score
        |FROM h2
        |UNION ALL
        |SELECT 'auth' AS kind, CAST(dst AS BIGINT) AS node, s AS score
        |FROM a2
        |ORDER BY kind, node""".stripMargin,
    "q126_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        | e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        | deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        | nodes AS (SELECT DISTINCT src AS node FROM e),
        | nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        | p0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
        | c1 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p0 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p1 AS (SELECT nodes.node, 0.15 / nn.n + 0.85 * COALESCE(c1.mass, 0) AS pr
        |        FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node),
        | c2 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p1 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p2 AS (SELECT nodes.node, 0.15 / nn.n + 0.85 * COALESCE(c2.mass, 0) AS pr
        |        FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node),
        | c3 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p2 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p3 AS (SELECT nodes.node, 0.15 / nn.n + 0.85 * COALESCE(c3.mass, 0) AS pr
        |        FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.node = c3.node),
        | c4 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p3 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p4 AS (SELECT nodes.node, 0.15 / nn.n + 0.85 * COALESCE(c4.mass, 0) AS pr
        |        FROM nodes CROSS JOIN nn LEFT JOIN c4 ON nodes.node = c4.node),
        | c5 AS (SELECT e.dst AS node, SUM(p.pr / deg.outdeg) AS mass
        |        FROM e JOIN p4 p ON e.src = p.node JOIN deg ON e.src = deg.src
        |        GROUP BY 1),
        | p5 AS (SELECT nodes.node, 0.15 / nn.n + 0.85 * COALESCE(c5.mass, 0) AS pr
        |        FROM nodes CROSS JOIN nn LEFT JOIN c5 ON nodes.node = c5.node)
        |SELECT node, ROUND(pr, 6) AS pr FROM p5 ORDER BY node""".stripMargin,
    "q125_equiheight_histogram" ->
      """WITH r AS (SELECT o_totalprice AS v,
        |    CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
        |      AS BIGINT) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM orders)
        |SELECT ((rk - 1) * 16) // n + 1 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(v) AS min_v, MAX(v) AS max_v, ROUND(AVG(v), 6) AS avg_v
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q01_agg_returnflag" ->
      """SELECT l_returnflag, l_linestatus,
        | ROUND(SUM(l_quantity),2) AS sum_qty,
        | ROUND(SUM(l_extendedprice),2) AS sum_price,
        | ROUND(AVG(l_discount),6) AS avg_disc,
        | ROUND(MAX(l_extendedprice),2) AS max_price,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_topk_customers" ->
      """SELECT o_custkey, ROUND(SUM(o_totalprice),2) AS total_spend,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q03_avg_by_priority" ->
      """SELECT o_orderpriority, ROUND(AVG(o_totalprice),6) AS avg_price,
        | COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_countdistinct_status" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        | ROUND(SUM(o_totalprice),2) AS total_price, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_events_yearly" ->
      """SELECT event_type, YEAR(ts) AS yr, MONTH(ts) AS mth,
        | ROUND(SUM(value),2) AS sum_value, ROUND(AVG(value),6) AS avg_value,
        | COUNT(*) AS n
        |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q06_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1,2",
    "q07_dup_groups" ->
      """SELECT o_custkey, COUNT(*) AS n FROM orders
        |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin,
    "q08_null_profile" ->
      """SELECT
        | ROUND(AVG(CASE WHEN text IS NULL OR text = '' THEN 1.0 ELSE 0.0 END),9) AS frac_text,
        | ROUND(AVG(CASE WHEN lang IS NULL OR lang = '' THEN 1.0 ELSE 0.0 END),9) AS frac_lang,
        | ROUND(AVG(CASE WHEN source IS NULL OR source = '' THEN 1.0 ELSE 0.0 END),9) AS frac_source,
        | COUNT(*) AS n_rows
        |FROM documents""".stripMargin,
    "q09_join_composite" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, g.n_same, g.grp_total
        |FROM orders o LEFT JOIN (
        |  SELECT o_custkey AS ck, o_orderstatus AS st, COUNT(*) AS n_same,
        |         ROUND(SUM(o_totalprice),2) AS grp_total
        |  FROM orders GROUP BY 1,2) g
        |ON o.o_custkey = g.ck AND o.o_orderstatus = g.st
        |ORDER BY o.o_orderkey""".stripMargin,
    "q10_join_using" ->
      """SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
        | ROUND(l.l_extendedprice * (1.0 - l.l_discount),4) AS net
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |ORDER BY 1,2,4""".stripMargin,
    "q11_broadcast_dims" ->
      """SELECT p.p_brand,
        | ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)),4) AS revenue,
        | COUNT(*) AS n
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_star_revenue" ->
      """SELECT r.r_name, n.n_name,
        | ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)),4) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q13_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        | ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "q14_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS g,
        | l_returnflag, l_linestatus,
        | ROUND(SUM(l_quantity),2) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q15_setops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        | p AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM p)
        |UNION ALL
        |SELECT 'f_only' AS tag, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM p)
        |UNION ALL
        |SELECT 'o_only' AS tag, o_custkey FROM (SELECT o_custkey FROM p EXCEPT SELECT o_custkey FROM f)
        |ORDER BY 1,2""".stripMargin,
    "q16_rename_project" ->
      """SELECT c_custkey AS customer_id, c_name AS name, c_mktsegment AS segment,
        | CAST(NULL AS VARCHAR) AS loyalty_tier
        |FROM customer ORDER BY 1""".stripMargin,
    "q17_schema_enforce" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, CAST(p_name AS VARCHAR) AS p_name,
        | CAST(p_size AS DOUBLE) AS p_size, CAST(p_retailprice AS DOUBLE) AS p_retailprice,
        | CAST(NULL AS VARCHAR) AS p_category
        |FROM part ORDER BY 1""".stripMargin,
    "q18_date_parts" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mth,
        | QUARTER(o_orderdate) AS qtr, WEEKOFYEAR(o_orderdate) AS wk
        |FROM orders ORDER BY 1""".stripMargin,
    "q19_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | ROUND(l_extendedprice * (1.0 - l_discount),4) AS net
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_quantity < 10.0
        |ORDER BY 1,2,3,4""".stripMargin,
    "q20_json_extract" ->
      """SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        | ROUND(AVG(CAST(props->>'$.k' AS INT)),6) AS avg_k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q51_pivot_status" ->
      """SELECT o_orderpriority,
        |  COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0.0) AS f_total,
        |  COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0.0) AS o_total,
        |  COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0.0) AS p_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52_cube" ->
      """SELECT CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS g,
        | o_orderstatus, o_orderpriority,
        | ROUND(SUM(o_totalprice),2) AS total, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q53_sql_surface" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(text) + 1),
        |          i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) AS fp,
        |    (SELECT CASE WHEN len(w) >= 3
        |        THEN len(list_distinct(list_transform(range(len(w)-2),
        |          i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])))
        |        ELSE 1 END
        |     FROM (SELECT string_split(text, ' ') AS w)) AS n_shingles
        |  FROM documents)
        |SELECT doc_id, fp, CAST(n_shingles AS INTEGER) AS n_shingles
        |FROM sh ORDER BY doc_id""".stripMargin,
    "q63_bucketed_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q68_bloom_join" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_semi_anti" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |SELECT 'has_big_order' AS tag, c_custkey FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM big)
        |UNION ALL
        |SELECT 'no_big_order' AS tag, c_custkey FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM big)
        |ORDER BY 1,2""".stripMargin
  )
}
