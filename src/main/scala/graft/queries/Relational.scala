package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational/BI query surface re-expressed Spark-first.
  *
  * Covers SURVEY.md §2.2 (projections/filters), §2.3 (joins J1-J4),
  * §2.4 (aggregations A1-A8), §2.5 (windows W1-W2), §2.6 (sort/limit/
  * sample/union O1-O4) over the driver-provided TPC-H-ish tables.
  *
  * Numeric discipline for oracle parity: monetary doubles are cast to
  * DECIMAL before SUM (exact in both Spark and DuckDB; double summation
  * order would otherwise differ), conditional counts use COUNT (BIGINT in
  * both engines; DuckDB's SUM(int) widens to HUGEINT which would not
  * hash-compare equal to Spark's LONG).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** A1/A2/A4 hash aggregate with map-side partial agg — the TPC-H Q1 shape.
    * Mirrors the reference's profiling aggregates (ingest_runner.py audit +
    * debug_serialization.py) in one pass over lineitem.
    *
    * Decimal casts stay INSIDE the SUM (exact, order-independent math in
    * both engines); every final output column is cast to double so the
    * driver's pandas comparator sees identical float64 on both sides —
    * decimal outputs hash-mismatch on scale/repr (CORRECTNESS_r01 q01). */
  val q01_pricing_summary = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
      |  cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2/O1 — the reference's flagship BI shape: GROUP BY date ORDER BY date
    * DESC LIMIT 10 (superset_bootstrap/test_sql_lab.py:144). Group keys are
    * unique so the LIMIT is deterministic. */
  val q02_orders_by_date = Q(
    "q02_orders_by_date",
    """SELECT o_orderdate, count(*) AS n
      |FROM orders GROUP BY o_orderdate
      |ORDER BY o_orderdate DESC LIMIT 10""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderdate"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("o_orderdate"))
      .limit(10)
  }

  /** A3 — multi-key group count (multi_database_auditor.py:234). */
  val q03_user_event_counts = Q(
    "q03_user_event_counts",
    """SELECT user_id, event_type, count(*) AS n
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")
  }

  /** A4 — conditional aggregates (null/zero profiling,
    * debug_serialization.py:64-71). COUNT(CASE WHEN) keeps BIGINT in both
    * engines. */
  val q04_profile_lineitem = Q(
    "q04_profile_lineitem",
    """SELECT l_returnflag,
      |  count(CASE WHEN l_discount = 0 THEN 1 END) AS zero_discount,
      |  count(CASE WHEN l_tax > 0.05 THEN 1 END) AS high_tax,
      |  count(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_discount") === 0, 1)).as("zero_discount"),
        count(when(col("l_tax") > 0.05, 1)).as("high_tax"),
        count(when(col("l_quantity").isNull, 1)).as("null_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** A5/O1 — value-distribution top-N (debug_serialization.py:48-55);
    * count ties broken by key for cross-engine determinism. */
  val q05_event_type_distribution = Q(
    "q05_event_type_distribution",
    """SELECT event_type, count(*) AS n
      |FROM events GROUP BY event_type
      |ORDER BY n DESC, event_type LIMIT 20""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type"))
      .limit(20)
  }

  /** A7 — exact distinct count (data_cleaner_robust.py:460 nunique). */
  val q06_distinct_customers = Q(
    "q06_distinct_customers",
    """SELECT count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
  }

  /** J1 — LEFT equi-join typed tables then aggregate
    * (superset_bootstrap/test_sql_lab.py:151-160 shape). No broadcast hint:
    * customer scales linearly with SF, so hardcoding broadcast OOMs at the
    * 100 TB design point — AQE picks broadcast automatically when the side
    * is actually small. */
  val q07_join_orders_customer = Q(
    "q07_join_orders_customer",
    """SELECT c_mktsegment,
      |  count(*) AS n_orders,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** J4/O1 — inner equi-join at row level with deterministic top-k
    * (TakeOrderedAndProject, no full sort/shuffle of the join output).
    * No broadcast hint (part scales with SF — AQE decides); price is the
    * raw parquet double, bit-identical in both engines, because per-row
    * double→decimal casts round differently across engines. */
  val q08_join_lineitem_part = Q(
    "q08_join_lineitem_part",
    """SELECT l_orderkey, l_linenumber, p_brand, p_type,
      |  l_extendedprice AS price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("p_brand"), col("p_type"),
        col("l_extendedprice").as("price"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(100)
  }

  /** J3 — metadata-style LEFT JOIN USING + NOT IN filter + group + order
    * (verify_clean_state.py:41-48 shape). */
  val q09_region_nation_counts = Q(
    "q09_region_nation_counts",
    """SELECT r_name, count(n_nationkey) AS n_nations
      |FROM region LEFT JOIN nation ON r_regionkey = n_regionkey
      |WHERE r_name NOT IN ('ASIA')
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
    t(s, dir, "region")
      .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"), "left")
      .filter(!col("r_name").isin("ASIA"))
      .groupBy(col("r_name"))
      .agg(count(col("n_nationkey")).as("n_nations"))
      .orderBy("r_name")
  }

  /** J2 — reconciliation audit as a FULL OUTER join of per-key counts with
    * diff column (ingest_runner.py:1853-1932 semantics, distributed). */
  val q10_audit_counts = Q(
    "q10_audit_counts",
    """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS customers
      |           FROM customer GROUP BY 1),
      |     s AS (SELECT s_nationkey AS nationkey, count(*) AS suppliers
      |           FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |  coalesce(customers, 0) AS customers,
      |  coalesce(suppliers, 0) AS suppliers,
      |  coalesce(customers, 0) - coalesce(suppliers, 0) AS diff
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("customers"))
    val p = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("suppliers"))
    c.join(p, Seq("nationkey"), "full_outer")
      .na.fill(0L, Seq("customers", "suppliers"))
      .withColumn("diff", col("customers") - col("suppliers"))
      .orderBy("nationkey")
  }

  /** W1 — dedup-by-latest-version window (ingest_runner.py:1576-1592):
    * row_number over (partition by key order by version desc) = 1.
    * Tie-break by event_id so ns-vs-µs truncation can't reorder. */
  val q11_latest_event_per_user = Q(
    "q11_latest_event_per_user",
    """SELECT user_id, event_id AS latest_event_id,
      |  event_type AS latest_event_type
      |FROM (SELECT user_id, event_id, event_type,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY cast(ts AS timestamp) DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("latest_event_id"),
        col("event_type").as("latest_event_type"))
      .orderBy("user_id")
  }

  /** P2 — JSON field projection (create_working_metabase_questions.py:81-100
    * JSONExtractString shape) with aggregation over the extracted value. */
  val q12_json_extract = Q(
    "q12_json_extract",
    """SELECT event_type,
      |  count(*) AS n,
      |  cast(sum(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"))
      .orderBy("event_type")
  }

  /** P3 — JSON key introspection (metabase_schema_discovery.py:202-210
    * JSONExtractKeys + isValidJSON shape). The key list is joined to a
    * scalar string — the driver's pandas comparator cannot canonicalize
    * array-typed output columns (CORRECTNESS_r01 q13). */
  val q13_json_keys = Q(
    "q13_json_keys",
    """SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') AS keys
      |FROM events WHERE json_valid(props) AND event_id < 50
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .filter(get_json_object(col("props"), "$").isNotNull && col("event_id") < 50)
      .select(
        col("event_id"),
        array_join(array_sort(json_object_keys(col("props"))), ",").as("keys"))
      .orderBy("event_id")
  }

  /** O3 — sampling. A true Bernoulli sample is engine-specific RNG, so the
    * oracle-checked variant samples deterministically via md5-bucketing
    * (stable in both engines); `df.sample` remains the library surface. */
  val q14_deterministic_sample = Q(
    "q14_deterministic_sample",
    """SELECT event_id, event_type
      |FROM events
      |WHERE substring(md5(cast(event_id AS varchar)), 1, 1) = 'a'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .filter(substring(md5(col("event_id").cast("string")), 1, 1) === "a")
      .select(col("event_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** O4 — UNION ALL summary card
    * (create_working_metabase_questions.py:101-120). */
  val q15_union_summary = Q(
    "q15_union_summary",
    """SELECT 'customer' AS tbl, count(*) AS n FROM customer
      |UNION ALL SELECT 'orders' AS tbl, count(*) AS n FROM orders
      |UNION ALL SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
      |UNION ALL SELECT 'events' AS tbl, count(*) AS n FROM events
      |ORDER BY tbl""".stripMargin) { (s, dir) =>
    Seq("customer", "orders", "lineitem", "events")
      .map(n => t(s, dir, n).agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), col("n")))
      .reduce(_.unionByName(_))
      .orderBy("tbl")
  }

  /** D7/D8 — analytics-view date helpers (generate_analytics_views.py:83-143
    * + toStartOfDay/toYYYYMM BI bucketing): *_date, day bucket, yyyyMM. */
  val q16_date_helpers = Q(
    "q16_date_helpers",
    """SELECT o_orderkey,
      |  cast(o_orderdate AS date) AS o_orderdate_date,
      |  date_trunc('day', o_orderdate) AS day_bucket,
      |  strftime(o_orderdate, '%Y%m') AS yyyymm
      |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate_date"),
        date_trunc("day", col("o_orderdate")).as("day_bucket"),
        date_format(col("o_orderdate"), "yyyyMM").as("yyyymm"))
      .orderBy("o_orderkey")
      .limit(100)
  }

  /** P5/P6 — predicate filters: range, NOT IN, regex (rlike), null checks
    * (metabase_schema_discovery.py:150-160, debug_serialization.py:83-91). */
  val q17_predicates = Q(
    "q17_predicates",
    """SELECT event_id, user_id, event_type, value
      |FROM events
      |WHERE value > 100 AND event_type NOT IN ('click', 'view')
      |  AND regexp_matches(event_type, '^[a-z]+$') AND props IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .filter(col("value") > 100 && !col("event_type").isin("click", "view") &&
        col("event_type").rlike("^[a-z]+$") && col("props").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** ROLLUP hierarchy totals (free from Catalyst; the BI drill-down shape
    * on top of A2/A6). GROUPING() distinguishes subtotal rows from NULL
    * keys — cast to int for a driver-stable dtype. */
  val q18_rollup = Q(
    "q18_rollup",
    """SELECT
      |  coalesce(r_name, '(all)') AS region_name,
      |  coalesce(n_name, '(all)') AS nation_name,
      |  count(*) AS n,
      |  cast(grouping(r_name) + grouping(n_name) AS int) AS lvl
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { (s, dir) =>
    val joined = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
    joined.rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"),
        (grouping(col("r_name")) + grouping(col("n_name"))).cast("int").as("lvl"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("region_name"),
        coalesce(col("n_name"), lit("(all)")).as("nation_name"),
        col("n"), col("lvl"))
  }

  /** JSON promotion (§1.2): the opaque `props` string promoted to typed
    * columns via from_json with an explicit schema — the schema-on-read
    * upgrade path from P2's per-field extraction. */
  val q19_json_promotion = Q(
    "q19_json_promotion",
    """SELECT event_id,
      |  json_extract(props, '$.k')::bigint AS k,
      |  json_extract_string(props, '$.absent') AS absent
      |FROM events
      |WHERE props IS NOT NULL AND event_id < 200
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("absent",
        org.apache.spark.sql.types.StringType, true)))
    t(s, dir, "events")
      .filter(col("props").isNotNull && col("event_id") < 200)
      .withColumn("p", from_json(col("props"), schema))
      .select(col("event_id"), col("p.k").as("k"), col("p.absent").as("absent"))
      .orderBy("event_id")
  }

  /** q87 — analytic-window breadth beyond W1/q53 (row_number, lag,
    * cumsum): lead (next-event gap), first_value (session anchor),
    * percent_rank (in-group value percentile) in ONE window pass per
    * frame. All three share the (user_id | ts, event_id) sort, so Spark
    * plans a single hash shuffle + sort for the user frames; the
    * percent_rank frame shuffles on event_type independently. Gap is
    * microsecond-exact (q53 lesson); percent_rank is (rank-1)/(n-1) in
    * both engines — exact rational arithmetic, rounded 6 for the gate. */
  val q87_window_suite = Q(
    "q87_window_suite",
    """SELECT user_id, event_id,
      |  epoch_us(lead(ts) OVER w) - epoch_us(ts) AS next_gap_us,
      |  first_value(event_type) OVER w AS first_type,
      |  round(percent_rank() OVER (PARTITION BY event_type
      |    ORDER BY value, event_id), 6) AS pr
      |FROM events
      |WHERE user_id < 50
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
    (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value", "event_id")
    t(s, dir, "events")
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        (unix_micros(lead("ts", 1).over(w)) - unix_micros(col("ts")))
          .as("next_gap_us"),
        first_value(col("event_type")).over(w).as("first_type"),
        round(percent_rank().over(wt), 6).as("pr"))
  }

  /** q91 — TPC-H Q3 shape (shipping priority): the three-table analytical
    * join a BI dashboard runs hourly — segment-filtered customers ⋈
    * date-filtered orders ⋈ date-filtered lineitem → revenue per order,
    * top-10. No join hints anywhere: AQE picks broadcast-vs-SMJ per side
    * from runtime sizes (at 100 TB all three inputs scale, so a pinned
    * broadcast would be the round-1 OOM mistake). Filters sit directly on
    * each scan for pushdown; decimal revenue math is exact, cast to
    * double only at the output boundary. */
  val q91_shipping_priority = Q(
    "q91_shipping_priority",
    """SELECT l.l_orderkey AS o_key,
      |  cast(sum(cast(l.l_extendedprice AS decimal(18,2)) *
      |    (1 - cast(l.l_discount AS decimal(18,2)))) AS double) AS revenue,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS odate, o.o_orderpriority
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < DATE '1995-03-15'
      |  AND l.l_shipdate > DATE '1995-03-15'
      |GROUP BY 1, 3, 4
      |ORDER BY revenue DESC, o_key LIMIT 10""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("o_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .select("o_key", "revenue", "odate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_key"))
      .limit(10)
  }

  /** q92 — semi/anti join depth (EXISTS / NOT EXISTS, the join family
    * beyond q07-q10's left/inner/full-outer): customers with at least one
    * order vs customers with none, in ONE pass each. Spark plans
    * LeftSemi/LeftAnti — the build side carries ONLY the join key (no
    * payload columns survive the probe), the shape that makes
    * existence checks cheap at 100 TB. */
  val q92_semi_anti = Q(
    "q92_semi_anti",
    """SELECT
      |  (SELECT count(*) FROM customer c
      |    WHERE EXISTS (SELECT 1 FROM orders o
      |      WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      |  (SELECT count(*) FROM customer c
      |    WHERE NOT EXISTS (SELECT 1 FROM orders o
      |      WHERE o.o_custkey = c.c_custkey)) AS n_without_orders""".stripMargin) {
    (s, dir) =>
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders").select(col("o_custkey"))
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_with_orders"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_without_orders"))
    semi.crossJoin(anti)
  }

  /** q104 — TPC-H Q17 shape (small-quantity revenue): the CORRELATED
    * scalar subquery a BI SQL surface must accept verbatim — per-part
    * quantity threshold 0.2·avg computed against the outer row's part.
    * Submitted as raw SQL (the arbitrary-user-SQL surface, reference
    * superset_bootstrap/test_sql_lab.py:40-69): Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelates it into a per-key
    * AGGREGATE + join — one pass over lineitem for all thresholds, never
    * a per-row re-scan (the plan shape SqlSurfaceSpec asserts; a naive
    * engine would execute the subquery N times). Determinism: quantities
    * are integer-valued doubles (exact sums in any order, so the
    * avg boundary is bit-stable across engines) and the revenue sum
    * rides decimals to one final double division (q01/q91 pattern). */
  val q104_correlated_scalar = Q(
    "q104_correlated_scalar",
    """SELECT cast(cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double)
      |    / 7.0 AS double) AS avg_yearly
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#23'
      |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
      |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin) {
    (s, dir) =>
    t(s, dir, "lineitem").createOrReplaceTempView("g17_lineitem")
    t(s, dir, "part").createOrReplaceTempView("g17_part")
    s.sql(
      """SELECT cast(cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double)
        |    / 7.0 AS double) AS avg_yearly
        |FROM g17_lineitem l JOIN g17_part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#23'
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |    FROM g17_lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
  }

  /** q106 — exact discrete percentiles per group (the latency/size
    * profile a BI dashboard computes): `percentile_disc` picks an ACTUAL
    * data value by cumulative distribution — no interpolation arithmetic,
    * so parity with the oracle is exact even over arbitrary doubles
    * (percentile_CONT's (1-f)*lo+f*hi is float-order-sensitive between
    * engines and would not hash). One partial-agg shuffle per group key;
    * ANSI WITHIN GROUP syntax straight through the SQL surface. */
  val q106_percentile_profile = Q(
    "q106_percentile_profile",
    """SELECT l_returnflag,
      |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_qty,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
      |  percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)")
          .as("p25_qty"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
          .as("p50_qty"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p95_price"),
        count(lit(1)).as("n"))
  }

  /** q107 — CUBE with GROUPING ids (q18's ROLLUP widened to the full
    * lattice): all four aggregation levels in ONE pass — Spark expands
    * the grouping sets before the single exchange, so the cube costs one
    * shuffle, not four queries. GROUPING() disambiguates real NULLs from
    * subtotal rows — the BI-tool contract for drill-down tables. Revenue
    * rides decimals to one final double cast (q01 pattern). */
  val q107_cube_profile = Q(
    "q107_cube_profile",
    """SELECT l_returnflag AS rf, l_linestatus AS ls,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
      |  count(*) AS n,
      |  cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS revenue
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) {
    (s, dir) =>
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping("l_returnflag").cast("int").as("g_rf"),
        grouping("l_linestatus").cast("int").as("g_ls"),
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("g_rf"), col("g_ls"), col("n"), col("revenue"))
  }

  /** q108 — pivot (long→wide reshape, the cross-tab every BI tool
    * renders): explicit pivot VALUES keep the output schema static —
    * an inferred pivot would scan once just to discover columns and
    * make the schema data-dependent (schema drift at 100 TB). Counts
    * are exact; absent cells coalesce to 0 like the conditional-agg
    * form the oracle uses. */
  val q108_pivot_status = Q(
    "q108_pivot_status",
    """SELECT l_returnflag AS rf,
      |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_cnt,
      |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_cnt
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("rf"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("rf"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"))
  }

  val all: Seq[Q] = Seq(
    q01_pricing_summary, q02_orders_by_date, q03_user_event_counts,
    q04_profile_lineitem, q05_event_type_distribution, q06_distinct_customers,
    q07_join_orders_customer, q08_join_lineitem_part, q09_region_nation_counts,
    q10_audit_counts, q11_latest_event_per_user, q12_json_extract,
    q13_json_keys, q14_deterministic_sample, q15_union_summary,
    q16_date_helpers, q17_predicates, q18_rollup, q19_json_promotion,
    q87_window_suite, q91_shipping_priority, q92_semi_anti,
    q104_correlated_scalar, q106_percentile_profile, q107_cube_profile,
    q108_pivot_status)
}
