package graft

import org.apache.spark.sql.functions._

/** The BI-over-SQL surface (SURVEY.md §3.3): registered catalog views +
  * `spark.sql` — what a Thrift-server/Spark-Connect BI client would issue.
  * Plus the at-scale approximate-distinct path for A7.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registered views serve the reference's flagship BI SQL shapes") {
    Tables.registerAll(spark, dir)
    // test_sql_lab.py:144 shape
    val byDate = spark.sql(
      """SELECT o_orderdate, count(*) AS n FROM orders
        |GROUP BY o_orderdate ORDER BY o_orderdate DESC LIMIT 10""".stripMargin)
    assert(byDate.count() === 10)
    // LEFT JOIN shape (test_sql_lab.py:151-160)
    val joined = spark.sql(
      """SELECT c_name, count(*) AS orders FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name ORDER BY orders DESC, c_name LIMIT 5""".stripMargin)
    assert(joined.count() === 5)
    // repair_encoding is callable from plain SQL via the extension
    val re = spark.sql("SELECT repair_encoding('cafÃ©') AS r").collect()
    assert(re(0).getString(0) === "café")
  }

  test("pure-SQL dedup pipeline via registered text-hash natives") {
    Tables.registerAll(spark, dir)
    // a SQL analyst's near-dup candidate query — no Scala API, and the
    // natives must agree with the typed operators' arithmetic
    val pairs = spark.sql(
      """WITH toks AS (
        |  SELECT doc_id AS id, split(trim(text), '\\s+') AS tok FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS id, split(trim(text), '\\s+') AS tok
        |  FROM documents WHERE doc_id < 5),
        |sigs AS (SELECT id, minhash_sig(shingle_hashes(tok, 3, 1), 8) AS sig
        |  FROM toks WHERE size(tok) >= 8),
        |bands AS (SELECT id, j, md5(concat_ws(',', sig[2*j], sig[2*j+1])) AS bh
        |  FROM sigs LATERAL VIEW explode(sequence(0, 3)) AS j)
        |SELECT DISTINCT a.id AS a_id, b.id AS b_id
        |FROM bands a JOIN bands b ON a.j = b.j AND a.bh = b.bh AND a.id < b.id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copies of docs 0..4 must all be found
    val expected = (0L until 5L).map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(pairs))
    // simhash native callable from SQL, identical docs agree
    val sh = spark.sql(
      """SELECT doc_id, simhash(shingle_hashes(split(trim(text), '\\s+'), 1, 0), 16) AS f
        |FROM documents WHERE doc_id < 2""".stripMargin).collect()
    assert(sh.length === 2 && sh.forall(!_.isNullAt(1)))
  }

  test("BPE and projection natives callable from plain SQL") {
    // merge_adjacent_pair: the tokenizer encode pass as pure SQL
    val merged = spark.sql(
      "SELECT merge_adjacent_pair(array('a', 'a', 'a', 'b'), 'a', 'a') AS t")
      .collect().head.getSeq[String](0)
    assert(merged == Seq("a a", "a", "b")) // greedy non-overlapping
    // plane_projection agrees with the typed column (same md5 planes)
    val row = spark.sql(
      "SELECT plane_projection(array(1.0d, 0.0d), 0, 2) AS p").collect().head
    val expect = graft.functions.VectorOpsUtil.plane(0)(0)
    assert(row.getDouble(0) === expect)
  }

  test("Views.registerAll: one analytics view per table, date helpers queryable") {
    val names = graft.views.Views.registerAll(spark, dir)
    assert(names.length === Tables.names.length)
    assert(names.forall(_.endsWith("_v")))
    // the BI query the reference's views exist for: group by the helper
    val byDay = spark.sql(
      """SELECT o_orderdate_date AS d, count(*) AS n
        |FROM graft_analytics__orders_v GROUP BY 1 ORDER BY d DESC LIMIT 5""".stripMargin)
    assert(byDay.count() === 5)
  }

  test("correlated scalar subquery decorrelates to an aggregate join (q104)") {
    val df = graft.queries.Relational.q104_correlated_scalar.run(spark, dir)
    df.collect() // materialize so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString
    // RewriteCorrelatedScalarSubquery must have turned the per-row
    // subquery into a per-partkey aggregate joined back — the optimized
    // plan carries NO subquery node and DOES carry the threshold agg
    assert(!plan.contains("Subquery"),
      "correlated subquery survived to execution — not decorrelated")
    assert(plan.contains("avg("), "decorrelated per-key aggregate missing")
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.contains("scalar-subquery"),
      "optimizer left a scalar subquery in the plan")
  }

  test("A7 at scale: approx_count_distinct within 5% of exact") {
    val events = Tables.load(spark, dir, "events")
    val row = events.agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id", 0.02).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
