package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-facing contracts that broke silently in early rounds: the
  * Bench stdout line must fit the parent's ~2000-char tail buffer with
  * unique keys, and every SparkEntry query must be well-formed. Pure
  * metadata checks — no Spark session needed.
  */
class BenchContractSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("query names are unique and every oracle key has a query") {
    assert(names.distinct.size === names.size)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every query carries an oracle (no rows-only gates)") {
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"rows-only gates: $unchecked")
  }

  test("bench short keys stay unique and inside the stdout line budget") {
    val shortOf = Bench.shortKeys(names)
    val shorts = names.map(shortOf)
    assert(shorts.distinct.size === shorts.size, "short-key collision")
    // worst-case stdout line: fixed fields + per-query `"qNNN":-123.46,`
    // (2-decimal stdout values) + the capped 4-entry median-outlier map
    val perQuery = shorts.map(_.length + 11).sum
    val fixed = 200 + 4 * 14 // scaffolding + med_outliers cap
    assert(perQuery + fixed < 1900,
      s"estimated line ${perQuery + fixed} chars — the driver tail is ~2000")
  }

  test("oracle SQL carries no control characters that survive JSON escaping badly") {
    // Verify.q escapes them, but a literal NUL would still corrupt duckdb
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains('\u0000'), s"$k contains NUL")
    }
  }
}
