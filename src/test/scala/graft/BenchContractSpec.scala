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

  test("bench short keys stay unique; realistic full line fits the budget") {
    val shortOf = Bench.shortKeys(names)
    val shorts = names.map(shortOf)
    assert(shorts.distinct.size === shorts.size, "short-key collision")
    // the contract that matters: a REALISTIC line — sub-second queries
    // ("0.4", the common case) with 8 slow outliers ("12.34") and the
    // 4-entry med_outliers cap — composed by Bench's own tiering fits
    // the driver's ~2000-char tail and keeps every query key; which
    // tier carries it is Bench's business (past ~155 queries the
    // richest form no longer fits and composeLine degrades by design)
    def qjson(fmt: String) =
      shorts.zipWithIndex.map { case (s, i) =>
        "\"" + s + "\":" + (if (i < 8) "12.34" else fmt)
      }.mkString("{", ",", "}")
    val med = (1 to 4).map(i => s""""q$i":9.99""").mkString("{", ",", "}")
    val line = Bench.composeLine("123.456", "121.987",
      qjson("0.45"), qjson("0.4"), qjson("0"),
      0, "{}", med, 0, 4, "sf0.1")
    assert(line.length <= 1900,
      s"realistic line ${line.length} chars — the driver tail is ~2000")
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(parsed.get("queries").size() === names.size,
      "tiering dropped query keys")
  }

  test("queriesDiagLine carries EVERY query at 2-decimal precision " +
      "within a tail-window-sized budget") {
    // realistic mix: the registry's actual size, sub-second majority,
    // a few slow queries, one failure
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i == 0) -0.004 else if (i < 9) 12.345 else 0.456)
    }
    val line = Bench.queriesDiagLine(results)
    assert(line.startsWith("[bench-queries] {"))
    assert(names.size >= 168, s"suite shrank? ${names.size}")
    val json = line.stripPrefix("[bench-queries] ")
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(parsed.size() === names.size, "diag line dropped query keys")
    // ≥1-decimal (here exactly 2) per-query values — the adjudication
    // precision the stdout tier loses at this suite size
    assert(json.contains(":0.46") && json.contains(":12.35"))
    // failure sentinel stays detectably negative
    val shortFirst = Bench.shortKeys(names)(names.head)
    assert(parsed.get(shortFirst).asDouble() < 0)
    assert(line.length <= 2600,
      s"diag line ${line.length} chars — must survive the tail window")
  }

  test("rerun (interference self-adjudication) rides the line with " +
      "med_outliers and degrades away with it") {
    val med = (1 to 4).map(i => s""""q$i":9.99""").mkString("{", ",", "}")
    val rr = (1 to 4).map(i => s""""q$i":1.23""").mkString("{", ",", "}")
    // preferred form: med_outliers + rerun side by side
    val small = Bench.composeLine("1.0", "1.0", """{"q1":0.10}""",
      """{"q1":0.1}""", """{"q1":0}""", 0, "{}", med, 0, 4, "sf0.1", rr)
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(small)
    assert(parsed.get("rerun").get("q1").asDouble() === 1.23)
    assert(parsed.get("med_outliers").get("q1").asDouble() === 9.99)
    // no outliers flagged → no med fields, no rerun field
    val quiet = Bench.composeLine("1.0", "1.0", """{"q1":0.10}""",
      """{"q1":0.1}""", """{"q1":0}""", 0, "{}", "{}", 0, 0, "sf0.1", "{}")
    assert(!quiet.contains("rerun") && !quiet.contains("med_outliers"))
    // budget pressure: rerun degrades away WITH med_outliers, the line
    // stays valid JSON with every query key
    val shortOf = Bench.shortKeys(names)
    val qs2 = names.map(n => "\"" + shortOf(n) + "\":-123.46")
      .mkString("{", ",", "}")
    val qs1 = names.map(n => "\"" + shortOf(n) + "\":-123.5")
      .mkString("{", ",", "}")
    val qs0 = names.map(n => "\"" + shortOf(n) + "\":-1")
      .mkString("{", ",", "}")
    val big = Bench.composeLine("9999.999", "9999.999", qs2, qs1, qs0,
      names.size, """{"q01_pricing_summary":"boom"}""", med, 7, 11,
      "sf0.1", rr)
    assert(big.length <= 1900, s"degraded line still ${big.length} chars")
    val p2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(big)
    assert(p2.get("queries").size() === names.size)
  }

  test("composeLine degrades to fit the budget and stays valid JSON") {
    val shortOf = Bench.shortKeys(names)
    // absurd worst case: every query slow AND failed at 2-decimal width
    val qs2 = names.map(n => "\"" + shortOf(n) + "\":-123.46")
      .mkString("{", ",", "}")
    val qs1 = names.map(n => "\"" + shortOf(n) + "\":-123.5")
      .mkString("{", ",", "}")
    val qs0 = names.map(n => "\"" + shortOf(n) + "\":-1")
      .mkString("{", ",", "}")
    val med = (1 to 4).map(i => s""""q$i":9.99""").mkString("{", ",", "}")
    val err = """{"q01_pricing_summary":"boom"}"""
    val line = Bench.composeLine("9999.999", "9999.999", qs2, qs1, qs0,
      names.size, err, med, 7, 11, "sf0.1")
    assert(line.length <= 1900, s"degraded line still ${line.length} chars")
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(parsed.get("queries").size() === names.size)
    // med_more survives every tier except the last-resort no-med form;
    // when present it must carry the full dropped-outlier count
    if (parsed.has("med_more"))
      assert(parsed.get("med_more").asInt() === 11, "dropped outliers stay counted")
    // and the full form is preferred when it fits
    val small = Bench.composeLine("1.0", "1.0", """{"q1":0.10}""",
      """{"q1":0.1}""", """{"q1":0}""", 0, "{}", med, 0, 4, "sf0.1")
    assert(small.contains(""""med_outliers":{"q1":9.99"""))
  }

  test("drift sentinel rides every composeLine tier") {
    // full form
    val med = (1 to 4).map(i => s""""q$i":9.99""").mkString("{", ",", "}")
    val full = Bench.composeLine("1.0", "1.0", """{"q1":0.10}""",
      """{"q1":0.1}""", """{"q1":0}""", 0, "{}", med, 0, 4, "sf0.1", "{}",
      drift = "1.04")
    val p = new com.fasterxml.jackson.databind.ObjectMapper().readTree(full)
    assert(p.get("drift").asDouble() === 1.04)
    // last-resort no-med tier keeps it too (force degradation with a
    // tiny budget; the q-map shrinks but drift is a contract field)
    val floor = Bench.composeLine("1.0", "1.0", """{"q1":0.10}""",
      """{"q1":0.1}""", """{"q1":0}""", 0, "{}", med, 0, 4, "sf0.1", "{}",
      budget = 160, drift = "1.04")
    val p2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(floor)
    assert(p2.get("drift").asDouble() === 1.04)
    // absent when no canary ran
    val none = Bench.composeLine("1.0", "1.0", """{"q1":0.10}""",
      """{"q1":0.1}""", """{"q1":0}""", 0, "{}", "{}", 0, 0, "sf0.1")
    assert(!none.contains("drift"))
  }

  test("machine-kernel drift ruler: positive, warmed, and the drift " +
      "statistic (median/min over samples) is >= 1 by construction — " +
      "the round-16 canary's 0.66-on-a-quiet-machine artifact is " +
      "structurally impossible") {
    // warm (C2 compiles the hot loop within the first pass)
    (1 to 3).foreach(_ => Bench.kernelPassSec())
    val samples = (1 to 12).map(_ => Bench.kernelPassSec()).sorted
    assert(samples.head > 0, s"kernel must time a real workload: $samples")
    val drift = samples(samples.size / 2) / samples.head
    assert(drift >= 1.0, s"median/min can never read below 1: $drift")
    // a quiet-ish machine (this suite) keeps the median near the floor;
    // wide band — the assertion is about sanity, not this machine's load
    assert(drift < 3.0, s"kernel spread implausible on a test box: $samples")
  }

  test("oracle SQL carries no control characters that survive JSON escaping badly") {
    // Verify.q escapes them, but a literal NUL would still corrupt duckdb
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains('\u0000'), s"$k contains NUL")
    }
  }
}
