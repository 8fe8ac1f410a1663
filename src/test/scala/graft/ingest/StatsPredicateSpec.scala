package graft.ingest

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats-language extraction unit tests — pure expression-tree in,
  * bounds out (no Spark session). The round-18 addition is the
  * DISJUNCTION envelope: `a OR b` admits per-column union bounds when
  * every branch constrains the column, under the exact ColStats
  * ordering (numeric as BigDecimal, everything else lexical on the
  * canonical rendering). */
class StatsPredicateSpec extends AnyFunSuite {

  private val x = UnresolvedAttribute("x")
  private val y = UnresolvedAttribute("y")

  test("OR of equalities on one numeric column -> union envelope, no points") {
    val e = StatsPredicate.extract(
      Or(EqualTo(x, Literal(1L)), EqualTo(x, Literal(3L))))
    assert(e.bounds === Seq(("x", Some("1"), Some("3"))))
    assert(e.points.isEmpty, "a bloom probe needs ONE value")
  }

  test("OR of range conjunctions -> envelope spans both rectangles") {
    val b1 = And(GreaterThanOrEqual(x, Literal(1L)), LessThanOrEqual(x, Literal(3L)))
    val b2 = And(GreaterThanOrEqual(x, Literal(7L)), LessThanOrEqual(x, Literal(9L)))
    val e = StatsPredicate.extract(Or(b1, b2))
    assert(e.bounds === Seq(("x", Some("1"), Some("9"))))
  }

  test("string column uses the LEXICAL ordering ColStats compares with") {
    // numeric ordering would build ['9','10'], which under the stats'
    // lexical compare EXCLUDES '10' — the wrong-pruning trap
    val e = StatsPredicate.extract(
      Or(EqualTo(x, Literal("9")), EqualTo(x, Literal("10"))))
    assert(e.bounds === Seq(("x", Some("10"), Some("9"))))
    val (_, lo, hi) = e.bounds.head
    // both branch values overlap their own envelope under lexical compare
    assert(ManifestCommit.ColStats("x", "str", "9", "9").overlaps(lo, hi))
    assert(ManifestCommit.ColStats("x", "str", "10", "10").overlaps(lo, hi))
  }

  test("a branch that cannot constrain the column drops it") {
    // x = 1 OR x IS NULL: min/max never describe nulls — no bound
    val e = StatsPredicate.extract(
      Or(EqualTo(x, Literal(1L)), IsNull(x)))
    assert(e.bounds.isEmpty)
    // x = 1 OR y = 2: neither column constrained in BOTH branches
    val e2 = StatsPredicate.extract(
      Or(EqualTo(x, Literal(1L)), EqualTo(y, Literal(2L))))
    assert(e2.bounds.isEmpty)
  }

  test("numeric/non-numeric disagreement on one column drops it") {
    val e = StatsPredicate.extract(
      Or(EqualTo(x, Literal(1L)), EqualTo(x, Literal("a"))))
    assert(e.bounds.isEmpty)
  }

  test("IN inside a branch; unbounded side wins the union") {
    val e = StatsPredicate.extract(Or(
      In(x, Seq(Literal(1L), Literal(2L))), EqualTo(x, Literal(12L))))
    assert(e.bounds === Seq(("x", Some("1"), Some("12"))))
    val e2 = StatsPredicate.extract(Or(
      LessThan(x, Literal(5L)), GreaterThan(x, Literal(20L))))
    assert(e2.bounds.isEmpty, "(-inf, +inf) envelope proves nothing")
  }

  test("range-split OR: the envelope proves nothing but the OR GROUP " +
      "resolves per branch — x < 5 OR x > 20") {
    val e = StatsPredicate.extract(Or(
      LessThan(x, Literal(5L)), GreaterThan(x, Literal(20L))))
    assert(e.orGroups.size === 1)
    assert(e.orGroups.head.toSet === Set(
      Seq(("x", None, Some("5"))), Seq(("x", Some("20"), None))))
    // a dir wholly inside the GAP is disproved by every branch
    assert(e.disjoint(Seq(ManifestCommit.ColStats("x", "num", "8", "15"))))
    assert(!e.disjoint(Seq(ManifestCommit.ColStats("x", "num", "3", "4"))))
    assert(!e.disjoint(Seq(ManifestCommit.ColStats("x", "num", "25", "30"))))
    // cross-column OR also records a group (each branch constrains ITS
    // column): dir disproved only when both branches are
    val e2 = StatsPredicate.extract(Or(
      EqualTo(x, Literal(1L)), EqualTo(y, Literal(2L))))
    assert(e2.bounds.isEmpty && e2.orGroups.size === 1)
    assert(e2.disjoint(Seq(
      ManifestCommit.ColStats("x", "num", "5", "9"),
      ManifestCommit.ColStats("y", "num", "5", "9"))))
    assert(!e2.disjoint(Seq(
      ManifestCommit.ColStats("x", "num", "5", "9"),
      ManifestCommit.ColStats("y", "num", "1", "3"))))
  }

  test("IN and OR-of-equalities carry per-value bloom candidates " +
      "(anyPoints); bounded; restrict filters them") {
    val e = StatsPredicate.extract(In(x, Seq(Literal(1L), Literal(3L))))
    assert(e.anyPoints === Seq(("x", Seq(1L, 3L))))
    // OR-of-equalities normalizes to IN — same envelope, same probes
    val e2 = StatsPredicate.extract(
      Or(EqualTo(x, Literal(1L)), EqualTo(x, Literal(3L))))
    assert(e2.anyPoints === Seq(("x", Seq(1L, 3L))))
    assert(e2.bounds === Seq(("x", Some("1"), Some("3"))))
    // a 3-way OR flattens through the nested tree
    val e3 = StatsPredicate.extract(Or(
      Or(EqualTo(x, Literal(1L)), EqualTo(x, Literal(3L))),
      EqualTo(x, Literal(7L))))
    assert(e3.anyPoints === Seq(("x", Seq(1L, 3L, 7L))))
    // probe cost stays bounded: a 17-value list records no candidates
    val e4 = StatsPredicate.extract(
      In(x, (1 to 17).map(i => Literal(i.toLong))))
    assert(e4.anyPoints.isEmpty && e4.bounds.nonEmpty)
    assert(e.restrict(Set("y")).anyPoints.isEmpty)
  }

  test("NOT pushes to the leaves: flips, De Morgan, double negation") {
    // NOT (x > 5) — null-safe flip: both sides are false for null x
    val e = StatsPredicate.extract(Not(GreaterThan(x, Literal(5L))))
    assert(e.bounds === Seq(("x", None, Some("5"))))
    // NOT (x < 2 OR x > 8) -> x >= 2 AND x <= 8
    val e2 = StatsPredicate.extract(Not(Or(
      LessThan(x, Literal(2L)), GreaterThan(x, Literal(8L)))))
    assert(e2.bounds.toSet === Set(
      ("x", Some("2"), None), ("x", None, Some("8"))))
    // NOT NOT x >= 3
    val e3 = StatsPredicate.extract(Not(Not(GreaterThanOrEqual(x, Literal(3L)))))
    assert(e3.bounds === Seq(("x", Some("3"), None)))
    // NOT (x = 5) proves nothing (the dir may hold other values)
    val e4 = StatsPredicate.extract(Not(EqualTo(x, Literal(5L))))
    assert(e4.bounds.isEmpty && e4.orGroups.isEmpty)
    // De Morgan producing an OR group: NOT (x >= 5 AND x <= 20) ->
    // x < 5 OR x > 20, the range split
    val e5 = StatsPredicate.extract(Not(And(
      GreaterThanOrEqual(x, Literal(5L)), LessThanOrEqual(x, Literal(20L)))))
    assert(e5.orGroups.size === 1)
    assert(e5.disjoint(Seq(ManifestCommit.ColStats("x", "num", "8", "15"))))
  }

  test("restrict drops a group whose branch loses every bound") {
    val z = UnresolvedAttribute("z")
    val e = StatsPredicate.extract(Or(
      EqualTo(x, Literal(1L)), EqualTo(z, Literal(5L))))
    assert(e.orGroups.size === 1)
    val r = e.restrict(Set("x"))
    assert(r.orGroups.isEmpty,
      "a branch with no evaluable bound admits everything")
    // a branch merely WEAKENED keeps its group
    val e2 = StatsPredicate.extract(Or(
      And(EqualTo(x, Literal(1L)), EqualTo(z, Literal(5L))),
      EqualTo(x, Literal(9L))))
    val r2 = e2.restrict(Set("x"))
    assert(r2.orGroups === Seq(Seq(
      Seq(("x", Some("1"), Some("1"))), Seq(("x", Some("9"), Some("9"))))))
  }

  test("OR rides alongside ordinary conjuncts; disjoint() stays sound") {
    val e = StatsPredicate.extract(And(
      EqualTo(y, Literal(5L)),
      Or(EqualTo(x, Literal(1L)), EqualTo(x, Literal(3L)))))
    assert(e.bounds.toSet === Set(
      ("y", Some("5"), Some("5")), ("x", Some("1"), Some("3"))))
    assert(e.points === Seq(("y", 5L)))
    // a dir whose x stats sit wholly outside the envelope is provably
    // free of matching rows
    assert(e.disjoint(Seq(ManifestCommit.ColStats("x", "num", "7", "9"))))
    assert(!e.disjoint(Seq(ManifestCommit.ColStats("x", "num", "2", "8"))))
  }

  test("strict bounds: the half-open partition negation is disjoint at a " +
      "touching boundary; the closed variant is not") {
    // NOT(ts >= A AND ts < B) = ts < A OR ts >= B — a dir spanning
    // exactly [A, B) must be PROVEN free of matching rows for the
    // whole-dir DML fast path to fire on the partition-drop shape
    val e = StatsPredicate.extract(
      Or(LessThan(x, Literal(100L)), GreaterThanOrEqual(x, Literal(200L))))
    assert(e.disjoint(Seq(ManifestCommit.ColStats("x", "num", "100", "199"))))
    // x <= 100 admits the dir's min — NOT disjoint
    val c = StatsPredicate.extract(
      Or(LessThanOrEqual(x, Literal(100L)), GreaterThanOrEqual(x, Literal(200L))))
    assert(!c.disjoint(Seq(ManifestCommit.ColStats("x", "num", "100", "199"))))
    // plain conjunct strictness: x > 99 excludes a dir topping at 99
    assert(StatsPredicate.extract(GreaterThan(x, Literal(99L)))
      .disjoint(Seq(ManifestCommit.ColStats("x", "num", "0", "99"))))
    assert(!StatsPredicate.extract(GreaterThanOrEqual(x, Literal(99L)))
      .disjoint(Seq(ManifestCommit.ColStats("x", "num", "0", "99"))))
    // pruning stays CLOSED (conservative): x > 99 still keeps the dir
    assert(e.bounds.nonEmpty || e.orGroups.nonEmpty)
  }

  test("programmatic Column DSL predicates extract: the Spark-4 Column " +
      "bridge renders operators as UnresolvedFunction calls, which must " +
      "normalize to the catalyst grammar (round-18 fix: they extracted " +
      "NOTHING — no pruning, no disjointness proof)") {
    import org.apache.spark.sql.functions.col
    def exprOf(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
    val e = StatsPredicate.extract(
      exprOf(col("id") >= 1 && col("id") <= 100))
    assert(e.bounds.toSet ===
      Set(("id", Some("1"), None), ("id", None, Some("100"))))
    assert(e.disjoint(Seq(ManifestCommit.ColStats("id", "num", "301", "400"))))
    // equality carries a bloom point; isin carries per-value candidates
    val eq = StatsPredicate.extract(exprOf(col("k") === "a"))
    assert(eq.points === Seq(("k", "a")))
    val in = StatsPredicate.extract(exprOf(col("id").isin(3L, 5L)))
    assert(in.anyPoints === Seq(("id", Seq(3L, 5L))))
    // OR + NOT ride the same machinery
    val or = StatsPredicate.extract(
      exprOf(col("x") < 5 || col("x") > 20))
    assert(or.orGroups.nonEmpty)
    val not = StatsPredicate.extract(exprOf(!(col("x") > 5)))
    assert(not.bounds === Seq(("x", None, Some("5"))))
    // an unknown function still contributes nothing (conservative)
    val opaque = StatsPredicate.extract(
      exprOf(org.apache.spark.sql.functions.abs(col("x")) > 5))
    assert(opaque.bounds.isEmpty && opaque.orGroups.isEmpty)
  }
}
