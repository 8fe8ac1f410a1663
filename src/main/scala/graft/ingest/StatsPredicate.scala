package graft.ingest

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.NumericType

import graft.ingest.ManifestCommit.ColStats

/** Maps a Catalyst predicate onto the manifest's per-dir stats language:
  * extracts single-column range BOUNDS (for min/max skipping) and
  * equality POINTS (for bloom probes) from the predicate's conjuncts.
  * Shared by the SQL data-skipping rule and the predicate DML operators
  * (`MergeInto.deleteRows`/`updateRows`) so both prune identically.
  *
  * Conservative by construction: conjuncts that don't fit the
  * single-column-vs-literal shape contribute nothing (candidates stay),
  * and callers ALWAYS apply the real predicate to what they read —
  * extraction can only skip, never filter. */
object StatsPredicate {

  final case class Extracted(
      bounds: Seq[(String, Option[String], Option[String])],
      points: Seq[(String, Any)]) {
    /** A dir with these stats provably holds NO row satisfying the
      * predicate — the disjointness proof rebasing commits need for
      * concurrently-added dirs. Empty bounds prove nothing. */
    def disjoint(stats: Seq[ColStats]): Boolean =
      bounds.exists { case (c, lo, hi) =>
        stats.find(_.col == c).exists(cs => !cs.overlaps(lo, hi))
      }
  }

  /** Column name of a plain attribute reference (resolved or not);
    * None for anything computed — a cast or arithmetic wrapper means
    * the recorded stats don't describe the compared value. */
  private def colOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.name)
    case _ => None
  }

  private def toScala(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  private def render(l: Literal): Option[String] =
    if (l.value == null) None
    else Some(ManifestCommit.renderBound(toScala(l)))

  def extract(cond: Expression): Extracted = {
    val bounds = scala.collection.mutable.ArrayBuffer
      .empty[(String, Option[String], Option[String])]
    val points = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]

    def lo(c: Option[String], l: Literal): Unit =
      c.foreach(cc => render(l).foreach(v => bounds += ((cc, Some(v), None))))
    def hi(c: Option[String], l: Literal): Unit =
      c.foreach(cc => render(l).foreach(v => bounds += ((cc, None, Some(v)))))
    def eq(c: Option[String], l: Literal): Unit = c.foreach { cc =>
      render(l).foreach(v => bounds += ((cc, Some(v), Some(v))))
      toScala(l) match {
        case v @ (_: Long | _: Int | _: Short | _: Byte | _: String) =>
          points += ((cc, v))
        case _ => ()
      }
    }

    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }

    split(cond).foreach {
      case EqualTo(a, l: Literal) => eq(colOf(a), l)
      case EqualTo(l: Literal, a) => eq(colOf(a), l)
      case EqualNullSafe(a, l: Literal) if l.value != null => eq(colOf(a), l)
      case EqualNullSafe(l: Literal, a) if l.value != null => eq(colOf(a), l)
      case GreaterThanOrEqual(a, l: Literal) => lo(colOf(a), l)
      case GreaterThan(a, l: Literal) => lo(colOf(a), l)
      case LessThanOrEqual(a, l: Literal) => hi(colOf(a), l)
      case LessThan(a, l: Literal) => hi(colOf(a), l)
      case GreaterThanOrEqual(l: Literal, a) => hi(colOf(a), l)
      case GreaterThan(l: Literal, a) => hi(colOf(a), l)
      case LessThanOrEqual(l: Literal, a) => lo(colOf(a), l)
      case LessThan(l: Literal, a) => lo(colOf(a), l)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        colOf(a).foreach { cc =>
          val lits = vs.map(_.asInstanceOf[Literal])
          val rendered = lits.map(render)
          if (rendered.forall(_.isDefined)) {
            // bound the IN-list by its min/max in the STATS ordering
            // (numeric compare for numeric literals, else string)
            val rs = rendered.flatten
            val numeric = lits.head.dataType.isInstanceOf[NumericType]
            val ordered =
              if (numeric) rs.sortBy(new java.math.BigDecimal(_))
              else rs.sorted
            bounds += ((cc, Some(ordered.head), Some(ordered.last)))
          }
        }
      case _ => ()
    }
    Extracted(bounds.toSeq, points.toSeq)
  }
}
