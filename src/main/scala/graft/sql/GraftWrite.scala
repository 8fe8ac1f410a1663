package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.V2CommandExec
import org.apache.spark.sql.types.StructType

import graft.ingest.{ManifestCommit, MergeInto}

/** Plans [[GraftInsert]] commands. */
case class GraftWriteStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftInsert(root, schema, query, overwrite) =>
      GraftInsertExec(spark, root, schema, query, overwrite) :: Nil
    case GraftDelete(root, cond) =>
      GraftRowOpExec(s"GraftDeleteExec $root",
        () => { MergeInto.deleteRows(spark, root, cond); () }) :: Nil
    case GraftUpdate(root, assigns, cond) =>
      GraftRowOpExec(s"GraftUpdateExec $root",
        () => { MergeInto.updateRows(spark, root, assigns, cond); () }) :: Nil
    case _ => Nil
  }
}

/** Driver-side row-level DML (the dir-level copy-on-write work happens
  * in the thunk's own Spark jobs via `MergeInto.deleteRows/updateRows`). */
case class GraftRowOpExec(label: String, op: () => Unit)
  extends V2CommandExec with LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override def run(): Seq[InternalRow] = { op(); Nil }
  override def simpleString(maxFields: Int): String = label
}

/** Executes `INSERT [OVERWRITE] graft.<name>`: writes the aligned query
  * as ONE new immutable data dir, meters the table's established stat
  * columns over it (min/max/row-count read footer-only — parquet
  * aggregate pushdown — so the stats pass costs no data I/O), and
  * commits through the ordinary CAS protocol:
  *
  *  - INSERT INTO → `commitAppend` (op `insert`): O(1) manifest delta,
  *    prior dirs untouched, the table's recorded schema inherited;
  *  - INSERT OVERWRITE → `commitReplace` (op `insert_overwrite`) with
  *    `pruneDisplaced=false` — displaced dirs stay readable through
  *    time travel until retention expires them, the same contract as
  *    every other replace-family writer.
  *
  * Stat inheritance keeps the table's skipping and manifest-only
  * COUNT(*) alive across SQL writes: the new dir records exactly the
  * columns the existing dirs record (pseudo-stats re-derived, DV
  * dead-counts never inherited — a fresh dir has no deletion vector). */
case class GraftInsertExec(@transient spark: SparkSession, root: String,
    tableSchema: StructType, @transient query: LogicalPlan,
    overwrite: Boolean)
  extends V2CommandExec with LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def run(): Seq[InternalRow] = {
    val df = org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(spark, query)
    val prev = ManifestCommit.readManifest(spark, root)
    val statCols = prev
      .map(_.stats.values.flatten.map(_.col).toSeq.distinct).getOrElse(Nil)
      .filter(c => c == ManifestCommit.RowCountStat ||
        (!ManifestCommit.PseudoStats(c) && tableSchema.fieldNames.contains(c)))
    val dir = ManifestCommit.newDataDir(root)
    df.write.parquet(dir)
    val stats =
      if (statCols.isEmpty) Nil else ManifestCommit.dirStats(spark, dir, statCols)
    if (overwrite)
      ManifestCommit.commitReplace(spark, root, Seq(dir),
        pruneDisplaced = false, stats = Map(dir -> stats),
        schema = prev.flatMap(_.tableSchema), op = "insert_overwrite")
    else
      ManifestCommit.commitAppend(spark, root, dir, stats = stats, op = "insert")
    Nil
  }
}
