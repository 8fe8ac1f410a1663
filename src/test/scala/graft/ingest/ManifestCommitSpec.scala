package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Object-store-safe manifest commit protocol: the crash-point contract.
  * A crash at ANY point before the single manifest replace must leave the
  * previous complete generation served; data dirs are immutable and never
  * renamed, so the manifest write is the only commit point
  * (ingest_runner.py:1529-1592 gets the equivalent atomicity from
  * ClickHouse RENAME TABLE — this is the lakehouse re-expression).
  */
class ManifestCommitSpec extends SparkSpec {

  private val st = StructType(Seq(
    StructField("id", LongType, false),
    StructField("v", StringType, true)))

  private def write(rows: Row*): String => Unit = { dir =>
    mkDf(st, rows: _*).write.mode("overwrite").parquet(dir)
  }

  private def idsOf(root: String): Set[Long] =
    ManifestCommit.read(spark, root).collect().map(_.getLong(0)).toSet

  test("commitReplace is the staging swap: readers see old until the commit, then new") {
    val root = Files.createTempDirectory("manifest_spec_").toString + "/t"
    val g1 = ManifestCommit.newDataDir(root)
    write(Row(1L, "a"), Row(2L, "b"))(g1)
    ManifestCommit.commitReplace(spark, root, Seq(g1))
    assert(idsOf(root) === Set(1L, 2L))
    // generation 2 staged but NOT committed — crash point: readers must
    // still serve generation 1 in full
    val g2 = ManifestCommit.newDataDir(root)
    write(Row(9L, "z"))(g2)
    assert(idsOf(root) === Set(1L, 2L),
      "uncommitted data dir must be invisible (crash between write and commit)")
    ManifestCommit.commitReplace(spark, root, Seq(g2))
    assert(idsOf(root) === Set(9L))
    // displaced generation pruned by the commit
    assert(!Maintenance.exists(spark, g1), "displaced generation reclaimed")
  }

  test("commitAppend accumulates delta dirs; generations are monotone") {
    val root = Files.createTempDirectory("manifest_spec_").toString + "/t"
    val d1 = ManifestCommit.newDataDir(root)
    write(Row(1L, "a"))(d1)
    val m1 = ManifestCommit.commitAppend(spark, root, d1)
    val d2 = ManifestCommit.newDataDir(root)
    write(Row(2L, "b"))(d2)
    val m2 = ManifestCommit.commitAppend(spark, root, d2)
    assert(m1.gen === 1L && m2.gen === 2L && m2.dirs.size === 2)
    assert(idsOf(root) === Set(1L, 2L))
  }

  test("pruneOrphans reclaims crash leftovers but spares live and fresh dirs") {
    val root = Files.createTempDirectory("manifest_spec_").toString + "/t"
    val live = ManifestCommit.newDataDir(root)
    write(Row(1L, "a"))(live)
    ManifestCommit.commitReplace(spark, root, Seq(live))
    val orphan = ManifestCommit.newDataDir(root) // written, never committed
    write(Row(9L, "z"))(orphan)
    // fresh orphan = possibly an ACTIVE writer → survives the age guard
    assert(ManifestCommit.pruneOrphans(spark, root).isEmpty)
    // age it → genuine crash leftover → reclaimed; live dir untouched
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 3600 * 1000L
    val op = new org.apache.hadoop.fs.Path(orphan)
    val it = f.listFiles(op, true)
    while (it.hasNext) f.setTimes(it.next().getPath, old, -1)
    f.setTimes(op, old, -1)
    val removed = ManifestCommit.pruneOrphans(spark, root)
    assert(removed.map(_.split('/').last) === Seq(orphan.split('/').last))
    assert(idsOf(root) === Set(1L), "live generation untouched by prune")
  }

  test("resolve falls through for plain parquet dirs (non-manifest readers unaffected)") {
    val root = Files.createTempDirectory("manifest_spec_").toString + "/plain"
    write(Row(5L, "p"))(root)
    assert(!ManifestCommit.isManifestTable(spark, root))
    assert(ManifestCommit.resolvePaths(spark, root) === Seq(root))
    assert(idsOf(root) === Set(5L))
  }
}
