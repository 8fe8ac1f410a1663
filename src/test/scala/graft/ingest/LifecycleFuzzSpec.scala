package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Seeded random LIFECYCLE fuzz over one manifest table: a sequence of
  * appends, merges (updates/deletes/inserts), deletion-vector deletes,
  * schema-evolving merges, minor compactions, z-order rewrites, and
  * snapshot expirations — after EVERY step the live table must equal an
  * independently-maintained in-memory model, and time travel to any
  * retained generation must equal that generation's model snapshot.
  * This is the net that catches cross-feature interactions no single
  * gate exercises (DV + evolution + compaction compositions, retention
  * over dv files, stats after rewrites). Deterministic: fixed seed. */
class LifecycleFuzzSpec extends SparkSpec {

  private case class ModelRow(v: String, amt: Double, tag: Option[String])

  private val baseSchema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("v", StringType, true),
    StructField("amt", DoubleType, true)))
  private val evolvedSchema = baseSchema.add(StructField("tag", StringType, true))

  private def df(evolved: Boolean, rows: (Long, ModelRow)*): DataFrame = {
    val rs = rows.map { case (id, m) =>
      if (evolved) Row(id, m.v, m.amt, m.tag.orNull) else Row(id, m.v, m.amt)
    }
    mkDf(if (evolved) evolvedSchema else baseSchema, rs: _*)
  }

  private def snapshot(root: String): Map[Long, ModelRow] =
    ManifestCommit.read(spark, root).collect().map { r =>
      val tag = if (r.schema.fieldNames.contains("tag"))
        Option(r.getAs[String]("tag")) else None
      r.getAs[Long]("id") -> ModelRow(r.getAs[String]("v"), r.getAs[Double]("amt"), tag)
    }.toMap

  test("random op sequence: live read == model, time travel == model history") {
    val root = Files.createTempDirectory("fuzz_spec_").toString + "/t"
    val rnd = new scala.util.Random(4242)
    var model = Map.empty[Long, ModelRow]
    var nextId = 0L
    var evolved = false
    // model snapshot per generation, for time-travel checks
    var history = Map.empty[Long, Map[Long, ModelRow]]

    def fresh(n: Int): Seq[(Long, ModelRow)] = (1 to n).map { _ =>
      nextId += 1
      nextId -> ModelRow(s"v$nextId-0", rnd.nextInt(1000).toDouble, None)
    }
    def liveKeys: Seq[Long] = model.keys.toSeq.sorted
    def sample(k: Int): Seq[Long] =
      rnd.shuffle(liveKeys).take(k.min(liveKeys.size))

    // op 0: initial commit
    locally {
      val rows = fresh(20)
      val d = ManifestCommit.newDataDir(root)
      df(evolved, rows: _*).write.parquet(d)
      ManifestCommit.commitReplace(spark, root, Seq(d),
        pruneDisplaced = false,
        stats = Map(d -> ManifestCommit.dirStats(spark, d, Seq("id"))))
      model = rows.toMap
    }

    (1 to 30).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // append a fresh batch
          val rows = fresh(1 + rnd.nextInt(8))
          val d = ManifestCommit.newDataDir(root)
          df(evolved, rows: _*).write.parquet(d)
          ManifestCommit.commitAppend(spark, root, d,
            stats = ManifestCommit.dirStats(spark, d, Seq("id")))
          model ++= rows
        case 1 => // merge: updates + deletes + inserts
          val upd = sample(3).map(id => id ->
            model(id).copy(v = s"v$id-u$step", amt = model(id).amt + 1))
          val del = sample(2).filterNot(upd.map(_._1).contains)
          val ins = fresh(2)
          val srcRows = upd ++ del.map(id => id -> model(id)) ++ ins
          if (srcRows.nonEmpty) {
            val src = df(evolved, srcRows: _*)
              .withColumn("__kill", col("id").isin(del: _*))
            MergeInto.merge(spark, root, src, Seq("id"),
              deleteWhen = Some(col("__kill") === true))
            model = model -- del ++ upd ++ ins
          }
        case 2 => // deletion-vector sparse delete
          val del = sample(1 + rnd.nextInt(3))
          if (del.nonEmpty) {
            MergeInto.deleteWhere(spark, root, mkDf(
              StructType(Seq(StructField("id", LongType, false))),
              del.map(Row(_)): _*))
            model --= del
          }
        case 3 if !evolved => // schema evolution: one merge carries `tag`
          val upd = sample(2).map(id => id ->
            model(id).copy(v = s"v$id-e", tag = Some(s"t$step")))
          if (upd.nonEmpty) {
            evolved = true
            MergeInto.merge(spark, root, df(evolved, upd: _*), Seq("id"),
              evolveSchema = true)
            // evolution null-fills every pre-existing row
            model = model.view.mapValues(m => m).toMap ++ upd
          }
        case 3 => // already evolved: plain update merge with tags
          val upd = sample(2).map(id => id ->
            model(id).copy(tag = Some(s"t$step")))
          if (upd.nonEmpty) {
            MergeInto.merge(spark, root, df(evolved, upd: _*), Seq("id"))
            model ++= upd
          }
        case 4 => // minor compaction
          Optimize.compactSmall(spark, root, smallBytes = 1L << 20)
        case 5 => // z-order rewrite on (id, amt-as-long)
          if (model.nonEmpty)
            Optimize.zorderCompactN(spark, root, Seq("id", "amt"),
              targetDirs = 1 + rnd.nextInt(3))
        case 6 => // retention sweep
          ManifestCommit.expireSnapshots(spark, root, keepLast = 2)
      }
      // invariant 1: live read equals the model
      assert(snapshot(root) === model, s"live mismatch after step $step")
      val gen = ManifestCommit.readManifest(spark, root).get.gen
      history += gen -> model
      // invariant 2: every retained generation equals its model snapshot
      // (generations before the evolution flip lack `tag`, which the
      // history recorded at their time)
      ManifestCommit.snapshotGens(spark, root).foreach { g =>
        history.get(g).foreach { snap =>
          val got = ManifestCommit.readAt(spark, root, g).collect().map { r =>
            val tag = if (r.schema.fieldNames.contains("tag"))
              Option(r.getAs[String]("tag")) else None
            r.getAs[Long]("id") ->
              ModelRow(r.getAs[String]("v"), r.getAs[Double]("amt"), tag)
          }.toMap
          assert(got === snap, s"time travel to gen $g mismatch after step $step")
        }
      }
    }
    // final hygiene: orphan prune finds nothing to reclaim mid-lifecycle
    assert(ManifestCommit.pruneOrphans(spark, root, minAgeMs = 0L).isEmpty)
  }
}
