package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement kernel for the CDF uniqueness guard's ROW-HEAVY residual
  * (VERDICT r15 "Next round" #3): on a 2M-row full-rewrite diff the
  * window-form guard costs 1.5–1.9× over assumeUnique — WindowExec
  * buffers per group and breaks the codegen span. This kernel times the
  * competing shapes over the SAME two staged row sets:
  *
  *  - `none`      — the assumeUnique baseline (plain full-outer join);
  *  - `window`    — count(1) OVER (PARTITION BY key): shares the join's
  *                  Exchange+Sort, pays WindowExec buffering;
  *  - `aggprobe`  — partial-agg count-per-key probe (one row per key per
  *                  map task crosses the wire), duplicates-only result
  *                  BROADCAST back as a left join: the main row path
  *                  keeps the join's single Exchange+Sort and stays
  *                  inside whole-stage codegen; the probe pays one extra
  *                  narrow scan + small shuffle.
  *
  * Run: `sbt "runMain graft.GuardKernel [rows]"` — prints min-of-3
  * seconds per variant and the ratio vs baseline.
  */
object GuardKernel {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv("graft-guard-kernel")
    import spark.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val base = GraftTmp.dir("guard_kernel")
    val oldDir = s"$base/old"
    val newDir = s"$base/new"
    // row-heavy: a key, a numeric, and a ~40-byte string payload; the
    // rewrite shifts half the keys and updates every surviving value —
    // the full-table-rewrite diff shape
    def payload(c: org.apache.spark.sql.Column) =
      md5(c.cast("string"))
    val wide = args.lift(1).exists(_.toBoolean)
    val extraCols = if (wide) (1 to 6).map(i => s"s$i") else Nil
    def withPayload(df: DataFrame, salt: Int): DataFrame =
      extraCols.zipWithIndex.foldLeft(
        df.withColumn("s", payload(col("id") + salt))) { case (d, (c, i)) =>
        d.withColumn(c, payload(col("id") + salt + i + 1))
      }
    withPayload(spark.range(n).toDF("id").withColumn("v", col("id") * 2), 0)
      .write.mode("overwrite").parquet(oldDir)
    withPayload(spark.range(n / 2, n + n / 2).toDF("id")
      .withColumn("v", col("id") * 3), 1)
      .write.mode("overwrite").parquet(newDir)

    val keys = Seq("id")
    val cols = Seq("id", "v", "s") ++ extraCols

    def mark(df0: DataFrame, name: String, mode: String): DataFrame = mode match {
      case "none" => df0.withColumn(name, lit(true))
      case "window" =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(df0(_)): _*)
        df0.withColumn(name,
          when(count(lit(1)).over(w) > 1, raise_error(lit("dup"))
            .cast("boolean")).otherwise(lit(true)))
      case "aggprobe" =>
        val dups = df0.groupBy(keys.map(df0(_)): _*)
          .agg(count(lit(1)).as("__dn")).filter(col("__dn") > 1)
          .limit(8192)
          .select(keys.map(col): _*).withColumn("__dup", lit(true))
        df0.join(broadcast(dups), keys, "left")
          .withColumn(name,
            when(col("__dup").isNotNull,
              raise_error(lit("dup")).cast("boolean")).otherwise(lit(true)))
          .drop("__dup")
    }

    def diffPlan(mode: String): DataFrame = {
      val old = mark(spark.read.parquet(oldDir), "__o", mode)
      val neu = mark(spark.read.parquet(newDir), "__n", mode)
      val cond = keys.map(k => old(k) <=> neu(k)).reduce(_ && _)
      val joined = old.join(neu, cond, "full_outer")
      val dataCols = cols.filterNot(keys.contains)
      val rowChanged = dataCols.map(c => !(old(c) <=> neu(c))).reduce(_ || _)
      def img(side: String => org.apache.spark.sql.Column, tpe: String) =
        struct((cols.map(c => side(c).as(c)) :+ lit(tpe).as("_ct")): _*)
      val changes = when(neu("__n").isNull, array(img(old(_), "delete")))
        .when(old("__o").isNull, array(img(neu(_), "insert")))
        .otherwise(array(img(old(_), "pre"), img(neu(_), "post")))
      joined.filter(neu("__n").isNull || old("__o").isNull || rowChanged)
        .select(explode(changes).as("__c")).select("__c.*")
    }

    def time(mode: String): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      diffPlan(mode).count()
      (System.nanoTime() - t0) / 1e9
    }.min

    // warm-up (codegen/JIT) once with the cheapest variant
    diffPlan("none").count()
    val results = Seq("none", "window", "aggprobe").map(m => m -> time(m))
    val baseS = results.head._2
    results.foreach { case (m, s) =>
      println(f"[guard-kernel] rows=$n variant=$m%-9s min3=$s%.3f s  ratio=${s / baseS}%.2fx")
    }
    GraftTmp.purge()
    spark.stop()
  }
}
