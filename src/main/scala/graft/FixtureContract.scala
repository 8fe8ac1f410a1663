package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Single checkpoint for every assumption the engine makes about the
  * driver-generated fixtures (TESTDATA.md). Runs first in Verify and
  * Bench so a driver-side regeneration produces ONE diagnostic naming
  * the drifted table/column/type instead of dozens of cryptic analysis
  * errors downstream (round 8 lost 25 queries to a silent
  * TIMESTAMP(NANOS) → timestamp[us] change in events.ts; round 6's zlib
  * canary was the same class of breakage).
  *
  * The contract is deliberately about PHYSICAL shape only — names,
  * types, vector dimensionality — never row contents, so it stays valid
  * across scale factors and data regenerations that keep the schema.
  */
object FixtureContract {

  /** events.ts variants the engine can normalize (Tables.normalizeTs):
    * nanos-as-long fixtures read as LongType under `nanosAsLong`;
    * timestamp[us] fixtures read as TIMESTAMP_NTZ (or TIMESTAMP if the
    * writer marked UTC adjustment). Anything else is drift. */
  private val tsVariants: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  /** Embedding dimensionality the similarity/PQ/PCA operators assume
    * (subspace slicing, plane projections, codebook shapes). */
  val EmbeddingDim = 64

  /** Temporal columns: accepted as NTZ (timestamp[us] fixture, the
    * current generation) or session-zoned TIMESTAMP. */
  private val temporalVariants: Set[DataType] =
    Set(TimestampNTZType, TimestampType)

  private val TS: DataType = null // marker: temporal column, variant-checked

  /** Expected columns per table, matching the driver fixtures exactly
    * (verified against sf0.01 parquet footers, 2026-08-13). `TS` marks
    * temporal columns accepted in any supported physical variant. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TS, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> TS),
    "events"   -> Seq("event_id" -> LongType, "ts" -> TS,
                      "user_id" -> LongType, "event_type" -> StringType,
                      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                      "lang" -> StringType, "source" -> StringType,
                      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  /** Assert the fixture directory satisfies the contract. Throws
    * IllegalStateException with a message naming every violation
    * (table, column, expected vs found type) — all violations in one
    * pass, not fail-at-first, so a regeneration is diagnosed in one run.
    *
    * Footer-only I/O except a single limit(1) row read of embeddings
    * for the dimensionality probe. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    // the contract must diagnose a nanos fixture the same way Tables
    // would read it, so mirror its conf side-effect
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = scala.collection.mutable.ListBuffer.empty[String]

    expected.foreach { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      val schemaOpt =
        try Some(spark.read.parquet(path).schema)
        catch { case e: Exception =>
          problems += s"$table: unreadable at $path (${e.getMessage})"
          None
        }
      schemaOpt.foreach { schema =>
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, dtype) =>
          byName.get(name) match {
            case None =>
              problems += s"$table.$name: column missing (have: ${schema.fieldNames.mkString(", ")})"
            case Some(found) if dtype == TS =>
              // events.ts additionally tolerates nanos-as-long fixtures
              val ok = if (table == "events") tsVariants(found)
                       else temporalVariants(found)
              if (!ok)
                problems += s"$table.$name: unsupported temporal type $found " +
                  s"(engine normalizes ${if (table == "events") "LongType-nanos, " else ""}" +
                  s"TIMESTAMP_NTZ, TIMESTAMP — see Tables.normalizeTs)"
            case Some(found) if found != dtype =>
              problems += s"$table.$name: expected $dtype, found $found"
            case _ => ()
          }
        }
      }
    }

    // vector dimensionality probe: one bounded row
    if (!problems.exists(_.startsWith("embeddings"))) {
      try {
        val row = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select("embedding").limit(1).collect()
        row.headOption.foreach { r =>
          val d = r.getSeq[Float](0).size
          if (d != EmbeddingDim)
            problems += s"embeddings.embedding: expected dim $EmbeddingDim, found $d " +
              s"(similarity/PQ/PCA operators assume $EmbeddingDim)"
        }
      } catch { case e: Exception =>
        problems += s"embeddings.embedding: dim probe failed (${e.getMessage})"
      }
    }

    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"fixture contract violated at $sfDir:\n  " + problems.mkString("\n  "))
  }
}
