package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-DSL entry points for the graft custom expressions. */
object columns {
  /** T1/§2.10 byte-level encoding repair as a typed Column op. */
  def repairEncoding(c: Column): Column =
    ColumnBridge.column(RepairEncoding(ColumnBridge.expression(c.cast("string"))))
}
