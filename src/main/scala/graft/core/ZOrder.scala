package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the clustering key behind Delta/Iceberg `ZORDER BY`: sorting by the
  * interleaved key places rows close in BOTH dimensions into the same
  * files, so min/max file statistics prune scans filtered on either
  * dimension (a plain sort clusters only its leading column).
  *
  * Usage at 100 TB: `df.repartitionByRange(col(zkey)).sortWithinPartitions(zkey)`
  * before the write; each output file then covers a bounded rectangle
  * of (x, y) — which is exactly what x30 checks (per-bucket min/max
  * ranges reproduced by the oracle).
  *
  * The key is pure codegen'd integer bit arithmetic (shift/and/or), so
  * it is engine-portable and oracle-checkable bit-for-bit.
  */
object ZOrder {

  /** 2-d Morton key: interleave the low `bits` bits of two non-negative
    * integer columns (x in the even positions, y in the odd). */
  def zkey2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching DuckDB SQL text (same shift/and arithmetic), for
    * oracle twins. */
  def zkey2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
}
