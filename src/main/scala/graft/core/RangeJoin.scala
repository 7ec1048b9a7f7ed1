package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: probe intervals `[lo, hi]` per key × point
  * events, without the O(|intervals|·|points|) plan a direct
  * `pt BETWEEN lo AND hi` predicate produces (Spark plans a non-equi
  * condition as BroadcastNestedLoopJoin — a scale cliff the moment
  * neither side fits in memory).
  *
  * Standard bucketization: quantize time at `bucketWidth`, explode each
  * interval to the buckets it covers, map each point to its single
  * bucket, then a plain hash equi-join on (key…, bucket) followed by the
  * exact range filter. Each point lands in exactly one bucket, so no
  * output deduplication is needed. Choose `bucketWidth` near the typical
  * interval span: each interval then explodes to O(1) rows and the join
  * degenerates to ~one shuffle of each side — the same plan Flink's
  * interval join and range-join hints in other engines pick.
  *
  * Intervals are inclusive on both ends. Times must be non-negative
  * integers (epoch nanos/micros/days — `div` truncation equals floor
  * there; negative epochs would need floor-division).
  */
object RangeJoin {

  def joinRange(intervals: DataFrame, points: DataFrame, keys: Seq[String],
                lo: String, hi: String, pt: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer `div`, never `/`: epoch-nano values (~1.7e18) exceed the
    // 53-bit double mantissa, so a double division would mis-bucket
    val iv = intervals.withColumn("__rj_bkt",
      explode(sequence(expr(s"`$lo` div ${bucketWidth}L"),
        expr(s"`$hi` div ${bucketWidth}L"))))
    val pts = points.withColumn("__rj_bkt", expr(s"`$pt` div ${bucketWidth}L"))
    iv.join(pts, keys :+ "__rj_bkt")
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__rj_bkt")
  }
}
