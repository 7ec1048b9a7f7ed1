package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit

/** Column bridge to Spark's OWN bloom-filter expressions
  * (`bloom_filter_agg` / `might_contain` — the pair `InjectRuntimeFilter`
  * wires up automatically for selective shuffle joins). They are not in
  * the public function registry, so operators that want an EXPLICIT
  * bloom-prefilter plan — a semi-join reduction the optimizer's
  * heuristics would not derive, e.g.
  * [[graft.ext.Decontaminate.contaminatedBloom]]'s
  * benchmark-gram filter — go through this bridge (same mechanism as
  * the engine's native expressions, [[Natives.callRegistered]]).
  *
  * Both are Spark-native codegen-capable expressions: zero UDFs, and
  * the serialized filter is deserialized once per task, not per row.
  */
object Bloom {

  /** Aggregate a LongType column into a serialized bloom filter
    * (BinaryType, one row). `estimatedItems`/`numBits` must respect the
    * session's runtime-bloom-filter caps (4e6 items / 6.7e7 bits by
    * default) — callers clamp. */
  def agg(longCol: Column, estimatedItems: Long, numBits: Long): Column =
    Natives.callRegistered("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      longCol, lit(estimatedItems), lit(numBits))

  /** Membership probe of a LongType value against a CONSTANT serialized
    * bloom filter (pass the collected bytes as `lit(bytes)` — the
    * expression requires a constant or scalar subquery, exactly like
    * the optimizer-injected runtime filter). */
  def mightContain(bloom: Column, longCol: Column): Column =
    Natives.callRegistered("graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      bloom, longCol)
}
