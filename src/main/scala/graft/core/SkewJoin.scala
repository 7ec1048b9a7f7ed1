package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 / the 100 TB design
  * notes): when one join key carries a disproportionate share of rows
  * (a hot symbol, a bot user_id), a plain hash join sends the whole hot
  * key to one task. Salting splits it: the skewed (large) side gets a
  * deterministic per-row salt in [0, factor), the small side is exploded
  * to every salt value, and the join runs on (keys, salt) — the hot key
  * now spreads over `factor` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) covers sort-merge joins at runtime; this utility is for
  * the cases AQE cannot split (e.g. a skewed broadcast-side-too-big
  * shuffle join, or pre-AQE-stable partitioning you want pinned).
  *
  * The salt is `pmod(xxhash64(all left columns), factor)` — deterministic
  * (rerun-stable, no `rand()`), and spread even for identical key values
  * as long as any other column varies.
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      keys: Seq[String], saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
