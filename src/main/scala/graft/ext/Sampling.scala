package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for a training-data
  * pipeline: reproducible Bernoulli sampling and per-stratum rate mixing
  * (the "80% en, 30% zh, 50% everything else" recipe step).
  *
  * No `rand()` anywhere: the keep/drop decision is a pure function of a
  * stable key — `md5(key) mod denom < rate·denom` using the md5-prefix
  * integer primitive shared with the DuckDB oracle — so a sample is
  * reproducible across runs, engines, partitionings and retries
  * (`rand()`-based sampling changes under AQE re-planning and task
  * retry, which silently breaks dataset reproducibility at scale).
  * Narrow per-row expressions: no shuffle, fully codegen'd, and the
  * filter sits directly above the scan.
  */
object Sampling {

  /** Sampling denominator: rates are resolved to 1/10000 granularity. */
  val Denom = 10000

  /** Stable bucket in [0, Denom) from any key column. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(Denom.toLong))

  /** Deterministic Bernoulli sample: keep rows whose key-bucket falls
    * under `rate` (0.0–1.0). */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(col(keyCol)) < math.round(rate * Denom))
  }

  /** Per-stratum rate mixing: keep a row iff its key-bucket falls under
    * its stratum's rate (`defaultRate` for unlisted strata). The rate
    * lookup compiles to a CASE chain — still one narrow codegen'd
    * filter over the scan. */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1], got $r"))
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultRate * Denom)): Column) { case ((stratum, r), acc) =>
      when(col(stratumCol) === stratum, lit(math.round(r * Denom))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }
}
