package graft.fact

import graft.dim.DimDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Star-schema fact build (SURVEY.md §2.4 J3, §2.5 M5; reference
  * `dags/sql/7. merge_fact_daily_price.sql:23-52`).
  *
  * `CORE ⋈ DIM_SECURITY ON symbol ⋈ DIM_DATE ON date_sk` — the reference's
  * DIM_DATE leg takes no columns from the dim, so it is semantically a
  * LEFT SEMI join (referential-integrity enforcement only); we plan it as
  * such. Both dims are small (≤ ~12k rows) → explicit `broadcast()` so the
  * fact build is a shuffle-free map-side join at any fact scale.
  */
object FactDailyPrice {

  def build(core: DataFrame, dimSecurity: DataFrame, dimDate: DataFrame): DataFrame = {
    val withSk = core.withColumn("date_sk", DimDate.dateSk(col("trade_date")))
    withSk
      .join(broadcast(dimSecurity), Seq("symbol"), "inner")
      .join(broadcast(dimDate.select("date_sk")), Seq("date_sk"), "left_semi")
      .select(
        col("security_id"), col("date_sk"), col("trade_date"),
        col("open"), col("high"), col("low"), col("close"), col("volume"),
        col("load_ts"))
  }
}
