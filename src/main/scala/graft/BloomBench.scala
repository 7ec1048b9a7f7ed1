package graft

import org.apache.spark.sql.functions._

/** Measurement harness for the striped-bloom PROBE FORM decision
  * (`graft.ext.Decontaminate` — the foldable-literal CASE chain vs a
  * broadcast stripe→bloom lookup): builds stripe blooms at realistic
  * per-filter sizes, probes a large fp stream through both forms, and
  * prints one line per configuration. Run:
  *
  *   sbt "runMain graft.BloomBench"
  *
  * Form A is the shipped probe: one foldable bloom literal per stripe,
  * selected by a codegen'd CASE on `pmod(fp, nStripes)` — the filter
  * bytes ride the STAGE's task binary (re-shipped per stage, stays
  * inside whole-stage codegen). Form B is the alternative the round-16
  * verdict asked to measure: the blooms travel once per executor as a
  * broadcast variable and a `mapPartitions` probe deserializes each
  * stripe lazily per task — per-executor wire cost, but the probe
  * stage drops out of whole-stage codegen. (A broadcast JOIN variant
  * is not implementable with the native expression at all:
  * `BloomFilterMightContain` requires a CONSTANT filter side, and a
  * hash-relation build side would copy the multi-MiB bloom bytes per
  * probed ROW — strictly worse than either form; see the
  * Decontaminate.MaxBloomStripes docstring for the recorded decision.)
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def bloomBits(items: Long, fpp: Double): Long =
      math.max(64L, math.ceil(-items * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)

    val probeN = 20000000L
    def run(nStripes: Int, itemsPerStripe: Long): Unit = {
      val evalN = nStripes * itemsPerStripe
      val eval = spark.range(evalN)
        .select((col("id") * 2654435761L).as("gram_fp"))
      val bits = bloomBits(itemsPerStripe, 0.01)
      val t0 = System.nanoTime
      val rows = eval
        .groupBy(pmod(col("gram_fp"), lit(nStripes.toLong)).as("stripe"))
        .agg(graft.functions.Bloom.agg(col("gram_fp"), itemsPerStripe, bits)
          .as("bloom"))
        .collect()
      val buildS = (System.nanoTime - t0) / 1e9
      val blooms = rows.map(r => r.getAs[Number]("stripe").intValue() ->
        r.getAs[Array[Byte]]("bloom")).toMap
      val totalMB = blooms.values.map(_.length.toLong).sum / 1024.0 / 1024.0

      // probe stream: ~half the fps hit the eval set, half miss
      val probe = spark.range(probeN).select(
        when(col("id") % 2 === 0,
          pmod(shiftright(col("id"), 1), lit(evalN)) * 2654435761L)
          .otherwise(col("id") * 2654435761L + 1L).as("gram_fp"))

      // Form A: the shipped foldable-literal CASE chain
      val stripeCol = pmod(col("gram_fp"), lit(nStripes.toLong))
      val caseProbe = blooms.foldLeft(lit(false)) { case (acc, (i, b)) =>
        when(stripeCol === lit(i.toLong),
          graft.functions.Bloom.mightContain(lit(b), col("gram_fp")))
          .otherwise(acc)
      }
      def time(f: => Long): (Double, Long) = {
        val s = System.nanoTime; val n = f
        ((System.nanoTime - s) / 1e9, n)
      }
      val (wA1, nA) = time(probe.filter(caseProbe).count())
      val (wA2, _) = time(probe.filter(caseProbe).count())

      // Form B: broadcast variable + mapPartitions lazy deserialize
      val bc = spark.sparkContext.broadcast(blooms)
      def probeB(): Long = probe.select(col("gram_fp")).as[Long]
        .mapPartitions { it =>
          val n = nStripes.toLong
          val cache = new java.util.HashMap[
            Int, org.apache.spark.util.sketch.BloomFilter]()
          it.filter { fp =>
            val s = java.lang.Math.floorMod(fp, n).toInt
            bc.value.get(s) match {
              case None => false
              case Some(bytes) =>
                var f = cache.get(s)
                if (f == null) {
                  f = org.apache.spark.util.sketch.BloomFilter.readFrom(
                    new java.io.ByteArrayInputStream(bytes))
                  cache.put(s, f)
                }
                f.mightContainLong(fp)
            }
          }
        }.count()
      val (wB1, nB) = time(probeB())
      val (wB2, _) = time(probeB())
      bc.destroy()
      println(f"STRIPES=$nStripes items/stripe=$itemsPerStripe " +
        f"totalMB=$totalMB%.1f build=$buildS%.1f " +
        f"caseWall=${math.min(wA1, wA2)}%.2f " +
        f"bcastWall=${math.min(wB1, wB2)}%.2f nA=$nA nB=$nB")
    }

    // realistic per-stripe filters (~1.2 MiB each at 1M items / 1% fpp);
    // 8/32/64 stripes — the verdict-prescribed sweep
    run(8, 1000000L)
    run(32, 1000000L)
    run(64, 1000000L)
    spark.stop()
  }
}
