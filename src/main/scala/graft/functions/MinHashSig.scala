package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a shingle-hash array — the codegen'd
  * twin of [[graft.ext.MinHash.signature]].
  *
  * Bit-parity contract with the interpreted HOF formulation (and the
  * DuckDB oracle): element i = min over shingle hashes h of
  * `(a_i·(h mod P) + b_i) mod P` with P = 1e9+7 and the LCG-derived
  * permutation parameters of [[graft.ext.MinHash.permA]]/`permB` —
  * pure int64 arithmetic (max product (P−1)² ≈ 1.0e18 < 2^63), so the
  * single-pass loop order here cannot change any value vs the HOF's
  * per-i re-scan. Null array elements are skipped, matching `array_min`'s
  * null handling. Empty arrays → null, matching the HOF guard.
  *
  * Why native: the HOF version evaluates `numHashes` interpreted
  * re-scans of the shingle array per document; this is one fused loop
  * maintaining all `numHashes` minima in whole-stage codegen. The
  * signature step is the corpus-proportional cost of MinHash/LSH dedup
  * at 100 TB (the band join downstream only sees 16 longs per doc).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  import MinHashSig.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  @transient private lazy val pA: Array[Long] =
    Array.tabulate(numHashes)(MinHashSig.permA)
  @transient private lazy val pB: Array[Long] =
    Array.tabulate(numHashes)(MinHashSig.permB)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val hm = a.getLong(i) % P
        var k = 0
        while (k < numHashes) {
          val p = (pA(k) * hm + pB(k)) % P
          if (p < mins(k)) mins(k) = p
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", pA, "long[]")
    val bRef = ctx.addReferenceObj("permB", pB, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val hm = ctx.freshName("hm"); val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      long $hm = $a.getLong($i) % ${P}L;
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        long $p = ($aRef[$k] * $hm + $bRef[$k]) % ${P}L;
         |        if ($p < $mins[$k]) $mins[$k] = $p;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** Shared constants with [[graft.ext.MinHash]] (P = 1e9+7; LCG
    * permutation parameters, a_i non-zero mod P). */
  val P = 1000000007L
  def permA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % (P - 1) + 1
  def permB(i: Int): Long = (1103515245L * (i + 101) + 12345L) % P

  def apply(shingleHashes: Column, numHashes: Int): Column =
    Natives.callRegistered(s"minhash_sig_$numHashes",
      exprs => MinHashSig(exprs.head, numHashes), shingleHashes)
}
