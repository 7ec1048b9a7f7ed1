package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 60-bit SimHash over a shingle-hash array — the codegen'd twin
  * of [[graft.ext.SimHash.simhash]] (reference operator: content
  * fingerprint for near-dup detection; SURVEY.md north-star ops).
  *
  * Bit-parity contract with the interpreted HOF formulation (and hence
  * with the DuckDB oracle): bit j of the result = [Σ over hashes of
  * (±1 per hash-bit j) ≥ 0], packed MSB-first as acc·2 + bit — every
  * step is exact integer arithmetic, so implementation order cannot
  * change the value. A null array element votes −1 on every bit in the
  * HOF version (`when(null ≥ 0)` falls to otherwise(−1)), which equals
  * treating it as h = 0 — mirrored here. Empty arrays → null, matching
  * the HOF's `when(size = 0, null)` guard.
  *
  * Why native: the HOF version nests `aggregate(hashes)` inside
  * `aggregate(sequence(59,0))` — 60 interpreted re-scans of the whole
  * shingle array PER DOCUMENT (no common-subexpression elimination in
  * lambda space). Measured at sf0.1: 431 s interpreted → sub-second as
  * this single fused whole-stage-codegen loop. At 100 TB the fingerprint
  * step is the corpus-proportional cost of SimHash dedup, so this is the
  * loop that must be compiled.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val cnt = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = if (a.isNullAt(i)) 0L else a.getLong(i)
      var j = 0
      while (j < 60) {
        cnt(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 59
    while (j >= 0) { out = out * 2 + (if (cnt(j) >= 0) 1L else 0L); j -= 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $cnt = new int[60];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |    for (int $j = 0; $j < 60; $j++) {
         |      $cnt[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |  long $out = 0L;
         |  for (int $j = 59; $j >= 0; $j--) {
         |    $out = $out * 2 + (($cnt[$j] >= 0) ? 1L : 0L);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(shingleHashes: Column): Column =
    Natives.callRegistered("simhash60",
      exprs => SimHash60(exprs.head), shingleHashes)
}
