package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Shared core of the TRAINED-codebook IVF assignment expressions: the
  * fitted k-means centroids ([[graft.ext.KMeans.fit]], quantized-integer
  * domain) are carried as ONE flattened `long[k·dim]` codegen reference
  * object — NOT as per-centroid array literals — so the plan holds a
  * single expression node regardless of k. At IVF-realistic codebook
  * sizes (4k–64k cells for a 100 TB store) the literal embedding the
  * first `ivfTopKTrained` cut used would be O(k·dim) plan nodes and an
  * O(k) aggregate chain per row (plan explosion, codegen failure); here
  * plan size is O(1) in k and the per-row work is one fused loop in
  * whole-stage codegen (PlanSpec pins the plan-size independence).
  * Distribution-wise the reference object rides the stage's task
  * binary, which Spark torrent-broadcasts — one codebook copy per
  * executor, the same wire cost as [[graft.ext.KMeans]]' explicit
  * `broadcast(centroids)` convention.
  *
  * Arithmetic contract (bit-parity with [[graft.ext.KMeans]] and the
  * DuckDB oracle): each input element quantizes exactly as
  * [[graft.ext.KMeans.quantize]] — `floor(v·2²⁰ + 0.5) + 2²¹`, exact in
  * IEEE double — and the per-cell score is the pure-int64 squared L2
  * distance to the cell's quantized centroid (components < 2²², squares
  * < 2⁴⁴, dim-length sums far below 2⁶³: no overflow). Ties resolve to
  * the LOWEST cell index, matching `KMeans.assign`'s
  * `min(struct(dist, cid))`.
  */
private[graft] object TrainedCells {

  /** Quantize element `x` exactly as [[graft.ext.KMeans.quantize]]. */
  @inline def quantize(x: Double): Long =
    math.floor(x * 1048576d + 0.5d).toLong + 2097152L

  /** Content-addressed registry suffix: distinct codebooks must never
    * share a registered function name ([[Natives.callRegistered]] keeps
    * first-registration-wins semantics per session, so a name collision
    * would silently score against the wrong codebook). */
  def nameSuffix(cents: Array[Long], dim: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8 * (cents.length + 1))
    cents.foreach(bb.putLong)
    bb.putLong(dim.toLong)
    md.digest(bb.array()).take(8).map("%02x".format(_)).mkString
  }
}

private[graft] trait TrainedCellExpr extends UnaryExpression {
  /** Flattened `k·dim` quantized centroid coordinates, cell-major. */
  def cents: Array[Long]
  def dim: Int
  final def nCells: Int = cents.length / dim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  protected final def floatElements: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Quantize the row's embedding once (not once per cell). */
  protected final def quantized(v: Any): Array[Long] = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val u = new Array[Long](n)
    var j = 0
    while (j < n) {
      val x = if (floatElements) a.getFloat(j).toDouble else a.getDouble(j)
      u(j) = TrainedCells.quantize(x); j += 1
    }
    u
  }

  /** Shared codegen fragment: quantize into `u`, then per-cell int64
    * squared-L2 into the caller's loop body. */
  protected final def genQuantize(ctx: CodegenContext, a: String,
                                  n: String, u: String): String = {
    val get = if (floatElements) "getFloat" else "getDouble"
    val j = ctx.freshName("j")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $dim);
       |long[] $u = new long[$n];
       |for (int $j = 0; $j < $n; $j++) {
       |  $u[$j] = (long) java.lang.Math.floor(((double) $a.$get($j)) * 1048576.0 + 0.5) + 2097152L;
       |}
     """.stripMargin
  }
}

/** Per-cell squared-L2 distances (quantized-integer domain) of an
  * embedding against a trained codebook — `array<bigint>` indexed by
  * positional cell id. The query-side probe scorer of the trained IVF
  * paths (`posexplode` → rank ascending). */
case class TrainedCellDists(child: Expression, cents: Array[Long], dim: Int)
    extends UnaryExpression with TrainedCellExpr {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trained_cell_dists"

  override def nullSafeEval(v: Any): Any = {
    val u = quantized(v)
    val out = new Array[Long](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0L; var j = 0
      while (j < u.length) {
        val d = u(j) - cents(c * dim + j); s += d * d; j += 1
      }
      out(c) = s; c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val u = ctx.freshName("u")
      val out = ctx.freshName("out"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |${genQuantize(ctx, a, n, u)}
         |long[] $out = new long[$nCells];
         |for (int $c = 0; $c < $nCells; $c++) {
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $d = $u[$j] - $cRef[$c * $dim + $j];
         |    $s += $d * $d;
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrainedCellDists {
  def apply(emb: Column, cents: Array[Long], dim: Int): Column =
    Natives.callRegistered(
      s"trained_cell_dists_${TrainedCells.nameSuffix(cents, dim)}",
      exprs => TrainedCellDists(exprs.head, cents, dim), emb)
}

/** Positional index of the nearest trained cell (minimum quantized
  * squared-L2; ties to the LOWEST index — `KMeans.assign`'s
  * `min(struct(dist, cid))` rule). The corpus/store-side per-row
  * assignment: one fused loop, no join, no per-cell plan nodes. */
case class TrainedNearestCell(child: Expression, cents: Array[Long], dim: Int)
    extends UnaryExpression with TrainedCellExpr {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "trained_nearest_cell"

  override def nullSafeEval(v: Any): Any = {
    val u = quantized(v)
    var bestC = 0; var bestS = Long.MaxValue
    var c = 0
    while (c < nCells) {
      var s = 0L; var j = 0
      while (j < u.length) {
        val d = u(j) - cents(c * dim + j); s += d * d; j += 1
      }
      if (s < bestS) { bestS = s; bestC = c } // strict < keeps FIRST min
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val u = ctx.freshName("u")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val bestC = ctx.freshName("bestC"); val bestS = ctx.freshName("bestS")
      s"""
         |${genQuantize(ctx, a, n, u)}
         |int $bestC = 0; long $bestS = Long.MAX_VALUE;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $d = $u[$j] - $cRef[$c * $dim + $j];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestS) { $bestS = $s; $bestC = $c; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrainedNearestCell {
  def apply(emb: Column, cents: Array[Long], dim: Int): Column =
    Natives.callRegistered(
      s"trained_nearest_cell_${TrainedCells.nameSuffix(cents, dim)}",
      exprs => TrainedNearestCell(exprs.head, cents, dim), emb)
}
