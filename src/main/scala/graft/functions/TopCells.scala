package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Probe-cell SELECTION as a single codegen'd expression: the
  * `nProbe` best cell ids of an embedding, `array<int>` in best-first
  * order — replacing the `posexplode(all k scores)` → `row_number`
  * window formulation on every probe path that scales with the data.
  *
  * Why this matters at 100 TB: probe generation runs per SHARD vector
  * in [[graft.ext.VectorStore.dedupAgainstStoreWith]] (the continuous-
  * ingest hot path). The explode-then-rank formulation materializes
  * k rows per vector and pushes them through a `row_number` window —
  * an Exchange plus k×|shard| intermediate rows. At the IVF-realistic
  * k = 4k–64k cells the [[TrainedCells]] docstring targets, a
  * 10 M-vector shard would push 40–640 G rows through that shuffle.
  * Here the selection is O(k·dim) compute per row INSIDE whole-stage
  * codegen (an insertion pass over a bounded nProbe-slot buffer — the
  * same cost the assignment expression already pays), emitting exactly
  * `min(nProbe, k)` output rows per vector after a narrow `explode`:
  * no Window, no Exchange, no k-wide intermediate (PlanSpec pins the
  * probe subtree free of both).
  *
  * Selection order is EXACTLY the windowed formulation's on finite
  * scores: best score first, ties to the LOWEST cell id (cells are
  * scanned in ascending id and an equal score never displaces an
  * earlier one — the `ORDER BY rank, cell` the DuckDB oracles replay).
  * Non-finite embeddings (NaN/Inf components, possible only on the
  * double-scored LCG path) are OUT OF CONTRACT upstream; this
  * expression pins the saner edge anyway: a NaN cell score never beats
  * any score (NaN-scored cells are selected only when fewer than
  * nProbe finite-scored cells exist), matching the `negate(score) ASC`
  * ordering the window path has used since the CellScorer refactor.
  *
  * Two implementations, one per codebook family: [[TrainedTopCells]]
  * (minimum quantized int64 squared-L2, ascending —
  * [[TrainedCellDists]]' arithmetic with the ranking fused in) and
  * [[LcgTopCells]] (maximum `dot(v, c_k)/‖c_k‖`, descending —
  * [[NearestCentroid]]'s arithmetic; retires the interpreted
  * [[graft.ext.Similarity.centroidScores]] HOF from every probe path).
  */
case class TrainedTopCells(child: Expression, cents: Array[Long], dim: Int,
                           nProbe: Int)
    extends UnaryExpression with TrainedCellExpr {
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def prettyName: String = "trained_top_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val u = quantized(v)
    val m = math.min(nProbe, nCells)
    val bestS = new Array[Long](m)
    val bestC = new Array[Int](m)
    var cnt = 0
    var c = 0
    while (c < nCells) {
      var s = 0L; var j = 0
      while (j < u.length) {
        val d = u(j) - cents(c * dim + j); s += d * d; j += 1
      }
      if (cnt < m || s < bestS(cnt - 1)) {
        var pos = if (cnt < m) { cnt += 1; cnt - 1 } else m - 1
        while (pos > 0 && s < bestS(pos - 1)) {
          bestS(pos) = bestS(pos - 1); bestC(pos) = bestC(pos - 1); pos -= 1
        }
        bestS(pos) = s; bestC(pos) = c
      }
      c += 1
    }
    new GenericArrayData(bestC.take(cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val u = ctx.freshName("u")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val m = ctx.freshName("m"); val cnt = ctx.freshName("cnt")
      val bestS = ctx.freshName("bestS"); val bestC = ctx.freshName("bestC")
      val pos = ctx.freshName("pos"); val out = ctx.freshName("out")
      s"""
         |${genQuantize(ctx, a, n, u)}
         |int $m = java.lang.Math.min($nProbe, $nCells);
         |long[] $bestS = new long[$m];
         |int[] $bestC = new int[$m];
         |int $cnt = 0;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $d = $u[$j] - $cRef[$c * $dim + $j];
         |    $s += $d * $d;
         |  }
         |  if ($cnt < $m || $s < $bestS[$cnt - 1]) {
         |    int $pos;
         |    if ($cnt < $m) { $pos = $cnt; $cnt++; } else { $pos = $m - 1; }
         |    while ($pos > 0 && $s < $bestS[$pos - 1]) {
         |      $bestS[$pos] = $bestS[$pos - 1];
         |      $bestC[$pos] = $bestC[$pos - 1];
         |      $pos--;
         |    }
         |    $bestS[$pos] = $s; $bestC[$pos] = $c;
         |  }
         |}
         |int[] $out = new int[$cnt];
         |System.arraycopy($bestC, 0, $out, 0, $cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrainedTopCells {
  def apply(emb: Column, cents: Array[Long], dim: Int, nProbe: Int): Column = {
    // eager — the registry builder only runs at analysis, which would
    // defer (or on a cached plan skip) the misuse signal
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    Natives.callRegistered(
      s"trained_top_cells_${nProbe}_${TrainedCells.nameSuffix(cents, dim)}",
      exprs => TrainedTopCells(exprs.head, cents, dim, nProbe), emb)
  }
}

/** The `nProbe` best cells of the deterministic LCG codebook (maximum
  * `dot(v, c_k)/‖c_k‖`, descending — [[NearestCentroid]]'s arithmetic
  * with the ranking fused in). Retires the interpreted
  * [[graft.ext.Similarity.centroidScores]] HOF from every probe path. */
case class LcgTopCells(child: Expression, nCentroids: Int, dim: Int,
                       seedOffset: Long, nProbe: Int)
    extends UnaryExpression {
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
  require(nCentroids >= 1, s"nCentroids must be >= 1, got $nCentroids")

  override def prettyName: String = "lcg_top_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  private lazy val floatElements: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val (weights, norms) =
    NearestCentroid.codebook(nCentroids, dim, seedOffset)

  // "s strictly better than t" under higher-is-better with NaN worst:
  // a NaN score never beats anything (incl. another NaN — stability
  // keeps the earlier cell), and any finite score beats a NaN
  private def better(s: Double, t: Double): Boolean =
    (t != t && s == s) || s > t

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val m = math.min(nProbe, nCentroids)
    val bestS = new Array[Double](m)
    val bestC = new Array[Int](m)
    var cnt = 0
    var k = 0
    while (k < nCentroids) {
      var dot = 0.0; var j = 0
      while (j < n) {
        val x = if (floatElements) a.getFloat(j).toDouble else a.getDouble(j)
        dot += x * weights(k * dim + j); j += 1
      }
      val s = dot / norms(k)
      if (cnt < m || better(s, bestS(cnt - 1))) {
        var pos = if (cnt < m) { cnt += 1; cnt - 1 } else m - 1
        while (pos > 0 && better(s, bestS(pos - 1))) {
          bestS(pos) = bestS(pos - 1); bestC(pos) = bestC(pos - 1); pos -= 1
        }
        bestS(pos) = s; bestC(pos) = k
      }
      k += 1
    }
    new GenericArrayData(bestC.take(cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    val nm = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (floatElements) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val s = ctx.freshName("s"); val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt"); val bestS = ctx.freshName("bestS")
      val bestC = ctx.freshName("bestC"); val pos = ctx.freshName("pos")
      val out = ctx.freshName("out")
      // (t != t && s == s) || s > t — "better under NaN-worst", inlined
      def better(sv: String, tv: String) =
        s"(($tv != $tv && $sv == $sv) || $sv > $tv)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $m = java.lang.Math.min($nProbe, $nCentroids);
         |double[] $bestS = new double[$m];
         |int[] $bestC = new int[$m];
         |int $cnt = 0;
         |for (int $k = 0; $k < $nCentroids; $k++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $a.$get($j)) * $w[$k * $dim + $j];
         |  }
         |  double $s = $dot / $nm[$k];
         |  if ($cnt < $m || ${better(s, s"$bestS[$cnt - 1]")}) {
         |    int $pos;
         |    if ($cnt < $m) { $pos = $cnt; $cnt++; } else { $pos = $m - 1; }
         |    while ($pos > 0 && ${better(s, s"$bestS[$pos - 1]")}) {
         |      $bestS[$pos] = $bestS[$pos - 1];
         |      $bestC[$pos] = $bestC[$pos - 1];
         |      $pos--;
         |    }
         |    $bestS[$pos] = $s; $bestC[$pos] = $k;
         |  }
         |}
         |int[] $out = new int[$cnt];
         |System.arraycopy($bestC, 0, $out, 0, $cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LcgTopCells {
  def apply(emb: Column, nCentroids: Int, dim: Int, seedOffset: Long,
            nProbe: Int): Column = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    Natives.callRegistered(
      s"lcg_top_cells_${nCentroids}_${dim}_${seedOffset}_$nProbe",
      exprs => LcgTopCells(exprs.head, nCentroids, dim, seedOffset, nProbe),
      emb)
  }
}
