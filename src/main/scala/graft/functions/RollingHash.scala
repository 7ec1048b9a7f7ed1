package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear Rabin–Karp rolling hash over a string's code points:
  * `h = fold(codepoints)(acc → (257·acc + cp) mod (2⁶¹−1))` — the classic
  * content-defined fingerprint (base 257, Mersenne prime modulus).
  *
  * The modular step uses the Mersenne rotate identity
  * `a·2ᵏ mod (2⁶¹−1) = rot61(a, k)` (a 61-bit left rotation), so
  * `257·a = a·2⁸ + a` needs no 128-bit intermediate: rotate, one add, one
  * conditional subtract — overflow-free for any input length (the
  * previous HOF formulation `pmod(acc·257 + c, P)` overflowed int64 — an
  * ANSI runtime error — once acc exceeded 2⁶³/257, i.e. on any text
  * beyond a few characters whose fold value grew past ~3.6·10¹⁶, and its
  * per-character `substring(normalize(text), i, 1)` was O(n²) in
  * characters). Values equal the mathematical fold exactly (pinned
  * against a BigInt reference in TextAnalysisSpec).
  *
  * Engine-portability: the rotate needs 61-bit integer semantics, so this
  * stays library surface (no DuckDB oracle), like the reference's
  * fingerprint utilities.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      // 257·acc mod P = rot61(acc, 8) + acc (mod P), each step < 2P
      val rot = ((acc << 8) | (acc >>> 53)) & RollingHash.P
      var t = rot + acc
      if (t >= RollingHash.P) t -= RollingHash.P
      acc = t + cp
      if (acc >= RollingHash.P) acc -= RollingHash.P
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val cp = ctx.freshName("cp")
      val t = ctx.freshName("t")
      s"""
         |String $s = $str.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += Character.charCount($cp);
         |  long $t = ((($acc << 8) | ($acc >>> 53)) & ${RollingHash.P}L) + $acc;
         |  if ($t >= ${RollingHash.P}L) $t -= ${RollingHash.P}L;
         |  $acc = $t + $cp;
         |  if ($acc >= ${RollingHash.P}L) $acc -= ${RollingHash.P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Mersenne prime 2⁶¹ − 1. */
  val P: Long = 2305843009213693951L

  def apply(text: Column): Column =
    Natives.callRegistered("rolling_hash",
      exprs => RollingHash(exprs.head), text)
}
