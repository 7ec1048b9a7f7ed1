package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native word-n-gram shingle hashing: token array → array of 60-bit
  * md5-prefix integers — the codegen'd twin of the
  * [[graft.ext.MinHash.shingles]] + [[graft.ext.MinHash.shingleHash]]
  * HOF chain (`transform(sequence…)` building shingle STRINGS, then
  * per-shingle `conv(substr(md5(s),1,15),16,10)`).
  *
  * Bit-parity contract (pinned by MinHashSpec): element i = the integer
  * value of the first 15 hex chars of md5 over the UTF-8 bytes of
  * `tok_i ⧺ ' ' ⧺ … ⧺ tok_{i+n−1}` — here the digest is fed the same
  * bytes incrementally (no shingle string is ever materialized), and the
  * 15-hex-char prefix is read directly from the digest bytes (7 bytes +
  * the high nibble of byte 7, big-endian — exactly what
  * `conv(hex,16,10)` parses). Null tokens are skipped together with
  * their separator, matching `concat_ws`. Arrays with fewer than n
  * tokens yield an EMPTY array, matching the HOF guard's `array()`.
  *
  * Why native: the HOF chain evaluates two interpreted lambdas per
  * shingle (string build + hash) and materializes every shingle string;
  * this is one fused loop per document feeding a reused MessageDigest.
  * The shingle stage is the corpus-proportional cost of every near-dup
  * operator (MinHash, SimHash, exact Jaccard) at 100 TB.
  */
case class ShingleMd5(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val count = a.numElements() - n + 1
    if (count < 1) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var first = true
      var o = 0
      while (o < n) {
        if (!a.isNullAt(i + o)) {
          if (!first) md5.update(0x20.toByte)
          md5.update(a.getUTF8String(i + o).getBytes)
          first = false
        }
        o += 1
      }
      val d = md5.digest() // returns AND resets
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      out(i) = (h << 4) | ((d(7) >> 4) & 0xFL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "shingleMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val count = ctx.freshName("count"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val o = ctx.freshName("o")
      val first = ctx.freshName("first"); val d = ctx.freshName("d")
      val h = ctx.freshName("h"); val k = ctx.freshName("k")
      s"""
         |int $count = $a.numElements() - $n + 1;
         |if ($count < 1) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$count];
         |  for (int $i = 0; $i < $count; $i++) {
         |    boolean $first = true;
         |    for (int $o = 0; $o < $n; $o++) {
         |      if (!$a.isNullAt($i + $o)) {
         |        if (!$first) $md.update((byte) 0x20);
         |        $md.update($a.getUTF8String($i + $o).getBytes());
         |        $first = false;
         |      }
         |    }
         |    byte[] $d = $md.digest();
         |    long $h = 0L;
         |    for (int $k = 0; $k < 7; $k++) { $h = ($h << 8) | ($d[$k] & 0xFFL); }
         |    $out[$i] = ($h << 4) | (($d[7] >> 4) & 0xFL);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleMd5 {
  def apply(tokens: Column, n: Int): Column =
    Natives.callRegistered(s"shingle_md5_$n",
      exprs => ShingleMd5(exprs.head, n), tokens)
}
