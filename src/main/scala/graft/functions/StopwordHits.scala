package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-hit counter: token array → number of token
  * OCCURRENCES found in a fixed word set — the codegen'd twin of the
  * `size(filter(toks, t => t.isin(words…)))` HOF chain in
  * [[graft.ext.TextAnalysis.stopwordRatio]] (one interpreted lambda
  * call per token per language list; the language argmax runs four
  * lists, so every corpus token paid four interpreted calls).
  *
  * The set is a shared `HashSet[UTF8String]` attached as a codegen
  * reference object — tokens are compared as UTF8String without
  * decoding to java.lang.String. Counting semantics are identical to
  * the HOF (occurrences, not distinct hits; null tokens never match),
  * so ratios are bit-identical. Null array → null.
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $cnt = 0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordHits {
  /** Registered-name key: md5 over the NUL-joined word list (content
    * addressed). The session registry replaces only on first use of a
    * name, so a 32-bit `hashCode` key could let two distinct lists
    * collide and silently resolve to the first list's expression — a
    * 128-bit content hash makes that practically impossible. */
  private def nameFor(words: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(words.mkString("\u0000").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    s"stopword_hits_$hex"
  }

  def apply(tokens: Column, words: Seq[String]): Column =
    Natives.callRegistered(
      nameFor(words), exprs => StopwordHits(exprs.head, words), tokens)
}
