package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary lookups as ONE reference-object expression node — the
  * production carrier for driver-sized tokenizer artifacts (a unigram
  * probability table, a piece→id table) applied per row at corpus
  * scale.
  *
  * Why not `typedlit(map)`: a map literal embeds 2·|V| expression nodes
  * in the plan, so the analyzed plan grows O(|V|) per lookup SITE — the
  * unigram Viterbi DP has maxPieceLen lookup sites per position, which
  * at a production vocabulary (32k–256k pieces) is plan explosion, slow
  * analysis, and codegen-size failure (the [[TrainedCells]] adjudication
  * for k-means codebooks, applied to vocabularies). Here the table rides
  * as ONE codegen reference object per expression — plan size O(1) in
  * |V| (PlanSpec pins the independence) — and distribution-wise the
  * reference object rides the stage's task binary, which Spark
  * torrent-broadcasts: one vocabulary copy per executor, the same wire
  * cost as an explicit `broadcast()` join, with no join in the plan.
  *
  * Lookup contract (the `try_element_at(map_literal, key)` twin, pinned
  * bit-exact by UnigramSpec/x119–x123): a hit returns the stored value
  * verbatim; a miss (or null key) is NULL — never a default, because
  * the Viterbi DP's reachability logic keys on the miss.
  *
  * Entries are carried SORTED by piece so the expression (and the
  * content-addressed registry name — distinct vocabularies must never
  * collide in [[Natives]]' per-session registry, the
  * [[TrainedCells.nameSuffix]] discipline) is a pure function of the
  * vocabulary's CONTENT, not of Scala Map iteration order.
  */
private[graft] object VocabLookup {

  /** Content digest over the entry arrays — the registry suffix. */
  def nameSuffix(pieces: Array[String], tail: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    pieces.foreach { p =>
      val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.update((b.length & 0xff).toByte); md.update(b)
    }
    md.update(tail)
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  def doubleBytes(vals: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * vals.length)
    vals.foreach(bb.putDouble); bb.array()
  }

  def longBytes(vals: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * vals.length)
    vals.foreach(bb.putLong); bb.array()
  }
}

private[graft] trait VocabLookupExpr extends UnaryExpression {
  /** Vocabulary pieces, sorted ascending (the content address). */
  def pieces: Array[String]

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${t.sql}")
  }
}

/** piece → probability (the unigram-LM vocabulary served to the
  * Viterbi DP); NULL on miss. */
case class VocabProbLookup(child: Expression, pieces: Array[String],
                           probs: Array[Double])
    extends UnaryExpression with VocabLookupExpr {

  require(pieces.length == probs.length,
    s"${pieces.length} pieces vs ${probs.length} probs")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vocab_prob"

  @transient private lazy val lut: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(UTF8String.fromString(pieces(i)), probs(i)); i += 1
    }
    m
  }

  def lookup(key: UTF8String): java.lang.Double = lut.get(key)

  override def nullSafeEval(v: Any): Any = lookup(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabProb", this,
      classOf[VocabProbLookup].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("hit")
      s"""
         |java.lang.Double $v = $ref.lookup($c);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** piece → dense id (the token-id assignment a training stream ships);
  * NULL on miss. */
case class PieceIdLookup(child: Expression, pieces: Array[String],
                         ids: Array[Long])
    extends UnaryExpression with VocabLookupExpr {

  require(pieces.length == ids.length,
    s"${pieces.length} pieces vs ${ids.length} ids")

  override def dataType: DataType = LongType
  override def prettyName: String = "piece_id"

  @transient private lazy val lut: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(UTF8String.fromString(pieces(i)), ids(i)); i += 1
    }
    m
  }

  def lookup(key: UTF8String): java.lang.Long = lut.get(key)

  override def nullSafeEval(v: Any): Any = lookup(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceId", this,
      classOf[PieceIdLookup].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("hit")
      s"""
         |java.lang.Long $v = $ref.lookup($c);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VocabProbLookup {
  /** Column bridge: `entries` need not be sorted; the expression sorts
    * once so content addressing and the carried arrays are order-free. */
  def apply(key: Column, entries: Map[String, Double]): Column = {
    val sorted = entries.toArray.sortBy(_._1)
    val pieces = sorted.map(_._1)
    val probs = sorted.map(_._2)
    val suffix = VocabLookup.nameSuffix(pieces, VocabLookup.doubleBytes(probs))
    Natives.callRegistered(s"vocab_prob_$suffix",
      exprs => VocabProbLookup(exprs.head, pieces, probs), key)
  }
}

object PieceIdLookup {
  def apply(key: Column, entries: Map[String, Long]): Column = {
    val sorted = entries.toArray.sortBy(_._1)
    val pieces = sorted.map(_._1)
    val ids = sorted.map(_._2)
    val suffix = VocabLookup.nameSuffix(pieces, VocabLookup.longBytes(ids))
    Natives.callRegistered(s"piece_id_$suffix",
      exprs => PieceIdLookup(exprs.head, pieces, ids), key)
  }
}
