package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 60-bit SimHash of a token array as a native Catalyst expression — the
  * production-width variant of [[graft.operators.Dedup.simhash]] (whose
  * 16-bit form exists to keep a hand-written SQL oracle tractable; here the
  * oracle is generated programmatically).
  *
  * Per token: md5, take the first 15 hex chars (= first 8 digest bytes
  * unsigned-shifted right by 4 — 60 bits, chosen because DuckDB can parse
  * `('0x' || substr(md5(t),1,15))::BIGINT` but 16 hex chars overflow signed
  * 64-bit). Each bit position accumulates +1/-1 votes across tokens; the
  * result bit is 1 iff the vote is strictly positive (ties → 0, matching
  * `2*count > n`).
  *
  * Why an Expression rather than explode+aggregate: one pass, no shuffle,
  * single md5 per token, constant 60-long vote array per row — the shape a
  * per-document signature wants at 100 TB (embarrassingly parallel scan).
  * Codegen calls the same static kernel as interpreted eval.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 60-bit token hash: first 8 md5 bytes big-endian, unsigned >> 4 —
    * identical to parsing the first 15 hex chars of the md5 string. */
  def tokenHash(token: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = tokenHash(tokens.getUTF8String(i).toString)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
