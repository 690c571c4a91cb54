package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash: bit-identical to the composable
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long` but fused.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation ladder): the
  * composable chain materializes a 32-char hex UTF8String per row,
  * substrings it, and re-parses base-16 — three allocations on the
  * hottest path of the text pipeline (every shingle of every document
  * flows through this in dedup/fingerprinting). The fused form reads
  * the first 60 bits straight off the digest bytes; the only
  * per-row allocation left is md5's own input copy.
  *
  * Semantics: first 15 hex chars of md5 == top 60 bits of the digest,
  * big-endian, as an (always positive) long; null in, null out.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  // Registration ([[GraftExtensions]]) casts the child to string, so
  // eval always sees UTF8String (ExpectsInputTypes is private[sql]).
  override def dataType: DataType = LongType

  override def prettyName: String = "hash60"

  protected override def nullSafeEval(s: Any): Any =
    Hash60.hash(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes), big-endian — equals parsing the first
    * 15 hex chars of the digest. Called from generated code. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (dig(i) & 0xFFL); i += 1 }
    hi >>> 4
  }
}
