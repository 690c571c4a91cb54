package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-substring matcher: `contains_any(s, patterns)` is
  * true iff ANY of the fixed literal `patterns` occurs in `s` —
  * semantically `s rlike quote(p1)|quote(p2)|...` but evaluated by an
  * Aho-Corasick automaton instead of the JVM regex engine.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation ladder): the
  * robot UA filter matches every access-log row against ~1,200
  * literal crawler names. `java.util.regex` evaluates an N-branch
  * alternation by trying branches at every start position —
  * measured **379 µs/row** for a non-matching 115-char UA against
  * the shipped list (`COVERAGE.md`), which at log scale is the whole
  * job. Aho-Corasick is O(len) per row independent of pattern count:
  * measured 0.32-0.38 µs/row on the same input (0.10 µs on a
  * matching bot UA) — a ~1,000x speedup on the non-matching rows
  * that dominate real traffic.
  *
  * The automaton walks the UTF8String's BYTES: pattern bytes are
  * required ASCII (< 0x80) at build time, and any input byte >= 0x80
  * (the lead/continuation bytes of every multi-byte code point)
  * resets to the root — exactly a regex's behavior, since no pattern
  * can span such a byte. Transitions are a dense (node x alphabet)
  * int table over the patterns' own alphabet, so the shipped robot
  * list compiles to ~2 MB that rides the stage's reference array —
  * broadcast-sized, built once per plan, shared by all tasks.
  *
  * Null in, null out (callers coalesce). Case folding is the
  * CALLER's job (pass `lower(ua)` and lowercase patterns), matching
  * the reference's `lc($ua) =~ /.../` shape (`Filter/Robots.pm`).
  */
case class ContainsAny(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "contains_any"

  @transient private lazy val ac = AhoCorasick.build(patterns)

  protected override def nullSafeEval(s: Any): Any =
    ac.containsAny(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.containsAny($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ContainsAny =
    copy(child = newChild)
}

/** Aho-Corasick automaton over ASCII byte patterns (see
  * [[ContainsAny]]). Immutable and serializable; `containsAny` is
  * allocation-free per row. */
final class AhoCorasick private (
    charClass: Array[Byte], // 128 -> alphabet index, -1 = unused
    alphaSize: Int,
    gotoTab: Array[Int], // node * alphaSize + cls -> next (-1 = none)
    fail: Array[Int],
    out: Array[Boolean]) extends Serializable {

  /** True iff any pattern occurs in `s` (byte-wise; bytes >= 0x80
    * reset to root — no ASCII pattern can span them). */
  def containsAny(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var st = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val cls = if (b >= 0) charClass(b) else -1
      if (cls < 0) {
        st = 0
      } else {
        var nx = gotoTab(st * alphaSize + cls)
        while (nx == -1 && st != 0) {
          st = fail(st)
          nx = gotoTab(st * alphaSize + cls)
        }
        st = if (nx == -1) 0 else nx
        if (out(st)) return true
      }
      i += 1
    }
    false
  }

  /** Test/driver convenience. */
  def containsAny(s: String): Boolean = containsAny(UTF8String.fromString(s))
}

object AhoCorasick {

  /** Build the automaton; every pattern must be non-empty ASCII. */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "contains_any: empty pattern list")
    patterns.foreach { p =>
      require(p.nonEmpty, "contains_any: empty pattern")
      require(p.forall(_ < 128),
        s"contains_any: non-ASCII pattern not supported: $p")
    }
    // alphabet = the chars the patterns actually use
    val charClass = Array.fill[Byte](128)(-1)
    var alphaSize = 0
    patterns.foreach(_.foreach { c =>
      if (charClass(c) < 0) { charClass(c) = alphaSize.toByte; alphaSize += 1 }
    })
    // <= 128: class indices 0..127 all fit the Byte table beside the
    // -1 sentinel, so ANY all-ASCII pattern list builds — this gate
    // can never fire for input that passed the callers' per-char
    // `< 128` check (they are now the same condition; a 127 cap left
    // a gap where a list spanning all 128 ASCII values passed the
    // caller gate and then threw here instead of falling back)
    require(alphaSize <= 128, "contains_any: alphabet exceeds 128 classes")

    // trie (growable), then BFS fail links with output propagation
    val cap = patterns.map(_.length).sum + 1
    val gotoTab = Array.fill(cap * alphaSize)(-1)
    val out = new Array[Boolean](cap)
    var nodes = 1
    patterns.foreach { p =>
      var st = 0
      p.foreach { c =>
        val cls = charClass(c)
        val idx = st * alphaSize + cls
        if (gotoTab(idx) == -1) { gotoTab(idx) = nodes; nodes += 1 }
        st = gotoTab(idx)
      }
      out(st) = true
    }
    val fail = new Array[Int](nodes)
    val queue = new java.util.ArrayDeque[Int]()
    var cls = 0
    while (cls < alphaSize) {
      val nx = gotoTab(cls)
      if (nx != -1) { fail(nx) = 0; queue.add(nx) }
      cls += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      var c = 0
      while (c < alphaSize) {
        val v = gotoTab(u * alphaSize + c)
        if (v != -1) {
          // deepest proper suffix with a c-transition
          var f = fail(u)
          while (f != 0 && gotoTab(f * alphaSize + c) == -1) f = fail(f)
          val fv = gotoTab(f * alphaSize + c)
          fail(v) = if (fv != -1 && fv != v) fv else 0
          out(v) = out(v) || out(fail(v))
          queue.add(v)
        }
        c += 1
      }
    }
    new AhoCorasick(charClass, alphaSize,
      java.util.Arrays.copyOf(gotoTab, nodes * alphaSize), fail,
      java.util.Arrays.copyOf(out, nodes))
  }
}
