package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring matching [Aho & Corasick 1975] —
  * the blocklist-filter kernel: ONE pass over the text finds every
  * occurrence of every pattern, so per-row cost is O(|text| + matches)
  * regardless of how many patterns the blocklist carries. The alternative
  * (`P` `contains`/`rlike` columns summed) rescans the text `P` times —
  * at a 100 TB corpus with the C4/Gopher-style bad-word lists (hundreds
  * of entries) that is a 100×+ CPU difference on the hottest scan of the
  * pipeline. Matching is substring-level (catches cross-token phrases the
  * shingle-based `CorpusStream.decontaminate` blocklist cannot), on UTF-16
  * code units — the ASCII-parity contract shared with [[WordPieceEncode]].
  *
  * The automaton is built once per expression instance (the pattern array
  * must be a foldable literal) and shipped to executors as a plan
  * reference — the broadcast-small-side discipline for rule tables.
  *
  * Three scalar views share the automaton (separate single-pass kernels
  * rather than one struct-returning kernel: CollapseProject would
  * duplicate a shared struct into every consuming column anyway — the
  * q110 gotcha):
  *   - `ac_count_all(text, pats)`: total occurrences, OVERLAPPING
  *     included (every end position fires; "a a a" has two "a a" hits).
  *   - `ac_distinct_hits(text, pats)`: how many DISTINCT patterns occur.
  *   - `ac_first_pos(text, pats)`: 1-based position of the earliest
  *     match START (0 when nothing matches).
  */
final class AcAutomaton(patterns: Array[String]) extends Serializable {

  private val nPat = patterns.length
  // trie with BFS-computed fail links; children as per-node hash maps
  // (pattern alphabets are tiny, nodes are few — build cost is trivial)
  private val children = new java.util.ArrayList[java.util.HashMap[Character, Integer]]
  private val endIds = new java.util.ArrayList[java.util.ArrayList[Integer]]
  children.add(new java.util.HashMap); endIds.add(new java.util.ArrayList)

  { // trie insert
    var p = 0
    while (p < nPat) {
      val pat = patterns(p)
      require(pat.nonEmpty, "ac_*: empty pattern")
      var st = 0
      var i = 0
      while (i < pat.length) {
        val c = Character.valueOf(pat.charAt(i))
        var nxt = children.get(st).get(c)
        if (nxt == null) {
          nxt = Integer.valueOf(children.size)
          children.get(st).put(c, nxt)
          children.add(new java.util.HashMap); endIds.add(new java.util.ArrayList)
        }
        st = nxt.intValue
        i += 1
      }
      endIds.get(st).add(Integer.valueOf(p))
      p += 1
    }
  }

  private val n = children.size
  private val fail = new Array[Int](n)
  private val dict = new Array[Int](n) // nearest fail-ancestor that ends a pattern, else -1
  private val closCount = new Array[Int](n) // #patterns ending here incl. fail closure
  private val endArr: Array[Array[Int]] =
    (0 until n).map(i => endIds.get(i).toArray(Array.empty[Integer]).map(_.intValue)).toArray
  private val patLen: Array[Int] = patterns.map(_.length)

  // dense goto-closure DFA over ASCII (the hot path: one array load per
  // char, no boxing, no fail-walk); chars ≥128 take the map+fail fallback
  private val delta: Array[Array[Int]] = Array.ofDim[Int](n, 128)

  { // BFS fail links + dict links + closure counts + ASCII DFA rows
    val queue = new java.util.ArrayDeque[Integer]
    fail(0) = 0; dict(0) = -1; closCount(0) = endArr(0).length
    var c0 = 0
    while (c0 < 128) {
      val ch = children.get(0).get(Character.valueOf(c0.toChar))
      delta(0)(c0) = if (ch == null) 0 else ch.intValue
      c0 += 1
    }
    val it0 = children.get(0).values.iterator
    while (it0.hasNext) {
      val v = it0.next.intValue
      fail(v) = 0
      queue.add(Integer.valueOf(v))
    }
    while (!queue.isEmpty) {
      val u = queue.poll.intValue
      dict(u) = if (endArr(fail(u)).nonEmpty) fail(u) else dict(fail(u))
      closCount(u) = endArr(u).length + closCount(fail(u))
      var c = 0
      while (c < 128) { // fail(u) is shallower → its DFA row is complete
        val ch = children.get(u).get(Character.valueOf(c.toChar))
        delta(u)(c) = if (ch == null) delta(fail(u))(c) else ch.intValue
        c += 1
      }
      val it = children.get(u).entrySet.iterator
      while (it.hasNext) {
        val e = it.next
        val ck = e.getKey
        val v = e.getValue.intValue
        var f = fail(u)
        while (f != 0 && !children.get(f).containsKey(ck)) f = fail(f)
        val fc = children.get(f).get(ck)
        fail(v) = if (fc != null && fc.intValue != v) fc.intValue else 0
        queue.add(Integer.valueOf(v))
      }
    }
  }

  @inline private def step(state: Int, c: Char): Int = {
    if (c < 128) return delta(state)(c)
    var st = state
    var nxt = children.get(st).get(Character.valueOf(c))
    while (nxt == null && st != 0) {
      st = fail(st)
      nxt = children.get(st).get(Character.valueOf(c))
    }
    if (nxt == null) 0 else nxt.intValue
  }

  /** Total occurrences of all patterns, overlapping included. */
  def countAll(text: UTF8String): Int = {
    val s = text.toString
    var st = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      st = step(st, s.charAt(i))
      total += closCount(st)
      i += 1
    }
    total
  }

  /** Number of DISTINCT patterns that occur at least once. */
  def distinctHits(text: UTF8String): Int = {
    if (nPat == 0) return 0
    val s = text.toString
    val seen = new Array[Boolean](nPat)
    var cnt = 0
    var st = 0
    var i = 0
    while (i < s.length && cnt < nPat) {
      st = step(st, s.charAt(i))
      var u = if (endArr(st).nonEmpty) st else dict(st)
      while (u != -1) {
        val ids = endArr(u)
        var k = 0
        while (k < ids.length) {
          if (!seen(ids(k))) { seen(ids(k)) = true; cnt += 1 }
          k += 1
        }
        u = dict(u)
      }
      i += 1
    }
    cnt
  }

  /** 1-based position of the earliest match START; 0 when no match. A
    * longer pattern ending later can still start earlier, so the whole
    * text is scanned. */
  def firstPos(text: UTF8String): Int = {
    val s = text.toString
    var best = Int.MaxValue
    var st = 0
    var i = 0
    while (i < s.length) {
      st = step(st, s.charAt(i))
      var u = if (endArr(st).nonEmpty) st else dict(st)
      while (u != -1) {
        val ids = endArr(u)
        var k = 0
        while (k < ids.length) {
          val start = i - patLen(ids(k)) + 2 // 1-based
          if (start < best) best = start
          k += 1
        }
        u = dict(u)
      }
      i += 1
    }
    if (best == Int.MaxValue) 0 else best
  }
}

object AcAutomaton {
  def build(arr: ArrayData): AcAutomaton = {
    val pats = new java.util.ArrayList[String]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) pats.add(arr.getUTF8String(i).toString)
      i += 1
    }
    new AcAutomaton(pats.toArray(Array.empty[String]))
  }
}

/** Shared shape of the three ac_* expressions: (text string,
  * patterns array<string> LITERAL) → int, never null for non-null input.
  */
abstract class AcExpression extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        // validate the literal NOW: an empty pattern failing only at the
        // lazy automaton build would surface as a bare runtime
        // IllegalArgumentException mid-execution instead of an analysis
        // error naming the function
        val arr = right.eval(null)
        if (arr == null)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: pattern literal must not be null")
        else {
          val a = arr.asInstanceOf[ArrayData]
          val bad = (0 until a.numElements()).find(i =>
            !a.isNullAt(i) && a.getUTF8String(i).numBytes() == 0)
          bad match {
            case Some(i) => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: empty pattern at index $i")
            case None => TypeCheckResult.TypeCheckSuccess
          }
        }
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires the pattern list to be a foldable literal " +
            "(the automaton is built once per plan)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${left.dataType.simpleString(40)}, " +
          s"${right.dataType.simpleString(40)})")
    }

  @transient protected lazy val automaton: AcAutomaton = {
    val arr = right.eval(null)
    require(arr != null, s"$prettyName: pattern literal must not be null")
    AcAutomaton.build(arr.asInstanceOf[ArrayData])
  }

  protected def kernel: String // AcAutomaton method name

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.$kernel($t);")
  }
}

/** ac_count_all(text, patterns): total occurrences, overlapping included. */
case class AcCountAll(left: Expression, right: Expression) extends AcExpression {
  override def prettyName: String = "ac_count_all"
  override protected def kernel: String = "countAll"
  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.countAll(t.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ac_distinct_hits(text, patterns): #distinct patterns present. */
case class AcDistinctHits(left: Expression, right: Expression) extends AcExpression {
  override def prettyName: String = "ac_distinct_hits"
  override protected def kernel: String = "distinctHits"
  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.distinctHits(t.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ac_first_pos(text, patterns): 1-based earliest match start, 0 if none. */
case class AcFirstPos(left: Expression, right: Expression) extends AcExpression {
  override def prettyName: String = "ac_first_pos"
  override protected def kernel: String = "firstPos"
  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.firstPos(t.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
