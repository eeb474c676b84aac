package graft.text

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen kernel — the fuzzy-match
  * scorer of a record-linkage stage (blocked candidate pairs → per-pair
  * similarity → threshold). Published definition (Winkler 1990): Jaro
  * similarity from the match-window/transposition counts, plus the common-
  * prefix boost (scale 0.1, prefix capped at 4) applied only when the Jaro
  * score exceeds 0.7 — the same variant DuckDB's
  * `jaro_winkler_similarity` implements, which is what makes the oracle an
  * exact cross-engine hash gate rather than an envelope.
  *
  * O(|a|·window) two-pass scan with two boolean scratch arrays — no
  * allocation beyond the scratch, runs inside whole-stage codegen as a
  * static call (the same shape as [[graft.dedup.DedupKernels]]).
  *
  * Reference anchor: the reference pipeline has no fuzzy matcher; this is
  * part of the LLM-curation surface (entity resolution across corpus
  * snapshots) built Spark-first.
  */
object StringSimilarity {

  /** Jaro similarity over UTF-16 code units (test corpus is ASCII; DuckDB
    * compares code points — identical on the BMP-ASCII domain we gate). */
  def jaro(sStr: String, tStr: String): Double = {
    val ls = sStr.length
    val lt = tStr.length
    if (ls == 0 && lt == 0) return 1.0
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && sStr.charAt(i) == tStr.charAt(j)) {
          sMatch(i) = true
          tMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (sStr.charAt(i) != tStr.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // rapidfuzz (and therefore DuckDB) floors the half-transposition count
    // to an integer: an odd out-of-order count contributes (count/2)
    // transpositions, not count/2.0 — (m − ⌊trans/2⌋)/m, verified against
    // DuckDB on the one odd-count pair in the fixture ('hot gear' vs
    // 'large plate': 3 out-of-order matches → 1 transposition, 0.5379)
    (m.toDouble / ls + m.toDouble / lt + (m - trans / 2).toDouble / m) / 3.0
  }

  /** Winkler boost: only above jaro 0.7, prefix capped at 4, scale 0.1. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sStr = a.toString
    val tStr = b.toString
    val j = jaro(sStr, tStr)
    if (j > 0.7) {
      val max = math.min(4, math.min(sStr.length, tStr.length))
      var l = 0
      while (l < max && sStr.charAt(l) == tStr.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.Registry.once(spark)(
      "jaro_winkler",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "jaro_winkler(a, b)")
        JaroWinklerExpression(exprs(0), exprs(1))
      },
      "built-in")
}

case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.StringSimilarity.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
