package graft.text

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained character-n-gram language model for PERPLEXITY scoring (the
  * CCNet-style quality filter: score every document's likelihood under a
  * reference LM and gate/bucket on it — a different face of the same
  * trigram machinery as [[LangModel]], which answers "which language",
  * not "how likely").
  *
  * Add-one smoothing over the training profile: p(g) = (c_g + 1)/(N + V)
  * with N = total training grams, V = distinct training grams, so a
  * document's log-likelihood decomposes as Σ ln(c_g + 1) − L·ln(N + V).
  * The kernel returns ONLY the first (model-dependent) sum; the length
  * normalization stays declarative column arithmetic, shared verbatim
  * with the DuckDB oracle.
  *
  * Serializable: ships once inside the plan (vocab-bounded — at most the
  * distinct-trigram count of the training corpus).
  */
final class LmModel(table: java.util.HashMap[String, java.lang.Long],
    val totalGrams: Long, val n: Int = 3) extends Serializable {

  /** V = distinct training grams (the smoothing denominator's vocab term). */
  val vocab: Long = table.size.toLong

  /** Σ ln(c_g + 1) over the document's grams, same normalization and
    * code-point windowing as [[LangModel.predict]] (and Spark's
    * lower/regexp_replace/substr, and the oracle).
    */
  def logCountSum(text: UTF8String): Double = {
    if (text == null) return 0.0
    val norm = text.toLowerCase.toString.replaceAll("\\s+", " ")
    val cps = norm.codePoints().toArray
    val len = cps.length
    val positions = math.max(len - (n - 1), 1)
    var s = 0.0
    var i = 0
    while (i < positions) {
      val gram = new String(cps, i, math.min(n, len - i))
      // boxed lookup so a missing gram is a REAL null, not a silent
      // unbox-to-0 (a scala.Long-valued map makes the null test dead code
      // and the correctness coincidental to ln(0+1)=0)
      val c: java.lang.Long = table.get(gram)
      // unseen grams: ln(0 + 1) = 0 — they contribute only through the
      // declarative −ln(N+V) per-gram term outside the kernel
      if (c != null) s += math.log(c.doubleValue() + 1.0)
      i += 1
    }
    s
  }
}

/** Driver-side registry, same bounded-LRU + prompt-release contract as
  * [[LangModels]] and graft.similarity.IvfModels.
  */
object LmModels extends graft.ModelRegistry[LmModel]("LmModel") {

  /** Expression factory for `graft_lm_logcount(text, modelId)` — shared by
    * the TextOps temp-function registration and [[graft.GraftExtensions]].
    * The model id must be a literal so the model resolves at analysis time
    * and concurrent queries cannot race on registry contents.
    */
  val factory: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 2, "graft_lm_logcount(text, modelId)")
    val id = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_lm_logcount: modelId must be a long literal, got $other")
    }
    LmScoreExpression(exprs.head, get(id))
  }
}

/** Σ ln(c_g + 1) of a text column under a broadcast [[LmModel]] — pure
  * projection, whole-stage codegen, zero shuffle: the corpus never
  * explodes into grams on the cluster.
  */
case class LmScoreExpression(child: org.apache.spark.sql.catalyst.expressions.Expression,
    model: LmModel) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any): Any =
    model.logCountSum(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmModel", model, classOf[LmModel].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.logCountSum(${childGen.value});
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): LmScoreExpression =
    copy(child = newChild)
}
