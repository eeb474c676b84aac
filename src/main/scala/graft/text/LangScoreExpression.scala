package graft.text

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained trigram language model: the per-(language, trigram) log-
  * probabilities collected off the (bounded) profile aggregate, packed for
  * single-pass scoring. `langs` is sorted ascending so index order IS the
  * tie-break order (larger index wins on equal scores, matching the
  * join-based form's max_by(struct(score, p_lang)) and the oracle's
  * ORDER BY score DESC, p_lang DESC).
  *
  * Serializable: the expression ships the model to executors inside the
  * plan (a few hundred KB for real trigram profiles) — the broadcast-model
  * alternative to shuffling an exploded corpus through join + groupBy.
  */
final class LangModel(val langs: Array[String],
    table: java.util.HashMap[String, Array[Double]],
    val n: Int = 3) extends Serializable {

  /** Predict the language of `text`, or null when no trigram overlaps the
    * profile (the join-based form drops such docs — parity preserved).
    * NaN slots mark (lang, trigram) pairs absent from the profile; they
    * contribute nothing, and a language scores only if ≥1 term touched it.
    */
  def predict(text: UTF8String): UTF8String = {
    if (text == null) return null
    // UTF8String.toLowerCase = the exact primitive behind Spark's lower()
    // (Java's String.toLowerCase is locale-sensitive — Turkish-I trap)
    val norm = text.toLowerCase.toString.replaceAll("\\s+", " ")
    // code POINTS, not UTF-16 units: Spark's substr/length (and the
    // DuckDB oracle) window trigrams by code point, so supplementary-
    // plane characters must count as one position here too
    val cps = norm.codePoints().toArray
    val len = cps.length
    // gram width follows the TRAINED n (hardcoding 3 here silently
    // returned null for every doc when the profile was trained with n≠3)
    val positions = math.max(len - (n - 1), 1)
    val scores = new Array[Double](langs.length)
    val touched = new Array[Boolean](langs.length)
    var i = 0
    while (i < positions) {
      val gram = new String(cps, i, math.min(n, len - i))
      val row = table.get(gram)
      if (row != null) {
        var l = 0
        while (l < langs.length) {
          val v = row(l)
          if (!java.lang.Double.isNaN(v)) { scores(l) += v; touched(l) = true }
          l += 1
        }
      }
      i += 1
    }
    var best = -1
    var l = 0
    while (l < langs.length) {
      // >= : ties resolve to the LARGER lang (langs sorted ascending)
      if (touched(l) && (best < 0 || scores(l) >= scores(best))) best = l
      l += 1
    }
    if (best < 0) null else UTF8String.fromString(langs(best))
  }
}

/** Driver-side registry of trained models, keyed by id. The SQL function
  * `graft_lang_score(text, modelId)` resolves its model from here at
  * analysis time — the function registration itself is stateless and
  * idempotent, so concurrent langId calls with different models cannot
  * race on registry contents (each call passes its own id literal).
  */
object LangModels extends graft.ModelRegistry[LangModel]("LangModel") {

  /** Expression factory for `graft_lang_score(text, modelId)` — shared by
    * the TextOps temp-function registration and [[graft.GraftExtensions]].
    */
  val factory: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 2, "graft_lang_score(text, modelId)")
    val id = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_lang_score: modelId must be a long literal, got $other")
    }
    LangScoreExpression(exprs.head, get(id))
  }
}

/** Scores a text column against a [[LangModel]] — pure projection, whole-
  * stage codegen, zero shuffle: the scale-correct replacement for
  * exploding the corpus into trigrams and shuffling them through a
  * broadcast join + two aggregations.
  */
case class LangScoreExpression(child: org.apache.spark.sql.catalyst.expressions.Expression,
    model: LangModel) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any): Any =
    model.predict(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langModel", model, classOf[LangModel].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = $ref.predict(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): LangScoreExpression =
    copy(child = newChild)
}
