package graft.similarity

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The IVF centroid matrix as a broadcast model object — the large-`nlist`
  * alternative to baking every centroid into the plan as literals
  * (Ann.ivfTopK's `cellScores`): a literal argmax over nlist=4096 centroids
  * generates an expression tree with 4096 × dim literals and blows past
  * codegen limits, while this object ships ONCE in the serialized plan and
  * scores cells in a tight loop. Same nearest-in-L2 math (dot(v,c) − ‖c‖²/2,
  * no per-row norm), same deterministic tie-break (equal score → larger
  * cell id), so the two forms are interchangeable — AnnSpec asserts
  * equality on shared centroids.
  */
final class IvfModel(val centers: Array[Array[Double]]) extends Serializable {
  require(centers.nonEmpty, "IvfModel needs at least one centroid")
  val dim: Int = centers(0).length
  private val halfSq: Array[Double] = centers.map(c => c.map(x => x * x).sum / 2.0)

  /** Top-`nprobe` cell ids of `vec` by descending (score, cid). */
  def cells(vec: ArrayData, isFloat: Boolean, nprobe: Int): ArrayData = {
    require(vec.numElements() == dim,
      s"ivf_cells: vector has ${vec.numElements()} dims, centroids have $dim")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val n = math.min(nprobe, centers.length)
    // insertion into a tiny descending-(score, cid) top list: O(nlist · n),
    // n = nprobe is small by definition
    val topScore = Array.fill(n)(Double.NegativeInfinity)
    val topCid = Array.fill(n)(-1)
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var s = 0.0
      var j = 0
      while (j < dim) { s += v(j) * ctr(j); j += 1 }
      s -= halfSq(c)
      var k = n - 1
      if (s > topScore(k) || (s == topScore(k) && c > topCid(k))) {
        topScore(k) = s; topCid(k) = c
        while (k > 0 && (topScore(k) > topScore(k - 1) ||
            (topScore(k) == topScore(k - 1) && topCid(k) > topCid(k - 1)))) {
          val ts = topScore(k); topScore(k) = topScore(k - 1); topScore(k - 1) = ts
          val tc = topCid(k); topCid(k) = topCid(k - 1); topCid(k - 1) = tc
          k -= 1
        }
      }
      c += 1
    }
    new GenericArrayData(topCid)
  }
}

/** Driver-side registry, keyed by id — the `graft_ivf_cells(vec, modelId,
  * nprobe)` SQL function resolves its model here at analysis time (same
  * contract as [[graft.text.LangModels]]): bounded LRU, each call passes
  * its own id literal so concurrent queries cannot race.
  */
object IvfModels extends graft.ModelRegistry[IvfModel]("IvfModel") {

  /** Expression factory for `graft_ivf_cells(vec, modelId, nprobe)` —
    * shared by the Ann temp-function registration and
    * [[graft.GraftExtensions]].
    */
  val factory: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 3, "graft_ivf_cells(vec, modelId, nprobe)")
    (exprs(1), exprs(2)) match {
      case (org.apache.spark.sql.catalyst.expressions.Literal(id: Long, _),
            org.apache.spark.sql.catalyst.expressions.Literal(np: Int, _)) =>
        IvfCellsExpression(exprs.head, get(id), np)
      case other => throw new IllegalArgumentException(
        s"graft_ivf_cells: modelId/nprobe must be literals, got $other")
    }
  }
}

/** `array<int>` of the top-`nprobe` IVF cells of an embedding — pure
  * projection, whole-stage codegen, model via plan reference object.
  */
case class IvfCellsExpression(child: org.apache.spark.sql.catalyst.expressions.Expression,
    model: IvfModel, nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(vec: Any): Any =
    model.cells(vec.asInstanceOf[ArrayData], isFloat, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfModel", model, classOf[IvfModel].getName)
    val childGen = child.genCode(ctx)
    val arrayDataCls = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        $arrayDataCls ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.cells(${childGen.value}, $isFloat, $nprobe);
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): IvfCellsExpression =
    copy(child = newChild)
}
