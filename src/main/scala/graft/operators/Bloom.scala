package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter semi-join prefilter — the shuffle-reduction pattern for
  * selective joins at 100 TB: reduce the build side's keys to a bounded
  * bit array on the driver (treeAggregate, one pass), ship it to every
  * probe task ONCE inside the plan, and drop non-matching probe rows at
  * the SCAN — before they are shuffled, spilled, or even fully decoded.
  * With a selective build side this turns a full-probe shuffle join into
  * a shuffle over ~matching rows only (plus the filter's bounded false
  * positives), which is exactly what Spark's own runtime row-group
  * filtering does for sort-merge joins — exposed here as a first-class,
  * composable operator usable on ANY boolean-accepting position (scan
  * filters, streaming foreachBatch, pre-aggregation guards).
  *
  * Guarantees: NO false negatives ever (a contained key always probes
  * true); false-positive rate ~0.8% at 10 bits/key with 7 hashes
  * (Kirsch–Mitzenmacher double hashing over Spark's own XXH64). The
  * final exact join stays in the plan — the bloom pass only shrinks its
  * input, so query results are exact regardless of fp rate.
  */
final class BloomBits(val words: Array[Long], val numHashes: Int)
    extends Serializable {

  def numBits: Long = words.length.toLong * 64L

  @inline private def bitOf(h1: Long, h2: Long, i: Int): Long =
    ((h1 + i.toLong * h2) & Long.MaxValue) % numBits

  def put(key: Long): Unit = {
    val h1 = XXH64.hashLong(key, BloomBits.Seed1)
    val h2 = XXH64.hashLong(key, BloomBits.Seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val b = bitOf(h1, h2, i)
      words((b >>> 6).toInt) |= (1L << (b & 63L))
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val h1 = XXH64.hashLong(key, BloomBits.Seed1)
    val h2 = XXH64.hashLong(key, BloomBits.Seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val b = bitOf(h1, h2, i)
      if ((words((b >>> 6).toInt) & (1L << (b & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise OR merge (partition partials → one filter). */
  def or(other: BloomBits): BloomBits = {
    require(other.words.length == words.length && other.numHashes == numHashes,
      "cannot merge bloom filters of different geometry")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }
}

object BloomBits {
  // fixed seeds: filters are deterministic across builds and engines
  private[operators] val Seed1 = 0x9E3779B97F4A7C15L
  private[operators] val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** ~0.693·bitsPerKey hash functions minimizes fp for a given density. */
  def geometry(expectedItems: Long, bitsPerKey: Int): (Int, Int) = {
    require(expectedItems > 0 && bitsPerKey > 0, "bloom geometry must be positive")
    val nWords = math.max(1L, (expectedItems * bitsPerKey + 63L) / 64L)
    require(nWords <= (Bloom.MaxFilterBytes / 8),
      s"bloom filter of ${nWords * 8} bytes exceeds the ${Bloom.MaxFilterBytes}-byte " +
        "broadcast cap; raise the cap knowingly or pre-filter the build side")
    (nWords.toInt, math.max(1, math.round(0.693 * bitsPerKey).toInt))
  }
}

/** Driver-side registry: same literal-id + prompt-release contract as
  * LmModels / LangModels / IvfModels.
  */
object BloomModels extends graft.ModelRegistry[BloomBits]("BloomBits") {

  val factory: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_bloom_contains(key, modelId)")
    val id = exprs(1) match {
      case Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_bloom_contains: modelId must be a long literal, got $other")
    }
    BloomContainsExpression(exprs.head, get(id))
  }
}

/** `key might be in the filter` as a codegen projection — lives inside
  * whole-stage codegen at the scan, so rejected probe rows never leave
  * the input stage.
  */
case class BloomContainsExpression(child: Expression, bloom: BloomBits)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains needs a BIGINT key, got ${child.dataType.catalogString}")

  override def nullSafeEval(key: Any): Any =
    bloom.mightContain(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bloom, classOf[BloomBits].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.mightContain(${childGen.value});
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpression =
    copy(child = newChild)
}

object Bloom {

  /** Hard cap on filter size (64 MiB): a filter is a per-task broadcast
    * object; beyond this the build side is not "small" and the caller
    * should shuffle-join instead.
    */
  val MaxFilterBytes: Long = 64L * 1024 * 1024

  /** One pass over the build side: per-partition partial filters OR-merged
    * up a tree (same two-tier discipline as the CLV fit's treeAggregate
    * path — driver never sees the keys, only geometry-sized bit arrays).
    * `expectedItems` sizes the filter; the caller usually knows it from
    * stats, or pays one cheap count() on the (small) build side.
    */
  def build(keys: DataFrame, key: Column, expectedItems: Long,
      bitsPerKey: Int = 10): BloomBits = {
    val (nWords, nHashes) = BloomBits.geometry(expectedItems, bitsPerKey)
    val rdd = keys.select(key.cast(LongType).as("k")).na.drop().rdd
      .map(_.getLong(0))
    // null zero + lazy per-partition allocation: the zero value is
    // serialized into every task closure, so an eager geometry-sized
    // array would ship nWords*8 bytes per task for nothing
    val merged = rdd.treeAggregate(null: BloomBits)(
      seqOp = (acc, k) => {
        val a = if (acc == null) new BloomBits(new Array[Long](nWords), nHashes) else acc
        a.put(k); a
      },
      combOp = (x, y) =>
        if (x == null) y else if (y == null) x else x.or(y))
    if (merged == null) new BloomBits(new Array[Long](nWords), nHashes) else merged
  }

  /** `df` restricted to rows whose `key` might be in `bloom` — the raw
    * prefilter pass, no exactness restoration. The registry id is
    * released before returning (Dataset construction analyzes eagerly,
    * so the bits are already embedded in the returned plan).
    */
  def filterMightContain(df: DataFrame, key: Column, bloom: BloomBits): DataFrame = {
    val id = BloomModels.put(bloom)
    graft.functions.Registry.once(df.sparkSession)(
      "graft_bloom_contains", BloomModels.factory, "built-in")
    val out = df.where(
      call_function("graft_bloom_contains", key.cast(LongType), lit(id)))
    BloomModels.remove(id)
    out
  }

  /** Exact semi join with the probe side bloom-prefiltered at the scan:
    * the bloom pass drops ~all non-matching rows before the shuffle; the
    * exact join over the survivors restores exactness (false positives
    * die there). At 100 TB: probe-side shuffle shrinks from |probe| to
    * |matches| + fp·|probe|, build side is read twice (once for the
    * filter, once for the join) — the standard trade when
    * |build| ≪ |probe|.
    */
  def prefilteredSemiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column, expectedItems: Long,
      bitsPerKey: Int = 10): DataFrame = {
    val bloom = Bloom.build(build, buildKey, expectedItems, bitsPerKey)
    filterMightContain(probe, probeKey, bloom)
      .join(build.select(buildKey.cast(LongType).as("__bloom_k")).distinct(),
        probeKey.cast(LongType) === col("__bloom_k"), "left_semi")
  }
}
