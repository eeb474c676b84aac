package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Exact top-k rows per group via two-phase bounded heaps — the
  * scale-correct alternative to `row_number() OVER (PARTITION BY g ORDER
  * BY s) <= k` for small k. The window form shuffles and SORTS every row
  * of every group; this operator keeps a k-row heap per group per
  * partition (phase 1, map-side), so the shuffle carries at most
  * `partitions × groups × k` candidate rows, and the post-shuffle merge
  * (phase 2) heaps again and ranks. No full sort ever happens — the same
  * reason Ann.bruteForceTopK merges "scraps, not a cluster-wide sort"
  * (Ann.scala), generalized to arbitrary group columns + payload.
  *
  * Semantics: rank by `scoreCol` (descending when `descending`), ties
  * broken by ascending `tieCol`; rows with a NULL score are dropped
  * (they cannot rank). Output = all input columns + `rank` (1-based).
  */
object TopK {

  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      tieCol: String, k: Int, descending: Boolean = true): DataFrame = {
    require(k > 0, "topKPerGroup: k must be positive")
    require(groupCols.nonEmpty,
      "topKPerGroup: no group columns — global top-k is orderBy(...).limit(k)" +
        " (Spark's native TakeOrderedAndProject already heap-merges it)")
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val sIdx = schema.fieldIndex(scoreCol)
    val tIdx = schema.fieldIndex(tieCol)
    // type check at CALL time, not first task comparison — a 1-row group
    // never exercises the comparator, so a lazy check could let a
    // non-numeric column slip through with rank 1
    Seq(scoreCol -> sIdx, tieCol -> tIdx).foreach { case (name, i) =>
      require(schema(i).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"topKPerGroup: non-numeric column '$name' (${schema(i).dataType.simpleString})")
    }
    val sign = if (descending) 1.0 else -1.0

    def score(r: Row): Double = sign * r.get(sIdx).asInstanceOf[Number].doubleValue()
    def tie(r: Row): Long = r.get(tIdx).asInstanceOf[Number].longValue()
    // "betterness" key (-score, tie): smaller = better. PriorityQueue
    // dequeues the MAX of its ordering, so heads are the WORST kept row —
    // the one a better candidate evicts (same construction as
    // Ann.bruteForceTopK's per-probe heaps)
    val worstFirst: Ordering[Row] =
      Ordering.by[Row, (Double, Long)](r => (-score(r), tie(r)))

    def heapPartition(iter: Iterator[Row]): Iterator[(Seq[Any], scala.collection.mutable.PriorityQueue[Row])] = {
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[Row]]
      iter.foreach { r =>
        if (!r.isNullAt(sIdx)) {
          val key = gIdx.map(r.get)
          val h = heaps.getOrElseUpdate(key,
            scala.collection.mutable.PriorityQueue.empty[Row](worstFirst))
          if (h.size < k) h.enqueue(r)
          else if (worstFirst.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
        }
      }
      heaps.iterator
    }

    // phase 1: per-partition per-group heaps — at most groups×k rows out
    val partial = df.mapPartitions(
      it => heapPartition(it).flatMap(_._2.iterator))(Encoders.row(schema))
    // phase 2: co-locate each group's scraps, heap-merge, rank
    partial.repartition(groupCols.map(col): _*)
      .mapPartitions { it =>
        heapPartition(it).flatMap { case (_, h) =>
          h.toSeq.sortBy(r => (-score(r), tie(r))).zipWithIndex.map {
            case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1))
          }
        }
      }(Encoders.row(schema.add("rank", IntegerType)))
  }
}
