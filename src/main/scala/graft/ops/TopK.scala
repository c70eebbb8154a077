package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-k with partial pruning — the scale-correct plan for
  * "best k rows per key".
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`) shuffles and sorts EVERY row. But top-k is a semigroup:
  * the global per-key top-k is contained in the union of per-partition
  * per-key top-k's, so each map partition prunes to ≤ k rows per key it
  * holds before anything shuffles. What crosses the wire is
  * O(keys·k·partitions) instead of O(rows) — at 100 TB with hot keys
  * that is the whole game. The final exact selection runs the same
  * window on the pruned remainder.
  *
  * Determinism: pass a TOTAL order (include a unique tiebreak column —
  * the same discipline every declared query follows) and the result is
  * exact and partition-count independent; the partial heap uses exactly
  * the same lexicographic (column, direction) order as the final window.
  */
object TopK {

  /** Top `k` rows per `key` under `sortCols` = (columnName, ascending)
    * lexicographic order; "top" = first in that order. Nulls sort first
    * on ascending, last on descending (Spark's default), and the heap
    * comparator matches. */
  def perKey(df: DataFrame, key: String, sortCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val schema = df.schema
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    val keyIdx = schema.fieldIndex(key)
    val sortIdx = sortCols.map { case (n, asc) => (schema.fieldIndex(n), asc) }

    val rowOrd: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        sortIdx.foreach { case (i, asc) =>
          val (x, y) = (a.get(i), b.get(i))
          val c =
            if (x == null && y == null) 0
            else if (x == null) -1 // nulls first in ascending
            else if (y == null) 1
            else x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
          if (c != 0) return if (asc) c else -c
        }
        0
      }
    }

    // partial prune: bounded per-key heaps inside each input partition.
    // max-heap keyed on "worst kept row" so a better arrival evicts it.
    val pruned = df.mapPartitions { rows =>
      val heaps = scala.collection.mutable.Map
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(keyIdx),
          scala.collection.mutable.PriorityQueue.empty[Row](rowOrd))
        if (h.size < k) h.enqueue(r)
        else if (rowOrd.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    // exact final selection on the pruned remainder — same order
    val ordering = sortCols.map { case (n, asc) =>
      if (asc) col(n).asc else col(n).desc
    }
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
    pruned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .select(schema.fieldNames.map(col): _*)
  }
}
