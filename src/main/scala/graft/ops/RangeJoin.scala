package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval) join without the nested-loop: Spark compiles a
  * bare `l JOIN r ON l.ts >= r.start AND l.ts < r.end` to a
  * BroadcastNestedLoopJoin — O(|l|·|r|) comparisons, the classic
  * scale-killer. The bucketed form instead:
  *
  *  1. each point keys by its coarse time bucket `floor(ts / W)`
  *     (map-only);
  *  2. each interval explodes to the buckets it overlaps — with W
  *     chosen near the typical interval length that's 1–2 rows;
  *  3. an ordinary shuffled EQUI-join on the bucket localizes the
  *     candidates, and the exact range predicate filters within.
  *
  * Each (point, interval) pair can only meet in the point's single
  * bucket, so the output needs no dedup pass. Work scales with
  * genuine overlap density, not |l|·|r|.
  */
object RangeJoin {

  /** Points (at `ts`) joined to intervals `[start, end)`. All three
    * bounds are LONGs in the same unit (e.g. epoch micros);
    * `bucketWidth` is in that unit too. Output: every left column +
    * every right column for each matching pair (inner join). */
  def pointInInterval(left: DataFrame, ts: Column, right: DataFrame,
      start: Column, end: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__b", floor(ts / lit(bucketWidth)).cast(LongType))
    val r = right
      .withColumn("__bs", floor(start / lit(bucketWidth)).cast(LongType))
      // end is exclusive: the last overlapped bucket is the one holding
      // end - 1 (an interval ending exactly on a bucket boundary does
      // not reach into the next bucket)
      .withColumn("__be", floor((end - 1) / lit(bucketWidth)).cast(LongType))
      // greatest() guards degenerate (empty) intervals where end <= start:
      // Spark's sequence(a, b) with b < a would generate a DESCENDING
      // range; the exact filter below still removes any such candidates,
      // but the bucket list must stay well-formed
      .withColumn("__b", explode(sequence(col("__bs"), greatest(col("__bs"), col("__be")))))
      .drop("__bs", "__be")
    l.join(r, Seq("__b"))
      .filter(ts >= start && ts < end)
      .drop("__b")
  }
}
