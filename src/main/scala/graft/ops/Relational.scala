package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operators Spark lacks as built-ins, composed the scale-right
 * way from existing primitives (SURVEY §2.5 extension set).
 */
object Relational {

  /**
   * AS-OF JOIN: for every left row, the single right row with the same key
   * and the LARGEST right timestamp <= the left timestamp (the "most recent
   * value as of t" lookup — market-data joins, feature stores, slowly
   * changing dimensions).
   *
   * Spark has no asof join operator; the naive formulation
   * (`l.join(r, l.k === r.k && r.ts <= l.ts)` + window max) materializes
   * every (left, earlier-right) pair — quadratic per key and usually a
   * BroadcastNestedLoopJoin. This implementation is the UNION + ordered
   * carry-forward shape instead:
   *
   *   1. tag right rows side=0, left rows side=1, union — NO join at all;
   *   2. one shuffle by key, sort within partitions by (ts, side);
   *   3. `last(rightVal, ignoreNulls)` over (key | ts, side) rows-unbounded-
   *      preceding carries the latest right value forward onto each left row
   *      (side=1 sorts AFTER side=0 at equal ts, so a same-instant right row
   *      IS visible — inclusive <= semantics);
   *   4. keep side=1 rows.
   *
   * Cost: one shuffle + sort of |L| + |R| rows, linear per key — survives
   * any key cardinality / time-series length. Right rows must be unique per
   * (key, ts) for deterministic output (pre-aggregate if not), and carried
   * value columns must be non-null on the right side: the carry-forward is
   * `last(ignoreNulls)`, so a NULL right value is indistinguishable from
   * "no row" and the previous value carries through it (COALESCE a sentinel
   * before joining if NULL is meaningful).
   *
   * @param right     lookup table; its `valueCols` are carried onto left rows
   * @param keyCols   equi-join keys present in both inputs
   * @param leftTs    left timestamp column name
   * @param rightTs   right timestamp column name
   * @param valueCols right columns to carry (emitted with an "asof_" prefix,
   *                  NULL when no right row is at-or-before the left row)
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__side") && !leftCols.contains("__ts"),
      "left input may not contain reserved columns __side/__ts")
    // ADVICE r05: the union used to silently CAST the left timestamp to the
    // right timestamp's type — a Long-vs-Timestamp (or NTZ-vs-TZ) mismatch
    // coerced values instead of erroring, and the output column's type
    // differed from the input's. Mismatched domains must fail loudly.
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"asofJoin timestamp type mismatch: left $leftTs is " +
        s"${left.schema(leftTs).dataType.simpleString} but right $rightTs is " +
        s"${right.schema(rightTs).dataType.simpleString} — cast explicitly before joining")
    val clash = valueCols.map(c => s"asof_$c").filter(leftCols.contains)
    require(clash.isEmpty,
      s"left input already contains output column(s) ${clash.mkString(", ")} — rename before joining")

    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"asof_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).cast(right.schema(rightTs).dataType).as("__ts"), lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .select((keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        valueCols.map(c => last(col(s"asof_$c"), ignoreNulls = true).over(w).as(s"asof_$c")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == leftTs).map(col)): _*)
      .where(col("__side") === 1)
      .withColumnRenamed("__ts", leftTs)
      .drop("__side")
  }

  /**
   * RANGE (point-in-interval) JOIN: every (point, interval) pair with equal
   * keys and `start <= pt < end`. Spark plans the naive inequality join as a
   * BroadcastNestedLoopJoin — O(|P|·|I|) per key. This is the BUCKETED
   * shape instead:
   *
   *   1. explode each interval to the buckets it covers
   *      (`floor(start/B) .. floor((end-1)/B)` — end exclusive);
   *   2. assign each point its single bucket `floor(pt/B)`;
   *   3. ONE equi-join on (keys, bucket) with the exact range predicate as
   *      the join filter.
   *
   * Each qualifying pair matches in exactly one bucket (the point's), so no
   * dedup pass is needed. Cost: a shuffle of |P| + |I|·(len/B + 1) rows and
   * a hash/sort-merge join — never a nested loop. Pick `bucketWidth` near
   * the TYPICAL interval length: too small multiplies the exploded interval
   * rows, too large packs unrelated rows into one bucket (the filter stays
   * correct either way). Empty/negative intervals (end <= start) match
   * nothing and are dropped before the explode.
   *
   * Point/start/end columns must be integer-valued (e.g. epoch seconds)
   * with |v| < 2^53 (bucket ids go through an exact floor-divide).
   *
   * @return inner join: all point columns + the interval's non-key columns
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                ptCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // ADVICE r05: no startCol/endCol carve-out — a points input carrying a
    // column named like the interval bounds used to pass this guard and then
    // die later with an ambiguous-reference AnalysisException, exactly the
    // confusing failure the precondition exists to prevent
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet.diff(keyCols.toSet))
    require(overlap.isEmpty, s"non-key column collision: $overlap — alias before joining")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "inputs may not contain the reserved column __b")

    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - lit(1)))))
    val pt = points.withColumn("__b", bucketOf(col(ptCol)))
    pt.join(iv, keyCols :+ "__b", "inner")
      .where(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__b")
  }
}
