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
   * (key, ts) for deterministic output (pre-aggregate if not).
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
}
