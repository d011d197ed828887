package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Table-level validation rules — the checks the reference delegates to its host
 * executor (SURVEY.md §2.5: it has no relational operators of its own) and the
 * north_star requires at 10^12-sequence scale. Every check is a standard Spark
 * aggregation/join shaped for that scale:
 *
 *  - column stats: one pass, partial (map-side) + final hash aggregation;
 *  - uniqueness: salted two-phase aggregation — phase 1 groups on
 *    (key, salt) so a pathologically hot key spreads over the cluster before
 *    the per-key combine; phase 2 re-aggregates per key;
 *  - referential: broadcast hash anti-join against a small allowed-values
 *    dimension (the scale form of the `enum` keyword, c:681-731);
 *  - histogram/drift: width-bucketed groupBy (window-free); the two bucket
 *    vectors are O(buckets) — KS/PSI computed from them exactly.
 */
object TableChecks {

  /** min/max/null-rate/approx-distinct (HLL++) for each column — single job. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast(StringType).as(s"${c}_min"),
          max(col(c)).cast(StringType).as(s"${c}_max"),
          avg(col(c).isNull.cast(DoubleType)).as(s"${c}_null_rate"),
          approx_count_distinct(col(c)).as(s"${c}_approx_distinct"))
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Duplicate keys via salted two-phase aggregation. Returns (key, cnt) for
    * cnt > 1. `saltBuckets` spreads a hot key across reducers in phase 1. */
  def duplicates(df: DataFrame, key: String, saltBuckets: Int = 64): DataFrame = {
    val salted = df.select(col(key))
      .withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt")).agg(count(lit(1)).as("c"))
      .groupBy(col(key)).agg(sum("c").as("cnt"))
      .where(col("cnt") > 1)
  }

  /** Rows whose `column` is not in the allowed-values dimension (broadcast
    * hash anti-join — never a shuffle of the big side). */
  def referentialViolations(df: DataFrame, column: String, dim: DataFrame,
                            dimCol: String): DataFrame =
    df.join(broadcast(dim), df(column) === dim(dimCol), "left_anti")

  /** Equal-width histogram over [lo, hi) with `buckets` buckets; out-of-range
    * values clamp to the edge buckets. Window-free: one groupBy. */
  def histogram(df: DataFrame, column: String, lo: Double, hi: Double,
                buckets: Int): DataFrame = {
    val w = (hi - lo) / buckets
    val b = least(greatest(floor((col(column) - lo) / w), lit(0)), lit(buckets - 1))
      .cast(IntegerType)
    df.groupBy(b.as("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Token-frequency histogram over the whole corpus: explode + two-phase
    * count (map-side combine makes the shuffle proportional to DISTINCT
    * tokens per partition, not total tokens). The standard vocabulary
    * coverage check for a tokenized training corpus. */
  def tokenFrequencies(df: DataFrame, tokensCol: String): DataFrame =
    df.select(explode(col(tokensCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Out-of-vocabulary stats: rows containing any token outside [0, vocabSize)
    * plus the total bad-token count — single map-side pass, no explode. The
    * bad-token count is a compiled loop (OovCountX): the previous
    * `size(filter(...))` lambda was CodegenFallback and disabled whole-stage
    * codegen for the entire aggregation stage (round-6 codegen hygiene). */
  def oovStats(df: DataFrame, tokensCol: String, vocabSize: Int): DataFrame = {
    val t = col(tokensCol)
    val badCount = graft.functions.OovCountX(t, vocabSize)
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(array_min(t) < 0 || array_max(t) >= vocabSize, 1).otherwise(0)).as("rows_with_oov"),
      sum(when(array_min(t) < 0 || array_max(t) >= vocabSize, badCount).otherwise(0)).as("oov_tokens"),
      sum(size(t)).as("total_tokens"))
  }

  final case class Drift(psi: Double, ks: Double)

  /** PSI + two-sample KS from two bucket-count vectors (tiny: O(buckets) rows,
    * collected; SURVEY.md §2.5 drift row). Zero-count buckets get a floor to
    * keep PSI finite (standard practice). */
  def drift(hist1: DataFrame, hist2: DataFrame, buckets: Int): Drift = {
    def vec(h: DataFrame): Array[Long] = {
      val m = h.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (0 until buckets).map(i => m.getOrElse(i, 0L)).toArray
    }
    val a = vec(hist1); val b = vec(hist2)
    val ta = a.sum.toDouble.max(1); val tb = b.sum.toDouble.max(1)
    val eps = 1e-6
    var psi = 0.0; var cumA = 0.0; var cumB = 0.0; var ks = 0.0
    (0 until buckets).foreach { i =>
      val pa = (a(i) / ta).max(eps); val pb = (b(i) / tb).max(eps)
      psi += (pa - pb) * math.log(pa / pb)
      cumA += a(i) / ta; cumB += b(i) / tb
      ks = ks.max(math.abs(cumA - cumB))
    }
    Drift(psi, ks)
  }
}
