package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over embedding columns (Array[Float]).
 *
 * Baseline: brute-force cosine top-k — one map-side pass + TakeOrdered (no
 * shuffle of the corpus; the query vector travels as a plan literal, the
 * distributed analogue of a broadcast).
 *
 * Scale path: random-hyperplane LSH sign buckets; candidates are restricted to
 * the query's bucket (or multi-probe neighbors), turning an all-pairs scan into
 * a bucket-pruned one. Hyperplanes are derived deterministically from xxhash64
 * so every executor materializes identical planes with no driver state.
 */
object Similarity {

  /** Dot product of two float-array columns via zip_with + aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component p[d] in [-0.5, 0.5). */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit("plane"), lit(p), d), lit(1000L)).cast(DoubleType) - 500.0) / 1000.0

  /** LSH sign bucket: one bit per hyperplane = sign of <vec, plane>. */
  def signBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), d => planeComponent(p, d)),
          (x, w) => x * w),
        lit(0.0d), (s, x) => s + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Brute-force cosine top-k against a literal query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    df.select(col(idCol),
        cosine(col(vecCol).cast(ArrayType(DoubleType)), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: scan only vectors in the query's LSH bucket, then exact
    * cosine + top-k within the pruned set. `planes` trades recall for speed. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, planes: Int = 6): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val dfB = df.withColumn("__bucket", signBucket(col(vecCol).cast(ArrayType(DoubleType)), planes))
    // query bucket computed once via a literal-only expression
    val qBucketRow = df.sparkSession.range(1)
      .select(signBucket(q, planes).as("b")).head()
    val qBucket = qBucketRow.getLong(0)
    dfB.where(col("__bucket") === qBucket)
      .select(col(idCol), cosine(col(vecCol).cast(ArrayType(DoubleType)), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }
}
