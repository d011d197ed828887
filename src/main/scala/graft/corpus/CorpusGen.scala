package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/**
 * Deterministic synthetic corpus of pre-tokenized training sequences
 * (BASELINE.json input_hint: doc_id:string, tokens:array<int32>, n_tok:int32,
 * source:string) plus an identity partition column `part` — the sandbox stand-in
 * for the 10^12-sequence Iceberg table.
 *
 * Generation is pure column functions over spark.range(n): no driver loop, no
 * RNG state — row i's content is a function of (seed, i) via xxhash64, so the
 * same (seed, n) regenerates byte-identical data on any cluster size. That is
 * the cross-implementation token-array-equality invariant (FIXTURES.md §1) and
 * also what makes benchmark inputs comparable across local[8]/local[32].
 *
 * Violation injection (all off by default, FIXTURES.md §1):
 *  - dupEvery:     row i (i%dupEvery==0, i>0) reuses row (i-1)'s doc_id → uniqueness
 *  - badSourceEvery: source = "BADSRC" → referential violation
 *  - badTokenEvery:  first token set to vocabSize+9999 → element-range violation
 *  - badNtokEvery:   n_tok off by one → equalsExpr violation
 */
object CorpusGen {
  val Sources: Seq[String] = Seq("web", "books", "code", "wiki")
  val VocabSize = 50257

  final case class Config(
      rows: Long,
      seed: Long = 42L,
      maxTok: Int = 512,          // keep small-scale tests fast; prod hint is 8192
      numPartitions: Int = 8,
      dupEvery: Long = 0,
      badSourceEvery: Long = 0,
      badTokenEvery: Long = 0,
      badNtokEvery: Long = 0,
      skewWebPct: Int = 0)        // >0: that % of rows forced to source="web" (skew fixture)

  def generate(spark: SparkSession, cfg: Config): DataFrame = {
    val i = col("id")
    val h = (salt: Int) => abs(xxhash64(lit(cfg.seed), i, lit(salt)))

    val nTokBase = (h(1) % cfg.maxTok).cast(IntegerType) + 1
    val tokens = transform(sequence(lit(1), nTokBase),
      j => (abs(xxhash64(lit(cfg.seed), i, j)) % VocabSize).cast(IntegerType))

    val srcIdx = (h(2) % Sources.size).cast(IntegerType)
    val baseSource = element_at(array(Sources.map(lit): _*), srcIdx + 1)
    val skewed =
      if (cfg.skewWebPct > 0) when(h(3) % 100 < cfg.skewWebPct, lit("web")).otherwise(baseSource)
      else baseSource

    def inject(every: Long, c: org.apache.spark.sql.Column,
               bad: org.apache.spark.sql.Column) =
      if (every > 0) when(i > 0 && i % every === 0, bad).otherwise(c) else c

    val docId = inject(cfg.dupEvery,
      format_string("doc-%012d", i),
      format_string("doc-%012d", i - 1))
    val source = inject(cfg.badSourceEvery, skewed, lit("BADSRC"))
    val tokensInj = inject(cfg.badTokenEvery, tokens,
      concat(array(lit(VocabSize + 9999)), slice(tokens, 2, cfg.maxTok)))
    val nTok = inject(cfg.badNtokEvery, size(tokensInj), size(tokensInj) + 1)

    spark.range(0, cfg.rows, 1, cfg.numPartitions * 4)
      .select(
        docId.as("doc_id"),
        tokensInj.as("tokens"),
        nTok.cast(IntegerType).as("n_tok"),
        source.as("source"),
        (i % cfg.numPartitions).cast(IntegerType).as("part"))
  }

  /** Materialize as identity-partitioned parquet — the emulated-Iceberg layout
    * (partition pruning on `part` ≅ Iceberg partition spec; SURVEY.md §7). */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("part").parquet(path)
}
