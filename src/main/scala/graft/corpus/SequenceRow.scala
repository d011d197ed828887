package graft.corpus

import graft.rules.{SuiteCompiler, ViolationRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The corpus row type (BASELINE.json input_hint):
  * doc_id:string, tokens:array<int32>, n_tok:int32, source:string (+ part). */
final case class SequenceRow(doc_id: String, tokens: Array[Int], n_tok: Int,
                             source: String, part: Int)

/** Typed facade over the validation engine: `Dataset[SequenceRow]` in,
  * `Dataset[ViolationRow]` out (the north_star's typed output boundary).
  * The untyped DataFrame path underneath is identical — Encoders only wrap
  * the boundary, the plan stays pure Catalyst. */
object TypedValidation {

  def corpus(spark: SparkSession, cfg: CorpusGen.Config): Dataset[SequenceRow] = {
    import spark.implicits._
    CorpusGen.generate(spark, cfg).as[SequenceRow]
  }

  def readCorpus(spark: SparkSession, path: String): Dataset[SequenceRow] = {
    import spark.implicits._
    spark.read.parquet(path).as[SequenceRow]
  }

  def violations(ds: Dataset[SequenceRow], compiled: SuiteCompiler.Compiled): Dataset[ViolationRow] = {
    import ds.sparkSession.implicits._
    compiled.violations(ds.toDF(), "doc_id").as[ViolationRow]
  }

  def isValid(ds: Dataset[SequenceRow], compiled: SuiteCompiler.Compiled): DataFrame =
    ds.toDF().withColumn("valid", compiled.isValidCol)
}
