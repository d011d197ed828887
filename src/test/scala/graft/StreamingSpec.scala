package graft

import graft.rules.SuiteCompiler
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

case class SourceCount(source: String, bad: Long)

/** Structured Streaming over the same compiled ValidationSuite: the rule
  * Columns are plan fragments, so the identical compiled suite drives batch
  * AND streaming (readStream → withColumn(valid) → windowed verdict agg). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming validation: compiled rules over a file stream with watermarked window agg") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // batch of corpus rows with injected violations, written as the stream source
    val df = graft.corpus.CorpusGen.generate(spark,
      graft.corpus.CorpusGen.Config(rows = 1000, badSourceEvery = 100))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("n_tok")))
    df.write.mode("overwrite").parquet(s"$dir/in")

    val compiled = SuiteCompiler.compile(
      """{ "rules": { "source": { "enum": ["web","books","code","wiki"] },
        |             "n_tok": { "minimum": 1, "equalsExpr": "size(tokens)" } } }""".stripMargin)

    val stream = spark.readStream
      .schema(df.schema)
      .parquet(s"$dir/in")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"part")
      .agg(bool_and(compiled.isValidCol).as("pass_all"),
        count(lit(1)).as("n_rows"),
        sum(compiled.violationCountCol.cast("long")).as("n_violations"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("verdicts_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT * FROM verdicts_stream").collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum === 1000)
    assert(out.map(_.getAs[Long]("n_violations")).sum === 9) // rows 100..900
    assert(out.exists(!_.getAs[Boolean]("pass_all")))
  }

  test("stateful per-source violation streaks via flatMapGroupsWithState") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    graft.corpus.CorpusGen.generate(spark,
        graft.corpus.CorpusGen.Config(rows = 400, badSourceEvery = 50))
      .write.mode("overwrite").parquet(s"$dir/in")

    val schema = spark.read.parquet(s"$dir/in").schema
    val counts = spark.readStream.schema(schema).parquet(s"$dir/in")
      .select($"source", ($"source" === "BADSRC").cast("long").as("isBad"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val bad = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(bad)
          Iterator(SourceCount(key, bad))
      }
    val q = counts.writeStream.outputMode("append").format("memory")
      .queryName("streaks").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val bad = spark.sql("SELECT sum(bad) FROM streaks").head().getLong(0)
    assert(bad === 7) // rows 50,100,...,350
  }
}
