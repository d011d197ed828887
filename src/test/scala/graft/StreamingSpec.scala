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

  test("watermarked dedup: RocksDB state rows are ACTUALLY removed (numRowsRemoved > 0)") {
    // direct state-store evidence for the e_stream_dedup_wm shape (round-4
    // verdict #9): the gate row proves eviction via the emits=2 output
    // pattern; this pins it on the state operator's own metrics. Same
    // construction at toy scale: batch 1 = keys at t0 (+ a watermark
    // advancer far in the future), batch 2 = one new key (cleanup runs at
    // END of batch), batch 3 = the original keys again, re-emitted only if
    // their state rows were evicted.
    import org.apache.spark.sql.types._
    val staged = java.nio.file.Files.createTempDirectory("graft-wm-metrics").toString
    val epoch = 1704067200L
    def mkBatch(rows: Seq[(Long, Long)], name: String, mtime: Long): Unit = {
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-wm-metrics-tmp").toString
      rows.toDF("user_id", "sec")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(staged, name)
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(mtime); ()
    }
    val keys = (1L to 5L)
    val m0 = System.currentTimeMillis() - 120000
    mkBatch(keys.map(k => (k, epoch)) :+ ((-1L, epoch + 10L * 3600)), "b1.parquet", m0)
    mkBatch(Seq((-2L, epoch + 20L * 3600)), "b2.parquet", m0 + 10000)
    mkBatch(keys.map(k => (k, epoch + 20L * 3600)), "b3.parquet", m0 + 20000)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts", TimestampType)))
      val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id")
        .select(col("user_id"))
        .writeStream.outputMode("append").format("memory")
        .queryName("wm_metrics_sink").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable()
      val removed = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      q.stop()
      assert(removed > 0, "state store reported zero evicted rows — state is unbounded")
      // and the output pattern agrees: every original key emitted twice
      val emits = spark.table("wm_metrics_sink").where(col("user_id") > 0)
        .groupBy("user_id").count().collect().map(_.getLong(1))
      assert(emits.length === 5 && emits.forall(_ === 2L))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join: buffered rows are ACTUALLY evicted (numRowsRemoved > 0)") {
    // direct state-store evidence for the e_stream_range_join shape: the
    // watermark + time-range condition is what makes both sides' join
    // buffers droppable. Batch 1 = matching click/purchase pairs at t0
    // plus far-future watermark advancers on BOTH streams; batch 2 = more
    // advancers — its end-of-batch cleanup runs with the watermark from
    // batch 1 (t0 + ~99h), far past every t0 row's survival horizon.
    import org.apache.spark.sql.types._
    import spark.implicits._
    val staged = java.nio.file.Files.createTempDirectory("graft-ssj-metrics").toString
    val epoch = 1704067200L
    def mkBatch(rows: Seq[(String, Long, Long)], name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ssj-tmp").toString
      rows.toDF("event_type", "user_id", "sec")
        .select(col("event_type"), col("user_id"), timestamp_seconds(col("sec")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(staged, name)
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(mtime); ()
    }
    val far = epoch + 100L * 3600
    val m0 = System.currentTimeMillis() - 120000
    mkBatch((1L to 5L).map(u => ("purchase", u, epoch)) ++
            (1L to 5L).map(u => ("click", u, epoch + 600)) ++
            Seq(("click", -1L, far), ("purchase", -2L, far)), "b1.parquet", m0)
    mkBatch(Seq(("click", -3L, far + 3600), ("purchase", -4L, far + 3600)),
      "b2.parquet", m0 + 10000)
    val schema = StructType(Seq(StructField("event_type", StringType),
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def side(typ: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .where(col("event_type") === typ)
    val clicks = side("click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = side("purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val q = clicks.join(purchases,
        col("cu") === col("pu") && col("cts") >= col("pts") &&
          col("cts") < col("pts") + expr("INTERVAL 2 HOURS"))
      .select(col("cu").as("user_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_metrics_sink").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val removed = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsRemoved).sum
    q.stop()
    assert(removed > 0, "join state reported zero evicted rows — buffers are unbounded")
    val got = spark.table("ssj_metrics_sink").where(col("user_id") > 0)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L, 4L, 5L)) // each pair matched exactly once
  }
}
