package graft

import org.apache.spark.sql.SparkSession

/**
 * Extra measurement harness for optimization work (guide §1) — SEPARATE from
 * the frozen driver-contract `graft.Bench`. Never used for judged numbers;
 * exists so per-query timings, repeats, and plan dumps can be taken without
 * touching the hashed harness.
 *
 *   sbt -batch "runMain graft.BenchExtra [sfDir] [repeats] [nameFilter...]"
 *
 * Env:
 *   SPARK_GRAFT_CPUS      core count (default 32), same contract as Bench
 *   SPARK_GRAFT_PLANS_DIR if set, writes <dir>/<query>.txt with the
 *                         explain("formatted") output of each selected query
 *
 * Timing methodology matches Bench exactly (same session config, same
 * `.count()` action per query, alphabetical order, lineitem warm-up read) so
 * numbers are comparable; repeats > 1 additionally reports the min.
 */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .config("spark.sql.columnVector.offheap.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timeSec[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val filters = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")

    val spark = session(cpus)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filters.isEmpty || filters.exists(name.contains) }

    plansDir.foreach { d =>
      new java.io.File(d).mkdirs()
      selected.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val text = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
            text.getBytes("UTF-8"))
        } catch { case e: Throwable => System.err.println(s"[benchextra] plan $name: $e") }
      }
    }

    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val times = (1 to repeats).map { _ =>
        try timeSec(fn(spark, sfDir).count())
        catch { case e: Throwable => System.err.println(s"[benchextra] $name: $e"); -1.0 }
      }
      spark.sparkContext.setJobDescription(null)
      name -> times
    }
    val total = results.map(_._2.head).filter(_ >= 0).sum
    val qs = results.map { case (k, ts) =>
      val tsStr = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      "\"" + k + f"""":{"first":${ts.head}%.3f,"min":${ts.filter(_ >= 0).minOption.getOrElse(-1.0)}%.3f,"samples":$tsStr%s}"""
    }.mkString("{", ",", "}")
    println(f"""{"metric":"benchextra_total_first","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","repeats":$repeats}""")
    spark.stop()
  }
}
