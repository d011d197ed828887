package graft

import graft.corpus.CorpusGen
import graft.pipeline.{Manifest, TableChecks, ValidationPipeline}
import graft.rules.SuiteCompiler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SuiteCompilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val suite: String =
    """{
      | "$defs": { "tokenRange": { "minimum": 0, "exclusiveMaximum": 50257 } },
      | "rules": {
      |   "doc_id": { "type": "string", "required": true, "pattern": "^doc-[0-9]{12}$" },
      |   "tokens": { "type": "array", "minItems": 1, "maxItems": 512,
      |               "items": { "$ref": "#/$defs/tokenRange" } },
      |   "n_tok":  { "type": "integer", "minimum": 1, "maximum": 513,
      |               "equalsExpr": "size(tokens)" },
      |   "source": { "enum": ["web", "books", "code", "wiki"] }
      | }
      |}""".stripMargin

  test("clean corpus passes every rule") {
    val df = CorpusGen.generate(spark, CorpusGen.Config(rows = 2000))
    val compiled = SuiteCompiler.compile(suite)
    val verdict = compiled.verdicts(df, Seq("part")).collect()
    assert(verdict.length === 8)
    assert(verdict.forall(_.getAs[Boolean]("pass_all")))
    assert(compiled.violations(df, "doc_id").count() === 0)
  }

  test("injected violations are caught with reference message formats") {
    val df = CorpusGen.generate(spark, CorpusGen.Config(rows = 1000,
      badSourceEvery = 100, badTokenEvery = 157, badNtokEvery = 211))
    val compiled = SuiteCompiler.compile(suite)
    val v = compiled.violations(df, "doc_id").collect()
    assert(v.nonEmpty)
    val bySrc = v.filter(_.getAs[String]("rule_id") == "source:enum")
    assert(bySrc.length === 9) // rows 100,200,...,900
    assert(bySrc.forall(_.getAs[String]("observed") == "Value not in enum"))
    val byTok = v.filter(_.getAs[String]("rule_id").contains("items"))
    assert(byTok.nonEmpty)
    assert(byTok.exists(_.getAs[String]("observed") == "Value must be less than exclusiveMaximum"))
    val byN = v.filter(_.getAs[String]("rule_id") == "n_tok:equalsExpr")
    assert(byN.nonEmpty)
    // deterministic ordering contract: (doc_id, rule_id)
    val keys = v.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys === keys.sorted)
  }

  test("isValidCol agrees with the row-scalar walker on corpus-shaped JSON docs") {
    // cross-check: serialize corpus rows to JSON and validate with the dynamic
    // engine using an equivalent JSON Schema — the two paths must agree per row.
    val df = CorpusGen.generate(spark, CorpusGen.Config(rows = 300,
      badSourceEvery = 41, badTokenEvery = 67, badNtokEvery = 0))
    val compiled = SuiteCompiler.compile(suite)
    val jsonSchema =
      """{"type":"object",
        |  "properties":{
        |    "doc_id":{"type":"string","pattern":"^doc-[0-9]{12}$"},
        |    "tokens":{"type":"array","minItems":1,"maxItems":512,
        |              "items":{"minimum":0,"exclusiveMaximum":50257}},
        |    "n_tok":{"type":"integer","minimum":1,"maximum":513},
        |    "source":{"enum":["web","books","code","wiki"]}},
        |  "required":["doc_id","tokens","n_tok","source"]}""".stripMargin
    import graft.functions.functions._
    val both = df
      .withColumn("columnar", compiled.isValidCol)
      .withColumn("dynamic", jsonschema_is_valid(to_json(struct(col("doc_id"),
        col("tokens"), col("n_tok"), col("source"))), jsonSchema))
    val disagree = both.where(col("columnar") =!= col("dynamic")).count()
    assert(disagree === 0)
  }
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val suite: String =
    """{ "rules": {
      |   "doc_id": { "required": true, "pattern": "^doc-[0-9]{12}$" },
      |   "n_tok":  { "minimum": 1, "equalsExpr": "size(tokens)" },
      |   "source": { "enum": ["web", "books", "code", "wiki"] }
      |}}""".stripMargin

  test("table checks: stats, duplicates (salted), referential, histogram, drift") {
    import spark.implicits._
    val df = CorpusGen.generate(spark, CorpusGen.Config(rows = 3000, dupEvery = 300,
      badSourceEvery = 500))
    val stats = TableChecks.columnStats(df, Seq("n_tok", "source")).collect()(0)
    assert(stats.getAs[Long]("n_rows") === 3000)
    assert(stats.getAs[Double]("source_null_rate") === 0.0)

    val dups = TableChecks.duplicates(df, "doc_id").collect()
    assert(dups.length === 9) // rows 300,600,...,2700 share prior id
    assert(dups.forall(_.getAs[Long]("cnt") === 2))

    val dim = Seq("web", "books", "code", "wiki").toDF("value")
    val bad = TableChecks.referentialViolations(df, "source", dim, "value")
    assert(bad.count() === 5) // rows 500..2500 step 500 → BADSRC
    assert(bad.select("source").distinct().collect().map(_.getString(0)).toSeq === Seq("BADSRC"))

    val h1 = TableChecks.histogram(df, "n_tok", 1, 513, 64)
    assert(h1.agg(sum("cnt")).collect()(0).getLong(0) === 3000)
    // undrifted generator vs itself at a different size → tiny PSI/KS
    val df2 = CorpusGen.generate(spark, CorpusGen.Config(rows = 2000, seed = 43))
    val h2 = TableChecks.histogram(df2, "n_tok", 1, 513, 64)
    val drift = TableChecks.drift(h1, h2, 64)
    assert(drift.psi < 0.1, s"psi=${drift.psi}")
    assert(drift.ks < 0.05, s"ks=${drift.ks}")
    // drifted variant (shifted n_tok) must trip the detector
    val df3 = df2.withColumn("n_tok", col("n_tok") / 2)
    val h3 = TableChecks.histogram(df3, "n_tok", 1, 513, 64)
    assert(TableChecks.drift(h1, h3, 64).psi > 0.5)
  }

  test("pipeline run writes manifest + violations and resumes from checkpoint") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val corpusPath = s"$dir/corpus"
    val outDir = s"$dir/out"
    val df = CorpusGen.generate(spark, CorpusGen.Config(rows = 2000,
      numPartitions = 8, badSourceEvery = 250))
    CorpusGen.writePartitioned(df, corpusPath)

    val r1 = ValidationPipeline.run(spark, corpusPath, suite, outDir, "snap-1")
    assert(r1.verdicts.length === 8)
    assert(r1.resumedSkipped === 0)
    assert(r1.verdicts.map(_.nRows).sum === 2000)
    assert(r1.verdicts.count(!_.passAll) > 0) // BADSRC partitions fail
    assert(r1.globalDuplicateKeys === 0)

    // resume: everything already checkpointed → all partitions skipped
    val r2 = ValidationPipeline.run(spark, corpusPath, suite, outDir, "snap-1")
    assert(r2.resumedSkipped === 8)

    // new snapshot id → full re-validation
    val r3 = ValidationPipeline.run(spark, corpusPath, suite, s"$dir/out3", "snap-2")
    assert(r3.resumedSkipped === 0)

    // violations landed as parquet with the typed schema, partitioned by part
    val v = spark.read.parquet(s"$outDir/violations")
    assert(v.columns.toSeq === Seq("doc_id", "rule_id", "observed", "expected", "part"))
    assert(v.count() === 7) // rows 250,500,…,1750 carry BADSRC

    // manifest is valid JSON with lineage
    val m = Manifest.loadOrEmpty(s"$outDir/manifest.json", "snap-1",
      SuiteCompiler.compile(suite).suiteHash)
    assert(m.entries.size === 8)

    // crash-replay idempotency: forget the checkpoint for half the partitions
    // (simulates dying AFTER the parquet write but BEFORE Manifest.save) —
    // the replayed batches must REPLACE their partitions' violations via
    // dynamic partition overwrite, not append duplicates
    val partial = Manifest.empty("snap-1", SuiteCompiler.compile(suite).suiteHash)
      .withEntries(m.entries.values.filter(_.part >= 4).toSeq)
    Manifest.save(partial, s"$outDir/manifest.json")
    val r4 = ValidationPipeline.run(spark, corpusPath, suite, outDir, "snap-1")
    assert(r4.resumedSkipped === 4)
    assert(spark.read.parquet(s"$outDir/violations").count() === 7)

    // corrupt/partial manifest missing ONLY the global entry (e.g. a manifest
    // from a run killed between the last batch checkpoint and the global
    // check): the pipeline must RECOMPUTE the global rule, never trust the
    // partial manifest's absence as "no duplicates" (round-4 verdict #8)
    val m5 = Manifest.loadOrEmpty(s"$outDir/manifest.json", "snap-1",
      SuiteCompiler.compile(suite).suiteHash)
    assert(m5.globalDuplicateKeys.isDefined) // precondition: r4 recorded it
    val noGlobal = Manifest.empty("snap-1", SuiteCompiler.compile(suite).suiteHash)
      .withEntries(m5.entries.values.toSeq) // all partitions, NO global key
    Manifest.save(noGlobal, s"$outDir/manifest.json")
    val r5 = ValidationPipeline.run(spark, corpusPath, suite, outDir, "snap-1")
    assert(r5.resumedSkipped === 8)
    assert(!r5.globalLoaded, "dropped global entry must be recomputed, not loaded")
    assert(r5.globalDuplicateKeys === 0)
    // and the recomputed value was re-checkpointed
    val m6 = Manifest.loadOrEmpty(s"$outDir/manifest.json", "snap-1",
      SuiteCompiler.compile(suite).suiteHash)
    assert(m6.globalDuplicateKeys === Some(0L))
  }
}

class CompiledSchemaSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.functions.CompiledJsonSchema

  test("compile-once handle matches the dynamic path on real data") {
    import org.apache.spark.sql.functions._
    val cs = CompiledJsonSchema.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"maximum":50}}}""")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val n = ev.where(cs.isValid(col("props"))).count()
    val m = ev.where(graft.functions.functions.jsonschema_is_valid(col("props"),
      """{"type":"object","required":["k"],"properties":{"k":{"maximum":50}}}""")).count()
    assert(n === m)
    assert(cs.hash.length === 16)
  }

  test("canonicalization: key reorder + duplicate key compile to the same rule set") {
    // jsonb semantics (the reference's storage model): keys sorted in jsonb
    // order, duplicate keys last-wins — a messy author-ordered schema with a
    // stale duplicate "maximum": 99 must canonicalize to the clean one
    val clean = CompiledJsonSchema.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":50}}}""")
    val messy = CompiledJsonSchema.compile(
      """{ "properties": { "k": { "maximum": 99, "minimum": 0,
        |                         "type": "integer", "maximum": 50 } },
        |  "required": ["k"], "type": "object" }""".stripMargin)
    assert(messy.canonical === clean.canonical)
    assert(messy.hash === clean.hash) // manifest lineage agrees too
  }

  test("compile fails fast on malformed or non-object/bool schemas") {
    intercept[graft.json.JsonParseException](CompiledJsonSchema.compile("{nope"))
    intercept[IllegalArgumentException](CompiledJsonSchema.compile("42"))
    // boolean schemas are valid compiled schemas (c:323-330)
    assert(CompiledJsonSchema.compile("true").canonical === "true")
  }

  test("pg_regress 'compile schema': jsonschema_compile(...) IS NOT NULL = true") {
    // the 147th golden case (sql/json_schema_validate.sql compiled section,
    // expected/json_schema_validate.out): compile of a valid schema yields a
    // non-null handle — not a (doc, schema, bool) triple, so it lives here
    // rather than in golden_cases.json (which carries the other 146)
    val cs = CompiledJsonSchema.compile("""{"type": "object"}""")
    assert(cs != null && cs.canonical.nonEmpty && cs.hash.nonEmpty)
  }
}

class SkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted duplicate detection is correct under 90% single-key skew") {
    import org.apache.spark.sql.functions._
    // skew fixture (FIXTURES.md §1): 90% of rows on source="web"; duplicates
    // injected every 200 rows — salted two-phase agg must find exactly those
    val df = graft.corpus.CorpusGen.generate(spark, graft.corpus.CorpusGen.Config(
      rows = 4000, dupEvery = 200, skewWebPct = 90))
    val skewShare = df.where(col("source") === "web").count().toDouble / 4000
    assert(skewShare > 0.85)
    val dups = graft.pipeline.TableChecks.duplicates(df, "doc_id").collect()
    assert(dups.length === 19) // rows 200,400,...,3800
    assert(dups.forall(_.getAs[Long]("cnt") === 2))
    // and a skewed groupBy with salting: per-source counts match plain groupBy
    val plain = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(16)))
      .groupBy("source", "__salt").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(sum("c").as("count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain === salted)
  }
}

class TypedValidationSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed Dataset[SequenceRow] -> Dataset[ViolationRow] boundary") {
    import graft.corpus.{CorpusGen, TypedValidation}
    val ds = TypedValidation.corpus(spark, CorpusGen.Config(rows = 500, badSourceEvery = 100))
    val compiled = graft.rules.SuiteCompiler.compile(
      """{ "rules": { "source": { "enum": ["web","books","code","wiki"] } } }""")
    val v: org.apache.spark.sql.Dataset[graft.rules.ViolationRow] =
      TypedValidation.violations(ds, compiled)
    val rows = v.collect()
    assert(rows.length === 4) // rows 100,200,300,400
    assert(rows.forall(_.observed == "Value not in enum"))
    assert(rows.forall(_.rule_id == "source:enum"))
    // typed field access compiles and round-trips
    assert(rows.map(_.doc_id).distinct.length === 4)
  }
}

/** Bucketing for co-located joins: two tables bucketed+sorted on the join key
  * join WITHOUT any shuffle exchange — the physical plan the 100TB
  * corpus-vs-metadata join should have (pre-partitioning both sides once
  * amortizes every later join). */
class BucketedJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join with zero Exchange operators") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val df = graft.corpus.CorpusGen.generate(spark, graft.corpus.CorpusGen.Config(rows = 2000))
      df.select("doc_id", "n_tok").write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("graft_bucketed_a")
      df.select("doc_id", "source").write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("graft_bucketed_b")
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 2000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}

class TokenChecksSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("token frequencies and OOV stats over the corpus") {
    import org.apache.spark.sql.functions._
    val df = graft.corpus.CorpusGen.generate(spark, graft.corpus.CorpusGen.Config(
      rows = 1000, maxTok = 64, badTokenEvery = 100))
    val freq = graft.pipeline.TableChecks.tokenFrequencies(df, "tokens")
    val totalFromFreq = freq.agg(sum("cnt")).head().getLong(0)
    val totalDirect = df.agg(sum(size(col("tokens")))).head().getLong(0)
    assert(totalFromFreq === totalDirect)
    assert(freq.where(col("token") >= 50257).count() === 1) // the injected bad token value

    val oov = graft.pipeline.TableChecks.oovStats(df, "tokens", 50257).head()
    assert(oov.getAs[Long]("n_rows") === 1000)
    assert(oov.getAs[Long]("rows_with_oov") === 9) // rows 100,200,...,900
    assert(oov.getAs[Long]("oov_tokens") === 9)
    assert(oov.getAs[Long]("total_tokens") === totalDirect)
  }
}

class ProdShapeSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("prod-shape corpus (maxTok 8192) validates and samples violations") {
    val df = graft.corpus.CorpusGen.generate(spark, graft.corpus.CorpusGen.Config(
      rows = 200, maxTok = 8192, badSourceEvery = 10))
    val compiled = graft.rules.SuiteCompiler.compile(
      """{ "rules": {
        |  "tokens": { "minItems": 1, "maxItems": 8192,
        |              "items": { "minimum": 0, "exclusiveMaximum": 50257 } },
        |  "n_tok":  { "minimum": 1, "maximum": 8192, "equalsExpr": "size(tokens)" },
        |  "source": { "enum": ["web","books","code","wiki"] } } }""".stripMargin)
    val verdicts = compiled.verdicts(df, Seq("part")).collect()
    assert(verdicts.map(_.getAs[Long]("n_rows")).sum === 200)
    // 19 source violations; capped sample returns at most 5 per rule
    val sample = compiled.violationsSample(df, "doc_id", perRule = 5).collect()
    assert(sample.length === 5)
    assert(sample.forall(_.getAs[String]("rule_id") == "source:enum"))
    val full = compiled.violations(df, "doc_id").count()
    assert(full === 19)
  }
}
