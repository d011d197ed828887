package graft

import graft.json.Json
import graft.rules.JsonSchemaValidator
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, reused). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

case class GoldenCase(label: String, doc: String, schema: String,
                      kind: String, expectedBool: Boolean, expectedErrors: String)

object GoldenCases {
  /** Golden quadruples transcribed from the reference's pg_regress suite
    * (/root/reference/sql/json_schema_validate.sql +
    * expected/json_schema_validate.out) by tools/extract_golden.py. */
  lazy val all: Vector[GoldenCase] = {
    val stream = getClass.getResourceAsStream("/golden_cases.json")
    val text = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
    val arr = Json.parse(text).asInstanceOf[graft.json.JArr]
    arr.items.map { v =>
      val o = v.asInstanceOf[graft.json.JObj]
      def str(k: String) = o.get(k).collect { case graft.json.JStr(s) => s }.getOrElse("")
      val kind = str("kind")
      GoldenCase(
        label = str("label"), doc = str("doc"), schema = str("schema"), kind = kind,
        expectedBool = o.get("expected").collect { case graft.json.JBool(b) => b }.getOrElse(false),
        expectedErrors = if (kind == "errors") str("expected") else "")
    }
  }
}

/** All 146 reference test cases through the pure row-scalar validator. */
class GoldenSuiteSpec extends AnyFunSuite {
  test("golden fixture is complete") {
    assert(GoldenCases.all.size >= 146)
  }

  GoldenCases.all.foreach { c =>
    test(s"[${c.kind}] ${c.label}") {
      val doc = Json.parse(c.doc)
      val schema = Json.parse(c.schema)
      if (c.kind == "bool") {
        assert(JsonSchemaValidator.isValid(doc, schema) === c.expectedBool,
          s"doc=${c.doc} schema=${c.schema}")
      } else {
        assert(JsonSchemaValidator.violationsJson(doc, schema) === c.expectedErrors,
          s"doc=${c.doc} schema=${c.schema}")
      }
    }
  }
}

/** The same cases through the Catalyst expression path (one distributed job),
  * proving the Spark-facing API matches the reference row-for-row. */
class GoldenSparkExprSpec extends AnyFunSuite {
  test("all golden cases via jsonschema_is_valid / jsonschema_validate expressions") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.functions._

    val df = GoldenCases.all
      .map(c => (c.label, c.doc, c.schema, c.kind, c.expectedBool, c.expectedErrors))
      .toDF("label", "doc", "schema", "kind", "expBool", "expErrors")
      .repartition(4)

    val out = df
      .withColumn("gotBool", jsonschema_is_valid($"doc", $"schema"))
      .withColumn("gotErrors", jsonschema_validate($"doc", $"schema"))
      .collect()

    out.foreach { r =>
      val label = r.getAs[String]("label")
      if (r.getAs[String]("kind") == "bool")
        assert(r.getAs[Boolean]("gotBool") === r.getAs[Boolean]("expBool"), label)
      else
        assert(r.getAs[String]("gotErrors") === r.getAs[String]("expErrors"), label)
    }
  }

  test("SQL registration works (CREATE EXTENSION analogue)") {
    val spark = TestSpark.spark
    graft.functions.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT jsonschema_is_valid('{"a":1}', '{"required":["a"]}') AS ok,
        |       jsonschema_validate('{}', '{"required":["a"]}') AS errs""".stripMargin).head()
    assert(r.getBoolean(0))
    assert(r.getString(1) === """[{"path":"","message":"Missing required property: a"}]""")
  }

  test("STRICT null semantics: null doc or schema yields null") {
    val spark = TestSpark.spark
    graft.functions.functions.registerAll(spark)
    val r = spark.sql("SELECT jsonschema_is_valid(CAST(NULL AS STRING), '{}')").head()
    assert(r.isNullAt(0))
  }
}
