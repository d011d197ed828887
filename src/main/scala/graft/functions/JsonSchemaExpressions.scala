package graft.functions

import graft.json.{JVal, Json}
import graft.rules.JsonSchemaValidator
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Spark-native re-expression of the reference's scalar API surface
 * (json_schema_validate.c:204-312, :2036-2199): validate a JSON document
 * column against a JSON Schema.
 *
 * Design (SURVEY.md §2.1): each reference SQL function becomes a Catalyst
 * Expression over string columns. The schema argument is almost always a
 * foldable literal — it is then parsed ONCE per expression instance on the
 * driver and shipped inside the serialized plan, the analogue of
 * jsonschema_compile + the session regex cache (the compiled java.util.regex
 * Patterns live in a JVM-wide memo, see graft.rules.PosixRegex).
 *
 * Codegen: the recursive walker itself is a Scala method, but doGenCode emits
 * a direct call to it via an expression reference — so surrounding projections
 * KEEP whole-stage codegen (a CodegenFallback expression would force the whole
 * stage into interpreted mode). The 100TB corpus path uses the native-Column
 * rule compiler (graft.rules.SuiteCompiler) and never enters this walker.
 *
 * Null semantics: the reference functions are STRICT
 * (json_schema_validate--0.1.0.sql:9,16,23,30) → null in, null out, which is
 * exactly BinaryExpression's default null handling.
 *
 * Malformed JSON in either argument yields NULL (Spark's permissive convention,
 * e.g. from_json) rather than a hard error — PostgreSQL would abort the whole
 * statement, which is not an option for a 10^12-row scan.
 */
abstract class JsonSchemaExpr extends BinaryExpression {
  override def left: Expression = doc
  override def right: Expression = schema
  def doc: Expression
  def schema: Expression

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (doc.dataType == StringType && schema.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${doc.dataType}, ${schema.dataType})")
  }
  override def nullable: Boolean = true

  /** Schema literal pre-parsed once per expression (≅ jsonschema_compile). */
  @transient protected lazy val compiledSchema: Option[JVal] =
    if (schema.foldable) {
      val v = schema.eval(null)
      if (v == null) None else Json.parseOpt(v.toString)
    } else None

  protected def parseSchema(schemaStr: UTF8String): Option[JVal] =
    if (schema.foldable) compiledSchema else Json.parseOpt(schemaStr.toString)

  protected def compute(docV: JVal, schemaV: JVal): Any

  override def nullSafeEval(docAny: Any, schemaAny: Any): Any = {
    // UTF-8 byte parsing: no per-row String materialization of the document
    val docV = Json.parseBytesOpt(docAny.asInstanceOf[UTF8String].getBytes)
    val schemaV = parseSchema(schemaAny.asInstanceOf[UTF8String])
    (docV, schemaV) match {
      case (Some(d), Some(s)) => compute(d, s)
      case _                  => null
    }
  }

  /** Emit a direct call to this expression (shipped as a codegen reference
    * object) so the surrounding stage keeps whole-stage codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jsonSchemaExpr", this, classOf[JsonSchemaExpr].getName)
    val docGen = doc.genCode(ctx)
    val schemaGen = schema.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    val boxed = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(dataType)
    val resultTerm = ctx.freshName("jsResult")
    ev.copy(code = code"""
      ${docGen.code}
      ${schemaGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.defaultValue(dataType)};
      if (!${docGen.isNull} && !${schemaGen.isNull}) {
        Object $resultTerm = $self.nullSafeEval(${docGen.value}, ${schemaGen.value});
        if ($resultTerm != null) {
          ${ev.isNull} = false;
          ${ev.value} = ($boxed) $resultTerm;
        }
      }""")
  }
}

/** jsonschema_is_valid(doc, schema) → boolean (c:204-242). */
case class JsonSchemaIsValid(doc: Expression, schema: Expression) extends JsonSchemaExpr {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "jsonschema_is_valid"
  override protected def compute(d: JVal, s: JVal): Any = JsonSchemaValidator.isValid(d, s)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(doc = l, schema = r)
}

/** jsonschema_validate(doc, schema) → array<struct<path,message>> (c:271-312),
  * the typed form of the reference's JSON error array. */
case class JsonSchemaViolations(doc: Expression, schema: Expression) extends JsonSchemaExpr {
  override def dataType: DataType = JsonSchemaViolations.schemaType
  override def prettyName: String = "jsonschema_violations"
  override protected def compute(d: JVal, s: JVal): Any = {
    val errs = JsonSchemaValidator.violations(d, s)
    new GenericArrayData(errs.map { v =>
      InternalRow(UTF8String.fromString(v.path), UTF8String.fromString(v.message))
    }.toArray[Any])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(doc = l, schema = r)
}
object JsonSchemaViolations {
  val schemaType: ArrayType = ArrayType(
    StructType(Seq(StructField("path", StringType, nullable = false),
                   StructField("message", StringType, nullable = false))),
    containsNull = false)
}

/** jsonschema_validate_json raw-text form: compact JSON error-array string with
  * no spaces (expected/json_schema_validate.out:573-577); "[]" when valid. */
case class JsonSchemaValidateText(doc: Expression, schema: Expression) extends JsonSchemaExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "jsonschema_validate"
  override protected def compute(d: JVal, s: JVal): Any =
    UTF8String.fromString(JsonSchemaValidator.violationsJson(d, s))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(doc = l, schema = r)
}

/** format:"regex" support (json_schema_validate.c:1816-1829): true iff the
  * string value compiles as a regex. The one check not expressible with
  * built-ins (SURVEY.md §2.5 "UDF/UDAF surface"). */
case class RegexIsValid(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "regex_is_valid"
  override def nullSafeEval(v: Any): Any =
    graft.rules.PosixRegex.isValid(v.asInstanceOf[UTF8String].toString)
  // static-forwarder call keeps the surrounding stage in whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.rules.PosixRegex.isValid($c.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object functions {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  def regex_is_valid(c: Column): Column = column(RegexIsValid(expression(c)))

  /** Column API, mirroring the reference's is_valid/validate/compiled entry points. */
  def jsonschema_is_valid(doc: Column, schema: Column): Column =
    column(JsonSchemaIsValid(expression(doc), expression(schema)))
  def jsonschema_is_valid(doc: Column, schemaJson: String): Column =
    jsonschema_is_valid(doc, org.apache.spark.sql.functions.lit(schemaJson))
  def jsonschema_violations(doc: Column, schema: Column): Column =
    column(JsonSchemaViolations(expression(doc), expression(schema)))
  def jsonschema_violations(doc: Column, schemaJson: String): Column =
    jsonschema_violations(doc, org.apache.spark.sql.functions.lit(schemaJson))
  def jsonschema_validate(doc: Column, schema: Column): Column =
    column(JsonSchemaValidateText(expression(doc), expression(schema)))
  def jsonschema_validate(doc: Column, schemaJson: String): Column =
    jsonschema_validate(doc, org.apache.spark.sql.functions.lit(schemaJson))

  /** Register the scalar functions for SQL use (≅ CREATE EXTENSION). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("jsonschema_is_valid",
      es => JsonSchemaIsValid(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("jsonschema_violations",
      es => JsonSchemaViolations(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("jsonschema_validate",
      es => JsonSchemaValidateText(es.head, es(1)), "built-in")
  }
}
