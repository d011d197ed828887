package graft.functions

import graft.json.{JVal, Json}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/**
 * Explicit compile-once schema handle — the Spark-native analogue of
 * `jsonschema_compile` + the `jsonschema_compiled` type and its *_compiled
 * entry points (json_schema_validate.c:2036-2199, SURVEY.md §2.1 #5-#10).
 *
 * Compilation validates the schema text eagerly on the driver (a malformed
 * schema fails at compile time, not per-row at executor time), canonicalizes
 * it (jsonb-normalized key order), and exposes the same three operations as
 * the dynamic API. The canonical text is embedded as a foldable literal, so
 * each expression instance parses it exactly once per plan — the analogue of
 * the reference storing the pre-parsed jsonb bytes in the compiled varlena —
 * and `hash` gives the rule-set hash used for checkpoint-manifest lineage.
 */
final class CompiledJsonSchema private (val canonical: String, val tree: JVal) {
  /** jsonschema_is_valid_compiled (c:2102-2116). */
  def isValid(doc: Column): Column = functions.jsonschema_is_valid(doc, lit(canonical))
  /** jsonschema_validate_compiled (c:2123-2140) — typed array<struct> form. */
  def violations(doc: Column): Column = functions.jsonschema_violations(doc, lit(canonical))
  /** jsonschema_validate_json_compiled (c:2175-2199) — raw error-array text. */
  def validate(doc: Column): Column = functions.jsonschema_validate(doc, lit(canonical))
  /** Rule-set hash for manifest lineage (SURVEY.md §1.2 compiled row). */
  lazy val hash: String = graft.rules.SuiteCompiler.suiteHash(canonical)
  override def toString: String = s"CompiledJsonSchema($canonical)"
}

object CompiledJsonSchema {
  /** jsonschema_compile: parse + normalize once, fail fast on bad input
    * (the reference raises "Schema must be an object or boolean" lazily at
    * validation time, c:333-338 — compile is the place to surface it). */
  def compile(schemaJson: String): CompiledJsonSchema = {
    val tree = Json.parse(schemaJson) // throws JsonParseException on bad JSON
    tree match {
      case _: graft.json.JObj | _: graft.json.JBool =>
        new CompiledJsonSchema(Json.render(tree), tree)
      case _ =>
        throw new IllegalArgumentException("Schema must be an object or boolean")
    }
  }
}
