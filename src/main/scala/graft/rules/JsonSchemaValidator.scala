package graft.rules

import graft.json._
import scala.collection.mutable.ArrayBuffer
import scala.math.BigDecimal.RoundingMode

/** One violation row: `path` + `message`, exactly the reference's error object
  * shape ({"path":…,"message":…}, json_schema_validate.c:1965-2002). */
final case class Violation(path: String, message: String)

/**
 * Row-scalar JSON Schema (draft-07 subset) validator with the exact semantics
 * of the reference engine — keyword set, evaluation order, error-message
 * formats, and the reference's documented quirks (SURVEY.md §2.2-§2.4).
 *
 * This is a fresh Scala implementation (pattern-matching walker over the JVal
 * ADT), not a translation: it exists (a) as the per-row kernel inside the
 * Catalyst expressions in graft.functions (the Spark-native equivalent of the
 * reference's scalar SQL functions, json_schema_validate.c:204-312), and
 * (b) as the oracle for the golden test suite ported from
 * /root/reference/sql/json_schema_validate.sql.
 *
 * Semantics contract (file:line into /root/reference/json_schema_validate.c):
 *  - keyword order: $ref, type, enum, const, allOf, anyOf, oneOf, not,
 *    if/then/else, then type-gated groups (:363-549);
 *  - accumulate-all-errors: failures don't stop evaluation (:428, :438);
 *  - error suppression contexts: anyOf/oneOf/not/if/contains validate
 *    sub-schemas without collecting errors (:1551, :1594, :1626, :1660, :1250);
 *  - malformed schema fragments are vacuously true (:675, :689-694, …);
 *  - invalid `pattern` regex silently passes (:972);
 *  - $ref siblings still evaluated (:406-407);
 *  - patternProperties only exempts keys from additionalProperties (:1419-1449);
 *  - container values never compare equal (const/enum/uniqueItems, :1338-1339);
 *  - "integer" = number with floor(x)==x (:624-632);
 *  - string lengths are UTF-8 BYTE lengths (jsonb string len);
 *  - numeric schema bounds converted to int via round-half-away-from-zero
 *    (PG numeric→int4).
 */
object JsonSchemaValidator {

  private val MaxRefDepth = 64 // reference would stack-overflow on $ref cycles; we bound instead

  def isValid(doc: JVal, schema: JVal): Boolean =
    validate(doc, schema, "", null, rootOf(schema), 0)

  /** Full error-collecting validation; returns violations in reference order. */
  def violations(doc: JVal, schema: JVal): Vector[Violation] = {
    val buf = new ArrayBuffer[Violation]()
    validate(doc, schema, "", buf, rootOf(schema), 0)
    buf.toVector
  }

  /** The reference's jsonschema_validate output: compact JSON array of error
    * objects (json_schema_validate.c:248-265), "[]" when valid. */
  def violationsJson(doc: JVal, schema: JVal): String = {
    val errs = violations(doc, schema)
    errs.map { v =>
      val sb = new StringBuilder("{\"path\":\"")
      sb.append(v.path) // reference does NOT escape path (c:1969); message is escaped
      sb.append("\",\"message\":")
      sb.append(escapeJson(v.message))
      sb.append('}')
      sb.toString
    }.mkString("[", ",", "]")
  }

  private def escapeJson(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c    => sb.append(c)
    }
    sb.append('"'); sb.toString
  }

  private def rootOf(schema: JVal): Option[JObj] = schema match {
    case o: JObj => Some(o)
    case _       => None
  }

  private def err(errors: ArrayBuffer[Violation], path: String, msg: String): Unit =
    if (errors != null) errors += Violation(path, msg)

  /** build_path (c:2007-2023): "base/key", array elems "[i]" appended with no slash. */
  private def childPath(base: String, key: String): String =
    if (base.nonEmpty && !key.startsWith("[")) s"$base/$key"
    else base + key

  private def byteLen(s: String): Int = s.getBytes("UTF-8").length

  /** PG numeric→int4: round half away from zero. */
  private def toInt(n: BigDecimal): Int = n.setScale(0, RoundingMode.HALF_UP).toInt

  private def isIntegral(n: BigDecimal): Boolean = n.remainder(BigDecimal(1)) == 0

  // ---- equality (jsonb_values_equal, c:1287-1344): scalars by value, containers never equal
  private[rules] def valuesEqual(a: JVal, b: JVal): Boolean = (a, b) match {
    case (JNull, JNull)         => true
    case (JBool(x), JBool(y))   => x == y
    case (JNum(x), JNum(y))     => x.compare(y) == 0
    case (JStr(x), JStr(y))     => x == y
    case _                      => false // containers + type mismatches
  }

  // ---- type checking (check_single_type / check_type, c:611-676)
  private def checkSingleType(doc: JVal, typeStr: String): Boolean =
    if (typeStr == "integer") doc match {
      case JNum(n) => isIntegral(n)
      case _       => false
    }
    else doc.typeName == typeStr

  private def checkType(doc: JVal, typeVal: JVal): Boolean = typeVal match {
    case JStr(t)   => checkSingleType(doc, t)
    case JArr(ts)  => ts.exists { case JStr(t) => checkSingleType(doc, t); case _ => false }
    case _         => true // invalid type spec → vacuous (c:675)
  }

  /** Main recursive walker. Returns validity; appends to `errors` unless null. */
  private def validate(doc: JVal, schema: JVal, path: String,
                       errors: ArrayBuffer[Violation], root: Option[JObj],
                       depth: Int): Boolean = {
    schema match {
      case JBool(b) => return b          // boolean schema (c:323-330, :377-379)
      case _: JObj  => ()
      case _        => return true       // non-object schema → vacuous (c:381-383)
    }
    val s = schema.asInstanceOf[JObj]
    var valid = true

    // $ref — resolve against root; siblings still evaluated (c:386-408)
    s.get("$ref") match {
      case Some(JStr(ref)) if root.isDefined =>
        if (depth >= MaxRefDepth) {
          err(errors, path, "Could not resolve $ref"); valid = false
        } else resolveRef(ref, root.get) match {
          case Some(resolved) =>
            if (!validate(doc, resolved, path, errors, root, depth + 1)) valid = false
          case None =>
            err(errors, path, "Could not resolve $ref"); valid = false
        }
      case _ => ()
    }

    // type (c:412-430)
    s.get("type").foreach { tv =>
      if (!checkType(doc, tv)) {
        val expected = tv match { case JStr(t) => t; case _ => "unknown" }
        err(errors, path, s"Expected type $expected but got ${doc.typeName}")
        valid = false
      }
    }

    // enum (c:433-439, check_enum c:681-731): scalar membership; containers never match
    s.get("enum").foreach {
      case JArr(members) =>
        if (!members.exists(m => valuesEqual(doc, m))) {
          err(errors, path, "Value not in enum"); valid = false
        }
      case _ => () // non-array enum vacuous (c:689-694)
    }

    // const (c:442-448)
    s.get("const").foreach { cv =>
      if (!valuesEqual(doc, cv)) {
        err(errors, path, "Value does not match const"); valid = false
      }
    }

    // allOf (c:1492-1524): AND, errors from all branches
    s.get("allOf").foreach {
      case JArr(subs) =>
        subs.foreach { sub =>
          if (!validate(doc, sub, path, errors, root, depth + 1)) valid = false
        }
      case _ => ()
    }

    // anyOf (c:1529-1567): OR, short-circuit, suppressed sub-errors
    s.get("anyOf").foreach {
      case JArr(subs) =>
        if (!subs.exists(sub => validate(doc, sub, path, null, root, depth + 1))) {
          err(errors, path, "Value does not match any schema in anyOf"); valid = false
        }
      case _ => ()
    }

    // oneOf (c:1572-1617): exactly one, NO short-circuit, suppressed sub-errors
    s.get("oneOf").foreach {
      case JArr(subs) =>
        val matches = subs.count(sub => validate(doc, sub, path, null, root, depth + 1))
        if (matches == 0) {
          err(errors, path, "Value does not match any schema in oneOf"); valid = false
        } else if (matches > 1) {
          err(errors, path, s"Value matches $matches schemas in oneOf, but must match exactly one")
          valid = false
        }
      case _ => ()
    }

    // not (c:1622-1635)
    s.get("not").foreach { sub =>
      if (validate(doc, sub, path, null, root, depth + 1)) {
        err(errors, path, "Value must not match the schema in 'not'"); valid = false
      }
    }

    // if/then/else (c:1640-1682)
    s.get("if").foreach { ifSchema =>
      val thenS = s.get("then"); val elseS = s.get("else")
      if (thenS.isDefined || elseS.isDefined) {
        val cond = validate(doc, ifSchema, path, null, root, depth + 1)
        val branch = if (cond) thenS else elseS
        branch.foreach { b =>
          if (!validate(doc, b, path, errors, root, depth + 1)) valid = false
        }
      }
    }

    // ---- type-gated groups
    doc match {
      case JStr(str) =>
        if (!checkStringConstraints(str, s, path, errors)) valid = false
        s.get("format").foreach { fv =>
          if (!checkFormat(str, fv, path, errors)) valid = false
        }
      case JNum(n) =>
        if (!checkNumberConstraints(n, s, path, errors)) valid = false
      case o: JObj =>
        if (!checkObject(o, s, path, errors, root, depth)) valid = false
      case JArr(items) =>
        if (!checkArray(items, s, path, errors, root, depth)) valid = false
      case _ => ()
    }

    valid
  }

  // ---- strings (check_string_constraints, c:915-992)
  private def checkStringConstraints(str: String, s: JObj, path: String,
                                     errors: ArrayBuffer[Violation]): Boolean = {
    var valid = true
    val len = byteLen(str)
    s.get("minLength").foreach {
      case JNum(n) =>
        val m = toInt(n)
        if (len < m) { err(errors, path, s"String length $len is less than minLength $m"); valid = false }
      case _ => ()
    }
    s.get("maxLength").foreach {
      case JNum(n) =>
        val m = toInt(n)
        if (len > m) { err(errors, path, s"String length $len exceeds maxLength $m"); valid = false }
      case _ => ()
    }
    s.get("pattern").foreach {
      case JStr(p) =>
        PosixRegex.find(p, str) match {
          case Some(false) =>
            err(errors, path, s"String does not match pattern: $p"); valid = false
          case _ => () // match, or invalid pattern silently skipped (c:972)
        }
      case _ => ()
    }
    valid
  }

  // ---- format (check_format + format_table, c:1745-1860)
  private val formatTable: Map[String, (String, String)] = Map(
    "date-time" -> ("^[0-9]{4}-[0-9]{2}-[0-9]{2}[Tt][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?([Zz]|[+-][0-9]{2}:[0-9]{2})?$",
                    "String does not match date-time format"),
    "date"      -> ("^[0-9]{4}-[0-9]{2}-[0-9]{2}$", "String does not match date format"),
    "time"      -> ("^([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\\.[0-9]+)?([Zz]|[+-][0-9]{2}:[0-9]{2})?$",
                    "String does not match time format"),
    "email"     -> ("^[^@[:space:]]+@[^@[:space:]]+\\.[^@[:space:]]+$", "String does not match email format"),
    "hostname"  -> ("^[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
                    "String does not match hostname format"),
    "ipv4"      -> ("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
                    "String does not match IPv4 format"),
    "ipv6"      -> ("^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$|^::$|^(([0-9a-fA-F]{1,4}:)*[0-9a-fA-F]{1,4})?::([0-9a-fA-F]{1,4}(:([0-9a-fA-F]{1,4}))*)?$",
                    "String does not match IPv6 format"),
    "uri"       -> ("^[a-zA-Z][a-zA-Z0-9+.-]*:.+$", "String does not match URI format"),
    "uuid"      -> ("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
                    "String does not match UUID format"))

  /** Expose a named format's (POSIX pattern, error message) for the Column compiler. */
  def formatPattern(name: String): Option[(String, String)] = formatTable.get(name)

  private def checkFormat(str: String, formatVal: JVal, path: String,
                          errors: ArrayBuffer[Violation]): Boolean = formatVal match {
    case JStr("regex") =>
      if (!PosixRegex.isValid(str)) {
        err(errors, path, "String is not a valid regular expression"); false
      } else true
    case JStr(name) =>
      formatTable.get(name) match {
        case Some((pattern, msg)) =>
          PosixRegex.find(pattern, str) match {
            case Some(false) => err(errors, path, msg); false
            case _           => true
          }
        case None => true // unknown format ignored (c:1853)
      }
    case _ => true
  }

  // ---- numbers (check_number_constraints, c:997-1084) — exact decimal comparisons
  private def checkNumberConstraints(n: BigDecimal, s: JObj, path: String,
                                     errors: ArrayBuffer[Violation]): Boolean = {
    var valid = true
    s.get("minimum").foreach {
      case JNum(m) => if (n < m) { err(errors, path, "Value is less than minimum"); valid = false }
      case _ => ()
    }
    s.get("maximum").foreach {
      case JNum(m) => if (n > m) { err(errors, path, "Value exceeds maximum"); valid = false }
      case _ => ()
    }
    s.get("exclusiveMinimum").foreach {
      case JNum(m) => if (n <= m) { err(errors, path, "Value must be greater than exclusiveMinimum"); valid = false }
      case _ => ()
    }
    s.get("exclusiveMaximum").foreach {
      case JNum(m) => if (n >= m) { err(errors, path, "Value must be less than exclusiveMaximum"); valid = false }
      case _ => ()
    }
    s.get("multipleOf").foreach {
      case JNum(m) =>
        // numeric_mod(x, m) == 0; PG numeric_mod with zero divisor raises, but the
        // reference's test (sql:330) shows 0 passing as the *divided* value.
        val rem = if (m.compare(BigDecimal(0)) == 0) BigDecimal(1) // div-by-zero → treated as failing
                  else n.remainder(m)
        if (rem.compare(BigDecimal(0)) != 0) {
          err(errors, path, "Value is not a multiple of multipleOf"); valid = false
        }
      case _ => ()
    }
    valid
  }

  // ---- objects (required/properties/additionalProperties/propertyNames/size)
  private def checkObject(o: JObj, s: JObj, path: String, errors: ArrayBuffer[Violation],
                          root: Option[JObj], depth: Int): Boolean = {
    var valid = true

    // required (c:736-780)
    s.get("required").foreach {
      case JArr(reqs) =>
        reqs.foreach {
          case JStr(prop) if o.get(prop).isEmpty =>
            err(errors, path, s"Missing required property: $prop"); valid = false
          case _ => ()
        }
      case _ => ()
    }

    // properties (c:785-837): absent property skipped; recursion extends path
    s.get("properties").foreach {
      case props: JObj =>
        props.fields.foreach { case (propName, propSchema) =>
          o.get(propName).foreach { dv =>
            if (!validate(dv, propSchema, childPath(path, propName), errors, root, depth + 1))
              valid = false
          }
        }
      case _ => ()
    }

    // additionalProperties + patternProperties (c:1358-1487):
    // patternProperties only EXEMPTS keys; it does not validate their values.
    s.get("additionalProperties").foreach { ap =>
      val knownProps: Set[String] = s.get("properties") match {
        case Some(p: JObj) => p.keys.toSet
        case _             => Set.empty
      }
      val patterns: Vector[String] = s.get("patternProperties") match {
        case Some(pp: JObj) => pp.keys
        case _              => Vector.empty
      }
      val apReject = ap match { case JBool(false) => true; case _ => false }
      val apSchema = ap match { case os: JObj => Some(os); case JBool(_) => None; case _ => None }
      if (apReject || apSchema.isDefined) {
        o.fields.foreach { case (key, dv) =>
          val defined = knownProps.contains(key)
          val exempt = !defined && patterns.exists(p => PosixRegex.find(p, key).contains(true))
          if (!defined && !exempt) {
            if (apReject) {
              err(errors, path, s"Additional property '$key' is not allowed"); valid = false
            } else apSchema.foreach { as =>
              if (!validate(dv, as, childPath(path, key), errors, root, depth + 1)) valid = false
            }
          }
        }
      }
    }

    // propertyNames (c:842-882): each KEY validated as a string value, path extended
    s.get("propertyNames").foreach { pn =>
      o.keys.foreach { key =>
        if (!validate(JStr(key), pn, childPath(path, key), errors, root, depth + 1)) valid = false
      }
    }

    // minProperties/maxProperties (c:1687-1740)
    s.get("minProperties").foreach {
      case JNum(n) =>
        val m = toInt(n)
        if (o.size < m) { err(errors, path, s"Object has ${o.size} properties, minimum is $m"); valid = false }
      case _ => ()
    }
    s.get("maxProperties").foreach {
      case JNum(n) =>
        val m = toInt(n)
        if (o.size > m) { err(errors, path, s"Object has ${o.size} properties, maximum is $m"); valid = false }
      case _ => ()
    }
    valid
  }

  // ---- arrays (check_array_constraints, c:1089-1281)
  private def checkArray(items: Vector[JVal], s: JObj, path: String,
                         errors: ArrayBuffer[Violation], root: Option[JObj],
                         depth: Int): Boolean = {
    var valid = true
    val count = items.size

    s.get("minItems").foreach {
      case JNum(n) =>
        val m = toInt(n)
        if (count < m) { err(errors, path, s"Array has $count items, minimum is $m"); valid = false }
      case _ => ()
    }
    s.get("maxItems").foreach {
      case JNum(n) =>
        val m = toInt(n)
        if (count > m) { err(errors, path, s"Array has $count items, maximum is $m"); valid = false }
      case _ => ()
    }

    // uniqueItems: pairwise scalar equality; containers never equal (c:1144-1188)
    s.get("uniqueItems").foreach {
      case JBool(true) =>
        val dup = items.indices.exists { i =>
          (i + 1 until count).exists(j => valuesEqual(items(i), items(j)))
        }
        if (dup) { err(errors, path, "Array items are not unique"); valid = false }
      case _ => ()
    }

    // items: every element, per-index "[i]" paths (c:1190-1217)
    s.get("items").foreach {
      case itemSchema @ (_: JObj | _: JArr) =>
        // reference requires jbvBinary (container) items value (c:1192)
        items.zipWithIndex.foreach { case (elem, idx) =>
          if (!validate(elem, itemSchema, childPath(path, s"[$idx]"), errors, root, depth + 1))
            valid = false
        }
      case _ => () // scalar/boolean items value skipped (reference only handles containers)
    }

    // contains + minContains/maxContains (c:1219-1279); sub-errors suppressed
    s.get("contains").foreach { containsSchema =>
      val minC = s.get("minContains") match { case Some(JNum(n)) => toInt(n); case _ => 1 }
      val maxC = s.get("maxContains") match { case Some(JNum(n)) => toInt(n); case _ => -1 }
      val matched = items.count(e => validate(e, containsSchema, path, null, root, depth + 1))
      if (matched < minC) {
        val msg = if (minC == 1) "Array does not contain any item matching the contains schema"
                  else s"Array contains $matched matching items, minimum is $minC"
        err(errors, path, msg); valid = false
      }
      if (maxC >= 0 && matched > maxC) {
        err(errors, path, s"Array contains $matched matching items, maximum is $maxC"); valid = false
      }
    }
    valid
  }

  // ---- $ref resolution (resolve_ref, c:1866-1960)
  private def resolveRef(ref: String, root: JObj): Option[JVal] = {
    if (!ref.startsWith("#")) return None
    val frag = ref.drop(1)
    if (frag.isEmpty || frag == "/") return Some(root)
    val tokens = frag.stripPrefix("/").split("/", -1)
    var current: JVal = root
    var result: Option[JVal] = None
    var i = 0
    while (i < tokens.length) {
      val tok = unescapePointer(tokens(i))
      current match {
        case o: JObj =>
          o.get(tok) match {
            case Some(found) =>
              result = Some(found)
              found match {
                case _: JObj | _: JArr => current = found
                case _                 => return result // scalar mid-path ends resolution (c:1944-1949)
              }
            case None => return None
          }
        case _ => return None // reference's get_jsonb_key only works on objects
      }
      i += 1
    }
    result
  }

  private def unescapePointer(tok: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < tok.length) {
      if (tok.charAt(i) == '~' && i + 1 < tok.length && tok.charAt(i + 1) == '1') { sb.append('/'); i += 2 }
      else if (tok.charAt(i) == '~' && i + 1 < tok.length && tok.charAt(i + 1) == '0') { sb.append('~'); i += 2 }
      else { sb.append(tok.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
