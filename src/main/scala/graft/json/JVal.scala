package graft.json

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

/**
 * Minimal immutable JSON value tree with PostgreSQL-jsonb-compatible
 * normalization, used by the schema validator (graft.rules.JsonSchemaValidator).
 *
 * Behavioral contract derived from the reference's jsonb handling
 * (json_schema_validate.c:220-242 json->jsonb normalization):
 *   - object keys are stored sorted by (byte-length, then unsigned byte order) —
 *     jsonb's key ordering, which drives error-report ordering
 *     (expected/json_schema_validate.out:555-562: "age" before "name");
 *   - duplicate keys keep the LAST value (jsonb semantics);
 *   - numbers are arbitrary-precision decimals (PG numeric), so 1 == 1.0.
 */
sealed trait JVal {
  /** JSON type name, matching jsonb_type_name (json_schema_validate.c:571-606). */
  def typeName: String = this match {
    case JNull    => "null"
    case _: JBool => "boolean"
    case _: JNum  => "number"
    case _: JStr  => "string"
    case _: JArr  => "array"
    case _: JObj  => "object"
  }
}
case object JNull extends JVal
final case class JBool(value: Boolean) extends JVal
final case class JNum(value: BigDecimal) extends JVal
final case class JStr(value: String) extends JVal
final case class JArr(items: Vector[JVal]) extends JVal
final case class JObj private (fields: Vector[(String, JVal)]) extends JVal {
  // small objects (the common case) use a linear scan — allocation-free and
  // faster than building a Map per parsed document
  private lazy val index: Map[String, JVal] =
    if (fields.size > 8) fields.toMap else null
  def get(key: String): Option[JVal] = {
    if (index ne null) return index.get(key)
    var i = 0
    while (i < fields.length) {
      if (fields(i)._1 == key) return Some(fields(i)._2)
      i += 1
    }
    None
  }
  def size: Int = fields.size
  def keys: Vector[String] = fields.map(_._1)
}

object JObj {
  /** jsonb key order: shorter keys first, ties broken bytewise (unsigned).
    * ASCII fast path avoids the per-comparison UTF-8 encode. */
  private[json] def jsonbKeyLt(a: String, b: String): Boolean = {
    var asciiOnly = true
    var i = 0
    while (asciiOnly && i < a.length) { if (a.charAt(i) >= 0x80) asciiOnly = false; i += 1 }
    i = 0
    while (asciiOnly && i < b.length) { if (b.charAt(i) >= 0x80) asciiOnly = false; i += 1 }
    if (asciiOnly) {
      if (a.length != b.length) a.length < b.length else a.compareTo(b) < 0
    } else {
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      if (ab.length != bb.length) ab.length < bb.length
      else {
        var j = 0
        while (j < ab.length) {
          val x = ab(j) & 0xff; val y = bb(j) & 0xff
          if (x != y) return x < y
          j += 1
        }
        false
      }
    }
  }

  private def isSorted(fs: Seq[(String, JVal)]): Boolean = {
    var i = 1
    while (i < fs.length) {
      if (!jsonbKeyLt(fs(i - 1)._1, fs(i)._1)) return false
      i += 1
    }
    true
  }

  /** Normalize: last-duplicate-wins, keys in jsonb order. Already-sorted
    * duplicate-free input (the common case) skips the rebuild entirely. */
  def normalized(raw: Seq[(String, JVal)]): JObj = {
    if (isSorted(raw)) return new JObj(raw.toVector) // strictly sorted ⇒ no dups
    val lastWins = scala.collection.mutable.LinkedHashMap[String, JVal]()
    raw.foreach { case (k, v) => lastWins(k) = v }
    new JObj(lastWins.toVector.sortWith((x, y) => jsonbKeyLt(x._1, y._1)))
  }
}

final class JsonParseException(msg: String) extends RuntimeException(msg)

object Json {
  private val factory = new JsonFactory()

  /** Parse JSON text into a normalized JVal tree. Throws JsonParseException on bad input. */
  def parse(text: String): JVal = parseWith(factory.createParser(text))

  /** UTF-8 byte parsing — jackson's fastest path; used by the Catalyst
    * expressions to skip the UTF8String→String copy per row. */
  def parseBytes(utf8: Array[Byte]): JVal = parseWith(factory.createParser(utf8))

  def parseBytesOpt(utf8: Array[Byte]): Option[JVal] =
    try Some(parseBytes(utf8)) catch { case _: JsonParseException => None }

  private def parseWith(p: JsonParser): JVal = {
    try {
      val t = p.nextToken()
      if (t == null) throw new JsonParseException("empty input")
      val v = readValue(p, t)
      if (p.nextToken() != null) throw new JsonParseException("trailing content")
      v
    } catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        throw new JsonParseException(e.getOriginalMessage)
    } finally p.close()
  }

  def parseOpt(text: String): Option[JVal] =
    try Some(parse(text)) catch { case _: JsonParseException => None }

  private def readValue(p: JsonParser, t: JsonToken): JVal = t match {
    case JsonToken.VALUE_NULL         => JNull
    case JsonToken.VALUE_TRUE         => JBool(true)
    case JsonToken.VALUE_FALSE        => JBool(false)
    case JsonToken.VALUE_STRING       => JStr(p.getText)
    case JsonToken.VALUE_NUMBER_INT   =>
      // long fast path (scale-0 BigDecimal) — huge ints still exact via decimal
      val nt = p.getNumberType
      if (nt == JsonParser.NumberType.INT || nt == JsonParser.NumberType.LONG)
        JNum(BigDecimal(p.getLongValue))
      else JNum(BigDecimal(p.getDecimalValue))
    case JsonToken.VALUE_NUMBER_FLOAT => JNum(BigDecimal(p.getDecimalValue))
    case JsonToken.START_ARRAY =>
      val buf = Vector.newBuilder[JVal]
      var n = p.nextToken()
      while (n != JsonToken.END_ARRAY) { buf += readValue(p, n); n = p.nextToken() }
      JArr(buf.result())
    case JsonToken.START_OBJECT =>
      val buf = Vector.newBuilder[(String, JVal)]
      var n = p.nextToken()
      while (n != JsonToken.END_OBJECT) {
        val key = p.currentName()
        val v = readValue(p, p.nextToken())
        buf += key -> v
        n = p.nextToken()
      }
      JObj.normalized(buf.result())
    case other => throw new JsonParseException(s"unexpected token $other")
  }

  /** Compact render (no spaces), jsonb-normalized key order for objects. */
  def render(v: JVal): String = {
    val sb = new StringBuilder
    renderTo(v, sb)
    sb.toString
  }

  private def renderTo(v: JVal, sb: StringBuilder): Unit = v match {
    case JNull     => sb.append("null")
    case JBool(b)  => sb.append(if (b) "true" else "false")
    case JNum(n)   => sb.append(renderNumber(n))
    case JStr(s)   => renderString(s, sb)
    case JArr(xs)  =>
      sb.append('[')
      var first = true
      xs.foreach { x => if (!first) sb.append(','); renderTo(x, sb); first = false }
      sb.append(']')
    case o: JObj =>
      sb.append('{')
      var first = true
      o.fields.foreach { case (k, x) =>
        if (!first) sb.append(',')
        renderString(k, sb); sb.append(':'); renderTo(x, sb)
        first = false
      }
      sb.append('}')
  }

  /** PG-numeric-style rendering: plain notation, no exponent, keep given scale. */
  def renderNumber(n: BigDecimal): String = {
    val s = n.underlying.toPlainString
    s
  }

  private def renderString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
