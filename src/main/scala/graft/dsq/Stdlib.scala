package graft.dsq

import org.apache.spark.sql.SparkSession

/** Extended function stdlib (reference §2.4 F1–F9; go-sqlite3-stdlib
  * surface: stats, URL, string, math, date, regexp). Spark builtins cover
  * most families natively — this registers the *names* the reference
  * dialect uses. Registrations are SQL temp functions built from
  * builtin expressions wherever possible (stay in codegen); only
  * best-effort date parsing is a real UDF (F8 — genuinely custom logic).
  */
object Stdlib {

  def register(spark: SparkSession): Unit = {
    // --- expression-backed alias names (stay inside codegen) -----------
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.types.DoubleType
    val reg = spark.sessionState.functionRegistry
    def alias(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    alias("iif")(e => If(e(0), e(1), e(2)))
    alias("printf")(e => FormatString(e: _*))
    alias("sha256")(e => Sha2(e(0), Literal(256)))
    alias("sha512")(e => Sha2(e(0), Literal(512)))
    alias("strpos")(e => StringInstr(e(0), e(1)))
    alias("charindex")(e => StringInstr(e(1), e(0)))
    alias("proper")(e => InitCap(e(0)))
    alias("stdev")(e => StddevSamp(e(0)).toAggregateExpression())
    alias("perc")(e => // stdlib contract: percentage in 0-100
      new Percentile(e(0),
        Divide(Cast(e(1), DoubleType), Literal(100.0))).toAggregateExpression())
    Seq(25, 50, 75, 90, 95, 99).foreach { p =>
      alias(s"percentile_$p")(e =>
        new Percentile(e(0), Literal(p / 100.0)).toAggregateExpression())
    }

    // URL family and best-effort dates carry real logic → Scala UDFs
    // (cold-path parity surface, not a hot loop).
    val u = spark.udf
    def parseUrlPart(part: String): String => String = s =>
      try {
        if (s == null) null else {
          val uri = new java.net.URI(s.trim)
          part match {
            case "scheme" => uri.getScheme
            case "host" => uri.getHost
            case "port" => if (uri.getPort < 0) null else uri.getPort.toString
            case "path" => uri.getPath
            case "fragment" => uri.getFragment
            case "query" => uri.getRawQuery
          }
        }
      } catch { case _: Exception => null }
    // SQLite `->`: extract a JSON node and re-serialize it as a JSON
    // FRAGMENT — strings keep their quotes ("x"), objects/arrays their
    // braces; missing/invalid path → null. (`->>`/raw text stays on the
    // codegen'd get_json_object.) Path syntax is the same '$.k' / '$[i]'
    // subset the dialect rewrite emits.
    u.register("dsq_json_frag", (doc: String, path: String) => Stdlib.jsonFrag(doc, path))
    u.register("url_scheme", parseUrlPart("scheme"))
    u.register("url_host", parseUrlPart("host"))
    u.register("url_port", parseUrlPart("port"))
    u.register("url_path", parseUrlPart("path"))
    u.register("url_fragment", parseUrlPart("fragment"))
    u.register("url_query", parseUrlPart("query"))
    u.register("url_param", (s: String, key: String) =>
      try {
        if (s == null || key == null) null
        else new java.net.URI(s.trim).getRawQuery match {
          case null => null
          case q => q.split("&").iterator.map(_.split("=", 2))
            .collectFirst {
              case Array(k, v) if urlDecode(k) == key => urlDecode(v)
              case Array(k) if urlDecode(k) == key => ""
            }.orNull
        }
      } catch { case _: Exception => null })

    // F8: best-effort date parsing (reference araddon/dateparse)
    u.register("date_parse", (s: String) => bestEffortEpoch(s))
    u.register("date_year", (s: String) =>
      bestEffortParts(s).map(_.getYear))
    u.register("date_month", (s: String) =>
      bestEffortParts(s).map(_.getMonthValue))
    u.register("date_day", (s: String) =>
      bestEffortParts(s).map(_.getDayOfMonth))
    u.register("date_hour", (s: String) =>
      bestEffortParts(s).map(_.getHour))
    u.register("date_minute", (s: String) =>
      bestEffortParts(s).map(_.getMinute))
    u.register("date_second", (s: String) =>
      bestEffortParts(s).map(_.getSecond))
    u.register("date_unix", (s: String) => bestEffortEpoch(s))
    u.register("date_rfc3339", (s: String) =>
      bestEffortParts(s).map(_.format(
        java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)).orNull)
    // F2: julianday
    u.register("julianday", (s: String) =>
      bestEffortEpoch(s).map(e => e / 86400.0 + 2440587.5))
    // F2: SQLite strftime with modifier subset. Spark's UDF registry is
    // name-keyed (no overloads): the modifier arity gets its own name.
    // (SQLite's bare date()/time()/datetime() names collide with Spark
    // builtins and are not shadowed; strftime covers the family.)
    u.register("strftime", (fmt: String, value: String) =>
      strftime(fmt, value, Nil))
    u.register("strftime_mod",
      (fmt: String, value: String, m1: String) => strftime(fmt, value, Seq(m1)))
  }

  // hoisted: an ObjectMapper per row would dominate a -> over a large
  // column (both are thread-safe for this read-only use)
  private val fragMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val fragStep = """\.([^.\[]+)|\[(\d+)\]""".r

  /** `->` implementation: walk the '$.k'/'$[i]' path, return the node
    * re-serialized as a JSON fragment, or null when the node is missing
    * OR the path is malformed (SQLite returns NULL for `c->''` — a path
    * whose steps don't fully parse must not fall through to the root).
    */
  def jsonFrag(doc: String, path: String): String = {
    if (doc == null || path == null) return null
    try {
      val p = path.stripPrefix("$")
      val matches = fragStep.findAllMatchIn(p).toSeq
      if (matches.map(_.matched.length).sum != p.length) return null
      var node = fragMapper.readTree(doc)
      matches.foreach { m =>
        if (node != null) {
          node =
            if (m.group(1) != null) node.get(m.group(1))
            else node.get(m.group(2).toInt)
        }
      }
      // a JSON null VALUE is a present node: SQLite's -> yields the
      // fragment text 'null' for it; only a MISSING node maps to SQL NULL
      if (node == null || node.isMissingNode) null
      else fragMapper.writeValueAsString(node)
    } catch { case _: Exception => null }
  }

  /** SQLite strftime subset: %Y %m %d %H %M %S %s %j %w %f %%; modifiers
    * '+/-N days|hours|minutes|seconds|months|years', 'start of
    * day|month|year', 'unixepoch'.
    */
  def strftime(fmt: String, value: String,
      modifiers: Seq[String]): Option[String] = {
    if (fmt == null || value == null) return None
    val base =
      if (value == "now")
        Some(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
      else if (modifiers.exists(_.trim.equalsIgnoreCase("unixepoch")) &&
        value.matches("-?\\d+"))
        Some(java.time.LocalDateTime.ofEpochSecond(value.toLong, 0,
          java.time.ZoneOffset.UTC))
      else bestEffortParts(value)
    base.map { dt0 =>
      val modRe = "([+-])\\s*(\\d+)\\s*(day|hour|minute|second|month|year)s?".r
      var dt = dt0
      modifiers.map(_.trim.toLowerCase).foreach {
        case "unixepoch" => ()
        case "start of day" => dt = dt.toLocalDate.atStartOfDay
        case "start of month" => dt = dt.withDayOfMonth(1).toLocalDate.atStartOfDay
        case "start of year" => dt = dt.withDayOfYear(1).toLocalDate.atStartOfDay
        case modRe(sign, n, unit) =>
          val amt = if (sign == "-") -n.toLong else n.toLong
          dt = unit match {
            case "day" => dt.plusDays(amt)
            case "hour" => dt.plusHours(amt)
            case "minute" => dt.plusMinutes(amt)
            case "second" => dt.plusSeconds(amt)
            case "month" => dt.plusMonths(amt)
            case "year" => dt.plusYears(amt)
          }
        case _ => ()
      }
      val sb = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
          fmt.charAt(i + 1) match {
            case 'Y' => sb.append(f"${dt.getYear}%04d")
            case 'm' => sb.append(f"${dt.getMonthValue}%02d")
            case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
            case 'H' => sb.append(f"${dt.getHour}%02d")
            case 'M' => sb.append(f"${dt.getMinute}%02d")
            case 'S' => sb.append(f"${dt.getSecond}%02d")
            case 's' => sb.append(dt.toEpochSecond(java.time.ZoneOffset.UTC))
            case 'j' => sb.append(f"${dt.getDayOfYear}%03d")
            case 'w' => sb.append(dt.getDayOfWeek.getValue % 7)
            case 'f' => sb.append(f"${dt.getSecond}%02d.${dt.getNano / 1000000}%03d")
            case 'J' => sb.append(
              dt.toEpochSecond(java.time.ZoneOffset.UTC) / 86400.0 + 2440587.5)
            case '%' => sb.append('%')
            case c => sb.append('%').append(c)
          }
          i += 2
        } else { sb.append(fmt.charAt(i)); i += 1 }
      }
      sb.toString
    }
  }

  private val patterns: Seq[java.time.format.DateTimeFormatter] = {
    import java.time.format.DateTimeFormatter
    Seq(
      DateTimeFormatter.ISO_OFFSET_DATE_TIME,
      DateTimeFormatter.ISO_INSTANT,
      DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss[.SSS]"),
      DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSS]"),
      DateTimeFormatter.ofPattern("yyyy-MM-dd"),
      DateTimeFormatter.ofPattern("yyyy/MM/dd"),
      DateTimeFormatter.ofPattern("MM/dd/yyyy[ HH:mm:ss]"),
      DateTimeFormatter.ofPattern("MMM d, yyyy"),
      DateTimeFormatter.ofPattern("MMMM d, yyyy"),
      DateTimeFormatter.ofPattern("d MMM yyyy"),
      DateTimeFormatter.ofPattern("EEE MMM d HH:mm:ss yyyy"),
      DateTimeFormatter.ofPattern("EEE, dd MMM yyyy HH:mm:ss Z"))
  }

  /** Ordered-pattern fallback parse (public dateparse behavior). */
  def bestEffortParts(s: String): Option[java.time.LocalDateTime] = {
    if (s == null) return None
    val t = s.trim
    if (t.isEmpty) return None
    // epoch seconds / millis
    if (t.matches("\\d{10}"))
      return Some(java.time.LocalDateTime.ofEpochSecond(t.toLong, 0,
        java.time.ZoneOffset.UTC))
    if (t.matches("\\d{13}"))
      return Some(java.time.LocalDateTime.ofEpochSecond(t.toLong / 1000,
        ((t.toLong % 1000) * 1000000).toInt, java.time.ZoneOffset.UTC))
    patterns.iterator.flatMap { f =>
      try {
        val ta = f.parseBest(t,
          java.time.OffsetDateTime.from _, java.time.LocalDateTime.from _,
          java.time.LocalDate.from _)
        Some(ta match {
          case o: java.time.OffsetDateTime =>
            o.withOffsetSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
          case l: java.time.LocalDateTime => l
          case d: java.time.LocalDate => d.atStartOfDay
        })
      } catch { case _: Exception => None }
    }.nextOption()
  }

  def bestEffortEpoch(s: String): Option[Long] =
    bestEffortParts(s).map(_.toEpochSecond(java.time.ZoneOffset.UTC))

  private def urlDecode(s: String): String =
    try java.net.URLDecoder.decode(s, "UTF-8")
    catch { case _: Exception => s }
}
