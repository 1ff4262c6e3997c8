package graft.miw

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** Per-field scalar transforms: date/time bucketing, URL normalization,
  * C-style numeric casts, and the evtx/DNS preprocessing parsers.
  * All built from `org.apache.spark.sql.functions` Column expressions
  * where possible (codegen'd); UDFs only for the three blob parsers.
  *
  * Semantics from the reference parse loop (miw/log_format.cc:401-538)
  * and preprocessors (miw/log_format.cc:606-716).
  */
object FieldExprs {

  // ---------------------------------------------------------------- dates

  /** Convert a strptime(3) format to a Spark datetime pattern, quoting
    * literal text. Covers every conversion used by the reference's
    * format library (%Y %m %d %H %M %S %y %b %e %T %F). */
  def strptimeToSpark(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      // quote any literal run containing letters or the quote char
      if (s.exists(c => c.isLetter || c == '\'')) {
        out += '\''; out ++= s.replace("'", "''"); out += '\''
      } else out ++= s
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val conv = fmt.charAt(i + 1) match {
          case 'Y' => "yyyy"; case 'y' => "yy"
          case 'm' => "MM";   case 'd' => "dd"; case 'e' => "d"
          case 'H' => "HH";   case 'M' => "mm"; case 'S' => "ss"
          case 'b' | 'h' => "MMM"; case 'B' => "MMMM"; case 'a' => "EEE"
          case 'j' => "DDD"
          case 'T' => "HH:mm:ss"
          case 'F' => "yyyy-MM-dd"
          case 'z' => "XX"; case 'Z' => "zz"
          case '%' => null // literal percent
          case other => throw new IllegalArgumentException(
            s"unsupported strptime conversion %$other in '$fmt'")
        }
        if (conv == null) lit += '%' else { flush(); out ++= conv }
        i += 2
      } else { lit += c; i += 1 }
    }
    flush()
    out.toString
  }

  /** Timestamp from a token per the field's date_format; "unix" means
    * epoch seconds (reference: miw/log_format.cc:404-414). Unparseable
    * tokens yield null (caller falls back to the raw token, mirroring
    * the reference's warn-and-keep behavior). */
  def parseDate(token: Column, dateFormat: String): Column =
    if (dateFormat == "unix")
      timestamp_seconds(token.cast(LongType))
    else
      try_to_timestamp(token, lit(strptimeToSpark(dateFormat)))

  /** Reference date bucketing prints tm fields through std::to_string —
    * i.e. UNPADDED month/day/hour (miw/log_format.cc:417-441); only the
    * bucketed minute is zero-padded. */
  def dateBucket(ts: Column, processing: String, offset: Int): Column = {
    val ymd = concat(year(ts), lit("-"), month(ts), lit("-"), dayofmonth(ts))
    processing match {
      case "day"   => ymd
      case "month" => concat(year(ts), lit("-"), month(ts))
      case "year"  => year(ts).cast("string")
      case "hour"  => concat(ymd, lit("T"), hour(ts), lit(":00:00"))
      case "minute" =>
        val m = (floor(minute(ts) / offset) * offset).cast("int")
        concat(ymd, lit("T"), hour(ts), lit(":"),
          lpad(m.cast("string"), 2, "0"), lit(":00"))
      case "second" =>
        concat(ymd, lit("T"), hour(ts), lit(":"), minute(ts), lit(":"), second(ts))
      case _ => ts.cast("string")
    }
  }

  /** Bare HH:MM:SS bucketing for `time`-typed fields (no date): keeps
    * the original string parts before the bucketed unit, zero-pads the
    * bucketed unit (miw/log_format.cc:445-472). Non-3-part tokens pass
    * through unchanged. */
  def timeBucket(token: Column, processing: String, offset: Int): Column = {
    val parts = split(trim(token), ":")
    val ok = size(parts) === 3
    def bucket(unit: Column): Column = {
      val b = (floor(unit.cast(LongType) / offset) * offset).cast(LongType)
      lpad(b.cast("string"), 2, "0")
    }
    val bucketed = processing match {
      case "hour"   => bucket(element_at(parts, 1))
      case "minute" => concat(element_at(parts, 1), lit(":"), bucket(element_at(parts, 2)))
      case "second" => concat(element_at(parts, 1), lit(":"), element_at(parts, 2),
                              lit(":"), bucket(element_at(parts, 3)))
      case _ => token
    }
    when(ok, bucketed).otherwise(token)
  }

  // ----------------------------------------------------------------- urls

  /** Rebuild a URL through the field's url_format template
    * (%scheme %host %port %path %query %fragment; default
    * "%scheme://%host%port"). %port renders ":<port>" when present.
    * Tokens without a scheme, or containing "://[" (IPv6 — reference
    * works around a parser hang), pass through unchanged.
    * (reference: miw/log_format.cc:473-500) */
  def urlNormalize(token: Column, urlFormat: String): Column = {
    val partOf = Map(
      "%scheme"   -> ((c: Column) => coalesce(parse_url(c, lit("PROTOCOL")), lit(""))),
      "%host"     -> ((c: Column) => coalesce(parse_url(c, lit("HOST")), lit(""))),
      "%port"     -> ((c: Column) => {
        // parse_url has no PORT part (Hive-compatible set); take it from
        // the AUTHORITY's ":<digits>" suffix
        val p = regexp_extract(coalesce(parse_url(c, lit("AUTHORITY")), lit("")),
          ":(\\d+)$", 1)
        when(p =!= "", concat(lit(":"), p)).otherwise(lit(""))
      }),
      "%path"     -> ((c: Column) => coalesce(parse_url(c, lit("PATH")), lit(""))),
      "%query"    -> ((c: Column) => coalesce(parse_url(c, lit("QUERY")), lit(""))),
      "%fragment" -> ((c: Column) => coalesce(parse_url(c, lit("REF")), lit(""))))
    // split the template into literal / %var pieces
    val varPat = "%(scheme|host|port|path|query|fragment)".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- varPat.findAllMatchIn(urlFormat)) {
      if (m.start > last) pieces += lit(urlFormat.substring(last, m.start))
      pieces += partOf(m.matched)(token)
      last = m.end
    }
    if (last < urlFormat.length) pieces += lit(urlFormat.substring(last))
    val rebuilt = concat(pieces.toSeq: _*)
    val scheme = parse_url(token, lit("PROTOCOL"))
    when(token.contains("://["), token)
      .when(scheme.isNull || scheme === "", token)
      .otherwise(rebuilt)
  }

  // ---------------------------------------------------------------- casts

  /** C atoi: parse a leading integer, 0 on garbage (never null) —
    * miw/log_format.cc:506. */
  def atoi(token: Column): Column =
    coalesce(regexp_extract(trim(token), "^[+-]?\\d+", 0).cast(LongType), lit(0L))

  /** C atof: parse a leading decimal number, 0.0 on garbage. */
  def atof(token: Column): Column =
    coalesce(
      regexp_extract(trim(token),
        "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?", 0).cast(DoubleType),
      lit(0.0))

  /** bool via atoi != 0 (miw/log_format.cc:529). */
  def atob(token: Column): Column = (atoi(token) =!= 0L).cast(BooleanType)

  // -------------------------------------------------------- preprocessing

  /** "… -> k1 = v1 k2 = v2" EVTX blob → map (evtxcsv,
    * miw/log_format.cc:606-644). Key of each pair is the last
    * space-separated word before the '='. */
  def evtxcsvParse(token: String): Map[String, String] = {
    if (token == null) return Map.empty
    val arrow = token.indexOf("->")
    val remain = if (arrow >= 0) token.substring(arrow + 2) else token
    val toks = Tokenizer.simpleSplit(remain, "=")
    if (toks.isEmpty) return Map.empty
    var head = toks.head
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (i <- 1 until toks.length) {
      var r = toks(i)
      var nhead = ""
      if (i < toks.length - 1) {
        r = r.substring(0, math.max(0, r.length - 1))
        val sp = r.lastIndexOf(' ')
        if (sp >= 0) { nhead = r.substring(sp); r = r.substring(0, sp) }
      }
      out(head.trim) = r.trim
      head = nhead
    }
    out.toMap
  }

  /** "[Key: value] [Key2: value2]" blob → map (evtxcsv2,
    * miw/log_format.cc:646-678). */
  def evtxcsv2Parse(token: String): Map[String, String] = {
    if (token == null) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (pair <- Tokenizer.simpleSplit(token, "[")) {
      val elts = Tokenizer.simpleSplit(pair, ":")
      if (elts.length >= 2) {
        val name = elts.head.trim
        var v = elts.tail.mkString("").trim
        if (v.nonEmpty && v.last == ']') v = v.dropRight(1)
        out(name) = v
      }
    }
    out.toMap
  }

  val evtxcsvUdf = udf(evtxcsvParse _)
  val evtxcsv2Udf = udf(evtxcsv2Parse _)

  /** Microsoft DNS wire-format name: "(3)www(6)google(3)com(0)" →
    * "www.google.com" (miw/log_format.cc:680-716). The tail from the
    * first '(' has each "(n)" length marker replaced by a dot; leading
    * and trailing dots trimmed. */
  def dnsNameCol(tail: Column): Column = {
    val p = instr(trim(tail), "(")
    val rest = substr(trim(tail), p) // from the first '(' to end
    when(p > 0,
      regexp_replace(regexp_replace(rest, "\\([0-9]+\\)", "."), "^\\.|\\.$", ""))
      .otherwise(lit(null))
  }
}
