package graft.miw

import com.fasterxml.jackson.core.json.JsonReadFeature
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** String-match spec for a field (reference: miw/log_definition.proto:24-31).
  *
  * Semantics (from miw/log_format.cc:277-399 and the golden tests):
  *  - positive exact: keep row iff token is a member of the term set
  *  - positive substring ("and" logic or key field): keep iff token
  *    contains every term
  *  - positive substring "or": row survives iff at least one or-field
  *    matched (checked after the field loop, log_format.cc:566-568)
  *  - negative exact: drop row iff token is a member of the term set
  *  - negative substring: drop iff token equals a term or contains one
  */
final case class MatchSpec(
    matchStr: Option[String],
    matchFile: Option[String],
    logic: String,      // "and" | "or" | "" (empty behaves like "and" on key fields)
    negative: Boolean,
    exact: Boolean)

/** One field of a log format (reference: miw/log_definition.proto:33-57). */
final case class FieldSpec(
    name: String,
    pos: Int, // -1 = auto-increment from previous field (log_format.cc:247-257)
    ftype: String, // int | string | bool | float | date | time | url
    key: Boolean,
    aggregated: Boolean,
    aggregation: String, // count | sum | max | mean | variance | union | union_count | ratio | ""
    processing: String,  // day | month | year | hour | minute | second | ""
    processingOffset: Int,
    preprocessing: String, // evtxcsv | evtxcsv2 | microsoftdnslogs | ""
    dateFormat: String,    // strptime format, or "unix" (default %m/%d/%Y, proto:50)
    urlFormat: String,     // %scheme://%host%port default (proto:54)
    filter: String,
    filterType: String,    // "contain" -> derived 1/0 indicator summed per group
    matchSpec: Option[MatchSpec],
    numerator: String,     // for ratio
    denominator: String)   // for ratio; may be the literal "logs"

/** A parsed log format (reference dialect: the JSON files under miw/formats/).
  *
  * Parsed directly from the reference's JSON dialect (the protobuf .fmt
  * step is an offline artifact we skip). Tolerates the dialect's quirks:
  * trailing commas (anon_bluecoat_format.json) and string-typed "pos"
  * values (MicrosoftDNSlogs.json).
  */
final case class LogFormat(
    formatName: String,
    delims: String,
    quotechar: String,
    commentchar: String,
    appname: String,
    fields: Vector[FieldSpec],
    /** Directory the format JSON was loaded from; match_file paths
      * resolve against it (and its ancestors — the reference resolves
      * them against the invoking binary's cwd, so shipped formats use
      * paths like "../data/tests/x.txt"). */
    sourceDir: Option[String] = None) {

  /** Fields with positions resolved exactly like the reference parse loop
    * (log_format.cc:247-257): `-1` takes previous-auto + 1; explicit
    * positions don't advance the auto counter except for ratio fields,
    * which reset it to their own pos. */
  lazy val resolvedFields: Vector[FieldSpec] = {
    var auto = -1
    fields.map { f =>
      if (f.pos == -1) {
        auto += 1
        f.copy(pos = auto)
      } else {
        if (f.aggregation == "ratio") auto = f.pos
        f
      }
    }
  }

  /** Highest token index any field reads; rows with fewer tokens are
    * dropped (row-bounds guard, log_format.cc:258-262). */
  lazy val maxPos: Int =
    resolvedFields.filterNot(_.aggregation == "ratio").map(_.pos).foldLeft(0)(math.max)
}

object LogFormat {

  private val mapper = new ObjectMapper()
  mapper.configure(JsonReadFeature.ALLOW_TRAILING_COMMA.mappedFeature(), true)
  mapper.configure(JsonReadFeature.ALLOW_JAVA_COMMENTS.mappedFeature(), true)

  def parse(json: String): LogFormat = {
    val root = mapper.readTree(json)
    def str(n: JsonNode, field: String, dflt: String = ""): String = {
      val v = n.get(field)
      if (v == null || v.isNull) dflt else v.asText()
    }
    def int(n: JsonNode, field: String, dflt: Int): Int = {
      val v = n.get(field)
      if (v == null || v.isNull) dflt
      else if (v.isTextual) v.asText().trim.toIntOption.getOrElse(dflt)
      else v.asInt(dflt)
    }
    def bool(n: JsonNode, field: String): Boolean = {
      val v = n.get(field)
      v != null && !v.isNull && v.asBoolean(false)
    }
    val fields = Option(root.get("fields")).map(_.elements().asScala.toVector)
      .getOrElse(Vector.empty)
      .map { fn =>
        val m = Option(fn.get("match")).filter(!_.isNull).map { mn =>
          MatchSpec(
            matchStr = Option(str(mn, "match_str")).filter(_.nonEmpty),
            matchFile = Option(str(mn, "match_file")).filter(_.nonEmpty),
            logic = str(mn, "logic"),
            negative = bool(mn, "negative"),
            exact = bool(mn, "exact"))
        }
        FieldSpec(
          name = str(fn, "name"),
          pos = int(fn, "pos", -1),
          ftype = str(fn, "type", "string"),
          key = bool(fn, "key"),
          aggregated = bool(fn, "aggregated"),
          aggregation = str(fn, "aggregation"),
          processing = str(fn, "processing"),
          processingOffset = math.max(1, int(fn, "processing_offset", 1)),
          preprocessing = str(fn, "preprocessing"),
          dateFormat = str(fn, "date_format", "%m/%d/%Y"),
          urlFormat = str(fn, "url_format", "%scheme://%host%port"),
          filter = str(fn, "filter"),
          filterType = str(fn, "filter_type"),
          matchSpec = m,
          numerator = str(fn, "numerator"),
          denominator = str(fn, "denominator"))
      }
    LogFormat(
      formatName = str(root, "format_name"),
      delims = str(root, "delims", ","),
      quotechar = str(root, "quotechar"),
      commentchar = str(root, "commentchar"),
      appname = str(root, "appname"),
      fields = fields)
  }

  /** Reads a format file. The reference CLI takes `-format_name`
    * WITHOUT an extension and appends FMT_EXT itself
    * (miw/log_format.cc:62-64); mirror that by falling back to
    * `<path>.json` when the literal path doesn't exist. */
  def parseFile(path: String): LogFormat = {
    val f0 = new java.io.File(path)
    val f = if (f0.exists()) f0 else new java.io.File(path + ".json")
    parse(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
      .copy(sourceDir = Option(f.getAbsoluteFile.getParent))
  }

  /** Resolve a match_file dictionary path: as given, else relative to
    * the format's directory and each of its ancestors. */
  def resolveDict(path: String, sourceDir: Option[String]): String = {
    if (new java.io.File(path).exists()) return path
    sourceDir.flatMap { dir =>
      Iterator.iterate(new java.io.File(dir))(_.getParentFile)
        .takeWhile(_ != null)
        .map(a => new java.io.File(a, path))
        .find(_.exists())
        .map(_.getPath)
    }.getOrElse(path)
  }
}
