package graft.miw

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** Reference-compatible sinks (SURVEY §2.2): JSON-lines, CSV, and
  * plain-text renderings of an aggregation result.
  *
  * All three are `DataFrame → Dataset[String]` transformations — the
  * formatting runs distributed (one string per group row) and the
  * caller picks the write target (`.write.text`, collect, console).
  *
  * Formatting contracts lifted from the reference:
  *  - JSON: jsoncpp FastWriter — keys in ALPHABETICAL order (jsoncpp
  *    stores objects in a std::map), doubles printed as C "%.17g"
  *    (the golden tests depend on it: `"var":1.8666666666666671`,
  *    `"v2":17`), strings escaped, arrays inline
  *    (miw/mr_job.cc:118-145, miw/log_record.cc:649-679).
  *  - CSV: field order = the JSON's alphabetical order; strings
  *    quoted; arrays rendered `"[a,b]"` with the separator stripped
  *    from values; doubles at ostream default precision (C "%g", 6
  *    significant digits); optional header line
  *    (miw/log_record.cc:681-745).
  *  - text: `key - count` lines (miw/mr_job.cc:109-116).
  */
object Output {

  /** C printf("%.Ng") double formatting: N significant digits from
    * the EXACT binary expansion of the double (what C rounds from),
    * trailing zeros stripped, C-style exponent form when the decimal
    * exponent is < -4 or >= N. Java's %g is NOT equivalent — it
    * rounds the shortest string representation (so 0.5714285969734192
    * would print "…4192" instead of C's "…41919"), and keeps trailing
    * zeros. The golden tests depend on the C behavior. */
  def formatG(d: Double, sig: Int): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return "0"
    def strip(s: String): String =
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else s
    val bd = new java.math.BigDecimal(d)
      .round(new java.math.MathContext(sig, java.math.RoundingMode.HALF_EVEN))
    val exp = bd.precision - bd.scale - 1 // floor(log10(|d|)) after rounding
    if (exp < -4 || exp >= sig) {
      val mant = strip(bd.movePointLeft(exp).toPlainString)
      val sign = if (exp < 0) "-" else "+"
      f"${mant}e$sign${math.abs(exp)}%02d"
    } else strip(bd.toPlainString)
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def jsonScalar(v: Any, dt: DataType): String = (v, dt) match {
    case (null, _) => "null"
    case (s: String, _) => "\"" + jsonEscape(s) + "\""
    case (d: Double, _) => formatG(d, 17)
    case (f: Float, _) => formatG(f.toDouble, 17)
    case (b: Boolean, _) => if (b) "true" else "false"
    case (x, _) => x.toString
  }

  private def jsonValue(v: Any, dt: DataType): String = dt match {
    case ArrayType(et, _) if v != null =>
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(e => jsonScalar(e, et)).mkString("[", ",", "]")
    case _ => jsonScalar(v, dt)
  }

  /** One jsoncpp-FastWriter-style JSON object per row, keys sorted. */
  def jsonLines(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields.zipWithIndex
      .sortBy(_._1.name).toSeq // jsoncpp: std::map key order
    df.map { row: Row =>
      fields.map { case (f, i) =>
        "\"" + jsonEscape(f.name) + "\":" + jsonValue(row.get(i), f.dataType)
      }.mkString("{", ",", "}")
    }
  }

  private def csvScalar(v: Any, dt: DataType): String = v match {
    case null => ""
    case d: Double => formatG(d, 6)
    case f: Float => formatG(f.toDouble, 6)
    case b: Boolean => if (b) "1" else "0" // C++ ostream << bool
    case x => x.toString
  }

  /** Reference CSV rendering; `header=true` prepends the column line
    * (done by the caller on the first file — a driver-side concern). */
  def csvLines(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields.zipWithIndex
      .sortBy(_._1.name).toSeq
    df.map { row: Row =>
      fields.map { case (f, i) =>
        val v = row.get(i)
        f.dataType match {
          case _ if f.name == "logs" => String.valueOf(v) // bare int
          case ArrayType(et, _) =>
            val body =
              if (v == null) ""
              else v.asInstanceOf[scala.collection.Seq[Any]]
                .map(e => csvScalar(e, et).replace(",", "")) // strip separator
                .mkString(",")
            "\"[" + body + "]\""
          case StringType => "\"" + String.valueOf(v) + "\""
          case _ => csvScalar(v, f.dataType)
        }
      }.mkString(",")
    }
  }

  /** Alphabetical header line matching csvLines field order. */
  def csvHeader(df: DataFrame): String =
    df.schema.fields.map(_.name).sorted.mkString(",")

  /** `key - count` lines (plain output format). */
  def textLines(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("id")
    val logsIdx = df.schema.fieldIndex("logs")
    df.map(row => s"${row.get(idIdx)} - ${row.get(logsIdx)}")
  }
}
