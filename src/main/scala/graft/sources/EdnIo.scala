package graft.sources

import java.io.InputStream
import java.time.{Instant, LocalDate}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** EDN read/write — pure-Scala reader, no deps.
  *
  * The reference's EDN path (reference src/tech/v3/dataset/io.clj:74-79,
  * 98-105) is `get-edn` → seq-of-maps → `mapseq->dataset`, and the writer is
  * the mapseq reader printed back out. Same shape here: the file holds one
  * top-level vector (or list) of maps; keyword keys become column names
  * (without the colon); values promote per column to the narrowest Spark
  * type (boolean → long → double → timestamp → string), mirroring the
  * reference's promotional parse chain (io/column_parsers.clj:310-345).
  *
  * Reader coverage: nil, booleans, longs (incl. `N` suffix), doubles (incl.
  * `M` suffix), strings with escapes, chars, keywords, symbols, vectors,
  * lists, maps, sets, `#inst` (→ timestamp), `#uuid` (→ string), `#_`
  * discard, `;` comments, commas-as-whitespace, arbitrary tagged literals
  * (tag dropped, value kept — EDN spec's default-reader behavior).
  *
  * Scale contract: EDN is a config/interchange text format, parsed
  * driver-side like the reference (single `get-edn` call). Many-file
  * corpora should land in parquet on first touch; this is the same guidance
  * the reference gives for its text formats.
  */
object EdnIo {

  // ---------------------------------------------------------------- parser

  final class EdnParseException(msg: String, pos: Int)
    extends RuntimeException(s"$msg (at offset $pos)")

  /** Sentinel for `#_` discards so collection builders can drop them. */
  private object Discarded

  private final class Parser(s: String) {
    private var i = 0

    private def die(msg: String): Nothing = throw new EdnParseException(msg, i)

    private def skipWs(): Unit = {
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (c == ';') { while (i < s.length && s.charAt(i) != '\n') i += 1 }
        else if (c.isWhitespace || c == ',') i += 1
        else go = false
      }
    }

    def atEnd: Boolean = { skipWs(); i >= s.length }

    /** Next non-discarded form. */
    def next(): Any = {
      var v: Any = Discarded
      while (v.asInstanceOf[AnyRef] eq Discarded) v = nextRaw()
      v
    }

    private def nextRaw(): Any = {
      skipWs()
      if (i >= s.length) die("unexpected end of input")
      s.charAt(i) match {
        case '{' => i += 1; parseMap()
        case '[' => i += 1; parseSeq(']').toVector
        case '(' => i += 1; parseSeq(')').toList
        case '"' => i += 1; parseString()
        case '\\' => i += 1; parseChar()
        case ':' => i += 1; parseName() // keyword → name sans colon
        case '#' => parseDispatch()
        case c if c.isDigit => parseNumber()
        // a sign starts a number ONLY when a digit follows — bare '-',
        // '->', '+foo' are symbols per the EDN grammar
        case c if (c == '-' || c == '+') &&
                  i + 1 < s.length && s.charAt(i + 1).isDigit =>
          parseNumber()
        case _ =>
          val sym = parseName()
          sym match {
            case "nil" => null
            case "true" => true
            case "false" => false
            case other => other // symbol → its print name
          }
      }
    }

    private def parseDispatch(): Any = {
      i += 1 // past '#'
      if (i >= s.length) die("dangling #")
      s.charAt(i) match {
        case '{' => i += 1; parseSeq('}').toSet
        case '_' => i += 1; next(); Discarded
        case _ =>
          val tag = parseName()
          val v = next()
          tag match {
            case "inst" => v match {
              case str: String =>
                java.sql.Timestamp.from(parseInstant(str))
              case other => die(s"#inst expects a string, got $other")
            }
            case "uuid" => v match {
              case str: String => str
              case other => die(s"#uuid expects a string, got $other")
            }
            case _ => v // unknown tag: keep the wrapped value
          }
      }
    }

    private def parseMap(): Map[Any, Any] = {
      val buf = Vector.newBuilder[Any]
      skipWs()
      while (i < s.length && s.charAt(i) != '}') {
        val v = nextRaw()
        if (v.asInstanceOf[AnyRef] ne Discarded) buf += v
        skipWs()
      }
      if (i >= s.length) die("unterminated map")
      i += 1
      val items = buf.result()
      if (items.length % 2 != 0) die("map literal with odd form count")
      // VectorMap keeps insertion order — column order must follow key
      // order of first appearance (reference mapseq->dataset contract)
      scala.collection.immutable.VectorMap.from(
        items.grouped(2).map(p => p(0) -> p(1)))
    }

    private def parseSeq(close: Char): Vector[Any] = {
      val buf = Vector.newBuilder[Any]
      skipWs()
      while (i < s.length && s.charAt(i) != close) {
        val v = nextRaw()
        if (v.asInstanceOf[AnyRef] ne Discarded) buf += v
        skipWs()
      }
      if (i >= s.length) die(s"unterminated sequence (expected '$close')")
      i += 1
      buf.result()
    }

    private def parseString(): String = {
      val sb = new java.lang.StringBuilder()
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) die("dangling escape")
          s.charAt(i) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case '\\' => sb.append('\\')
            case '"' => sb.append('"')
            case 'u' =>
              if (i + 4 >= s.length) die("truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => die(s"unknown escape \\$other")
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) die("unterminated string")
      i += 1
      sb.toString
    }

    private def parseChar(): String = {
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
             !"()[]{}\",;".contains(s.charAt(i))) i += 1
      s.substring(start, i) match {
        case "newline" => "\n"
        case "space" => " "
        case "tab" => "\t"
        case "return" => "\r"
        case "backspace" => "\b"
        case "formfeed" => "\f"
        case one if one.length == 1 => one
        case u if u.startsWith("u") && u.length == 5 =>
          Integer.parseInt(u.drop(1), 16).toChar.toString
        case other => die(s"unreadable char literal \\$other")
      }
    }

    private def parseName(): String = {
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
             !"()[]{}\",;".contains(s.charAt(i)) && s.charAt(i) != '#') i += 1
      if (i == start) die("empty name")
      s.substring(start, i)
    }

    private def parseNumber(): Any = {
      val start = i
      if (s.charAt(i) == '-' || s.charAt(i) == '+') i += 1
      var isFloat = false
      while (i < s.length &&
             (s.charAt(i).isDigit || ".eE+-".contains(s.charAt(i)))) {
        val c = s.charAt(i)
        if (c == '.' || c == 'e' || c == 'E') isFloat = true
        // '+'/'-' only valid right after an exponent marker
        if ((c == '+' || c == '-') &&
            !(s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')) {
          if (i == start) i += 1 // leading sign already consumed above
          else return finishNumber(start, isFloat)
        } else i += 1
      }
      finishNumber(start, isFloat)
    }

    private def finishNumber(start: Int, isFloat0: Boolean): Any = {
      var isFloat = isFloat0
      var text = s.substring(start, i)
      if (i < s.length && (s.charAt(i) == 'N' || s.charAt(i) == 'M')) {
        if (s.charAt(i) == 'M') isFloat = true
        i += 1
      }
      if (text.startsWith("+")) text = text.drop(1)
      if (isFloat) text.toDouble
      else
        try text.toLong
        catch { case _: NumberFormatException => BigDecimal(text).toDouble }
    }
  }

  /** RFC-3339 with optional offset — `#inst` bodies. EDN permits
    * reduced-accuracy forms ("2021", "2021-01", "2021-01-01",
    * "2021-01-01T12:30"); missing fields pad like Clojure's reader. */
  private def parseInstant(str: String): Instant = {
    var t = str.trim
    // pad reduced date forms up to a full date
    if (t.matches("\\d{4}")) t += "-01-01"
    else if (t.matches("\\d{4}-\\d{2}")) t += "-01"
    if (t.matches("\\d{4}-\\d{2}-\\d{2}")) t += "T00:00:00"
    else if (t.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}")) t += ":00"
    val withZone =
      if (t.endsWith("Z") || t.lastIndexOf('+') > 9 ||
          t.lastIndexOf('-') > 9) t
      else t + "Z"
    try Instant.parse(withZone)
    catch {
      case _: Exception =>
        try java.time.OffsetDateTime.parse(t).toInstant
        catch {
          case e: Exception =>
            throw new IllegalArgumentException(
              s"""unreadable #inst "$str"""", e)
        }
    }
  }

  /** Parse every top-level form in an EDN document. */
  private[graft] def parseAll(text: String): Vector[Any] = {
    val p = new Parser(text)
    val out = Vector.newBuilder[Any]
    while (!p.atEnd) out += p.next()
    out.result()
  }

  // ---------------------------------------------------------------- read

  private def slurp(in: InputStream): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var r = in.read(buf)
    while (r >= 0) { bos.write(buf, 0, r); r = in.read(buf) }
    new String(bos.toByteArray, "UTF-8")
  }

  /** Read an EDN file holding a seq of maps into a typed DataFrame.
    * `.gz` paths decompress transparently (the reference's `:gzipped?`,
    * io.clj:76). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw: java.io.InputStream = fs.open(p)
    val in =
      if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw
    val text = try slurp(in) finally in.close()
    fromEdnString(spark, text)
  }

  /** Same as [[read]] from an in-memory document. */
  def fromEdnString(spark: SparkSession, text: String): DataFrame = {
    val forms = parseAll(text)
    val maps: Vector[Map[Any, Any]] = forms match {
      case Vector(seq: Vector[_]) => seq.map(asMap).toVector
      case Vector(seq: List[_]) => seq.map(asMap).toVector
      case ms => ms.map(asMap) // bare stream of top-level maps
    }
    mapsToDataFrame(spark, maps)
  }

  private def asMap(v: Any): Map[Any, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]]
    case other =>
      throw new IllegalArgumentException(
        s"EDN dataset rows must be maps, got: $other")
  }

  private def mapsToDataFrame(spark: SparkSession,
                              maps0: Vector[Map[Any, Any]]): DataFrame = {
    if (maps0.isEmpty) return spark.emptyDataFrame
    // normalize keys to strings ONCE (numeric/keyword keys both name
    // columns); keeps row building O(rows·cols) hash lookups instead of
    // O(rows·cols·width) collectFirst scans. First occurrence wins when
    // two distinct keys stringify identically (e.g. 1 and "1").
    val maps: Vector[Map[String, Any]] =
      maps0.map(m => m.iterator.foldLeft(
        scala.collection.immutable.VectorMap.empty[String, Any]) {
        case (acc, (k, v)) =>
          val ks = k.toString
          if (acc.contains(ks)) acc else acc.updated(ks, v)
      })
    // column order = first appearance across the whole mapseq
    val names = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      maps.foreach(_.keysIterator.foreach(seen += _))
      seen.toVector
    }
    def colType(c: String): DataType = {
      var sawBool, sawLong, sawDouble, sawStr, sawTs, sawSeq = false
      var lo = Long.MaxValue; var hi = Long.MinValue
      var elemDouble = false; var elemStr = false
      maps.foreach { m =>
        m.get(c) match {
          case None | Some(null) =>
          case Some(_: Boolean) => sawBool = true
          case Some(l: Long) =>
            sawLong = true; if (l < lo) lo = l; if (l > hi) hi = l
          case Some(_: Double) => sawDouble = true
          case Some(_: java.sql.Timestamp) => sawTs = true
          case Some(xs: Seq[_]) =>
            sawSeq = true
            xs.foreach {
              case _: Double => elemDouble = true
              case _: Long =>
              case _ => elemStr = true
            }
          case Some(_) => sawStr = true
        }
      }
      val kinds = Seq(sawBool, sawLong || sawDouble, sawStr, sawTs, sawSeq)
        .count(identity)
      if (kinds == 0) StringType
      else if (kinds > 1) StringType
      else if (sawBool) BooleanType
      else if (sawSeq) ArrayType(
        if (elemStr) StringType else if (elemDouble) DoubleType else LongType)
      else if (sawTs) TimestampType
      else if (sawStr) StringType
      else if (sawDouble) DoubleType
      else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
      else LongType
    }
    val types = names.map(colType)
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    def conv(v: Any, t: DataType): Any = (v, t) match {
      case (null, _) => null
      case (l: Long, IntegerType) => l.toInt
      case (l: Long, LongType) => l
      case (l: Long, DoubleType) => l.toDouble
      case (d: Double, DoubleType) => d
      case (xs: Seq[_], ArrayType(et, _)) =>
        xs.map(x => conv(x, et))
      case (x, StringType) => ednString(x)
      case (x, _) => x
    }
    val rows = new java.util.ArrayList[Row](maps.length)
    maps.foreach { m =>
      rows.add(Row.fromSeq(names.indices.map { i =>
        conv(m.getOrElse(names(i), null), types(i))
      }))
    }
    spark.createDataFrame(rows, schema)
  }

  // ---------------------------------------------------------------- write

  /** EDN rendering of one value (also the mixed-column stringification). */
  private def ednString(v: Any): String = v match {
    case null => "nil"
    case s: String => s
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double => d.toString
    case xs: Seq[_] => xs.map(ednLiteral).mkString("[", " ", "]")
    case other => other.toString
  }

  private val KeywordSafe = "^[A-Za-z_*+!?<>=.-][A-Za-z0-9_*+!?<>=.-]*$".r

  private def ednKey(name: String): String =
    if (KeywordSafe.matches(name)) s":$name" else ednLiteral(name)

  private def ednLiteral(v: Any): String = v match {
    case null => "nil"
    case s: String =>
      val sb = new java.lang.StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\t' => sb.append("\\t")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      sb.append('"').toString
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case ts: java.sql.Timestamp =>
      s"""#inst "${ts.toInstant}""""
    case d: java.sql.Date =>
      s"""#inst "${d.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC).toInstant}""""
    case xs: Seq[_] => xs.map(ednLiteral).mkString("[", " ", "]")
    case other => ednLiteral(other.toString)
  }

  /** Test hook: the escaped EDN literal for a value. */
  private[graft] def ednLiteralForTest(v: Any): String = ednLiteral(v)

  /** Write a DataFrame as one EDN vector of maps (nil-valued keys omitted,
    * like the reference's mapseq reader). Streams via toLocalIterator. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = fs.create(p, true)
    val out: java.io.OutputStream =
      if (path.endsWith(".gz")) new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      else raw
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(out, "UTF-8"), 1 << 16)
    try {
      val fields = df.schema.fields
      val keys = fields.map(f => ednKey(f.name))
      w.write("[")
      val it = df.toLocalIterator()
      var first = true
      while (it.hasNext) {
        val row = it.next()
        if (!first) w.write("\n ")
        first = false
        val parts = fields.indices.flatMap { i =>
          val v = row.get(i)
          if (v == null) None
          else Some(s"${keys(i)} ${ednLiteral(v match {
            case s: scala.collection.Seq[_] => s.toSeq
            case other => other
          })}")
        }
        w.write(parts.mkString("{", ", ", "}"))
      }
      w.write("]\n")
    } finally w.close()
  }
}
