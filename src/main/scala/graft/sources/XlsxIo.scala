package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JVM xlsx (OOXML spreadsheet) read/write — no external deps.
  *
  * The reference reads workbooks via fastexcel/POI (reference
  * src/tech/v3/libs/fastexcel.clj:1-200, libs/poi.clj) with these semantics,
  * reproduced here and pinned by XlsxIoSpec against the reference's own
  * fixture files (reference test/tech/v3/libs/fastexcel_test.clj):
  *   - first row is the header by default; a missing header cell at position
  *     i names the column "column-i"; width = max cell column seen, counted
  *     from column A regardless of the sheet's dimension ref;
  *   - sparse rows/cells (absent `r` positions) become missing values;
  *   - per-column narrowing: an all-number column whose values are integral
  *     lands as the narrowest integer type (int8/int16/int32/int64), else
  *     float64; mixed-type columns degrade to string;
  *   - number cells styled with a date numFmt decode via the 1900 epoch
  *     (Excel leap-bug convention) to date (no time part in the format and
  *     an integral serial) or timestamp;
  *   - duplicate headers throw unless `ensureUnique` is set, in which case
  *     every duplicated occurrence is renamed by `uniqueNameFn(colIdx, name)`
  *     (default `name-idx`) — fastexcel_test.clj:75-95;
  *   - `skipRows` drops N physical sheet rows before the header
  *     (`:n-initial-skip-rows`, fastexcel_test.clj:55-72).
  *
  * Scale contract: one .xlsx is bounded by the format at 2^20 rows and is a
  * zip (non-splittable), so a single workbook parses in one JVM — same as
  * the reference. Many-file corpora go through [[readDistributed]]: one task
  * per workbook via binaryFiles, unified to string cells + promotional
  * inference, so 10k workbooks parse with 10k-way parallelism and the
  * per-file memory bound is one decompressed sheet.
  */
object XlsxIo {

  case class XlsxOptions(
      sheet: Int = 0,
      headerRow: Boolean = true,
      skipRows: Int = 0,
      ensureUnique: Boolean = false,
      uniqueNameFn: (Int, String) => String = (i, n) => s"$n-$i",
      /** Per-column parse overrides (the reference's `:parser-fn`): target
        * Spark types; strings parse with ISO and "MMM d yyyy" fallbacks. */
      parserFn: Map[String, DataType] = Map.empty)

  // ---------------------------------------------------------------- model

  /** One parsed cell: 0-based row/col, value is String | Double | Boolean |
    * java.sql.Date | java.sql.Timestamp | null. */
  private[sources] final case class Cell(row: Int, col: Int, value: Any)

  private[sources] final case class SheetData(name: String, cells: Vector[Cell],
                                     maxRow: Int, maxCol: Int)

  // ------------------------------------------------------------- zip + xml

  private def readZipEntries(in: InputStream): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(in)
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val n = e.getName
          if (n == "[Content_Types].xml" || n.startsWith("xl/")) {
            val bos = new ByteArrayOutputStream()
            val buf = new Array[Byte](65536)
            var r = zin.read(buf)
            while (r >= 0) { bos.write(buf, 0, r); r = zin.read(buf) }
            out += (n -> bos.toByteArray)
          }
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  private def xmlReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Collect the concatenated text of all <t> descendants of each <si>. */
  private def parseSharedStrings(bytes: Option[Array[Byte]]): Vector[String] = {
    bytes match {
      case None => Vector.empty
      case Some(b) =>
        val r = xmlReader(b)
        val out = Vector.newBuilder[String]
        var cur: java.lang.StringBuilder = null
        var inT = false
        var phonetic = 0 // <rPh> furigana runs must NOT join the string
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => cur = new java.lang.StringBuilder(); phonetic = 0
                case "rPh" => phonetic += 1
                case "t" if cur != null && phonetic == 0 => inT = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              if (inT) cur.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t" => inT = false
                case "rPh" => phonetic -= 1
                case "si" => out += cur.toString; cur = null
                case _ =>
              }
            case _ =>
          }
        }
        r.close()
        out.result()
    }
  }

  /** Builtin date numFmt ids per ECMA-376 §18.8.30. */
  private[sources] val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Format code minus bracketed sections (`[$-en-US]`, colors), quoted
    * literals, and backslash escapes — the part that carries date/time
    * tokens. */
  private[sources] def stripFormatCode(code: String): String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < code.length) {
      code.charAt(i) match {
        case '[' =>
          val j = code.indexOf(']', i); i = if (j < 0) code.length else j + 1
        case '"' =>
          val j = code.indexOf('"', i + 1); i = if (j < 0) code.length else j + 1
        case '\\' => i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString.toLowerCase
  }

  /** A custom format code denotes a date iff its stripped form contains a
    * y/m/d/h/s token. */
  private[graft] def isDateFormatCode(code: String): Boolean =
    stripFormatCode(code).exists(c =>
      c == 'y' || c == 'd' || c == 'h' || c == 's' || c == 'm')

  /** …and carries a TIME component iff the stripped form has h or s (a
    * quoted literal or locale prefix like `[$-en-US]` must not count —
    * `[$-en-US]mmmm d, yyyy` is date-only). */
  private[graft] def hasTimeFormatCode(code: String): Boolean = {
    val s = stripFormatCode(code)
    s.contains('h') || s.contains('s')
  }

  /** Builtin time-bearing numFmt ids: 18-22 (h:mm…), 45-47 (mm:ss…). */
  private[sources] val BuiltinTimeFmts: Set[Int] =
    ((18 to 22) ++ (45 to 47)).toSet

  /** Shared style→(isDate, hasTime) classifiers for both spreadsheet
    * containers (xlsx styles.xml and xls FORMAT/XF records). */
  private[sources] def styleClassifiers(
      xfFmtIds: IndexedSeq[Int],
      customFmts: collection.Map[Int, String]): (Int => Boolean, Int => Boolean) = {
    def fmtId(style: Int): Int =
      if (style >= 0 && style < xfFmtIds.length) xfFmtIds(style) else 0
    val isDate = (style: Int) => {
      val id = fmtId(style)
      BuiltinDateFmts.contains(id) ||
        customFmts.get(id).exists(isDateFormatCode)
    }
    val hasTime = (style: Int) => {
      val id = fmtId(style)
      BuiltinTimeFmts.contains(id) ||
        customFmts.get(id).exists(hasTimeFormatCode)
    }
    (isDate, hasTime)
  }

  /** `(isDate(styleIdx), hasTimePart(styleIdx))` lookups from styles.xml. */
  private def parseStyles(bytes: Option[Array[Byte]]): (Int => Boolean, Int => Boolean) = {
    bytes match {
      case None => (_ => false, _ => false)
      case Some(b) =>
        val r = xmlReader(b)
        val customFmts = scala.collection.mutable.Map[Int, String]()
        val xfFmtIds = Vector.newBuilder[Int]
        var inCellXfs = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "numFmt" =>
                  val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
                  val code = Option(r.getAttributeValue(null, "formatCode"))
                  for (i <- id; c <- code) customFmts(i) = c
                case "cellXfs" => inCellXfs = true
                case "xf" if inCellXfs =>
                  xfFmtIds += Option(r.getAttributeValue(null, "numFmtId"))
                    .map(_.toInt).getOrElse(0)
                case _ =>
              }
            case XMLStreamConstants.END_ELEMENT =>
              if (r.getLocalName == "cellXfs") inCellXfs = false
            case _ =>
          }
        }
        r.close()
        styleClassifiers(xfFmtIds.result(), customFmts)
    }
  }

  /** Sheet name → worksheet zip path, in workbook order, via the rels part. */
  private def sheetTargets(entries: Map[String, Array[Byte]]): Vector[(String, String)] = {
    val rels: Map[String, String] = entries.get("xl/_rels/workbook.xml.rels") match {
      case None => Map.empty
      case Some(b) =>
        val r = xmlReader(b)
        val m = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val tgt = r.getAttributeValue(null, "Target")
            if (id != null && tgt != null)
              m += (id -> (if (tgt.startsWith("/")) tgt.drop(1)
                           else "xl/" + tgt.stripPrefix("./")))
          }
        }
        r.close(); m.result()
    }
    entries.get("xl/workbook.xml") match {
      case None => Vector.empty
      case Some(b) =>
        val r = xmlReader(b)
        val out = Vector.newBuilder[(String, String)]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "sheet") {
            val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue).getOrElse("")
            rels.get(rid).foreach(t => out += (name -> t))
          }
        }
        r.close(); out.result()
    }
  }

  /** "BC23" → (rowIdx0=22, colIdx0=54). */
  private[sources] def parseCellRef(ref: String): (Int, Int) = {
    var i = 0
    var col = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      col = col * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    val row = if (i < ref.length) ref.substring(i).toInt else 1
    (row - 1, col - 1)
  }

  /** Excel 1900-epoch serial → LocalDateTime, honoring the leap-bug
    * convention (serial 1 = 1900-01-01; serials ≥ 61 use epoch 1899-12-30
    * so post-Feb-1900 dates are calendar-correct). */
  private[sources] def serialToDateTime(serial: Double): LocalDateTime = {
    val days0 = math.floor(serial).toLong
    // serial 1 = 1900-01-01 (epoch 1899-12-31); serials ≥ 61 use epoch
    // 1899-12-30 so post-Feb-1900 dates are calendar-correct despite the
    // phantom 1900-02-29 at serial 60
    val date =
      if (days0 >= 61) LocalDate.of(1899, 12, 30).plusDays(days0)
      else LocalDate.of(1899, 12, 31).plusDays(days0)
    val frac = serial - days0
    // micros, not millis: Spark timestamps carry microsecond precision and
    // the writer emits full-precision serials — rounding to millis here
    // would silently lose sub-millisecond digits on a write→read round-trip
    val micros = math.round(frac * 86400e6)
    date.atStartOfDay().plusNanos(micros * 1000L)
  }

  private[sources] def dateTimeToSerial(dt: LocalDateTime): Double = {
    val days = java.time.temporal.ChronoUnit.DAYS
      .between(LocalDate.of(1899, 12, 30), dt.toLocalDate)
    val adj = if (days >= 61) days else days - 1
    val frac = dt.toLocalTime.toNanoOfDay / 86400.0e9
    adj + frac
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String],
                         isDateStyle: Int => Boolean,
                         hasTimeStyle: Int => Boolean,
                         name: String): SheetData = {
    val r = xmlReader(bytes)
    val cells = Vector.newBuilder[Cell]
    var maxRow = -1; var maxCol = -1
    var curRow = -1
    var cellRow = -1; var cellCol = -1; var cellT = "n"; var cellS = -1
    var inV = false; var inIs = false; var inIsT = false; var sawF = false
    var vBuf: java.lang.StringBuilder = null
    var isBuf: java.lang.StringBuilder = null
    var lastColInRow = -1

    def emit(): Unit = {
      if (cellRow >= 0 && cellCol >= 0) {
        val raw = if (vBuf == null) null else vBuf.toString
        val value: Any = cellT match {
          case "s" =>
            if (raw == null) null
            else shared.lift(raw.trim.toInt).orNull
          case "b" => if (raw == null) null else raw.trim == "1"
          case "e" => null
          case "str" => raw
          case "inlineStr" => if (isBuf == null) null else isBuf.toString
          case _ => // "n" or absent
            if (raw == null || raw.trim.isEmpty) null
            else {
              val d = raw.trim.toDouble
              if (isDateStyle(cellS)) {
                val ldt = serialToDateTime(d)
                if (!hasTimeStyle(cellS) && ldt.toLocalTime.toNanoOfDay == 0L)
                  java.sql.Date.valueOf(ldt.toLocalDate)
                else java.sql.Timestamp.valueOf(ldt)
              } else d
            }
        }
        // a present-but-empty cell widens the sheet's COLUMNS (holdings
        // fixture: styled header column with no data → "column-8"), but
        // only a real value extends the ROW range — styled-empty trailing
        // rows (stocks-with-dates writes 439 of them) are not data
        if (cellCol > maxCol) maxCol = cellCol
        if (value != null) {
          if (cellRow > maxRow) maxRow = cellRow
          cells += Cell(cellRow, cellCol, value)
        }
      }
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              curRow = Option(r.getAttributeValue(null, "r"))
                .map(_.toInt - 1).getOrElse(curRow + 1)
              lastColInRow = -1
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              val (rr, cc) = ref.map(parseCellRef)
                .getOrElse((curRow, lastColInRow + 1))
              cellRow = rr; cellCol = cc; lastColInRow = cc
              cellT = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellS = Option(r.getAttributeValue(null, "s"))
                .map(_.toInt).getOrElse(-1)
              vBuf = null; isBuf = null; sawF = false
            case "v" => inV = true; vBuf = new java.lang.StringBuilder()
            case "f" => sawF = true
            case "is" => inIs = true; isBuf = new java.lang.StringBuilder()
            case "t" if inIs => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV) vBuf.append(r.getText)
          else if (inIsT) isBuf.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "is" => inIs = false
            case "t" => inIsT = false
            case "c" => emit()
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    SheetData(name, cells.result(), maxRow, maxCol)
  }

  private def parseWorkbook(in: InputStream): Vector[SheetData] = {
    val entries = readZipEntries(in)
    val shared = parseSharedStrings(entries.get("xl/sharedStrings.xml"))
    val (isDate, hasTime) = parseStyles(entries.get("xl/styles.xml"))
    sheetTargets(entries).flatMap { case (name, target) =>
      entries.get(target).map(b => parseSheet(b, shared, isDate, hasTime, name))
    }
  }

  // -------------------------------------------------------- dataset build

  private[sources] def stringify(v: Any): String = v match {
    case null => null
    case d: Double =>
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case ts: java.sql.Timestamp => ts.toLocalDateTime.toString
    case dt: java.sql.Date => dt.toLocalDate.toString
    case other => other.toString
  }

  /** Header-cell naming keeps the raw rendering: a numeric header 0.0 names
    * the column "0.0" (fastexcel_test.clj:98-101 `number-colname`). */
  private def headerName(v: Any): String = v match {
    case null => null
    case d: Double => d.toString
    case other => stringify(other)
  }

  private[sources] def resolveNames(header: Array[Any], width: Int,
                           opts: XlsxOptions): Seq[String] = {
    val base = (0 until width).map { i =>
      val h = if (i < header.length) headerName(header(i)) else null
      if (h == null || h.isEmpty) s"column-$i" else h
    }
    val counts = base.groupBy(identity).map { case (k, v) => k -> v.size }
    if (counts.valuesIterator.forall(_ == 1)) base
    else if (!opts.ensureUnique)
      throw new RuntimeException(
        s"Duplicate column names: ${counts.filter(_._2 > 1).keys.mkString(", ")} " +
          "(pass ensureUnique = true to suffix them)")
    else {
      // suffix EVERY duplicated occurrence (fastexcel_test.clj:89-95), then
      // iterate: a suffixed name can collide with a pre-existing one
      var names = base
      var rounds = 0
      while (names.distinct.length != names.length && rounds < 8) {
        val c = names.groupBy(identity).map { case (k, v) => k -> v.size }
        names = names.zipWithIndex.map { case (n, i) =>
          if (c(n) > 1) opts.uniqueNameFn(i, n) else n
        }
        rounds += 1
      }
      require(names.distinct.length == names.length,
        s"uniqueNameFn failed to disambiguate headers: $names")
      names
    }
  }

  /** Narrowest Spark type for a column's observed cell values. */
  private[sources] def columnType(values: Iterator[Any]): DataType = {
    var sawBool, sawNum, sawStr, sawDate, sawTs = false
    var allIntegral = true
    var lo = Long.MaxValue; var hi = Long.MinValue
    var any = false
    values.foreach {
      case null =>
      case _: Boolean => sawBool = true; any = true
      case d: Double =>
        sawNum = true; any = true
        if (d == math.rint(d) && math.abs(d) <= Long.MaxValue.toDouble) {
          val l = d.toLong; if (l < lo) lo = l; if (l > hi) hi = l
        } else allIntegral = false
      case _: java.sql.Date => sawDate = true; any = true
      case _: java.sql.Timestamp => sawTs = true; any = true
      case _ => sawStr = true; any = true
    }
    val kinds = Seq(sawBool, sawNum, sawStr, sawDate || sawTs).count(identity)
    if (!any) StringType
    else if (kinds > 1) StringType
    else if (sawBool) BooleanType
    else if (sawStr) StringType
    else if (sawTs) TimestampType
    else if (sawDate) DateType
    else if (allIntegral) {
      if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
      else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
      else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
      else LongType
    } else DoubleType
  }

  private[sources] def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (d: Double, ByteType) => d.toByte
    case (d: Double, ShortType) => d.toShort
    case (d: Double, IntegerType) => d.toInt
    case (d: Double, LongType) => d.toLong
    case (d: Double, DoubleType) => d
    case (d: Double, FloatType) => d.toFloat
    case (d: Double, StringType) => stringify(d)
    case (d: java.sql.Date, TimestampType) =>
      java.sql.Timestamp.valueOf(d.toLocalDate.atStartOfDay())
    case (s: String, DateType) => java.sql.Date.valueOf(parseLocalDate(s))
    case (s: String, TimestampType) =>
      java.sql.Timestamp.valueOf(parseLocalDate(s).atStartOfDay())
    case (s: String, DoubleType) => s.trim.toDouble
    case (s: String, IntegerType) => s.trim.toDouble.toInt
    case (s: String, LongType) => s.trim.toDouble.toLong
    case (s: String, BooleanType) => s.trim.equalsIgnoreCase("true")
    case (b: Boolean, StringType) => b.toString
    case (x, StringType) => stringify(x)
    case (x, _) => x
  }

  private val DateFmts = Seq(
    java.time.format.DateTimeFormatter.ISO_LOCAL_DATE,
    java.time.format.DateTimeFormatter.ofPattern("MMM d yyyy",
      java.util.Locale.US),
    java.time.format.DateTimeFormatter.ofPattern("M/d/yyyy",
      java.util.Locale.US))

  private def parseLocalDate(s: String): LocalDate = {
    val t = s.trim
    DateFmts.iterator.flatMap { f =>
      try Some(LocalDate.parse(t, f)) catch { case _: Exception => None }
    }.nextOption().getOrElse(
      throw new IllegalArgumentException(s"unparseable date: $s"))
  }

  private[sources] def sheetToDataFrame(spark: SparkSession, sd: SheetData,
                               opts: XlsxOptions): DataFrame = {
    val skip = opts.skipRows
    val width = sd.maxCol + 1
    if (width <= 0 || sd.maxRow < skip)
      return spark.emptyDataFrame

    // dense grid over the used range (rows after skip)
    val nRowsAll = sd.maxRow + 1 - skip
    val grid = Array.fill[Any](nRowsAll, width)(null)
    sd.cells.foreach { c =>
      if (c.row >= skip) grid(c.row - skip)(c.col) = c.value
    }
    val (header, dataRows) =
      if (opts.headerRow && nRowsAll > 0) (grid(0), grid.drop(1))
      else (Array.empty[Any], grid)
    val names = resolveNames(header, width, opts)

    val types = (0 until width).map { i =>
      opts.parserFn.getOrElse(names(i),
        columnType(dataRows.iterator.map(_(i))))
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val rows: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](dataRows.length)
      dataRows.foreach { arr =>
        l.add(Row.fromSeq((0 until width).map(i => coerce(arr(i), types(i)))))
      }
      l
    }
    spark.createDataFrame(rows, schema)
  }

  // ---------------------------------------------------------------- read

  private def openPath(spark: SparkSession, path: String): InputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
  }

  /** Read one sheet of one workbook into a typed DataFrame (driver-side
    * parse — the format is single-file and ≤2^20 rows by construction). */
  def read(spark: SparkSession, path: String,
           opts: XlsxOptions = XlsxOptions()): DataFrame = {
    val in = openPath(spark, path)
    val sheets = try parseWorkbook(in) finally in.close()
    if (opts.sheet >= sheets.length)
      throw new IllegalArgumentException(
        s"sheet ${opts.sheet} out of range (${sheets.length} sheets)")
    sheetToDataFrame(spark, sheets(opts.sheet), opts)
  }

  /** workbook->datasets (reference fastexcel.clj): every sheet, in order. */
  def readAllSheets(spark: SparkSession, path: String,
                    opts: XlsxOptions = XlsxOptions()): Seq[DataFrame] = {
    val in = openPath(spark, path)
    val sheets = try parseWorkbook(in) finally in.close()
    sheets.indices.map(i => sheetToDataFrame(spark, sheets(i),
      opts.copy(sheet = i)))
  }

  /** Visible sheet names, in workbook order. */
  def sheetNames(spark: SparkSession, path: String): Seq[String] = {
    val in = openPath(spark, path)
    (try parseWorkbook(in) finally in.close()).map(_.name)
  }

  /** Many-workbook scale path: one task per file via binaryFiles, cells
    * canonically stringified executor-side, then one promotional-inference
    * pass types the union. Column set comes from the first file (all files
    * must share a layout — same contract as Spark's CSV multi-file read). */
  def readDistributed(spark: SparkSession, pathGlob: String,
                      opts: XlsxOptions = XlsxOptions()): DataFrame = {
    import spark.implicits._
    val sheetIdx = opts.sheet
    val headerRow = opts.headerRow
    val skipRows = opts.skipRows
    val firstFile = {
      val p = new org.apache.hadoop.fs.Path(pathGlob)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stats =
        if (pathGlob.exists(c => c == '*' || c == '?')) fs.globStatus(p)
        else if (fs.getFileStatus(p).isDirectory) fs.listStatus(p)
        else Array(fs.getFileStatus(p))
      stats.map(_.getPath.toString).filter(_.endsWith(".xlsx"))
        .minOption.getOrElse(
          throw new IllegalArgumentException(s"no .xlsx under $pathGlob"))
    }
    // schema decided from the first file (cheap: header + width only)
    val names = {
      val in = openPath(spark, firstFile)
      val sd = try parseWorkbook(in)(sheetIdx) finally in.close()
      val width = sd.maxCol + 1
      val grid = Array.fill[Any](width)(null)
      if (headerRow)
        sd.cells.iterator.filter(_.row == skipRows)
          .foreach(c => grid(c.col) = c.value)
      resolveNames(if (headerRow) grid else Array.empty[Any], width, opts)
    }
    val width = names.length
    val rows = spark.sparkContext.binaryFiles(pathGlob).flatMap {
      case (_, pds) =>
        val sheets = parseWorkbook(pds.open())
        if (sheetIdx >= sheets.length) Iterator.empty
        else {
          val sd = sheets(sheetIdx)
          val byRow = sd.cells.groupBy(_.row)
          val dataStart = skipRows + (if (headerRow) 1 else 0)
          (dataStart to sd.maxRow).iterator.map { r =>
            val arr = Array.fill[String](width)(null)
            byRow.getOrElse(r, Vector.empty).foreach { c =>
              if (c.col < width) arr(c.col) = stringify(c.value)
            }
            Row.fromSeq(arr.toIndexedSeq)
          }
        }
    }
    val schema = StructType(names.map(StructField(_, StringType, true)))
    Io.inferPromotional(spark.createDataFrame(rows, schema))
  }

  // ---------------------------------------------------------------- write

  private def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // literal \r would be normalized to \n by any conformant XML parser
      // on read-back — the character reference survives
      case '\r' => sb.append("&#xD;")
      case c if c < ' ' && c != '\t' && c != '\n' =>
        sb.append(' ') // other control chars are illegal in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }

  private def colRef(col0: Int): String = {
    var c = col0 + 1
    val sb = new java.lang.StringBuilder()
    while (c > 0) { val r = (c - 1) % 26; sb.insert(0, ('A' + r).toChar); c = (c - 1) / 26 }
    sb.toString
  }

  /** Write a DataFrame as a single-sheet .xlsx — see [[writeWorkbook]]. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit =
    writeWorkbook(Seq(sheetName -> df), path)

  /** Write a WORKBOOK of datasets — one sheet per (name, frame) pair, in
    * order — the reference's workbook-of-datasets surface
    * (/root/reference/src/tech/v3/libs/fastexcel.clj:178-200,
    * poi.clj:171-194: datasets->workbook!). Inline strings; date/timestamp
    * columns styled with ISO-like numFmts. Each sheet streams via
    * toLocalIterator — bounded by the format's 2^20-row sheet limit,
    * enforced per sheet. */
  def writeWorkbook(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeWorkbook needs at least one sheet")
    require(sheets.map(_._1).distinct.length == sheets.length,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(", ")}")
    val spark = sheets.head._2.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val zos = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val xmlHead = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    val n = sheets.length
    try {
      entry("[Content_Types].xml", xmlHead +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        """</Types>""")
      entry("_rels/.rels", xmlHead +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      entry("xl/workbook.xml", xmlHead +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        "<sheets>" +
        sheets.zipWithIndex.map { case ((name, _), ix) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${ix + 1}" r:id="rId${ix + 1}"/>"""
        }.mkString +
        "</sheets></workbook>")
      entry("xl/_rels/workbook.xml.rels", xmlHead +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
        """</Relationships>""")
      // style 1 = date (yyyy-mm-dd), style 2 = datetime
      entry("xl/styles.xml", xmlHead +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<numFmts count="2"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/>""" +
        """<numFmt numFmtId="165" formatCode="yyyy\-mm\-dd\ hh:mm:ss"/></numFmts>""" +
        """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""" +
        """<fills count="1"><fill><patternFill patternType="none"/></fill></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>""" +
        """<cellXfs count="3"><xf numFmtId="0" xfId="0"/>""" +
        """<xf numFmtId="164" xfId="0" applyNumberFormat="true"/>""" +
        """<xf numFmtId="165" xfId="0" applyNumberFormat="true"/></cellXfs>""" +
        """</styleSheet>""")

      sheets.zipWithIndex.foreach { case ((sheetName, df), ix) =>
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${ix + 1}.xml"))
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(zos, "UTF-8"), 1 << 16)
        w.write(xmlHead)
        w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        val fields = df.schema.fields
        def writeRow(rowIdx1: Int, vals: Int => (Any, DataType)): Unit = {
          w.write(s"""<row r="$rowIdx1">""")
          var i = 0
          while (i < fields.length) {
            val (v, t) = vals(i)
            if (v != null) {
              val ref = colRef(i) + rowIdx1
              (v, t) match {
                case (s: String, _) =>
                  w.write(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s)}</t></is></c>""")
                case (b: Boolean, _) =>
                  w.write(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
                case (d: java.sql.Date, _) =>
                  val serial = dateTimeToSerial(d.toLocalDate.atStartOfDay())
                  w.write(s"""<c r="$ref" s="1"><v>${serial.toLong}</v></c>""")
                case (ts: java.sql.Timestamp, _) =>
                  val serial = dateTimeToSerial(ts.toLocalDateTime)
                  w.write(s"""<c r="$ref" s="2"><v>$serial</v></c>""")
                case (num: java.lang.Number, _) =>
                  w.write(s"""<c r="$ref"><v>$num</v></c>""")
                case (_: Array[Byte], _) =>
                  // binary columns are not "nested" — they just have no
                  // faithful xlsx cell representation (toString would emit
                  // "[B@..." garbage); name the real problem
                  throw new IllegalArgumentException(
                    s"xlsx cells cannot hold binary values (column ${fields(i).name}); " +
                    "base64-encode the column first or write parquet for binary columns")
                case (nested @ (_: scala.collection.Seq[_] |
                                _: scala.collection.Map[_, _] |
                                _: org.apache.spark.sql.Row | _: Array[_]), _) =>
                  // toString here would silently write "WrappedArray(…)" text;
                  // xlsx cells are atomic — nested data belongs in parquet
                  throw new IllegalArgumentException(
                    s"xlsx cells cannot hold nested values (column ${fields(i).name}, " +
                    s"value class ${nested.getClass.getSimpleName}); " +
                    "write parquet for array/map/struct columns")
                case (other, _) =>
                  w.write(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>""")
              }
            }
            i += 1
          }
          w.write("</row>")
        }
        writeRow(1, i => (fields(i).name, StringType))
        var rowIdx = 2
        val it = df.toLocalIterator()
        while (it.hasNext) {
          if (rowIdx > 1048576)
            throw new IllegalStateException(
              s"xlsx sheets are limited to 1,048,576 rows (sheet $sheetName); " +
              "write parquet/csv for larger outputs")
          val row = it.next()
          writeRow(rowIdx, i => (row.get(i), fields(i).dataType))
          rowIdx += 1
        }
        w.write("</sheetData></worksheet>")
        w.flush()
        zos.closeEntry()
      }
    } finally {
      zos.close()
    }
  }
}
