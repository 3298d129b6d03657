package graft.sources

import java.io.InputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.XlsxIo.{Cell, SheetData, XlsxOptions}

/** Pure-JVM legacy .xls (BIFF8 inside an OLE2 compound file) reader —
  * no external deps.
  *
  * The reference reads .xls via Apache POI (reference
  * src/tech/v3/libs/poi.clj:1-171); the dataset semantics are identical to
  * the xlsx path (header row, column-i fallbacks, sparse cells → missing,
  * promotional narrowing, date-styled serials), so this parser only decodes
  * the container + records and then reuses [[XlsxIo]]'s sheet→DataFrame
  * pipeline and options.
  *
  * Decoded: OLE2 FAT/DIFAT/miniFAT chains, Workbook/Book stream,
  * BIFF8 records BOF/BOUNDSHEET/SST(+CONTINUE)/LABELSST/LABEL/NUMBER/RK/
  * MULRK/BOOLERR/FORMULA(+STRING)/FORMAT/XF/DATE1904, BIFF8 unicode strings
  * (compressed + utf-16le, rich-text and phonetic payloads skipped,
  * continuation grbit re-reads).
  *
  * Scale contract: .xls sheets cap at 65,536 rows — strictly a small-file
  * ingest format; parses driver-side like the reference. Bulk corpora should
  * land in parquet on first touch.
  */
object XlsIo {

  // ------------------------------------------------------------- OLE2

  private final class Ole2(data: Array[Byte]) {
    private def u16(o: Int): Int =
      (data(o) & 0xFF) | ((data(o + 1) & 0xFF) << 8)
    private def i32(o: Int): Int =
      (data(o) & 0xFF) | ((data(o + 1) & 0xFF) << 8) |
        ((data(o + 2) & 0xFF) << 16) | ((data(o + 3) & 0xFF) << 24)

    require(data.length >= 512 &&
      (data(0) & 0xFF) == 0xD0 && (data(1) & 0xFF) == 0xCF &&
      (data(2) & 0xFF) == 0x11 && (data(3) & 0xFF) == 0xE0,
      "not an OLE2 compound file (bad magic)")

    private val sectorSize = 1 << u16(30)
    private val miniSize = 1 << u16(32)
    private val dirStart = i32(48)
    private val miniCutoff = i32(56)
    private val miniFatStart = i32(60)
    private val difatStart = i32(68)
    private val numDifat = i32(72)

    private val FREE = 0xFFFFFFFF
    private val END = 0xFFFFFFFE

    private def sectorBytes(s: Int): Array[Byte] = {
      val off = 512 + s * sectorSize
      java.util.Arrays.copyOfRange(data, off,
        math.min(off + sectorSize, data.length))
    }

    private val fat: Array[Int] = {
      // 109 DIFAT entries in the header + chained DIFAT sectors
      val fatSectors = Vector.newBuilder[Int]
      var i = 0
      while (i < 109) {
        val s = i32(76 + i * 4)
        if (s != FREE && s != END) fatSectors += s
        i += 1
      }
      var ds = difatStart
      var guard = 0
      while (ds != END && ds != FREE && guard < numDifat + 1) {
        val sec = sectorBytes(ds)
        val perSector = sectorSize / 4 - 1
        var j = 0
        while (j < perSector) {
          val v = (sec(j * 4) & 0xFF) | ((sec(j * 4 + 1) & 0xFF) << 8) |
            ((sec(j * 4 + 2) & 0xFF) << 16) | ((sec(j * 4 + 3) & 0xFF) << 24)
          if (v != FREE && v != END) fatSectors += v
          j += 1
        }
        ds = (sec(perSector * 4) & 0xFF) | ((sec(perSector * 4 + 1) & 0xFF) << 8) |
          ((sec(perSector * 4 + 2) & 0xFF) << 16) | ((sec(perSector * 4 + 3) & 0xFF) << 24)
        guard += 1
      }
      fatSectors.result().iterator.flatMap { s =>
        val b = sectorBytes(s)
        (0 until b.length / 4).map { j =>
          (b(j * 4) & 0xFF) | ((b(j * 4 + 1) & 0xFF) << 8) |
            ((b(j * 4 + 2) & 0xFF) << 16) | ((b(j * 4 + 3) & 0xFF) << 24)
        }
      }.toArray
    }

    private def chain(start: Int): Vector[Int] = {
      val out = Vector.newBuilder[Int]
      var s = start
      var guard = 0
      while (s != END && s != FREE && s >= 0 && s < fat.length &&
             guard <= fat.length) {
        out += s; s = fat(s); guard += 1
      }
      out.result()
    }

    private def readChain(start: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      chain(start).foreach(s => bos.write(sectorBytes(s)))
      bos.toByteArray
    }

    /** (name, isStream, startSector, size) directory entries. */
    private val dir: Vector[(String, Boolean, Int, Int)] = {
      val d = readChain(dirStart)
      (0 until d.length / 128).flatMap { i =>
        val o = i * 128
        val nlen = (d(o + 64) & 0xFF) | ((d(o + 65) & 0xFF) << 8)
        if (nlen < 2) None
        else {
          val name = new String(d, o, nlen - 2, "UTF-16LE")
          val typ = d(o + 66) & 0xFF
          val start = (d(o + 116) & 0xFF) | ((d(o + 117) & 0xFF) << 8) |
            ((d(o + 118) & 0xFF) << 16) | ((d(o + 119) & 0xFF) << 24)
          val size = (d(o + 120) & 0xFF) | ((d(o + 121) & 0xFF) << 8) |
            ((d(o + 122) & 0xFF) << 16) | ((d(o + 123) & 0xFF) << 24)
          Some((name, typ == 2, start, size))
        }
      }.toVector
    }

    private lazy val miniStream: Array[Byte] = {
      // the Root Entry's chain IS the mini stream
      dir.find(_._1 == "Root Entry") match {
        case Some((_, _, start, _)) => readChain(start)
        case None => Array.emptyByteArray
      }
    }

    private lazy val miniFat: Array[Int] = {
      val b = readChain(miniFatStart)
      (0 until b.length / 4).map { j =>
        (b(j * 4) & 0xFF) | ((b(j * 4 + 1) & 0xFF) << 8) |
          ((b(j * 4 + 2) & 0xFF) << 16) | ((b(j * 4 + 3) & 0xFF) << 24)
      }.toArray
    }

    def stream(name: String): Option[Array[Byte]] =
      dir.find(e => e._1 == name && e._2).map { case (_, _, start, size) =>
        val full =
          if (size >= miniCutoff) readChain(start)
          else {
            val bos = new java.io.ByteArrayOutputStream()
            var s = start
            var guard = 0
            while (s != END && s != FREE && s >= 0 && s < miniFat.length &&
                   guard <= miniFat.length) {
              val off = s * miniSize
              bos.write(java.util.Arrays.copyOfRange(miniStream, off,
                math.min(off + miniSize, miniStream.length)))
              s = miniFat(s); guard += 1
            }
            bos.toByteArray
          }
        if (full.length > size) java.util.Arrays.copyOfRange(full, 0, size)
        else full
      }
  }

  // ------------------------------------------------------------- BIFF8

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** RK value: bit0 = ×0.01, bit1 = 30-bit int vs top-of-double. */
  private def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) v / 100.0 else v
  }

  /** Record stream cursor that transparently enters CONTINUE records —
    * needed for SST payloads that span the 8224-byte record cap. */
  private final class RecordCursor(data: Array[Byte], var recStart: Int) {
    var pos: Int = recStart + 4
    var recEnd: Int = recStart + 4 + u16(data, recStart + 2)

    private def ensure(): Unit = {
      while (pos >= recEnd && recEnd < data.length &&
             u16(data, recEnd) == 0x3C) { // CONTINUE
        recStart = recEnd
        pos = recStart + 4
        recEnd = recStart + 4 + u16(data, recStart + 2)
      }
    }

    def remainingInRecord: Int = recEnd - pos

    def readU8(): Int = { ensure(); val v = data(pos) & 0xFF; pos += 1; v }
    def readU16(): Int = { ensure()
      if (remainingInRecord >= 2) { val v = u16(data, pos); pos += 2; v }
      else { val lo = readU8(); val hi = readU8(); lo | (hi << 8) }
    }
    def readI32(): Int = { val lo = readU16(); val hi = readU16(); lo | (hi << 16) }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) { ensure()
        val take = math.min(left, remainingInRecord)
        pos += take; left -= take
        if (take == 0) return
      }
    }

    /** BIFF8 unicode string body (length already read): handles the
      * compressed/uncompressed flag re-read at every CONTINUE boundary. */
    def readUnicode(nChars: Int, grbit0: Int): String = {
      var grbit = grbit0
      val rich = (grbit & 0x08) != 0
      val phonetic = (grbit & 0x04) != 0
      val nRuns = if (rich) readU16() else 0
      val phSize = if (phonetic) readI32() else 0
      val sb = new java.lang.StringBuilder(nChars)
      var left = nChars
      while (left > 0) {
        ensure()
        if (pos >= recEnd) return sb.toString // truncated stream safety
        val wide = (grbit & 0x01) != 0
        val charBytes = if (wide) 2 else 1
        val avail = remainingInRecord / charBytes
        val take = math.min(left, math.max(avail, 0))
        var i = 0
        while (i < take) {
          val c =
            if (wide) u16(data, pos + i * 2).toChar
            else (data(pos + i) & 0xFF).toChar
          sb.append(c)
          i += 1
        }
        pos += take * charBytes
        left -= take
        if (left > 0) {
          // spilled into a CONTINUE: first byte there is a fresh grbit
          ensure()
          grbit = (grbit & ~0x01) | (readU8() & 0x01)
        }
      }
      skip(nRuns * 4 + phSize)
      sb.toString
    }
  }

  /** All SST strings (with CONTINUE handling). */
  private def parseSst(data: Array[Byte], sstStart: Int): Vector[String] = {
    val cur = new RecordCursor(data, sstStart)
    cur.skip(4) // total refs
    val nUnique = cur.readI32()
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < nUnique) {
      val nChars = cur.readU16()
      val grbit = cur.readU8()
      out += cur.readUnicode(nChars, grbit)
      i += 1
    }
    out.result()
  }

  /** Short 8-bit-length string (BOUNDSHEET names). */
  private def shortString(b: Array[Byte], o: Int): String = {
    val n = b(o) & 0xFF
    val grbit = b(o + 1) & 0xFF
    if ((grbit & 0x01) != 0) new String(b, o + 2, n * 2, "UTF-16LE")
    else new String(b, o + 2, n, "ISO-8859-1")
  }

  private def parseWorkbook(data: Array[Byte]): Vector[SheetData] = {
    // pass 1: globals — SST, XF numFmtIds, FORMATs, DATE1904, sheet offsets
    var sst: Vector[String] = Vector.empty
    val xfFmtIds = Vector.newBuilder[Int]
    val formats = scala.collection.mutable.Map[Int, String]()
    var date1904 = false
    val sheets = Vector.newBuilder[(String, Int)]
    var p = 0
    var inGlobals = true
    while (p + 4 <= data.length && inGlobals) {
      val rec = u16(data, p)
      val len = u16(data, p + 2)
      val body = p + 4
      rec match {
        case 0x0809 => // BOF — only walk the globals substream here
          if (u16(data, body + 2) != 0x0005 && p > 0) inGlobals = false
        case 0x000A => inGlobals = false // EOF of globals
        case 0x00FC => sst = parseSst(data, p)
        case 0x00E0 => xfFmtIds += u16(data, body + 2) // XF: ifmt at +2
        case 0x041E => // FORMAT: ifmt, unicode string
          val id = u16(data, body)
          val n = u16(data, body + 2)
          val grbit = data(body + 4) & 0xFF
          val s =
            if ((grbit & 0x01) != 0) new String(data, body + 5, n * 2, "UTF-16LE")
            else new String(data, body + 5, n, "ISO-8859-1")
          formats(id) = s
        case 0x0022 => date1904 = (data(body) & 0x01) == 1
        case 0x0085 => // BOUNDSHEET: stream pos, visibility, type, name
          val off = i32(data, body)
          val typ = data(body + 5) & 0xFF
          if (typ == 0) sheets += ((shortString(data, body + 6), off))
        case _ =>
      }
      p = body + len
    }
    // same stripped-format date/time classification as xlsx (shared —
    // a fix in one container cannot drift from the other)
    val (isDate, hasTime) = XlsxIo.styleClassifiers(xfFmtIds.result(), formats)

    def numberValue(xf: Int, d: Double): Any =
      if (isDate(xf)) {
        // 1904-epoch workbooks offset by 1462 days from the 1900 system
        val serial = if (date1904) d + 1462.0 else d
        val ldt = XlsxIo.serialToDateTime(serial)
        if (!hasTime(xf) && ldt.toLocalTime.toNanoOfDay == 0L)
          java.sql.Date.valueOf(ldt.toLocalDate)
        else java.sql.Timestamp.valueOf(ldt)
      } else d

    // pass 2: each sheet substream
    sheets.result().map { case (name, off) =>
      val cells = Vector.newBuilder[Cell]
      var maxRow = -1; var maxCol = -1
      def add(row: Int, col: Int, v: Any): Unit = {
        if (col > maxCol) maxCol = col
        if (v != null) {
          if (row > maxRow) maxRow = row
          cells += Cell(row, col, v)
        }
      }
      var q = off
      var depth = 0
      var lastFormulaCell: Option[(Int, Int)] = None
      var done = false
      while (q + 4 <= data.length && !done) {
        val rec = u16(data, q)
        val len = u16(data, q + 2)
        val body = q + 4
        rec match {
          case 0x0809 => depth += 1
          case 0x000A => depth -= 1; if (depth <= 0) done = true
          case 0x00FD => // LABELSST
            val row = u16(data, body); val col = u16(data, body + 2)
            val isst = i32(data, body + 6)
            add(row, col, sst.lift(isst).orNull)
          case 0x0204 => // LABEL (inline unicode)
            val row = u16(data, body); val col = u16(data, body + 2)
            val n = u16(data, body + 6)
            val grbit = data(body + 8) & 0xFF
            val s =
              if ((grbit & 0x01) != 0) new String(data, body + 9, n * 2, "UTF-16LE")
              else new String(data, body + 9, n, "ISO-8859-1")
            add(row, col, s)
          case 0x0203 => // NUMBER
            val row = u16(data, body); val col = u16(data, body + 2)
            val xf = u16(data, body + 4)
            add(row, col, numberValue(xf, f64(data, body + 6)))
          case 0x027E => // RK
            val row = u16(data, body); val col = u16(data, body + 2)
            val xf = u16(data, body + 4)
            add(row, col, numberValue(xf, decodeRk(i32(data, body + 6))))
          case 0x00BD => // MULRK
            val row = u16(data, body); val colFirst = u16(data, body + 2)
            val n = (len - 6) / 6
            var k = 0
            while (k < n) {
              val xf = u16(data, body + 4 + k * 6)
              val rk = i32(data, body + 6 + k * 6)
              add(row, colFirst + k, numberValue(xf, decodeRk(rk)))
              k += 1
            }
          case 0x0205 => // BOOLERR
            val row = u16(data, body); val col = u16(data, body + 2)
            val isErr = (data(body + 7) & 0xFF) == 1
            add(row, col, if (isErr) null else (data(body + 6) & 0xFF) == 1)
          case 0x0201 => // BLANK — widens columns only
            val col = u16(data, body + 2)
            if (col > maxCol) maxCol = col
          case 0x00BE => // MULBLANK
            val colLast = u16(data, body + len - 6 + 4)
            if (colLast > maxCol) maxCol = colLast
          case 0x0006 => // FORMULA — cached result
            val row = u16(data, body); val col = u16(data, body + 2)
            val xf = u16(data, body + 4)
            if (u16(data, body + 12) == 0xFFFF) {
              (data(body + 6) & 0xFF) match {
                case 0 => lastFormulaCell = Some((row, col)) // STRING follows
                case 1 => add(row, col, (data(body + 8) & 0xFF) == 1)
                // 3 = cached blank result: POI (and the reference through
                // it) treat it as missing, not as an empty string
                case _ => // blank or error → missing
              }
            } else add(row, col, numberValue(xf, f64(data, body + 6)))
          case 0x0207 => // STRING (formula string result)
            lastFormulaCell.foreach { case (row, col) =>
              val cur = new RecordCursor(data, q)
              val n = cur.readU16()
              val grbit = cur.readU8()
              add(row, col, cur.readUnicode(n, grbit))
            }
            lastFormulaCell = None
          case _ =>
        }
        q = body + len
      }
      SheetData(name, cells.result(), maxRow, maxCol)
    }
  }

  // ------------------------------------------------------------- public

  private def slurp(in: InputStream): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var r = in.read(buf)
    while (r >= 0) { bos.write(buf, 0, r); r = in.read(buf) }
    bos.toByteArray
  }

  private def sheets(spark: SparkSession, path: String): Vector[SheetData] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try slurp(in) finally in.close()
    val ole = new Ole2(bytes)
    val wb = ole.stream("Workbook").orElse(ole.stream("Book")).getOrElse(
      throw new IllegalArgumentException(s"$path has no Workbook/Book stream"))
    parseWorkbook(wb)
  }

  /** Read one sheet of a legacy .xls workbook (same options as xlsx). */
  def read(spark: SparkSession, path: String,
           opts: XlsxOptions = XlsxOptions()): DataFrame = {
    val ss = sheets(spark, path)
    if (opts.sheet >= ss.length)
      throw new IllegalArgumentException(
        s"sheet ${opts.sheet} out of range (${ss.length} sheets)")
    XlsxIo.sheetToDataFrame(spark, ss(opts.sheet), opts)
  }

  /** Visible sheet names, in workbook order. */
  def sheetNames(spark: SparkSession, path: String): Seq[String] =
    sheets(spark, path).map(_.name)

  /** workbook->datasets for .xls: every visible sheet, in order. */
  def readAllSheets(spark: SparkSession, path: String,
                    opts: XlsxOptions = XlsxOptions()): Seq[DataFrame] = {
    val ss = sheets(spark, path)
    ss.indices.map(i => XlsxIo.sheetToDataFrame(spark, ss(i),
      opts.copy(sheet = i)))
  }

  // ------------------------------------------------------------- write

  private final class LeBuf {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): this.type = { bos.write(v & 0xFF); this }
    def u16(v: Int): this.type = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF); this }
    def i32(v: Int): this.type = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF); this }
    def f64(v: Double): this.type = {
      var bits = java.lang.Double.doubleToLongBits(v)
      var k = 0
      while (k < 8) { bos.write((bits & 0xFF).toInt); bits >>>= 8; k += 1 }
      this
    }
    def bytes(b: Array[Byte]): this.type = { bos.write(b); this }
    def size: Int = bos.size()
    def result(): Array[Byte] = bos.toByteArray
  }

  private def record(out: LeBuf, id: Int, body: LeBuf => Unit): Unit = {
    val b = new LeBuf; body(b)
    out.u16(id).u16(b.size).bytes(b.result())
  }

  /** Write a DataFrame as a single-sheet .xls — see [[writeWorkbook]]. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit =
    writeWorkbook(Seq(sheetName -> df), path)

  // standard-preamble XF layout: 0-14 style XFs, 15 = default cell XF,
  // 16 = date cell XF (fmt 164), 17 = datetime cell XF (fmt 165)
  private val XfGeneral = 15
  private val XfDate = 16
  private val XfDatetime = 17

  /** Minimal legacy .xls (BIFF8 in OLE2) writer — the reference writes .xls
    * via POI's HSSF (reference src/tech/v3/libs/poi.clj:1-171); multi-sheet
    * [[writeWorkbook]] mirrors its datasets->workbook! surface. Emits the
    * standard BIFF8 preamble third-party consumers expect — CODEPAGE,
    * WINDOW1, four FONTs, 15 style XFs with cell XFs from index 15 (the
    * Excel/POI convention; a bare 3-XF table renders wrong outside this
    * reader) — then the record subset the reader decodes (inline LABEL
    * strings — no SST — NUMBER doubles, BOOLERR booleans, date/datetime
    * serials through the SAME custom format codes as the xlsx writer, so
    * the shared style classification round-trips identically in both
    * containers). Missing values are simply absent cells; binary/nested
    * columns refuse like the xlsx writer. Caps per sheet: 65,536 rows × 256
    * columns (the format's own limits), ≤ 4000 chars per string cell
    * (inline LABEL record bound). Driver-side single stream, like the
    * reference — bulk outputs belong in parquet/csv. */
  def writeWorkbook(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeWorkbook needs at least one sheet")
    val names = sheets.map { case (nm, _) => nm.take(31) }
    require(names.distinct.length == names.length,
      s"duplicate sheet names (after the 31-char cap): ${names.mkString(", ")}")
    sheets.foreach { case (nm, df) =>
      require(df.schema.fields.length <= 256,
        s"xls sheets cap at 256 columns, got ${df.schema.fields.length} ($nm)")
    }
    val wb = new LeBuf
    def bof(buf: LeBuf, dt: Int): Unit = record(buf, 0x0809, b =>
      b.u16(0x0600).u16(dt).u16(0x0DBB).u16(0x07CC).i32(0).i32(0))
    bof(wb, 0x0005)
    record(wb, 0x0042, _.u16(0x04B0)) // CODEPAGE: UTF-16
    record(wb, 0x003D, b =>           // WINDOW1: standard geometry
      b.u16(0x0168).u16(0x010E).u16(0x3A5C).u16(0x23BE).u16(0x0038)
        .u16(0).u16(0).u16(1).u16(0x0258))
    // four identical default fonts — BIFF8 font indices 0-3 are reserved
    // (index 4 is skipped by convention), consumers expect all four
    val fontName = "Calibri".getBytes("UTF-16LE")
    (0 until 4).foreach { _ =>
      record(wb, 0x0031, b =>
        b.u16(220).u16(0).u16(0x7FFF).u16(0x0190).u16(0)
          .u8(0).u8(0).u8(0).u8(0)
          .u8("Calibri".length).u8(0x01).bytes(fontName))
    }
    def format(id: Int, code: String): Unit = record(wb, 0x041E, b => {
      b.u16(id).u16(code.length).u8(0)
      b.bytes(code.getBytes("ISO-8859-1"))
    })
    format(164, "yyyy\\-mm\\-dd")
    format(165, "yyyy\\-mm\\-dd\\ hh:mm:ss")
    // fStyle + parent 0xFFF for the 15 style XFs; cell XFs parent style 0
    def xf(ifmt: Int, style: Boolean): Unit = record(wb, 0x00E0, b => {
      b.u16(0).u16(ifmt).u16(if (style) 0xFFF5 else 0x0001)
      b.u16(0).u16(0).u16(0).u16(0).u16(0).u16(0).u16(0)
    })
    (0 until 15).foreach(_ => xf(0, style = true))
    xf(0, style = false)   // 15: default cell XF (general)
    xf(164, style = false) // 16: date
    xf(165, style = false) // 17: datetime
    // BOUNDSHEET per sheet with placeholder stream offsets, patched after
    // the full stream is assembled
    val boundsheetPosFix = new Array[Int](sheets.length)
    names.zipWithIndex.foreach { case (name, ix) =>
      val nameBytes = name.getBytes("ISO-8859-1")
      record(wb, 0x0085, b => {
        boundsheetPosFix(ix) = wb.size + 4 // i32 lands at record body start
        b.i32(0).u16(0).u8(nameBytes.length).u8(0).bytes(nameBytes)
      })
    }
    record(wb, 0x000A, _ => ())
    def cell(b: LeBuf, row: Int, colIdx: Int, v: Any, colName: String): Unit =
      v match {
        case null => // missing = absent cell
        case s: String =>
          require(s.length <= 4000,
            s"xls string cells cap at 4000 chars (column $colName); " +
              "write xlsx or parquet for longer text")
          record(b, 0x0204, r => {
            r.u16(row).u16(colIdx).u16(XfGeneral).u16(s.length).u8(0x01)
            r.bytes(s.getBytes("UTF-16LE"))
          })
        case bool: Boolean =>
          record(b, 0x0205, r =>
            r.u16(row).u16(colIdx).u16(XfGeneral).u8(if (bool) 1 else 0).u8(0))
        case d: java.sql.Date =>
          val serial = XlsxIo.dateTimeToSerial(d.toLocalDate.atStartOfDay())
          record(b, 0x0203, r =>
            r.u16(row).u16(colIdx).u16(XfDate).f64(serial.toLong.toDouble))
        case ts: java.sql.Timestamp =>
          val serial = XlsxIo.dateTimeToSerial(ts.toLocalDateTime)
          record(b, 0x0203, r =>
            r.u16(row).u16(colIdx).u16(XfDatetime).f64(serial))
        case n: java.lang.Number =>
          record(b, 0x0203, r =>
            r.u16(row).u16(colIdx).u16(XfGeneral).f64(n.doubleValue()))
        case _: Array[Byte] =>
          throw new IllegalArgumentException(
            s"xls cells cannot hold binary values (column $colName); " +
              "base64-encode the column first or write parquet")
        case nested @ (_: scala.collection.Seq[_] | _: scala.collection.Map[_, _] |
                       _: org.apache.spark.sql.Row | _: Array[_]) =>
          throw new IllegalArgumentException(
            s"xls cells cannot hold nested values (column $colName, " +
              s"value class ${nested.getClass.getSimpleName}); write parquet")
        case other => cell(b, row, colIdx, other.toString, colName)
      }
    val sheetStarts = new Array[Int](sheets.length)
    sheets.zipWithIndex.foreach { case ((sheetName, df), ix) =>
      val fields = df.schema.fields
      sheetStarts(ix) = wb.size
      bof(wb, 0x0010)
      fields.indices.foreach(i => cell(wb, 0, i, fields(i).name, fields(i).name))
      var rowIdx = 1
      val it = df.toLocalIterator()
      while (it.hasNext) {
        if (rowIdx >= 65536)
          throw new IllegalStateException(
            s"xls sheets are limited to 65,536 rows (sheet $sheetName); " +
              "write parquet/csv/xlsx for larger outputs")
        val row = it.next()
        var i = 0
        while (i < fields.length) {
          cell(wb, rowIdx, i, row.get(i), fields(i).name)
          i += 1
        }
        rowIdx += 1
      }
      record(wb, 0x000A, _ => ())
    }
    val stream = wb.result()
    // patch each BOUNDSHEET lbPlyPos now that the stream layout is known
    sheets.indices.foreach { ix =>
      val pos = boundsheetPosFix(ix)
      val start = sheetStarts(ix)
      stream(pos) = (start & 0xFF).toByte
      stream(pos + 1) = ((start >> 8) & 0xFF).toByte
      stream(pos + 2) = ((start >> 16) & 0xFF).toByte
      stream(pos + 3) = ((start >> 24) & 0xFF).toByte
    }
    val bytes = compoundFile(stream)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      sheets.head._2.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Wrap one "Workbook" stream in a minimal OLE2 compound file: header +
    * FAT + 1 directory sector (+ miniFAT/mini-stream when the workbook is
    * under the 4096-byte cutoff, per the CFB spec the reader follows). */
  private def compoundFile(workbook: Array[Byte]): Array[Byte] = {
    val SEC = 512; val MINI = 64; val CUTOFF = 4096
    val END = 0xFFFFFFFE; val FREE = 0xFFFFFFFF; val FATSECT = 0xFFFFFFFD
    val useMini = workbook.length < CUTOFF
    def secCount(n: Int): Int = (n + SEC - 1) / SEC
    val wbSecs = if (useMini) 0 else secCount(workbook.length)
    val nMini = if (useMini) (workbook.length + MINI - 1) / MINI else 0
    val containerLen = nMini * MINI
    val containerSecs = if (useMini) secCount(containerLen) else 0
    val miniFatSecs = if (useMini) 1 else 0
    val dataSecs = 1 + miniFatSecs + containerSecs + wbSecs // dir first
    var fatSecs = 1
    while (fatSecs * (SEC / 4) < fatSecs + dataSecs) fatSecs += 1
    require(fatSecs <= 109, "xls output too large for a header-DIFAT file")
    val totalSecs = fatSecs + dataSecs
    val dirSec = fatSecs
    val miniFatSec = dirSec + 1
    val containerStart = miniFatSec + miniFatSecs
    val wbStart = if (useMini) -1 else dirSec + 1
    // FAT
    val fat = Array.fill(fatSecs * (SEC / 4))(FREE)
    (0 until fatSecs).foreach(i => fat(i) = FATSECT)
    fat(dirSec) = END
    if (useMini) {
      fat(miniFatSec) = END
      (0 until containerSecs).foreach { i =>
        fat(containerStart + i) =
          if (i == containerSecs - 1) END else containerStart + i + 1
      }
    } else
      (0 until wbSecs).foreach { i =>
        fat(wbStart + i) = if (i == wbSecs - 1) END else wbStart + i + 1
      }
    val out = new LeBuf
    // header
    out.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    out.bytes(new Array[Byte](16))       // CLSID
    out.u16(0x003E).u16(0x0003)          // minor/major version
    out.u16(0xFFFE)                      // little-endian marker
    out.u16(9).u16(6)                    // sector/mini shifts
    out.bytes(new Array[Byte](6))        // reserved
    out.i32(0)                           // dir sector count (v3: 0)
    out.i32(fatSecs)
    out.i32(dirSec)
    out.i32(0)                           // transaction
    out.i32(CUTOFF)
    out.i32(if (useMini) miniFatSec else END)
    out.i32(if (useMini) 1 else 0)
    out.i32(END).i32(0)                  // DIFAT chain: none
    (0 until 109).foreach(i => out.i32(if (i < fatSecs) i else FREE))
    require(out.size == 512, s"bad CFB header size ${out.size}")
    // FAT sectors
    fat.foreach(out.i32)
    // directory sector: Root Entry, Workbook, 2 empty
    def dirEntry(name: String, typ: Int, start: Int, size: Int,
                 child: Int): Unit = {
      val nm = name.getBytes("UTF-16LE")
      out.bytes(nm); out.bytes(new Array[Byte](64 - nm.length))
      out.u16(if (name.isEmpty) 0 else nm.length + 2)
      out.u8(typ).u8(1)                  // type, black
      out.i32(-1).i32(-1).i32(child)     // siblings, child
      out.bytes(new Array[Byte](16))     // CLSID
      out.i32(0)                         // state
      out.bytes(new Array[Byte](16))     // ctime/mtime
      out.i32(start).i32(size).i32(0)
    }
    dirEntry("Root Entry", 5, if (useMini) containerStart else END,
      if (useMini) containerLen else 0, 1)
    dirEntry("Workbook", 2, if (useMini) 0 else wbStart, workbook.length, -1)
    dirEntry("", 0, 0, 0, -1)
    dirEntry("", 0, 0, 0, -1)
    // miniFAT + mini-stream container (padded), or the workbook directly
    if (useMini) {
      (0 until nMini).foreach(i => out.i32(if (i == nMini - 1) END else i + 1))
      (nMini until SEC / 4).foreach(_ => out.i32(FREE))
      out.bytes(workbook)
      out.bytes(new Array[Byte](containerLen - workbook.length))
      val pad = containerSecs * SEC - containerLen
      out.bytes(new Array[Byte](pad))
    } else {
      out.bytes(workbook)
      out.bytes(new Array[Byte](wbSecs * SEC - workbook.length))
    }
    require(out.size == 512 + totalSecs * SEC,
      s"CFB layout mismatch: ${out.size} vs ${512 + totalSecs * SEC}")
    out.result()
  }
}
