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

  /** workbook->datasets for .xls: every visible sheet, in order. */
  def readAllSheets(spark: SparkSession, path: String,
                    opts: XlsxOptions = XlsxOptions()): Seq[DataFrame] = {
    val ss = sheets(spark, path)
    ss.indices.map(i => XlsxIo.sheetToDataFrame(spark, ss(i),
      opts.copy(sheet = i)))
  }
}
