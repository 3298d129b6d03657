package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.ops.Bounded._

/** dataset->str pretty printing (reference src/tech/v3/dataset/print.clj:
  * 99-376) and the R-derived shared-column float formatter (reference
  * src/tech/v3/dataset/format_sequence.clj:1-144).
  *
  * Behavioral parity, Spark-shaped: the table header is
  * `name [rows cols]:`, then a markdown table whose separator row carries
  * `:` right-alignment markers for numeric (non-datetime) columns, with
  * an optional column-types row, first/last elision (`...` row), per-cell
  * width caps, and `:repl`/`:markdown`/`:single` multi-line cell policies.
  * Doubles/floats are formatted PER COLUMN with one shared precision fitted
  * to the printed values (max left digits, max significant right digits,
  * scientific switch past the threshold power) — the reference's R-style
  * rule, so 39.81 and 415.87 align as `39.81`/`415.87`, not `39.8100…`.
  *
  * Scale contract: only the PRINTED rows are collected (limit + tail — two
  * O(printed) jobs plus one count), never the table; printing a 100 TB
  * frame costs the same as printing 25 rows.
  */
object Display {

  /** Mirror of the reference's print options (print.clj:99-121 option map;
    * defaults follow *default-table-row-print-length* = 25 etc.). */
  case class PrintOptions(
      // reference *default-table-row-print-length* (print.clj:26)
      indexRange: Int = 20,
      style: String = "first-last", // first-last | first | last | all
      columnTypes: Boolean = false,
      maxColWidth: Int = Int.MaxValue,
      linePolicy: String = "repl", // repl | markdown | single
      maximumPrecision: Option[Int] = None,
      elideHeader: Boolean = false,
      scientificThreshold: Int = 8)

  // ---------------------------------------------------- float formatting

  private val pow10: Array[Double] =
    (-1 to 22).map(e => math.pow(10.0, e)).toArray // pow10(i) = 10^(i-1)
  private def tbl(i: Int): Double = pow10(i) // reference tbl indexing

  private def leftDigits(x: Double): Long =
    math.floor(math.log10(x)).toLong + 1

  private def findNsig(alpha0: Double, digits0: Long): Long = {
    var a = alpha0; var d = digits0
    var done = false
    while (!done) {
      val a2 = a / 10.0
      if (a2 == math.floor(a2)) { a = a2; d -= 1 } else done = true
    }
    math.max(1L, d)
  }

  private def rightDigits(x: Double, digits: Long): Long = {
    val alpha = math.round(x * tbl((digits + 1).toInt)).toDouble
    if (alpha == 0.0) 1L else findNsig(alpha, digits)
  }

  /** (scientific?, expWidth, leftWidth, rightDigits) for one value —
    * format_sequence.clj `precision`. */
  private def precision(x: Double, digits0: Int, threshold: Int)
      : (Boolean, Int, Int, Int) = {
    if (x == 0.0) return (false, 0, 1, 1)
    val digits = math.max(1, math.min(10, digits0)).toLong
    val r = math.abs(x)
    val lft = leftDigits(r)
    val alft = math.abs(lft)
    val e = alft >= threshold
    val rPrec =
      if (alft < threshold) r
      else if (alft < 22) {
        if (lft < 0) r * tbl((1 - lft).toInt) else r / tbl((1 + lft).toInt)
      } else r / math.pow(10.0, (lft - 1).toDouble)
    val rght = rightDigits(rPrec, digits)
    val exp = if (alft > 100) 3 else 2
    val sgn = if (x < 0) 1 else 0
    val lftFixed = if (e || lft <= 0) sgn + 1 else sgn + lft.toInt
    (e, exp, lftFixed, rght.toInt)
  }

  /** One shared formatter for a column of doubles (format_sequence.clj
    * `formatter`): fit max widths over the finite values, emit
    * DecimalFormat strings (E+ exponent sign inserted), pad non-finite. */
  def doubleFormatter(xs: Seq[java.lang.Double], digits: Int = 8,
                      threshold0: Int = 8): java.lang.Double => String = {
    def fit(threshold: Int): (Boolean, Int, Int, Int, Int) = {
      var ce = false; var cexp = Int.MinValue; var clft = Int.MinValue
      var crght = Int.MinValue; var nonFinite = 0
      val it = xs.iterator
      while (it.hasNext) {
        val xv = it.next()
        val x: Double = if (xv == null) Double.NaN else xv.doubleValue()
        if (java.lang.Double.isFinite(x)) {
          val (e, exp, lft, rght) = precision(x, digits, threshold)
          if (e && threshold > 0) return fit(0) // switch ALL to scientific
          ce ||= e; cexp = math.max(cexp, exp); clft = math.max(clft, lft)
          crght = math.max(crght, rght)
        } else nonFinite = math.max(nonFinite,
          if (x == Double.NegativeInfinity) 4 else 3)
      }
      (ce, cexp, clft, crght, nonFinite)
    }
    val (e, exp, lft, rght, nonFinite) = fit(threshold0)
    val hasFinite = lft != Int.MinValue
    val w = math.max(nonFinite,
      if (!hasFinite) 3
      else if (e) lft + rght + exp + 3 // "." + "E" + exponent sign
      else lft + rght + 1) // "."
    val pattern =
      if (!hasFinite) "0.0"
      else "0." + ("0" * rght) + (if (e) "E" + ("0" * exp) else "")
    val df = new java.text.DecimalFormat(pattern,
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    (xv: java.lang.Double) => {
      val x: Double = if (xv == null) Double.NaN else xv.doubleValue()
      val s =
        if (java.lang.Double.isFinite(x)) {
          val u = df.format(x)
          if (e && !u.contains("E-")) u.replace("E", "E+") else u
        } else if (x == Double.PositiveInfinity) "Inf"
        else if (x == Double.NegativeInfinity) "-Inf"
        else "NaN"
      ("%" + w + "s").format(s)
    }
  }

  /** format-sequence: whole column formatted with the shared fit. */
  def formatSequence(xs: Seq[java.lang.Double], digits: Int = 8,
                     threshold: Int = 8): Seq[String] = {
    val f = doubleFormatter(xs, digits, threshold)
    xs.map(f)
  }

  // ---------------------------------------------------- table rendering

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private def isFloaty(dt: DataType): Boolean =
    dt == DoubleType || dt == FloatType

  /** Reference datatype names for the optional types row (`:int64` style
    * keywords — print.clj shows `(:datatype (meta col))`). */
  private def dtypeName(dt: DataType): String = dt match {
    case ByteType => ":int8"
    case ShortType => ":int16"
    case IntegerType => ":int32"
    case LongType => ":int64"
    case FloatType => ":float32"
    case DoubleType => ":float64"
    case BooleanType => ":boolean"
    case StringType => ":string"
    case DateType => ":local-date"
    case TimestampType => ":instant"
    case d: DecimalType => s":decimal(${d.precision},${d.scale})"
    case other => ":" + other.simpleString
  }

  /** dataset->str. Collects ONLY the printed window: `limit` for the head
    * slice, `tail` for the tail slice, one `count` for the header/elision
    * decision. A distributed frame has no implicit order, so like every
    * positional operator here the row window follows the frame's current
    * order (stable for a sorted or single-file frame). */
  def datasetToStr(df: DataFrame, name: String = "_unnamed",
                   opts: PrintOptions = PrintOptions()): String = {
    val nRows = df.count()
    val fields = df.schema.fields
    val (rows, ellipsis) = opts.style match {
      case "all" =>
        // print-range :all (print.clj:341-349) — explicit opt-in, the
        // only style that collects the whole frame
        (df.collectBounded(1 << 22, "print-range :all explicit opt-in").toSeq, false)
      case "first" =>
        (df.limit(opts.indexRange).collectBounded(opts.indexRange, "print head range").toSeq, false)
      case "last" =>
        (df.tail(math.min(opts.indexRange.toLong, nRows).toInt).toSeq, false)
      case "first-last" =>
        if (nRows > opts.indexRange) {
          val half = opts.indexRange / 2
          (df.limit(half).collectBounded(half, "print head half").toSeq ++ df.tail(half).toSeq, true)
        } else (df.limit(opts.indexRange).collectBounded(opts.indexRange, "print head range").toSeq, false)
      case other =>
        throw new IllegalArgumentException(s"unknown print style '$other'")
    }
    // per-column string cells (multi-line per the line policy)
    val floatFmts: Map[Int, java.lang.Double => String] =
      fields.indices.filter(i => isFloaty(fields(i).dataType)).map { i =>
        val vals = rows.map(r =>
          if (r.isNullAt(i)) null
          else java.lang.Double.valueOf(r.get(i) match {
            case f: Float => f.toDouble
            case d: Double => d
          })).toSeq
        i -> doubleFormatter(vals.filter(_ != null),
          opts.maximumPrecision.getOrElse(8), opts.scientificThreshold)
      }.toMap
    def cellLines(r: Row, i: Int): Seq[String] = {
      val raw =
        if (r.isNullAt(i)) ""
        else if (floatFmts.contains(i)) floatFmts(i)(r.get(i) match {
          case f: Float => java.lang.Double.valueOf(f.toDouble)
          case d: Double => java.lang.Double.valueOf(d)
        })
        else r.get(i).toString
      val lines = raw.split("\n", -1).toSeq
      val policy = opts.linePolicy match {
        case "single" => Seq(lines.head)
        case "markdown" => Seq(lines.mkString("<br>"))
        case _ => lines
      }
      policy.map(l =>
        if (l.length > opts.maxColWidth) l.substring(0, opts.maxColWidth)
        else l)
    }
    val body: Seq[Seq[Seq[String]]] = { // row → col → lines
      val strRows = rows.map(r => fields.indices.map(i => cellLines(r, i)))
      if (ellipsis) {
        val at = rows.length / 2
        val dots = fields.indices.map(_ => Seq("..."))
        (strRows.take(at) :+ dots) ++ strRows.drop(at)
      } else strRows
    }
    val names = fields.map(_.name)
    val types = fields.map(f => dtypeName(f.dataType))
    val widths = fields.indices.map { i =>
      val cellMax = body.iterator.map(_(i).iterator
        .map(_.length).foldLeft(0)(math.max)).foldLeft(0)(math.max)
      math.max(math.max(cellMax, names(i).length),
        if (opts.columnTypes) types(i).length else 0)
    }
    def fmtRow(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => ("%" + w + "s").format(c) }
        .mkString("| ", " | ", " |")
    val sb = new StringBuilder
    if (!opts.elideHeader)
      sb.append(s"$name [$nRows ${fields.length}]:\n\n")
    sb.append(fmtRow(names.toIndexedSeq)).append('\n')
    if (opts.columnTypes) sb.append(fmtRow(types.toIndexedSeq)).append('\n')
    sb.append(fields.indices.map { i =>
      val numeric = isNumeric(fields(i).dataType)
      "-" * (widths(i) + 1) + (if (numeric) ":" else "-")
    }.mkString("|", "|", "|")).append('\n')
    body.foreach { row =>
      val height = row.iterator.map(_.length).foldLeft(1)(math.max)
      (0 until height).foreach { li =>
        sb.append(fmtRow(fields.indices.map(i =>
          if (li < row(i).length) row(i)(li) else ""))).append('\n')
      }
    }
    sb.result()
  }
}
