package graft

import org.apache.spark.sql.functions._

import graft.ops.Display
import graft.ops.Display.PrintOptions

/** dataset->str / format-sequence parity (reference print.clj:99-376,
  * format_sequence.clj). The float cases are hand-derived from the
  * reference algorithm (R-style shared column precision). */
class DisplaySpec extends SparkSuite {
  init()
  import spark.implicits._

  test("format-sequence: shared column precision, R-style") {
    // stocks-like prices: 2 right digits, widest left 3 → width 6
    assert(Display.formatSequence(Seq(39.81, 24.73, 415.87).map(d => d: java.lang.Double))
      == Seq(" 39.81", " 24.73", "415.87"))
    // trailing-zero trimming: 1.50 fits in 1 right digit... but 1.25 needs 2
    assert(Display.formatSequence(Seq(1.5, 1.25).map(d => d: java.lang.Double))
      == Seq("1.50", "1.25"))
    // zero prints as 0.0 (1 right digit), negatives get sign room
    assert(Display.formatSequence(Seq(0.0, -1.5).map(d => d: java.lang.Double))
      == Seq(" 0.0", "-1.5"))
    // past the threshold power the WHOLE column flips to scientific with
    // two-digit exponent and explicit +
    assert(Display.formatSequence(Seq(1.0e9: java.lang.Double)) == Seq("1.0E+09"))
    val sci = Display.formatSequence(Seq(1.0e9, 2.0).map(d => d: java.lang.Double))
    assert(sci == Seq("1.0E+09", "2.0E+00"), sci.toString)
    // non-finite padded into the column
    val nf = Display.formatSequence(Seq(1.5: java.lang.Double, null))
    assert(nf == Seq("1.5", "NaN"), nf.toString)
  }

  test("datasetToStr: header, alignment markers, first-last elision, types") {
    val df = (1 to 30).map(i => (i.toLong, s"s$i", i + 0.25)).toDF("id", "s", "v")
      .coalesce(1).orderBy("id")
    val out = Display.datasetToStr(df, "tbl",
      PrintOptions(indexRange = 10, columnTypes = true))
    val lines = out.split("\n").toSeq
    assert(lines.head == "tbl [30 3]:")
    // header, types, separator: numeric columns get the `:` marker
    assert(lines(2).matches("\\|\\s+id \\|\\s+s \\|\\s+v \\|"), lines(2))
    assert(lines(3).contains(":int64") && lines(3).contains(":string") &&
      lines(3).contains(":float64"))
    val sep = lines(4)
    assert(sep.startsWith("|") && sep.endsWith(":|"))
    assert(sep.count(_ == ':') == 2, sep) // id and v numeric, s not
    // elision row, and first/last halves present (widths are driven by the
    // types row here: ":int64" = 6 chars)
    assert(out.contains("..."))
    assert(lines(5).matches("\\|\\s+1 \\|\\s+s1 \\|\\s+1.25 \\|"), lines(5))
    assert(out.contains("30.25")) // last row value
    // 5 first + 1 ellipsis + 5 last data lines
    assert(lines.count(_.startsWith("|")) == 2 + 1 + 11) // hdr+types+sep is 3 of them
  }

  test("datasetToStr: styles, single-line policy, width cap, elide header") {
    val df = Seq((1L, "line1\nline2xxxxxx"), (2L, "b")).toDF("id", "s").coalesce(1)
    val repl = Display.datasetToStr(df, opts = PrintOptions())
    assert(repl.contains("line1") && repl.contains("line2xxxxxx"))
    val single = Display.datasetToStr(df,
      opts = PrintOptions(linePolicy = "single", maxColWidth = 4))
    assert(single.contains("line") && !single.contains("line1"))
    val md = Display.datasetToStr(df, opts = PrintOptions(linePolicy = "markdown"))
    assert(md.contains("line1<br>line2xxxxxx"))
    val last = Display.datasetToStr(df.orderBy("id"),
      opts = PrintOptions(style = "last", indexRange = 1, elideHeader = true))
    assert(!last.contains("[2 2]") && !last.contains("| 1 ") && last.contains("b"))
  }

  test("datasetToStr: print-all style and the 20-row default guard") {
    import org.apache.spark.sql.functions.col
    // 50 rows, default options → first-last window of 20 + ellipsis row
    val df = spark.range(50).toDF("id").coalesce(1).orderBy(col("id"))
    val guarded = Display.datasetToStr(df)
    val gLines = guarded.split("\n").count(_.startsWith("|"))
    assert(gLines == 2 + 21, s"got $gLines") // hdr+sep + 10 first + ... + 10 last
    assert(guarded.contains("...") && !guarded.contains("| 25 "))
    // print-range :all — every row, no ellipsis
    val all = Display.datasetToStr(df, opts = PrintOptions(style = "all"))
    assert(all.split("\n").count(_.startsWith("|")) == 2 + 50)
    assert(!all.contains("..."))
  }

  test("datasetToStr on a real table collects only the window") {
    val li = Tables.t(spark, sfDir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    val out = Display.datasetToStr(li, "lineitem", PrintOptions(indexRange = 6))
    assert(out.startsWith("lineitem ["))
    assert(out.contains("...")) // far more rows than the window
    assert(out.split("\n").count(_.startsWith("|")) == 2 + 7) // hdr+sep + 6 rows + ellipsis
  }
}
