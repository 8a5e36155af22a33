package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Schema
import graft.core.Schema._

/** Orange-native `.tab` reader/writer (reference Orange/data/io_base.py:
  * 117-430, io.py:120-197): tab-separated values with a 3-row header —
  *
  *   row 1: variable names
  *   row 2: type flags — `c`/`continuous`, `d`/`discrete` (or a
  *          space-separated value list), `s`/`string`/`text`,
  *          `t`/`time` (io_base.py:117-156)
  *   row 3: role flags — `class`, `meta`, `w`/`weight`, `i`/`ignore`;
  *          blank = feature (io_base.py:164-193)
  *
  * plus the 1-row prefixed variant (`d#sex`, `c#age`, `m#name`,
  * io_base.py:164-193) and Orange's missing tokens {?, ., "", NA, ~, nan}
  * (variable.py:29) → NULL.
  *
  * Scale design: the 3 header lines are read once on the driver (bounded
  * I/O); the body goes through Spark's distributed CSV reader with an
  * explicit all-string schema, then one projection casts to typed columns
  * — header rows are dropped by predicate, not by a row-index scan, so
  * the read parallelizes like any CSV at 100 TB.
  */
object TabReader {

  /** The reference TimeVariable's full ISO probe list
    * (variable.py:937-972 `_ISO_FORMATS`) as Spark datetime patterns, in
    * the reference's priority order. Notes on the translation:
    *  - `%z` → `Z` (±HHMM offset); a value without an offset fails the
    *    offset patterns and falls through, same as strptime;
    *  - `%f` → `SSSSSS`: Spark parses 1..6 fraction digits leniently
    *    against a 6-S pattern, matching `%f`;
    *  - `%j` → `DDD`; `%Y-%m` stays ahead of `%Y-%j` (the reference pins
    *    this order because unpadded `%j` would also eat "11");
    *  - bare `yyyy` parses exactly 4 digits in Spark, so the compact
    *    date/time numbers (`yyyyMMdd`, …) probed just before it cannot
    *    leak into it;
    *  - time-only values anchor to the Unix epoch date, and values with
    *    no offset read in the session timezone (the engine pins UTC,
    *    where the reference uses localtime). */
  val TimeFormats: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ssZ",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd'T'HH:mm:ssZ",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss.SSSSSSZ",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ",
    "yyyyMMdd'T'HHmmssZ",
    "yyyyMMddHHmmssZ",
    "HH:mm:ss.SSSSSS",
    "HH:mm:ss",
    "HH:mm",
    "yyyyMMdd'T'HHmmss",
    "yyyyMMddHHmmss",
    "yyyyMMdd",
    "yyyyDDD",
    "yyyy",
    "HHmmss.SSSSSS",
    "yyyy-MM",
    "yyyy-DDD")

  /** Locale (non-ISO) date forms — the reference's opt-in
    * ADDITIONAL_FORMATS table (variable.py:985-1051): `%d.%m.%Y`,
    * `%d. %m. %Y`, 2-digit-year variants, US `%m/%d/%Y`, each bare and
    * with the three time suffixes, plus compact `%Y%m%d%H%M`. Spark's
    * `yyyy` requires ≥ 4 digits and `yy` exactly 2, so the two year
    * widths never shadow each other in the probe chain. These are NOT in
    * the default probe: Orange surfaces them only when the user opts in
    * (the CSV-import format picker), and `25.11.2021` is genuinely
    * ambiguous against other locales' `%m.%d.%Y` — same opt-in here
    * (`localeTimes`). */
  val LocaleTimeFormats: Seq[String] = {
    val dates = Seq("d.M.yyyy", "d. M. yyyy", "d.M.yy", "d. M. yy",
      "M/d/yyyy", "M/d/yy")
    val times = Seq(" H:mm", " H:mm:ss", " H:mm:ss.SSSSSS")
    dates.flatMap(d => times.map(d + _)) ++ dates :+ "yyyyMMddHHmm"
  }

  /** First-match parse of a time string through [[TimeFormats]] (plus
    * [[LocaleTimeFormats]] when `locale`) — one codegen'd coalesce over
    * try_to_timestamp probes, NULL only when no format fits (the
    * reference raises; a NULL row surfaces the same rows through
    * IsDefined filters). */
  /** Cheap NECESSARY pre-conditions for pattern `fmt` to parse a string:
    * exact length (every TimeFormats token is fixed-width — Spark's
    * strict `yyyy` rejects 5-digit years, verified; a trailing `Z`
    * zone-offset widens the length to a [L+1, L+6] band) plus the
    * literal separators at their fixed positions. Returns None (no
    * gate) for patterns with variable-width tokens (the locale `d.M.y`
    * family). A gate can only SKIP a parse that was guaranteed to fail:
    * probe semantics (first matching format wins) are unchanged, but a
    * non-matching format costs a length/char compare instead of an
    * exception-driven formatter failure — the probe chain was ~14
    * doomed parse attempts per row for late-format rows. */
  private[graft] def probeGate(c: Column, fmt: String): Option[Column] = {
    var i = 0; var minLen = 0; var maxLen = 0
    var lits = List.empty[(Int, Char)]
    // once a variable-width token (fraction, zone) appears, later
    // positions are no longer fixed — stop pinning literals there
    var varSeen = false
    var ok = true
    def fixed(w: Int): Unit = { minLen += w; maxLen += w }
    def lit1(lc: Char): Unit = {
      if (!varSeen) lits ::= (minLen, lc)
      fixed(1)
    }
    while (ok && i < fmt.length) {
      val ch = fmt(i)
      if (ch == '\'') {
        val end = fmt.indexOf('\'', i + 1)
        if (end < 0) ok = false
        else {
          val body = fmt.substring(i + 1, end)
          (if (body.isEmpty) "'" else body).foreach(lit1)
          i = end + 1
        }
      } else if (ch.isLetter) {
        val run = fmt.substring(i).takeWhile(_ == ch).length
        (ch, run) match {
          case ('y', 4) => fixed(4)
          case ('M', 2) | ('d', 2) | ('H', 2) | ('m', 2) | ('s', 2) =>
            fixed(2)
          case ('D', 3) => fixed(3)
          case ('S', _) =>
            // Spark parses an S-run as a FLEXIBLE fraction (1992-01-02
            // 03:04:05.5 parses under …ss.SSSSSS) — allow 0-9 digits
            maxLen += 9; varSeen = true
          case ('Z', 1) =>
            // zone offset: 'Z' / '+01' / '+0100' / '+01:00'
            minLen += 1; maxLen += 6; varSeen = true
          case _ => ok = false // variable-width or unknown: no gate
        }
        i += run
      } else { lit1(ch); i += 1 }
    }
    if (!ok) None
    else {
      val lenGate =
        if (minLen == maxLen) length(c) === minLen
        else length(c).between(minLen, maxLen)
      Some(lits.reverse.foldLeft(lenGate) { case (g, (p, lc)) =>
        g && substring(c, p + 1, 1) === lc.toString })
    }
  }

  def timeProbe(c: Column, locale: Boolean = false): Column = {
    val fmts = TimeFormats ++ (if (locale) LocaleTimeFormats else Nil)
    coalesce(fmts.map { f =>
      probeGate(c, f) match {
        case Some(g) => when(g, try_to_timestamp(c, lit(f)))
        case None    => try_to_timestamp(c, lit(f))
      }
    }: _*)
  }

  /** Per-column import override (the CSV-import widget's column-type
    * matrix — reference Orange/widgets/utils/textimport.py:151-166
    * `ColumnType`, applied via owcsvimport Options.columntypes). */
  sealed trait ColType
  object ColType {
    case object Skip        extends ColType
    case object Auto        extends ColType
    case object Numeric     extends ColType
    case object Categorical extends ColType
    case object Text        extends ColType
    case object Time        extends ColType
  }

  private case class HVar(name: String, kind: VarKind, role: Role,
                          values: Seq[String])

  private def parseType(t: String): (VarKind, Seq[String]) =
    t.trim match {
      case "c" | "continuous"          => (VarKind.Continuous, Nil)
      case "d" | "discrete"            => (VarKind.Discrete, Nil)
      case "s" | "string" | "text"     => (VarKind.Str, Nil)
      case "t" | "time"                => (VarKind.Time, Nil)
      case "" | "basket"               => (VarKind.Str, Nil)
      case list => // space-separated declared value list (\ escapes space)
        val vals = list.split("(?<!\\\\) ").map(_.replace("\\ ", " ")).toSeq
        (VarKind.Discrete, vals)
    }

  private def parseRole(r: String): (Role, Boolean) =
    r.trim.toLowerCase match {
      case "class" | "c"          => (Role.Target, false)
      case "meta" | "m" | "s"     => (Role.Meta, false)
      case "i" | "ignore"         => (Role.Feature, true)
      case "w" | "weight"         => (Role.Meta, false)
      case _                      => (Role.Feature, false)
    }

  /** Read the first lines of a file through Hadoop FS (works for any
    * Spark-supported filesystem, driver-side, bounded). Compressed files
    * (.gz/.bz2 — reference `_compressed_open`, Orange/data/io.py:126)
    * decompress through the Hadoop codec factory, the same codecs the
    * distributed body read uses. */
  private def headLines(spark: SparkSession, path: String, n: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val codec =
      new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        .getCodec(p)
    val raw = fs.open(p)
    val in: java.io.InputStream =
      if (codec != null) codec.createInputStream(raw) else raw
    try {
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      (1 to n).flatMap(_ => Option(br.readLine()))
    } finally in.close()
  }

  /** Header classification (io_base.py:400-502): 3-row if row2 looks like
    * type flags; 1-row prefixed if names carry `t#name` prefixes; else
    * 1-row plain names with inferred types. `hasHeader = false`
    * (a sniffed headerless .txt/.csv — owcsvimport.py sniff flow
    * rows_to_skip=0 + generated names) skips header classification
    * entirely: line 1 is DATA, column names are synthesized _c0.._cN,
    * and per-column kinds are guessed from the body sample alone. */
  def read(spark: SparkSession, path: String,
           delimiter: String = "\t",
           localeTimes: Boolean = false,
           overrides: Map[String, ColType] = Map.empty,
           quote: String = "",
           hasHeader: Boolean = true): DataFrame = {
    val dRe = java.util.regex.Pattern.quote(delimiter)
    // quote="" keeps the historical quote-free splitting byte-for-byte;
    // a sniffed dialect (Sources.fromDelimited) passes the observed
    // quote so RFC 4180 fields with embedded delimiters survive
    def cells(line: String): Array[String] =
      if (quote.isEmpty) line.split(dRe, -1)
      else DialectSniffer.splitQuoted(line, delimiter.head, quote.head).toArray
    val head = headLines(spark, path, 3)
    require(head.nonEmpty, s"empty .tab file: $path")
    val names: Seq[String] =
      if (hasHeader) cells(head.head).toSeq
      else cells(head.head).indices.map(i => s"_c$i")

    val typeFlag = "^(c|d|s|t|continuous|discrete|string|text|time|basket)$"
    val looks3Row = hasHeader && head.size >= 3 && cells(head(1)).forall { t =>
      t.trim.isEmpty || t.trim.matches(typeFlag) || t.contains(" ") ||
        !t.trim.exists(_.isDigit)
    } && cells(head(2)).forall(r =>
      r.trim.isEmpty || r.trim.toLowerCase.matches("^(class|meta|m|c|s|i|ignore|w|weight)(:.*)?$"))

    val prefixed = hasHeader && names.forall(_.matches("^[cdsmitw]{0,3}#.*")) &&
      names.exists(_.contains("#"))

    val (hvars, skip) =
      if (looks3Row) {
        val types = cells(head(1)).toSeq.padTo(names.size, "")
        val roles = cells(head(2)).toSeq.padTo(names.size, "")
        val hv = names.indices.map { i =>
          val (kind, vals) = parseType(types(i))
          val (role, ignore) = parseRole(roles(i))
          if (ignore) null
          else HVar(names(i), kind, role, vals)
        }
        (hv, 3)
      } else if (prefixed) { // 1-row `d#sex` style (io_base.py:164-193)
        val hv = names.map { n =>
          val Array(flags, name) = n.split("#", 2)
          val kind =
            if (flags.contains("c")) VarKind.Continuous
            else if (flags.contains("d")) VarKind.Discrete
            else if (flags.contains("t")) VarKind.Time
            else if (flags.contains("s")) VarKind.Str
            else VarKind.Continuous
          val role =
            if (flags.contains("i")) null
            else if (flags.contains("m")) Role.Meta
            else if (flags.contains("!") || flags.contains("C")) Role.Target
            else Role.Feature
          if (role == null) null else HVar(name, kind, role, Nil)
        }
        (hv, 1)
      } else {
        // 1 plain header row: per-column kind guessed from a bounded
        // driver-side sample of the body — the reference's column-type
        // guessing (owcsvimport.py settings_version 3 note /
        // textimport.py ColumnType): all-numeric → continuous, few
        // repeated values → discrete, else string. A column the sample
        // misjudges is one override away ([[ColType]]); time columns
        // opt in the same way (the 3-row header declares them
        // explicitly, a plain header cannot).
        // headerless input: line 1 is data, keep it in the sample
        val sample = headLines(spark, path, 101)
          .drop(if (hasHeader) 1 else 0)
          .map(l => cells(l).padTo(names.size, ""))
        def num(s: String): Boolean =
          try { s.trim.toDouble; true }
          catch { case _: NumberFormatException => false }
        val hv = names.zipWithIndex.map { case (n, i) =>
          val vals = sample.map(_(i))
            .filterNot(v => v == null || v.isEmpty ||
              Schema.MissingTokens.contains(v))
          val kind =
            if (vals.isEmpty || vals.forall(num)) VarKind.Continuous
            else {
              val d = vals.distinct.size
              if (d <= 10 && d < vals.size) VarKind.Discrete else VarKind.Str
            }
          HVar(n, kind, Role.Feature, Nil)
        }
        (hv, if (hasHeader) 1 else 0)
      }

    // per-column type overrides (the import widget's column-type matrix,
    // owcsvimport.py Options.columntypes / textimport.py ColumnType:
    // 151-166): the user's choice beats the header/inferred kind;
    // Skip drops the column, Auto keeps the detected kind
    val hvars2 = hvars.map { h =>
      if (h == null) null
      else overrides.get(h.name) match {
        case None | Some(ColType.Auto) => h
        case Some(ColType.Skip)        => null
        case Some(ColType.Numeric)     => h.copy(kind = VarKind.Continuous, values = Nil)
        case Some(ColType.Categorical) => h.copy(kind = VarKind.Discrete)
        case Some(ColType.Text)        => h.copy(kind = VarKind.Str, values = Nil)
        case Some(ColType.Time)        => h.copy(kind = VarKind.Time, values = Nil)
      }
    }

    // Distributed body read: all-string schema, drop header rows by value
    // (they re-appear as data rows since we supply our own schema).
    val rawFields = names.indices.map(i => StructField(s"_c$i", StringType, true))
    val raw = {
      val rd = spark.read
        .option("delimiter", delimiter).option("quote", quote)
      // RFC 4180 escapes a quote by doubling it; Spark's default escape
      // is backslash, so point escape at the quote char when quoting on
      (if (quote.isEmpty) rd else rd.option("escape", quote))
        .schema(StructType(rawFields))
        .csv(path)
    }
    // Drop header rows by exact full-row match — a data row would have to
    // equal the entire header line to be lost. Spark CSV yields NULL for
    // empty cells, so compare through coalesce(…, ''). Blank lines (all
    // cells null) are dropped too.
    val nonBlank = names.indices.map(i => col(s"_c$i").isNotNull).reduce(_ || _)
    val body = head.take(skip).foldLeft(raw.filter(nonBlank)) { (acc, line) =>
      val cs = cells(line).padTo(names.size, "")
      val isHeader = names.indices
        .map(i => coalesce(col(s"_c$i"), lit("")) <=> lit(cs(i)))
        .reduce(_ && _)
      acc.filter(!isHeader)
    }

    val missing = Schema.MissingTokens.toSeq
    val cols = hvars2.zipWithIndex.collect { case (h, i) if h != null =>
      val rawCol = col(s"_c$i")
      val cleaned = when(rawCol.isin(missing: _*), null).otherwise(rawCol)
      val typed = h.kind match {
        case VarKind.Continuous => cleaned.cast(DoubleType)
        case VarKind.Time       => timeProbe(cleaned, localeTimes)
        case _                  => cleaned
      }
      val meta = OVar(h.name, h.kind, h.role, h.values).toField.metadata
      typed.as(h.name, meta)
    }
    body.select(cols: _*)
  }

  /** Write a DataFrame as Orange .csv — same 3-row header as .tab
    * (io_base.py:596-700 routes CSV through the identical header
    * writer), comma-delimited. Round-trips through read(delimiter=","). */
  def writeCsv(df: DataFrame, path: String): Unit =
    write(df, path, delimiter = ",")

  /** Write a DataFrame as Orange .tab with the 3-row header
    * (io_base.py:596-700). Header is derived from the domain metadata. */
  def write(df: DataFrame, path: String, delimiter: String = "\t"): Unit = {
    val dom = Schema.domainOf(df)
    val nameRow = dom.vars.map(_.name).mkString(delimiter)
    val typeRow = dom.vars.map { v => v.kind match {
      case VarKind.Continuous => "c"
      case VarKind.Time       => "t"
      case VarKind.Discrete   =>
        if (v.values.nonEmpty) v.values.map(_.replace(" ", "\\ ")).mkString(" ") else "d"
      case VarKind.Str        => "s"
    }}.mkString(delimiter)
    val roleRow = dom.vars.map(_.role match {
      case Role.Target => "class"; case Role.Meta => "meta"; case _ => ""
    }).mkString(delimiter)

    val spark = df.sparkSession
    import org.apache.hadoop.fs.Path
    val tmp = path + ".body"
    df.select(dom.vars.map(v => coalesce(col(v.name).cast(StringType), lit("?"))): _*)
      .write.mode("overwrite")
      .option("delimiter", delimiter).option("quote", "").csv(tmp)
    // Assemble header + body parts into one file (driver-side copy —
    // .tab is Orange's small-data interchange format; parquet is the
    // engine's scale format).
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val out = fs.create(new Path(path), true)
    out.write((nameRow + "\n" + typeRow + "\n" + roleRow + "\n").getBytes("UTF-8"))
    val parts = fs.listStatus(new Path(tmp)).filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    parts.foreach { st =>
      val in = fs.open(st.getPath)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      finally in.close()
    }
    out.close()
    fs.delete(new Path(tmp), true)
  }
}
