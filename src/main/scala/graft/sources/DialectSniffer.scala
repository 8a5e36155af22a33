package graft.sources

/** CSV dialect sniffing — the engine half of the reference's import
  * dialog (Orange/widgets/data/owcsvimport.py:1386-1441 sniff_csv /
  * HeaderSniffer, which wrap Python's csv.Sniffer): from a small text
  * sample, guess the delimiter, the quote character, and whether the
  * first row is a header. The widget UX (interactive overrides) is out
  * of engine scope; the per-column type matrix it feeds is already
  * covered by [[TabReader.ColType]] overrides.
  *
  * Not a port of csv.Sniffer: delimiter choice scores field-count
  * CONSISTENCY across sample lines (modal field count > 1, most lines
  * agreeing wins; candidate order breaks ties), the quote guess looks
  * for a character that actually wraps fields under that delimiter,
  * and the header vote is the reference's documented semantic — for
  * each column where the body rows agree on a type (all-numeric, or a
  * shared constant width), a first-row cell that disagrees votes FOR a
  * header, one that agrees votes against; positive total ⇒ header.
  *
  * Scale note: sniffing reads a bounded local sample (default 4 KB,
  * like the reference) on the driver — never a distributed pass. The
  * distributed read that follows gets an explicit dialect, so the
  * cluster-side plan is identical to a user-specified one.
  */
object DialectSniffer {

  /** A sniffed dialect. `quote` is empty when no quoting was observed
    * (TabReader then keeps its quote-free fast path). */
  final case class Dialect(delimiter: Char, quote: String, hasHeader: Boolean)

  /** Candidate order doubles as the tie-break preference, mirroring the
    * reference's preferred list (csv.Sniffer: ',' '\t' ';' ' ' ':'). */
  val DefaultDelimiters: Seq[Char] = Seq(',', '\t', ';', '|', ':', ' ')

  private val SampleBytes = 4 * 1024

  /** Split one line on `delim`, honoring `quote`-wrapped fields with
    * doubled-quote escapes (RFC 4180). Quote characters are stripped
    * from the returned fields. */
  def splitQuoted(line: String, delim: Char, quote: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inQ = false
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == quote) {
          if (i + 1 < n && line.charAt(i + 1) == quote) { cur.append(quote); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else if (c == quote && cur.length == 0) inQ = true
      else if (c == delim) { out += cur.toString; cur.setLength(0) }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toSeq
  }

  /** Sniff a dialect from sample text. Lines are counted with a
    * provisional '"' quote so quoted delimiters don't skew the field
    * counts (the same trick csv.Sniffer's quoted-regex pass plays). */
  def sniff(sample: String,
            delimiters: Seq[Char] = DefaultDelimiters): Dialect = {
    val allLines = sample.split("\r\n|\r|\n", -1).toSeq
    // a sample cut mid-file usually ends mid-line: drop the fragment
    val lines0 = (if (allLines.size > 1) allLines.dropRight(1) else allLines)
      .filter(_.nonEmpty)
    require(lines0.nonEmpty, "empty sample")
    val lines = lines0.take(64)

    val delim = delimiters.maxBy { d =>
      val counts = lines.map(l => splitQuoted(l, d, '"').size)
      val modal = counts.groupBy(identity).maxBy { case (k, v) =>
        (v.size, k) }._1
      if (modal <= 1) (0, 0, 0)
      // score: lines agreeing with the mode, then the mode's width;
      // the NEGATIVE candidate index would tie-break, but maxBy keeps
      // the FIRST max, so preference order is the sequence order
      else (counts.count(_ == modal), modal, -delimiters.indexOf(d))
    }
    val fieldsPerLine = lines.map(l => splitQuoted(l, delim, '"'))
    val modal = fieldsPerLine.map(_.size)
      .groupBy(identity).maxBy(_._2.size)._1
    if (modal <= 1)
      // no candidate produced >1 field anywhere: single-column file
      return Dialect('\t', "", hasHeader = sniffHeader(lines.map(Seq(_))))

    val rows = fieldsPerLine.filter(_.size == modal)
    // quote guess (csv.Sniffer's _guess_quote_and_delimiter shape): count
    // fields that start at a line/delimiter boundary with the candidate
    // quote and close onto one — a raw start-AND-end test would miss the
    // case quoting exists for, a quoted field CONTAINING the delimiter
    val quote = {
      val d = java.util.regex.Pattern.quote(delim.toString)
      def hits(q: Char): Int = {
        val qq = java.util.regex.Pattern.quote(q.toString)
        val re = (s"(?:^|(?<=$d))$qq[^$qq]*$qq(?=$d|$$)").r
        lines.iterator.map(l => re.findAllIn(l).size).sum
      }
      Seq('"', '\'').map(c => (c, hits(c))).filter(_._2 > 0)
        .sortBy(-_._2).headOption.map(_._1.toString).getOrElse("")
    }

    Dialect(delim, quote, sniffHeader(rows))
  }

  private def numeric(s: String): Boolean =
    s.nonEmpty && (try { s.trim.toDouble; true } catch { case _: NumberFormatException => false })

  /** The reference's has_header vote (owcsvimport.py:1399 HeaderSniffer
    * → csv.Sniffer.has_header): columns whose body agrees on a type
    * vote by whether row 1 conforms. */
  private def sniffHeader(rows: Seq[Seq[String]]): Boolean = {
    if (rows.size < 2) return false
    val first = rows.head
    val body = rows.tail.take(20)
    val votes = first.indices.map { c =>
      val cells = body.map(r => if (c < r.size) r(c) else "")
      if (cells.forall(numeric)) { if (numeric(first(c))) -1 else 1 }
      else {
        val lens = cells.map(_.length).distinct
        if (lens.size == 1) { if (first(c).length == lens.head) -1 else 1 }
        else 0
      }
    }
    votes.sum > 0
  }

  /** Sniff from the head of a file — Hadoop FS + codec factory, the
    * same path and compression handling the distributed body read uses;
    * bounded read, driver only. */
  def sniffFile(spark: org.apache.spark.sql.SparkSession, path: String,
                delimiters: Seq[Char] = DefaultDelimiters): Dialect = {
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
      val buf = new Array[Byte](SampleBytes)
      var off = 0
      var n = 0
      while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
        off += n
      sniff(new String(buf, 0, off, java.nio.charset.StandardCharsets.UTF_8),
        delimiters)
    } finally in.close()
  }
}
