package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Binary `.xls` (BIFF8) reader (reference Orange/data/io.py:246-388
  * ExcelReader, which delegates to xlrd for the legacy format).
  * Dependency-free implementation of the two public specs involved:
  * MS-CFB (the OLE2 compound file container) and MS-XLS (BIFF8 records).
  * Like the xlsx path, parsing is driver-side (xls is a small-data
  * interchange format) and the string grid funnels through the shared
  * .tab header pipeline, so typing/role semantics are identical across
  * all spreadsheet formats.
  *
  * Supported record set: NUMBER, RK, MULRK, LABELSST (with SST/CONTINUE
  * reassembly, compressed and UTF-16 segments), LABEL, BOOLERR, FORMULA
  * (cached numeric/bool results + STRING for cached text), BLANK/MULBLANK
  * (skipped), BOUNDSHEET (sheet registry). Error cells → "" (io.py:275).
  */
object XlsReader {

  // --- MS-CFB container --------------------------------------------------

  private final val EndOfChain = 0xFFFFFFFE
  private final val FreeSect = 0xFFFFFFFF

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

  /** Extract a named stream ("Workbook"/"Book") from a CFB file. */
  private def cfbStream(bytes: Array[Byte], names: Seq[String]): Array[Byte] = {
    require(bytes.length > 512 && i32(bytes, 0) == 0xE011CFD0,
      "not an OLE2 compound file")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val nFat = i32(bytes, 44)
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val nMiniFat = i32(bytes, 64)
    val firstDifat = i32(bytes, 68)
    def sector(sid: Int): Array[Byte] =
      bytes.slice(512 + sid * sectorSize, 512 + (sid + 1) * sectorSize)
    // DIFAT: 109 header entries + chained DIFAT sectors
    val fatSids = mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until 109) {
      val v = i32(bytes, 76 + 4 * i)
      if (v != FreeSect && fatSids.size < nFat) fatSids += v
    }
    var difat = firstDifat
    while (difat != EndOfChain && difat != FreeSect && fatSids.size < nFat) {
      val s = sector(difat)
      val per = sectorSize / 4 - 1
      for (i <- 0 until per) {
        val v = i32(s, 4 * i)
        if (v != FreeSect && fatSids.size < nFat) fatSids += v
      }
      difat = i32(s, sectorSize - 4)
    }
    val fat = fatSids.toArray.flatMap(sid =>
      (0 until sectorSize / 4).map(i => i32(sector(sid), 4 * i)))
    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard < fat.length + 2) {
        out.write(sector(sid)); sid = fat(sid); guard += 1
      }
      out.toByteArray
    }
    // directory entries (128 bytes each)
    val dir = chain(firstDir)
    case class Entry(name: String, start: Int, size: Long)
    val entries = (0 until dir.length / 128).flatMap { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64)
      if (nameLen < 2) None
      else Some(Entry(
        new String(dir.slice(o, o + nameLen - 2), "UTF-16LE"),
        i32(dir, o + 116),
        (i32(dir, o + 120) & 0xFFFFFFFFL)))
    }
    val root = entries.head // type 5 Root Entry holds the mini stream
    val target = names.iterator.flatMap(n => entries.find(_.name == n))
      .nextOption().getOrElse(throw new IllegalArgumentException(
        s"no ${names.mkString("/")} stream (entries: ${entries.map(_.name)})"))
    if (target.size >= miniCutoff) chain(target.start).take(target.size.toInt)
    else {
      // mini stream: walk the miniFAT over the root entry's chain
      val miniStream = chain(root.start)
      val miniFatSids = {
        val buf = mutable.ArrayBuffer.empty[Int]
        var sid = firstMiniFat
        var left = nMiniFat
        while (sid != EndOfChain && sid != FreeSect && left > 0) {
          buf += sid; sid = fat(sid); left -= 1
        }
        buf.toArray
      }
      val miniFat = miniFatSids.flatMap(sid =>
        (0 until sectorSize / 4).map(i => i32(sector(sid), 4 * i)))
      val out = new java.io.ByteArrayOutputStream()
      var sid = target.start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard < miniFat.length + 2) {
        out.write(miniStream.slice(sid * miniSize, (sid + 1) * miniSize))
        sid = miniFat(sid); guard += 1
      }
      out.toByteArray.take(target.size.toInt)
    }
  }

  // --- BIFF8 records -----------------------------------------------------

  private case class Rec(typ: Int, data: Array[Byte])

  private def records(wb: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= wb.length
      def next(): Rec = {
        val t = u16(wb, pos); val len = u16(wb, pos + 2)
        val d = wb.slice(pos + 4, pos + 4 + len)
        pos += 4 + len
        Rec(t, d)
      }
    }

  /** BIFF8 unicode string at data(o): cch chars, grbit, optional
    * rich/ext headers, char data. Returns (string, bytesConsumed).
    * Single-segment form (LABEL, BOUNDSHEET names with cch u8). */
  private def biffString(d: Array[Byte], o: Int, cch: Int): (String, Int) = {
    val grbit = d(o) & 0xFF
    var p = o + 1
    val cRun = if ((grbit & 0x08) != 0) { val v = u16(d, p); p += 2; v } else 0
    val cbExt = if ((grbit & 0x04) != 0) { val v = i32(d, p); p += 4; v } else 0
    val s = if ((grbit & 0x01) != 0) {
      val str = new String(d.slice(p, p + 2 * cch), "UTF-16LE"); p += 2 * cch; str
    } else {
      val str = new String(d.slice(p, p + cch).map(b => (b & 0xFF).toByte),
        "ISO-8859-1"); p += cch; str
    }
    p += 4 * cRun + cbExt
    (s, p - o)
  }

  /** Reassemble the SST across CONTINUE records. A string's character
    * data may split at a segment boundary, where the continuation
    * restarts with a fresh flags byte (possibly switching encoding). */
  private def parseSst(segs: Seq[Array[Byte]]): IndexedSeq[String] = {
    if (segs.isEmpty) return IndexedSeq.empty
    var si = 0
    var p = 8 // skip total + unique counts in the first segment
    def segment = segs(si)
    def remaining = segment.length - p
    def advanceSeg(): Unit = { si += 1; p = 0 }
    def ensure(n: Int): Unit = if (remaining == 0 && n > 0) advanceSeg()
    def readU8(): Int = { ensure(1); val v = segment(p) & 0xFF; p += 1; v }
    def readU16(): Int = {
      ensure(1)
      if (remaining >= 2) { val v = u16(segment, p); p += 2; v }
      else { val lo = readU8(); val hi = readU8(); lo | (hi << 8) }
    }
    def readI32(): Int = { val lo = readU16(); val hi = readU16(); lo | (hi << 16) }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) { ensure(1); val k = math.min(left, remaining); p += k; left -= k }
    }
    val nUnique = { // counts live fully in segment 0
      i32(segs.head, 4)
    }
    val out = mutable.ArrayBuffer.empty[String]
    while (out.size < nUnique && si < segs.length) {
      val cch = readU16()
      var grbit = readU8()
      val cRun = if ((grbit & 0x08) != 0) readU16() else 0
      val cbExt = if ((grbit & 0x04) != 0) readI32() else 0
      val sb = new StringBuilder
      var left = cch
      while (left > 0) {
        if (remaining == 0) { // boundary: fresh flags byte
          advanceSeg()
          grbit = readU8()
        }
        val wide = (grbit & 0x01) != 0
        val avail = if (wide) remaining / 2 else remaining
        val take = math.min(left, avail)
        if (wide) {
          sb.append(new String(segment.slice(p, p + 2 * take), "UTF-16LE"))
          p += 2 * take
        } else {
          sb.append(new String(segment.slice(p, p + take), "ISO-8859-1"))
          p += take
        }
        left -= take
      }
      skip(4 * cRun + cbExt)
      out += sb.toString
    }
    out.toIndexedSeq
  }

  /** Decode an RK value (packed 30-bit number). */
  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 0x01) != 0
    val v =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (div100) v / 100 else v
  }

  /** Render a numeric cell the way the xlsx path sees raw values:
    * integral doubles without the trailing ".0". */
  private def numStr(v: Double): String =
    if (v == math.floor(v) && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  /** Sheet names in workbook order. */
  def sheets(path: String): Seq[String] = {
    val wb = workbookStream(path)
    boundSheets(wb).map(_._1)
  }

  private def workbookStream(path: String): Array[Byte] =
    cfbStream(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      Seq("Workbook", "Book"))

  private def boundSheets(wb: Array[Byte]): Seq[(String, Int)] = {
    val out = mutable.ArrayBuffer.empty[(String, Int)]
    val it = records(wb, 0)
    var depth = 0
    while (it.hasNext) {
      val r = it.next()
      r.typ match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) return out.toSeq
        case 0x0085 if depth == 1 => // BOUNDSHEET
          val offset = i32(r.data, 0)
          val cch = r.data(6) & 0xFF // short unicode string: cch u8
          val (name, _) = biffString(r.data, 7, cch)
          out += ((name, offset))
        case _ =>
      }
    }
    out.toSeq
  }

  /** String grid of the given (or first) sheet, mirroring
    * [[ExcelReader.cells]]: error cells → "", all-empty rows dropped. */
  def cells(path: String, sheet: Option[String] = None): Seq[Seq[String]] = {
    val wb = workbookStream(path)
    val sheetList = boundSheets(wb)
    require(sheetList.nonEmpty, s"no sheets in $path")
    val (_, offset) = sheet match {
      case Some(s) => sheetList.find(_._1 == s)
        .getOrElse(throw new IllegalArgumentException(s"no sheet '$s'"))
      case None => sheetList.head
    }
    // SST lives in the workbook globals substream
    val sstSegs = mutable.ArrayBuffer.empty[Array[Byte]]
    var inSst = false
    val git = records(wb, 0)
    var break = false
    while (git.hasNext && !break) {
      val r = git.next()
      r.typ match {
        case 0x00FC => sstSegs += r.data; inSst = true
        case 0x003C if inSst => sstSegs += r.data
        case 0x000A => break = true
        case _ => inSst = false
      }
    }
    val sst = parseSst(sstSegs.toSeq)

    val grid = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1; var maxCol = -1
    def put(row: Int, colI: Int, v: String): Unit = {
      grid((row, colI)) = v
      if (row > maxRow) maxRow = row
      if (colI > maxCol) maxCol = colI
    }
    val it = records(wb, offset)
    var depth = 0
    var lastFormulaCell: Option[(Int, Int)] = None
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      val d = r.data
      r.typ match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x0203 => // NUMBER
          put(u16(d, 0), u16(d, 2), numStr(f64(d, 6)))
        case 0x027E => // RK
          put(u16(d, 0), u16(d, 2), numStr(rkValue(i32(d, 6))))
        case 0x00BD => // MULRK: row, colFirst, (xf, rk)*, colLast
          val row = u16(d, 0); val colFirst = u16(d, 2)
          val n = (d.length - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, numStr(rkValue(i32(d, 4 + 6 * i + 2))))
        case 0x00FD => // LABELSST
          put(u16(d, 0), u16(d, 2), sst.lift(i32(d, 6)).getOrElse(""))
        case 0x0204 => // LABEL (inline string, cch u16)
          val (s, _) = biffString(d, 8, u16(d, 6))
          put(u16(d, 0), u16(d, 2), s)
        case 0x0205 => // BOOLERR
          val v = d(6) & 0xFF
          put(u16(d, 0), u16(d, 2),
            if ((d(7) & 0xFF) == 1) "" // error cell
            else if (v == 1) "True" else "False")
        case 0x0006 => // FORMULA: cached result in bytes 6..13
          val row = u16(d, 0); val colI = u16(d, 2)
          if (u16(d, 12) == 0xFFFF) (d(6) & 0xFF) match {
            case 0 => lastFormulaCell = Some((row, colI)) // STRING follows
            case 1 => put(row, colI, if ((d(8) & 0xFF) == 1) "True" else "False")
            case _ => put(row, colI, "") // error / empty
          } else put(row, colI, numStr(f64(d, 6)))
        case 0x0207 => // STRING: cached formula text
          lastFormulaCell.foreach { case (row, colI) =>
            val (s, _) = biffString(d, 2, u16(d, 0))
            put(row, colI, s)
          }
          lastFormulaCell = None
        case _ =>
      }
    }
    if (maxRow < 0) return Seq.empty
    (0 to maxRow).map(r => (0 to maxCol).map(c => grid.getOrElse((r, c), "")))
      .filter(_.exists(_.nonEmpty))
  }

  /** Read into a typed DataFrame through the shared .tab pipeline —
    * identical semantics to [[ExcelReader.read]]. */
  def read(spark: SparkSession, path: String,
           sheet: Option[String] = None): DataFrame = {
    val grid = cells(path, sheet)
    require(grid.nonEmpty, s"empty spreadsheet: $path")
    val tmp = java.io.File.createTempFile("graft_xls_", ".tab")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try grid.foreach(r =>
      w.println(r.map(_.replace("\t", " ").replace("\n", " ")).mkString("\t")))
    finally w.close()
    TabReader.read(spark, tmp.getAbsolutePath)
  }
}
