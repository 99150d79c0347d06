package graft.sources

import java.io.{BufferedInputStream, DataInput, DataInputStream, EOFException, FileInputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native RData/RDS scan (S7) — the reference persists its project
  * stage as `save(all_projects, file = "projects/project_data_<y>.RData")`
  * and reloads it with `load()` (`code/06_fetch_projects.R:78`,
  * `code/07_process_project_data.R:28`). The format is R's public
  * serialization stream (documented in "R Internals", §Serialization
  * Formats): gzip over an XDR (big-endian) token stream — both codecs
  * ship with the JDK, so no R and no new dependency.
  *
  * Coverage is the data-bearing subset that `save()`d data.frames /
  * data.tables actually use, verified against the committed upstreams:
  * NILSXP/NILVALUE, SYMSXP, LISTSXP, CHARSXP (UTF-8/Latin-1, NA),
  * LGLSXP, INTSXP, REALSXP, STRSXP, VECSXP, RAWSXP, EXTPTRSXP
  * (data.table's `.internal.selfref`), REFSXP, and the ALTREP forms a
  * modern R emits for data.frames (compact_{int,real}seq, wrap_*).
  * Factors decode to their labels, R NAs (INT_MIN, the 0x7A2-payload
  * NaN, CHARSXP length -1) become SQL NULLs. Anything outside that set
  * fails loudly with the offending type — no silent misreads.
  *
  * Scale note: like [[XlsxSource]], an RData blob is a DRIVER-SIDE
  * boundary by nature — one gzip stream with back-references is
  * unsplittable, and the reference's files are per-year KB..MB stages.
  * The parse happens once on the driver and the rows become an ordinary
  * DataFrame; anything 100 TB-sized lands via the parquet/CSV scans
  * (the q49/q50/q59 staging path keeps RData→parquet conversion for
  * bulk data, as SURVEY §2.1 prescribes).
  */
object RDataSource {

  // ---- public API --------------------------------------------------------

  /** Top-level binding names in file order (an .rds payload, which has
    * no bindings, reports a single synthetic "value"). */
  def bindings(path: String): Seq[String] =
    parse(path).map(_._1)

  /** Read one saved data.frame/data.table as a DataFrame. With no
    * binding name, the file must contain exactly one data.frame. */
  def readDataFrame(spark: SparkSession, path: String, binding: String = null): DataFrame = {
    val frames = parse(path).collect { case (n, v: RVec) if isFrame(v) => (n, v) }
    val hit = Option(binding) match {
      case Some(b) =>
        frames.collectFirst { case (`b`, v) => v }.getOrElse(
          throw new IllegalArgumentException(
            s"$path: no data.frame binding '$b'; has: ${frames.map(_._1).mkString(", ")}"))
      case None =>
        require(frames.length == 1,
          s"$path: expected exactly one data.frame binding, found ${frames.map(_._1).mkString(", ")}")
        frames.head._2
    }
    toDataFrame(spark, hit, path)
  }

  // ---- parsed-object model ----------------------------------------------

  private sealed trait RObj
  private case object RNull extends RObj
  private final case class RSym(name: String) extends RObj
  private case object RExtPtr extends RObj
  private final case class RChar(value: String) extends RObj // value null = NA
  private final case class RPair(tag: RObj, car: RObj, cdr: RObj) extends RObj
  private final case class RInt(values: Array[Int], attrs: Map[String, RObj]) extends RObj
  private final case class RReal(values: Array[java.lang.Double], attrs: Map[String, RObj]) extends RObj
  private final case class RLgl(values: Array[Int], attrs: Map[String, RObj]) extends RObj
  private final case class RRaw(values: Array[Byte], attrs: Map[String, RObj]) extends RObj
  private final case class RStr(values: IndexedSeq[String], attrs: Map[String, RObj]) extends RObj
  private final case class RVec(values: IndexedSeq[RObj], attrs: Map[String, RObj]) extends RObj

  /** R serializes NA_real_ as an IEEE NaN with payload 1954 (the year R
    * counts from) — distinct from computational NaNs, which stay NaN. */
  private val NaRealBits = 0x7ff00000000007a2L

  // ---- stream parsing ----------------------------------------------------

  /** Parse a .RData (pairlist of bindings) or .rds (bare object). */
  private def parse(path: String): Seq[(String, RObj)] = {
    val raw = new BufferedInputStream(new FileInputStream(path))
    try {
      raw.mark(2)
      val m1 = raw.read(); val m2 = raw.read()
      raw.reset()
      val stream = // save() gzips by default; save(compress=FALSE) does not
        if (m1 == 0x1f && m2 == 0x8b) new GZIPInputStream(raw) else raw
      val in = new DataInputStream(new BufferedInputStream(stream))

      // .RData magic "RDX2\n"/"RDX3\n"; .rds streams start at the format byte
      val first = in.readByte().toChar
      val isWorkspace = first == 'R'
      if (isWorkspace) {
        val rest = Array.fill(4)(in.readByte().toChar).mkString
        require(rest.startsWith("DX") && (rest(2) == '2' || rest(2) == '3'),
          s"$path: not an RData file (magic R$rest)")
      }
      val fmt = (if (isWorkspace) in.readByte().toChar else first).toString + in.readByte().toChar
      require(fmt == "X\n", s"$path: only XDR serialization is supported (format '$fmt')")
      val version = in.readInt()
      in.readInt(); in.readInt() // writer / min-reader versions
      require(version == 2 || version == 3, s"$path: serialization version $version")
      if (version == 3) { // native-encoding declaration, v3 only
        val n = in.readInt()
        in.skipBytes(n)
      }

      val top = new Reader(in, path).readItem()
      top match {
        case RNull => Seq.empty
        case p: RPair => // workspace: pairlist of (symbol -> value)
          val out = Seq.newBuilder[(String, RObj)]
          var cur: RObj = p
          while (cur != RNull) cur match {
            case RPair(RSym(n), v, cdr) => out += ((n, v)); cur = cdr
            case other => throw new IllegalArgumentException(
              s"$path: malformed workspace binding list ($other)")
          }
          out.result()
        case single => Seq(("value", single)) // .rds payload
      }
    } finally raw.close()
  }

  private final class Reader(in: DataInput, path: String) {
    private val refs = ArrayBuffer.empty[RObj]

    private def pairsToMap(obj: RObj): Map[String, RObj] = {
      val out = Map.newBuilder[String, RObj]
      var cur = obj
      while (cur != RNull) cur match {
        case RPair(RSym(n), v, cdr) => out += ((n, v)); cur = cdr
        case other => throw new IllegalArgumentException(
          s"$path: malformed attribute pairlist ($other)")
      }
      out.result()
    }

    private def readAttrs(has: Boolean): Map[String, RObj] =
      if (!has) Map.empty else pairsToMap(readItem())

    def readItem(): RObj = {
      val flags = in.readInt()
      val t = flags & 0xff
      val levels = flags >>> 12
      val hasAttr = ((flags >> 9) & 1) == 1
      val hasTag = ((flags >> 10) & 1) == 1
      t match {
        case 0 | 254 => RNull // NILSXP / NILVALUE
        case 255 => // REFSXP: index packed in flags, or explicit when 0
          val packed = flags >>> 8
          val idx = if (packed == 0) in.readInt() else packed
          refs(idx - 1)
        case 1 => // SYMSXP: printname, then entered into the ref table
          val name = readItem() match {
            case RChar(s) => s
            case other => throw new IllegalArgumentException(s"$path: symbol name $other")
          }
          val sym = RSym(name); refs += sym; sym
        case 2 => // LISTSXP node: [attrs] [tag] car cdr (node attrs unused)
          readAttrs(hasAttr)
          val tag = if (hasTag) readItem() else RNull
          val car = readItem()
          val cdr = readItem()
          RPair(tag, car, cdr)
        case 9 => // CHARSXP: length -1 = NA; levels carry the encoding
          val n = in.readInt()
          if (n == -1) RChar(null)
          else {
            val b = new Array[Byte](n)
            in.readFully(b)
            val cs = if ((levels & 4) != 0) "ISO-8859-1" else "UTF-8"
            RChar(new String(b, cs))
          }
        case 10 =>
          val n = in.readInt()
          val v = Array.fill(n)(in.readInt())
          RLgl(v, readAttrs(hasAttr))
        case 13 =>
          val n = in.readInt()
          val v = Array.fill(n)(in.readInt())
          RInt(v, readAttrs(hasAttr))
        case 14 =>
          val n = in.readInt()
          val v = new Array[java.lang.Double](n)
          var i = 0
          while (i < n) {
            val bits = in.readLong()
            v(i) = if (bits == NaRealBits) null else java.lang.Double.longBitsToDouble(bits)
            i += 1
          }
          RReal(v, readAttrs(hasAttr))
        case 16 =>
          val n = in.readInt()
          val v = (0 until n).map(_ => readItem() match {
            case RChar(s) => s
            case other => throw new IllegalArgumentException(s"$path: STRSXP element $other")
          })
          RStr(v, readAttrs(hasAttr))
        case 19 =>
          val n = in.readInt()
          val v = (0 until n).map(_ => readItem())
          RVec(v, readAttrs(hasAttr))
        case 22 => // EXTPTRSXP enters the ref table BEFORE its prot/tag
          refs += RExtPtr
          readItem(); readItem()
          RExtPtr
        case 24 =>
          val n = in.readInt()
          val b = new Array[Byte](n)
          in.readFully(b)
          RRaw(b, readAttrs(hasAttr))
        case 238 => altrep()
        case other => throw new IllegalArgumentException(
          s"$path: unsupported SEXP type $other in serialized stream " +
            "(only the data-bearing subset a saved data.frame uses is readable)")
      }
    }

    /** ALTREP: serialized class descriptor (class sym, package sym,
      * type), then the class-specific state, then the OBJECT's
      * attributes — for wrap_* forms that trailing slot carries the
      * wrapped vector's real attributes (class/levels/names), so it must
      * be re-attached, not skipped. Decodes the forms R emits for saved
      * data.frames; anything else is loud. */
    private def altrep(): RObj = {
      val info = readItem()
      val state = readItem()
      val attrs = pairsToMap(readItem())
      val className = info match {
        case RPair(_, RSym(n), _) => n
        case other => throw new IllegalArgumentException(s"$path: ALTREP info $other")
      }
      def withAttrs(o: RObj): RObj = if (attrs.isEmpty) o else o match {
        case RInt(v, a) => RInt(v, a ++ attrs)
        case RReal(v, a) => RReal(v, a ++ attrs)
        case RLgl(v, a) => RLgl(v, a ++ attrs)
        case RStr(v, a) => RStr(v, a ++ attrs)
        case RVec(v, a) => RVec(v, a ++ attrs)
        case other => other
      }
      (className, state) match {
        case ("compact_intseq", RReal(Array(n, start, step), _)) =>
          withAttrs(RInt(Array.tabulate(n.toInt)(i => (start + i * step).toInt), Map.empty))
        case ("compact_realseq", RReal(Array(n, start, step), _)) =>
          withAttrs(RReal(Array.tabulate[java.lang.Double](n.toInt)(i => start + i * step), Map.empty))
        case (w, RPair(_, wrapped, _)) if w.startsWith("wrap_") =>
          withAttrs(wrapped) // wrapper state = CONS(data, metadata)
        case _ => throw new IllegalArgumentException(
          s"$path: unsupported ALTREP class '$className'")
      }
    }
  }

  // ---- data.frame → DataFrame -------------------------------------------

  private def isFrame(v: RVec): Boolean = v.attrs.get("class").exists {
    case RStr(cls, _) => cls.contains("data.frame")
    case _ => false
  }

  private def classesOf(attrs: Map[String, RObj]): Seq[String] = attrs.get("class") match {
    case Some(RStr(cls, _)) => cls.filter(_ != null)
    case _ => Nil
  }

  private def isFactor(attrs: Map[String, RObj]): Boolean =
    classesOf(attrs).contains("factor")

  private def toDataFrame(spark: SparkSession, frame: RVec, path: String): DataFrame = {
    val names = frame.attrs.get("names") match {
      case Some(RStr(n, _)) => n
      case _ => throw new IllegalArgumentException(s"$path: data.frame without names")
    }
    require(names.length == frame.values.length, s"$path: names/column mismatch")

    // a classed numeric vector is NOT a plain number — decoding it as
    // its serial representation would be a silent misread (a Date is
    // days-since-epoch, POSIXct seconds-since-epoch), so model the two
    // time classes and fail loudly on anything else classed
    def vetClasses(nm: String, a: Map[String, RObj], allowed: String*): Unit = {
      val unknown = classesOf(a).filterNot(allowed.contains)
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"$path: column '$nm' has unsupported R class ${unknown.mkString("/")}")
    }
    val cols: Seq[(StructField, Int => Any)] = names.zip(frame.values).map {
      case (nm, RInt(v, a)) if isFactor(a) =>
        vetClasses(nm, a, "factor", "ordered")
        val levels = a("levels") match {
          case RStr(l, _) => l
          case other => throw new IllegalArgumentException(s"$path: factor levels $other")
        }
        (StructField(nm, StringType), (i: Int) =>
          if (v(i) == Int.MinValue) null else levels(v(i) - 1))
      case (nm, RInt(v, a)) if classesOf(a).contains("Date") =>
        vetClasses(nm, a, "Date")
        (StructField(nm, DateType), (i: Int) =>
          if (v(i) == Int.MinValue) null else java.time.LocalDate.ofEpochDay(v(i).toLong))
      case (nm, RReal(v, a)) if classesOf(a).contains("Date") =>
        vetClasses(nm, a, "Date")
        (StructField(nm, DateType), (i: Int) =>
          if (v(i) == null) null else java.time.LocalDate.ofEpochDay(math.floor(v(i)).toLong))
      case (nm, RReal(v, a)) if classesOf(a).contains("POSIXct") =>
        vetClasses(nm, a, "POSIXct", "POSIXt")
        (StructField(nm, TimestampType), (i: Int) =>
          if (v(i) == null) null
          else java.time.Instant.ofEpochSecond(math.floor(v(i)).toLong,
            math.round((v(i) - math.floor(v(i))) * 1e9)))
      case (nm, RInt(v, a)) =>
        vetClasses(nm, a)
        (StructField(nm, IntegerType), (i: Int) =>
          if (v(i) == Int.MinValue) null else v(i))
      case (nm, RReal(v, a)) =>
        vetClasses(nm, a)
        (StructField(nm, DoubleType), (i: Int) => v(i))
      case (nm, RLgl(v, a)) =>
        vetClasses(nm, a)
        (StructField(nm, BooleanType), (i: Int) =>
          if (v(i) == Int.MinValue) null else v(i) != 0)
      case (nm, RStr(v, a)) =>
        vetClasses(nm, a)
        (StructField(nm, StringType), (i: Int) => v(i))
      case (nm, other) => throw new IllegalArgumentException(
        s"$path: column '$nm' has unsupported column type ${other.getClass.getSimpleName}")
    }

    val nRows = frame.values.headOption.map {
      case RInt(v, _) => v.length
      case RReal(v, _) => v.length
      case RLgl(v, _) => v.length
      case RStr(v, _) => v.length
      case _ => 0
    }.getOrElse(0)

    val schema = StructType(cols.map(_._1))
    val rows = new java.util.ArrayList[Row](nRows)
    var i = 0
    while (i < nRows) {
      rows.add(Row.fromSeq(cols.map(_._2(i))))
      i += 1
    }
    spark.createDataFrame(rows, schema)
  }
}
