package graft.sources.mergetree

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Access to one attached table's files — local directory or http(s)
  * endpoint. Serializable: shipped inside every input partition so
  * executors fetch their own streams (no driver relay).
  *
  * Http layout note: a real ClickHouse web disk serves a content-hashed
  * object store with metadata indirection (the `store/…` layout the
  * `clickhouse-static-files-disk-uploader` emits); that indirection is
  * NOT implemented. The supported http convention is the plain part
  * tree — `<endpoint>/<part>/<file>` — plus a `.index` listing file at
  * the endpoint root naming every served path (one relative path per
  * line), which stands in for directory listing that bare HTTP cannot
  * do. Endpoints without `.index` refuse loudly at ATTACH.
  */
private[mergetree] sealed trait TableFiles extends Serializable {
  def list(): Seq[String]                 // all relative paths
  def smallFile(rel: String): Array[Byte] // marks, columns.txt, count.txt
  def seekable(rel: String): SeekableFile // .bin streams
  final def exists(rel: String): Boolean = list().contains(rel)
  final def text(rel: String): String = new String(smallFile(rel), UTF_8)

  /** Part directories present, sorted — `all_1_1_0`-shaped names. */
  final def partDirs(): Seq[String] = {
    val re = TableFiles.PartNameRe
    list().map(_.split('/').head).distinct.filter(re.matches(_)).sorted
  }
}

private[mergetree] object TableFiles {
  val PartNameRe = "^[A-Za-z0-9-]+_\\d+_\\d+_\\d+(_\\d+)?$".r

  def apply(endpoint: String): TableFiles =
    if (endpoint.startsWith("http://") || endpoint.startsWith("https://"))
      HttpTableFiles(endpoint.stripSuffix("/"))
    else LocalTableFiles(endpoint.stripPrefix("file://").stripSuffix("/"))

  /** Does this endpoint look like a MergeTree part tree at all? Used by
    * the catalog to route between parquet and MergeTree data paths. */
  def looksLikeMergeTree(endpoint: String): Boolean =
    try {
      val tf = apply(endpoint)
      tf.partDirs().exists(p => tf.exists(s"$p/columns.txt"))
    } catch { case _: Exception => false }
}

private[mergetree] final case class LocalTableFiles(root: String) extends TableFiles {
  def list(): Seq[String] = {
    val base = Paths.get(root)
    if (!Files.isDirectory(base)) Seq.empty
    else {
      val out = Seq.newBuilder[String]
      Files.walk(base).forEach { p =>
        if (Files.isRegularFile(p)) out += base.relativize(p).toString
      }
      out.result()
    }
  }
  def smallFile(rel: String): Array[Byte] = Files.readAllBytes(Paths.get(root, rel))
  def seekable(rel: String): SeekableFile = new SeekableFile(s"$root/$rel")
}

/** Http endpoint with a `.index` listing. Stream files are fetched once
  * per executor into a content-addressed cache dir and then read with
  * random access — repeated splits of the same part reuse the download.
  * (Range requests would avoid whole-file fetches; endpoint support is
  * not assumed. At fixture scale whole-file is fine; the cache bounds
  * the cost to one fetch per file per executor.) */
private[mergetree] final case class HttpTableFiles(endpoint: String) extends TableFiles {
  @transient private lazy val index: Seq[String] = {
    val in = new java.net.URI(s"$endpoint/.index").toURL.openConnection()
    in.setConnectTimeout(30000)
    in.setReadTimeout(120000)
    val s = scala.io.Source.fromInputStream(in.getInputStream, "UTF-8")
    try s.getLines().map(_.trim).filter(_.nonEmpty).toList finally s.close()
  }
  def list(): Seq[String] = index
  def smallFile(rel: String): Array[Byte] = {
    val in = graft.sources.Sources.openHttpStream(s"$endpoint/$rel")
    try in.readAllBytes() finally in.close()
  }
  def seekable(rel: String): SeekableFile =
    new SeekableFile(HttpTableFiles.cached(s"$endpoint/$rel"))
}

private[mergetree] object HttpTableFiles {
  /** Download-once cache, keyed by URL hash; atomic rename so concurrent
    * tasks never see a torn file. */
  def cached(url: String): String = {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes(UTF_8)).take(16).map("%02x".format(_)).mkString
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_mt_cache")
    Files.createDirectories(dir)
    val dest = dir.resolve(key)
    if (!Files.exists(dest)) {
      val tmp = Files.createTempFile(dir, key, ".part")
      val in = graft.sources.Sources.openHttpStream(url)
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING) finally in.close()
      try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    }
    dest.toString
  }
}

/** One part's metadata, read driver-side at planning: `columns.txt`
  * (names + CH types), `count.txt` (rows), and the `.mrk2` marks of
  * every substream (granule boundaries for splitting and seeking). */
private[mergetree] final case class PartMeta(
    name: String,
    columns: Seq[(String, String)], // name -> CH type string
    rows: Long,
    granuleRows: Array[Int])

private[mergetree] object PartMeta {

  /** `columns format version: 1` header, then `N columns:`, then one
    * backquoted `\`name\` Type` per line. */
  def parseColumnsTxt(text: String): Seq[(String, String)] = {
    val lines = text.linesIterator.toSeq
    require(lines.headOption.exists(_.startsWith("columns format version: 1")),
      s"unsupported columns.txt header: ${lines.headOption.getOrElse("<empty>")}")
    lines.drop(2).filter(_.nonEmpty).map { l =>
      require(l.startsWith("`"), s"unparseable columns.txt line: $l")
      val end = l.indexOf('`', 1)
      (l.substring(1, end), l.substring(end + 1).trim)
    }
  }

  def marksOf(tf: TableFiles, part: String, stream: String): Array[ColumnCodec.Mark] = {
    val rel = s"$part/$stream.mrk2"
    require(tf.exists(rel), {
      val cmrk = s"$part/$stream.cmrk2"
      val mrk = s"$part/$stream.mrk"
      if (tf.exists(cmrk)) s"compressed marks ($cmrk) are not supported — write plain .mrk2"
      else if (tf.exists(mrk)) s"fixed-granularity .mrk marks ($mrk) are not supported — only adaptive .mrk2"
      else s"missing marks file $rel"
    })
    val b = tf.smallFile(rel)
    require(b.length % 24 == 0, s"$rel length ${b.length} not a multiple of 24")
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(b.length / 24)(
      ColumnCodec.Mark(bb.getLong(), bb.getLong(), bb.getLong()))
  }

  /** First-key-column value per granule from `primary.idx` (entries are
    * ALL key columns' first-row values concatenated; trailing columns
    * are read and discarded). None when the index is absent/empty or a
    * key type falls outside the scalar subset — callers then simply
    * don't prune. A final-mark entry, if present, is ignored. */
  def primaryIndex(
      tf: TableFiles,
      part: String,
      keyTypes: Seq[ChType],
      granules: Int): Option[Array[Any]] = {
    if (keyTypes.isEmpty || !tf.exists(s"$part/primary.idx")) return None
    val bytes = tf.smallFile(s"$part/primary.idx")
    if (bytes.isEmpty) return None
    try {
      val r = new PlainBinReader(bytes)
      val out = new Array[Any](granules)
      var g = 0
      while (g < granules) {
        out(g) = readKeyScalar(r, keyTypes.head)
        keyTypes.tail.foreach(t => readKeyScalar(r, t))
        g += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Key-value decode off the PLAIN index stream. Enums come back as
    * their CODE (CH's ordering domain — [[KeyOrdering]] compares codes);
    * LowCardinality keys are stored as plain inner values. */
  private def readKeyScalar(r: PlainBinReader, t: ChType): Any = {
    import ChType._
    t match {
      case LowCardinalityT(inner) => readKeyScalar(r, inner)
      case FixedInt(1, true) => r.readByte().toByte.toLong
      case FixedInt(1, false) => r.readByte().toLong
      case FixedInt(2, true) => r.readShortLE().toLong
      case FixedInt(2, false) => (r.readShortLE() & 0xFFFF).toLong
      case FixedInt(4, true) => r.readIntLE().toLong
      case FixedInt(4, false) => r.readIntLE() & 0xFFFFFFFFL
      case FixedInt(8, _) => r.readLongLE()
      case F32 => r.readFloatLE().toDouble
      case F64 => r.readDoubleLE()
      case Str => r.readString()
      case FixedStr(n) => new String(r.readBytes(n), java.nio.charset.StandardCharsets.UTF_8)
      case Date16 => (r.readShortLE() & 0xFFFF).toLong
      case Date32T => r.readIntLE().toLong
      case DateTime32 => (r.readIntLE() & 0xFFFFFFFFL) * 1000000L
      case DateTime64T(scale) =>
        val ticks = r.readLongLE()
        val f = math.pow(10, math.abs(6 - scale)).toLong
        if (scale <= 6) ticks * f else ticks / f
      case e: Enum => if (e.bytes == 1) r.readByte().toByte.toLong else r.readShortLE().toLong
      case BoolT => if (r.readByte() != 0) 1L else 0L
      case other => throw new IllegalArgumentException(s"key type $other")
    }
  }

  def read(tf: TableFiles, part: String): PartMeta = {
    val cols = parseColumnsTxt(tf.text(s"$part/columns.txt"))
    val rows = tf.text(s"$part/count.txt").trim.toLong
    val firstStream = ChType.rowGranularStream(cols.head._1, ChType.parse(cols.head._2))
    val marks = marksOf(tf, part, firstStream)
    val granules = marks.map { m =>
      require(m.rows <= Int.MaxValue, s"granule of ${m.rows} rows"); m.rows.toInt
    }
    require(granules.map(_.toLong).sum == rows,
      s"part $part: count.txt says $rows rows but marks sum to ${granules.map(_.toLong).sum}")
    PartMeta(part, cols, rows, granules)
  }
}
