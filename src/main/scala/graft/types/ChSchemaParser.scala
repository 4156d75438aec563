package graft.types

import org.apache.spark.sql.types._

/** ClickHouse schema-string → Spark `StructType`.
  *
  * The reference embeds schema-on-read DDL strings in every CSV table
  * function call (`'pickup_date Date, id UInt64, vendor_id String, …'`,
  * reference `temporal/workflow_query_executor_test.go:44`) and a full
  * 63-column CREATE column list in the `github_events` ATTACH
  * (`temporal/workflow_query_executor_test.go:85`). This parser covers
  * every type observed there (SURVEY §1.2) plus the common CH scalar
  * types, mapped per the table in SURVEY §1.2:
  *
  *   - unsigned ints widen to the next signed Spark type (UInt8→Short,
  *     UInt16→Int, UInt32→Long); UInt64→Long with a documented range
  *     caveat (DecimalType(20,0) is the lossless escape hatch).
  *   - `LowCardinality(T)` is a storage hint — unwrap (Parquet dictionary
  *     encoding plays the same role transparently).
  *   - `Enum8/16('name'=code,…)` → StringType; the name↔code map is kept
  *     in column metadata so `CAST(enum AS Int)` compat can be layered on.
  *   - `Nullable(T)` → T with nullable=true; bare columns are modeled
  *     nullable too (CSV-on-read reality), but the flag is recorded.
  */
object ChSchemaParser {

  /** `name -> PURE CH type string` pairs of a `col Type, col Type`
    * list — BOTH name spellings (backquoted and bare), shared by the
    * schema parse, the CTAS/maintenance DDL reader, and DESCRIBE
    * (review finding: a hand-rolled copy assumed backquotes and threw
    * on the bare spelling). Column OPTIONS (`DEFAULT expr`,
    * `CODEC(…)`, `COMMENT '…'`) are validated and STRIPPED — every
    * consumer of the type string (wire headers, columns.txt, casts)
    * needs the bare type; [[columnDefs]] keeps the options. */
  def columnPairs(schema: String): Seq[(String, String)] =
    columnDefs(schema).map { case (n, t, _) => (n, t) }

  /** `(name, pure type, options)` triples. Supported options:
    * `DEFAULT <expr>` (applied by INSERT for unmentioned columns),
    * `CODEC(…)` (a storage hint — recorded, compression is the
    * engine's own), `COMMENT '…'` (cosmetic). `MATERIALIZED`/`ALIAS`/
    * column-level `TTL` refuse loudly: always-computed columns,
    * query-time aliases, and merge-time value expiry are semantics
    * this engine does not implement — silently dropping them would
    * corrupt reads. */
  def columnDefs(schema: String): Seq[(String, String, Map[String, String])] =
    splitTopLevel(schema, ',').filter(_.trim.nonEmpty).map { colDef =>
      val t = colDef.trim
      val (name, rest) =
        if (t.startsWith("`")) {
          val end = t.indexOf('`', 1)
          require(end > 0, s"unterminated backquote in column def: $t")
          (t.substring(1, end), t.substring(end + 1).trim)
        } else {
          val sp = t.indexWhere(_.isWhitespace)
          require(sp > 0, s"missing type in column def: $t")
          (t.substring(0, sp), t.substring(sp + 1).trim)
        }
      val (tpe, opts) = typeAndOptions(rest)
      require(tpe.nonEmpty,
        s"column $name: an explicit type is required (CH's type-less " +
          "DEFAULT inference is not supported)")
      Seq("materialized", "alias", "ttl").foreach { bad =>
        if (opts.contains(bad)) throw new IllegalArgumentException(
          s"column $name: ${bad.toUpperCase} columns are not supported " +
            "(always-computed columns / query-time aliases / per-column " +
            "TTL are unimplemented semantics — refusing beats silently " +
            "dropping them)")
      }
      (name, tpe, opts)
    }

  private val OptionKws = Seq("DEFAULT", "MATERIALIZED", "ALIAS",
    "CODEC", "TTL", "COMMENT")

  /** Split a column-def TAIL (after the name) into the pure type and
    * its options — the option keywords are matched at paren depth 0
    * outside quotes, so `Enum8('DEFAULT' = 1)` and `lower(comment)`
    * stay part of the type/expression. */
  def typeAndOptions(rest0: String): (String, Map[String, String]) = {
    val rest = rest0.trim
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < rest.length) {
      val c = rest.charAt(i)
      if (inQuote) {
        if (c == '\\') i += 1 else if (c == '\'') inQuote = false
        i += 1
      } else if (c == '\'') { inQuote = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && c.isLetter &&
          (i == 0 || rest.charAt(i - 1).isWhitespace)) {
        OptionKws.find(k => rest.regionMatches(true, i, k, 0, k.length) &&
            (i + k.length == rest.length ||
              (!rest.charAt(i + k.length).isLetterOrDigit &&
                rest.charAt(i + k.length) != '_'))) match {
          case Some(k) => hits += ((i, k)); i += k.length
          case None =>
            while (i < rest.length && (rest.charAt(i).isLetterOrDigit ||
                rest.charAt(i) == '_')) i += 1
        }
      } else i += 1
    }
    if (hits.isEmpty) (rest, Map.empty)
    else {
      val tpe = rest.substring(0, hits.head._1).trim
      val opts = hits.zipWithIndex.map { case ((pos, kw), idx) =>
        val end = if (idx + 1 < hits.length) hits(idx + 1)._1 else rest.length
        kw.toLowerCase -> rest.substring(pos + kw.length, end).trim
      }.toMap
      (tpe, opts)
    }
  }

  /** Parse a full `col Type, col Type` list. Column names may be
    * backquoted. Throws IllegalArgumentException on malformed input with
    * the offending fragment — misuse fails fast, not at scan time. */
  def parse(schema: String): StructType = {
    val fields = columnDefs(schema).map { case (name, tpe, opts) =>
      val (dt, declaredNullable, meta) = parseType(tpe)
      // schema-on-read pragmatism: the Spark field is always nullable
      // (CSV rows may omit values), but the DECLARED nullability is
      // recorded so catalog layers can surface CH's contract
      meta.putBoolean("ch.nullable", declaredNullable)
      // the declared DEFAULT expr (CH dialect) — INSERT applies it to
      // unmentioned columns
      opts.get("default").foreach(meta.putString("ch.default", _))
      StructField(name, dt, nullable = true, metadata = meta.build())
    }
    StructType(fields)
  }

  /** Parse a single CH type expression into (sparkType, declaredNullable,
    * metadata). */
  def parseType(ch: String): (DataType, Boolean, MetadataBuilder) = {
    val t = ch.trim
    val meta = new MetadataBuilder()
    val paren = t.indexOf('(')
    val (head, args) =
      if (paren >= 0 && t.endsWith(")"))
        (t.substring(0, paren).trim, t.substring(paren + 1, t.length - 1))
      else (t, "")
    head match {
      case "Nullable" =>
        val (dt, _, m) = parseType(args); (dt, true, m)
      case "LowCardinality" =>
        // a storage hint for Spark (parquet dictionary encoding plays
        // the role), but RECORDED in field metadata: the native door
        // re-emits the LC transport for result columns that declared
        // it (r15 — r14 decoded LC inbound but always emitted plain)
        val (dt, n, m) = parseType(args)
        (dt, n, m.putBoolean("ch.lowcardinality", true))
      case "Array" =>
        val (el, elNull, _) = parseType(args)
        (ArrayType(el, containsNull = elNull), false, meta)
      case "Map" =>
        val kv = splitTopLevel(args, ',')
        require(kv.length == 2, s"Map needs 2 type args: $t")
        val (k, _, _) = parseType(kv(0)); val (v, vNull, _) = parseType(kv(1))
        (MapType(k, v, valueContainsNull = vNull), false, meta)
      case "Tuple" =>
        val els = splitTopLevel(args, ',').map(_.trim)
        val fields = els.zipWithIndex.map { case (el, i) =>
          // named tuple element: `name Type`; positional: `_1 .. _n` like CH
          val sp = el.indexWhere(_.isWhitespace)
          val looksNamed = sp > 0 && !el.contains("(") ||
            (sp > 0 && el.indexOf('(') > sp)
          if (looksNamed) {
            val (dt, n, _) = parseType(el.substring(sp + 1)); StructField(el.substring(0, sp), dt, n)
          } else {
            val (dt, n, _) = parseType(el); StructField(s"_${i + 1}", dt, n)
          }
        }
        (StructType(fields), false, meta)
      case "Enum8" | "Enum16" =>
        // 'Name' = code, … — keep the map for CAST(enum AS Int) compat
        val pairs = splitTopLevel(args, ',').map { p =>
          val eq = lastTopLevelEq(p)
          require(eq > 0, s"malformed enum entry: $p")
          val name = unquote(p.substring(0, eq).trim)
          val code = p.substring(eq + 1).trim.toInt
          (name, code)
        }
        meta.putString("ch.type", head)
        meta.putStringArray("ch.enum.names", pairs.map(_._1).toArray)
        meta.putLongArray("ch.enum.codes", pairs.map(_._2.toLong).toArray)
        (StringType, false, meta)
      case "FixedString" => (StringType, false, meta)
      case "Decimal" =>
        val ps = splitTopLevel(args, ',').map(_.trim.toInt)
        (DecimalType(ps(0), if (ps.length > 1) ps(1) else 0), false, meta)
      case "Decimal32"  => (DecimalType(9, args.trim.toInt), false, meta)
      case "Decimal64"  => (DecimalType(18, args.trim.toInt), false, meta)
      case "Decimal128" => (DecimalType(38, args.trim.toInt), false, meta)
      case "DateTime64" => (TimestampType, false, meta)
      case "DateTime" | "DateTime32" => (TimestampType, false, meta)
      case "Date" | "Date32" => (DateType, false, meta)
      case "String"  => (StringType, false, meta)
      case "UUID"    => (StringType, false, meta)
      case "Bool" | "Boolean" => (BooleanType, false, meta)
      case "Int8"    => (ByteType, false, meta)
      case "Int16"   => (ShortType, false, meta)
      case "Int32"   => (IntegerType, false, meta)
      case "Int64"   => (LongType, false, meta)
      case "Int128" | "Int256" => (DecimalType(38, 0), false, meta)
      case "UInt8"   => (ShortType, false, meta)   // next-wider signed
      case "UInt16"  => (IntegerType, false, meta)
      case "UInt32"  => (LongType, false, meta)
      case "UInt64"  => // Long covers CH's observed use; lossy past 2^63-1
        meta.putString("ch.type", "UInt64"); (LongType, false, meta)
      case "UInt128" | "UInt256" => (DecimalType(38, 0), false, meta)
      case "Float32" => (FloatType, false, meta)
      case "Float64" => (DoubleType, false, meta)
      case other =>
        throw new IllegalArgumentException(s"unsupported ClickHouse type: $other")
    }
  }

  /** Split on `sep` at paren depth 0, respecting single-quoted strings
    * (enum values may contain commas/parens) and backquoted /
    * double-quoted identifiers (a quoted column NAME may contain
    * commas/parens — r15, closing the verdict's regex-fragility
    * finding at its root; the double-quote state added after review:
    * the INSERT regexes admit `"a,b"` but the split broke it). */
  private[graft] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var inTick = false
    var inDq = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else if (c == '\'') inQuote = false
      } else if (inTick) {
        cur.append(c)
        if (c == '`') inTick = false
      } else if (inDq) {
        cur.append(c)
        if (c == '"') inDq = false
      } else c match {
        case '\'' => inQuote = true; cur.append(c)
        case '`' => inTick = true; cur.append(c)
        case '"' => inDq = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  /** Index of the `=` separating an enum name from its code (outside
    * quotes). */
  private def lastTopLevelEq(s: String): Int = {
    var inQuote = false
    var i = 0
    var last = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '\\') i += 1 else if (c == '\'') inQuote = false
      } else if (c == '\'') inQuote = true
      else if (c == '=') last = i
      i += 1
    }
    last
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("\\'", "'")
    else t
  }
}
