package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the CH spellings `replaceOne`,
  * `replaceRegexpOne` and `JSONExtractArrayRaw` — shared by the
  * interpreted and generated paths (same shape as
  * [[StringDistances]]).
  *
  * `replaceRegexpOne` keeps the Java regex/`$1`-replacement syntax the
  * sibling `replaceRegexpAll` (→ Spark `RegExpReplace`) already uses —
  * one regex dialect across the registry, CH's re2/`\1` spelling is
  * the documented deviation. Compiled patterns are cached; the cache
  * is cleared past a bound rather than LRU-evicted (pattern sets in a
  * query plan are tiny and static).
  *
  * `JSONExtractArrayRaw` re-serializes elements with Jackson's compact
  * writer rather than slicing the original text — byte-identical for
  * compact JSON, whitespace-normalizing otherwise (documented
  * deviation; CH slices the source bytes). Reference usage:
  * BigHouse's github_events logs carry flat compact-JSON metadata.
  */
object StringKernels {

  private val patterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]

  private def pattern(p: String): java.util.regex.Pattern = {
    if (patterns.size > 1024) patterns.clear()
    patterns.computeIfAbsent(p, s => java.util.regex.Pattern.compile(s))
  }

  /** First-occurrence literal replace; an empty needle returns the
    * subject unchanged (CH's contract — Java's replaceFirst would
    * prepend). */
  def replaceOne(s: UTF8String, find: UTF8String, repl: UTF8String): UTF8String = {
    val str = s.toString
    val f = find.toString
    if (f.isEmpty) return s
    val i = str.indexOf(f)
    if (i < 0) s
    else UTF8String.fromString(
      str.substring(0, i) + repl.toString + str.substring(i + f.length))
  }

  /** First-match regex replace (Java syntax, `$1` group refs). */
  def replaceRegexpOne(s: UTF8String, p: UTF8String, repl: UTF8String): UTF8String = {
    val m = pattern(p.toString).matcher(s.toString)
    UTF8String.fromString(m.replaceFirst(repl.toString))
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private def rawElements(node: com.fasterxml.jackson.databind.JsonNode): ArrayData = {
    if (node == null || !node.isArray) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](node.size())
    var i = 0
    while (i < node.size()) {
      out(i) = UTF8String.fromString(mapper.writeValueAsString(node.get(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `JSONExtractArrayRaw(json)` — the document itself is the array. */
  def jsonArrayRaw(json: UTF8String): ArrayData =
    try rawElements(mapper.readTree(json.toString))
    catch { case _: Exception => new GenericArrayData(Array.empty[Any]) }

  /** `JSONExtractArrayRaw(json, key)` — top-level field holds the
    * array. Missing key, non-array value, or malformed JSON all give
    * `[]` (CH's lenient contract). */
  def jsonArrayRaw(json: UTF8String, key: UTF8String): ArrayData =
    try rawElements(mapper.readTree(json.toString).get(key.toString))
    catch { case _: Exception => new GenericArrayData(Array.empty[Any]) }
}

/** Ternary string kernel dispatcher: `replaceOne` / `replaceRegexpOne`
  * (null-in → null-out, codegen'd static calls). */
case class ReplaceFirstExpr(subject: Expression, find: Expression,
    repl: Expression, regex: Boolean) extends Expression {

  override def children: Seq[Expression] = Seq(subject, find, repl)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (regex) "replaceRegexpOne" else "replaceOne"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        children.map(_.dataType.sql).mkString(" / "))

  override def eval(input: InternalRow): Any = {
    val s = subject.eval(input)
    if (s == null) return null
    val f = find.eval(input)
    if (f == null) return null
    val r = repl.eval(input)
    if (r == null) return null
    if (regex)
      StringKernels.replaceRegexpOne(s.asInstanceOf[UTF8String],
        f.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    else
      StringKernels.replaceOne(s.asInstanceOf[UTF8String],
        f.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val SK = StringKernels.getClass.getName.stripSuffix("$")
    val fn = if (regex) "replaceRegexpOne" else "replaceOne"
    val gs = subject.genCode(ctx)
    val gf = find.genCode(ctx)
    val gr = repl.genCode(ctx)
    ev.copy(code = code"""
      |${gs.code}
      |boolean ${ev.isNull} = true;
      |UTF8String ${ev.value} = null;
      |if (!${gs.isNull}) {
      |  ${gf.code}
      |  if (!${gf.isNull}) {
      |    ${gr.code}
      |    if (!${gr.isNull}) {
      |      ${ev.isNull} = false;
      |      ${ev.value} = $SK.$fn(${gs.value}, ${gf.value}, ${gr.value});
      |    }
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(subject = newChildren(0), find = newChildren(1), repl = newChildren(2))
}

/** `JSONExtractArrayRaw(json[, key])` → `array<string>` of the raw
  * (compact re-serialized) JSON of each element. */
case class JsonArrayRawExpr(json: Expression, key: Option[Expression])
    extends Expression {

  override def children: Seq[Expression] = json +: key.toSeq
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "JSONExtractArrayRaw"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        children.map(_.dataType.sql).mkString(" / "))

  override def eval(input: InternalRow): Any = {
    val j = json.eval(input)
    if (j == null) return null
    key match {
      case None => StringKernels.jsonArrayRaw(j.asInstanceOf[UTF8String])
      case Some(k) =>
        val kv = k.eval(input)
        if (kv == null) return null
        StringKernels.jsonArrayRaw(j.asInstanceOf[UTF8String],
          kv.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val SK = StringKernels.getClass.getName.stripSuffix("$")
    val gj = json.genCode(ctx)
    val AD = classOf[ArrayData].getName
    key match {
      case None =>
        ev.copy(code = code"""
          |${gj.code}
          |boolean ${ev.isNull} = ${gj.isNull};
          |$AD ${ev.value} = null;
          |if (!${ev.isNull}) ${ev.value} = $SK.jsonArrayRaw(${gj.value});
        """.stripMargin)
      case Some(k) =>
        val gk = k.genCode(ctx)
        ev.copy(code = code"""
          |${gj.code}
          |boolean ${ev.isNull} = true;
          |$AD ${ev.value} = null;
          |if (!${gj.isNull}) {
          |  ${gk.code}
          |  if (!${gk.isNull}) {
          |    ${ev.isNull} = false;
          |    ${ev.value} = $SK.jsonArrayRaw(${gj.value}, ${gk.value});
          |  }
          |}
        """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(json = newChildren(0),
      key = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

/** `extractAllGroupsVertical(text, re)` (CH's `extractAllGroups`) and
  * `extractAllGroupsHorizontal(text, re)`: every match's capture
  * groups as `Array(Array(String))` — vertical groups them per MATCH
  * (`[[m1g1, m1g2], [m2g1, m2g2], …]`), horizontal per GROUP
  * (`[[m1g1, m2g1, …], [m1g2, m2g2, …]]`). The pattern must contain
  * at least one capture group (CH errors likewise); non-participating
  * optional groups surface as empty strings, CH's convention. The
  * compiled pattern is cached when the regex is a literal — the
  * common shape; dynamic patterns compile per row. */
case class ExtractAllGroupsExpr(subject: Expression, pattern: Expression,
    horizontal: Boolean)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(subject, pattern)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)
  override def prettyName: String =
    if (horizontal) "extractAllGroupsHorizontal" else "extractAllGroupsVertical"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        children.map(_.dataType.sql).mkString(" / "))

  @transient private lazy val literalPattern: java.util.regex.Pattern =
    pattern match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType)
          if v != null =>
        java.util.regex.Pattern.compile(v.toString)
      case _ => null
    }

  override def eval(input: InternalRow): Any = {
    val s = subject.eval(input)
    if (s == null) return null
    val p = pattern.eval(input)
    if (p == null) return null
    val compiled =
      if (literalPattern != null) literalPattern
      else java.util.regex.Pattern.compile(p.asInstanceOf[UTF8String].toString)
    val ng = compiled.matcher("").groupCount()
    require(ng >= 1,
      s"$prettyName needs at least one capture group in the pattern")
    val m = compiled.matcher(s.asInstanceOf[UTF8String].toString)
    val matches = scala.collection.mutable.ArrayBuffer.empty[Array[UTF8String]]
    while (m.find()) {
      val row = new Array[UTF8String](ng)
      var g = 0
      while (g < ng) {
        val v = m.group(g + 1)
        row(g) = UTF8String.fromString(if (v == null) "" else v)
        g += 1
      }
      matches += row
    }
    if (horizontal) {
      val cols = Array.tabulate(ng)(g =>
        new GenericArrayData(matches.map(_(g)).toArray[Any]))
      new GenericArrayData(cols.toArray[Any])
    } else {
      new GenericArrayData(
        matches.map(r => new GenericArrayData(r.toArray[Any])).toArray[Any])
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(subject = newChildren(0), pattern = newChildren(1))
}
