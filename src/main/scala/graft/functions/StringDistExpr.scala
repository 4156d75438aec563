package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Classic string-distance kernels behind the CH spellings
  * `damerauLevenshteinDistance`, `jaroSimilarity`,
  * `jaroWinklerSimilarity`, `stringJaccardIndex` (ClickHouse's
  * string-similarity tail; `editDistance` maps to Spark's builtin
  * Levenshtein instead). All are the textbook algorithms — full
  * Damerau-Levenshtein (with the alphabet table, so `CA`→`ABC` is 2,
  * not OSA's 3), Jaro with half-transpositions, Winkler boost 0.1 over
  * the standard 0.7 threshold with a ≤4-char prefix, and Jaccard over
  * the byte sets of the UTF-8 encodings (CH's byte-string contract).
  * Shared by the interpreted and generated paths. */
object StringDistances {

  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val m = a.length
    val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    val maxDist = m + n
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = maxDist
    var i = 0
    while (i <= m) { d(i + 1)(0) = maxDist; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = maxDist; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(k)(l) + (i - 1 - k) + 1 + (j - 1 - l)))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(m + 1)(n + 1)
  }

  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var bi = 0
    i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(bi)) bi += 1
        if (a.charAt(i) != b.charAt(bi)) t += 1
        bi += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - t / 2.0) / m) / 3.0
  }

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.toString
    val b = ub.toString
    var l = 0
    while (l < math.min(4, math.min(a.length, b.length)) &&
      a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Jaccard over byte sets. Two empty strings → 1.0 (identical),
    * one empty → 0.0. */
  def byteJaccard(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = new Array[Boolean](256)
    val sb = new Array[Boolean](256)
    a.foreach(x => sa(x & 0xFF) = true)
    b.foreach(x => sb(x & 0xFF) = true)
    var inter = 0
    var union = 0
    var i = 0
    while (i < 256) {
      if (sa(i) && sb(i)) inter += 1
      if (sa(i) || sb(i)) union += 1
      i += 1
    }
    inter.toDouble / union
  }

  def evalKind(kind: String, a: UTF8String, b: UTF8String): Any = kind match {
    case "damerau" => damerauLevenshtein(a, b)
    case "jaro" => jaro(a, b)
    case "jaroWinkler" => jaroWinkler(a, b)
    case "jaccard" => byteJaccard(a, b)
  }
}

/** Two-string distance/similarity as a codegen'd expression; `kind`
  * picks the kernel (see [[StringDistances]]). Null-intolerant. */
case class StringDistExpr(left: Expression, right: Expression, kind: String)
    extends Expression {

  require(StringDistExpr.Kinds.contains(kind), s"unknown kind $kind")

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (kind == "damerau") IntegerType else DoubleType
  override def prettyName: String = StringDistExpr.Names(kind)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    StringDistances.evalKind(kind,
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val SD = StringDistances.getClass.getName.stripSuffix("$")
    val ga = left.genCode(ctx)
    val gb = right.genCode(ctx)
    val javaT = if (kind == "damerau") "int" else "double"
    val call = kind match {
      case "damerau" => s"$SD.damerauLevenshtein(${ga.value}, ${gb.value})"
      case "jaro" => s"$SD.jaro(${ga.value}, ${gb.value})"
      case "jaroWinkler" => s"$SD.jaroWinkler(${ga.value}, ${gb.value})"
      case "jaccard" => s"$SD.byteJaccard(${ga.value}, ${gb.value})"
    }
    ev.copy(code = code"""
      |${ga.code}
      |boolean ${ev.isNull} = true;
      |$javaT ${ev.value} = ${if (javaT == "int") "0" else "0.0"};
      |if (!${ga.isNull}) {
      |  ${gb.code}
      |  if (!${gb.isNull}) {
      |    ${ev.isNull} = false;
      |    ${ev.value} = $call;
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object StringDistExpr {
  val Kinds: Set[String] = Set("damerau", "jaro", "jaroWinkler", "jaccard")
  val Names: Map[String, String] = Map(
    "damerau" -> "damerauLevenshteinDistance",
    "jaro" -> "jaroSimilarity",
    "jaroWinkler" -> "jaroWinklerSimilarity",
    "jaccard" -> "stringJaccardIndex")
}
