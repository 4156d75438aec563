package graft.dialect

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** ClickHouse aggregate-combinator grammar (SURVEY §2.3 A7 tail): any
  * base aggregate composed with a suffix chain — `sumArrayIf`,
  * `avgArrayIf`, `sumDistinctIf`, `uniqExactArrayIf`, `countOrNull` —
  * resolves WITHOUT an individual registration. The statically
  * registered spellings (`sumIf`, `uniqState`, …) stay as they are;
  * this grammar only serves names the registry does not already hold
  * (reference delegates the whole combinator surface to ClickHouse,
  * `temporal/workflow_query_executor.go:313`).
  *
  * Semantics per combinator, composed left-to-right as written
  * (`sumArrayIf` = (`sum` over array elements) restricted by the
  * trailing condition):
  *   - `-If`: appends a condition argument; value arguments are
  *     wrapped `If(cond, x, NULL)` — Spark aggregates skip NULLs, so
  *     rows failing the condition contribute nothing. Composes with
  *     every kernel here because each is NULL-propagating per row.
  *   - `-Array`: the aggregate consumes every ELEMENT of an array
  *     column. Expressed per base as a scan-stage local reduction
  *     (fold / size / array_min / array_max) feeding the scalar
  *     aggregate — no explode, stays inside whole-stage codegen.
  *     Allowed only directly after the base (CH's canonical order).
  *   - `-Distinct`: sets the DISTINCT flag on the underlying aggregate
  *     function. Allowed where the kernel is a single
  *     [[AggregateFunction]] (not a composed expression).
  *   - `-OrNull`: CH returns NULL for an empty aggregation set. Spark's
  *     sum/min/max/avg already do; the counting bases (`count`, `uniq`,
  *     `uniqExact`) return 0 and are wrapped `nullIf(x, 0)`.
  *   - `-State` / `-Merge`: partial-state and merge forms. Spark's
  *     aggregation buffers are not CH-serializable, so State finalizes
  *     (state ≡ value) and Merge re-aggregates — the same contract the
  *     static `sumState`/`sumMerge`/`uniqState`/`uniqMerge`
  *     registrations document.
  *
  * Registration happens lazily from [[ChSql.registerCombinators]]: the
  * dialect pre-pass scans query text for `name(`-shaped calls, and any
  * name that (a) is absent from the session registry, (b) is not a
  * Spark builtin (never shadow — the r4/r7 bug class), and (c) parses
  * under this grammar, is registered as a native expression builder.
  */
object Combinators {

  /** `arity` = argument count the USER passes; `build` receives exactly
    * those arguments (plus any kernel-injected ones upstream). */
  private case class Kernel(arity: Int, build: Seq[Expression] => Expression)

  /** Longest-match order: `uniqExact` before `uniq`. */
  private val BaseNames =
    Seq("uniqExact", "groupArray", "uniq", "sum", "count", "min", "max", "avg")

  private val SuffixTokens =
    // longest-first where one token prefixes another (SimpleState vs
    // State, OrDefault vs OrNull share no prefix but keep the idea)
    Seq("Array", "Distinct", "OrDefault", "OrNull", "SimpleState", "State",
      "Merge", "ForEach", "Map", "If", "Resample")

  /** The composed builder for `name`, when `name` is base+suffix-chain
    * under this grammar and the combination is exactly expressible. */
  def builderFor(name: String): Option[Seq[Expression] => Expression] =
    tokenize(name).filter(_._2.nonEmpty).flatMap { case (base, suffixes) =>
      kernel(base, suffixes).map { k =>
        // `count` aggregates a synthetic row marker: inject it so the
        // user arity stays CH's (`countIf(cond)`, `countOrNull()`) —
        // except the array-consuming forms, whose argument IS the array
        if (base == "count" &&
            !Seq("Array", "ForEach", "Map").exists(suffixes.headOption.contains))
          (args: Seq[Expression]) => k.build(Literal(1) +: args)
        else k.build
      }
    }

  /** Case-insensitive split into (base, suffix tokens); None when any
    * residue fails to tokenize (so `summary`, `countSubstrings`, …
    * never match). */
  private def tokenize(name: String): Option[(String, List[String])] =
    BaseNames
      .find(b => name.regionMatches(true, 0, b, 0, b.length))
      .flatMap { base =>
        peel(name.substring(base.length), Nil).map(s => (base, s))
      }

  @annotation.tailrec
  private def peel(rest: String, acc: List[String]): Option[List[String]] =
    if (rest.isEmpty) Some(acc.reverse)
    else SuffixTokens.find(s =>
      rest.length >= s.length && rest.regionMatches(true, 0, s, 0, s.length)) match {
      case Some(s) => peel(rest.substring(s.length), s :: acc)
      case None => None
    }

  private def kernel(base: String, suffixes: List[String]): Option[Kernel] = {
    val (k0, rest) = suffixes match {
      case "Array" :: tail => (arrayKernel(base), tail)
      case "Merge" :: tail => (mergeKernel(base), tail)
      case "ForEach" :: tail => (forEachKernel(base), tail)
      case "Map" :: tail => (mapKernel(base), tail)
      case _ => (plainKernel(base), suffixes)
    }
    // -Distinct after an argument-lifting combinator would dedupe the
    // PER-ROW REDUCED value (e.g. sumArrayDistinct deduping row sums),
    // not the argument as CH does — refuse the name (unresolved-
    // function error) rather than serve a silently different number
    val liftingHead = suffixes.headOption.exists(
      s => s == "Array" || s == "ForEach" || s == "Map")
    if (liftingHead && rest.contains("Distinct")) None
    else rest.foldLeft(k0)((acc, s) => acc.flatMap(applySuffix(base, _, s)))
  }

  private def plainKernel(base: String): Option[Kernel] = base match {
    case "sum" => Some(Kernel(1, a => Sum(a.head)))
    case "count" => Some(Kernel(1, a => Count(a)))
    case "min" => Some(Kernel(1, a => Min(a.head)))
    case "max" => Some(Kernel(1, a => Max(a.head)))
    case "avg" => Some(Kernel(1, a => Average(a.head)))
    case "uniq" => Some(Kernel(1, a => new HyperLogLogPlusPlus(a.head)))
    // the uniqCombined class (r19): precision 17, same sketch algebra
    case "uniqCombined" | "uniqCombined64" => Some(Kernel(1, a =>
      new HyperLogLogPlusPlus(
        a.head, graft.plans.HllRegisters.rsdForPrecision(17))))
    case "uniqExact" =>
      Some(Kernel(1, a => Count(a).toAggregateExpression(isDistinct = true)))
    case "groupArray" => Some(Kernel(1, a => CollectList(a.head)))
    case _ => None
  }

  /** Per-base element-wise kernels: a per-row local reduction feeding
    * the scalar aggregate. Every kernel is NULL-propagating (a NULL
    * array contributes nothing), which is what makes a later `-If`
    * wrap compose exactly. */
  private def arrayKernel(base: String): Option[Kernel] = {
    def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
    // zero derived from the data (first element × 0L) so fractional
    // element types fold without an analysis error, and integer
    // elements widen to Int64 — CH's sum-type promotion (advisor r7).
    // Coalesce keeps the zero non-NULL for EMPTY arrays so the fold
    // returns 0 like ClickHouse (advisor r8); NULL arrays still yield
    // NULL via ArrayAggregate's null-intolerance on the array itself.
    def typedZero(arr: Expression): Expression =
      Coalesce(Seq(
        Multiply(new ElementAt(arr, Literal(1), None, false), Literal(0L)),
        Literal(0L)))
    def localSum(arr: Expression, zero: Expression): Expression = {
      val acc = lv("accCB"); val x = lv("xCB"); val f = lv("fCB")
      ArrayAggregate(arr, zero,
        LambdaFunction(Add(acc, x), Seq(acc, x)),
        LambdaFunction(f, Seq(f)))
    }
    base match {
      case "sum" => Some(Kernel(1, a => Sum(localSum(a.head, typedZero(a.head)))))
      case "count" => Some(Kernel(1, a => Sum(Cast(Size(a.head), LongType))))
      case "min" => Some(Kernel(1, a => Min(ArrayMin(a.head))))
      case "max" => Some(Kernel(1, a => Max(ArrayMax(a.head))))
      case "avg" => Some(Kernel(1, a => Divide(
        Sum(localSum(a.head, Literal(0.0d))).toAggregateExpression(),
        Cast(Sum(Cast(Size(a.head), LongType)).toAggregateExpression(),
          DoubleType))))
      // distinct elements across rows — EXACT for both spellings (the
      // sound refinement the static uniqArray documents)
      case "uniq" | "uniqExact" => Some(Kernel(1, a =>
        Cast(Size(ArrayDistinct(Flatten(
          CollectList(a.head).toAggregateExpression()))), LongType)))
      case "groupArray" => Some(Kernel(1, a =>
        Flatten(CollectList(a.head).toAggregateExpression())))
      case _ => None
    }
  }

  /** `-ForEach`: the aggregate applies PER ARRAY POSITION across rows —
    * `sumForEach([1,2],[10,20,30])` = `[11,22,30]`. Expressed as a
    * collect + zip-fold: ragged rows pad with NULL and contribute
    * nothing to the positions they lack (CH's contract). The zero array
    * borrows its element type from the first collected row (a
    * zero-length slice), so fractional and integral element types both
    * fold; an EMPTY aggregation set yields `[]` — CH's contract — via
    * the Coalesce over a typed empty array derived from the collected
    * list itself (advisor r8). */
  private def forEachKernel(base: String): Option[Kernel] = {
    def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
    def fold(
        arr: Expression,
        zero: Expression => Expression,
        merge: (Expression, Expression) => Expression,
        emptyOf: Expression => Expression =
          c => Flatten(Slice(c, Literal(1), Literal(0)))): Expression = {
      val c = CollectList(arr).toAggregateExpression()
      val acc = lv("accFE"); val x = lv("xFE"); val f = lv("fFE")
      val u = lv("uFE"); val v = lv("vFE")
      val folded = ArrayAggregate(c, zero(c),
        LambdaFunction(
          ZipWith(acc, x, LambdaFunction(merge(u, v), Seq(u, v))), Seq(acc, x)),
        LambdaFunction(f, Seq(f)))
      // empty group → collected list is [] → the fold's zero (derived
      // from a missing first row) is NULL; CH returns []. The default
      // fallback — Slice+Flatten of the collected list — is a
      // correctly-element-typed empty array whose type Coalesce widens
      // to the fold's result type (count overrides it: its result is
      // Array<Long> independent of the input element type, so deriving
      // from the input would mis-coerce e.g. string arrays). Both
      // references to `c` are the same AggregateExpression, so planning
      // dedups them into one collect buffer.
      Coalesce(Seq(folded, emptyOf(c)))
    }
    // empty array typed like the collected rows' elements
    def emptyLike(c: Expression): Expression =
      Slice(new ElementAt(c, Literal(1), None, false), Literal(1), Literal(0))
    // sum's zero: same zero-length slice but with elements WIDENED by
    // ×0L, because ArrayAggregate demands zero.type == merge-result
    // type and the sum merge accumulates in Int64 — CH's promotion
    // contract; the previous ×0 spelling kept Int32 arrays wrapping
    // past 2³¹ (verdict r8 #2)
    def emptyWidened(c: Expression): Expression = {
      val w = lv("wFE")
      Slice(ArrayTransform(new ElementAt(c, Literal(1), None, false),
        LambdaFunction(Multiply(w, Literal(0L)), Seq(w))),
        Literal(1), Literal(0))
    }
    def zeroOf(e: Expression): Expression = Multiply(e, Literal(0L))
    base match {
      case "sum" => Some(Kernel(1, a => fold(a.head, emptyWidened,
        (u, v) => Add(Coalesce(Seq(u, zeroOf(v))), Coalesce(Seq(v, zeroOf(u)))))))
      case "min" => Some(Kernel(1, a => fold(a.head, emptyLike,
        (u, v) => Least(Seq(u, v)))))
      case "max" => Some(Kernel(1, a => fold(a.head, emptyLike,
        (u, v) => Greatest(Seq(u, v)))))
      case "count" => Some(Kernel(1, a => fold(a.head,
        c => {
          val e = lv("eFE")
          Slice(ArrayTransform(
            new ElementAt(c, Literal(1), None, false),
            LambdaFunction(Literal(0L), Seq(e))), Literal(1), Literal(0))
        },
        (u, v) => Add(Coalesce(Seq(u, Literal(0L))),
          If(IsNotNull(v), Literal(1L), Literal(0L))),
        emptyOf = _ => Literal.create(Array.empty[Long], ArrayType(LongType)))))
      case _ => None
    }
  }

  /** `-Map`: keyed reduce over zipped (keys, values) array pairs —
    * `avgMap(k, v)`, `countMap(k, v)`, `uniqExactMap(k, v)`, and the
    * chains (`sumMapIf`, …). Same collect-then-reduce surface shape
    * (and moderate key-cardinality caveat) as the statically
    * registered `sumMap`/`minMap`/`maxMap`, which keep winning for
    * their exact names; returns CH's (keys, values) tuple with keys
    * sorted. */
  private def mapKernel(base: String): Option[Kernel] = {
    def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
    def fld(s: Expression, nme: String) =
      org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(s, Literal(nme))
    def mapAgg(keys: Expression, vals: Expression,
               red: Expression => Expression): Expression = {
      val k0 = lv("k0CB"); val v0 = lv("v0CB"); val p = lv("pCB")
      val kk = lv("kkCB"); val q = lv("qCB"); val r = lv("rCB")
      val pairs = Flatten(CollectList(
        ZipWith(keys, vals, LambdaFunction(
          CreateNamedStruct(Seq(Literal("k"), k0, Literal("v"), v0)),
          Seq(k0, v0)))).toAggregateExpression())
      val ks = new ArraySort(ArrayDistinct(
        ArrayTransform(pairs, LambdaFunction(fld(p, "k"), Seq(p)))))
      val vs = ArrayTransform(ks, LambdaFunction(
        red(ArrayTransform(
          ArrayFilter(pairs, LambdaFunction(EqualTo(fld(q, "k"), kk), Seq(q))),
          LambdaFunction(fld(r, "v"), Seq(r)))),
        Seq(kk)))
      CreateNamedStruct(Seq(Literal("keys"), ks, Literal("values"), vs))
    }
    // same typed zero as arrayKernel: ×0L widens integers to Int64,
    // Coalesce keeps empty-array folds at 0 instead of NULL
    def typedZero(arr: Expression): Expression =
      Coalesce(Seq(
        Multiply(new ElementAt(arr, Literal(1), None, false), Literal(0L)),
        Literal(0L)))
    def localSum(arr: Expression, zero: Expression): Expression = {
      val acc = lv("accCM"); val x = lv("xCM"); val f = lv("fCM")
      ArrayAggregate(arr, zero,
        LambdaFunction(Add(acc, x), Seq(acc, x)),
        LambdaFunction(f, Seq(f)))
    }
    val reducer: Option[Expression => Expression] = base match {
      case "sum" => Some(arr => localSum(arr, typedZero(arr)))
      case "min" => Some(ArrayMin)
      case "max" => Some(ArrayMax)
      case "avg" => Some(arr => Divide(
        localSum(arr, Literal(0.0d)), Cast(Size(arr), DoubleType)))
      case "count" => Some(arr => Cast(Size(arr), LongType))
      case "uniq" | "uniqExact" =>
        Some(arr => Cast(Size(ArrayDistinct(arr)), LongType))
      case "groupArray" => Some(identity)
      case _ => None
    }
    reducer.map(red => Kernel(2, a => mapAgg(a(0), a(1), red)))
  }

  /** Merge of finalized values (state ≡ value here): counts merge by
    * summing, min/max/sum by themselves. Bases whose merge needs a
    * real sketch or pair-struct keep their static registrations
    * (`uniqMerge`, `avgMerge`). */
  private def mergeKernel(base: String): Option[Kernel] = base match {
    case "sum" | "count" => Some(Kernel(1, a => Sum(a.head)))
    case "min" => Some(Kernel(1, a => Min(a.head)))
    case "max" => Some(Kernel(1, a => Max(a.head)))
    case _ => None
  }

  private def applySuffix(base: String, k: Kernel, s: String): Option[Kernel] =
    s match {
      case "If" => Some(Kernel(k.arity + 1, args => {
        val cond = args.last
        k.build(args.init.map(a => If(cond, a, Literal(null, NullType))))
      }))
      case "State" => Some(k)
      case "Distinct" => Some(Kernel(k.arity, args => k.build(args) match {
        case af: AggregateFunction =>
          af.toAggregateExpression(isDistinct = true)
        case _ => throw new IllegalArgumentException(
          s"-Distinct cannot compose with ${base}'s ${k.build.getClass.getSimpleName} kernel here")
      }))
      // CH -SimpleState stores the plain value as the state — which is
      // exactly what this engine's parquet-backed states are (r19b)
      case "SimpleState" => Some(k)
      // -OrDefault: the type's default on an empty set — 0 for the
      // numeric bases (the CH-documented use); NULL-yielding bases
      // coalesce, counting bases are 0 already
      case "OrDefault" => Some(Kernel(k.arity, args => {
        val agg = k.build(args) match {
          case af: AggregateFunction => af.toAggregateExpression()
          case other => other
        }
        Coalesce(Seq(agg, Literal(0)))
      }))
      // -Resample(start, end, step)(args…, key): the aggregate split
      // into fixed key buckets, one array element per bucket — the
      // parametric pre-pass delivers (args…, key, start, end, step).
      // Bounds must be integer literals (the bucket count shapes the
      // PLAN: one masked aggregate per bucket, all in a single pass —
      // capped so a typo cannot explode the plan).
      case "Resample" => Some(Kernel(k.arity + 4, args => {
        def lit(e: Expression, nme: String): Long = e match {
          case Literal(v: java.lang.Number, _) => v.longValue()
          case other => throw new IllegalArgumentException(
            s"${base}Resample needs a literal $nme, got $other")
        }
        val Seq(key, startE, endE, stepE) = args.takeRight(4)
        val baseArgs = args.dropRight(4)
        val start = lit(startE, "start")
        val end = lit(endE, "end")
        val step = lit(stepE, "step")
        require(step > 0, s"${base}Resample needs step > 0, got $step")
        val n = math.ceil((end - start).toDouble / step).toLong
        require(n >= 1 && n <= 1000,
          s"${base}Resample would build $n buckets (supported: 1..1000)")
        CreateArray(Seq.tabulate(n.toInt) { i =>
          val lo = Literal(start + i * step)
          val hi = Literal(math.min(start + (i + 1L) * step, end))
          val cond = And(
            GreaterThanOrEqual(Cast(key, LongType), lo),
            LessThan(Cast(key, LongType), hi))
          k.build(baseArgs.map(a => If(cond, a, Literal(null, NullType)))) match {
            case af: AggregateFunction => af.toAggregateExpression()
            case other => other
          }
        })
      }))
      case "OrNull" => Some(Kernel(k.arity, args => {
        val agg = k.build(args) match {
          case af: AggregateFunction => af.toAggregateExpression()
          case other => other
        }
        base match {
          // empty-set result is 0 for the counting bases; CH -OrNull
          // contracts it to NULL (sum/min/max/avg are NULL already)
          case "count" | "uniq" | "uniqExact" =>
            If(EqualTo(agg, Literal(0L)), Literal(null, NullType), agg)
          case _ => agg
        }
      }))
      case _ => None // "Array"/"Merge" only directly after the base
    }
}
