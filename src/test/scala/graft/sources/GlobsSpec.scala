package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Glob expansion cases lifted from the reference's exercised patterns:
  * `data-*.csv.gz` (…_test.go:42), `house_{0,1}.parquet` (…_test.go:49),
  * `data-{2009..2016}{01..12}.csv.gz` (…_test.go:63). */
class GlobsSpec extends AnyFunSuite {

  test("no-op on plain patterns and bare stars") {
    assert(Globs.expandRanges("data-*.csv.gz") == Seq("data-*.csv.gz"))
    assert(Globs.expand("a/b/c.parquet") == Seq("a/b/c.parquet"))
  }

  test("numeric range expands inclusively") {
    assert(Globs.expandRanges("part-{0..3}.parquet") ==
      Seq("part-0.parquet", "part-1.parquet", "part-2.parquet", "part-3.parquet"))
  }

  test("zero-padded range keeps width (CH semantics)") {
    assert(Globs.expandRanges("m{01..12}") ==
      (1 to 12).map(i => f"m$i%02d"))
  }

  test("cartesian expansion of the reference's taxi pattern") {
    val out = Globs.expandRanges("data-{2009..2016}{01..12}.csv.gz")
    assert(out.size == 8 * 12)
    assert(out.head == "data-200901.csv.gz")
    assert(out.last == "data-201612.csv.gz")
  }

  test("alternation expands (url path)") {
    assert(Globs.expandAlternation("house_{0,1}.parquet") ==
      Seq("house_0.parquet", "house_1.parquet"))
  }

  test("nested alternation splits at matching brace") {
    assert(Globs.expandAlternation("{a,{b,c}}x").toSet ==
      Set("ax", "bx", "cx"))
  }

  test("alternation after a non-alternation group") {
    assert(Globs.expandAlternation("p{x}q{a,b}").toSet ==
      Set("p{x}qa", "p{x}qb"))
  }

  test("range + alternation compose") {
    val out = Globs.expandRanges("f{1..2}-{a,b}.csv").flatMap(Globs.expandAlternation)
    assert(out.toSet == Set("f1-a.csv", "f1-b.csv", "f2-a.csv", "f2-b.csv"))
  }

  test("descending range refuses loudly instead of expanding to nothing") {
    val e = intercept[IllegalArgumentException] {
      Globs.expandRanges("part-{5..1}.parquet")
    }
    assert(e.getMessage.contains("descending"))
  }
}
