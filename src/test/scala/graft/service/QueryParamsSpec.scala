package graft.service

import org.scalatest.funsuite.AnyFunSuite

/** `{name:Type}` parameter binding — the one interface that must be
  * injection-safe (advisor r14): CH parses the bound value as the
  * declared type and rejects garbage; non-string values must never
  * splice as raw SQL text. */
class QueryParamsSpec extends AnyFunSuite {

  private def sub(q: String, params: (String, String)*): String =
    QueryParams.substitute(q, params.toMap)

  test("string family renders as an escaped literal") {
    assert(sub("SELECT {s:String}", "s" -> "a'b\\c") ==
      "SELECT 'a\\'b\\\\c'")
    assert(sub("SELECT {d:DateTime}", "d" -> "2024-01-01 00:00:00") ==
      "SELECT '2024-01-01 00:00:00'")
  }

  test("numeric families validate before splicing — injection refused") {
    assert(sub("SELECT {n:UInt64}", "n" -> "42") == "SELECT 42")
    assert(sub("SELECT {f:Float64}", "f" -> "-1.5e3") == "SELECT -1.5e3")
    for (evil <- Seq("1; DROP TABLE t", "0 OR 1=1", "1) UNION SELECT 1 --",
        "cityHash64(1)", "(SELECT 1)")) {
      val e = intercept[IllegalArgumentException] {
        sub("SELECT {n:UInt64}", "n" -> evil)
      }
      assert(e.getMessage.contains("not an integer literal"), e.getMessage)
    }
    intercept[IllegalArgumentException] {
      sub("SELECT {f:Float32}", "f" -> "1.5; SELECT 1")
    }
  }

  test("Bool validates; Nullable unwraps and accepts NULL") {
    assert(sub("SELECT {b:Bool}", "b" -> "true") == "SELECT true")
    assert(sub("SELECT {b:Bool}", "b" -> "0") == "SELECT false")
    intercept[IllegalArgumentException] { sub("SELECT {b:Bool}", "b" -> "maybe") }
    assert(sub("SELECT {x:Nullable(Int64)}", "x" -> "NULL") == "SELECT NULL")
    assert(sub("SELECT {x:Nullable(Int64)}", "x" -> "7") == "SELECT 7")
    assert(sub("SELECT {x:Nullable(String)}", "x" -> "hi") == "SELECT 'hi'")
    assert(sub("SELECT {x:LowCardinality(String)}", "x" -> "hi") == "SELECT 'hi'")
  }

  test("Array/Tuple restrict to the literal grammar — bare SQL refused") {
    assert(sub("SELECT {a:Array(UInt8)}", "a" -> "[1, 2, 3]") ==
      "SELECT [1, 2, 3]")
    assert(sub("SELECT {a:Array(String)}", "a" -> "['x', 'y\\'z']") ==
      "SELECT ['x', 'y\\'z']")
    assert(sub("SELECT {t:Tuple(UInt8, String)}", "t" -> "(1, 'a')") ==
      "SELECT (1, 'a')")
    assert(sub("SELECT {m:Map(String, UInt8)}", "m" -> "{'k': 1}") ==
      "SELECT {'k': 1}")
    for (evil <- Seq("[1] UNION SELECT password FROM users",
        "[toInt32(1)]", "['a' || 'b']", "[1'", "[`x`]")) {
      intercept[IllegalArgumentException] {
        sub("SELECT {a:Array(UInt8)}", "a" -> evil)
      }
    }
  }

  test("composite values refuse comments and unbalanced brackets (review r14)") {
    // `--` must not pass as a numeric token — it comments out the rest
    // of the statement after splicing
    for (evil <- Seq("[1]--", "[1] --", "(1)--comment", "[1]]", "(1))",
        "[", "--", "1-1")) {
      intercept[IllegalArgumentException] {
        sub("SELECT {a:Array(UInt64)}", "a" -> evil)
      }
    }
    // balanced, strictly-literal composites still pass
    assert(sub("SELECT {a:Array(Float64)}", "a" -> "[1.5, -2e3, NULL]") ==
      "SELECT [1.5, -2e3, NULL]")
  }

  test("Nullable NULL spellings: \\N always; bare 'null' only for non-string inners") {
    assert(sub("SELECT {x:Nullable(Int64)}", "x" -> "\\N") == "SELECT NULL")
    assert(sub("SELECT {s:Nullable(String)}", "s" -> "\\N") == "SELECT NULL")
    // the 4-char STRING "null" is a legitimate value — it must bind as
    // a literal, not silently coerce to SQL NULL (review r14)
    assert(sub("SELECT {s:Nullable(String)}", "s" -> "null") ==
      "SELECT 'null'")
    assert(sub("SELECT {x:Nullable(Int64)}", "x" -> "NULL") == "SELECT NULL")
  }

  test("unbound placeholders refuse; parameter-less queries untouched") {
    val e = intercept[IllegalArgumentException] {
      sub("SELECT {missing:UInt8}", "other" -> "1")
    }
    assert(e.getMessage.contains("no bound value"))
    assert(QueryParams.substitute("SELECT '{not:a_param}'", Map.empty) ==
      "SELECT '{not:a_param}'")
  }
}
