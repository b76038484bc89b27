package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class ExprParserSpec extends org.scalatest.funsuite.AnyFunSuite {
  import GExpr._

  test("assignment `dest ~ expr`") {
    val a = ExprParser.parseAssignment("newColumn ~ testForIteration + 2")
    assert(a.dest == "newColumn")
    assert(a.expr == BinOp("+", ColRef("testForIteration"), IntLit(2)))
  }

  test("arithmetic chains left-to-right: a + b * c == (a + b) * c") {
    // reference: expression_parser.rs:104-116 (last op at depth 0 is root)
    assert(ExprParser.parse("a + b * c") ==
      BinOp("*", BinOp("+", ColRef("a"), ColRef("b")), ColRef("c")))
  }

  test("first comparison at depth 0 splits") {
    // reference: expression_parser.rs:90-103
    assert(ExprParser.parse("(a < 11) && (b > 14)") ==
      BinOp("&&", BinOp("<", ColRef("a"), IntLit(11)), BinOp(">", ColRef("b"), IntLit(14))))
  }

  test("literals: int, decimal, string, bool") {
    assert(ExprParser.parse("5") == IntLit(5))
    assert(ExprParser.parse("1.5") == DecLit(BigDecimal("1.5")))
    assert(ExprParser.parse("\"hi\"") == StrLit("hi"))
    assert(ExprParser.parse("true") == BoolLit(true))
  }

  test("assignment with trailing destination `expr ~ dest` (reference form)") {
    // reference: expression_parser.rs:29-38 (tilde at second-to-last)
    val a = ExprParser.parseAssignment("testForIteration + 2 ~ newColumn")
    assert(a.dest == "newColumn")
    assert(a.expr == BinOp("+", ColRef("testForIteration"), IntLit(2)))
  }

  test("assignment with tilde mid-statement errors (reference behavior)") {
    val e = intercept[ExprParseException](ExprParser.parseAssignment("a + 1 ~ b + 2"))
    assert(e.getMessage.contains("middle"))
  }

  test("memo.<name> parses as MemoRef") {
    assert(ExprParser.parse("memo.count + 1") ==
      BinOp("+", MemoRef("count"), IntLit(1)))
  }

  test("parenthesized subexpressions") {
    assert(ExprParser.parse("(a + 1)") == BinOp("+", ColRef("a"), IntLit(1)))
  }

  test("unterminated string errors") {
    assertThrows[ExprParseException](ExprParser.parse("\"oops"))
  }
}

class ExprCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(expr: String, schemaAndRow: (StructType, Row)): Any = {
    val (schema, row) = schemaAndRow
    val df = spark.createDataFrame(java.util.List.of(row), schema)
    df.select(ExprCompiler.compileString(expr, schema).as("r")).head().get(0)
  }

  private val intRow = (
    StructType(Seq(StructField("a", LongType), StructField("b", LongType))),
    Row(7L, 2L))

  test("integer division truncates toward zero (Rust isize semantics)") {
    assert(eval1("a / b", intRow) == 3L)
    assert(eval1("a / b", (intRow._1, Row(-7L, 2L))) == -3L) // trunc, not floor
  }

  test("^ is pow(x, abs(y)): negative exponent treated positive") {
    // reference: config/types.rs:78,85
    assert(eval1("a ^ b", intRow) == 49L)
    assert(eval1("a ^ b", (intRow._1, Row(2L, -3L))) == 8L)
  }

  test("left-to-right chaining evaluates (a + b) * a") {
    assert(eval1("a + b * a", intRow) == 63L) // (7+2)*7
  }

  test("Integer/Decimal promotes to Decimal") {
    val r = eval1("a + 1.5", intRow)
    assert(r.isInstanceOf[java.math.BigDecimal])
    assert(new java.math.BigDecimal("8.5").compareTo(r.asInstanceOf[java.math.BigDecimal]) == 0)
  }

  test("string + is correct concat (documented divergence from reference bug)") {
    val s = (StructType(Seq(StructField("x", StringType), StructField("y", StringType))),
      Row("foo", "bar"))
    assert(eval1("x + y", s) == "foobar")
  }

  test("comparisons and boolean ops") {
    assert(eval1("(a > b) && (b == 2)", intRow) == true)
    assert(eval1("a <= b", intRow) == false)
    assert(eval1("a != b", intRow) == true)
  }

  test("function-call syntax wires to Spark built-ins (reserved in the reference)") {
    // the reference parses `name(args)` but errors at eval
    // (transform.rs:291) — we resolve through the session function registry
    assert(eval1("abs(b - a)", intRow) == 5L)
  }

  test("curated built-in functions are typed and compose with arithmetic") {
    val s = (StructType(Seq(StructField("name", StringType), StructField("bal", DoubleType))),
      Row("alex", -2.7))
    assert(eval1("upper(name)", s) == "ALEX")
    assert(eval1("length(name) + 10", s) == 14L)
    assert(eval1("floor(bal)", s) == -3L)
    assert(eval1("concat(name, \"-x\")", s) == "alex-x")
    // typed result feeds the reference's comparison rules
    assert(eval1("length(name) >= 4", s) == true)
  }

  test("literal ~ word errors like the reference (leading-form check wins)") {
    // the reference checks the i==1 leading-destination branch FIRST and
    // errors when the head is not a word, even though the trailing form
    // would parse (expression_parser.rs:18-28) — replicated for parity
    val e = intercept[ExprParseException](ExprParser.parseAssignment("5 ~ five"))
    assert(e.getMessage.contains("destination is not a word"))
  }

  test("unknown column errors like the reference") {
    val e = intercept[ExprTypeException](eval1("nope + 1", intRow))
    assert(e.getMessage.contains("No such column"))
  }

  test("memo outside aggregation errors") {
    assertThrows[ExprTypeException](eval1("memo.x + 1", intRow))
  }

  test("operator undefined for type combo errors") {
    val s = (StructType(Seq(StructField("x", StringType), StructField("a", LongType))), Row("s", 1L))
    assertThrows[ExprTypeException](eval1("x - a", s))
  }
}
