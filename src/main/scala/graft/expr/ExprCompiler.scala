package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AST for the reference expression language.
  *
  * Grammar and associativity follow the reference parser
  * (reference: reactive_db/src/config/expression_parser.rs:14-179):
  *   - assignments `dest ~ expr`
  *   - the FIRST comparison/boolean operator at paren depth 0 splits the
  *     expression (expression_parser.rs:90-103)
  *   - the LAST arithmetic operator at depth 0 becomes the root, i.e.
  *     strict left-to-right chaining: `a + b * c == (a + b) * c`
  *     (expression_parser.rs:104-116)
  *   - literals: integer, decimal (contains '.'), "string", true/false
  *   - any other word is a column reference; `memo.<name>` references the
  *     running aggregate (expression_parser.rs:221)
  */
sealed trait GExpr
object GExpr {
  case class IntLit(v: Long) extends GExpr
  case class DecLit(v: BigDecimal) extends GExpr
  case class StrLit(v: String) extends GExpr
  case class BoolLit(v: Boolean) extends GExpr
  case class ColRef(name: String) extends GExpr
  case class MemoRef(name: String) extends GExpr
  case class BinOp(op: String, l: GExpr, r: GExpr) extends GExpr
  case class FnCall(name: String, args: List[GExpr]) extends GExpr

  /** Does this subtree reference any memo.* ? */
  def hasMemo(e: GExpr): Boolean = e match {
    case MemoRef(_)      => true
    case BinOp(_, l, r)  => hasMemo(l) || hasMemo(r)
    case FnCall(_, args) => args.exists(hasMemo)
    case _               => false
  }

  /** Does this subtree reference any input-row column? */
  def hasColRef(e: GExpr): Boolean = e match {
    case ColRef(_)       => true
    case BinOp(_, l, r)  => hasColRef(l) || hasColRef(r)
    case FnCall(_, args) => args.exists(hasColRef)
    case _               => false
  }

  /** All input-row columns referenced by this subtree. */
  def collectCols(e: GExpr): Set[String] = e match {
    case ColRef(n)       => Set(n)
    case BinOp(_, l, r)  => collectCols(l) ++ collectCols(r)
    case FnCall(_, args) => args.flatMap(collectCols).toSet
    case _               => Set.empty
  }
}

final case class Assignment(dest: String, expr: GExpr)

case class ExprParseException(msg: String) extends Exception(msg)
case class ExprTypeException(msg: String) extends Exception(msg)

object ExprParser {
  sealed trait Tok
  case class TWord(s: String) extends Tok
  case class TInt(v: Long) extends Tok
  case class TDec(v: BigDecimal) extends Tok
  case class TStr(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case object TLParen extends Tok
  case object TRParen extends Tok
  case object TTilde extends Tok
  case object TComma extends Tok

  private val twoCharOps = Set("==", "!=", "<=", ">=", "&&", "||")
  private val cmpOps = Set("==", "!=", "<", "<=", ">", ">=", "&&", "||")
  private val arithOps = Set("+", "-", "*", "/", "^")

  def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        if (end < 0) throw ExprParseException(s"unterminated string in: $s")
        out += TStr(s.substring(i + 1, end)); i = end + 1
      } else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == '~') { out += TTilde; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (i + 1 < s.length && twoCharOps.contains(s.substring(i, i + 2))) {
        out += TOp(s.substring(i, i + 2)); i += 2
      } else if ("+-*/^<>".contains(c)) { out += TOp(c.toString); i += 1 }
      else if (c.isDigit) {
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        val t = s.substring(start, i)
        try {
          if (t.contains('.')) out += TDec(BigDecimal(t)) else out += TInt(t.toLong)
        } catch {
          case _: NumberFormatException =>
            throw ExprParseException(s"malformed numeric literal '$t' in: $s")
        }
      } else if (c.isLetter || c == '_') {
        // words may contain '.' (memo.count) and '_' (_entryId)
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        out += TWord(s.substring(start, i))
      } else throw ExprParseException(s"unexpected char '$c' in: $s")
    }
    out.toList
  }

  /** Parse an assignment. Like the reference, the `~` may sit after the
    * destination (`dest ~ expr`) or before a trailing destination
    * (`expr ~ dest`); anywhere else is an error
    * (reference: expression_parser.rs:14-51). */
  def parseAssignment(s: String): Assignment = {
    val toks = lex(s)
    val i = toks.indexOf(TTilde)
    if (i < 0) throw ExprParseException(s"No assignment found in: $s")
    if (i == 1) toks.head match {
      case TWord(dest) => Assignment(dest, parseExpr(toks.drop(2), s))
      case _ => throw ExprParseException(s"Assignment destination is not a word in: $s")
    }
    else if (i == toks.length - 2) toks.last match {
      case TWord(dest) => Assignment(dest, parseExpr(toks.take(i), s))
      case _ => throw ExprParseException(s"Assignment destination is not a word in: $s")
    }
    else throw ExprParseException(s"Assignment found in middle of statement: $s")
  }

  def parse(s: String): GExpr = parseExpr(lex(s), s)

  private def parseExpr(toks: List[Tok], src: String): GExpr = {
    if (toks.isEmpty) throw ExprParseException(s"empty expression in: $src")
    // 1) FIRST comparison/boolean op at depth 0 splits
    var depth = 0
    var cmpIdx = -1
    var i = 0
    val arr = toks.toVector
    while (i < arr.length && cmpIdx < 0) {
      arr(i) match {
        case TLParen => depth += 1
        case TRParen => depth -= 1
        case TOp(op) if depth == 0 && cmpOps.contains(op) => cmpIdx = i
        case _ =>
      }
      i += 1
    }
    if (cmpIdx >= 0) {
      val TOp(op) = arr(cmpIdx): @unchecked
      return GExpr.BinOp(op, parseExpr(arr.take(cmpIdx).toList, src), parseExpr(arr.drop(cmpIdx + 1).toList, src))
    }
    // 2) LAST arithmetic op at depth 0 is the root (left-to-right chaining)
    depth = 0
    var arithIdx = -1
    i = 0
    while (i < arr.length) {
      arr(i) match {
        case TLParen => depth += 1
        case TRParen => depth -= 1
        case TOp(op) if depth == 0 && arithOps.contains(op) && i > 0 => arithIdx = i
        case _ =>
      }
      i += 1
    }
    if (arithIdx >= 0) {
      val TOp(op) = arr(arithIdx): @unchecked
      return GExpr.BinOp(op, parseExpr(arr.take(arithIdx).toList, src), parseExpr(arr.drop(arithIdx + 1).toList, src))
    }
    // 3) single term
    arr.toList match {
      case TInt(v) :: Nil  => GExpr.IntLit(v)
      case TDec(v) :: Nil  => GExpr.DecLit(v)
      case TStr(v) :: Nil  => GExpr.StrLit(v)
      case TWord("true") :: Nil  => GExpr.BoolLit(true)
      case TWord("false") :: Nil => GExpr.BoolLit(false)
      case TWord(w) :: Nil =>
        if (w.startsWith("memo.")) GExpr.MemoRef(w.stripPrefix("memo."))
        else GExpr.ColRef(w)
      case TWord(fn) :: TLParen :: rest if rest.lastOption.contains(TRParen) =>
        // function-call syntax: parsed, reserved (reference errors at eval:
        // reactive_db/src/hooks/transforms/transform.rs:291)
        val inner = rest.dropRight(1)
        val args = splitArgs(inner).map(a => parseExpr(a, src))
        GExpr.FnCall(fn, args)
      case TLParen :: rest if rest.lastOption.contains(TRParen) =>
        parseExpr(rest.dropRight(1), src)
      case other => throw ExprParseException(s"cannot parse term $other in: $src")
    }
  }

  private def splitArgs(toks: List[Tok]): List[List[Tok]] = {
    if (toks.isEmpty) return Nil
    val out = scala.collection.mutable.ListBuffer.empty[List[Tok]]
    val cur = scala.collection.mutable.ListBuffer.empty[Tok]
    var depth = 0
    toks.foreach {
      case TComma if depth == 0 => out += cur.toList; cur.clear()
      case t =>
        t match { case TLParen => depth += 1; case TRParen => depth -= 1; case _ => }
        cur += t
    }
    out += cur.toList
    out.toList
  }
}

/** Compiles a [[GExpr]] to a Spark [[Column]] with reference-faithful
  * arithmetic semantics (reference: reactive_db/src/config/types.rs:19-103):
  *
  *   - Integer (Long) ops are closed: `/` truncates toward zero,
  *     `^` is `pow(x, abs(y))` (types.rs:78,85)
  *   - mixed Integer/Decimal promotes to Decimal (types.rs:87-88); the
  *     engine's Decimal is DecimalType(38,18), so Decimal `*` and `/`
  *     follow Spark's precision-loss adjustment and round to scale 6
  *     (HALF_UP) — the reference's Rust `bigdecimal` is
  *     arbitrary-precision, which no fixed-precision engine can reproduce
  *     (divergence pinned by ExprPropertySpec)
  *   - string `+` is CORRECT concat — deliberate divergence from the
  *     reference bug that returns the left operand (types.rs:89-96)
  *   - comparisons/boolean ops map to Column === =!= < <= > >= && ||
  *
  * Everything compiles to built-in Catalyst expressions → whole-stage
  * codegen applies; no UDFs anywhere on this path.
  */
object ExprCompiler {
  sealed trait GType
  case object GInt extends GType
  case object GDec extends GType
  case object GDouble extends GType
  case object GStr extends GType
  case object GBool extends GType
  case class GOther(dt: DataType) extends GType

  def toGType(dt: DataType): GType = dt match {
    case ByteType | ShortType | IntegerType | LongType => GInt
    case _: DecimalType                                => GDec
    case FloatType | DoubleType                        => GDouble
    case StringType                                    => GStr
    case BooleanType                                   => GBool
    case other                                         => GOther(other)
  }

  val refDecimal: DecimalType = DecimalType(38, 18)

  case class Typed(col: Column, t: GType)

  type Resolver = String => Typed

  /** Resolver backed by a schema: plain `col(name)`, erroring (like the
    * reference's "No such column" — storage_manager_table.rs:124-128) on
    * unknown names. */
  def schemaResolver(schema: StructType): Resolver = { name =>
    schema.fields.find(_.name == name) match {
      // backtick-quote: an unquoted dotted name (the lexer accepts dots
      // in words) would be misread as struct-field access at analysis
      case Some(f) => Typed(col(s"`$name`"), toGType(f.dataType))
      case None    => throw ExprTypeException(s"No such column $name exists")
    }
  }

  def compile(e: GExpr, resolve: Resolver, memo: Resolver = noMemo): Typed = e match {
    case GExpr.IntLit(v)  => Typed(lit(v), GInt)
    case GExpr.DecLit(v)  => Typed(lit(v.underlying()).cast(refDecimal), GDec)
    case GExpr.StrLit(v)  => Typed(lit(v), GStr)
    case GExpr.BoolLit(v) => Typed(lit(v), GBool)
    case GExpr.ColRef(n)  => resolve(n)
    case GExpr.MemoRef(n) => memo(n)
    case GExpr.FnCall(name, args) =>
      // The reference parses call syntax but errors at eval ("currently
      // unimplimented", transform.rs:291); we wire it to Spark built-ins
      // as a capability upgrade. Functions in the curated table get a
      // typed result (so calls compose with arithmetic, e.g.
      // `length(name) + 1`); anything else passes through untyped.
      val compiled = args.map(a => compile(a, resolve, memo))
      builtinFns.get(name) match {
        case Some(f) => f(compiled)
        case None => Typed(call_function(name, compiled.map(_.col): _*), GOther(NullType))
      }
    case GExpr.BinOp(op, l, r) =>
      val lt = compile(l, resolve, memo)
      val rt = compile(r, resolve, memo)
      binOp(op, lt, rt)
  }

  private val noMemo: Resolver = n => throw ExprTypeException(s"memo.$n outside aggregation")

  /** Curated scalar-function table for the expression language (the
    * reference has NO scalar functions — §2.4 "Absent scalar functions" —
    * so this whole surface is an extension; types keep calls composable
    * with the reference's arithmetic rules). Wrong arity is a typed
    * compile error, not a bare collections exception. */
  private def nAry(name: String, n: Int)(f: List[Typed] => Typed): (String, List[Typed] => Typed) =
    name -> { (a: List[Typed]) =>
      if (a.length != n)
        throw ExprTypeException(s"$name expects $n argument(s), got ${a.length}")
      f(a)
    }
  private val builtinFns: Map[String, List[Typed] => Typed] = Map(
    nAry("abs", 1)(a => Typed(abs(a.head.col), a.head.t)),
    nAry("upper", 1)(a => Typed(upper(a.head.col), GStr)),
    nAry("lower", 1)(a => Typed(lower(a.head.col), GStr)),
    nAry("trim", 1)(a => Typed(trim(a.head.col), GStr)),
    "concat" -> { (a: List[Typed]) =>
      if (a.isEmpty) throw ExprTypeException("concat expects at least 1 argument")
      Typed(concat(a.map(_.col): _*), GStr)
    },
    nAry("substring", 3)(a => Typed(
      substring(a.head.col, a(1).col.cast(IntegerType), a(2).col.cast(IntegerType)), GStr)),
    nAry("length", 1)(a => Typed(length(a.head.col).cast(LongType), GInt)),
    nAry("floor", 1)(a => Typed(floor(a.head.col.cast(DoubleType)), GInt)),
    nAry("ceil", 1)(a => Typed(ceil(a.head.col.cast(DoubleType)), GInt)),
    nAry("sqrt", 1)(a => Typed(sqrt(a.head.col.cast(DoubleType)), GDouble)),
    nAry("md5", 1)(a => Typed(md5(to_binary(a.head.col, lit("utf-8"))), GStr)))

  def binOp(op: String, l: Typed, r: Typed): Typed = op match {
    case "+" | "-" | "*" | "/" | "^" => arith(op, l, r)
    case "==" => Typed(l.col === r.col, GBool)
    case "!=" => Typed(l.col =!= r.col, GBool)
    case "<"  => Typed(l.col < r.col, GBool)
    case "<=" => Typed(l.col <= r.col, GBool)
    case ">"  => Typed(l.col > r.col, GBool)
    case ">=" => Typed(l.col >= r.col, GBool)
    case "&&" => Typed(l.col && r.col, GBool)
    case "||" => Typed(l.col || r.col, GBool)
    case other => throw ExprTypeException(s"unknown operator $other")
  }

  private def arith(op: String, l: Typed, r: Typed): Typed = (l.t, r.t) match {
    case (GInt, GInt) =>
      op match {
        case "+" => Typed(l.col + r.col, GInt)
        case "-" => Typed(l.col - r.col, GInt)
        case "*" => Typed(l.col * r.col, GInt)
        // integer division truncating toward zero, like Rust isize `/`
        // (reference: config/types.rs:75): Spark's `div` integral divide.
        case "/" => Typed(call_function("div", l.col.cast(LongType), r.col.cast(LongType)), GInt)
        // `^` = x.pow(abs(y)) (reference: config/types.rs:78,85) — the
        // native int_pow kernel keeps results exact beyond 2^53, where a
        // double-based pow silently rounds (requires GraftFunctions
        // registration, which every Transforms entry point performs)
        case "^" => Typed(
          call_function("int_pow", l.col.cast(LongType), r.col.cast(LongType)), GInt)
      }
    case (GStr, GStr) if op == "+" =>
      // CORRECT concat; the reference returns the left operand unchanged
      // (config/types.rs:89-96) — documented divergence.
      Typed(concat(l.col, r.col), GStr)
    case (a, b) if isNumeric(a) && isNumeric(b) =>
      if (a == GDouble || b == GDouble) {
        val (lc, rc) = (l.col.cast(DoubleType), r.col.cast(DoubleType))
        op match {
          case "+" => Typed(lc + rc, GDouble)
          case "-" => Typed(lc - rc, GDouble)
          case "*" => Typed(lc * rc, GDouble)
          case "/" => Typed(lc / rc, GDouble)
          case "^" => Typed(pow(lc, abs(rc)), GDouble)
        }
      } else {
        // Integer/Decimal promotes to Decimal (config/types.rs:87-88);
        // `^` on Decimal errors in the reference — we allow it via double.
        val (lc, rc) = (l.col.cast(refDecimal), r.col.cast(refDecimal))
        op match {
          case "+" => Typed(lc + rc, GDec)
          case "-" => Typed(lc - rc, GDec)
          case "*" => Typed(lc * rc, GDec)
          case "/" => Typed(lc / rc, GDec)
          case "^" => Typed(pow(lc.cast(DoubleType), abs(rc.cast(DoubleType))), GDouble)
        }
      }
    case (a, b) =>
      throw ExprTypeException(s"operator $op not defined for ($a, $b)")
  }

  private def isNumeric(t: GType): Boolean = t == GInt || t == GDec || t == GDouble

  /** Convenience: compile an expression string against a schema. */
  def compileString(s: String, schema: StructType): Column =
    compile(ExprParser.parse(s), schemaResolver(schema)).col

  /** Compile a `dest ~ expr` assignment against a schema. */
  def compileAssignment(s: String, schema: StructType): (String, Column) = {
    val a = ExprParser.parseAssignment(s)
    a.dest -> compile(a.expr, schemaResolver(schema)).col
  }
}
