package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.util.parsing.combinator.RegexParsers
import graft.core.ArraySchema

/** The reference's QueryCondition mini-language re-expressed as a plain
  * Scala parser producing `org.apache.spark.sql.Column` predicates —
  * every construct maps to Catalyst built-ins, so conditions get
  * predicate-pushdown / codegen for free.
  *
  * Grammar reproduced (reference: tiledb/query_condition.py:22-123 doc,
  * 126-521 AST visitor; typed builders tiledb/query_condition.cc:149-320):
  *   - comparisons  == != < <= > >=  on attrs or dims
  *   - logical `and`/`or` and bitwise `&`/`|` (and binds tighter than or)
  *   - `not` negation
  *   - membership `in` / `not in` value lists
  *   - chained comparisons  a < attr < b  -> AND of pairs
  *   - `attr("name")` / `dim("name")` / `val(x)` escapes
  *   - constant-side reversal  5 > a  ->  a < 5
  *   - comparison to None -> null test (isNull / isNotNull)
  *   - string, int, float, bool literals; single or double quotes
  *
  * Sparse semantics (drop non-matching cells) = `df.filter(cond)`;
  * dense semantics (shape preserved, non-matching cells read back as
  * fill values, reference: tiledb/query_condition.py:31-39) =
  * `QueryCondition.denseApply`.
  */
object QueryCondition {

  sealed trait Term
  case class ColRef(name: String) extends Term
  case class Lit(value: Any) extends Term // String | Long | Double | Boolean | null

  sealed trait Node
  case class Cmp(op: String, l: Term, r: Term) extends Node
  case class InList(col: ColRef, values: Seq[Lit], negated: Boolean) extends Node
  case class AndN(l: Node, r: Node) extends Node
  case class OrN(l: Node, r: Node) extends Node
  case class NotN(e: Node) extends Node

  private object P extends RegexParsers {
    // or-expr is the entry; `and` binds tighter than `or`
    def expr: Parser[Node] = andExpr ~ rep(("or" | "|") ~> andExpr) ^^ {
      case h ~ t => t.foldLeft(h)(OrN.apply)
    }
    def andExpr: Parser[Node] = notExpr ~ rep(("and" | "&") ~> notExpr) ^^ {
      case h ~ t => t.foldLeft(h)(AndN.apply)
    }
    def notExpr: Parser[Node] = ("not" ~> notExpr ^^ NotN.apply) | atom
    def atom: Parser[Node] = ("(" ~> expr <~ ")") | membership | comparison

    def membership: Parser[Node] =
      colRef ~ opt("not") ~ ("in" ~> valueList) ^^ {
        case c ~ neg ~ vs => InList(c, vs, neg.isDefined)
      }
    def valueList: Parser[Seq[Lit]] =
      ("[" ~> repsep(literal, ",") <~ "]") | ("(" ~> repsep(literal, ",") <~ ")")

    // chained comparisons: term (op term)+ folds into AND of adjacent pairs
    // (reference: tiledb/query_condition.py:200-207)
    def comparison: Parser[Node] = term ~ rep1(cmpOp ~ term) ^^ { case first ~ rest =>
      val terms = first +: rest.map(_._2)
      val ops = rest.map(_._1)
      val pairs = ops.zipWithIndex.map { case (op, i) => Cmp(op, terms(i), terms(i + 1)): Node }
      pairs.reduceLeft(AndN.apply)
    }
    def cmpOp: Parser[String] = "==" | "!=" | "<=" | ">=" | "<" | ">"

    def term: Parser[Term] = literalTerm | colRef
    def colRef: Parser[ColRef] =
      (("attr" | "dim") ~> "(" ~> stringLit <~ ")" ^^ ColRef.apply) |
      (ident ^^ ColRef.apply)
    def literalTerm: Parser[Term] =
      ("val" ~> "(" ~> literal <~ ")") | literal
    def literal: Parser[Lit] =
      floatLit | intLit | stringLit ^^ (s => Lit(s)) | boolLit | noneLit
    def ident: Parser[String] = not("not\\b".r | "in\\b".r | "and\\b".r | "or\\b".r) ~>
      """[A-Za-z_][A-Za-z0-9_.]*""".r
    def stringLit: Parser[String] =
      ("\"" + """[^"]*""" + "\"").r ^^ (s => s.substring(1, s.length - 1)) |
      ("'" + """[^']*""" + "'").r ^^ (s => s.substring(1, s.length - 1))
    def floatLit: Parser[Lit] = """-?(\d+\.\d*|\.\d+)([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+""".r ^^ (s => Lit(s.toDouble))
    def intLit: Parser[Lit] = """-?\d+""".r ^^ (s => Lit(s.toLong))
    def boolLit: Parser[Lit] = ("True" ^^^ Lit(true)) | ("False" ^^^ Lit(false))
    def noneLit: Parser[Lit] = "None" ^^^ Lit(null)

    def parseAll(s: String): Node = this.parse(phrase(expr), s) match {
      case Success(n, _) => n
      case NoSuccess(msg, rest) => throw new IllegalArgumentException(
        s"QueryCondition parse error at '${rest.source.toString.drop(rest.offset)}': $msg")
      case other => throw new IllegalArgumentException(s"QueryCondition parse failure: $other")
    }
  }

  def parse(expression: String): Node = P.parseAll(expression)

  /** Compile a condition string to a Spark Column. If a schema is given,
    * column names are validated against it (the reference resolves types
    * by re-opening the array; Catalyst resolves ours at analysis). */
  def compile(expression: String, schema: Option[ArraySchema] = None): Column = {
    val node = parse(expression)
    schema.foreach(s => validateCols(node, s))
    toColumn(node, schema)
  }

  private def validateCols(n: Node, s: ArraySchema): Unit = n match {
    case Cmp(_, l, r) => Seq(l, r).foreach {
      case ColRef(c) => require(s.hasColumn(c), s"no attr or dim named '$c'")
      case _ =>
    }
    case InList(ColRef(c), _, _) => require(s.hasColumn(c), s"no attr or dim named '$c'")
    case AndN(l, r) => validateCols(l, s); validateCols(r, s)
    case OrN(l, r) => validateCols(l, s); validateCols(r, s)
    case NotN(e) => validateCols(e, s)
    case _ =>
  }

  /** Render one Spark DSv2 pushed filter as a QueryCondition string
    * (the currency of [[graft.storage.ArrayTable.delete]] tombstones) —
    * None when the filter or any literal has no grammar form (LIKE,
    * timestamps, strings containing quotes, exotic column names). Used
    * by SQL `DELETE FROM` on catalog tables: the translated condition
    * goes through the SAME parse/validate/compile path as an
    * API-issued delete, so SQL deletes and API deletes are one
    * mechanism with one semantics. */
  def fromFilter(f: org.apache.spark.sql.sources.Filter): Option[String] = {
    import org.apache.spark.sql.sources._
    def name(c: String): Option[String] =
      Option(c).filter(_.matches("[A-Za-z_][A-Za-z0-9_.]*"))
        .filterNot(Set("not", "in", "and", "or", "val", "attr", "dim"))
    def litS(v: Any): Option[String] = v match {
      // SQL `c = NULL` / `c > NULL` is never-true, but the grammar's
      // `c == None` means IS NULL — translating would turn a no-op
      // delete into "delete all NULL rows". Refuse; only the explicit
      // null-safe forms (EqualNullSafe, IsNull) map to the None test.
      case null => None
      case s: String =>
        if (s.contains("'") || s.contains("\\") || s.contains("\n")) None
        else Some(s"'$s'")
      case b: java.lang.Boolean => Some(if (b) "True" else "False")
      case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
           _: java.lang.Byte => Some(v.toString)
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) None
        else Some(d.toString) // always contains '.' or exponent
      case fl: java.lang.Float =>
        if (fl.isNaN || fl.isInfinite) None else Some(fl.toDouble.toString)
      case d: java.math.BigDecimal => Some(d.toPlainString match {
        case s if s.contains(".") => s; case s => s + ".0"
      })
      case _ => None // timestamps/dates/binary: no grammar literal
    }
    def bin(c: String, op: String, v: Any): Option[String] =
      for (n <- name(c); l <- litS(v)) yield s"$n $op $l"
    f match {
      case EqualTo(c, v) => bin(c, "==", v)
      case EqualNullSafe(c, null) => name(c).map(n => s"$n == None")
      case EqualNullSafe(c, v) => bin(c, "==", v)
      case GreaterThan(c, v) => bin(c, ">", v)
      case GreaterThanOrEqual(c, v) => bin(c, ">=", v)
      case LessThan(c, v) => bin(c, "<", v)
      case LessThanOrEqual(c, v) => bin(c, "<=", v)
      case In(c, vs) =>
        // a NULL element makes the whole In untranslatable: dropping it
        // would flip `NOT IN (.., NULL)` from SQL's never-true into a
        // mass delete of everything outside the list
        for {
          n <- name(c)
          ls <- vs.foldLeft(Option(Seq.empty[String])) { (acc, v) =>
            for (a <- acc; if v != null; l <- litS(v)) yield a :+ l
          }
          if ls.nonEmpty
        } yield s"$n in [${ls.mkString(", ")}]"
      case IsNull(c) => name(c).map(n => s"$n == None")
      case IsNotNull(c) => name(c).map(n => s"$n != None")
      case And(l, r) =>
        for (a <- fromFilter(l); b <- fromFilter(r)) yield s"($a and $b)"
      case Or(l, r) =>
        for (a <- fromFilter(l); b <- fromFilter(r)) yield s"($a or $b)"
      case Not(c) => fromFilter(c).map(s => s"not ($s)")
      case _ => None
    }
  }

  def toColumn(n: Node): Column = toColumn(n, None)

  private def toColumn(n: Node, schema: Option[ArraySchema]): Column = n match {
    case AndN(l, r) => toColumn(l, schema) && toColumn(r, schema)
    case OrN(l, r) => toColumn(l, schema) || toColumn(r, schema)
    case NotN(e) => !toColumn(e, schema)
    case InList(ColRef(c), vs, neg) =>
      val in = col(c).isin(vs.map(_.value): _*)
      if (neg) !in else in
    case Cmp(op, ColRef(c), Lit(null)) => op match {
      // comparison to None -> null test (reference:
      // tiledb/query_condition.py:279-281,413-415)
      case "==" => col(c).isNull
      case "!=" => col(c).isNotNull
      case other => sys.error(s"operator $other not valid against None")
    }
    case Cmp(op, Lit(null), r: ColRef) => toColumn(Cmp(op, r, Lit(null)), schema)
    case Cmp(op, ColRef(c), Lit(v)) => emitCmp(op, c, v, schema)
    // constant-side reversal: 5 > a -> a < 5 (reference:
    // tiledb/query_condition.py:313-336)
    case Cmp(op, Lit(v), ColRef(c)) => emitCmp(reverse(op), c, v, schema)
    case Cmp(op, ColRef(a), ColRef(b)) => applyOp(op, col(a), col(b))
    case Cmp(op, Lit(a), Lit(b)) => applyOp(op, lit(a), lit(b))
    case other => sys.error(s"cannot compile: $other")
  }

  /** Inequalities on an ENUMERATED attr compare by the enumeration's
    * value order, not lexicographically — the reference resolves the
    * condition value through the enum's dtype and libtiledb compares
    * indices, requiring the enumeration be `ordered` (reference:
    * tiledb/query_condition.py:283-295; enumeration.py ordered flag).
    * Equality/membership stay label comparisons on the decoded values. */
  private def emitCmp(op: String, c: String, v: Any,
      schema: Option[ArraySchema]): Column = {
    val enumOpt = schema.flatMap(s =>
      s.attrs.find(_.name == c).flatMap(_.enumLabel).map(s.enumeration))
    (enumOpt, op) match {
      case (Some(e), "<" | "<=" | ">" | ">=") =>
        require(e.ordered,
          s"inequality on attr '$c' requires an ordered enumeration ('${e.name}' is unordered)")
        val label = v.toString
        val idx = e.values.indexOf(label)
        require(idx >= 0, s"value '$label' not in enumeration '${e.name}'")
        val pos = map(e.values.zipWithIndex.flatMap { case (l, i) =>
          Seq(lit(l), lit(i)) }: _*)
        applyOp(op, element_at(pos, col(c)), lit(idx))
      case _ => applyOp(op, col(c), lit(v))
    }
  }

  private def applyOp(op: String, l: Column, r: Column): Column = op match {
    case "==" => l === r
    case "!=" => l =!= r
    case "<"  => l < r
    case "<=" => l <= r
    case ">"  => l > r
    case ">=" => l >= r
  }

  private def reverse(op: String): String = op match {
    case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
    case other => other // == and != are symmetric
  }

  /** Dense semantics: keep the selection's shape, replacing attribute
    * values of non-matching cells with their fill values
    * (reference: tiledb/query_condition.py:34-39). */
  def denseApply(df: org.apache.spark.sql.DataFrame, expression: String,
      schema: ArraySchema): org.apache.spark.sql.DataFrame = {
    val cond = compile(expression, Some(schema))
    val cols = schema.dims.map(d => col(d.name)) ++ schema.attrs.map { a =>
      val fillCol = a.fill.map(f => lit(castFill(f, a.dtype))).getOrElse(lit(null).cast(graft.core.Dtypes.sparkType(a.dtype)))
      when(cond, col(a.name)).otherwise(fillCol).as(a.name)
    }
    df.select(cols: _*)
  }

  private[graft] def castFill(f: String, dtype: String): Any = dtype match {
    case d if d.startsWith("int") || d.startsWith("uint") => f.toLong
    case d if d.startsWith("float") => f.toDouble
    case "bool" => f.toBoolean
    case _ => f
  }
}
