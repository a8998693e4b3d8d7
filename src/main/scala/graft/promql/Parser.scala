package graft.promql

import graft.Model
import graft.functions.TimeParse
import graft.operators.Selector
import graft.operators.Selector.Matcher

/** PromQL AST for the subset the reference evaluates (query.rs:548-581):
  * vector selectors with label matchers, `[range]` vectors, `offset`
  * modifiers, scalar literals, and the functions rate/irate/sum-by/
  * histogram_quantile.
  */
sealed trait Node
final case class VectorSel(matchers: Seq[Matcher], range: Option[Double], offset: Option[Double]) extends Node
final case class ScalarLit(value: Double) extends Node
/** String literal — valid only as a function argument (label_replace etc.);
  * as a top-level expression it is rejected at eval like the reference's
  * `Node::String` (query.rs:568-570). */
final case class StringLit(value: String) extends Node
/** Aggregation grouping modifier: `by (...)` keeps the listed labels,
  * `without (...)` drops them (plus `__name__`, Prometheus semantics). The
  * reference rejects `without` (query.rs:461-463); supporting it is an
  * extension like the binary operators. */
sealed trait AggMod { def labels: Seq[String] }
final case class ByMod(labels: Seq[String]) extends AggMod
final case class WithoutMod(labels: Seq[String]) extends AggMod
final case class FuncCall(name: String, args: Seq[Node], by: Option[AggMod]) extends Node
/** Subquery `expr[range:step]` (extension — Prometheus subquery syntax):
  * the inner expression is evaluated as an instant vector on its own
  * step-aligned grid, and the result is consumed like a range vector by the
  * enclosing range function. `step = None` (`[1h:]`) inherits the outer
  * query step. */
final case class Subquery(inner: Node, range: Double, step: Option[Double],
                          offset: Option[Double]) extends Node
/** `@` timestamp pin (extension; Prometheus 2.25+): evaluate the wrapped
  * instant expression at one fixed time and replicate the result across
  * every output grid step. Prometheus's grammar attaches `@` to selectors
  * and subqueries; here it is a general postfix on any instant expression —
  * `rate(m[5m]) @ t` expresses Prometheus's `rate(m[5m] @ t)` (the two are
  * defined to be equal: a pinned range window makes the enclosing function
  * constant over the output steps). */
sealed trait AtSpec
final case class AtTs(ts: Double) extends AtSpec
case object AtStart extends AtSpec
case object AtEnd extends AtSpec
final case class AtMod(inner: Node, at: AtSpec) extends Node
/** Binary operation (extension — the reference's process_ast rejects
  * `Node::Operator` with "Not implemented yet", query.rs:549-551; semantics
  * follow the Prometheus operator docs). `matchOn`/`matchIgnoring` are the
  * `on(...)`/`ignoring(...)` vector-matching modifiers; `boolMod` is the
  * `bool` modifier on comparison operators. */
final case class BinOp(op: String, lhs: Node, rhs: Node,
                       matchOn: Option[Seq[String]], matchIgnoring: Option[Seq[String]],
                       boolMod: Boolean) extends Node
/** Many-to-one vector matching (`group_left`/`group_right`, with an
  * optional include-label list), wrapped around the BinOp it modifies so
  * the 6-field BinOp shape (and every pattern match on it) stays stable.
  * `leftIsMany` = group_left. Requires an explicit `on`/`ignoring`. */
final case class ManyToOne(leftIsMany: Boolean, include: Seq[String])
final case class Grouped(b: BinOp, group: ManyToOne) extends Node

/** Operator classes shared by the parser and the evaluator. */
object Ops {
  val ArithOps: Set[String] = Set("+", "-", "*", "/", "%", "^")
  val CmpOps: Set[String] = Set("==", "!=", ">", "<", ">=", "<=")
  val SetOps: Set[String] = Set("and", "or", "unless")
  def isCmp(op: String): Boolean = CmpOps(op)
}

/** Recursive-descent parser for the PromQL subset. Replaces the reference's
  * dependency on the `promql` crate (query.rs:586) with ~150 lines — the
  * grammar the reference actually evaluates is small.
  */
object Parser {
  final case class ParseException(msg: String) extends RuntimeException(msg)

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Num(s: String) extends Tok
  private case class Sym(s: String) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_' || c == ':') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_' || q(i) == ':')) i += 1
        out += Ident(q.substring(start, i))
      } else if (c.isDigit || (c == '.' && i + 1 < n && q(i + 1).isDigit)) {
        val start = i
        while (i < n && (q(i).isDigit || q(i) == '.')) i += 1
        // exponent suffix: 1e3, 1.5e-2, 2E+5 (duration units never use 'e',
        // so `5m`-style tokens are unaffected)
        if (i < n && (q(i) == 'e' || q(i) == 'E')) {
          val j = if (i + 1 < n && (q(i + 1) == '+' || q(i + 1) == '-')) i + 2 else i + 1
          if (j < n && q(j).isDigit) {
            i = j
            while (i < n && q(i).isDigit) i += 1
          }
        }
        out += Num(q.substring(start, i))
      } else if (c == '"' || c == '\'') {
        val quoteChar = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != quoteChar) {
          if (q(i) == '\\' && i + 1 < n) { sb.append(unescape(q(i + 1))); i += 2 }
          else { sb.append(q(i)); i += 1 }
        }
        if (i >= n) throw ParseException("unterminated string")
        i += 1
        out += Str(sb.toString)
      } else if (c == '=' && i + 1 < n && q(i + 1) == '~') { out += Sym("=~"); i += 2 }
      else if (c == '=' && i + 1 < n && q(i + 1) == '=') { out += Sym("=="); i += 2 }
      else if (c == '!' && i + 1 < n && q(i + 1) == '=') { out += Sym("!="); i += 2 }
      else if (c == '!' && i + 1 < n && q(i + 1) == '~') { out += Sym("!~"); i += 2 }
      else if (c == '<' && i + 1 < n && q(i + 1) == '=') { out += Sym("<="); i += 2 }
      else if (c == '>' && i + 1 < n && q(i + 1) == '=') { out += Sym(">="); i += 2 }
      else if ("{}[](),=<>+-*/%^@".contains(c)) { out += Sym(c.toString); i += 1 }
      else throw ParseException(s"unexpected character '$c' at $i")
    }
    out.toList
  }

  private def unescape(c: Char): Char = c match {
    case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'; case other => other
  }

  private final class State(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => throw ParseException("unexpected end of query")
    }
    def expect(sym: String): Unit = next() match {
      case Sym(`sym`) => ()
      case other => throw ParseException(s"expected '$sym', got $other")
    }
  }

  def parse(query: String): Node = {
    val st = new State(tokenize(query))
    val node = parseExpr(st)
    if (st.toks.nonEmpty) throw ParseException(s"trailing tokens: ${st.toks}")
    node
  }

  /** Binary-operator precedence ladder (Prometheus order, high→low:
    * `^` right-assoc; unary `-`/`+`; `* / %`; `+ -`; comparisons; `and
    * unless`; `or`). Each operator may carry `bool` (comparisons only) and
    * `on(...)`/`ignoring(...)` matching modifiers. */
  private def parseExpr(st: State): Node = parseOr(st)

  private final case class Mods(on: Option[Seq[String]], ignoring: Option[Seq[String]],
                                bool: Boolean, group: Option[ManyToOne])

  /** `bool`, then `on(...)` | `ignoring(...)`, then optional
    * `group_left`/`group_right` with an optional include-label list. */
  private def parseMods(st: State, op: String): Mods = {
    var bool = false
    if (st.peek.contains(Ident("bool"))) {
      if (!Ops.isCmp(op)) throw ParseException(s"bool modifier can only be used on comparison operators, not '$op'")
      st.next(); bool = true
    }
    var on: Option[Seq[String]] = None
    var ignoring: Option[Seq[String]] = None
    st.peek match {
      case Some(Ident("on")) => st.next(); on = Some(parseNameList(st))
      case Some(Ident("ignoring")) => st.next(); ignoring = Some(parseNameList(st))
      case _ => ()
    }
    var group: Option[ManyToOne] = None
    st.peek match {
      case Some(Ident(g @ ("group_left" | "group_right"))) =>
        st.next()
        if (on.isEmpty && ignoring.isEmpty)
          throw ParseException(s"'$g' requires an explicit on(...) or ignoring(...) matching")
        if (Ops.SetOps(op))
          throw ParseException(s"'$g' is not allowed on set operator '$op'")
        val include = if (st.peek.contains(Sym("("))) parseNameList(st) else Seq.empty
        group = Some(ManyToOne(g == "group_left", include))
      case _ => ()
    }
    Mods(on, ignoring, bool, group)
  }

  private def binOpLevel(st: State, ops: Set[String], next: State => Node): Node = {
    var lhs = next(st)
    var done = false
    while (!done) {
      st.peek match {
        case Some(Sym(s)) if ops(s) =>
          st.next(); val m = parseMods(st, s)
          val b = BinOp(s, lhs, next(st), m.on, m.ignoring, m.bool)
          lhs = m.group.fold(b: Node)(g => Grouped(b, g))
        case Some(Ident(s)) if ops(s) =>
          st.next(); val m = parseMods(st, s)
          val b = BinOp(s, lhs, next(st), m.on, m.ignoring, m.bool)
          lhs = m.group.fold(b: Node)(g => Grouped(b, g))
        case _ => done = true
      }
    }
    lhs
  }

  private def parseOr(st: State): Node = binOpLevel(st, Set("or"), parseAnd)
  private def parseAnd(st: State): Node = binOpLevel(st, Set("and", "unless"), parseCmp)
  private def parseCmp(st: State): Node = binOpLevel(st, Ops.CmpOps, parseAdd)
  private def parseAdd(st: State): Node = binOpLevel(st, Set("+", "-"), parseMul)
  private def parseMul(st: State): Node = binOpLevel(st, Set("*", "/", "%"), parseUnary)

  private def parseUnary(st: State): Node = st.peek match {
    case Some(Sym("-")) =>
      st.next()
      parseUnary(st) match {
        case ScalarLit(v) => ScalarLit(-v)
        case n => BinOp("-", ScalarLit(0.0), n, None, None, boolMod = false)
      }
    case Some(Sym("+")) => st.next(); parseUnary(st)
    case _ => parsePow(st)
  }

  private def parsePow(st: State): Node = {
    val base = parseAtom(st)
    if (st.peek.contains(Sym("^"))) { // right-associative
      st.next(); val m = parseMods(st, "^")
      val b = BinOp("^", base, parsePowRhs(st), m.on, m.ignoring, boolMod = false)
      m.group.fold(b: Node)(g => Grouped(b, g))
    } else base
  }

  /** The exponent of `^` may carry a unary sign (`2^-1` is valid PromQL)
    * even though `^` binds tighter than unary minus on its LEFT. */
  private def parsePowRhs(st: State): Node = st.peek match {
    case Some(Sym("-")) =>
      st.next()
      parsePowRhs(st) match {
        case ScalarLit(v) => ScalarLit(-v)
        case n => BinOp("-", ScalarLit(0.0), n, None, None, boolMod = false)
      }
    case Some(Sym("+")) => st.next(); parsePowRhs(st)
    case _ => parsePow(st)
  }

  private def parseAtom(st: State): Node = {
    val atom = st.peek match {
      case Some(Num(s)) => st.next(); ScalarLit(s.toDouble)
      case Some(Str(s)) => st.next(); StringLit(s)
      case Some(Sym("(")) => st.next(); val e = parseExpr(st); st.expect(")"); e
      // any identifier directly followed by '(' (or a 'by' clause) is a
      // function call — unknown functions fail at eval time like the
      // reference's process_function (query.rs:252-255), not at parse time
      case Some(Ident(name)) if st.toks.drop(1).headOption.exists(t =>
        t == Sym("(") || t == Ident("by") || t == Ident("without")) => parseFunc(st, name)
      case Some(Ident(_)) | Some(Sym("{")) => parseSelector(st)
      case Some(other) => throw ParseException(s"unexpected token $other")
      case None => throw ParseException("unexpected end of query")
    }
    parseAtSuffix(st, parseSubquerySuffix(st, atom))
  }

  /** Postfix `@ <unix-ts> | @ start() | @ end()`; may interleave with
    * subquery suffixes (`(m @ 1000)[1h:5m]` etc.). */
  private def parseAtSuffix(st: State, atom: Node): Node = st.peek match {
    case Some(Sym("@")) =>
      st.next()
      val spec = st.next() match {
        case Num(s) => AtTs(s.toDouble)
        case Sym("-") => st.next() match {
          case Num(s) => AtTs(-s.toDouble)
          case other => throw ParseException(s"bad @ timestamp: -$other")
        }
        case Ident("start") => st.expect("("); st.expect(")"); AtStart
        case Ident("end") => st.expect("("); st.expect(")"); AtEnd
        case other => throw ParseException(s"bad @ timestamp: $other")
      }
      parseAtSuffix(st, parseSubquerySuffix(st, AtMod(atom, spec)))
    case _ => atom
  }

  /** `:` folds into identifier tokens (metric names may carry colons), so a
    * subquery range `[1h:5m]` arrives as Num(1) + Ident("h:5m"); detect the
    * colon by scanning the bracket's token span. */
  private def bracketContainsColon(toks: List[Tok]): Boolean =
    toks.takeWhile(_ != Sym("]")).exists {
      case Ident(s) => s.contains(':')
      case Sym(":") => true
      case _ => false
    }

  private def parseSubquerySuffix(st: State, atom: Node): Node = st.peek match {
    case Some(Sym("[")) if bracketContainsColon(st.toks.drop(1)) =>
      st.next()
      val sb = new StringBuilder
      var done = false
      while (!done) st.peek match {
        case Some(Sym("]")) => st.next(); done = true
        case Some(Num(s)) => st.next(); sb.append(s)
        case Some(Ident(s)) => st.next(); sb.append(s)
        case Some(Sym(s)) => st.next(); sb.append(s)
        case Some(Str(s)) => throw ParseException(s"unexpected string '$s' in subquery range")
        case None => throw ParseException("unterminated subquery range")
      }
      val parts = sb.toString.split(":", -1)
      if (parts.length != 2 || parts(0).isEmpty)
        throw ParseException(s"bad subquery range '[$sb]'")
      def dur(s: String): Double = TimeParse.parseDuration(s)
        .fold(e => throw ParseException(s"bad duration '$s': $e"), identity)
      val range = dur(parts(0))
      val step = if (parts(1).isEmpty) None else Some(dur(parts(1)))
      var offset: Option[Double] = None
      if (st.peek.contains(Ident("offset"))) {
        st.next()
        offset = Some(parseDurationTok(st))
      }
      // nested subqueries are valid Prometheus (`x[5m:1m][1h:5m]`) — keep
      // consuming suffixes
      parseSubquerySuffix(st, Subquery(atom, range, step, offset))
    case _ => atom
  }

  private def parseFunc(st: State, name: String): Node = {
    st.next() // function name
    var by: Option[AggMod] = None
    def aggMod(): Unit = st.peek match {
      case Some(Ident("by")) => st.next(); by = Some(ByMod(parseNameList(st)))
      case Some(Ident("without")) => st.next(); by = Some(WithoutMod(parseNameList(st)))
      case _ => ()
    }
    aggMod() // `sum by (a,b) (expr)` prefix form
    st.expect("(")
    val args = scala.collection.mutable.ListBuffer[Node]()
    if (!st.peek.contains(Sym(")"))) { // zero-arg functions: pi()
      args += parseExpr(st)
      while (st.peek.contains(Sym(","))) { st.next(); args += parseExpr(st) }
    }
    st.expect(")")
    if (by.isEmpty) aggMod() // `sum(expr) by (a,b)` suffix form
    FuncCall(name, args.toSeq, by)
  }

  private def parseNameList(st: State): Seq[String] = {
    st.expect("(")
    val names = scala.collection.mutable.ListBuffer[String]()
    var done = st.peek.contains(Sym(")"))
    while (!done) {
      st.next() match {
        case Ident(s) => names += s
        case other => throw ParseException(s"expected label name, got $other")
      }
      if (st.peek.contains(Sym(","))) st.next() else done = true
    }
    st.expect(")")
    names.toSeq
  }

  private def parseSelector(st: State): Node = {
    val matchers = scala.collection.mutable.ListBuffer[Matcher]()
    st.peek match {
      case Some(Ident(name)) => st.next(); matchers += Selector.Eq(Model.NameLabel, name)
      case _ => ()
    }
    if (st.peek.contains(Sym("{"))) {
      st.next()
      var done = st.peek.contains(Sym("}"))
      while (!done) {
        val label = st.next() match {
          case Ident(s) => s
          case other => throw ParseException(s"expected label, got $other")
        }
        val op = st.next() match {
          case Sym(s @ ("=" | "!=" | "=~" | "!~")) => s
          case other => throw ParseException(s"expected matcher op, got $other")
        }
        val value = st.next() match {
          case Str(s) => s
          case other => throw ParseException(s"expected string, got $other")
        }
        matchers += (op match {
          case "=" => Selector.Eq(label, value)
          case "!=" => Selector.Ne(label, value)
          case "=~" => Selector.Re(label, value)
          case "!~" => Selector.Nre(label, value)
        })
        if (st.peek.contains(Sym(","))) st.next() else done = true
      }
      st.expect("}")
    }
    if (matchers.isEmpty) throw ParseException("empty selector")

    var range: Option[Double] = None
    // a bracket containing ':' is a subquery suffix — leave it for
    // parseSubquerySuffix (the selector is then the subquery's inner)
    if (st.peek.contains(Sym("[")) && !bracketContainsColon(st.toks.drop(1))) {
      st.next()
      range = Some(parseDurationTok(st))
      st.expect("]")
    }
    var offset: Option[Double] = None
    if (st.peek.contains(Ident("offset"))) {
      st.next()
      offset = Some(parseDurationTok(st))
    }
    VectorSel(matchers.toSeq, range, offset)
  }

  /** Durations lex as Num("5")+Ident("m") or a single Num. */
  private def parseDurationTok(st: State): Double = {
    val sb = new StringBuilder
    var done = false
    while (!done) st.peek match {
      case Some(Num(s)) => st.next(); sb.append(s)
      case Some(Ident(s)) if s.forall(ch => "msmhdwy".contains(ch)) => st.next(); sb.append(s)
      case _ => done = true
    }
    TimeParse.parseDuration(sb.toString)
      .fold(e => throw ParseException(s"bad duration '$sb': $e"), identity)
  }
}
