package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `script_score` mini-language, compiled STRAIGHT TO CATALYST.
  *
  * OpenSearch's `script_score` runs a Painless script per document
  * (/root/reference/lib/opensearch-dynamodb-etl-cdk-stack.ts:91's
  * SEARCH collection serves it); a per-row interpreter would be the
  * classic UDF anti-pattern at 100 TB. Here the script is parsed ONCE
  * on the driver and compiled to the same codegen'd `Column`
  * arithmetic every other clause uses — zero row-time interpretation,
  * whole-stage codegen intact.
  *
  * Grammar (fail-loud on anything else):
  * {{{
  *   expr  := term (('+' | '-') term)*
  *   term  := unary ('*' unary)*
  *   unary := '-' unary | atom
  *   atom  := INTEGER
  *          | params.<name>          // request-time constant
  *          | doc['<field>'].value   // an integral column
  *          | _score                 // the wrapped query's score
  *          | min(expr, expr) | max(expr, expr) | abs(expr)
  *          | '(' expr ')'
  * }}}
  *
  * The language is exact-LONG by design (the engine's integer score
  * model): no division, no floats — a normalizing divide would
  * reintroduce cross-engine float ambiguity; decay shapes belong to
  * `rank_feature`/`distance_feature`, which already emit exact ppm.
  * Referenced doc fields must be integral columns (the same contract
  * as rank_feature) — the oracle gate catches a non-integral field.
  */
private[search] object ScoreScript {

  private sealed trait Tok
  private case class Num(v: Long) extends Tok
  private case class Param(name: String) extends Tok
  private case class DocField(field: String) extends Tok
  private case object ScoreTok extends Tok
  private case class Fn(name: String) extends Tok
  private case class Sym(c: Char) extends Tok

  private val NumRe = """(\d+)""".r
  private val ParamRe = """params\.([A-Za-z_][A-Za-z0-9_]*)""".r
  private val DocRe = """doc\['([A-Za-z_][A-Za-z0-9_]*)'\]\.value""".r
  private val FnRe = """(min|max|abs)(?=\()""".r
  private val ScoreRe = """_score""".r

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"query-dsl: script_score: $msg")

  private def tokenize(src: String): List[Tok] = {
    var i = 0
    val out = List.newBuilder[Tok]
    while (i < src.length) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("+-*(),".indexOf(c) >= 0) { out += Sym(c); i += 1 }
      else {
        val rest = src.substring(i)
        def at(re: scala.util.matching.Regex): Option[String] =
          re.findPrefixOf(rest)
        at(DocRe).map { s =>
          out += DocField(DocRe.findFirstMatchIn(s).get.group(1)); s.length
        }.orElse(at(ParamRe).map { s =>
          out += Param(ParamRe.findFirstMatchIn(s).get.group(1)); s.length
        }).orElse(at(ScoreRe).map { s => out += ScoreTok; s.length
        }).orElse(at(FnRe).map { s => out += Fn(s); s.length
        }).orElse(at(NumRe).map { s => out += Num(s.toLong); s.length
        }) match {
          case Some(len) => i += len
          case None => fail(s"unrecognized token at '${rest.take(20)}'")
        }
      }
    }
    out.result()
  }

  /** Whether the script references the `_score` TOKEN (not the raw
    * substring — "params.base_score" contains the substring but never
    * the token). Unparseable scripts report false here; the compile
    * step owns the grammar error.
    */
  def referencesScore(src: String): Boolean =
    try tokenize(src).contains(ScoreTok)
    catch { case _: IllegalArgumentException => false }

  /** Parse + compile. `params` are the request's integer constants;
    * `score` is the wrapped query's score column (`_score`).
    */
  def compile(src: String, params: Map[String, Long],
      score: Column): Column = {
    var toks = tokenize(src)
    if (toks.isEmpty) fail("empty script")

    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil    => fail("unexpected end of script")
    }
    def expect(c: Char): Unit = next() match {
      case Sym(`c`) => ()
      case other    => fail(s"expected '$c', got $other")
    }

    def expr(): Column = {
      var acc = term()
      var go = true
      while (go) peek match {
        case Some(Sym('+')) => next(); acc = acc + term()
        case Some(Sym('-')) => next(); acc = acc - term()
        case _              => go = false
      }
      acc
    }
    def term(): Column = {
      var acc = unary()
      var go = true
      while (go) peek match {
        case Some(Sym('*')) => next(); acc = acc * unary()
        case _              => go = false
      }
      acc
    }
    def unary(): Column = peek match {
      case Some(Sym('-')) => next(); -unary()
      case _              => atom()
    }
    def atom(): Column = next() match {
      case Num(v)   => lit(v)
      case ScoreTok => score
      case Param(p) => lit(params.getOrElse(p,
        fail(s"script references undeclared param '$p'")))
      case DocField(f) => col(f)
      case Fn("abs") =>
        expect('('); val a = expr(); expect(')'); abs(a)
      case Fn(fn) => // min | max
        expect('('); val a = expr(); expect(','); val b = expr(); expect(')')
        if (fn == "min") least(a, b) else greatest(a, b)
      case Sym('(') => val a = expr(); expect(')'); a
      case other    => fail(s"unexpected $other")
    }

    val c = expr()
    if (toks.nonEmpty) fail(s"trailing tokens: $toks")
    c
  }
}
