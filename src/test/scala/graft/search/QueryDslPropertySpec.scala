package graft.search

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Small fixed corpus row with every field class the DSL touches
  * (top-level so the Dataset encoder codegen can reach it).
  */
final case class Doc(
    doc_id: Long, lang: String, source: String, n_chars: Long, text: String,
    ctext: String)

/** Property coverage for the query-DSL compiler: a randomly generated
  * query AST, rendered to request JSON and compiled onto Catalyst, must
  * agree row-for-row (predicate AND score) with a direct row-wise
  * evaluation of the documented semantics over the collected table.
  * Random nesting exercises shapes the example specs can't: empty bool
  * sections, must_not around scoring clauses, should inside must,
  * minimum_should_match at several levels.
  */
object QueryDslPropertySpec extends Properties("querydsl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private lazy val spark = graft.SparkSpec.session

  private lazy val corpus: Seq[Doc] = {
    val langs = Seq("en", "fr", "de", "es")
    val vocab = Seq("spark", "join", "window", "data", "the", "model", "scan")
    (0L until 240L).map { i =>
      val words = (0 to (i % 7).toInt).map(j => vocab(((i * 31 + j * 17) % vocab.size).toInt))
      // ctext: the SAME token stream wearing case + punctuation — the
      // standard analyzer must see through it (normText(ctext) is
      // exactly the clean text), so analyzed leaves get a live model
      val cased = words.zipWithIndex.map { case (w, j) =>
        if (j % 2 == 0) w.toUpperCase + "!" else w.capitalize + ","
      }
      Doc(i, langs((i % 4).toInt), s"src${i % 5}", (i * 37) % 500,
        words.mkString(" "), cased.mkString(" "))
    }
  }

  private lazy val table = {
    import spark.implicits._
    corpus.toDF()
  }

  // ----------------------------------------------------------- AST + gen

  private sealed trait Q
  private case class Term(f: String, v: Either[String, Long]) extends Q
  private case class Terms(f: String, vs: Seq[Either[String, Long]]) extends Q
  private case class Range(f: String, gte: Option[Long], lt: Option[Long]) extends Q
  private case class Prefix(f: String, v: String) extends Q
  private case class Wildcard(f: String, v: String) extends Q
  private case class Exists(f: String) extends Q
  private case class Match(terms: Seq[String], msm: Long) extends Q
  private case object MatchNone extends Q
  private case class BoostedMatch(terms: Seq[String], msm: Long,
      boost: Long) extends Q
  private case class BoostedPrefix(f: String, v: String, boost: Long) extends Q
  private case class BoostedRange(lo: Long, w: Long, boost: Long) extends Q
  // percentage minimum_should_match: resolves to max(1, floor(n·pct/100))
  private case class PctMatch(terms: Seq[String], pct: Int) extends Q
  private case class Phrase(p: String) extends Q
  // analyzed variants over the cased/punctuated ctext column: the
  // rendered query text is MANGLED the same way the column is, so
  // matching only works if both twins normalize correctly
  private case class AMatch(terms: Seq[String], msm: Long) extends Q
  private case class APhrase(terms: Seq[String]) extends Q
  private case class Bool(must: Seq[Q], filter: Seq[Q], mustNot: Seq[Q],
      should: Seq[Q], msm: Option[Long]) extends Q
  private case class ConstScore(filt: Q, boost: Long) extends Q
  private case class TermsSet(terms: Seq[String], msm: Long) extends Q
  private case class DisMax(queries: Seq[Q], tieBreaker: Double) extends Q
  private case class Boosting(pos: Q, neg: Q, negBoost: Double) extends Q
  private case class Ids(vals: Seq[Long]) extends Q
  private case class MultiMatch(terms: Seq[String], most: Boolean,
      tb: Double, msm: Long) extends Q
  private case class FnScore(inner: Q, fns: Seq[(Q, Long)],
      scoreSum: Boolean, boostMult: Boolean) extends Q
  private case class DistFeat(origin: Long, pivot: Long) extends Q
  private case class RankFeat(pivot: Long) extends Q
  private case class CombinedFields(ts: Seq[String], msm: Long) extends Q
  private case class SpanFirst(t: String, end: Int) extends Q
  private case class ScriptScore(inner: Q, w: Long, cap: Long) extends Q
  private case class Wrapped(inner: Q) extends Q

  private val vocab = Seq("spark", "join", "window", "data", "model", "absent")

  private def leafGen: Gen[Q] = Gen.oneOf(
    for { f <- Gen.oneOf("lang", "source"); v <- Gen.oneOf("en", "fr", "src1", "src3", "nope") }
      yield Term(f, Left(v)),
    Gen.oneOf(0L, 37L, 74L, 999L).map(v => Term("n_chars", Right(v))),
    for { n <- Gen.chooseNum(1, 3); vs <- Gen.listOfN(n, Gen.oneOf("en", "de", "es", "xx")) }
      yield Terms("lang", vs.map(Left(_))),
    for { lo <- Gen.chooseNum(0L, 400L); w <- Gen.chooseNum(1L, 300L) }
      yield Range("n_chars", Some(lo), Some(lo + w)),
    Gen.chooseNum(0L, 400L).map(lo => Range("n_chars", Some(lo), None)),
    Gen.oneOf("sp", "da", "zz").map(p => Prefix("text", p)),
    Gen.oneOf("src*", "*1", "s?c1", "none*").map(w => Wildcard("source", w)),
    Gen.const(Exists("lang")),
    for { n <- Gen.chooseNum(1, 3); ts <- Gen.listOfN(n, Gen.oneOf(vocab)); m <- Gen.chooseNum(1L, 2L) }
      yield Match(ts.distinct, m),
    Gen.const(MatchNone),
    for { n <- Gen.chooseNum(1, 3); ts <- Gen.listOfN(n, Gen.oneOf(vocab));
          m <- Gen.chooseNum(1L, 2L); b <- Gen.chooseNum(2L, 5L) }
      yield BoostedMatch(ts.distinct, m, b),
    for { p <- Gen.oneOf("sp", "da", "zz"); b <- Gen.chooseNum(2L, 6L) }
      yield BoostedPrefix("text", p, b),
    for { lo <- Gen.chooseNum(0L, 400L); w <- Gen.chooseNum(1L, 300L);
          b <- Gen.chooseNum(2L, 6L) }
      yield BoostedRange(lo, w, b),
    for { n <- Gen.chooseNum(1, 4); ts <- Gen.listOfN(n, Gen.oneOf(vocab));
          p <- Gen.oneOf(25, 50, 75, 100) }
      yield PctMatch(ts.distinct, p),
    Gen.oneOf("spark join", "data model", "never here").map(Phrase),
    for { n <- Gen.chooseNum(2, 4); ts <- Gen.listOfN(n, Gen.oneOf(vocab)); m <- Gen.chooseNum(1L, 3L) }
      yield TermsSet(ts.distinct, m),
    for { n <- Gen.chooseNum(1, 4); vs <- Gen.listOfN(n, Gen.chooseNum(0L, 260L)) }
      yield Ids(vs.distinct),
    // terms drawn from BOTH fields' value spaces so each multi_match
    // field can independently match or miss (most_fields is
    // unit-scale; the ppm-scaled best_fields variant generates at the
    // top level only, per the compiler's scale-mixing rules)
    for {
      n <- Gen.chooseNum(1, 3)
      ts <- Gen.listOfN(n, Gen.oneOf(vocab ++ Seq("src1", "src3")))
      m <- Gen.chooseNum(1L, 2L)
    } yield MultiMatch(ts.distinct, most = true, 0.0, m),
    // term-centric multi-field: a term counts once if in ANY field
    for {
      n <- Gen.chooseNum(1, 3)
      ts <- Gen.listOfN(n, Gen.oneOf(vocab ++ Seq("src1", "src3")))
      m <- Gen.chooseNum(1L, 2L)
    } yield CombinedFields(ts.distinct, math.min(m, ts.distinct.size.toLong)),
    for { t <- Gen.oneOf(vocab); e <- Gen.chooseNum(1, 5) }
      yield SpanFirst(t, e),
    for { n <- Gen.chooseNum(1, 3); ts <- Gen.listOfN(n, Gen.oneOf(vocab));
          m <- Gen.chooseNum(1L, 2L) }
      yield AMatch(ts.distinct, m),
    for { n <- Gen.chooseNum(2, 3); ts <- Gen.listOfN(n, Gen.oneOf(vocab)) }
      yield APhrase(ts))

  /** Unit-scale query trees — freely composable anywhere. */
  private def qGen(depth: Int): Gen[Q] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for {
        nm <- Gen.chooseNum(0, 2); nf <- Gen.chooseNum(0, 1)
        nn <- Gen.chooseNum(0, 1); ns <- Gen.chooseNum(0, 2)
        must <- Gen.listOfN(nm, qGen(depth - 1))
        filt <- Gen.listOfN(nf, qGen(depth - 1))
        not <- Gen.listOfN(nn, qGen(depth - 1))
        should <- Gen.listOfN(ns, qGen(depth - 1))
        msm <- Gen.option(Gen.chooseNum(0L, 2L))
      } yield Bool(must, filt, not, should, msm)),
      1 -> (for {
        f <- qGen(depth - 1); b <- Gen.chooseNum(1L, 5L)
      } yield ConstScore(f, b)),
      1 -> (for {
        inner <- qGen(depth - 1)
        nf <- Gen.chooseNum(1, 2)
        fs <- Gen.listOfN(nf, qGen(depth - 1))
        ws <- Gen.listOfN(nf, Gen.chooseNum(1L, 5L))
        sm <- Gen.oneOf(true, false)
        bm <- Gen.oneOf(true, false)
      } yield FnScore(inner, fs.zip(ws), sm, bm)),
      1 -> (for {
        inner <- qGen(depth - 1)
        w <- Gen.chooseNum(1L, 5L); cap <- Gen.chooseNum(50L, 400L)
      } yield ScriptScore(inner, w, cap)),
      1 -> qGen(depth - 1).map(Wrapped))

  /** ppm-scaled producers — per the compiler's scale-mixing rules they
    * sit ABOVE unit subtrees (never inside another scoring position),
    * mirroring how real requests compose them.
    */
  private def ppmGen(depth: Int): Gen[Q] = Gen.frequency(
    2 -> (for {
      n <- Gen.chooseNum(1, 3)
      qs <- Gen.listOfN(n, qGen(depth - 1))
      tb <- Gen.oneOf(0.0, 0.25, 0.3, 0.5, 1.0)
    } yield DisMax(qs, tb)),
    2 -> (for {
      pos <- qGen(depth - 1); neg <- qGen(depth - 1)
      nb <- Gen.oneOf(0.0, 0.25, 0.5, 0.75)
    } yield Boosting(pos, neg, nb)),
    1 -> (for {
      n <- Gen.chooseNum(1, 3)
      ts <- Gen.listOfN(n, Gen.oneOf(vocab ++ Seq("src1", "src3")))
      tb <- Gen.oneOf(0.0, 0.25, 0.5)
      m <- Gen.chooseNum(1L, 2L)
    } yield MultiMatch(ts.distinct, most = false, tb, m)),
    1 -> (for { o <- Gen.chooseNum(0L, 500L); p <- Gen.chooseNum(1L, 200L) }
      yield DistFeat(o, p)),
    1 -> Gen.chooseNum(1L, 400L).map(RankFeat),
    // a ppm clause alone in a bool scoring slot stays one scale
    1 -> (for {
      p <- Gen.oneOf(
        Gen.chooseNum(1L, 400L).map(RankFeat): Gen[Q],
        Gen.chooseNum(1L, 200L).map(DistFeat(250L, _)): Gen[Q])
      f <- qGen(depth - 1)
    } yield Bool(Seq(p), Seq(f), Nil, Nil, None)))

  private def topGen(depth: Int): Gen[Q] =
    Gen.frequency(3 -> qGen(depth), 2 -> ppmGen(depth))

  // ------------------------------------------------------- JSON renderer

  private def js(s: String): String = "\"" + s + "\"" // vocab is JSON-safe

  private def lit(v: Either[String, Long]): String =
    v.fold(js, _.toString)

  private def render(q: Q): String = q match {
    case Term(f, v)   => s"""{"term": {${js(f)}: ${lit(v)}}}"""
    case Terms(f, vs) => s"""{"terms": {${js(f)}: [${vs.map(lit).mkString(",")}]}}"""
    case Range(f, gte, lt) =>
      val bounds = gte.map(g => s""""gte": $g""").toSeq ++ lt.map(l => s""""lt": $l""")
      s"""{"range": {${js(f)}: {${bounds.mkString(",")}}}}"""
    case Prefix(f, v)   => s"""{"prefix": {${js(f)}: ${js(v)}}}"""
    case Wildcard(f, v) => s"""{"wildcard": {${js(f)}: ${js(v)}}}"""
    case Exists(f)      => s"""{"exists": {"field": ${js(f)}}}"""
    case Match(ts, m) =>
      s"""{"match": {"text": {"query": ${js(ts.mkString(" "))}, "minimum_should_match": $m}}}"""
    case MatchNone => """{"match_none": {}}"""
    case BoostedMatch(ts, m, b) =>
      s"""{"match": {"text": {"query": ${js(ts.mkString(" "))}, "minimum_should_match": $m, "boost": $b}}}"""
    case BoostedPrefix(f, v, b) =>
      s"""{"prefix": {${js(f)}: {"value": ${js(v)}, "boost": $b}}}"""
    case BoostedRange(lo, w, b) =>
      s"""{"range": {"n_chars": {"gte": $lo, "lt": ${lo + w}, "boost": $b}}}"""
    case PctMatch(ts, p) =>
      s"""{"match": {"text": {"query": ${js(ts.mkString(" "))}, "minimum_should_match": "$p%"}}}"""
    case Phrase(p) => s"""{"match_phrase": {"text": ${js(p)}}}"""
    case AMatch(ts, m) =>
      val mangled = ts.map(t => t.toUpperCase + ",").mkString(" ")
      s"""{"match": {"ctext": {"query": ${js(mangled)},
         "analyzer": "standard", "minimum_should_match": $m}}}"""
        .replace("\n", " ")
    case APhrase(ts) =>
      val mangled = ts.map(_.capitalize + "!").mkString(" ")
      s"""{"match_phrase": {"ctext": {"query": ${js(mangled)},
         "analyzer": "standard"}}}""".replace("\n", " ")
    case Bool(must, filt, not, should, msm) =>
      val parts =
        (if (must.nonEmpty) Seq(s""""must": [${must.map(render).mkString(",")}]""") else Nil) ++
        (if (filt.nonEmpty) Seq(s""""filter": [${filt.map(render).mkString(",")}]""") else Nil) ++
        (if (not.nonEmpty) Seq(s""""must_not": [${not.map(render).mkString(",")}]""") else Nil) ++
        (if (should.nonEmpty) Seq(s""""should": [${should.map(render).mkString(",")}]""") else Nil) ++
        msm.map(m => s""""minimum_should_match": $m""").toSeq
      s"""{"bool": {${parts.mkString(",")}}}"""
    case ConstScore(f, b) =>
      s"""{"constant_score": {"filter": ${render(f)}, "boost": $b}}"""
    case TermsSet(ts, m) =>
      s"""{"terms_set": {"text": {"terms": [${ts.map(js).mkString(",")}],
         "minimum_should_match": $m}}}""".replace("\n", " ")
    case DisMax(qs, tb) =>
      s"""{"dis_max": {"queries": [${qs.map(render).mkString(",")}], "tie_breaker": $tb}}"""
    case Boosting(pos, neg, nb) =>
      s"""{"boosting": {"positive": ${render(pos)}, "negative": ${render(neg)},
         "negative_boost": $nb}}""".replace("\n", " ")
    case Ids(vals) =>
      s"""{"ids": {"values": [${vals.mkString(",")}], "field": "doc_id"}}"""
    case MultiMatch(ts, most, tb, m) =>
      val typ = if (most) "most_fields" else "best_fields"
      val tbPart = if (most) "" else s""", "tie_breaker": $tb"""
      s"""{"multi_match": {"query": ${js(ts.mkString(" "))},
         "fields": ["text", "source"], "type": ${js(typ)}$tbPart,
         "minimum_should_match": $m}}""".replace("\n", " ")
    case FnScore(inner, fns, sm, bm) =>
      val fjson = fns.map { case (f, w) =>
        s"""{"filter": ${render(f)}, "weight": $w}"""
      }.mkString(",")
      s"""{"function_score": {"query": ${render(inner)},
         "functions": [$fjson],
         "score_mode": ${js(if (sm) "sum" else "max")},
         "boost_mode": ${js(if (bm) "multiply" else "sum")}}}""".replace("\n", " ")
    case DistFeat(o, p) =>
      s"""{"distance_feature": {"field": "n_chars", "origin": $o, "pivot": $p}}"""
    case RankFeat(p) =>
      s"""{"rank_feature": {"field": "n_chars", "saturation": {"pivot": $p}}}"""
    case CombinedFields(ts, m) =>
      s"""{"combined_fields": {"query": ${js(ts.mkString(" "))},
         "fields": ["text", "source"], "minimum_should_match": $m}}"""
        .replace("\n", " ")
    case SpanFirst(t, e) =>
      s"""{"span_first": {"match": {"span_term": {"text": ${js(t)}}}, "end": $e}}"""
    case ScriptScore(inner, w, cap) =>
      s"""{"script_score": {"query": ${render(inner)}, "script": {"source":
         "params.w * _score + min(doc['n_chars'].value, params.cap)",
         "params": {"w": $w, "cap": $cap}}}}""".replace("\n", " ")
    case Wrapped(inner) =>
      val b64 = java.util.Base64.getEncoder
        .encodeToString(render(inner).getBytes("UTF-8"))
      s"""{"wrapper": {"query": "$b64"}}"""
  }

  // ------------------------------------------- row-wise reference model

  private def globMatches(pat: String, s: String): Boolean = {
    val rx = pat.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c   => java.util.regex.Pattern.quote(c.toString)
    }
    s.matches(rx)
  }

  /** (matches, score) under the documented deterministic model. */
  private def eval(q: Q, d: Doc): (Boolean, Long) = q match {
    case Term(f, v)   => (fieldEq(f, v, d), 1L)
    case Terms(f, vs) => (vs.exists(fieldEq(f, _, d)), 1L)
    case Range(f, gte, lt) =>
      val x = longField(f, d)
      (gte.forall(x >= _) && lt.forall(x < _), 1L)
    case Prefix(_, v)   => (d.text.startsWith(v), 1L)
    case Wildcard(_, v) => (globMatches(v, d.source), 1L)
    case Exists(_)      => (true, 1L) // corpus has no nulls
    case Match(ts, msm) =>
      val toks = d.text.split(" ", -1).distinct.toSet
      val score = ts.distinct.count(toks.contains).toLong
      (score >= msm, score)
    case MatchNone => (false, 0L)
    case BoostedPrefix(_, v, b) => (d.text.startsWith(v), b)
    case BoostedRange(lo, w, b) =>
      val x = longField("n_chars", d)
      (x >= lo && x < lo + w, b)
    case PctMatch(ts, pct) =>
      val toks = d.text.split(" ", -1).distinct.toSet
      val score = ts.distinct.count(toks.contains).toLong
      val msm = math.max(1L, ts.distinct.size.toLong * pct / 100L)
      (score >= msm, score)
    case BoostedMatch(ts, msm, b) =>
      val toks = d.text.split(" ", -1).distinct.toSet
      val score = ts.distinct.count(toks.contains).toLong
      // the predicate gates on the UNboosted overlap; the score scales
      (score >= msm, score * b)
    case Phrase(p) => ((" " + d.text + " ").contains(s" $p "), 1L)
    case AMatch(ts, msm) =>
      val toks = Analyzer.Standard.normText(d.ctext).split(" ", -1).distinct.toSet
      val score = ts.distinct.count(toks.contains).toLong
      (score >= msm, score)
    case APhrase(ts) =>
      val nb = Analyzer.Standard.normText(d.ctext)
      ((" " + nb + " ").contains(" " + ts.mkString(" ") + " "), 1L)
    case Bool(must, filt, not, should, msmOpt) =>
      val m = must.map(eval(_, d))
      val f = filt.map(eval(_, d))
      val n = not.map(eval(_, d))
      val s = should.map(eval(_, d))
      val msmDefault = if (should.nonEmpty && must.isEmpty && filt.isEmpty) 1L else 0L
      val msm = msmOpt.getOrElse(msmDefault)
      val shouldMatched = s.count(_._1).toLong
      val pred = m.forall(_._1) && f.forall(_._1) && n.forall(!_._1) &&
        (msm <= 0L || shouldMatched >= msm)
      val score = m.map(_._2).sum + s.filter(_._1).map(_._2).sum
      (pred, score)
    case ConstScore(f, b) => (eval(f, d)._1, b)
    case TermsSet(ts, msm) =>
      val toks = d.text.split(" ", -1).distinct.toSet
      val score = ts.distinct.count(toks.contains).toLong
      (score >= msm, score)
    case DisMax(qs, tb) =>
      val subs = qs.map(eval(_, d))
      val matched = subs.map { case (ok, sc) => if (ok) sc else 0L }
      val best = matched.max
      val total = matched.sum
      val tbPpm = math.round(tb * 1000000L)
      (subs.exists(_._1), best * 1000000L + (total - best) * tbPpm)
    case Boosting(pos, neg, nb) =>
      val (pOk, pSc) = eval(pos, d)
      val nbPpm = math.round(nb * 1000000L)
      (pOk, pSc * (if (eval(neg, d)._1) nbPpm else 1000000L))
    case Ids(vals) => (vals.contains(d.doc_id), 1L)
    case MultiMatch(ts, most, tb, msm) =>
      def overlap(field: String): Long = {
        val toks = field.split(" ", -1).distinct.toSet
        ts.distinct.count(toks.contains).toLong
      }
      val per = Seq(overlap(d.text), overlap(d.source))
      val matched = per.map(s => if (s >= msm) s else 0L)
      val pred = per.exists(_ >= msm)
      if (most) (pred, matched.sum)
      else {
        val best = matched.max
        val tbPpm = math.round(tb * 1000000L)
        (pred, best * 1000000L + (matched.sum - best) * tbPpm)
      }
    case FnScore(inner, fns, scoreSum, boostMult) =>
      val (ok, q) = eval(inner, d)
      val matched = fns.map { case (f, w) => if (eval(f, d)._1) w else 0L }
      val fscore = if (scoreSum) matched.sum else matched.max
      val any = fns.exists { case (f, _) => eval(f, d)._1 }
      val score =
        if (boostMult) q * (if (any) fscore else 1L)
        else q + fscore
      (ok, score)
    case DistFeat(o, p) =>
      (true, p * 1000000L / (p + math.abs(d.n_chars - o)))
    case RankFeat(p) =>
      (d.n_chars >= 0L, d.n_chars * 1000000L / (d.n_chars + p))
    case CombinedFields(ts, msm) =>
      val textToks = d.text.split(" ", -1).distinct.toSet
      val srcToks = d.source.split(" ", -1).distinct.toSet
      val score = ts.distinct
        .count(t => textToks.contains(t) || srcToks.contains(t)).toLong
      (score >= msm, score)
    case SpanFirst(t, e) =>
      (d.text.split(" ", -1).take(e).contains(t), 1L)
    case ScriptScore(inner, w, cap) =>
      val (ok, sc) = eval(inner, d)
      (ok, w * sc + math.min(d.n_chars, cap))
    case Wrapped(inner) => eval(inner, d)
  }

  private def fieldEq(f: String, v: Either[String, Long], d: Doc): Boolean =
    (f, v) match {
      case ("lang", Left(s))     => d.lang == s
      case ("source", Left(s))   => d.source == s
      case ("n_chars", Right(x)) => d.n_chars == x
      case _                     => sys.error(s"bad field/value $f $v")
    }

  private def longField(f: String, d: Doc): Long = f match {
    case "n_chars" => d.n_chars
    case "doc_id"  => d.doc_id
    case other     => sys.error(s"bad long field $other")
  }

  // ----------------------------------------- query_string grammar model

  /** query_string expression AST: rendered to the Lucene grammar (with
    * explicit grouping, so every random tree also exercises parens)
    * and evaluated row-wise by the documented combination model —
    * leaf scores its boost, AND sums both sides, OR sums the matched
    * sides, NOT is filter-context (predicate only, score 0).
    */
  private sealed trait QsKind
  private case object QsTerm extends QsKind
  private case object QsPhrase extends QsKind
  private case object QsPrefix extends QsKind
  private case class QsFuzzy(d: Int) extends QsKind

  private sealed trait Qs
  private case class QsLeaf(field: Option[String], text: String,
      kind: QsKind, boost: Long) extends Qs
  private case class QsAnd(a: Qs, b: Qs) extends Qs
  private case class QsOr(a: Qs, b: Qs) extends Qs
  private case class QsNot(x: Qs) extends Qs

  private def qsLeafGen: Gen[Qs] = Gen.oneOf(
    for { t <- Gen.oneOf(vocab); b <- Gen.chooseNum(1L, 3L) }
      yield QsLeaf(Some("text"), t, QsTerm, b),
    for { t <- Gen.oneOf(vocab) } yield QsLeaf(None, t, QsTerm, 1L),
    for { s <- Gen.oneOf("src1", "src3", "nope") }
      yield QsLeaf(Some("source"), s, QsTerm, 1L),
    for { p <- Gen.oneOf("spark join", "data model", "never here");
          b <- Gen.chooseNum(1L, 3L) }
      yield QsLeaf(Some("text"), p, QsPhrase, b),
    for { st <- Gen.oneOf("sp", "jo", "mod", "zz"); b <- Gen.chooseNum(1L, 2L) }
      yield QsLeaf(Some("text"), st, QsPrefix, b),
    for { t <- Gen.oneOf("sprk", "joni", "windw", "qqq");
          d <- Gen.chooseNum(1, 2) }
      yield QsLeaf(Some("text"), t, QsFuzzy(d), 1L))

  private def qsGen(depth: Int): Gen[Qs] =
    if (depth <= 0) qsLeafGen
    else Gen.frequency(
      3 -> qsLeafGen,
      2 -> (for { a <- qsGen(depth - 1); b <- qsGen(depth - 1) } yield QsAnd(a, b)),
      2 -> (for { a <- qsGen(depth - 1); b <- qsGen(depth - 1) } yield QsOr(a, b)),
      1 -> qsGen(depth - 1).map(QsNot))

  private def renderQs(q: Qs): String = q match {
    case QsLeaf(f, t, kind, b) =>
      val fp = f.map(_ + ":").getOrElse("")
      val v = kind match {
        case QsPhrase   => "\"" + t + "\""
        case QsPrefix   => s"$t*"
        case QsFuzzy(d) => s"$t~$d"
        case QsTerm     => t
      }
      val bp = if (b > 1L) s"^$b" else ""
      s"$fp$v$bp"
    case QsAnd(a, b) => s"(${renderQs(a)} AND ${renderQs(b)})"
    case QsOr(a, b)  => s"(${renderQs(a)} OR ${renderQs(b)})"
    case QsNot(x)    => s"(NOT ${renderQs(x)})"
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  /** (matches, score-expression value) — scores are UNGATED below an
    * OR (the compiler gates OR branches with when(pred); AND sums raw
    * sub-scores, whose predicates the overall match implies).
    */
  private def evalQs(q: Qs, d: Doc): (Boolean, Long) = q match {
    case QsLeaf(f, t, kind, b) =>
      def toks(field: String) = field.split(" ", -1)
      val fv = f.getOrElse("text") match {
        case "text"   => d.text
        case "source" => d.source
        case other    => sys.error(s"bad qs field $other")
      }
      val pred = kind match {
        case QsPhrase   => (" " + fv + " ").contains(s" $t ")
        case QsTerm     => toks(fv).contains(t)
        case QsPrefix   => toks(fv).exists(_.startsWith(t))
        case QsFuzzy(dd) => toks(fv).distinct.exists(x => lev(x, t) <= dd)
      }
      (pred, b)
    case QsAnd(a, b) =>
      val (pa, sa) = evalQs(a, d); val (pb, sb) = evalQs(b, d)
      (pa && pb, sa + sb)
    case QsOr(a, b) =>
      val (pa, sa) = evalQs(a, d); val (pb, sb) = evalQs(b, d)
      (pa || pb, (if (pa) sa else 0L) + (if (pb) sb else 0L))
    case QsNot(x) => (!evalQs(x, d)._1, 0L)
  }

  private def jsEsc(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ------------------------------------------------------------ property

  property("query_string grammar: compiled == row-wise reference") =
    forAll(qsGen(3)) { q =>
      val json =
        s"""{"query": {"query_string": {"query": ${jsEsc(renderQs(q))},
            "default_field": "text"}},
            "sort": ["doc_id"], "_source": ["doc_id", "score"]}"""
          .replace("\n", " ")
      val got = QueryDsl.search(table, json)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val expected = corpus.flatMap { d =>
        val (ok, sc) = evalQs(q, d)
        if (ok) Some(d.doc_id -> sc) else None
      }
      val pass = got == expected
      if (!pass) {
        println(s"query_string mismatch for: ${renderQs(q)}")
        println(s"got=${got.take(10)} expected=${expected.take(10)}")
      }
      pass
    }

  property("compiled (pred, score) == row-wise reference on every doc") =
    forAll(topGen(2)) { q =>
      val json = s"""{"query": ${render(q)}, "sort": ["doc_id"], "_source": ["doc_id", "score"]}"""
      val got = QueryDsl.search(table, json)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val expected = corpus.flatMap { d =>
        val (ok, sc) = eval(q, d)
        if (ok) Some(d.doc_id -> sc) else None
      }
      val pass = got == expected
      if (!pass) {
        println(s"DSL mismatch for: $json")
        println(s"got=${got.take(10)} expected=${expected.take(10)}")
      }
      pass
    }
}
