package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, full-DL distance) — ca/abc is THE full-vs-OSA
  // discriminator (OSA says 3: a transposed pair can't take part in
  // later edits; full DL transposes then inserts = 2, which is what
  // the oracle's damerau_levenshtein returns — probed before this
  // model was chosen)
  private val cases = Seq(
    ("", "", 0), ("", "abc", 3), ("abc", "", 3),
    ("abc", "abc", 0),
    ("ab", "ba", 1), ("abc", "acb", 1), ("spark", "sprak", 1),
    ("ca", "abc", 2),
    ("abcd", "badc", 2),
    ("row", "rwo", 1), ("sort", "sotr", 1),
    ("kitten", "sitting", 3), ("flaw", "lawn", 2),
    ("a", "b", 1), ("aa", "aa", 0),
    ("transpositions", "tranpsositions", 1),
    ("été", "éte", 1),            // non-ASCII spillover path
    ("你好", "好你", 1))

  test("known distances, interpreted path") {
    cases.foreach { case (a, b, d) =>
      assert(DamerauLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b)) === d,
        s"dl($a, $b)")
      assert(DamerauLevenshtein.distance(
        UTF8String.fromString(b), UTF8String.fromString(a)) === d,
        s"dl($b, $a) (symmetry)")
    }
  }

  test("codegen path agrees with the interpreted twin") {
    val df = cases.map { case (a, b, d) => (a, b, d) }.toDF("a", "b", "d")
    val rows = df.select(
      DamerauLevenshtein(col("a"), col("b")).as("got"), col("d")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("never exceeds levenshtein, and only undercuts via a swap") {
    val df = cases.toDF("a", "b", "d")
    val rows = df.select(
      DamerauLevenshtein(col("a"), col("b")).as("dl"),
      levenshtein(col("a"), col("b")).as("lev")).collect()
    rows.foreach(r => assert(r.getInt(0) <= r.getInt(1)))
  }

  test("null propagates") {
    val r = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(DamerauLevenshtein(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(100)
      .select(DamerauLevenshtein(
        concat(lit("tok"), col("id").cast("string")), lit("tko1")).as("d"))
    val codegenned = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegenned, df.queryExecution.executedPlan.toString)
    assert(df.filter(col("d") <= 1).count() === 1L) // tok1 -> tko1, one swap
  }
}
