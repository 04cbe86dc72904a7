package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFns
import graft.sources.Tables

/** CosineSim: the codegen'd quantized-cosine expression must be
  * bit-identical to the declarative `VectorFns.quantize`+`qdot`
  * composition (the oracle-checked contract every similarity query is
  * built on), reachable from SQL text, and inside whole-stage codegen.
  */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to quantize+qdot on real embeddings, all within-label pairs") {
    val e = Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("embedding").as("eb"))
    val pairs = a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))

    val qa = VectorFns.quantize(col("ea")); val qb = VectorFns.quantize(col("eb"))
    val declarative = VectorFns.qdot(qa, qb).cast("double") /
      (sqrt(VectorFns.qdot(qa, qa).cast("double")) *
        sqrt(VectorFns.qdot(qb, qb).cast("double")))

    val mismatches = pairs
      .select(CosineSim(col("ea"), col("eb")).as("native"), declarative.as("ref"))
      .filter(col("native") =!= col("ref")) // bitwise: any ulp difference survives
      .count()
    assert(mismatches === 0L)
  }

  test("registered as a SQL function by GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s").head().getDouble(0)
    assert(r === 1.0)
  }

  test("zero-norm vector yields NULL, not NaN") {
    val df = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
      .select(CosineSim(col("a"), col("b")).as("s"))
    assert(df.head().isNullAt(0))
  }

  test("a NULL array element yields NULL (quantize+qdot null propagation)") {
    // spark.range source so both codegen and interpreted paths compile
    // against a real plan (a local relation would be constant-folded)
    val df = spark.range(2)
      .select(array(lit(1f), when(col("id") === 0, lit(2f)).otherwise(lit(null))).as("a"),
        array(lit(3f), lit(4f)).as("b"))
      .select(CosineSim(col("a"), col("b")).as("s"))
      .collect()
    assert(!df(0).isNullAt(0) && df(1).isNullAt(0))
  }

  test("dimension mismatch fails loudly") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(CosineSim(col("a"), col("b")).as("s"))
    val e = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).map(t => Option(t.getMessage).getOrElse("")).mkString
        .contains("dimension mismatch"))
  }

  test("stays inside whole-stage codegen") {
    // spark.range source: a literal local relation would be folded away
    // by ConvertToLocalRelation before any codegen happens
    val df = spark.range(4)
      .select(array(col("id").cast("float"), lit(2f)).as("a"),
        array(lit(3f), col("id").cast("float")).as("b"))
      .select(CosineSim(col("a"), col("b")).as("s"))
    df.collect()
    val codegenned = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegenned, df.queryExecution.executedPlan.toString)
  }

  test("accepts double arrays and mixed float/double inputs") {
    val df = Seq((Array(1.0, 2.0), Array(1f, 2f))).toDF("a", "b")
      .select(CosineSim(col("a"), col("b")).as("s"))
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
  }
}
