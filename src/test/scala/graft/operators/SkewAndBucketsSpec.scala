package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SkewAndBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of fact rows hit one key — the classic hot-key shape
    val fact = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)).as("k"),
        col("id").as("v"))
    val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))

    val plain = fact.join(dim, Seq("k")).agg(sum(col("v") + col("w"))).head().getLong(0)
    val salted = SaltedJoin.inner(fact, dim, "k", saltFactor = 8)
      .agg(sum(col("v") + col("w"))).head().getLong(0)
    assert(salted === plain)
  }

  test("bucketed join plans without a shuffle exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); tables are dropped in the finally block
    val o = Tables.load(spark, sf(), "orders")
    val c = Tables.load(spark, sf(), "customer")
    Bucketing.writeBucketed(o.withColumnRenamed("o_custkey", "k"), "orders_b", "k", 4)
    Bucketing.writeBucketed(c.withColumnRenamed("c_custkey", "k"), "customer_b", "k", 4)

    val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "k")
    // force a sort-merge plan (no broadcast) to expose the exchange-free path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b").join(spark.table("customer_b"), Seq("k"))
      j.collect() // execute so AQE finalizes
      val plan = j.queryExecution.executedPlan
      val finalPlan = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = finalPlan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, finalPlan.toString)
      assert(joined.count() === o.count()) // every order has its customer
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
