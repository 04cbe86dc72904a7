package graft.plans

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("hamming_distance is callable from SQL text via the extension") {
    // 5 ^ 6 = 3 → two set bits
    val r = spark.sql("SELECT hamming_distance(5L, 6L) AS d").head().getInt(0)
    assert(r === 2)
  }

  test("hamming_distance rejects non-BIGINT arguments") {
    val e = intercept[Exception] {
      spark.sql("SELECT hamming_distance('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("hamming"))
  }
}
