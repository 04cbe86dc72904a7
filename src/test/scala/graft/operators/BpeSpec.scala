package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r14 BPE merge loop: determinism under tied pair counts
  * (lexicographic pair wins), leftmost-greedy non-overlapping
  * application, and the k bound.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(toks: String*) =
    toks.toDF("tok").select(split(col("tok"), "").as("syms"))

  test("ties break lexicographically by (a, b) — pinned determinism") {
    // (a,b) and (c,d) both occur twice; (a,b) must win step 1
    val got = Bpe.merges(corpus("ab", "cd", "ab", "cd"), 2)
      .select(col("step"), col("merged"), col("n"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "ab", 2L), (2, "cd", 2L)))
  }

  test("leftmost-greedy non-overlapping application") {
    // "aaa": (a,a) counts 2 (overlapping occurrences count), the merge
    // yields [aa, a] — so step 2's best pair is (aa, a)
    val got = Bpe.merges(corpus("aaa", "aaa"), 2)
      .select(col("step"), col("a"), col("b"), col("n"))
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("merged symbols participate in later iterations") {
    val got = Bpe.merges(corpus("abc", "abc", "abd"), 3)
      .select(col("step"), col("merged"), col("n"))
      .as[(Int, String, Long)].collect().toSeq
    // step 1: (a,b) x3 beats (b,c) x2; step 2: (ab,c) x2; step 3: (ab,d) x1
    assert(got === Seq((1, "ab", 3L), (2, "abc", 2L), (3, "abd", 1L)))
  }

  test("exhaustion stops early; k is bounded") {
    // one two-symbol token: step 1 merges it, step 2 finds no pairs
    val got = Bpe.merges(corpus("xy"), 5)
      .select(col("step")).as[Int].collect().toSeq
    assert(got === Seq(1))
    val e = intercept[IllegalArgumentException](Bpe.merges(corpus("xy"), 65))
    assert(e.getMessage.contains("1..64"))
  }

  test("encode replays the training symbolization token-for-token") {
    val toks = corpus("abcabc", "abcd", "aabb", "xyz", "abab")
    val table = Bpe.merges(toks, 4)
    // the trainer's own final state: apply each learned merge in order
    // through the fold the trainer ran
    val steps = table.select("a", "b").orderBy("step")
      .as[(String, String)].collect().toSeq
    val trained = steps.foldLeft(toks)((d, m) =>
      d.select(Bpe.applyMerge(col("syms"), m._1, m._2).as("syms")))
      .as[Seq[String]].collect().toSeq
    val encoded = Bpe.encode(toks, table)
      .select("syms").as[Seq[String]].collect().toSeq
    assert(encoded === trained)
    // non-syms columns pass through untouched
    val withId = toks.withColumn("id", monotonically_increasing_id())
    assert(Bpe.encode(withId, table).columns.toSeq === Seq("syms", "id"))
  }

  test("encode applies merges in step order, leftmost-greedy") {
    // hand-built table: (a,a)→aa then (aa,a)→aaa. "aaaaa" → pass 1:
    // [aa, aa, a]; pass 2: (aa,aa) no, (aa,a) at the tail → [aa, aaa]
    val table = Seq((1, "a", "a", "aa", 0L), (2, "aa", "a", "aaa", 0L))
      .toDF("step", "a", "b", "merged", "n")
    val got = Bpe.encode(corpus("aaaaa"), table)
      .select("syms").as[Seq[String]].collect().head
    assert(got === Seq("aa", "aaa"))
    // an empty table is the identity
    val empty = Seq.empty[(Int, String, String, String, Long)]
      .toDF("step", "a", "b", "merged", "n")
    assert(Bpe.encode(corpus("abc"), empty)
      .select("syms").as[Seq[String]].collect().head === Seq("a", "b", "c"))
    // a gapped table fails loud (the step order IS the contract)
    val gapped = Seq((1, "a", "a", "aa", 0L), (3, "aa", "a", "aaa", 0L))
      .toDF("step", "a", "b", "merged", "n")
    val e = intercept[IllegalArgumentException](
      Bpe.encode(corpus("aaa"), gapped).collect())
    assert(e.getMessage.contains("contiguous"), e.getMessage)
  }

  test("checkpointed training leaves no cache or snapshot debris behind") {
    import scala.jdk.CollectionConverters._
    // the default root is a UUID subdir of the warehouse dir (the
    // cluster-shared location) — after training the subdir must be gone
    val wh = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/_graft_bpe_ckpt")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ckptDirs: Set[String] =
      if (!fs.exists(wh)) Set.empty
      else fs.listStatus(wh).map(_.getPath.getName).toSet
    val before = (spark.sparkContext.getPersistentRDDs.size, ckptDirs)
    Bpe.merges(corpus("abcabc", "abcd", "aabb", "abab"), 4).collect()
    assert(spark.sparkContext.getPersistentRDDs.size === before._1,
      "training must not leave cached blocks")
    assert(ckptDirs === before._2,
      "every iteration snapshot (and the root) must be deleted")
  }

  test("caller-supplied checkpoint dir: used, cleaned, scheme-safe") {
    // explicit dir — same merge table as the default root, and the dir
    // is removed afterwards (the trainer owns it for the run)
    val plain = java.nio.file.Files.createTempDirectory("bpe_explicit")
      .resolve("run1").toString
    val got = Bpe.merges(corpus("abc", "abc", "abd"), 3, Some(plain))
      .select(col("step"), col("merged")).as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "ab"), (2, "abc"), (3, "abd")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(plain)),
      "the run dir must be deleted after training")

    // scheme-style path (file:/…) resolves through the Hadoop FS API —
    // the shape an hdfs:// / s3a:// deployment passes (the r5 lesson:
    // java.nio sees scheme paths as always-absent)
    val schemed = "file:" + java.nio.file.Files
      .createTempDirectory("bpe_scheme").resolve("run2").toString
    val got2 = Bpe.merges(corpus("abc", "abc", "abd"), 3, Some(schemed))
      .select(col("step"), col("merged")).as[(Int, String)].collect().toSeq
    assert(got2 === got)
    val sp = new org.apache.hadoop.fs.Path(schemed)
    assert(!sp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(sp))

    // a non-empty dir fails loud — the trainer would delete caller data
    val dirty = java.nio.file.Files.createTempDirectory("bpe_dirty")
    java.nio.file.Files.writeString(dirty.resolve("keep.txt"), "caller data")
    val e = intercept[IllegalArgumentException](
      Bpe.merges(corpus("ab"), 1, Some(dirty.toString)))
    assert(e.getMessage.contains("non-empty"), e.getMessage)
    assert(java.nio.file.Files.exists(dirty.resolve("keep.txt")),
      "the fail-loud path must not touch caller data")
  }
}
