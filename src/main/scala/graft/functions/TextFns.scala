package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, shingling, MinHash signatures, SimHash fingerprints,
  * rolling-hash document fingerprints. All are `Column` compositions of
  * codegen'd built-ins (no UDFs), so they distribute trivially: every
  * function here is per-row (map-side only, zero shuffle) — the shuffles
  * happen only in the pair-generation joins built on top (see
  * `graft.queries.Dedup`).
  *
  * Hashes used by oracle-checked queries are md5-derived (portable to
  * any engine with `md5`); hashes used only engine-side (MinHash
  * permutations, LSH band ids) use `xxhash64` for speed.
  */
object TextFns {

  /** Whitespace tokens (single-space corpus; `split` is codegen'd). */
  def tokens(text: Column): Column = split(text, " ")

  /** Adjacent pairs of an array column as `array<struct<w1,w2>>` — the
    * corpus-bigram shape shared by the phrase suggester and
    * match_phrase_prefix. Callers must filter `size(arr) >= 2` first
    * (a shorter array would drive `sequence` backwards).
    */
  def adjacentPairs(arr: Column): Column =
    transform(sequence(lit(0), size(arr) - 2),
      i => struct(arr(i).as("w1"), arr(i + 1).as("w2")))

  /** BPE-ish tokenizer: alphanumeric runs plus single non-space
    * punctuation marks — the usual pre-tokenization shape of GPT-style
    * BPE. RE2-compatible (no lookarounds) so the DuckDB oracle can run
    * the identical pattern.
    */
  val BpeTokenPattern = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  /** Distinct word n-gram shingles; docs shorter than n collapse to one
    * whole-text shingle. n fixed at 3 to keep oracle SQL expressible.
    */
  def shingles3(tok: Column): Column =
    when(size(tok) >= 3,
      array_distinct(transform(sequence(lit(1), size(tok) - 2), i =>
        concat_ws(" ", element_at(tok, i), element_at(tok, i + 1), element_at(tok, i + 2)))))
      .otherwise(array(concat_ws(" ", tok)))

  /** 60-bit md5-derived hash, portable: DuckDB computes the identical
    * value as `('0x' || substr(md5(s),1,15))::BIGINT`.
    */
  def md5hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  private val MersennePrime = (1L << 31) - 1 // 2^31-1, for affine MinHash perms

  /** k-permutation MinHash signature of a shingle array. Base hash is
    * xxhash64 (engine-side only); permutation i is the affine map
    * (a_i·x + b_i) mod p over Z_p, p = 2^31-1. Returns array[k] of long.
    */
  def minhashSignature(sh: Column, k: Int): Column = {
    val base = transform(sh, s => pmod(xxhash64(s), lit(MersennePrime)))
    val perms = (0 until k).map { i =>
      val a = 2 * i + 1           // odd => invertible mod 2^31-1
      val b = (i.toLong * 2654435761L) % MersennePrime
      array_min(transform(base, x => pmod(x * lit(a.toLong) + lit(b), lit(MersennePrime))))
    }
    array(perms: _*)
  }

  /** LSH band keys for a MinHash signature: `bands` entries, each
    * hashing `rows` consecutive signature slots. Two docs with Jaccard
    * j collide in ≥1 band with prob 1-(1-j^rows)^bands.
    *
    * NOTE: prefer [[minhashBands]] when building from shingles —
    * `element_at(sig, i)` over an inline signature array defeats
    * common-subexpression reuse and re-evaluates the whole signature
    * per band (measured ~50× slowdown at sf0.1).
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { bnd =>
      struct(
        lit(bnd).as("band"),
        xxhash64((0 until rows).map(r => element_at(sig, bnd * rows + r + 1)): _*).as("bucket"))
    }: _*)

  /** Fused shingles → LSH band keys: every MinHash permutation column
    * is referenced exactly once, so the expression tree stays linear in
    * bands×rows regardless of how Catalyst inlines projections.
    */
  def minhashBands(sh: Column, bands: Int, rows: Int): Column = {
    val base = transform(sh, s => pmod(xxhash64(s), lit(MersennePrime)))
    val perms = (0 until bands * rows).map { i =>
      val a = 2 * i + 1
      val b = (i.toLong * 2654435761L) % MersennePrime
      array_min(transform(base, x => pmod(x * lit(a.toLong) + lit(b), lit(MersennePrime))))
    }
    array((0 until bands).map { bnd =>
      struct(
        lit(bnd).as("band"),
        xxhash64((0 until rows).map(r => perms(bnd * rows + r)): _*).as("bucket"))
    }: _*)
  }

  /** 60-bit SimHash over md5-derived token hashes, weighted by term
    * frequency (a token occurring t times contributes ±t per bit).
    * Portable: the oracle recomputes it with the same md5-derived bits.
    */
  def simhash60(tok: Column): Column = {
    val hashes = transform(tok, t => md5hash60(t))
    // bit b of the fingerprint = sign of sum over tokens of ±1 at bit b.
    // Unrolled over the 60 bit positions (shift counts must be literals
    // inside higher-order-function lambdas).
    (0 until 60).map { b =>
      val bitSum = aggregate(hashes, lit(0L),
        (s, h) => s + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(bitSum >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints — a native
    * codegen'd expression (one POPCNT intrinsic per pair; see
    * graft.plans.HammingDistance).
    */
  def hamming(a: Column, b: Column): Column = graft.plans.HammingDistance(a, b)

  /** SimHash block keys for banded near-dup search: 4 blocks of 15
    * bits; hamming ≤ 3 ⇒ at least one block identical (pigeonhole), so
    * an equi-join on (block_id, block_value) finds all candidates
    * without a cross join.
    */
  def simhashBlocks(fp: Column): Column =
    array((0 until 4).map { blk =>
      struct(lit(blk).as("blk"),
        shiftright(fp, blk * 15).bitwiseAND(lit((1L << 15) - 1)).as("v"))
    }: _*)

  /** Polynomial rolling-hash fingerprint of a string (base 31 over
    * code points, mod 2^31-1) — cheap per-row document identity for
    * incremental pipelines. Modulus keeps `acc*31 + c` < 2^41, safe
    * under ANSI overflow checking. Engine-side only (spec-checked).
    */
  def rollingHash(s: Column): Column = {
    val p = (1L << 31) - 1
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(p)))
  }

  /** Canonical text normalization for exact-dup fingerprinting:
    * lowercase, trim, collapse whitespace runs.
    */
  def normalizeText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")
}
