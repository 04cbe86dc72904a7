package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built
  * entirely from codegen'd higher-order functions (`transform` /
  * `zip_with` / `aggregate`) — no UDFs, so embedding pipelines stay
  * inside whole-stage codegen and scale linearly with partition count.
  *
  * Determinism contract (for the DuckDB-oracle correctness gate):
  * floats are quantized to 1e-7-resolution BIGINTs first
  * (float→double is exact; `*1e7` is a single IEEE op; round
  * half-away-from-zero matches DuckDB). Dot products and norms are
  * then *exact* integer arithmetic — for 64-dim unit-scale vectors the
  * products stay < 2^47 and sums < 2^53, so they are also exact when an
  * engine carries them in doubles — and the final cosine is a single
  * IEEE divide + sqrt, bit-identical in any engine doing the same
  * integer math.
  */
object VectorFns {

  /** float[] → bigint[] at 1e-7 resolution (exact, engine-portable). */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * lit(1e7)).cast("long"))

  /** Exact integer dot product of two quantized vectors (generic,
    * any length). NOTE: higher-order functions are interpreted, not
    * codegen'd — on pair-quadratic paths use [[qdotN]].
    */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Dot product unrolled over a statically-known dimension count:
    * plain `element_at` arithmetic inside whole-stage codegen. MEASURED
    * SLOWER than [[qdot]] at 64 dims on the all-pairs paths (sf0.1
    * q74: 19.4s vs 13.0s — the 128-access expression appears to blow
    * JIT method limits and is re-evaluated per filter+project
    * reference), so the hot paths use [[qdot]]; keep this for narrow
    * vectors (≤16 dims) where the flat form wins.
    */
  def qdotN(a: Column, b: Column, dims: Int): Column =
    (1 to dims).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)

  /** Exact integer squared L2 norm of a quantized vector. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Unrolled squared norm (see [[qdotN]]). */
  def qnorm2N(a: Column, dims: Int): Column = qdotN(a, a, dims)

  /** Cosine similarity from quantized ints + precomputed squared norms:
    * deterministic double given equal integer inputs.
    */
  def qcosine(dot: Column, na2: Column, nb2: Column): Column =
    dot.cast("double") / (sqrt(na2.cast("double")) * sqrt(nb2.cast("double")))

  /** Quantized cosine of two *raw* embedding arrays as one codegen'd
    * loop ([[graft.plans.CosineSim]]) — bit-identical to
    * `qcosine(qdot(quantize(a),quantize(b)), …)` but ~100× cheaper per
    * pair (the interpreted-HOF tax, measured in round 1). Use on
    * declarative per-row scoring paths; pair-quadratic paths should
    * still go through the partition kernels.
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSim(a, b)
}
