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

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared L2 norm of a quantized vector. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Cosine similarity from quantized ints + precomputed squared norms:
    * deterministic double given equal integer inputs.
    */
  def qcosine(dot: Column, na2: Column, nb2: Column): Column =
    dot.cast("double") / (sqrt(na2.cast("double")) * sqrt(nb2.cast("double")))
}
