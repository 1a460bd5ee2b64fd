package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * higher-order functions so everything stays inside whole-stage codegen.
  *
  * Determinism contract (shared with the DuckDB oracle): multiply in
  * float (IEEE-identical on both engines), cast each product to double,
  * then left-fold from 0.0 — a fixed accumulation order, so results are
  * bit-identical across engines and across partitionings.
  *
  * Scale note: these are per-row expressions (no shuffle). Pairwise uses
  * (knn, ann) bound one side to a constant/broadcast set; the all-pairs
  * path at 100 TB is LSH/IVF bucketing (see Similarity), never a raw
  * cross join.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as double, fixed left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² as double. */
  def norm2(a: Column): Column =
    aggregate(transform(a, x => (x * x).cast("double")), lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2norm(a: Column): Column = sqrt(norm2(a))

  /** Σ aᵢ⁴ as double (the kurtosis moment behind the participation
    * ratio (Σa²)²/Σa⁴ — see q_sim_19_eff_dim). Squares in float, casts
    * to double, squares again — mirrored exactly by Duck.pow4. */
  def pow4(a: Column): Column =
    aggregate(transform(a, x => {
      val s = (x * x).cast("double"); s * s
    }), lit(0.0), (acc, x) => acc + x)

  /** cos(a, b) = a·b / (‖a‖·‖b‖) */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared euclidean distance Σ (aᵢ-bᵢ)². */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val diff = (x - y).cast("double"); diff * diff
    }), lit(0.0), (acc, x) => acc + x)

  /** DuckDB mirrors of the above, for oracle construction. */
  object Duck {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), p -> CAST(struct_extract(p, 1) * struct_extract(p, 2) AS DOUBLE))), (acc, x) -> acc + x)"
    def norm2(a: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, x -> CAST(x * x AS DOUBLE))), (acc, x) -> acc + x)"
    def pow4(a: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, x -> CAST(x * x AS DOUBLE) * CAST(x * x AS DOUBLE))), (acc, x) -> acc + x)"
    def l2norm(a: String): String = s"sqrt(${norm2(a)})"
    def cosine(a: String, b: String): String =
      s"(${dot(a, b)} / (${l2norm(a)} * ${l2norm(b)}))"
    def sqDist(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), p -> CAST(struct_extract(p, 1) - struct_extract(p, 2) AS DOUBLE) * CAST(struct_extract(p, 1) - struct_extract(p, 2) AS DOUBLE))), (acc, x) -> acc + x)"
  }
}
