package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-deterministic rounding.
  *
  * Spark's `round()` rounds the SHORTEST DECIMAL REPRESENTATION of a
  * double (BigDecimal.valueOf → HALF_UP) while DuckDB rounds the binary
  * value — for results landing exactly on an `…xx5` boundary the two
  * disagree by one ulp of the target scale (observed empirically:
  * 19570.815 → 19570.82 vs 19570.81).
  *
  * `floor(x·10ⁿ + 0.5) / 10ⁿ` uses only IEEE ops that both engines
  * evaluate bit-identically on the same input, so the oracle can mirror
  * it verbatim (`floor((x) * 100 + 0.5) / 100`). Imported AFTER
  * `functions._` it shadows Spark's `round` in the operator modules.
  */
object Num {
  def round(c: Column, scale: Int): Column = {
    val m = math.pow(10, scale)
    floor(c * m + 0.5) / lit(m)
  }
}
