package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys — the manual salting pattern for
  * when AQE's runtime skew-join split (enabled by default in this engine's
  * sessions) isn't available, e.g. under static planning or for
  * deterministic layout control.
  *
  * The big side gets a deterministic salt derived from a high-cardinality
  * disambiguator column (`pmod(xxhash64(disambiguator), n)`); the small
  * side is exploded n-fold so every salted key finds its match. One shuffle
  * on (key, salt) with hot keys spread over n reducers instead of one. */
object SkewOps {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 disambiguator: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(disambiguator)), lit(salts.toLong)))
    val saltedSmall = small
      .withColumn("__salt", explode(
        sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
