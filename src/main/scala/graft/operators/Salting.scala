package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins — the manual complement to AQE's
  * runtime skew splitting (`spark.sql.adaptive.skewJoin`, on by default in
  * `Graft.session`).
  *
  * When one join key carries a disproportionate share of rows (the
  * power-law reality of user/document keys at 100 TB), a plain shuffle
  * join lands the whole hot key in one task. Salting splits it: the
  * skewed side scatters each key over `salts` sub-keys by a deterministic
  * hash of a unique column; the dimension side replicates `salts`×. The
  * join result is exactly the plain join's (verified in SaltingSpec), but
  * the hot key now spreads across `salts` tasks.
  *
  * Prefer AQE for ad-hoc queries (no replication cost when there is no
  * skew); reach for explicit salting when the skew is known and extreme,
  * or the engine must not rely on runtime re-planning (streaming joins). */
object Salting {

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      uniqueCol: String, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val s = skewed.withColumn("_salt",
      pmod(hash(col(uniqueCol)), lit(salts)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
