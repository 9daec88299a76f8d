package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the SCALING.md "salting for skew" knob).
  *
  * A hot join/group key overwhelms one reducer at scale. Salting splits
  * each key into `salts` sub-keys:
  *   - aggregation: two-phase — partial aggregate on (key, salt), then
  *     final aggregate on key. The hot key's partials land on `salts`
  *     different reducers; the final pass merges `salts` tiny rows.
  *   - join: the big side gets a deterministic per-row salt; the SMALL side
  *     is replicated `salts`× with every salt value; join on (key, salt).
  *     Row multiplicity is preserved exactly (each big row matches its
  *     salt's replica only).
  *
  * Salts are derived from row content (`xxhash64` of all columns, mod
  * `salts`) — deterministic for the oracle/tests, uniform in practice.
  * These helpers change the PLAN shape only; results are proven equal to
  * the unsalted forms in `SaltingSpec`.
  */
object Salting {

  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))

  /** Two-phase salted count+sum per key (extend with more partials as
    * needed — any algebraic aggregate decomposes the same way). */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))

  /** Salted equi-join: `big ⋈ small` on `bigKey = smallKey`, with the small
    * side replicated across `salts` sub-keys. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated,
        saltedBig(bigKey) === replicated(smallKey) && saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
