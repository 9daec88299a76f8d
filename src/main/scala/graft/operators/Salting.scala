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

  // salts <= 0 must fail LOUDLY: pmod(x, 0) is NULL under non-ANSI
  // semantics, so a salted join under salts = 0 would silently return
  // ZERO rows (NULL never equals any replica salt) instead of erroring
  private def rowSalt(df: DataFrame, salts: Int): Column = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))
  }

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

  /** The join-side engagement rule (VERDICT r10 #8), mirroring
    * [[AdaptiveWindows.wouldChunk]]: salt exactly when the big side's
    * hottest join key exceeds `factor` × a core's even share of rows. The
    * probe is ONE map-side-combinable aggregation (`groupBy(key).count` →
    * global max/sum) — a narrow all-longs pass, the cheapest question you
    * can ask of a key distribution at 100 TB; a production pipeline would
    * cache it per (table, key) epoch. */
  def wouldSalt(big: DataFrame, bigKey: String, factor: Double = 5.0): Boolean = {
    // ONE probe implementation (AdaptiveWindows.hotKeyStats) — the two
    // hand-rolled copies had already diverged on the empty-input guard
    val (hot, total) = AdaptiveWindows.hotKeyStats(big, bigKey)
    if (total == 0L) false // empty input: nothing to salt
    else {
      val par = big.sparkSession.sparkContext.defaultParallelism.toDouble
      hot > factor * total / par
    }
  }

  /** Auto-engaged skew join: probe once, dispatch [[saltedJoin]] vs the
    * vanilla equi-join per [[wouldSalt]] — the measured-crossover pattern
    * [[AdaptiveWindows]] established for windows, applied to joins. Both
    * branches emit identical rows (SkewSpec parity on balanced AND skewed
    * corpora); only the plan differs: vanilla is one exchange per side
    * (and AQE may still split moderately skewed blocks), salted spreads
    * the hot key across `salts` reducers at the cost of replicating the
    * small side `salts`×. */
  def adaptiveJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                   salts: Int = 8, factor: Double = 5.0): DataFrame =
    if (wouldSalt(big, bigKey, factor)) saltedJoin(big, small, bigKey, smallKey, salts)
    else big.join(small, big(bigKey) === small(smallKey))
}
