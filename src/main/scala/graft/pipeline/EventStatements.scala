package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's full statement-processing DAG (SURVEY §2.2) instantiated
  * over the synthetic `events` table, which stands in for the MongoDB
  * statement stream (see FIXTURES.md §6): `event_id`→`_id`, `ts`→`timestamp`,
  * `props`→statement payload, `user_id`→actor identity.
  *
  * Dataflow (all narrow transforms — zero shuffles until the opt-out
  * dimension's own tiny argmax; the fact stream itself never shuffles):
  *
  *   extract(O4) → validate/drop-malformed(O5) → normalize actor(O6)
  *   → salted sha256(O7) → rebuild statement json(O8/O9) → escape(O10)
  *   → opt-out broadcast flag(O11, set built by O12) → split(O13)
  *
  * Actor names are synthesized deterministically from `user_id` so that all
  * three normalization branches of O6 (email, `mailto:` URI, bare name — see
  * `/root/reference/src/main.rs:627-634` and FIXTURES.md §1) are exercised.
  */
object EventStatements {
  /** Fixture salt/tenant (reference reads them from config, `src/main.rs:178`). */
  val Salt = "graft-salt"
  val Tenant = "tenant_a"

  import StatementTransforms._

  /** Deterministic synthetic actor name covering all O6 branches. */
  def syntheticActorName(userId: Column): Column = {
    val u = userId.cast("string")
    when(userId % 3 === 0, concat(lit("user"), u, lit("@example.org")))
      .when(userId % 3 === 1, concat(lit("mailto:user"), u))
      .otherwise(concat(lit("user"), u))
  }

  /** O4+O5: project the probed fields and drop malformed records (reference
    * warns + skips on missing `_id`/`statement`/`timestamp`,
    * `src/main.rs:445-453`; here: null probes + unparseable props JSON).
    *
    * ORDER-PRESERVING by contract (ADVICE r17): the o-parity queries sort
    * the RAW events before this chain and rely on every op in
    * [[extracted]]/[[anonymized]] staying NARROW (projections/filters
    * only, id == event_id verbatim) — a future shuffle-introducing change
    * here (distinct, join, repartition) would silently break their output
    * ordering with only the oracle harness to catch it. */
  def extracted(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id").as("id"),
        col("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("id").isNotNull && col("ts").isNotNull && col("user_id").isNotNull && col("k").isNotNull)

  /** O6+O7: normalized actor name and its salted tenant-scoped hash.
    * `salt`/`tenant` default to the fixture constants for the oracle
    * queries; production passes `cfg.encryptionSalt` and the tenant name. */
  def anonymized(events: DataFrame, salt: String = Salt, tenant: String = Tenant): DataFrame = {
    val withActor = extracted(events).withColumn("actor_name", syntheticActorName(col("user_id")))
    withActor
      .filter(isValidActorName(col("actor_name")))
      .withColumn("normalized_name", normalizeActorName(col("actor_name")))
      .withColumn("hashed_id", anonymizeActor(col("actor_name"), salt, tenant))
  }

  /** O8+O9: rebuild the statement JSON with the hash swapped into
    * `actor.account.name` (reference mutates the BSON doc in place at
    * `src/main.rs:643` then serializes once at `:382-388`). Deterministic
    * field-by-field construction so the bytes are reproducible. */
  def withStatementJson(df: DataFrame): DataFrame =
    df.withColumn(
      "statement",
      concat(
        lit("{\"actor\":{\"account\":{\"name\":\""), col("hashed_id"),
        lit("\"}},\"verb\":\""), col("event_type"),
        lit("\",\"k\":"), col("k").cast("string"),
        lit("}")))

  /** O8 in its native mechanism: build the statement as a real NESTED
    * STRUCT with the raw actor name, then overwrite the nested path with
    * the hash via `withField` — the Column-API equivalent of the
    * reference's in-place BSON mutation (`account.insert("name", hash)`,
    * src/main.rs:643) — and serialize once with `to_json` (O9). The
    * concat-based [[withStatementJson]] twin exists for byte-deterministic
    * construction; this one exercises the struct path end-to-end. */
  def withStatementStruct(df: DataFrame): DataFrame = {
    val rawStatement = struct(
      struct(struct(col("actor_name").as("name")).as("account")).as("actor"),
      col("event_type").as("verb"),
      col("k").as("k"))
    df.withColumn("statement_struct",
        rawStatement.withField("actor.account.name", col("hashed_id")))
      .withColumn("statement", to_json(col("statement_struct")))
  }

  /** Full anonymization chain O4–O9 over raw events. */
  def statements(events: DataFrame): DataFrame = withStatementJson(anonymized(events))

  /** Config-driven variant for production tenants. */
  def statements(events: DataFrame, salt: String, tenant: String): DataFrame =
    withStatementJson(anonymized(events, salt, tenant))

  /** O12 over events: the opt-out dimension is derived from `signup` events —
    * (key=user_id, version=event_id, payload=k); a user is opted out iff
    * their LATEST signup has k % 3 == 0. Exercises the argmax exactly like
    * the reference's `moodle_ids` latest-version query (`src/main.rs:774`). */
  def optOutDim(events: DataFrame): DataFrame = {
    val signups = anonymized(events).filter(col("event_type") === "signup")
      .select(col("user_id"), col("hashed_id"), col("id").as("version"), col("k"))
    OptOutRouting.latestPerKey(signups, "user_id", "version", "hashed_id", "k")
  }

  def optOutHashes(events: DataFrame): DataFrame =
    optOutDim(events).filter(col("k") % 3 === 0).select(col("hashed_id"))

  /** O4–O13: the complete routed pipeline. */
  def routed(events: DataFrame): DataFrame =
    OptOutRouting.withOptOutFlag(statements(events), "hashed_id", optOutHashes(events), "hashed_id")
      .withColumn("route", when(col("is_opt_out"), lit("opt_out")).otherwise(lit("main")))

  /** Convenience: run the routed DAG directly off a scale-factor dir. */
  def routed(spark: SparkSession, dir: String): DataFrame =
    routed(Tables(spark, dir).events)
}
