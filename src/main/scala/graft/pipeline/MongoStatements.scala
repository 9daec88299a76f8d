package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The production transform chain over REAL Mongo-shaped documents
  * (FIXTURES.md §1): `_id` / `timestamp` / nested `statement` with the
  * required path `statement.actor.account.name` — as opposed to
  * [[EventStatements]], which adapts the synthetic `events` table for the
  * oracle gate. Same operators (O4–O9), applied to the native schema:
  *
  *   - O4/O5: probe `_id`, `timestamp`, `statement.actor.account.name`;
  *     drop + count malformed (`/root/reference/src/main.rs:445-453`)
  *   - O6/O7: normalize + salted tenant-scoped sha256
  *   - O8: overwrite the nested path in place via `withField`
  *     (`account.insert("name", hash)`, src/main.rs:643)
  *   - O9: serialize the mutated statement once with `to_json`
  *
  * Output columns match what [[graft.streaming.StreamingPipeline]] and the
  * sinks expect: `(id, ts, hashed_id, statement)`.
  */
object MongoStatements {

  import StatementTransforms._

  def statements(docs: DataFrame, salt: String, tenant: String): DataFrame = {
    val name = col("statement.actor.account.name")
    docs
      .select(
        col("_id").cast("string").as("id"),
        col("timestamp").as("ts"),
        col("statement"))
      .filter(col("id").isNotNull && col("ts").isNotNull && col("statement").isNotNull)
      .filter(isValidActorName(name))
      .withColumn("hashed_id", anonymizeActor(name, salt, tenant))
      .withColumn("statement",
        to_json(col("statement").withField("actor.account.name", col("hashed_id"))))
  }
}
