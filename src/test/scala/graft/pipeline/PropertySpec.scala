package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage per SURVEY §5.2: hash determinism + isolation
  * (O7), escape-chain run laws (O10), argmax shape (O12). Properties are
  * evaluated through the engine itself (single-row DataFrames) so they
  * exercise the same Catalyst expressions the pipeline runs.
  */
class PropertySpec extends SparkSpec {

  /** Drive a generator deterministically (scalatestplus bridge isn't in the
    * offline dep set; 60 seeded samples per property). */
  private def forAll[T](gen: Gen[T], n: Int = 60)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  import StatementTransforms._

  private def run1(c: org.apache.spark.sql.Column, input: String): String = {
    import spark.implicits._
    Seq(input).toDF("s").select(c.cast("string").as("r")).collect()(0).getString(0)
  }

  private val nameGen: Gen[String] = for {
    local <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    domain <- Gen.option(Gen.alphaNumChar.map(c => s"@$c.org"))
  } yield local + domain.getOrElse("")

  test("O7: same name ⇒ same hash; different tenant or salt ⇒ different hash") {
    forAll(nameGen) { name =>
      val h1 = run1(anonymizeActor(col("s"), "s1", "t1"), name)
      val h2 = run1(anonymizeActor(col("s"), "s1", "t1"), name)
      val hT = run1(anonymizeActor(col("s"), "s1", "t2"), name)
      val hS = run1(anonymizeActor(col("s"), "s2", "t1"), name)
      assert(h1 == h2 && h1 != hT && h1 != hS && h1.matches("[0-9a-f]{64}"))
    }
  }

  test("O10: backslash runs always normalize to length 2 (odd) or 4 (even)") {
    val gen = for {
      n <- Gen.choose(1, 9)
      pre <- Gen.alphaStr.map(_.take(5))
      post <- Gen.alphaStr.map(_.take(5))
    } yield (n, pre + ("\\" * n) + post)
    forAll(gen) { case (n, s) =>
      val out = run1(processStatement(col("s")), s)
      val runLen = out.sliding(1).zipWithIndex.collect { case ("\\", _) => 1 }.sum
      assert(runLen == (if (n % 2 == 1) 2 else 4))
    }
  }

  test("O10: strings without specials are fixed points") {
    forAll(Gen.alphaNumStr) { s =>
      assert(run1(processStatement(col("s")), s) == s)
    }
  }

  test("O12: argmax keeps exactly one row per key, carrying the max version's value") {
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      key <- Gen.choose(0, 5)
      version <- Gen.choose(0L, 1000L)
    } yield (s"k$key", s"v$version", version))
    forAll(rowsGen) { rows =>
      val df = rows.toDF("email", "hash", "version")
      val out = OptOutRouting.latestPerKey(df, "email", "version", "hash").collect()
      val byKey = rows.groupBy(_._1)
      assert(out.length == byKey.size)
      out.foreach { r =>
        val maxV = byKey(r.getString(0)).map(_._3).max
        assert(r.getLong(2) == maxV)
        // value belongs to SOME max-version row (ties resolved arbitrarily)
        assert(byKey(r.getString(0)).filter(_._3 == maxV).map(_._2).contains(r.getString(1)))
      }
    }
  }
}
