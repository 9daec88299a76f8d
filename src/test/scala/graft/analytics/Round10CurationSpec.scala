package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the second round-10 operator batch: URL canonicalization
  * ([[UrlOps]]), snapshot diff ([[Versioning]]), k-anonymity ([[Privacy]]),
  * the blocklist gate ([[TextAnalysis.blocklistGate]]), length-bucketed
  * batching and chat-template packing ([[Sampling]]), and ROUGE-2 /
  * calibration ([[Search]]). The oracled queries (curate_url_dedup,
  * corpus_diff, privacy_k_anon, curate_blocklist, pack_length_buckets,
  * pack_chat_template, eval_rouge2, clf_calibration) gate end-to-end
  * equality at sf0.01; these tests pin edge semantics on corpora built to
  * hit each branch. */
class Round10CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- UrlOps -----------------------------------------------------------

  test("canonicalizeUrl: case, www, default port, fragment, tracking params, trailing slash") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=3&utm_medium=y#frag",
      "https://example.com/A/b?id=3",
      "http://example.com:80/",
      "http://example.com",
      // non-default port survives; param order is preserved
      "https://example.com:8443/p?b=2&a=1",
      // path case is significant
      "https://example.com/A",
      "https://example.com/a")
      .toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(urls(0) == "https://example.com/A/b?id=3")
    assert(urls(1) == urls(0))
    assert(urls(2) == "http://example.com")
    assert(urls(3) == "http://example.com")
    assert(urls(4) == "https://example.com:8443/p?b=2&a=1")
    assert(urls(5) != urls(6))
  }

  test("canonicalizeUrl: default-port strip is scheme-matched (r10 ADVICE)") {
    val urls = Seq(
      "http://example.com:443/x",   // 443 is NOT default for http
      "https://example.com:80/x",   // 80 is NOT default for https
      "ftp://example.com:80/x",     // unknown scheme: never strip
      "http://example.com:80/x",    // genuine defaults still strip
      "https://example.com:443/x")
      .toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(urls(0) == "http://example.com:443/x")
    assert(urls(1) == "https://example.com:80/x")
    assert(urls(2) == "ftp://example.com:80/x")
    assert(urls(3) == "http://example.com/x")
    assert(urls(4) == "https://example.com/x")
  }

  test("canonicalizeUrl: all-tracking query drops the '?' entirely") {
    val c = Seq("https://example.com/x?utm_source=a&gclid=b")
      .toDF("url").select(UrlOps.canonicalizeUrl(col("url"))).head().getString(0)
    assert(c == "https://example.com/x")
  }

  test("urlDedup: variants collapse, keeper = min id, clean URL is its own group") {
    val df = Seq(
      (1L, "https://www.example.com/p?utm_source=f&id=1"),
      (2L, "HTTPS://EXAMPLE.COM:443/p/?id=1&fbclid=z"),
      (3L, "https://other.com/q")).toDF("doc_id", "url")
    val out = UrlOps.urlDedup(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("canonical_url") == "https://example.com/p?id=1")
    assert(out(0).getAs[Long]("keeper_id") == 1L && out(0).getAs[Boolean]("is_keeper"))
    assert(out(1).getAs[Long]("keeper_id") == 1L && !out(1).getAs[Boolean]("is_keeper"))
    assert(out(1).getAs[Long]("n_copies") == 2L)
    assert(out(2).getAs[Boolean]("is_keeper") && out(2).getAs[Long]("n_copies") == 1L)
  }

  // ---- Versioning -------------------------------------------------------

  test("corpusDiff: added / removed / changed / unchanged all classified") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val m = Versioning.corpusDiff(old, nw).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(m == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val s = Versioning.diffSummary(Versioning.corpusDiff(old, nw)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("corpusDiff: null text classifies by row presence, not hash nullability (r10 ADVICE)") {
    val old = Seq((1L, null: String), (2L, null: String), (3L, "c"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, null: String), (2L, "b2"), (4L, null: String))
      .toDF("doc_id", "text")
    val m = Versioning.corpusDiff(old, nw).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    // null text on both sides = unchanged (null <=> null); null -> text =
    // changed; a doc only in `new` is added even with null text
    assert(m == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  // ---- Privacy ----------------------------------------------------------

  test("kAnonymity: groups under k are withheld, exactly-k released") {
    val df = Seq(
      (1L, "s1", "en"), (2L, "s1", "en"), (3L, "s1", "en"),
      (4L, "s2", "en"), (5L, "s2", "de")).toDF("doc_id", "source", "lang")
    val out = Privacy.kAnonymity(df,
      Seq("source" -> col("source"), "lang" -> col("lang")), k = 3)
      .orderBy("doc_id").collect()
    assert(out.take(3).forall(_.getAs[Boolean]("released")))
    assert(out.drop(3).forall(!_.getAs[Boolean]("released")))
    assert(out(0).getAs[Long]("group_n") == 3L && out(3).getAs[Long]("group_n") == 1L)
  }

  test("kAnonymity: NULL quasi-identifiers form a group and still get a verdict row") {
    // r16 review sweep: the plain equi-join-back dropped null-QI docs from
    // the verdict frame entirely — a release gate must emit one row per doc
    val df = Seq(
      (1L, Option("s1"), "en"), (2L, Option("s1"), "en"),
      (3L, Option.empty[String], "en"), (4L, Option.empty[String], "en"),
      (5L, Option.empty[String], "de")).toDF("doc_id", "source", "lang")
    val out = Privacy.kAnonymity(df,
      Seq("source" -> col("source"), "lang" -> col("lang")), k = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 5, "every document gets a verdict row, null QIs included")
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("group_n"), r.getAs[Boolean]("released"))).toMap
    assert(byId(1L) == ((2L, true)) && byId(2L) == ((2L, true)))
    assert(byId(3L) == ((2L, true)) && byId(4L) == ((2L, true)),
      "the (NULL, en) group has 2 members")
    assert(byId(5L) == ((1L, false)), "the (NULL, de) singleton is withheld")
  }

  // ---- blocklistGate ----------------------------------------------------

  test("blocklistGate: severe blocks outright, distinct count blocks, clean doc gets a row") {
    val docs = Seq(
      (1L, "the bad apple"),                  // 1 severe hit -> blocked
      (2L, "ugly dull grim day"),             // 3 distinct ordinary -> blocked
      (3L, "ugly ugly ugly day"),             // 1 distinct, 3 hits -> pass
      (4L, "sunny clean day")).toDF("doc_id", "text") // no hits -> pass, still a row
    val bl = Seq(("ugly", false), ("dull", false), ("grim", false), ("bad", true))
      .toDF("term", "severe")
    val out = TextAnalysis.blocklistGate(docs, bl, minDistinct = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("blocked")).toSeq == Seq(true, true, false, false))
    assert(out(0).getAs[Long]("n_severe") == 1L)
    assert(out(2).getAs[Long]("n_hits") == 3L && out(2).getAs[Long]("n_terms") == 1L)
    assert(out(3).getAs[Long]("n_hits") == 0L)
  }

  // ---- lengthBucketBatches ---------------------------------------------

  test("lengthBucketBatches: banding, truncation past the top band, waste arithmetic") {
    val mk = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, mk(10)), (8L, mk(12)),   // band 16
      (16L, mk(2000))               // 2000 tokens -> truncated to 1024
    ).toDF("doc_id", "text")
    val out = Sampling.lengthBucketBatches(docs, batchSize = 8, nShards = 1)
      .orderBy("band", "batch_idx").collect()
    val b16 = out.filter(_.getAs[Int]("band") == 16)
    assert(b16.map(_.getAs[Long]("tokens")).sum == 22L)
    val top = out.filter(_.getAs[Int]("band") == 1024).head
    assert(top.getAs[Long]("tokens") == 1024L &&
      top.getAs[Long]("waste_permille") == 0L)
  }

  test("lengthBucketBatches: batches split at batchSize within (band, shard)") {
    val docs = (0L until 20L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = Sampling.lengthBucketBatches(docs, batchSize = 8, nShards = 1)
    val sizes = out.orderBy("batch_idx").collect().map(_.getAs[Long]("n_docs")).toSeq
    assert(sizes == Seq(8L, 8L, 4L))
  }

  // ---- chatTemplate -----------------------------------------------------

  test("chatTemplate: span offsets tile the template and mask only assistant segments") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(ts.getTime + s * 1000L)
    val events = Seq(
      (10L, at(0), 7L, "view"),      // user:  <|user|>view#7        (12 chars)
      (10L, at(1), 8L, "purchase"),  // asst:  <|assistant|>purchase#8 (24 chars)
      (10L, at(2), 9L, "click"),     // user
      (10L, at(2), 11L, "error")     // asst — same ts, event_id breaks the tie
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Sampling.chatTemplate(events).head()
    assert(r.getAs[Long]("n_turns") == 4L && r.getAs[Long]("n_assistant") == 2L)
    val segs = Seq("<|user|>view#7", "<|assistant|>purchase#8",
      "<|user|>click#9", "<|assistant|>error#11")
    assert(r.getAs[Long]("template_chars") == segs.map(_.length).sum.toLong)
    val starts = segs.scanLeft(0)(_ + _.length)
    val expectSpans = Seq(1, 3).map(i => s"${starts(i)}-${starts(i + 1)}").mkString(",")
    assert(r.getAs[String]("loss_spans") == expectSpans)
    assert(r.getAs[Long]("loss_chars") == segs(1).length + segs(3).length)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(segs.mkString("").getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("template_hash") == sha)
  }

  test("chatTemplate: all-user conversation has empty loss spans") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val events = Seq((1L, ts, 1L, "view")).toDF("user_id", "ts", "event_id", "event_type")
    val r = Sampling.chatTemplate(events).head()
    assert(r.getAs[String]("loss_spans") == "" && r.getAs[Long]("loss_chars") == 0L)
  }

  // ---- rouge2 -----------------------------------------------------------

  test("rouge2: clipped bigram counts match a hand computation") {
    // cand bigrams: (a b)x2, (b a), (b c)  -> 4
    // ref  bigrams: (a b), (b c), (c d)    -> 3
    // clipped overlap: min(2,1) + min(1,1) = 2
    val pairs = Seq((1L, "a b a b c", "a b c d")).toDF("pair_id", "cand", "ref")
    val r = Search.rouge2(pairs).head()
    assert(r.getAs[Long]("cand_grams") == 4L && r.getAs[Long]("ref_grams") == 3L)
    assert(r.getAs[Long]("overlap") == 2L)
    assert(r.getAs[Long]("p_permille") == 500L)   // 2/4
    assert(r.getAs[Long]("r_permille") == 666L)   // 2/3 truncated
    assert(r.getAs[Long]("f_permille") == 571L)   // 4/7 truncated
  }

  test("rouge2: identical texts score 1000 everywhere; disjoint texts 0") {
    val pairs = Seq(
      (1L, "x y z", "x y z"),
      (2L, "x y z", "p q r")).toDF("pair_id", "cand", "ref")
    val out = Search.rouge2(pairs).orderBy("pair_id").collect()
    assert(out(0).getAs[Long]("f_permille") == 1000L)
    assert(out(1).getAs[Long]("overlap") == 0L && out(1).getAs[Long]("f_permille") == 0L)
  }

  // ---- classifierCalibration -------------------------------------------

  test("classifierCalibration: bins partition the corpus, metrics bounded, gap consistent") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = Search.classifierCalibration(docs, Search.derivedWeights(docs))
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin < 10)
      val obs = r.getAs[Long]("obs_permille")
      val conf = r.getAs[Long]("conf_permille")
      assert(obs >= 0 && obs <= 1000 && conf >= 0 && conf < 1000)
      assert(r.getAs[Long]("gap_permille") == math.abs(obs - conf))
    }
  }
}
