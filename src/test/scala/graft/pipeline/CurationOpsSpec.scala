package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the round-5 curation/retrieval operators (q85–q91).
  * The DuckDB oracle gate re-checks these end-to-end at sf0.01; here we
  * pin hand-computed values on tiny inputs so a regression localises.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val s1 = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 60), 25, "strat")
    val s2 = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 60), 25, "strat")
    assert(s1.collect().toSet == s2.collect().toSet, "must be deterministic")
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 500 docs per stratum; md5 buckets are near-uniform, so the keep
    // counts sit near 60% / 25% (generous band, zero flake).
    assert(byLang("en") > 240 && byLang("en") < 360, s"en=${byLang("en")}")
    assert(byLang("xx") > 75 && byLang("xx") < 175, s"xx=${byLang("xx")}")
    // different salt => different sample (decoupled decisions)
    val s3 = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 60), 25, "other")
    assert(s1.select("doc_id").collect().toSet
      != s3.select("doc_id").collect().toSet)
  }

  test("packSequences assigns each doc the bin of its start offset") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), ("a", 4L, 10L),
      ("b", 1L, 300L)
    ).toDF("src", "id", "n_tok")
    val out = Curation.packSequences(df, "id", "src", "n_tok", 256)
      .select("src", "id", "cum_tok", "bin_id")
      .as[(String, Long, Long, Long)].collect().toSet
    // starts: a1@0->bin0, a2@100->bin0, a3@200->bin0, a4@300->bin1, b1@0->bin0
    assert(out == Set(
      ("a", 1L, 100L, 0L), ("a", 2L, 200L, 0L), ("a", 3L, 300L, 0L),
      ("a", 4L, 310L, 1L), ("b", 1L, 300L, 0L)))
  }

  test("rebalanceMixture: kept tokens land near the per-stratum budget") {
    val df = (0L until 2000L).map { i =>
      val lang = if (i % 4 == 0) "en" else "xx" // en: 500 docs, xx: 1500
      (i, lang, 40L)                            // en: 20k toks, xx: 60k toks
    }.toDF("doc_id", "lang", "n_tok")
    val kept = Curation.rebalanceMixture(df, "doc_id", "lang", "n_tok", 20000L, "mix")
    val byLang = kept.groupBy("lang")
      .agg(sum("n_tok").as("toks"), max("rate").as("rate"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // en is exactly at budget -> rate 100, everything kept
    assert(byLang("en") == ((20000L, 100L)))
    // xx is 3x over budget -> rate 33%; md5 buckets are near-uniform
    assert(byLang("xx")._2 == 33L)
    assert(byLang("xx")._1 > 14000L && byLang("xx")._1 < 26000L,
      s"xx kept ${byLang("xx")._1} tokens for a 20k budget")
    // deterministic
    assert(kept.agg(sum("doc_id")).head.getLong(0) ==
      Curation.rebalanceMixture(df, "doc_id", "lang", "n_tok", 20000L, "mix")
        .agg(sum("doc_id")).head.getLong(0))
  }

  test("qualityFlags: integer-threshold rules and first-reason semantics") {
    val df = Seq(
      (1L, "quick brown foxes jumped over those lazy sleeping dogs" +
        " with great enthusiasm today"),                           // 13 toks, keeps
      (2L, "short doc"),                                           // too few tokens
      (3L, ("unique" + ("x" * 20) + " ") * 12)                     // words too long
    ).toDF("doc_id", "text")
    val f = Curation.qualityFlags(col("text"))
    val rows = df.select(col("doc_id"), f.getField("keep").as("keep"),
        f.getField("reason").as("reason"))
      .as[(Long, Boolean, String)].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(rows(1L) == (true, ""))
    assert(rows(2L) == (false, "len"))
    assert(rows(3L) == (false, "word_len"))
  }

  test("bm25 matches the hand formula on a two-doc corpus") {
    val df = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("doc_id", "text")
    val out = Retrieval.bm25(df, "doc_id", "text")
      .select("doc_id", "term", "bm25").as[(Long, String, Double)]
      .collect().map { case (i, t, s) => (i, t) -> s }.toMap
    // N=2, sum_dl=5, avgdl=2.5; apple: df=1, doc1 tf=2 dl=3
    val idfApple = math.log((2.0 - 1 + 0.5) / (1 + 0.5) + 1.0)
    val expApple = idfApple * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * (3 / 2.5)))
    assert(math.abs(out((1L, "apple")) - math.rint(expApple * 1e6) / 1e6) < 1e-9)
    // banana: df=2 -> idf = ln(1/2.5*... ) via formula
    val idfBanana = math.log((2.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val expBanana = idfBanana * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * (2 / 2.5)))
    assert(math.abs(out((2L, "banana")) - math.rint(expBanana * 1e6) / 1e6) < 1e-9)
  }

  test("quality gate + stratified sample stream in append mode == batch") {
    // Both operators are stateless projections, so they run unchanged on
    // a stream with no watermark and no state store — the property that
    // lets one curation codepath serve backfill AND live ingestion.
    val corpus = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    def gate(df: org.apache.spark.sql.DataFrame) =
      Curation.stratifiedSample(
        df.withColumn("keep", Curation.qualityFlags(col("text")).getField("keep")),
        "doc_id", "lang", Map("en" -> 60), 25, "strat")
        .select(col("doc_id"), col("keep"), col("bucket"))
    val expected = gate(corpus).as[(Long, Boolean, Long)].collect().toSet
    assert(expected.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("curation_stream").toString
    corpus.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = gate(stream)
      .writeStream.format("memory").queryName("curation_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("curation_mem").as[(Long, Boolean, Long)].collect().toSet
    assert(got == expected, s"stream != batch: ${(expected -- got).take(3)}")
  }

  test("streamIngest runs unchanged as an actual stream (append mode == batch)") {
    // the q144 operator's streaming claim, executed: quality decision +
    // lang-ID + PII scrub are one stateless projection, so the same
    // code serves backfill and live ingestion row-for-row
    val corpus = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def gate(df: org.apache.spark.sql.DataFrame) =
      Curation.streamIngest(df, "doc_id", "text", 1000, 1500, 100)
        .select(col("doc_id"), col("pred_lang"), col("keep"),
          col("reason"), col("n_emails"), col("redacted"))
    val expected = gate(corpus)
      .as[(Long, String, Boolean, String, Long, String)].collect().toSet
    assert(expected.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("ingest_stream").toString
    corpus.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = gate(stream)
      .writeStream.format("memory").queryName("ingest_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ingest_mem")
      .as[(Long, String, Boolean, String, Long, String)].collect().toSet
    assert(got == expected, s"stream != batch: ${(expected -- got).take(2)}")
  }

  test("lmQualityBuckets: per-source terciles split deterministically at the bp cuts") {
    import spark.implicits._
    // one source, 9 docs, strictly increasing scores:
    // pct_bp(doc i) = (i-1)*10000/8 -> 0,1250,...,10000
    val scores = (1L to 9L).map(i => (i, i * 100L)).toDF("doc_id", "score")
    val src = (1L to 9L).map(i => (i, "A")).toDF("doc_id", "source")
    val out = Curation.lmQualityBuckets(scores, src).collect()
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(out(1L) == "tail" && out(3L) == "tail", s"got $out")     // 0, 2500
    assert(out(4L) == "middle" && out(6L) == "middle", s"got $out") // 3750, 6250
    assert(out(7L) == "head" && out(9L) == "head", s"got $out")     // 7500, 10000
  }

  test("prioritySample: deterministic, size k, weight-sensitive") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, if (i == 7L) 1000000L else 10L))
    val df = rows.toDF("id", "wt")
    val s1 = Curation.prioritySample(df, "id", "wt", k = 50, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s2 = Curation.prioritySample(df, "id", "wt", k = 50, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq == s2.toSeq, "sample not deterministic")
    assert(s1.length == 50 && s1.map(_._1).distinct.length == 50)
    // the dominant-weight row wins with overwhelming priority: its
    // priority is >= w (u <= 2^32), every 10-weight row's is <= 10*2^32
    // — it can only lose to rows drawing u < ~43, a ~1e-8 event the
    // fixed salt makes concrete (and the assert would catch).
    assert(s1.map(_._1).contains(7L), "dominant-weight row not sampled")
    // priorities are exactly (w * 2^32) div u — recompute one
    val hashed = s1.map { case (id, w, p) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:t".getBytes("UTF-8"))
      val u = (BigInt(1, md5.take(4)).toLong & 0xffffffffL) + 1
      p == w * 4294967296L / u
    }
    assert(hashed.forall(identity), "priority formula mismatch")
    // sample order is (priority desc, id) — a total order
    assert(s1.sortBy { case (id, _, p) => (-p, id) }.toSeq == s1.toSeq)
  }

  test("boilerplateRatio flags recurring segments in both modes") {
    import spark.implicits._
    // sentence mode: "buy now" recurs in 3 docs
    val docs = Seq(
      (0L, "Buy now. Unique alpha content."),
      (1L, "Buy now. Different beta text."),
      (2L, "Buy now. Another gamma body."),
      (3L, "Totally original. Nothing shared.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateRatio(docs, "doc_id", "text", minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 1L, 5000L)), s"got ${out(0L)}")
    assert(out(3L) == ((2L, 0L, 0L)))
    // chunk mode: docs 0/1 share their first 4-token chunk
    val docs2 = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d x y z w"),
      (2L, "p q r s t u v m")
    ).toDF("doc_id", "text")
    val out2 = TextAnalysis.boilerplateRatio(docs2, "doc_id", "text",
        minDf = 2, chunkTokens = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out2(0L) == ((2L, 1L, 5000L)), s"got ${out2(0L)}")
    assert(out2(1L) == ((2L, 1L, 5000L)))
    assert(out2(2L) == ((2L, 0L, 0L)))
  }

  test("qualityFilterStack: gate reasons precede repetition reasons, zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      // clean: 11 tokens, distinct, stopword 'the', avg word len ~4.6
      (1L, "the quick brown fox jumps over lazy dogs near riverbank today"),
      // "the red" x3 -> dup2_bp 1666 > 1000, gates all pass
      (2L, "the red fox sees the red dog and the red cow here"),
      // 5 tokens -> gate 'len' wins over any repetition reason
      (3L, "a a a a a")
    ).toDF("doc_id", "text")
    val out = Curation.qualityFilterStack(docs, "doc_id", "text",
      dup2MaxBp = 1000, top2MaxBp = 10000, dup3MaxBp = 10000)
    val m = out.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(4), r.getString(5))).toMap
    assert(m(1L) == ((true, "")), s"got ${m(1L)}")
    assert(m(2L) == ((false, "dup_2gram")), s"got ${m(2L)}")
    assert(m(3L) == ((false, "len")), s"got ${m(3L)}")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stack shuffled:\n$plan")
  }

  test("spanCorrupt: input+target reconstruct the original tokens on every fixture doc") {
    val docs = graft.queries.Tables.documents(spark, sf)
    val out = Curation.spanCorrupt(docs, "doc_id", "text", maskPct = 15, salt = "t5")
      .join(docs.select(col("doc_id"), lower(col("text")).as("lt")), "doc_id")
      .collect()
    assert(out.nonEmpty)
    var masked = 0L
    out.foreach { r =>
      val orig = r.getAs[String]("lt").split("\\s+").toSeq
      val input = r.getAs[String]("input")
      val target = r.getAs[String]("target")
      // parse target into span map: <Xk> tok tok ...
      val spans = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      if (target.nonEmpty) target.split(" ").foreach { t =>
        if (t.matches("<X\\d+>")) { cur = t; spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      }
      val rebuilt = (if (input.isEmpty) Seq.empty[String] else input.split(" ").toSeq)
        .flatMap(t => if (t.matches("<X\\d+>")) spans(t) else Seq(t))
      assert(rebuilt == orig,
        s"doc ${r.getLong(0)}: reconstruction diverges\n$rebuilt\n$orig")
      assert(r.getAs[Long]("n_spans") == spans.size.toLong)
      masked += r.getAs[Long]("n_masked")
    }
    assert(masked > 0, "mask rate produced no masked tokens on the fixture")
  }

  test("spanCorrupt scales linearly on long docs (50k tokens)") {
    import spark.implicits._
    // The round-7 verdict's scale hazard: the old aggregate-fold copied
    // the accumulated arrays per token (O(n²) per doc) — fine at the
    // fixture's ~540 tokens, minutes at 50k. The O(n) slice-assembly
    // version must chew a 50k-token doc as casually as a short one, and
    // still reconstruct exactly.
    def doc(id: Long, n: Int): (Long, String) =
      (id, (1 to n).map(i => s"w${(i * 2654435761L) % 9973}").mkString(" "))
    val docs = Seq(doc(1L, 50000), doc(2L, 50000), doc(3L, 500))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Curation.spanCorrupt(docs, "doc_id", "text",
      maskPct = 15, salt = "t5")
      .join(docs.select(col("doc_id"), lower(col("text")).as("lt")), "doc_id")
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // quadratic at 50k tokens is minutes of pure array copying; linear is
    // well under this generous bound even on a loaded host.
    assert(secs < 30.0, f"50k-token spanCorrupt took $secs%.1f s — not linear")
    out.foreach { r =>
      val orig = r.getAs[String]("lt").split("\\s+").toSeq
      val spans = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      val target = r.getAs[String]("target")
      if (target.nonEmpty) target.split(" ").foreach { t =>
        if (t.matches("<X\\d+>")) { cur = t; spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      }
      val rebuilt = r.getAs[String]("input").split(" ").toSeq
        .flatMap(t => if (t.matches("<X\\d+>")) spans(t) else Seq(t))
      assert(rebuilt == orig, s"doc ${r.getLong(0)}: long-doc reconstruction diverges")
      assert(r.getAs[Long]("n_masked") > 0L)
    }
  }

  test("snapshotDiff labels all four statuses") {
    import spark.implicits._
    val oldS = Seq((1L, "same"), (2L, "will change"), (3L, "gone")).toDF("doc_id", "text")
    val newS = Seq((1L, "same"), (2L, "changed!"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Curation.snapshotDiff(oldS, newS, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"got $out")
  }

  test("balancedShards: deterministic assignment, shard mass within one max doc") {
    import spark.implicits._
    // weights 9..1, S=3: desc order = ids 1..9, shard = (rank-1)%3
    val docs = (1L to 9L).map(i => (i, 10L - i)).toDF("doc_id", "n_chars")
    val out = Curation.balancedShards(docs, "doc_id", "n_chars", nShards = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 1,
      6L -> 2, 7L -> 0, 8L -> 1, 9L -> 2), s"got $out")
    // balance bound on the real fixture: max-min shard sum <= max weight
    val fx = graft.queries.Tables.documents(spark, sf)
    val sums = Curation.balancedShards(fx, "doc_id", "n_chars", nShards = 8)
      .groupBy(col("shard")).agg(sum(col("w")).as("s"))
      .collect().map(_.getLong(1))
    val wMax = fx.agg(max(col("n_chars"))).collect()(0).getLong(0)
    assert(sums.max - sums.min <= wMax,
      s"imbalance ${sums.max - sums.min} > max doc $wMax")
  }

  test("redactPii counts and replaces every shape, leaves near-misses alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@x-y.org now or 555.123.4567 and 987-65-4321 end"),
      (2L, "bad shapes: 12-34-5678 a@b @x.com 555-12-34567"),
      (3L, "two@mails.de and second@mail.fr")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((1L, 1L, 1L,
      "mail <EMAIL> now or <PHONE> and <ID> end")), s"got ${out(1L)}")
    // "555-12-34567": the ID pattern's \b\d{3}-\d{2}-\d{4}\b needs a
    // word boundary after 4 digits — the trailing 5th digit kills it;
    // "a@b" has no dot-TLD; "@x.com" has no local part.
    assert(out(2L)._4 == "bad shapes: 12-34-5678 a@b @x.com 555-12-34567",
      s"got ${out(2L)}")
    assert(out(3L) == ((2L, 0L, 0L, "<EMAIL> and <EMAIL>")))
  }

  test("sourceKlDivergence: zero for corpus-identical sources, ln2 for disjoint halves") {
    import spark.implicits._
    // identical distributions: every source == corpus -> KL 0
    val same = Seq((1L, "x y", "A"), (2L, "x y", "B")).toDF("doc_id", "text", "source")
    val m0 = Curation.sourceKlDivergence(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m0 == Map("A" -> 0L, "B" -> 0L), s"got $m0")
    // disjoint halves: each term has p_s = 1/2 vs p = 1/4 -> KL = ln 2
    // per token = 693147 micro-nats exactly (single rounded log-ratio)
    val disj = Seq((1L, "x y", "A"), (2L, "z w", "B")).toDF("doc_id", "text", "source")
    val m1 = Curation.sourceKlDivergence(disj, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m1 == Map("A" -> 693147L, "B" -> 693147L), s"got $m1")
  }

  test("repetitionSignals: hand-computed grams, short docs, zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a"),   // 2g: ab,ba,ab,ba -> n2=4 nd=2 top=2; 3g: aba,bab,aba
      (1L, "x y z"),       // all distinct
      (2L, "solo"),        // no grams at all
      (3L, "A a b")        // lower() folds A -> a
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(m(0L) == ((4L, 5000L, 5000L, 3L, 3333L, 6666L)), s"got ${m(0L)}")
    assert(m(1L) == ((2L, 0L, 5000L, 1L, 0L, 10000L)))
    assert(m(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(m(3L) == ((2L, 0L, 5000L, 1L, 0L, 10000L)))
    // the whole operator is a projection: no exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetitionSignals shuffled:\n$plan")
  }

  test("groupPercentileRank matches the window-rank reference, singleton -> 0") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (0L, "en", 30L), (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 10L),
      (4L, "de", 5L), (5L, "de", 50L),
      (6L, "fr", 99L) // singleton group
    ).toDF("doc_id", "lang", "score")
    val got = Curation.groupPercentileRank(df, "lang", "score", "doc_id")
      .select("grp", "id", "rank_in_grp", "n_grp", "pct_bp")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("lang")).orderBy(col("score"), col("doc_id"))
    val ref = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("doc_id"), col("r"), col("n"),
        when(col("n") > 1, floor((col("r") - 1) * 10000 / (col("n") - 1)).cast("long"))
          .otherwise(0L))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == ref, s"two-pass != window reference:\n${(ref -- got).take(3)}")
    assert(got.find(_._2 == 6L).get._5 == 0L, "singleton group must score 0")
    // ties (docs 1 and 3, both score 10) break on id: rank 1 then 2
    assert(got.find(_._2 == 1L).get._3 == 1L && got.find(_._2 == 3L).get._3 == 2L)
  }

  test("pmiBigrams counts adjacent pairs and scores with ln") {
    val df = Seq.fill(3)("big data big data").toDF("text")
    // per doc toks = [big, data, big, data]; bigrams: (big,data)x2, (data,big)x1
    val out = Retrieval.pmiBigrams(df, "text", 3L)
      .select("w1", "w2", "c_xy", "pmi").as[(String, String, Long, Double)]
      .collect().map { case (a, b, c, p) => (a, b) -> (c, p) }.toMap
    // n_uni=12, n_bi=9; (big,data): c_xy=6, c_big=6, c_data=6
    assert(out(("big", "data"))._1 == 6L)
    val exp = math.log((6.0 * 12 * 12) / ((9.0 * 6) * 6))
    assert(math.abs(out(("big", "data"))._2 - math.rint(exp * 1e6) / 1e6) < 1e-9)
    assert(out(("data", "big"))._1 == 3L)
  }

  test("dedupReport: histogram by cluster size, min-id member kept") {
    // clusters: {1,2,3} (w 10,20,30), {4,5} (w 40,50), {6} (w 60)
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("id", "component")
    val w = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L), (6L, 60L))
      .toDF("id", "w")
    val got = Dedup.dedupReport(comp, w).orderBy(col("cluster_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 50L),
      (3L, 1L, 3L, 50L)), s"got ${got.toSeq}")
  }

  test("equiDepthBins: near-equal populations, ordered boundaries, all rows binned") {
    // 10 rows into 4 bins: floor((rn-1)*4/10) -> sizes 3,2,3,2
    val df = (1L to 10L).map(i => (i, i * 100)).toDF("id", "score")
    val got = Curation.equiDepthBins(df, "score", "id", 4)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).toSeq == Seq(3L, 2L, 3L, 2L), s"sizes ${got.map(_._2).toSeq}")
    assert(got.map(_._2).sum == 10L)
    // boundaries are disjoint and ascending
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"bin overlap: $a then $b")
    }
  }

  test("mixtureWeights flattens toward rare sources at alpha=0.5") {
    // web 90 tokens, books 10: p = (0.9, 0.1); q = (sqrt .9, sqrt .1)
    val df = Seq(("web", 50L), ("web", 40L), ("books", 10L))
      .toDF("source", "n_tok")
    val got = Curation.mixtureWeights(df, "source", "n_tok", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    def ppm(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val (qb, qw) = (math.pow(0.1, 0.5), math.pow(0.9, 0.5))
    val z = qb + qw // sorted by source: books before web
    assert(got("web") == ((2L, 90L, ppm(0.9), ppm(qw / z), ppm(qw / z / 0.9))))
    assert(got("books") == ((1L, 10L, ppm(0.1), ppm(qb / z), ppm(qb / z / 0.1))))
    // the whole point: books upsampled (> 1e6), web downsampled
    assert(got("books")._5 > 1000000L && got("web")._5 < 1000000L)
  }
}
