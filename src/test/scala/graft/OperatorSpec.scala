package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every declared query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY §2D per-module query lists match the registry exactly") {
    // keeps the doc mechanically honest: every module bullet's names and
    // count, the no-oracle markers, and the total line must equal the code
    val byModule: Map[String, QueryModule] = Map(
      "analytics/Behavioral" -> analytics.Behavioral,
      "analytics/Probe" -> analytics.Probe,
      "similarity/Pca" -> similarity.Pca,
      "dedup/Dedup" -> dedup.Dedup,
      "dedup/EntityResolution" -> dedup.EntityResolution,
      "domain/Grid" -> domain.GridQueries,
      "graph/Graph" -> graph.GraphQueries,
      "multimodal/Multimodal" -> multimodal.Multimodal,
      "operators/Aggregates" -> operators.Aggregates,
      "operators/Relational" -> operators.Relational,
      "operators/Scalars" -> operators.Scalars,
      "operators/WindowOps" -> operators.WindowOps,
      "similarity/Similarity" -> similarity.Similarity,
      "sources/SourceQueries" -> sources.SourceQueries,
      "streaming/Streaming" -> streaming.Streaming,
      "text/TextAnalysis" -> TextAnalysis,
      "text/Privacy" -> graft.text.Privacy,
      "text/Monitoring" -> graft.text.Monitoring)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val section = text.substring(text.indexOf("### 2D."))
    val bullet = """- \*\*([^*]+)\*\* \((\d+)\): (.*)""".r
    val seen = scala.collection.mutable.Set[String]()
    for (m <- bullet.findAllMatchIn(section.substring(0, section.indexOf("Total:")))) {
      val (name, count, body) = (m.group(1), m.group(2).toInt, m.group(3))
      val mod = byModule.getOrElse(name, fail(s"§2D names unknown module $name"))
      val entries = """`([a-z0-9_]+)`(\s*\*\(no oracle\)\*)?""".r
        .findAllMatchIn(body).map(e => e.group(1) -> (e.group(2) != null)).toSeq
      assert(entries.size == count, s"$name: bullet says $count, lists ${entries.size}")
      assert(entries.map(_._1).toSet == mod.queries.keySet,
        s"$name: doc ${entries.map(_._1).toSet} != code ${mod.queries.keySet}")
      entries.foreach { case (q, noOracle) =>
        assert(noOracle == !mod.oracleSql.contains(q),
          s"$q: doc no-oracle marker $noOracle but oracle present = ${mod.oracleSql.contains(q)}")
      }
      seen += name
    }
    assert(seen == byModule.keySet, s"§2D missing modules: ${byModule.keySet -- seen}")
    val total = """Total: (\d+) declared queries \((\d+) oracle-checked \+ (\d+) no-oracle""".r
      .findFirstMatchIn(section).getOrElse(fail("§2D total line missing"))
    assert(total.group(1).toInt == SparkEntry.queries.size, "total drifted")
    assert(total.group(2).toInt == SparkEntry.oracleSql.size, "oracle count drifted")
    assert(total.group(3).toInt ==
      SparkEntry.queries.size - SparkEntry.oracleSql.size, "no-oracle count drifted")
  }

  test("forecast backtest: every series scores both forecasters over the same backtest days") {
    val rows = SparkEntry.queries("q_forecast_backtest")(spark, TestSpark.sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, sn, ma) =>
      assert(n > 0, s"$t: empty backtest")
      assert(sn >= 0 && sn.isFinite && ma >= 0 && ma.isFinite, s"$t: MAPE out of domain ($sn, $ma)")
    }
  }

  test("segment dedup scrubs corpus-repeated segments, untouched docs round-trip") {
    val out = SparkEntry.queries("q_segment_dedup")(spark, TestSpark.sf)
    val rows = out.select("doc_id", "n_seg", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.map(_._3).sum > 0, "fixture should contain corpus-repeated segments")
    assert(rows.exists(_._3 == 0), "some docs should be untouched")
    val original = graft.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, nSeg, nDrop, clean) =>
      assert(nDrop <= nSeg, s"doc $id dropped more segments than it has")
      if (nDrop == 0)
        assert(clean == original(id), s"doc $id with zero drops must round-trip")
      else assert(clean.length < original(id).length, s"doc $id shrank")
    }
  }

  test("q1 pricing aggregates are internally consistent") {
    val rows = graft.operators.Aggregates.q1Pricing(spark, TestSpark.sf)
      .select("sum_qty", "avg_qty", "count_order")
      .as[(Double, Double, Long)].collect()
    rows.foreach { case (sum, avg, n) =>
      assert(math.abs(sum / n - avg) < 0.01, s"avg inconsistent: $sum/$n vs $avg")
    }
  }

  test("semi and anti joins partition the customer table") {
    val c = Tables.customer(spark, TestSpark.sf).count()
    val semi = SparkEntry.queries("q_join_semi")(spark, TestSpark.sf).count()
    val anti = SparkEntry.queries("q_join_anti")(spark, TestSpark.sf).count()
    assert(semi + anti == c)
  }

  test("intersect/except results are consistent with their inputs") {
    val oks = Tables.orders(spark, TestSpark.sf).select("o_orderkey").distinct().count()
    val inter = SparkEntry.queries("q_intersect")(spark, TestSpark.sf).count()
    val exc = SparkEntry.queries("q_except")(spark, TestSpark.sf).count()
    assert(inter <= oks && exc <= oks)
  }

  test("language ID prefers the profile language on crafted text") {
    val df = Seq(
      (1L, "the cat and the dog went to the park for a walk in the sun"),
      (2L, "el perro y el gato que estaba en la casa con los amigos"),
      (3L, "le chat et le chien pour les amis dans les maisons"),
      (4L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "es")
    assert(got(3L) == "fr"); assert(got(4L) == "und")
  }

  test("BPE training learns the textbook merges on crafted text") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "the hat of the cat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, merges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // 'at' appears in cat/sat/mat/hat (5 weighted), then 'he', then t+he
    assert(got == Seq((1, "a", "t", "at", 5L), (2, "h", "e", "he", 4L),
      (3, "t", "he", "the", 4L)), got.toString)
  }

  test("BPE encode applies learned merges to unseen words (no vocab lookup wall)") {
    val train = Seq((1L, "the cat sat on the mat"), (2L, "the hat of the cat"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(train, merges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .map(t => (t._2, t._3, t._4)) // (a, t) (h, e) (t, he)
    // 'theta' never appeared in training; its 'the' prefix must still merge:
    // t h e t a → t he t a → the t a → 3 sub-tokens
    val sub = TextAnalysis.bpeSubtokenCounts(
        Seq((1L, "theta zq")).toDF("doc_id", "text"), merges)
      .as[(String, Int)].collect().toMap
    assert(sub("theta") == 3, sub.toString)
    assert(sub("zq") == 2) // nothing to merge: stays at character count
  }

  test("BPE training: distributed loop matches the driver-local path exactly") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
    val local = TextAnalysis.bpeTrain(docs, merges = 6).collect().toSeq
    val dist = TextAnalysis.bpeTrain(docs, merges = 6, localVocabLimit = 0L)
      .collect().toSeq
    assert(local == dist, s"local=$local dist=$dist")
    assert(local.size == 6)
  }

  test("fingerprint is order-sensitive (dedup vs reordered text)") {
    val fp = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L) && fp(1L) != fp(2L))
  }

  test("no-oracle approx queries stay within published error of their exact twins") {
    // q_quantile_approx: percentile_approx(accuracy=10000) guarantees rank
    // error ≤ N/accuracy; translate to value error via the exact quantiles
    val approxQ = graft.operators.Aggregates.queries("q_quantile_approx")(spark, TestSpark.sf)
      .as[(String, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val exactQ = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("qs"))
      .as[(String, Seq[Double])].collect().toMap
    approxQ.foreach { case (flag, got) =>
      got.zip(exactQ(flag)).foreach { case (a, e) =>
        // quantities are integers 1..50: rank slack of N/10000 can move the
        // estimate at most one value step at this fixture size
        assert(math.abs(a - e) <= 1.0, s"$flag: approx $a vs exact $e")
      }
    }
    // q_approx_distinct: HLL with rsd=0.02 — assert within 3 sigma (6%)
    val approxD = graft.operators.Aggregates.queries("q_approx_distinct")(spark, TestSpark.sf)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exactD = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    approxD.foreach { case (flag, a) =>
      val e = exactD(flag)
      assert(math.abs(a - e).toDouble / e <= 0.06,
        s"$flag: approx distinct $a vs exact $e exceeds 3×rsd")
    }
  }

  test("BM25 ranking matches a driver-side brute force (order exact, scores 1e-6)") {
    val out = SparkEntry.queries("q_bm25")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val tf = docs.flatMap { case (id, _) =>
      toks(id).groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) }
    }
    val dfm = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val qts = dfm.toSeq.sortBy { case (w, n) => (-n, w) }.slice(5, 13).toMap
    val n = docs.length.toLong
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
    val scores = tf.filter(r => qts.contains(r._2))
      .groupBy(_._1).map { case (id, rows) =>
        val dl = toks(id).size
        id -> rows.map { case (_, w, f) =>
          math.log((n - qts(w) + 0.5) / (qts(w) + 0.5) + 1.0) * (f * 2.2) /
            (f + 1.2 * (0.75 * dl / avgdl + 0.25))
        }.sum
      }
    val brute = scores.toSeq
      .map { case (id, s) =>
        (id, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(out.map(_._1).toSeq == brute.map(_._1), "doc ranking diverged")
    out.zip(brute).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6, s"score $a vs brute $b")
    }
  }

  test("phash banded pairs equal brute-force hamming pairs and catch every planted near-dup") {
    val hashes = graft.multimodal.Multimodal.phashes(spark, TestSpark.sf)
      .as[(Long, Long)].collect()
    assert(hashes.length > 500) // originals + planted variants
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val out = SparkEntry.queries("q_mm_phash_pairs")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // banding has GUARANTEED recall at d <= 3 with 8 bands (pigeonhole) and
    // the exact verify kills false candidates, so the sets must be equal
    assert(out == brute, s"banded=${out.size} brute=${brute.size}")
    val variants = hashes.map(_._1).filter(_ >= 1000000L)
    assert(variants.nonEmpty, "planted variant set missing from the asset table")
    variants.foreach { v =>
      assert(out.exists(p => p._1 == v - 1000000L && p._2 == v && p._3 <= 1),
        s"planted near-dup ($v) not found within hamming 1")
    }
  }

  test("audio contour fingerprint: scale-invariant, noise-robust, planted twins at dist 0") {
    import graft.multimodal.{Multimodal, Wav}
    val samples = Array.tabulate(500)(i => (((i.toLong * 7919) % 4001) - 2000).toShort)
    val base = Multimodal.AudioContour.fingerprint(1L,
      Wav.encode(8000, samples)).afp
    // amplitude scaling preserves every energy-difference SIGN → identical fp
    val scaled = Multimodal.AudioContour.fingerprint(2L,
      Wav.encode(8000, samples.map(v => (v * 3).toShort))).afp
    assert(scaled == base, f"scaling changed the contour: $base%x -> $scaled%x")
    // small additive noise flips at most a few borderline bits
    val noisy = Multimodal.AudioContour.fingerprint(3L,
      Wav.encode(8000, samples.zipWithIndex.map { case (v, i) =>
        if (i % 50 == 0) (v + 1).toShort else v })).afp
    assert(java.lang.Long.bitCount(base ^ noisy) <= 3,
      f"noise moved the fp too far: ${java.lang.Long.bitCount(base ^ noisy)} bits")
    // an unrelated clip is far away
    val other = Multimodal.AudioContour.fingerprint(4L,
      Wav.encode(8000, Array.tabulate(500)(i =>
        (((i.toLong * 104729 + 77) % 4001) - 2000).toShort))).afp
    assert(java.lang.Long.bitCount(base ^ other) > 3, "unrelated clips collided")
  }

  test("audio banded pairs equal brute-force hamming pairs; every planted twin found") {
    val fps = graft.multimodal.Multimodal
      .audioFingerprints(graft.multimodal.Multimodal
        .audioFpAssets(spark, TestSpark.sf))
      .select($"asset_id", $"afp").as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val out = SparkEntry.queries("q_mm_audio_pairs")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == brute, s"banded=${out.size} brute=${brute.size}")
    val twins = fps.map(_._1).filter(_ >= 1000000L)
    assert(twins.nonEmpty, "planted amplitude twins missing")
    twins.foreach { t =>
      assert(out.contains((t - 1000000L, t, 0)),
        s"amplitude twin $t not recovered at dist 0")
    }
  }

  test("multimodal PNG round-trip: our encoder -> JDK ImageIO decoder, per-pixel") {
    val decoded = graft.multimodal.Multimodal
      .decodeImages(graft.multimodal.Multimodal.pngAssets(spark, TestSpark.sf))
      .as[graft.multimodal.Multimodal.DecodedImage].collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val id = r.asset_id
      assert(r.width == (8 + id % 9).toInt && r.height == (8 + (id * 7) % 9).toInt)
      val expected = (0 until r.width * r.height)
        .map(i => ((id * 31 + i.toLong * 7) % 251).toInt).mkString(",")
      assert(r.pixel_csv == expected, s"pixel mismatch for asset $id")
    }
  }

  test("multimodal resize: integer box-average thumbnail matches a naive recompute") {
    val thumbs = graft.multimodal.Multimodal
      .resizeImages(graft.multimodal.Multimodal.pngAssets(spark, TestSpark.sf))
      .as[graft.multimodal.Multimodal.Thumb].collect()
    assert(thumbs.nonEmpty)
    thumbs.foreach { t =>
      val id = t.asset_id
      val w = (8 + id % 9).toInt; val h = (8 + (id * 7) % 9).toInt
      val sums = Array.fill(16)(0L); val counts = Array.fill(16)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val cell = (y * 4 / h) * 4 + (x * 4 / w)
        sums(cell) += ((id * 31 + (y * w + x).toLong * 7) % 251)
        counts(cell) += 1
      }
      val expected = (0 until 16).map(i => sums(i) / counts(i)).mkString(",")
      assert(t.out_w == 4 && t.out_h == 4)
      assert(t.thumb_csv == expected, s"thumb mismatch for asset $id")
    }
  }

  test("multimodal WAV round-trip: our encoder -> JDK javax.sound decoder, per-sample") {
    import graft.multimodal.{Multimodal, Wav}
    // hand-made clip through both codecs: exact sample recovery
    val samples = Array.tabulate(777)(i => ((i * 9973) % 65536 - 32768).toShort)
    val d = Multimodal.AudioDecoder.decode(1L, Wav.encode(16000, samples))
    assert(d.sample_rate == 16000 && d.n_samples == 777)
    assert(d.sum_sq == samples.map(v => v.toLong * v).sum)
    assert(d.peak == samples.map(v => math.abs(v.toInt)).max)
    // the fixture clips decode to the generating formula's aggregates
    val decoded = Multimodal.decodeAudio(Multimodal.wavAssets(spark, TestSpark.sf))
      .as[Multimodal.DecodedAudio].collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val n = (400 + r.asset_id % 100).toInt
      assert(r.sample_rate == 8000 && r.n_samples == n, s"asset ${r.asset_id}")
      val vs = (0 until n).map(i => (r.asset_id * 31 + i.toLong * 7919) % 4001 - 2000)
      assert(r.sum_sq == vs.map(v => v * v).sum, s"sample data mismatch for ${r.asset_id}")
    }
  }

  test("video container: index locates frames exactly, sampled decode matches formula") {
    import graft.multimodal.Multimodal
    val frames = (0 until 7).map(f => graft.render.Png.encode(2, 2,
      Array.tabulate(4)(i => (f * 40 + i) * 0x010101)))
    val container = Multimodal.Gfv.encode(frames)
    val idx = Multimodal.Gfv.index(container)
    assert(idx.length == 7)
    idx.zip(frames).foreach { case ((off, len), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(container, off.toInt, off.toInt + len), f))
    }
    val out = Multimodal.decodeVideoFrames(
        Multimodal.videoAssets(spark, TestSpark.sf).limit(20))
      .as[(Long, Int, Int, Int, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, fi, w, h, csv) =>
      assert(fi % 4 == 0 && w == 6 && h == 4, s"asset $id frame $fi")
      val expect = (0 until 24).map(i => (id * 31 + fi * 17 + i.toLong * 7) % 251).mkString(",")
      assert(csv == expect, s"pixel mismatch asset $id frame $fi")
    }
  }

  test("asset ingest spreads synthesis/decode across partitions (not one input split)") {
    import graft.multimodal.Multimodal
    // the fixture parquet is one split; the ingest-time repartition is what
    // gives every downstream mapPartitions decode its parallelism — a
    // regression here would silently serialize all codec work on one core
    for (build <- Seq(Multimodal.pngAssets(spark, TestSpark.sf),
        Multimodal.wavAssets(spark, TestSpark.sf),
        Multimodal.videoAssets(spark, TestSpark.sf)))
      assert(build.rdd.getNumPartitions > 1, "asset build collapsed to one partition")
  }

  test("mixed-media decode: fallback rows stay distinguishable (no empty-raster collision)") {
    import graft.multimodal.Multimodal
    // one real PNG, two DIFFERENT no-codec assets: the fallback must not
    // emit identical output for different payloads (md5 downstream)
    val png = Multimodal.pngAssets(spark, TestSpark.sf).limit(1)
    val fake = Seq(
      (9001L, "first audio payload".getBytes("UTF-8"), "audio/wav"),
      (9002L, "second audio payload".getBytes("UTF-8"), "audio/wav")
    ).toDF("asset_id", "payload", "media_type")
      .select(col("asset_id"), col("payload"),
        struct(col("media_type"), length(col("payload")).as("n_bytes"),
          lit("synthetic").as("origin")).as("meta"))
    val mixed = png.unionByName(fake)
    val out = Multimodal.decodeImages(mixed)
      .as[Multimodal.DecodedImage].collect().sortBy(_.asset_id)
    assert(out.length == 3)
    out.foreach(r => assert(r.pixel_csv.nonEmpty, s"asset ${r.asset_id}: empty output"))
    val Array(_, a1, a2) = out
    assert(a1.pixel_csv != a2.pixel_csv,
      "different fallback payloads produced identical output (md5 collision)")
  }

  test("JPEG decodes through the same real-decoder path (lossy tolerance)") {
    import graft.multimodal.Multimodal
    // encode a JPEG with the JDK (the second-most-common media type in real
    // asset tables); decode through ImageDecoder and bound the lossy error
    val jpegs = Seq(5001L, 5002L).toDF("asset_id")
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16; val h = 12
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // smooth per-id gradient: no hard edges, so the lossy error is the
          // codec's quantization (small), not ringing at a sawtooth wrap
          for (y <- 0 until h; x <- 0 until w) {
            val v = (20 + (id % 3) * 10 + x * 10 + y * 5).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("asset_id", "payload")
      .select(col("asset_id"), col("payload"),
        struct(lit("image/jpeg").as("media_type"),
          length(col("payload")).as("n_bytes"),
          lit("synthetic").as("origin")).as("meta"))
    val out = Multimodal.decodeImages(jpegs)
      .as[Multimodal.DecodedImage].collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.width == 16 && r.height == 12)
      val got = r.pixel_csv.split(",").map(_.toInt)
      val expect = (0 until 16 * 12).map { i =>
        val (x, y) = (i % 16, i / 16)
        (20 + (r.asset_id % 3) * 10 + x * 10 + y * 5).toInt
      }
      assert(got.length == expect.length)
      // JPEG is lossy: bound per-pixel error rather than demanding equality
      got.zip(expect).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 12, s"asset ${r.asset_id} px $i: $g vs $e")
      }
    }
  }

  test("bigram LM scores train-distribution (en) docs better than other languages") {
    val rows = SparkEntry.queries("q_ngram_lm")(spark, TestSpark.sf)
      .select("lang", "lm_score").as[(String, Double)].collect()
    val (en, other) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && other.nonEmpty)
    def mean(xs: Array[(String, Double)]) = xs.map(_._2).sum / xs.length
    assert(mean(en) < mean(other),
      s"en mean ${mean(en)} should beat non-en mean ${mean(other)}")
    rows.foreach { case (l, sc) => assert(sc > 0, s"$l: nll must be positive, got $sc") }
  }

  test("PMI collocations respect min-support and descending-PMI order") {
    val rows = SparkEntry.queries("q_pmi")(spark, TestSpark.sf)
      .select("c12", "pmi").as[(Long, Double)].collect()
    assert(rows.length == 50)
    assert(rows.forall(_._1 >= 5), "min-support gate violated")
    assert(rows.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "not sorted by pmi desc")
  }

  test("pagerank is a probability distribution over event types") {
    val rows = SparkEntry.queries("q_pagerank")(spark, TestSpark.sf)
      .select("event_type", "pagerank").as[(String, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0), "all ranks positive")
    val total = rows.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-3, s"ranks should sum to ~1, got $total")
  }

  test("bfs hops start at the seed and grow by at most one per edge") {
    val rows = SparkEntry.queries("q_bfs_hops")(spark, TestSpark.sf)
      .select("event_type", "hops").as[(String, Long)].collect().toMap
    assert(rows("signup") == 0L)
    assert(rows.values.forall(h => h >= 0 && h <= 4))
  }

  test("cumulative distinct users is monotone and ends at the distinct-user count") {
    val rows = SparkEntry.queries("q_cum_distinct")(spark, TestSpark.sf)
      .select("new_users", "cum_users").as[(Long, Long)].collect()
    assert(rows.scanLeft(0L)(_ + _._1).drop(1).toSeq == rows.map(_._2).toSeq,
      "running total must equal the cumsum of new users")
    val users = Tables.events(spark, TestSpark.sf).select("user_id").distinct().count()
    assert(rows.last._2 == users, "every user is new exactly once")
  }

  test("triangles are canonical (a < b < c) and their edges exist") {
    val tri = SparkEntry.queries("q_triangles")(spark, TestSpark.sf)
      .as[(String, String, String)].collect()
    assert(tri.nonEmpty)
    assert(tri.forall { case (a, b, c) => a < b && b < c })
    val edges = graft.graph.GraphQueries.transitions(spark, TestSpark.sf)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().as[(String, String)].collect().toSet
    tri.foreach { case (a, b, c) =>
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)), s"($a,$b,$c)")
    }
  }

  test("graph local and distributed iteration paths are parity-locked") {
    import graft.graph.GraphQueries
    val pr = GraphQueries.transitions(spark, TestSpark.sf)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val prLocal = GraphQueries.pagerankFromEdges(pr)
      .as[(String, Double)].collect().toSeq
    val prDist = GraphQueries.pagerankFromEdges(pr, localEdgeLimit = 0L)
      .as[(String, Double)].collect().toSeq
    assert(prLocal == prDist, s"pagerank paths diverge: $prLocal vs $prDist")
    val bfs = GraphQueries.transitions(spark, TestSpark.sf).distinct()
    val bLocal = GraphQueries.bfsHopsFromEdges(bfs, "signup")
      .as[(String, Long)].collect().toSeq
    val bDist = GraphQueries.bfsHopsFromEdges(bfs, "signup", localEdgeLimit = 0L)
      .as[(String, Long)].collect().toSeq
    assert(bLocal == bDist, s"bfs paths diverge: $bLocal vs $bDist")
  }

  test("multimodal stub decode is deterministic and shaped") {
    val a = graft.multimodal.Multimodal.assets(spark, TestSpark.sf)
    val d1 = graft.multimodal.Multimodal.decodeFeatures(a)
      .select("asset_id", "width", "height").as[(Long, Int, Int)].collect().sorted
    val d2 = graft.multimodal.Multimodal.decodeFeatures(a)
      .select("asset_id", "width", "height").as[(Long, Int, Int)].collect().sorted
    assert(d1.sameElements(d2))
    assert(d1.forall { case (_, w, h) => w >= 16 && h >= 0 })
  }
}
