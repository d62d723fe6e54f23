package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Multimodal

/** The multimodal plumbing contract: schema, determinism, batch shape,
  * and partition preservation (the decode stage must be a narrow map —
  * no shuffle between scan and features).
  */
class MultimodalSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (0L, "a tiny document"),
    (1L, "another somewhat longer document body"),
    (2L, "third record"),
    (3L, "a tiny document")
  ).toDF("doc_id", "text")

  test("attachBinary: stable schema and 32-byte payloads") {
    val mm = Multimodal.attachBinary(docs, "text", "doc_id")
    assert(mm.columns.toSeq == Seq("doc_id", "mime", "width", "height", "payload"))
    assert(mm.schema("payload").dataType.typeName == "binary")
    val lens = mm.select("payload").as[Array[Byte]].collect().map(_.length).toSet
    assert(lens == Set(32))
  }

  test("metadata mimes cycle deterministically by id") {
    val m = Multimodal.metadata(docs, "text", "doc_id")
      .select("doc_id", "mime").as[(Long, String)].collect().toMap
    assert(m(0L) == "image/png" && m(1L) == "audio/wav" && m(2L) == "video/mp4" && m(3L) == "image/png")
  }

  test("feature extraction: fixed-length L1-normalized vectors, deterministic across runs") {
    val mm = Multimodal.attachBinary(docs, "text", "doc_id")
    val f1 = Multimodal.extractFeatures(mm).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(mm, batchSize = 2).collect().sortBy(_.doc_id)
    assert(f1.length == 4)
    for ((a, b) <- f1.zip(f2)) {
      assert(a.features.length == 8)
      assert(math.abs(a.features.sum - 1.0f) < 1e-5) // L1-normalized histogram
      assert(a.features.sameElements(b.features)) // batch size never changes results
      assert(a.n_bytes == 32)
    }
    // identical payloads → identical features (ids 0 and 3 share text)
    assert(f1(0).features.sameElements(f1(3).features))
  }

  test("resize stub: metadata updated, payload scaled by area ratio, deterministic") {
    val mm = Multimodal.attachBinary(docs, "text", "doc_id")
    val a = Multimodal.resizeStub(mm, 16, 16).collect().sortBy(_.doc_id)
    val b = Multimodal.resizeStub(mm, 16, 16).collect().sortBy(_.doc_id)
    for ((r1, r2) <- a.zip(b)) {
      assert(r1.width == 16 && r1.height == 16)
      assert(r1.payload.sameElements(r2.payload))
      assert(r1.payload.nonEmpty)
    }
  }

  test("frame sampling explodes each record into n deterministic frames") {
    val mm = Multimodal.attachBinary(docs, "text", "doc_id")
    val frames = Multimodal.frameSample(mm, 4).collect()
    assert(frames.length == 4 * 4) // 4 docs x 4 frames
    assert(frames.map(f => (f.doc_id, f.frame_idx)).distinct.length == 16)
    assert(frames.forall(_.payload.length == 8)) // 32 bytes / 4 frames
  }

  test("real PNG round trip: ImageIO decode recovers the exact pixel histogram") {
    // encodeGrayPng pixels follow g(x,y) = (id·31 + x·7 + y·13) mod 256;
    // PNG is lossless, so the decoded histogram must equal the one
    // computed from the formula directly — no tolerance.
    for (id <- Seq(0L, 7L, 123456789L)) {
      val png = Multimodal.encodeGrayPng(id)
      assert(png.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G'))) // real PNG magic
      val expected = new Array[Float](8)
      for (y <- 0 until 8; x <- 0 until 8)
        expected(java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt >>> 5) += 1f / 64f
      assert(Multimodal.decodeImage(png).sameElements(expected))
    }
  }

  test("decodeImage falls back to the stub on non-image bytes") {
    val junk = Array.tabulate[Byte](32)(_.toByte)
    assert(Multimodal.decodeImage(junk).sameElements(Multimodal.stubDecode(junk)))
  }

  test("real WAV round trip: javax.sound decode recovers the exact sample histogram") {
    // encodePcmWav samples follow s(i) = (id·31 + i·7) mod 256; PCM is
    // lossless, so the decoded amplitude histogram must equal the one
    // computed from the formula directly — no tolerance.
    for (id <- Seq(0L, 7L, 123456789L)) {
      val wav = Multimodal.encodePcmWav(id)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF") // real WAV container
      val expected = new Array[Float](8)
      for (i <- 0 until 64)
        expected(java.lang.Math.floorMod(id * 31 + i * 7, 256L).toInt >>> 5) += 1f / 64f
      assert(Multimodal.decodeAudio(wav).sameElements(expected))
    }
  }

  test("decodeAudio falls back to the stub on non-audio bytes") {
    val junk = Array.tabulate[Byte](32)(_.toByte)
    assert(Multimodal.decodeAudio(junk).sameElements(Multimodal.stubDecode(junk)))
  }

  test("decoders survive adversarially malformed containers (bogus chunk sizes)") {
    // valid magic, corrupted length fields: these reach deeper into the
    // JDK header parsers than plain junk and can throw unchecked
    // exceptions — the NonFatal catch must still fall back to the stub
    val wav = Multimodal.encodePcmWav(7L)
    for (off <- Seq(4, 16, 40); b <- Seq(0xff.toByte, 0x80.toByte)) {
      val bad = wav.clone(); bad(off) = b; bad(off + 1) = b; bad(off + 2) = b; bad(off + 3) = b
      val out = Multimodal.decodeAudio(bad) // must not throw
      assert(out.length == 8)
    }
    val png = Multimodal.encodeGrayPng(7L)
    for (off <- Seq(8, 16, 20)) {
      val bad = png.clone(); bad(off) = 0xff.toByte; bad(off + 1) = 0xff.toByte
      val out = Multimodal.decodeImage(bad) // must not throw
      assert(out.length == 8)
    }
  }

  test("attachAudio + real decode: end-to-end features over a corpus") {
    val feats = Multimodal
      .extractFeatures(Multimodal.attachAudio(docs, "doc_id").toDF(), decode = Multimodal.decodeAudio)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 4)
    for (f <- feats) {
      assert(f.mime == "audio/wav")
      assert(f.features.length == 8 && math.abs(f.features.sum - 1.0f) < 1e-6)
      assert(f.n_bytes > 64) // a real WAV container, not the raw samples
    }
    assert(feats.map(_.features.toSeq).distinct.length == 4)
  }

  test("attachImage + real decode: end-to-end features over a corpus") {
    val feats = Multimodal
      .extractFeatures(Multimodal.attachImage(docs, "doc_id").toDF(), decode = Multimodal.decodeImage)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 4)
    for (f <- feats) {
      assert(f.mime == "image/png")
      assert(f.features.length == 8 && math.abs(f.features.sum - 1.0f) < 1e-6)
      assert(f.n_bytes > 8) // a real encoded PNG, not the raw raster
    }
    // distinct ids → distinct pixel formulas → (generically) distinct features
    assert(feats.map(_.features.toSeq).distinct.length == 4)
  }

  test("decode stage is a narrow map: partitioning preserved, no shuffle") {
    val mm = Multimodal.attachBinary(docs.repartition(3), "text", "doc_id")
    val feats = Multimodal.extractFeatures(mm)
    assert(feats.rdd.getNumPartitions == 3)
    // the ONLY exchange is the explicit repartition(3) below the decode:
    // nothing shuffles between the payload projection and mapPartitions
    val plan = feats.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("RoundRobinPartitioning"), plan)
  }
}
