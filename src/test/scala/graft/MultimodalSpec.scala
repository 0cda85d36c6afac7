package graft

import graft.engine.{MediaMeta, MediaRecord, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: byte histogram + mean over typed mapPartitions seam") {
    val rec = MediaRecord(7L, "image", "ab\u0000".getBytes("UTF-8"),
      MediaMeta("png", 320, 180, 0L))
    val out = Multimodal.decodeStub(Seq(rec).toDS()).collect()(0)
    assert(out.doc_id == 7L)
    assert(out.n_bytes == 3L)
    // 'a'=0x61, 'b'=0x62 → bin 6 twice; 0x00 → bin 0 once
    assert(out.histogram(6) == 2L && out.histogram(0) == 1L)
    assert(out.histogram.sum == 3L)
    assert(math.abs(out.byte_mean - (0x61 + 0x62 + 0) / 3.0) < 1e-12)
  }

  test("media synthesis: deterministic types, payload = utf-8 text bytes") {
    val m = Multimodal.mediaFromDocuments(spark, sf0001)
      .select("doc_id", "media_type", "meta.format").limit(6)
      .as[(Long, String, String)].collect()
    m.foreach { case (id, mt, fmt) =>
      val expected = Seq("image", "audio", "video")((id % 3).toInt)
      assert(mt == expected)
      assert(fmt == Map("image" -> "png", "audio" -> "wav",
        "video" -> "mp4")(mt))
    }
  }

  test("frame sampling windows are within payload bounds") {
    val f = Multimodal.qMediaFrames(spark, sf0001).limit(20)
      .as[(Long, String, String, String)].collect()
    f.foreach { case (_, first, mid, last) =>
      assert(first.length <= 16 && mid.length <= 16 && last.length <= 16)
      assert(first.length % 2 == 0)
    }
  }

  test("real PNG decode: round-trip is lossless, dims from the codec") {
    // encode arbitrary bytes → REAL PNG → decode: dimensions come from
    // the decoded image header, pixel sum from its raster
    val bytes = (0 until 37).map(i => ((i * 7) % 256).toByte).toArray
    val png = Multimodal.pngFromBytes(bytes, width = 16)
    // a real PNG: magic bytes, not our input
    assert(png.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val d = Multimodal.decodePng(5L, png).get
    assert(d.width == 16 && d.height == 3) // ceil(37/16) = 3 rows
    assert(d.n_pixels == 48L)
    assert(d.pixel_sum == bytes.map(_ & 0xFF).sum.toLong) // zero pad adds 0
    // empty payload → 16×1 all-zero image, still decodable
    val e = Multimodal.decodePng(6L,
      Multimodal.pngFromBytes(Array.empty, width = 16)).get
    assert(e.width == 16 && e.height == 1 && e.pixel_sum == 0L)
    // undecodable bytes → None (drop-malformed), never a throw
    assert(Multimodal.decodePng(7L, Array[Byte](1, 2, 3)).isEmpty)
    // recognized-but-corrupt: real PNG magic, truncated body — the
    // reader THROWS rather than returning null; still None
    val truncated = Multimodal.pngFromBytes(bytes, width = 16).take(20)
    assert(Multimodal.decodePng(8L, truncated).isEmpty)
  }

  test("real PNG files through the binaryFile source decode with true dims") {
    val dir = tmpDir("png")
    val payloads = Map(
      "x.png" -> (0 until 40).map(_.toByte).toArray,
      "y.png" -> Array[Byte](9, 8, 7))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        Multimodal.pngFromBytes(bytes, width = 16))
    }
    val decoded = Multimodal.readBinaryDir(spark, dir, glob = "*.png")
      .select(col("path"), col("payload")).as[(String, Array[Byte])]
      .collect()
      .map { case (p, png) =>
        new java.io.File(p.stripPrefix("file:")).getName ->
          Multimodal.decodePng(0L, png).get
      }.toMap
    assert(decoded("x.png").width == 16 && decoded("x.png").height == 3)
    assert(decoded("x.png").pixel_sum == (0 until 40).sum.toLong)
    assert(decoded("y.png").height == 1 &&
      decoded("y.png").pixel_sum == 24L)
  }

  test("real AVI files through the binaryFile source decode frame stats") {
    // the media-lake path end-to-end: .avi files on disk → binaryFile
    // rows → RIFF walk + per-frame PNG decode
    val dir = tmpDir("avi")
    val payloads = Map(
      "a.avi" -> (0 until 150).map(_.toByte).toArray, // 3 frames
      "b.avi" -> Array[Byte](1, 2, 3))                // 1 short frame
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        Multimodal.videoFromBytes(bytes))
    }
    val rows = Multimodal.readBinaryDir(spark, dir, glob = "*.avi")
    assert(rows.select("media_type").as[String].collect()
      .forall(_ == "video"))
    val decoded = rows
      .select(col("path"), col("payload")).as[(String, Array[Byte])]
      .collect()
      .map { case (p, avi) =>
        new java.io.File(p.stripPrefix("file:")).getName ->
          Multimodal.decodeVideo(0L, avi).get
      }.toMap
    assert(decoded("a.avi").n_frames == 3L)
    assert(decoded("a.avi").pixel_sum == (0 until 150).sum.toLong)
    assert(decoded("b.avi").n_frames == 1L
      && decoded("b.avi").n_pixels == 16L
      && decoded("b.avi").pixel_sum == 6L)
  }

  test("real WAV decode: PCM round-trip is lossless, header drives the stats") {
    val bytes = (0 until 123).map(i => ((i * 13) % 256).toByte).toArray
    val wav = Multimodal.wavFromBytes(bytes)
    // a real RIFF/WAVE container, not our input
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val d = Multimodal.decodeWav(3L, wav).get
    assert(d.n_frames == 123L && d.sample_rate == 8000)
    assert(d.sample_sum == bytes.map(_ & 0xFF).sum.toLong)
    // empty payload → zero frames, still a decodable container
    val e = Multimodal.decodeWav(4L,
      Multimodal.wavFromBytes(Array.empty)).get
    assert(e.n_frames == 0L && e.sample_sum == 0L && e.mean_sample == 0.0)
    // undecodable bytes → None (drop-malformed), never a throw
    assert(Multimodal.decodeWav(5L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("real video decode: per-frame PNG round-trip, container geometry") {
    // 150 bytes → 3 frames (64+64+22); per-frame gray PNG is lossless
    // so pixel_sum ≡ byte sum; last frame zero-pads 22 bytes to 2 rows
    val bytes = Array.tabulate(150)(i => (i % 251).toByte)
    val avi = Multimodal.videoFromBytes(bytes)
    // the container is a genuine RIFF-AVI file: RIFF magic, 'AVI '
    // form type, and the declared size spanning exactly the payload
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val v = Multimodal.decodeVideo(1L, avi).get
    assert(v.n_frames == 3L)
    assert(v.pixel_sum == bytes.map(_ & 0xFF).map(_.toLong).sum)
    assert(v.n_pixels == 64 + 64 + 32) // 16×4, 16×4, 16×2
    assert(v.mean_px == v.pixel_sum.toDouble / v.n_pixels)
    // exact multiple: no short frame
    val full = Multimodal.decodeVideo(2L,
      Multimodal.videoFromBytes(Array.fill(128)(7.toByte))).get
    assert(full.n_frames == 2L && full.n_pixels == 128)
    // empty payload → one blank 16×1 frame (decodable, not None)
    val e = Multimodal.decodeVideo(3L,
      Multimodal.videoFromBytes(Array.empty)).get
    assert(e.n_frames == 1L && e.n_pixels == 16L
      && e.pixel_sum == 0L && e.mean_px == 0.0)
    // malformed containers → None (drop-malformed), never a throw:
    // garbage bytes, truncated length prefix, truncated frame body
    assert(Multimodal.decodeVideo(4L, Array[Byte](9, 9, 9)).isEmpty)
    val ok = Multimodal.videoFromBytes(Array.fill(10)(1.toByte))
    assert(Multimodal.decodeVideo(5L, ok.dropRight(1)).isEmpty)
    assert(Multimodal.decodeVideo(6L, ok ++ Array[Byte](0, 0)).isEmpty)
    // declared chunk sizes near Int.MaxValue: the bound check must run
    // in Long (off + 8 + size would wrap negative in Int and pass the
    // guard, then index the array at a negative offset) → None
    def patchLe32(a: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val b = a.clone()
      b(off) = (v & 0xFF).toByte
      b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte
      b(off + 3) = ((v >> 24) & 0xFF).toByte
      b
    }
    // top-level: the hdrl LIST header sits at offset 12, size at 16
    assert(new String(ok.slice(12, 16), "US-ASCII") == "LIST")
    assert(Multimodal.decodeVideo(7L,
      patchLe32(ok, 16, Int.MaxValue - 7)).isEmpty)
    // frame-level: first 00dc chunk inside movi, size right after it
    val dc = ok.indices.find(i => i + 4 <= ok.length &&
      new String(ok.slice(i, i + 4), "US-ASCII") == "00dc").get
    assert(Multimodal.decodeVideo(8L,
      patchLe32(ok, dc + 4, Int.MaxValue - 7)).isEmpty)
  }

  test("real video decode: MJPG (JPEG-frame) variant decodes end-to-end") {
    // the standard-codec AVI next to the oracle-checked MPNG twin:
    // same container walk, JPEG frames — ImageIO sniffs frame content
    // so decodeVideo needs no codec switch. JPEG is LOSSY, so the
    // geometry checks stay exact while pixel stats get an error bound
    // instead of equality.
    val bytes = Array.tabulate(150)(i => (i % 251).toByte)
    val avi = Multimodal.videoFromBytes(bytes, codec = "MJPG")
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    // the stream header + BITMAPINFOHEADER both carry the MJPG fourcc
    assert(new String(avi, "ISO-8859-1").contains("MJPG"))
    assert(!new String(avi, "ISO-8859-1").contains("MPNG"))
    val v = Multimodal.decodeVideo(10L, avi).get
    assert(v.n_frames == 3L)
    assert(v.n_pixels == 64 + 64 + 32) // 16×4, 16×4, 16×2 — exact
    val trueMean = bytes.map(_ & 0xFF).map(_.toLong).sum
      .toDouble / v.n_pixels
    assert(math.abs(v.mean_px - trueMean) < 16.0,
      s"JPEG mean drifted: ${v.mean_px} vs $trueMean")
    // container strictness is codec-independent: truncation → None
    assert(Multimodal.decodeVideo(11L, avi.dropRight(1)).isEmpty)
    // unsupported codec fourccs are rejected at ENCODE time
    intercept[IllegalArgumentException] {
      Multimodal.videoFromBytes(bytes, codec = "H264")
    }
  }

  test("binaryFile source: one row per file, typed media, exact bytes") {
    val dir = tmpDir("media")
    val payloads = Map(
      "a.png" -> Array[Byte](1, 2, 3),
      "b.wav" -> Array[Byte](4, 5),
      "c.mp4" -> Array[Byte](6),
      "d.txt" -> Array[Byte](7, 8))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), bytes)
    }
    val rows = Multimodal.readBinaryDir(spark, dir)
      .select("path", "length", "media_type", "payload")
      .collect()
      .map(r => (new java.io.File(r.getString(0).stripPrefix("file:")).getName,
        (r.getLong(1), r.getString(2), r.getAs[Array[Byte]](3).toSeq)))
      .toMap
    assert(rows.keySet == payloads.keySet)
    assert(rows("a.png") == ((3L, "image", Seq[Byte](1, 2, 3))))
    assert(rows("b.wav") == ((2L, "audio", Seq[Byte](4, 5))))
    assert(rows("c.mp4") == ((1L, "video", Seq[Byte](6))))
    assert(rows("d.txt")._2 == "other")
    // the decode stub composes with the real source
    import spark.implicits._
    val feats = Multimodal.decodeStub(
      Multimodal.readBinaryDir(spark, dir, glob = "*.png")
        .select(lit(0L).as("doc_id"), col("media_type"), col("payload"),
          typedLit(MediaMeta("png", 1, 1, 0L)).as("meta"))
        .as[MediaRecord]).collect()
    assert(feats.length == 1 && feats(0).n_bytes == 3 && feats(0).byte_sum == 6)
  }

  test("aHash: invariances on crafted rasters") {
    // identical rasters → identical chunks
    val a = Array.tabulate(16 * 32)(i => (i * 37) % 251)
    assert(Multimodal.ahashChunks(a, 16, 32).toSeq ==
      Multimodal.ahashChunks(a.clone(), 16, 32).toSeq)
    // a one-pixel nudge flips at most its own cell's bit
    val b = a.clone(); b(0) = 255
    val d = Multimodal.ahashChunks(a, 16, 32)
      .zip(Multimodal.ahashChunks(b, 16, 32))
      .map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(d <= 1, s"one-pixel edit flipped $d bits")
    // a global brightness SHIFT preserves every bit (mean comparison
    // is translation-covariant on means, and cross-multiplied
    // integer compare keeps the strictness): +10 on every pixel
    val c = a.map(_ + 10)
    assert(Multimodal.ahashChunks(a, 16, 32).toSeq ==
      Multimodal.ahashChunks(c, 16, 32).toSeq)
    // constant raster → all bits 0 (no cell strictly above the mean)
    assert(Multimodal.ahashChunks(Array.fill(16 * 8)(7), 16, 8).toSeq ==
      Seq(0, 0, 0, 0))
  }

  test("audio fingerprint: codec-free recompute; gain invariance") {
    import spark.implicits._
    // envelope hash recomputed straight from the text bytes (PCM is
    // lossless and unpadded: samples == payload)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._1 % 3 == 1).sortBy(_._1)
    val expect = docs.map { case (id, text) =>
      id -> Multimodal.afpChunks(
        text.getBytes("UTF-8").map(_ & 0xFF)).toSeq
    }.toSeq
    val got = Multimodal.qMediaAfp(spark, sf0001)
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5))
    assert(got == expect)
    // doubling every sample preserves every bit (the mean comparison
    // is scale-covariant) — the gain-invariance an audio dedup wants
    val s = Array.tabulate(400)(i => (i * 13) % 97)
    assert(Multimodal.afpChunks(s).toSeq ==
      Multimodal.afpChunks(s.map(_ * 2)).toSeq)
    // constant signal → all bits 0
    assert(Multimodal.afpChunks(Array.fill(100)(42)).toSeq ==
      Seq(0, 0, 0, 0))
  }

  test("phash queries: equal to a codec-free driver recompute from the payload bytes") {
    import spark.implicits._
    // recompute hashes straight from the TEXT BYTES (zero-padded
    // 16-wide raster) — no ImageIO in the loop, so a codec change
    // that stops being lossless breaks this, not just the oracle
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._1 % 3 == 0).sortBy(_._1)
    val expectHash = docs.map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 15) / 16)
      val px = Array.tabulate(16 * h)(i =>
        if (i < bytes.length) bytes(i) & 0xFF else 0)
      id -> Multimodal.ahashChunks(px, 16, h).toSeq
    }
    val gotHash = Multimodal.qMediaPhash(spark, sf0001)
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5))
    assert(gotHash == expectHash.toSeq)
    // pairs = ALL image pairs within hamming <= 3, from the recompute
    val hm = expectHash.toMap
    val ids = expectHash.map(_._1)
    val expectPairs = (for {
      i <- ids; j <- ids if i < j
      d = hm(i).zip(hm(j)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (i, j, d.toLong)).toSeq.sorted
    val gotPairs = Multimodal.qMediaPhashPairs(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(gotPairs == expectPairs)
  }
}
