package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Multimodal binary-column operators on the sf0.001 fixture plus a
  * controlled payload.
  */
class MultimodalSpec extends SparkSpec {

  test("media view: binary payload with consistent typed metadata") {
    val m = MultimodalOps.mediaMetadata(spark, sfDir)
    assert(m.count() > 0)
    // n_frames = ceil(n_bytes / FrameBytes) for every row
    val bad = m.where(col("n_frames") =!=
      ceil(col("n_bytes") / MultimodalOps.FrameBytes).cast("long"))
    assert(bad.count() === 0)
    val types = m.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("frame sampling takes every 2nd frame with stable digests") {
    val f = MultimodalOps.mediaFrames(spark, sfDir)
    assert(f.where(col("frame_idx") % 2 =!= 0).count() === 0)
    val meta = MultimodalOps.mediaMetadata(spark, sfDir)
      .select(col("media_id"), col("n_frames"))
    val counts = f.groupBy("media_id").count().join(meta, Seq("media_id"))
    // sampled count = ceil(n_frames / 2)
    assert(counts.where(col("count") =!=
      ceil(col("n_frames") / 2).cast("long")).count() === 0)
  }

  test("PPM decode: parsed dims and byte-sum brightness match driver recompute") {
    val decoded = MultimodalOps.mediaDecode(spark, sfDir).collect()
      .map(d => d.media_id -> d).toMap
    val raw = MultimodalOps.mediaPpm(spark, sfDir)
      .select(col("media_id"), col("payload")).collect()
    assert(raw.nonEmpty && decoded.size === raw.length)
    raw.foreach { r =>
      val id = r.getLong(0)
      val d = decoded(id)
      // dims come out of the HEADER BYTES (mediaPpm's construction),
      // deliberately different from media()'s metadata columns
      assert(d.dec_width === (8 + id % 16).toInt && d.dec_height === (8 + id % 12).toInt)
      assert(d.dec_maxval === 255)
      assert(d.n_pixel_bytes === d.dec_width.toLong * d.dec_height * 3)
      val raster = r.getAs[Array[Byte]](1).takeRight(d.n_pixel_bytes.toInt)
      assert(d.brightness === raster.foldLeft(0L)((a, x) => a + (x & 0xff)))
    }
  }

  test("PpmDecoder: comment/whitespace-tolerant header; rejects non-P6") {
    val pix = Array.tabulate(2 * 2 * 3)(i => (i * 7 % 251).toByte)
    val header = "P6\n# c1\n  # c2\n 2\t2\n# before maxval\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val d = MultimodalOps.PpmDecoder.decode(
      MultimodalOps.MediaRow(7L, header ++ pix))
    assert(d.dec_width === 2 && d.dec_height === 2 && d.dec_maxval === 255)
    assert(d.n_pixel_bytes === 12L)
    assert(d.brightness === pix.foldLeft(0L)((a, x) => a + (x & 0xff)))
    intercept[IllegalArgumentException] {
      MultimodalOps.PpmDecoder.decode(MultimodalOps.MediaRow(8L,
        "P5\n2 2\n255\n............".getBytes(
          java.nio.charset.StandardCharsets.US_ASCII)))
    }
    // maxval > 255 switches to 2-byte big-endian samples (netpbm spec)
    val wide = Array[Byte](0x01, 0x00, 0x00, 0x02, 0x00, 0x03) // 256, 2, 3
    val d16 = MultimodalOps.PpmDecoder.decode(MultimodalOps.MediaRow(9L,
      "P6\n1 1\n65535\n".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII) ++ wide))
    assert(d16.dec_maxval === 65535 && d16.n_pixel_bytes === 6L)
    assert(d16.brightness === 261L)
  }

  test("resize halves metadata and keeps exactly the leading half payload") {
    val r = MultimodalOps.mediaResize(spark, sfDir)
    val m = MultimodalOps.mediaMetadata(spark, sfDir)
      .select(col("media_id"), col("n_bytes").as("full_bytes"),
        col("width").as("w0"), col("height").as("h0"))
    val j = r.join(m, Seq("media_id"))
    assert(j.where(col("n_bytes") =!= floor(col("full_bytes") / 2).cast("long"))
      .count() === 0)
    assert(j.where(col("width") =!= floor(col("w0") / 2).cast("int")).count() === 0)
  }

  test("features: one row per media, mean within [0, 256)") {
    val f = MultimodalOps.mediaFeatures(spark, sfDir)
    assert(f.count() === MultimodalOps.media(spark, sfDir).count())
    assert(f.where(col("mean_feature") < 0 || col("mean_feature") >= 256)
      .count() === 0)
  }

  test("media dedup: exact groups identical payloads; near finds frame-sharing variants") {
    val s = spark; import s.implicits._
    // 8 DISTINCT aligned frames (16 chars each): a shared-frame pair's
    // agreement estimate then reflects the 8/9 digest-set Jaccard, not
    // a coin flip between two digests' rotations
    val base = (0 until 8).map(i => s"frame_${i}AB_chunk!").mkString
    val dir = tempTableDir("documents", Seq(
      (0L, base, "en", "spec", base.length.toLong),
      (1L, base, "en", "spec", base.length.toLong),          // exact copy
      (2L, base + "TRAILING EXTRA!!", "en", "spec", 0L),      // shares 8 of 9 frames
      (3L, "zz" * 64, "en", "spec", 128L))                    // unrelated
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val exact = MultimodalOps.mediaDedupExact(spark, dir)
      .where(col("n_copies") > 1).collect()
    assert(exact.length === 1)
    assert(exact.head.getAs[Long]("canonical_media_id") === 0L)
    assert(exact.head.getAs[Long]("n_copies") === 2L)
    val near = MultimodalOps.mediaDedupNear(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical payloads: full signature agreement
    assert(near((0L, 1L)) === 1.0)
    // the trailing-extra variant shares every aligned frame: its
    // signature agrees wherever the extra frame's digests don't win a
    // min — candidate found, estimate high, never 1.0-by-accident
    assert(near.contains((0L, 2L)) && near((0L, 2L)) >= 5.0 / 9)
    // the unrelated payload pairs with nothing
    assert(!near.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("media_semdedup: a chain only the UNION of signals catches collapses to one cluster") {
    val s = spark; import s.implicits._
    val base = (0 until 8).map(i => s"frame_${i}AB_chunk!").mkString
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    Seq(
      // 0 ↔ 2 share payload frames (re-encode); 0 ↔ 1 share ONLY the
      // caption embedding (same scene, new pixels); 3 is unrelated
      (0L, base, "en", "spec", base.length.toLong),
      (1L, "wholly different caption words about the very same scene !!!",
        "en", "spec", 0L),
      (2L, base + "TRAILING EXTRA!!", "en", "spec", 0L),
      (3L, "zz" * 64, "en", "spec", 128L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == i) 1.0f else 0.0f)
    Seq((0L, vec(0), 1), (1L, vec(0), 2), (2L, vec(5), 3), (3L, vec(9), 4))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = MultimodalOps.mediaSemdedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))).toMap
    // 1 and 2 share NO signal directly — only the cross-modal union
    // (1 ~sem~ 0 ~payload~ 2) puts them in one curation cluster
    assert(got(0L) === ((0L, true, true, true)), s"doc 0: ${got(0L)}")
    assert(got(1L) === ((0L, false, true, false)), s"doc 1: ${got(1L)}")
    assert(got(2L) === ((0L, true, false, false)), s"doc 2: ${got(2L)}")
    assert(got(3L) === ((3L, false, false, true)), s"doc 3: ${got(3L)}")
  }

  test("media_ahash: frame-ordered above-mean bits replay exactly") {
    def md5hex(b: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(b).map("%02x".format(_)).mkString
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(50)
    val got = MultimodalOps.mediaAhash(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    val fb = MultimodalOps.FrameBytes
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nFrames = math.ceil(bytes.length.toDouble / fb).toInt
      val fs = (0 until nFrames).map { i =>
        val slice = bytes.slice(i * fb, math.min((i + 1) * fb, bytes.length))
        java.lang.Long.parseLong(md5hex(slice).take(8), 16) % 256
      }
      val sum = fs.sum
      val bits = fs.map(f => if (f * nFrames > sum) '1' else '0').mkString
      val (gn, gOnes, gHash, gMd5) = got(id)
      assert(gn === nFrames.toLong, s"media $id n_frames")
      assert(gHash === bits, s"media $id ahash")
      assert(gOnes === bits.count(_ == '1').toLong, s"media $id n_ones")
      assert(gMd5 === md5hex(bits.getBytes("UTF-8")), s"media $id md5")
    }
  }
}
