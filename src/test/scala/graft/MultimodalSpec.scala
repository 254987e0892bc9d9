package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.operators.{MediaAsset, Multimodal}

/** The decode step is stubbed (no codecs in the container) — these tests
  * pin down the REAL parts: binary columns, typed metadata, partition-
  * batched extraction, frame slicing. */
class MultimodalSpec extends SparkSpec {

  test("assets keep payloads as opaque binary with typed metadata") {
    val ds = Multimodal.assets(spark, sf1)
    assert(ds.schema("payload").dataType === BinaryType)
    assert(ds.count() === 500L)
    val kinds = ds.select("kind").distinct().collect().map(_.getString(0))
    assert(kinds.toSet === Set("image", "audio", "video"))
  }

  test("extractFeatures runs partition-batched and is deterministic") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(spark, sf1))
    assert(f1.count() === 500L)
    val row = f1.filter(col("asset_id") === 0L).head()
    assert(row.histogram.length === 16)
    assert(math.abs(row.histogram.sum - 1.0f) < 1e-3f,
      "histogram is normalized")
    // deterministic across runs
    val row2 = Multimodal.extractFeatures(Multimodal.assets(spark, sf1))
      .filter(col("asset_id") === 0L).head()
    assert(row.histogram.toSeq === row2.histogram.toSeq)
  }

  test("fakeDecode histogram counts every byte exactly once") {
    val payload = "abcd".getBytes("UTF-8")
    val h = Multimodal.fakeDecode(payload)
    assert(math.abs(h.sum - 1.0f) < 1e-6f)
    // 'a'..'d' = 0x61..0x64, all in bin 6
    assert(h(6) === 1.0f)
  }

  test("sampleFrames yields n fixed-width binary slices") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assets(spark, sf1), n = 4, frameBytes = 8)
    val row = frames.filter(col("asset_id") === 1L).head()
    val fs = row.getSeq[Array[Byte]](1)
    assert(fs.length === 4)
    assert(fs.forall(f => f.length <= 8))
  }

  test("resize bounds payloads and scales metadata deterministically") {
    val resized = Multimodal.resize(Multimodal.assets(spark, sf1), 64)
    import spark.implicits._
    val over = resized.filter(_.payload.length > 64).count()
    assert(over === 0L)
    val a1 = resized.filter(_.asset_id == 3L).head()
    val a2 = Multimodal.resize(Multimodal.assets(spark, sf1), 64)
      .filter(_.asset_id == 3L).head()
    assert(a1.payload.toSeq === a2.payload.toSeq)
    assert(a1.width <= 640 && a1.height <= 480)
  }

  test("q216 CDC chunks tile every payload exactly") {
    val res = Multimodal.q216CdcChunkDedup(spark, sf1).collect()
    assert(res.length === 500)
    val byteTotals = Multimodal.assets(spark, sf1).toDF()
      .select(col("asset_id"), octet_length(col("payload")).cast("long")
        .as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach { r =>
      assert(r.getAs[Long]("n_bytes") === byteTotals(r.getAs[Long]("asset_id")),
        s"chunks must tile asset ${r.getAs[Long]("asset_id")}")
      assert(r.getAs[Long]("shared_bytes") <= r.getAs[Long]("n_bytes"))
    }
    // non-vacuous: the corpus has real cross-asset shared substreams
    assert(res.map(_.getAs[Long]("n_shared_chunks")).sum > 0L)
  }

  test("CDC boundaries re-synchronize after an insertion (the property " +
    "fixed-offset blocking lacks)") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight again ") * 8
    def asset(id: Long, text: String) = MediaAsset(
      id, "image", text.getBytes("UTF-8"), 1, 1, 16000)
    val ds = Seq(asset(0L, base), asset(1L, "XYZQ" + base)).toDS()
    val chunks = Multimodal.cdcChunks(ds).collect()
    val h0 = chunks.filter(_.asset_id == 0L).map(_.chash).toSet
    val h1 = chunks.filter(_.asset_id == 1L).map(_.chash).toSet
    // after the first boundary past the insertion, every window — and so
    // every later cut — is identical: the chunk sets must overlap on far
    // more than they differ
    val common = (h0 & h1).size
    assert(common * 2 > h0.size,
      s"insertion destroyed chunk identity: ${common}/${h0.size} shared")
  }

  test("q220 equalization matches a hand-computed model and only merges bins") {
    // independent mini-model: payload "aabbbbcc" (n=8)
    //   hist a=2 b=4 c=2; cdf a=2 b=6 c=8; cdfmin=2; denom=6
    //   a -> 1 + (2-2)*126/6 = 1; b -> 1 + 4*126/6 = 85; c -> 1 + 6*126/6 = 127
    import spark.implicits._
    val ds = Seq(MediaAsset(0L, "image",
      "aabbbbcc".getBytes("UTF-8"), 1, 1, 16000)).toDS()
    val dir = java.nio.file.Files.createTempDirectory("histeq")
    ds.toDF().select(col("asset_id").as("doc_id"),
        decode(col("payload"), "UTF-8").as("text"),
        lit("en").as("lang"), lit("s").as("source"),
        lit(8L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = Multimodal.q220HistEqualize(spark, dir.toString).head()
    val expected = Array[Byte](1, 1, 85, 85, 85, 85, 127, 127)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expMd5 = md.digest(expected).map("%02x".format(_)).mkString
    assert(row.getAs[String]("eq_md5") === expMd5)
    assert(row.getAs[Long]("distinct_in") === 3L)
    assert(row.getAs[Long]("distinct_out") === 3L)
    // corpus-wide: equalization merges bins, never splits them
    Multimodal.q220HistEqualize(spark, sf1).collect().foreach { r =>
      assert(r.getAs[Long]("distinct_out") <= r.getAs[Long]("distinct_in"))
      assert(r.getAs[Long]("distinct_out") <= 127L)
    }
  }

  test("metadata projection (q38) never decodes: no mapPartitions in plan") {
    val plan = Multimodal.q38MultimodalMeta(spark, sf1)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("MapPartitions"), plan.take(1000))
  }

  test("q231 guarantees every planted one-byte perturbation pair: " +
    "candidate generated and within radius") {
    val pairs = Multimodal.q231PayloadPhash(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ids = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    for (id <- ids) {
      val h = pairs.get((id, id + Multimodal.PhashOffset))
      assert(h.isDefined, s"planted pair for asset $id missed")
      // a single byte change flips at most its two adjacent comparisons
      assert(h.get <= 2L, s"asset $id planted hamming ${h.get} > 2")
    }
    // every released pair respects the declared radius and ordering
    for (((a, b), h) <- pairs) {
      assert(a < b && h >= 0L && h <= Multimodal.PhashRadius.toLong)
    }
  }

  test("q231 hash is the declared dHash: hand-check on a known payload") {
    // strictly increasing bytes => every comparison fires => all 96 bits
    val inc = Array.tabulate[Byte](97)(i => (i + 16).toByte)
    assert(Multimodal.dhash96(inc) === (((1L << 48) - 1, (1L << 48) - 1)))
    // constant payload => no comparison fires
    assert(Multimodal.dhash96(Array.fill[Byte](100)(65)) === ((0L, 0L)))
    // strictly decreasing => 0
    val dec = Array.tabulate[Byte](97)(i => (120 - i).toByte)
    assert(Multimodal.dhash96(dec) === ((0L, 0L)))
    // one changed byte flips at most 2 bits across the two words
    val base = Array.tabulate[Byte](300)(i => ((i * 37) % 96 + 32).toByte)
    val mut = base.clone(); mut(150) = 'x'.toByte
    val (a0, a1) = Multimodal.dhash96(base)
    val (b0, b1) = Multimodal.dhash96(mut)
    assert(java.lang.Long.bitCount(a0 ^ b0) +
      java.lang.Long.bitCount(a1 ^ b1) <= 2)
  }

  test("q254 covers exactly the audio assets with consistent run " +
    "geometry and an independent run replay per asset") {
    val rows = Multimodal.q254SilenceSegments(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val audio = Multimodal.assets(spark, sf1)
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .collect().map(a => a.asset_id -> a.payload).toMap
    assert(rows.map(_._1).toSet === audio.keySet)
    for ((id, nf, ns, nr, lg) <- rows) {
      assert(ns <= nf && nr <= ns && lg <= ns)
      assert((nr == 0) === (ns == 0), "runs iff silent frames")
      if (nr > 0) assert(lg * nr >= ns,
        s"asset $id: $nr runs cannot hold $ns frames if longest is $lg")
      // independent replay of the silent-flag sequence
      val p = audio(id)
      val step = math.max(p.length / Multimodal.SilFrames, 1)
      val flags = (0 until Multimodal.SilFrames).flatMap { fi =>
        val fr = p.slice(fi * step,
          math.min(fi * step + Multimodal.SilFrameBytes, p.length))
        if (fr.isEmpty) None
        else Some(fr.map(_ & 0xff).map(_.toLong).sum * 100 /
          fr.length < Multimodal.SilThresholdPct)
      }
      assert(flags.length === nf)
      assert(flags.count(identity) === ns)
      val runs = flags.map(if (_) 1 else 0).mkString
        .split("0").filter(_.nonEmpty)
      assert(runs.length.toLong === nr, s"asset $id run count")
      assert((if (runs.isEmpty) 0L else runs.map(_.length).max.toLong)
        === lg, s"asset $id longest run")
    }
    assert(rows.exists(_._3 > 0), "no silent frame anywhere — " +
      "threshold calibration broken")
    assert(rows.exists(r => r._4 >= 2),
      "no asset with 2+ runs — run structure unexercised")
  }

  test("q270 collision probability replays the byte census and sits in " +
    "the [uniform-256, constant] band") {
    val rows = Multimodal.q270PayloadCollision(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val payloads = Multimodal.assets(spark, sf1).collect()
      .map(a => a.asset_id -> a.payload).toMap
    assert(rows.map(_._1).toSet === payloads.keySet)
    for ((id, n, nd, coll) <- rows) {
      val p = payloads(id)
      assert(n === p.length.toLong)
      val counts = p.groupBy(_ & 0xff).map(_._2.length.toLong)
      assert(nd === counts.size.toLong)
      assert(coll === counts.map(c => c * c).sum * 1000000L / (n * n),
        s"asset $id collision replay diverged")
      // Σp² >= 1/|alphabet| (uniform floor) and <= 1 (constant blob)
      assert(coll >= 1000000L / nd && coll <= 1000000L)
    }
  }

  test("q285 duplicate-frame shares replay the histogram-signature " +
    "model and real duplicate mass exists") {
    val rows = Multimodal.q285FrameDedup(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val vids = Multimodal.assets(spark, sf1)
      .filter(org.apache.spark.sql.functions.col("kind") === "video")
      .collect().map(a => a.asset_id -> a.payload).toMap
    assert(rows.map(_._1).toSet === vids.keySet)
    for ((id, nf, nd, dup) <- rows) {
      val p = vids(id)
      val step = math.max(p.length / Multimodal.FdFrames, 1)
      val sigs = (0 until Multimodal.FdFrames).flatMap { fi =>
        val fr = p.slice(fi * step,
          math.min(fi * step + Multimodal.FdBytes, p.length))
        if (fr.isEmpty) None
        else Some(Multimodal.countHistogram(fr).toSeq)
      }
      assert(nf === sigs.length.toLong)
      assert(nd === sigs.distinct.length.toLong, s"asset $id distinct")
      assert(dup === (if (nf == 0) 0L else (nf - nd) * 1000000L / nf))
    }
    assert(rows.map(r => r._2 - r._3).sum > 0L,
      "no duplicate frame anywhere — the signature lost its signal")
  }

  test("q366 clusters: every planted twin joins its base; labels are " +
      "component minima of the q231 pair graph") {
    val labels = Multimodal.q366PhashClusters(spark, sf1).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("cluster"))
      .toMap
    val nBase = labels.keySet.count(_ < Multimodal.PhashOffset)
    assert(labels.size === 2 * nBase, "base + one twin per asset")
    // recall-by-construction (q231's ≤2-flip guarantee): each twin is
    // in the same component as its base
    labels.keysIterator.filter(_ >= Multimodal.PhashOffset).foreach {
      id => assert(labels(id) === labels(id - Multimodal.PhashOffset),
        s"twin $id split from its base")
    }
    // labels are the component minimum over the verified pair graph
    val pairs = Multimodal.q231PayloadPhash(spark, sf1).collect()
      .map(r => (r.getAs[Long]("asset_id_1"), r.getAs[Long]("asset_id_2")))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    def comp(seed: Long): Set[Long] = {
      var seen = Set(seed); var frontier = List(seed)
      while (frontier.nonEmpty) {
        val nxt = frontier
          .flatMap(adj.getOrElse(_, Array.empty[Long]))
          .filterNot(seen)
        seen ++= nxt; frontier = nxt
      }
      seen
    }
    labels.foreach { case (id, lab) =>
      assert(lab === comp(id).min, s"asset $id label not component min")
    }
  }

  test("q454 RLE audit replays a byte-level run counter and ratios " +
    "are valid ppm densities") {
    val M = graft.operators.Multimodal
    val rows = M.q454PayloadRle(spark, sf1).collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_assets"), r.getAs[Long]("bytes"),
          r.getAs[Long]("runs"), r.getAs[Long]("rle_ratio_ppm"))).toMap
    assert(rows.keySet === Set("image", "audio", "video"))
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(d => (d._1 % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }).view.mapValues { ds =>
      val bytes = ds.map(_._2.length.toLong).sum
      val runs = ds.map { case (_, t) =>
        t.zipWithIndex.count { case (c, i) =>
          i == 0 || c != t(i - 1) }.toLong }.sum
      (ds.length.toLong, bytes, runs)
    }.toMap
    want.foreach { case (kind, (n, bytes, runs)) =>
      val (gN, gB, gR, gRatio) = rows(kind)
      assert(gN === n, s"$kind n"); assert(gB === bytes, s"$kind bytes")
      assert(gR === runs, s"$kind runs")
      assert(gRatio === runs * 1000000L / bytes)
      assert(gRatio > 0L && gRatio <= 1000000L)
    }
  }

  test("q476 cross-kind collision screen recovers exactly the planted " +
    "mislabels and containment is a valid ppm") {
    val M = graft.operators.Multimodal
    val rows = M.q476MediaKindMislabel(spark, sf1).collect()
      .map(r => (r.getAs[String]("kind_a"), r.getAs[String]("kind_b")) ->
        (r.getAs[Long]("shared_payloads"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("collision_ppm"))).toMap
    // planted: docs 0..49 re-filed under the NEXT kind -> every planted
    // doc contributes one cross-kind pair (kind(d), kind(d+1 mod 3))
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kinds = Seq("image", "audio", "video")
    val expect = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    docs.filter(_._1 < 50).foreach { case (id, _) =>
      val a = kinds((id % 3).toInt); val b = kinds(((id + 1) % 3).toInt)
      val key = if (a < b) (a, b) else (b, a)
      expect(key) += 1
    }
    assert(rows.keySet === expect.keySet)
    rows.foreach { case (k, (sh, na, nb, ppm)) =>
      assert(sh === expect(k), s"pair $k")
      assert(ppm === sh * 1000000L / math.min(na, nb))
    }
  }

  test("q489 metadata rules replay from the asset geometry and audio " +
    "dims are the systematic violation this generator plants") {
    val rows = graft.operators.Multimodal
      .q489MetadataConsistency(spark, sf1).collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_assets"), r.getAs[Long]("n_dim_suspect"),
          r.getAs[Long]("n_rate_suspect"), r.getAs[Long]("suspect_ppm")))
      .toMap
    assert(rows.keySet === Set("image", "audio", "video"))
    val ids = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val kinds = Seq("image", "audio", "video")
    ids.groupBy(id => kinds((id % 3).toInt)).foreach { case (k, g) =>
      val dimSuspect = g.count { id =>
        val w = id % 640 + 1; val h = id % 480 + 1
        if (k == "audio") w * h > 1 else w < 16 || h < 16
      }.toLong
      val (gn, gd, gr, gppm) = rows(k)
      assert(gn === g.length.toLong, k)
      assert(gd === dimSuspect, s"$k dims")
      assert(gr === 0L, s"$k rate (generator emits 16000)")
      assert(gppm === dimSuspect * 1000000L / g.length)
    }
    // synthetic audio assets carry doc_id-derived dims: ~all violate
    assert(rows("audio")._4 > 900000L)
  }

  test("q507 codecs: PPM and BMP encode→decode round-trips the exact " +
    "RGB raster across dims including padded BMP rows") {
    val M = graft.operators.Multimodal
    // every (w, h) in the q507 geometry, incl. w*3 % 4 != 0 (BMP pad)
    for (w <- 2 to 8; h <- 2 to 6) {
      val raster = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
      val (cp, wp, hp, rp) = M.decodePixels(M.encodePpm(w, h, raster))
      assert((cp, wp, hp) === ("ppm", w, h))
      assert(java.util.Arrays.equals(rp, raster), s"ppm $w x $h")
      val (cb, wb, hb, rb) = M.decodePixels(M.encodeBmp(w, h, raster))
      assert((cb, wb, hb) === ("bmp", w, h))
      assert(java.util.Arrays.equals(rb, raster), s"bmp $w x $h")
    }
  }

  test("q507 decoder trusts the file: dims come from the header, " +
    "comments are skipped, bad magic and truncation throw") {
    val M = graft.operators.Multimodal
    val raster = Array.tabulate(5 * 4 * 3)(_.toByte)
    // header comment is already in encodePpm; add a hand-built header
    // with multiple comments and extra whitespace
    val handPpm = ("P6\n# one\n  5 # inline\n 4\n# two\n255\n")
      .getBytes("US-ASCII") ++ raster
    val (_, w, h, r) = M.decodePixels(handPpm)
    assert((w, h) === (5, 4) && java.util.Arrays.equals(r, raster))
    intercept[Exception] {
      M.decodePixels("XX".getBytes("US-ASCII") ++ raster)
    }
    intercept[Exception] { // truncated BMP raster
      val full = M.encodeBmp(5, 4, raster)
      M.decodePixels(java.util.Arrays.copyOf(full, full.length - 8))
    }
  }

  test("q507 per-channel sums and raster md5 replay from the text " +
    "cycling law") {
    val rows = graft.operators.Multimodal
      .q507PixelDecode(spark, sf1).collect()
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val (w, h) = graft.operators.Multimodal.q507Dims(id)
      val tb = docs(id).getBytes("UTF-8")
      val raster = Array.tabulate(w * h * 3)(i => tb(i % tb.length))
      assert(r.getAs[String]("container") ===
        (if (id % 2 == 0) "ppm" else "bmp"))
      assert(r.getAs[Long]("width") === w.toLong)
      assert(r.getAs[Long]("height") === h.toLong)
      assert(r.getAs[Long]("sum_r") ===
        raster.indices.filter(_ % 3 == 0).map(raster(_) & 0xff).sum.toLong)
      md.reset()
      assert(r.getAs[String]("raster_md5") ===
        md.digest(raster).map("%02x".format(_)).mkString)
    }
  }

  test("q509 WAV codec: encode→decode round-trips rate, channels and " +
    "the exact signed samples, with and without the odd LIST chunk") {
    val M = graft.operators.Multimodal
    for (rate <- Seq(8000, 16000, 44100); ch <- Seq(1, 2);
         n <- Seq(1, 7, 32); withList <- Seq(true, false)) {
      val samples = Array.tabulate(n * ch)(j =>
        ((j * 2311 - 9000) % 32768).toShort) // negatives included
      val (dr, dc, ds) = M.decodeWav(M.encodeWav(rate, ch, samples,
        withList))
      assert((dr, dc) === (rate, ch), s"$rate/$ch/$n/$withList")
      assert(ds.toSeq === samples.toSeq, s"$rate/$ch/$n/$withList")
    }
  }

  test("q509 chunk walker trusts the bytes: bad magic, truncation, " +
    "data-before-fmt and non-PCM all throw") {
    val M = graft.operators.Multimodal
    val good = M.encodeWav(8000, 1, Array[Short](1, -2, 3), withList = true)
    intercept[Exception] { // bad RIFF magic
      val b = good.clone(); b(0) = 'X'.toByte; M.decodeWav(b)
    }
    intercept[Exception] { // truncated data chunk
      M.decodeWav(java.util.Arrays.copyOf(good, good.length - 2))
    }
    intercept[Exception] { // non-PCM format tag (fmt chunk starts at 12)
      val b = good.clone(); b(20) = 3; M.decodeWav(b)
    }
    intercept[Exception] { // data before fmt: swap chunk ids
      val samples = Array[Short](5, 6)
      val noList = M.encodeWav(8000, 1, samples, withList = false)
      // fmt chunk occupies [12, 36); data starts at 36 — rebuild with
      // data first by hand
      val data = java.util.Arrays.copyOfRange(noList, 36, noList.length)
      val fmt = java.util.Arrays.copyOfRange(noList, 12, 36)
      val out = java.util.Arrays.copyOf(noList, noList.length)
      System.arraycopy(data, 0, out, 12, data.length)
      System.arraycopy(fmt, 0, out, 12 + data.length, fmt.length)
      M.decodeWav(out)
    }
  }

  /** Test-local PNG chunk writer (the production one is private):
    * len(BE) ‖ type ‖ data ‖ CRC32(type ‖ data). */
  private def tChunk(out: java.io.ByteArrayOutputStream, id: String,
      data: Array[Byte]): Unit = {
    val hdr = java.nio.ByteBuffer.allocate(8)
    hdr.putInt(data.length); id.foreach(c => hdr.put(c.toByte))
    out.write(hdr.array()); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(id.getBytes("US-ASCII")); crc.update(data)
    val t = java.nio.ByteBuffer.allocate(4)
    t.putInt(crc.getValue.toInt); out.write(t.array())
  }

  test("q511 PNG codec: encode→decode round-trips the exact raster " +
    "through real DEFLATE across all geometries and five filters") {
    val M = graft.operators.Multimodal
    for (w <- 4 to 16; h <- Seq(5, 9, 13)) {
      val raster = Array.tabulate(w * h * 3)(i => ((i * 41 + 7) % 253).toByte)
      val (dw, dh, rgb, fsum) = M.decodePng(M.encodePng(w, h, raster))
      assert((dw, dh) === (w, h), s"$w x $h")
      assert(java.util.Arrays.equals(rgb, raster), s"png $w x $h")
      assert(fsum === (0 until h).map(_ % 5).sum.toLong)
    }
  }

  test("q511 decoder trusts the bytes: bad signature, CRC corruption, " +
    "truncation, split IDAT separation and bad filter types all throw") {
    val M = graft.operators.Multimodal
    val raster = Array.tabulate(6 * 5 * 3)(i => (i * 3).toByte)
    val good = M.encodePng(6, 5, raster)
    // sanity: the good payload decodes
    assert(java.util.Arrays.equals(M.decodePng(good)._3, raster))
    intercept[Exception] { // bad signature
      val b = good.clone(); b(1) = 'X'.toByte; M.decodePng(b)
    }
    intercept[Exception] { // CRC corruption inside the first IDAT body
      // chunk walk: find the first IDAT and flip one data byte
      var i = 8; var done = false; val b = good.clone()
      while (!done) {
        val len = java.nio.ByteBuffer.wrap(b, i, 4).getInt
        val id = new String(b, i + 4, 4, "US-ASCII")
        if (id == "IDAT" && len > 0) { b(i + 8) = (b(i + 8) ^ 0x55).toByte; done = true }
        else i += 12 + len
      }
      M.decodePng(b)
    }
    intercept[Exception] { // truncated mid-chunk
      M.decodePng(java.util.Arrays.copyOf(good, good.length - 6))
    }
    intercept[Exception] { // non-consecutive IDAT: splice tEXt between
      val chunks = scala.collection.mutable.ArrayBuffer
        .empty[(String, Array[Byte])]
      var i = 8
      while (i < good.length) {
        val len = java.nio.ByteBuffer.wrap(good, i, 4).getInt
        chunks += ((new String(good, i + 4, 4, "US-ASCII"),
          java.util.Arrays.copyOfRange(good, i + 8, i + 8 + len)))
        i += 12 + len
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write(java.util.Arrays.copyOf(good, 8))
      val (idats, rest) = chunks.partition(_._1 == "IDAT")
      assert(idats.length === 2)
      rest.filter(_._1 == "IHDR").foreach(c => tChunk(out, c._1, c._2))
      tChunk(out, "IDAT", idats(0)._2)
      tChunk(out, "tEXt", "Comment splice".getBytes("US-ASCII"))
      tChunk(out, "IDAT", idats(1)._2)
      tChunk(out, "IEND", Array.emptyByteArray)
      M.decodePng(out.toByteArray)
    }
    intercept[Exception] { // filter type 7: valid zlib, invalid PNG
      val w = 2; val h = 1
      val filtered = Array[Byte](7, 1, 2, 3, 4, 5, 6)
      val defl = new java.util.zip.Deflater()
      defl.setInput(filtered); defl.finish()
      val zb = new Array[Byte](64); val zn = defl.deflate(zb); defl.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(java.util.Arrays.copyOf(good, 8))
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h)
      ihdr.put(8.toByte).put(2.toByte)
      ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
      tChunk(out, "IHDR", ihdr.array())
      tChunk(out, "IDAT", java.util.Arrays.copyOf(zb, zn))
      tChunk(out, "IEND", Array.emptyByteArray)
      M.decodePng(out.toByteArray)
    }
  }

  test("q511 decoded sums, filter sum and raster md5 replay from the " +
    "text cycling law") {
    val rows = graft.operators.Multimodal
      .q511PngDecode(spark, sf1).collect()
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val (w, h) = graft.operators.Multimodal.q511Dims(id)
      val tb = docs(id).getBytes("UTF-8")
      val raster = Array.tabulate(w * h * 3)(i => tb(i % tb.length))
      assert(r.getAs[Long]("width") === w.toLong)
      assert(r.getAs[Long]("height") === h.toLong)
      assert(r.getAs[Long]("n_pixels") === w.toLong * h)
      assert(r.getAs[Long]("sum_r") ===
        raster.indices.filter(_ % 3 == 0).map(raster(_) & 0xff).sum.toLong)
      assert(r.getAs[Long]("sum_b") ===
        raster.indices.filter(_ % 3 == 2).map(raster(_) & 0xff).sum.toLong)
      assert(r.getAs[Long]("filter_sum") ===
        (0 until h).map(_ % 5).sum.toLong)
      md.reset()
      assert(r.getAs[String]("raster_md5") ===
        md.digest(raster).map("%02x".format(_)).mkString)
    }
  }

  test("q516 AVI codec: nested-list encode→walk round-trips frames, " +
    "clock and dims across all geometries including odd frame sizes") {
    val M = graft.operators.Multimodal
    for (docId <- 0L to 23L) { // covers every (nf, w, h, usf) residue mix
      val (nf, w, h, usf) = M.q516Geom(docId)
      val frames = Array.tabulate(nf) { i =>
        Array.tabulate(M.q516FrameSize(docId, i))(j =>
          ((i * 31 + j * 7 + docId) % 251).toByte)
      }
      val (dusf, dw, dh, df) = M.decodeAvi(
        M.encodeAvi(docId, frames, w, h, usf))
      assert((dusf, dw, dh) === (usf, w, h), s"doc $docId")
      assert(df.length === nf)
      df.zip(frames).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"doc $docId frame")
      }
    }
  }

  test("q516 walker trusts the bytes: bad magic, truncation, a LYING " +
    "idx1 offset and a header frame-count mismatch all throw") {
    val M = graft.operators.Multimodal
    val (nf, w, h, usf) = M.q516Geom(7L)
    val frames = Array.tabulate(nf) { i =>
      Array.tabulate(M.q516FrameSize(7L, i))(j => (i * 5 + j).toByte)
    }
    val good = M.encodeAvi(7L, frames, w, h, usf)
    assert(M.decodeAvi(good)._4.length === nf) // sanity
    intercept[Exception] { // bad magic
      val b = good.clone(); b(9) = 'X'.toByte; M.decodeAvi(b)
    }
    intercept[Exception] { // truncation mid-idx1
      M.decodeAvi(java.util.Arrays.copyOf(good, good.length - 5))
    }
    intercept[Exception] { // lying seek index: corrupt entry 0's offset
      val b = good.clone()
      // idx1 data = last 16*nf bytes; offset field at +8 of entry 0
      val e0 = b.length - 16 * nf + 8
      b(e0) = (b(e0) ^ 0x01).toByte
      M.decodeAvi(b)
    }
    intercept[Exception] { // header claims one frame more than movi has
      val b = good.clone()
      // avih sits at RIFF(12) + LIST hdr(12) + 'avih'+size(8);
      // dwTotalFrames is avih byte 16
      val tf = 12 + 12 + 8 + 16
      b(tf) = (b(tf) + 1).toByte
      M.decodeAvi(b)
    }
  }

  test("q516 frame stats and md5 replay from the text cycling law") {
    val rows = graft.operators.Multimodal
      .q516AviFrameIndex(spark, sf1).collect()
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val M = graft.operators.Multimodal
      val (nf, w, h, usf) = M.q516Geom(id)
      val tb = docs(id).getBytes("UTF-8")
      val frames = Array.tabulate(nf) { i =>
        Array.tabulate(M.q516FrameSize(id, i))(j =>
          tb((i * 17 + j) % tb.length))
      }
      assert(r.getAs[Long]("width") === w.toLong)
      assert(r.getAs[Long]("height") === h.toLong)
      assert(r.getAs[Long]("us_per_frame") === usf.toLong)
      assert(r.getAs[Long]("n_frames") === nf.toLong)
      assert(r.getAs[Long]("total_bytes") ===
        frames.map(_.length.toLong).sum)
      assert(r.getAs[Long]("wsum_bytes") ===
        frames.zipWithIndex.map { case (f, i) =>
          (i + 1L) * f.length }.sum)
      md.reset()
      frames.foreach(md.update)
      assert(r.getAs[String]("frames_md5") ===
        md.digest().map("%02x".format(_)).mkString)
    }
  }

  test("q509 decoded stats replay from the text sample law") {
    val rows = graft.operators.Multimodal.q509WavDecode(spark, sf1)
      .collect()
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val (frames, ch, rate) = graft.operators.Multimodal.q509Geom(id)
      val tb = docs(id).getBytes("UTF-8")
      val s = Array.tabulate(frames * ch)(j =>
        (((tb(j % tb.length) & 0xff) - 64) * 201).toLong)
      assert(r.getAs[Long]("sample_rate") === rate.toLong)
      assert(r.getAs[Long]("channels") === ch.toLong)
      assert(r.getAs[Long]("n_frames") === frames.toLong)
      assert(r.getAs[Long]("sum_s") === s.sum)
      assert(r.getAs[Long]("min_s") === s.min)
      assert(r.getAs[Long]("max_s") === s.max)
      assert(r.getAs[Long]("wsum_s") ===
        s.zipWithIndex.map { case (v, j) => (j + 1) * v }.sum)
      md.reset()
      assert(r.getAs[String]("samples_md5") ===
        md.digest(s.mkString(",").getBytes("US-ASCII"))
          .map("%02x".format(_)).mkString)
    }
  }
}
