package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Decoder-level specs for the multimodal tier — these pin behaviors
  * the oracle can't see directly (JPEG error margin, ImageIO round-trip
  * identity) so a codec regression is caught before the driver gate. */
class MultimodalDecodeSpec extends AnyFunSuite {

  test("BMP bytes decode pixel-exactly via ImageIO to the generation recipe") {
    (0L until 50L).foreach { id =>
      val (w, h, mr, mg, mb, _, corner) =
        MultimodalOps.decodeImage(MultimodalOps.bmpBytes(id))
      assert(w == 4 + (id % 13).toInt && h == 4 + ((id * 3) % 11).toInt)
      val n = w * h
      def mean(c: Int): Double =
        (0 until n).map(p => (id * 31 + (3 * p + c) * 7) % 256).sum.toDouble / n
      assert(mr == mean(0) && mg == mean(1) && mb == mean(2),
        s"doc $id channel means diverge from recipe")
      // position-sensitive: (0,0) must be recipe pixel p=0 — a bottom-up/
      // top-down raster confusion in encode or decode moves pixel
      // (0, h-1) here instead and fails (means alone can't see that)
      val want = 0.299 * ((id * 31) % 256) + 0.587 * ((id * 31 + 7) % 256) +
        0.114 * ((id * 31 + 14) % 256)
      assert(corner == want, s"doc $id corner pixel not raster-first pixel")
    }
  }

  test("JPEG decode error stays ~1 luma unit on smooth gradients, far under the 4.0 contract") {
    var worst = 0.0
    (0L until 50L).foreach { id =>
      val (w, h, mr, mg, mb, _, _) = MultimodalOps.decodeImage(MultimodalOps.jpegBytes(id))
      assert(w == 16 + (id % 17).toInt && h == 16 + ((id * 5) % 13).toInt)
      val exR = 30 + ((id * 7) % 150).toInt + (w - 1) / 2.0
      val exG = 60 + ((id * 11) % 120).toInt + (h - 1) / 2.0
      val exB = 90 + ((id * 13) % 100).toInt.toDouble
      worst = math.max(worst, math.abs(mr - exR))
      worst = math.max(worst, math.abs(mg - exG))
      worst = math.max(worst, math.abs(mb - exB))
    }
    // the m06 contract asserts <= 4.0; require real headroom here so
    // environment drift surfaces as a spec failure, not an oracle flake
    assert(worst <= 2.5, f"worst JPEG channel-mean error $worst%.2f")
  }

  test("a channel-swapped decode would violate the JPEG tolerance (contract is discriminating)") {
    // swap R and B of the decoded means: must land far outside 4.0 for
    // at least most docs — proves within_tolerance isn't vacuously true
    val violations = (0L until 50L).count { id =>
      val (w, h, mr, _, mb, _, _) = MultimodalOps.decodeImage(MultimodalOps.jpegBytes(id))
      val exR = 30 + ((id * 7) % 150).toInt + (w - 1) / 2.0
      val exB = 90 + ((id * 13) % 100).toInt.toDouble
      math.abs(mb - exR) > 4.0 || math.abs(mr - exB) > 4.0
    }
    assert(violations >= 45, s"only $violations/50 channel-swapped docs violate tolerance")
  }

  test("tone WAV decode round-trips the chirp recipe sample-exactly") {
    (0L until 97L).foreach { aid =>
      val samples = MultimodalOps.decodeWavSamples(MultimodalOps.toneWavBytes(aid))
      val n = 64 + (aid % 191).toInt
      assert(samples.length == n, s"aid $aid: ${samples.length} samples, want $n")
      (0 until n).foreach { k =>
        val want = ((k.toLong * k * (17 + aid) + k * 29L + aid * 131) % 65536 - 32768).toShort
        assert(samples(k) == want, s"aid $aid sample $k")
      }
    }
  }

  test("m12 clip/quiet counts match the chirp recipe and discriminate clips") {
    var nClipped = 0; var nOk = 0
    (0L until 97L).foreach { aid =>
      val samples = MultimodalOps.decodeWavSamples(MultimodalOps.toneWavBytes(aid))
      val n = samples.length
      // decoded-path counts (what m12's mapPartitions computes)
      val decClip = samples.count(s => math.abs(s.toInt) >= 30000)
      val decQuiet = samples.count(s => math.abs(s.toInt) < 2000)
      // analytic recipe (what the oracle computes)
      var anClip = 0; var anQuiet = 0
      (0 until n).foreach { k =>
        val v = (k.toLong * k * (17 + aid) + k * 29L + aid * 131) % 65536 - 32768
        if (math.abs(v) >= 30000) anClip += 1
        if (math.abs(v) < 2000) anQuiet += 1
      }
      assert(decClip == anClip && decQuiet == anQuiet, s"aid $aid count drift")
      if (decClip * 10 > n) nClipped += 1
      else if (decQuiet * 10 <= n) nOk += 1
    }
    // the gate is not vacuous: both verdict classes occur across clips
    assert(nClipped > 0 && nOk > 0, s"clipped=$nClipped ok=$nOk")
  }

  test("energy fingerprints discriminate between clips (m08 is not vacuous)") {
    // the wavBytes sawtooth would collapse every fingerprint to 0 (its
    // energies decrease monotonically); the chirp must not
    val prints = (0L until 97L).map { aid =>
      MultimodalOps.energyFingerprint(
        MultimodalOps.decodeWavSamples(MultimodalOps.toneWavBytes(aid)))
    }
    assert(prints.distinct.size >= 60,
      s"only ${prints.distinct.size}/97 distinct fingerprints")
    // and identical clips must always collide (the dedup contract)
    assert(MultimodalOps.energyFingerprint(
      MultimodalOps.decodeWavSamples(MultimodalOps.toneWavBytes(41))) == prints(41))
  }

  test("video fingerprints are frame-ORDER sensitive and discriminate clips (m09)") {
    val prints = (0L until 60L).map { gid =>
      MultimodalOps.videoFingerprint(MultimodalOps.framesBytes(gid), 2)
    }
    assert(prints.distinct.size >= 50,
      s"only ${prints.distinct.size}/60 distinct video fingerprints")
    // identical clips collide (dedup contract)
    assert(MultimodalOps.videoFingerprint(MultimodalOps.framesBytes(17), 2) == prints(17))
    // a hand-built container with the SAME sampled frames in reversed
    // order must print differently — the polynomial chain is the point;
    // a set/sum hash would pass frames in any order
    def container(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(4 + frames.map(4 + _.length).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(frames.length)
      frames.foreach { fr => bb.putInt(fr.length); bb.put(fr) }
      bb.array()
    }
    // k=1 so every frame is sampled; two frames with distinct dHashes
    val f0 = MultimodalOps.ppmBytes(3)
    val f1 = MultimodalOps.ppmBytes(44)
    assert(MultimodalOps.dhashPpm(f0) != MultimodalOps.dhashPpm(f1))
    val fwd = MultimodalOps.videoFingerprint(container(Seq(f0, f1)), 1)
    val rev = MultimodalOps.videoFingerprint(container(Seq(f1, f0)), 1)
    assert(fwd._1 == rev._1 && fwd._2 != rev._2,
      s"reordered frames must change the print: $fwd vs $rev")
  }

  test("validatePpm rejects overflow-dims headers and classifies the contract states (m17)") {
    // well-formed image → ok; raster one byte short → truncated
    val good = MultimodalOps.ppmBytes(7)
    assert(MultimodalOps.validatePpm(good) == "ok")
    assert(MultimodalOps.validatePpm(good.dropRight(1)) == "truncated")
    // r9 ADVICE: 46341×46341 overflows w*h*3 in Int to a NEGATIVE value,
    // so the pre-fix length check passed a near-empty payload as "ok".
    // Post-fix: absurd dims are rejected outright (bad_magic), never ok.
    val bomb = "P6\n46341 46341\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte)
    assert(MultimodalOps.validatePpm(bomb) == "bad_magic")
    // large-but-sane dims with a short raster still classify truncated
    // (Long math path: 2000·2000·3 = 12M > payload)
    val big = "P6\n2000 2000\n255\n".getBytes("US-ASCII") ++ Array.fill(100)(1.toByte)
    assert(MultimodalOps.validatePpm(big) == "truncated")
    // malformed headers → bad_magic per the documented contract:
    // non-numeric token, truncation mid-token / exactly at maxval
    assert(MultimodalOps.validatePpm("P6\n4 X\n255\n".getBytes("US-ASCII")) == "bad_magic")
    assert(MultimodalOps.validatePpm("P6\n4 4\n".getBytes("US-ASCII")) == "bad_magic")
    // header complete through maxval but zero raster bytes → truncated
    assert(MultimodalOps.validatePpm("P6\n4 4\n255".getBytes("US-ASCII")) == "truncated")
  }
}
