package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AviMjpeg
import graft.sources.GzipArchives

/** Property-based robustness for the byte-format walkers added in round 9:
  * arbitrary member/frame sets roundtrip exactly, and no mutation makes a
  * walker throw — the same poison-pill discipline as the proto wire
  * decoders, over generator-driven shapes the fixed fixtures don't reach.
  */
class MediaFormatsPropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(1337L + i)))
    }

  // members of wildly varying size/content incl. empty, runs, random bytes
  private val genMember: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(Array.emptyByteArray),
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray)),
    Gen.choose(1, 5000).map(n => Array.fill[Byte](n)(0x41)),
    Gen.choose(1, 2000).flatMap(n =>
      Gen.choose(Long.MinValue, Long.MaxValue).map { s =>
        val r = new scala.util.Random(s); val a = new Array[Byte](n)
        r.nextBytes(a); a
      }))

  private val genArchive: Gen[List[Array[Byte]]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genMember))

  test("gzip archives: arbitrary member sets roundtrip boundary-exact") {
    forSamples(genArchive, 60) { members =>
      if (members.nonEmpty) {
        val archive = GzipArchives.buildArchive(members.map(m => m: Array[Byte]))
        val (out, clean) = GzipArchives.splitMembers(archive)
        assert(clean, s"${members.length} members")
        assert(out.length == members.length)
        out.zip(members).foreach { case (a, b) => assert(a.sameElements(b)) }
      }
    }
  }

  test("gzip archives: mutations and truncations never throw, never fabricate members") {
    val base = GzipArchives.buildArchive(Seq("abc".getBytes, "defgh".getBytes,
      Array.fill[Byte](500)(7)))
    val genMut = for {
      nFlips <- Gen.choose(1, 8)
      flips <- Gen.listOfN(nFlips,
        Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(-128, 127)))
    } yield flips
    forSamples(genMut, 120) { flips =>
      val z = base.clone()
      flips.foreach { case (at, v) => z(at) = v.toByte }
      val (members, _) = GzipArchives.splitMembers(z) // must not throw
      // every member that IS returned passed its CRC: either it equals an
      // original member or the mutation happened to produce a new
      // self-consistent member — but a returned member can never be a
      // CRC-mismatched corruption of the stream it claims to come from
      assert(members.lengthIs <= 3 + flips.length) // sanity: no runaway fabrication
    }
    (0 until base.length by 3).foreach { cut =>
      GzipArchives.splitMembers(base.take(cut)) // must not throw
    }
  }

  // frame sets of varying counts/dims (dims multiple-of-8 for JPEG sanity)
  private val genVideo: Gen[(Int, Int, List[(Int, Int, Int)])] = for {
    w <- Gen.oneOf(16, 24, 32, 48)
    h <- Gen.oneOf(16, 24, 40)
    n <- Gen.choose(1, 6)
    colors <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 14), Gen.choose(0, 14), Gen.choose(0, 14))
      .map { case (r, g, b) => (r * 16 + 8, g * 16 + 8, b * 16 + 8) })
  } yield (w, h, colors)

  test("MJPEG AVI: arbitrary frame sets roundtrip count, dims and bucketed colors") {
    forSamples(genVideo, 25) { case (w, h, colors) =>
      val frames = colors.map { case (r, g, b) => AviMjpeg.solidJpeg(w, h, r, g, b) }
      val avi = AviMjpeg.mjpegAvi(frames, w, h, 40000L)
      assert(AviMjpeg.probe(avi).contains(
        (colors.length * 40L, colors.length.toLong, w, h)))
      val out = AviMjpeg.decodeAviFrames(7L, avi)
      assert(out.length == colors.length && out.forall(_.ok))
      out.zip(colors).foreach { case (f, (r, g, b)) =>
        assert(f.width == w && f.height == h)
        assert(math.floor(f.mean_r / 16).toInt == r / 16, s"r $w x $h")
        assert(math.floor(f.mean_g / 16).toInt == g / 16, s"g $w x $h")
        assert(math.floor(f.mean_b / 16).toInt == b / 16, s"b $w x $h")
      }
      // stride sampling keeps exactly the congruent container indices
      val s3 = AviMjpeg.decodeAviFrames(7L, avi, frameStride = 3)
      assert(s3.map(_.frame) == out.map(_.frame).filter(_ % 3 == 0))
    }
  }

  test("MJPEG AVI: arbitrary mutations never throw") {
    val avi = AviMjpeg.mjpegAvi(
      (0 until 3).map(_ => AviMjpeg.solidJpeg(32, 24, 100, 120, 140)), 32, 24, 40000L)
    val genMut = Gen.listOfN(6,
      Gen.zip(Gen.choose(0, avi.length - 1), Gen.choose(-128, 127)))
    forSamples(genMut, 150) { flips =>
      val z = avi.clone()
      flips.foreach { case (at, v) => z(at) = v.toByte }
      AviMjpeg.probe(z)
      AviMjpeg.decodeAviFrames(1L, z)
    }
  }

  // DIB is lossless: odd widths exercise every 4-byte row-pad residue
  private val genDibVideo: Gen[(Int, Int, List[(Int, Int, Int)])] =
    for {
      w <- Gen.choose(1, 37)
      h <- Gen.choose(1, 19)
      n <- Gen.choose(1, 5)
      colors <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 255), Gen.choose(0, 255), Gen.choose(0, 255)))
    } yield (w, h, colors)

  test("DIB AVI: arbitrary frame sets roundtrip dims and EXACT colors (lossless)") {
    forSamples(genDibVideo, 40) { case (w, h, colors) =>
      val frames = colors.map { case (r, g, b) => AviMjpeg.dibFrame(w, h, r, g, b) }
      val avi = AviMjpeg.dibAvi(frames, w, h, 40000L)
      assert(AviMjpeg.probe(avi).contains(
        (colors.length * 40L, colors.length.toLong, w, h)))
      val out = AviMjpeg.decodeAviFrames(7L, avi)
      assert(out.length == colors.length && out.forall(_.ok))
      out.zip(colors).foreach { case (f, (r, g, b)) =>
        assert(f.width == w && f.height == h)
        // no codec between write and read — the means are EXACT
        assert(f.mean_r == r.toDouble && f.mean_g == g.toDouble &&
          f.mean_b == b.toDouble, s"$w x $h rgb($r,$g,$b)")
      }
      val s2 = AviMjpeg.decodeAviFrames(7L, avi, frameStride = 2)
      assert(s2.map(_.frame) == out.map(_.frame).filter(_ % 2 == 0))
    }
  }

  test("DIB AVI: mutations/truncations never throw; short frames flag, not crash") {
    val avi = AviMjpeg.dibAvi(
      (0 until 3).map(i => AviMjpeg.dibFrame(13, 7, 10 * i, 20, 30)), 13, 7, 40000L)
    val genMut = Gen.listOfN(6,
      Gen.zip(Gen.choose(0, avi.length - 1), Gen.choose(-128, 127)))
    forSamples(genMut, 150) { flips =>
      val z = avi.clone()
      flips.foreach { case (at, v) => z(at) = v.toByte }
      AviMjpeg.probe(z)
      AviMjpeg.decodeAviFrames(1L, z)
    }
    (0 until avi.length by 7).foreach { cut =>
      AviMjpeg.probe(avi.take(cut))
      AviMjpeg.decodeAviFrames(1L, avi.take(cut))
    }
  }
}
