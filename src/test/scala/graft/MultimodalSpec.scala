package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the audio/video segmentation family (q310 VAD with
  * hangover, q311 keyframe selection): structural invariants the
  * hash oracle can't express as clearly.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("VAD: segments respect the hangover contract and bound counts") {
    val rows = SparkEntry.queries("q310_audio_vad")(spark, sf).collect()
    assert(rows.nonEmpty)
    var anySeg = false
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val ns = r.getAs[Long]("n_segments")
      val sp = r.getAs[Long]("n_speech")
      val lg = r.getAs[Long]("longest_seg")
      val st = r.getAs[Long]("first_seg_start")
      assert(sp <= nf && lg <= nf)
      if (ns == 0) assert(sp == 0 && lg == 0 && st == -1)
      else {
        anySeg = true
        assert(sp >= ns, "every segment holds >= 1 speech frame")
        assert(lg >= 1 && st >= 0 && st < nf)
        // a segment span can exceed its speech count only via bridged
        // gaps of <= 2 frames between consecutive speech frames
        assert(lg <= sp + (sp - 1) * 2 ||
          ns > 1, s"span $lg impossible for $sp speech frames")
      }
    }
    assert(anySeg, "threshold produced no speech segments at all")
  }

  test("keyframes: one per shot, count = cuts + 1, checksum non-zero") {
    val kf = SparkEntry.queries("q311_video_keyframes")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val cuts = SparkEntry.queries("q305_video_scene_cuts")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(kf.keySet == cuts.keySet)
    kf.foreach { case (id, r) =>
      val c = cuts(id)
      if (c.getAs[Int]("n_frames") > 0) {
        assert(r.getAs[Int]("n_keyframes") == c.getAs[Int]("n_cuts") + 1)
        assert(r.getAs[Long]("kf_checksum") > 0)
        assert(r.getAs[Int]("last_kf_frame") < r.getAs[Int]("n_frames"))
      }
    }
  }
}
