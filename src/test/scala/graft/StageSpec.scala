package graft

import org.scalatest.funsuite.AnyFunSuite

class StageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stage round-trips data under the shared reclaimed session root") {
    import spark.implicits._
    val staged = Stage(Seq(1, 2, 3).toDF("x"), "t")
    assert(staged.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // Every staging dir must nest under the ONE session root (which the
    // shutdown hook removes) — not a fresh top-level /tmp entry per call.
    val f = staged.select(org.apache.spark.sql.functions.input_file_name())
      .collect().head.getString(0)
    val rootName = java.nio.file.Paths.get(new java.net.URI(f))
      .getParent.getParent.getFileName.toString
    assert(rootName.startsWith("graft_stage"), s"unexpected layout: $f")
    val scratch = java.nio.file.Paths.get(Stage.scratchDir("s"))
    assert(scratch.getParent.getFileName.toString.startsWith("graft_stage"))
  }
}
