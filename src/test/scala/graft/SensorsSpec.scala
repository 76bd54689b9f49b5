package graft

import graft.sources.{JsonLanding, Sensors}

/** Availability-sensor preconditions (S8/P5): probes succeed on real
  * sources, fail cleanly on missing/invalid ones, and never full-scan.
  */
class SensorsSpec extends SparkSpecBase {

  test("pathExists distinguishes real and missing paths") {
    assert(Sensors.pathExists(spark, s"$Sf/orders.parquet"))
    assert(!Sensors.pathExists(spark, s"$Sf/nope.parquet"))
  }

  test("sourceNonEmpty probes with limit-1, true on data, false on missing") {
    assert(Sensors.sourceNonEmpty(Tables.orders(spark, Sf)))
    assert(!Sensors.sourceNonEmpty(spark.read.parquet(s"$Sf/missing.parquet")))
  }

  test("batchLooksValid checks the landed envelope shape") {
    val posts = JsonLanding.readPosts(spark, fixture("/fixtures/posts/posts_batch.json"))
    assert(Sensors.batchLooksValid(posts, "id"))
    assert(!Sensors.batchLooksValid(posts.filter("id < 0"), "id"))
  }
}
