package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r20 optimization guard: the k-means trainers moved from per-iteration
  * Spark jobs (which re-planned/re-codegen'd the centroid-literal trees every
  * iteration — model_train was planner time, not compute) to driver-side
  * loops over the ONE collected training sample. The trained model is a
  * REPRODUCIBLE ARTIFACT — its doubles are embedded as literals into the
  * generated oracle SQL — so the rewrite must be bit-identical, not merely
  * close. This spec re-runs the ORIGINAL Spark dataflow (copied verbatim
  * from the pre-r20 implementation) and asserts exact equality of every
  * double against the new trainer, on the driver corpus at both default and
  * non-default knobs.
  */
class TrainerEquivalenceSpec extends SparkSpecBase {

  private lazy val emb = Tables.embeddings(spark, Sf)

  /** The pre-r20 trainIvfCentroids, verbatim: per-iteration Spark jobs with
    * centroid literals, max_by assignment, vec_id-sorted mean folds.
    */
  private def oldTrainIvf(emb: DataFrame, nlist: Int, iters: Int,
      sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val data = (if (sampleFraction < 1.0) emb.sample(sampleFraction, seed = 7) else emb)
      .select(col("vec_id"), col("embedding"))
    var centroids: Array[Array[Double]] = data.orderBy(col("vec_id")).limit(nlist)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 1 to iters) {
      val centsLit = array(centroids.map(c =>
        array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
      val best = data
        .select(col("vec_id"), col("embedding"), posexplode(centsLit))
        .withColumn("ccos",
          Similarity.dot(col("embedding"), col("col")) /
            (Similarity.norm(col("embedding")) * Similarity.norm(col("col"))))
        .groupBy(col("vec_id"))
        .agg(max_by(col("pos"), struct(col("ccos"), -col("pos"))).as("cid"))
      val dimMeans = data
        .select(col("vec_id"), posexplode(col("embedding")))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "v")
        .join(best, Seq("vec_id"))
        .groupBy(col("cid"), col("dim"))
        .agg(collect_list(struct(col("vec_id"), col("v"))).as("vs"))
        .select(col("cid"), col("dim"), array_sort(col("vs")).as("vs"))
        .select(col("cid"), col("dim"),
          (aggregate(col("vs"), lit(0.0), (acc, x) => acc + x.getField("v"))
            / size(col("vs"))).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("cvec"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        dimMeans.getOrElse(i, old)
      }
    }
    centroids
  }

  /** The pre-r20 trainPqCodebooks, verbatim. */
  private def oldTrainPq(emb: DataFrame, iters: Int,
      sampleFraction: Double = 1.0): Array[Array[Array[Double]]] = {
    import Similarity.{PqM, PqK, PqSubDim}
    def subvecD(vec: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =
      transform(slice(vec, m * PqSubDim + 1, lit(PqSubDim)), v => v.cast("double"))
    def pqBooksLit(books: Array[Array[Array[Double]]]) =
      array(books.map(mb => array(mb.map(c =>
        array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)).toIndexedSeq: _*)
    val data = (if (sampleFraction < 1.0) emb.sample(sampleFraction, seed = 11) else emb)
      .select(col("vec_id"), col("embedding"))
    val initRows = data.orderBy(col("vec_id")).limit(PqK)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(initRows.length == PqK)
    var books: Array[Array[Array[Double]]] = Array.tabulate(PqM, PqK) { (m, k) =>
      initRows(k).slice(m * PqSubDim, (m + 1) * PqSubDim)
    }
    for (_ <- 1 to iters) {
      val sub = data.select(col("vec_id"),
          posexplode(array((0 until PqM).map(m => subvecD(col("embedding"), lit(m))): _*)))
        .withColumnRenamed("pos", "m").withColumnRenamed("col", "sv")
      val best = sub.select(col("vec_id"), col("m"), col("sv"),
          posexplode(element_at(pqBooksLit(books), col("m") + 1)))
        .withColumnRenamed("pos", "code").withColumnRenamed("col", "cvec")
        .withColumn("d2", aggregate(zip_with(col("sv"), col("cvec"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
        .groupBy(col("vec_id"), col("m"))
        .agg(max_by(col("code"), struct(-col("d2"), -col("code"))).as("code"))
      val dimMeans = sub.join(best, Seq("vec_id", "m"))
        .select(col("m"), col("code"), col("vec_id"), posexplode(col("sv")))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "v")
        .groupBy(col("m"), col("code"), col("dim"))
        .agg(array_sort(collect_list(struct(col("vec_id"), col("v")))).as("vs"))
        .select(col("m"), col("code"), col("dim"),
          (aggregate(col("vs"), lit(0.0), (acc, x) => acc + x.getField("v"))
            / size(col("vs"))).as("mn"))
        .groupBy(col("m"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mn")))),
          x => x.getField("mn")).as("cvec"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      books = Array.tabulate(PqM, PqK)((m, k) => dimMeans.getOrElse((m, k), books(m)(k)))
    }
    books
  }

  test("driver-side IVF training is bit-identical to the old Spark dataflow") {
    for ((nlist, iters) <- Seq((Similarity.IvfCentroids, 3), (4, 2), (8, 1))) {
      val old = oldTrainIvf(emb, nlist, iters)
      val neu = Similarity.trainIvfCentroids(emb, nlist, iters)
      assert(old.length == neu.length, s"nlist=$nlist iters=$iters count")
      for (i <- old.indices)
        assert(java.util.Arrays.equals(old(i), neu(i)),
          s"nlist=$nlist iters=$iters centroid $i differs:\n" +
            s"old ${old(i).mkString(",")}\nnew ${neu(i).mkString(",")}")
    }
  }

  test("driver-side IVF training matches under the sampled fraction") {
    val old = oldTrainIvf(emb, Similarity.IvfCentroids, 3, sampleFraction = 0.5)
    val neu = Similarity.trainIvfCentroids(emb, Similarity.IvfCentroids, 3,
      sampleFraction = 0.5)
    for (i <- old.indices)
      assert(java.util.Arrays.equals(old(i), neu(i)), s"sampled centroid $i differs")
  }

  test("driver-side PQ training is bit-identical to the old Spark dataflow") {
    for (iters <- Seq(3, 1)) {
      val old = oldTrainPq(emb, iters)
      val neu = Similarity.trainPqCodebooks(emb, iters)
      for (m <- 0 until Similarity.PqM; k <- 0 until Similarity.PqK)
        assert(java.util.Arrays.equals(old(m)(k), neu(m)(k)),
          s"iters=$iters book ($m,$k) differs:\n" +
            s"old ${old(m)(k).mkString(",")}\nnew ${neu(m)(k).mkString(",")}")
    }
  }
}
