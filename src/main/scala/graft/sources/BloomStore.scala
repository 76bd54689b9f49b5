package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{call_function, col, lit}
import org.apache.spark.util.sketch.BloomFilter

/** Versioned on-storage Bloom sketches for
  * [[Sinks.appendInsertIgnoreSketched]] — the standing "what keys has this
  * target already absorbed" summary a streaming insert-ignore maintains so
  * it stops re-reading its own history every micro-batch.
  *
  * Layout: `<targetPath>__bloom/bloom-v<version>-c<capacity>-b<bits>-n<keys>.bf`,
  * each file a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (`writeTo`/`readFrom` — the same bytes `graft_bloom_agg` emits and
  * `graft_bloom_might_file` / [[graft.functions.BloomFileCache]] load).
  * Files are IMMUTABLE once renamed into place: every update writes the
  * next version to a temp name and atomically moves it, so (a) the
  * executor LRU cache can never serve stale bits for a path, and (b) a
  * crash mid-write leaves only an orphan temp file, never a torn sketch.
  * A replayed micro-batch re-derives a byte-identical merge (Bloom OR is
  * idempotent), so replays can only add a redundant version, never a
  * conflicting one. Metadata (capacity/bits/key-count) rides in the file
  * name — the rename that publishes the bits publishes the metadata with
  * them.
  *
  * In the sandbox the store is a local temp path; on a cluster the same
  * calls run against shared storage (the [[graft.functions.BloomFileCache]]
  * contract). Old versions are GC fodder — each is superseded by the next,
  * and nothing ever reads two.
  */
private[graft] object BloomStore {
  final case class SketchRef(file: Path, version: Long, capacity: Long,
      nBits: Long, nKeys: Long)

  private val Name = """bloom-v(\d+)-c(\d+)-b(\d+)-n(\d+)\.bf""".r

  def dir(targetPath: String): Path = Paths.get(targetPath + "__bloom")

  /** Standard Bloom sizing: m = −n·ln p / (ln 2)². */
  def optimalBits(nKeys: Long, fpp: Double): Long = math.max(64L,
    math.ceil(-nKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  /** Highest published sketch version for a target, if any. */
  def latest(targetPath: String): Option[SketchRef] = {
    val d = dir(targetPath)
    if (!Files.isDirectory(d)) return None
    Files.list(d).iterator().asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case Name(v, c, b, n) =>
            Some(SketchRef(p, v.toLong, c.toLong, b.toLong, n.toLong))
          case _ => None
        }
      }
      .toSeq.sortBy(_.version).lastOption
  }

  /** Publish the next sketch version = `prior` (or empty) ∪ `keyHashes`
    * (a single-column `h: BIGINT` frame of xxhash64 key hashes — hashed
    * exactly as `graft_bloom_might_file` probes will hash). The distributed
    * aggregate builds the batch-side sketch with the SAME (capacity, bits)
    * as `prior`, so the driver-side `mergeInPlace` (register-wise OR) is
    * always compatible; the result lands via temp-file + atomic rename.
    */
  def writeMerged(targetPath: String, prior: Option[SketchRef],
      keyHashes: DataFrame, capacity: Long, nBits: Long, nKeys: Long): Unit = {
    val batchBytes = keyHashes
      .agg(call_function("graft_bloom_agg", col("h"), lit(capacity), lit(nBits)))
      .head().getAs[Array[Byte]](0) // null when keyHashes is empty
    val merged = prior match {
      case Some(ref) =>
        val in = Files.newInputStream(ref.file)
        val cur = try BloomFilter.readFrom(in) finally in.close()
        if (batchBytes != null) cur.mergeInPlace(BloomFilter.readFrom(batchBytes))
        cur
      case None =>
        if (batchBytes != null) BloomFilter.readFrom(batchBytes)
        else BloomFilter.create(capacity, nBits)
    }
    val d = dir(targetPath)
    Files.createDirectories(d)
    val version = latest(targetPath).map(_.version + 1).getOrElse(0L)
    val name = s"bloom-v$version-c$capacity-b$nBits-n$nKeys.bf"
    val tmp = Files.createTempFile(d, s".tmp-$name", "")
    val out = Files.newOutputStream(tmp)
    try merged.writeTo(out) finally out.close()
    Files.move(tmp, d.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }
}
