package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** The reference pipeline's per-record transform stage, re-expressed as pure
  * Catalyst column expressions (no UDFs → whole-stage codegen, pushdown-safe).
  *
  * Reference semantics (cited from /root/reference):
  *  - T1 nested-value JSON serialization: `docker/airflow/dags/posts_pipeline.py:36-37`
  *    (`json.dumps` on dict/list values) — schema-driven here: Spark columns are
  *    homogeneously typed, so the per-value `type()` check becomes a per-column
  *    check over `df.schema`.
  *  - T2 ISO-8601 timestamp normalization: `posts_pipeline.py:38-39` — a string
  *    of length 19 with 'T' at index 10 has its 'T's replaced by spaces.
  *  - T3 derived `word_count`: `posts_pipeline.py:41` — Python `len(s.split())`:
  *    split on runs of any whitespace, ignoring leading/trailing; "" → 0.
  */
object IngestTransforms {

  /** T2: `2022-01-01T00:00:00` → `2022-01-01 00:00:00`; any other string
    * shape passes through unchanged (heuristic applies to ANY string field,
    * exactly as the reference's value-shape check does).
    */
  def normalizeIsoTimestamp(c: Column): Column =
    when(length(c) === 19 && substring(c, 11, 1) === "T",
      regexp_replace(c, "T", " ")).otherwise(c)

  /** T3: Python `len(content.split())`. Spark's `split("", "\\s+")` yields
    * `[""]` (size 1) where Python yields 0, hence the empty guard; Python also
    * strips leading/trailing whitespace of ANY kind, hence the regexp trim
    * (Spark `trim` only strips spaces).
    */
  def wordCount(c: Column): Column = {
    val stripped = regexp_replace(c, "^\\s+|\\s+$", "")
    when(c.isNull, lit(null)).otherwise(
      when(stripped === "", 0).otherwise(size(split(stripped, "\\s+"))))
  }

  /** T1, schema-driven: stringify every struct/array column with `to_json`,
    * leaving scalar columns in place (same column name, same order).
    */
  def serializeNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType => to_json(col(f.name)).as(f.name)
        case _                            => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** A1/J3 insert-ignore: `ON CONFLICT ON CONSTRAINT pk DO NOTHING`
    * (`posts_pipeline.py:57`) ≡ dedup-within-batch + anti-join against the
    * existing table on the PK. At scale both sides shuffle on the key unless
    * `existingKeys` is broadcastable; Catalyst/AQE picks the strategy.
    */
  def insertIgnore(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.dropDuplicates(key)
      .join(existing.select(key).dropDuplicates(key), Seq(key), "left_anti")

  /** [[insertIgnore]] with a Bloom-filter semi-join reduction — the shape the
    * anti-join needs when `existing` is the 100 TB already-loaded corpus and
    * `incoming` is a batch: a one-pass mergeable sketch over the existing
    * keys replaces "shuffle the whole target against the batch" with "probe
    * a broadcast bitset, then exact-check only the might-contain survivors".
    *
    * Exactness does not depend on the filter's quality: Bloom filters have
    * no false NEGATIVES, so a key the probe rejects is definitely absent
    * from `existing` and is kept outright; only might-contain keys (true
    * hits + fpp false positives) reach the exact anti-join, whose existing
    * side Catalyst can now semi-join-reduce to the candidate keys. A
    * degraded (undersized) sketch degrades pruning, never correctness —
    * `BloomJoinSpec` checks result ≡ plain [[insertIgnore]] and that the
    * sketch actually prunes.
    *
    * Cost model vs [[insertIgnore]] at scale: one extra narrow pass over
    * `existing` (count + sketch build, both key-column-only scans that
    * combine map-side) + one sketch broadcast (~1.2 bytes/key at 3% fpp —
    * 120 MB per 100M keys; above that, raise
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` or shard by key
    * range), against shuffling `existing` in full. The in-batch dedup still
    * shuffles `incoming` once; the two post-dedup branches reuse that
    * exchange (same child plan), so the batch is shuffled once, not twice.
    *
    * The probe column is computed BEFORE `dropDuplicates`: it is a pure
    * function of the key, so every duplicate row of a key agrees on it and
    * the arbitrary-survivor semantics of [[insertIgnore]] are preserved.
    */
  def bloomInsertIgnore(incoming: DataFrame, existing: DataFrame, key: String,
      fpp: Double = 0.03): DataFrame = {
    val existingKeys = existing.select(col(key))
    // sizing pass: the sketch must be built for the real key cardinality or
    // fpp degrades silently. At 100 TB this count comes from table metadata;
    // here it is one key-only columnar scan.
    val nKeys = math.max(existingKeys.count(), 1L)
    // optimal bits m = -n ln p / (ln 2)^2 (standard Bloom sizing)
    val nBits = math.max(64L,
      math.ceil(-nKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val sketch = existingKeys
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(key)), lit(nKeys), lit(nBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    // The deduped batch feeds BOTH branches LAZILY — each branch re-runs
    // the batch scan and the dedup shuffle (verified executed: no AQE
    // stage reuse bridges the two differently-filtered consumers). An r21
    // draft checkpointed it, and the 100× replica measured the
    // materialization 1.85× SLOWER than the duplicate dedup (19.9 →
    // 36.8 s, BENCH_100x_touched_r21_*.json): pinning a full-width batch
    // in the block manager costs more than re-shuffling it, at exactly the
    // batch sizes where the duplication is worth anything — the r20
    // ADVICE's fact-scale-pin hazard, measured. Kept lazy on purpose.
    val deduped = bloomDedupedBatch(incoming, key, sketch)
    val definitelyNew = deduped.filter(!col("__might")).drop("__might")
    val candidates = deduped.filter(col("__might")).drop("__might")
      .join(existingKeys.dropDuplicates(key), Seq(key), "left_anti")
    definitelyNew.unionByName(candidates)
  }

  /** The deduped-batch subtree of [[bloomInsertIgnore]]: the probe column
    * (computed BEFORE the dedup — a pure function of the key, so every
    * duplicate row of a key agrees on it) plus the in-batch dedup.
    * Factored so BloomJoinSpec pins the Bloom probe on the subtree that
    * computes it.
    */
  private[graft] def bloomDedupedBatch(incoming: DataFrame, key: String,
      sketch: Array[Byte]): DataFrame =
    incoming
      .withColumn("__might",
        call_function("graft_bloom_might", lit(sketch), xxhash64(col(key))))
      .dropDuplicates(key)

  /** Deterministic first-writer-wins variant of [[insertIgnore]]: the survivor
    * per key is the row with the smallest `orderCols` (arrival order made
    * explicit), mirroring the reference's sequential INSERT ... ON CONFLICT DO
    * NOTHING loop (`posts_pipeline.py:53-59`), where "first" is defined by
    * batch order. `dropDuplicates` alone keeps an arbitrary row per key;
    * this keeps a reproducible one — required for oracle checking and for
    * idempotent re-runs at scale.
    */
  def insertIgnoreDeterministic(incoming: DataFrame, existing: DataFrame,
      key: String, orderCols: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(orderCols: _*)
    incoming
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .join(existing.select(key).dropDuplicates(key), Seq(key), "left_anti")
  }
}
