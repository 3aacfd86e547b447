package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / text-dedup operators.
  *
  * These run inside whole-stage codegen (CosineSimilarity emits Java
  * directly), so the O(n²) similarity hot loops stay allocation-free —
  * a Scala UDF here would box every float array per comparison. At
  * 100 TB this is the difference between a scan-bound and a
  * CPU-bound near-dup pass.
  */

/** cosine(a, b) over two float32 embedding columns, accumulated in
  * f64 left-to-right (matches a straightforward columnar engine's
  * double-precision evaluation to ~1 ulp). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Hash64 {
  /** FNV-1a 64-bit over UTF-8 bytes — deterministic, dependency-free.
    * Used for SimHash bit votes and LSH hyperplane seeding. */
  def fnv1a(s: UTF8String): Long = fnv1a(s, 0xcbf29ce484222325L)

  def fnv1a(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Final avalanche (splitmix64) so low bits are well mixed. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash-derived random-hyperplane component in [-1, 1): plane `p`,
    * dimension `d` under `seed`. Replaces materialized plane matrices
    * (no driver-side RNG, no literal trees, no task-binary bloat) —
    * each component is recomputed on demand inside codegen. */
  def planeVal(seed: Long, p: Int, d: Int): Double =
    mix(seed ^ (p.toLong * 0x9e3779b97f4a7c15L) ^ (d.toLong * 0xc2b2ae3d27d4eb4fL)).toDouble / 9.223372036854776e18
}

/** simhash64(tokens): 64-bit SimHash over an array<string> token
  * column (Charikar 2002). Each token's 64-bit hash votes ±1 per bit
  * position; the sign vector is the fingerprint. Near-duplicate
  * documents land within a small Hamming distance. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hash64.mix(Hash64.fnv1a(arr.getUTF8String(i)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val b1 = ctx.freshName("b"); val b2 = ctx.freshName("b")
      val sim = ctx.freshName("sim")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = graft.functions.Hash64.mix(graft.functions.Hash64.fnv1a($arr.getUTF8String($i)));
         |    for (int $b1 = 0; $b1 < 64; $b1++) {
         |      $votes[$b1] += ((($h >>> $b1) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sim = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) {
         |  if ($votes[$b2] > 0) $sim |= (1L << $b2);
         |}
         |${ev.value} = $sim;
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHash {
  /** One-pass MinHash: each token is string-hashed ONCE
    * (FNV-1a + avalanche), then the `nHashes` per-permutation values
    * derive from that 64-bit h via the splitmix64 stream
    * (mix(h + p*golden)) — 64 long-ops instead of 64 re-hashes of
    * the string bytes. Called from both the interpreted eval and the
    * generated code. */
  def compute(arr: ArrayData, nHashes: Int): ArrayData = {
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hash64.mix(Hash64.fnv1a(arr.getUTF8String(i)))
        var p = 0
        while (p < nHashes) {
          val v = Hash64.mix(h + p * 0x9e3779b97f4a7c15L)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** minhash signature over an array<string> token/shingle column
  * (Broder 1997): sig[p] = min over tokens of h_p(token). The
  * equivalent nested higher-order-function formulation
  * (`transform(sequence(...), p -> array_min(transform(...)))`) runs
  * interpreted and re-hashes every string per permutation — measured
  * 86s vs <2s at sf0.1 for the 64-hash signature over ~200-shingle
  * docs. */
case class MinHashSignature(child: Expression, nHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHash.compute(input.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHash.compute($arr, $nHashes);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH signature (Charikar 2002): bit p of the
  * result = sign(dot(embedding, plane_p)), planes derived from
  * `seed` via [[Hash64.planeVal]] — computed inline per (p, d), so
  * the plan carries three scalars instead of an nPlanes x dim
  * literal matrix, and no driver-side action is needed to learn the
  * dimension. Codegen'd: the double loop runs unboxed inside
  * whole-stage codegen. */
case class HyperplaneSignature(child: Expression, seed: Long, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += arr.getFloat(d) * Hash64.planeVal(seed, p, d)
        d += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p"); val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      s"""
         |int $n = $arr.numElements();
         |int $bucket = 0;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += ((double) $arr.getFloat($d)) * graft.functions.Hash64.planeVal(${seed}L, $p, $d);
         |  }
         |  if ($dot >= 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IntersectKernel {
  /** |A ∩ B| for two SORTED, DISTINCT string arrays via a two-pointer
    * merge walk — no hash set, no materialized intersection array
    * (`size(array_intersect(a, b))` builds both per evaluation). */
  def size(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

/** Intersection cardinality of two sorted distinct string arrays —
  * the allocation-free core of exact Jaccard verification. Callers
  * must pre-sort (`array_sort(array_distinct(...))`), which happens
  * once per document instead of per pair. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectKernel.size(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectKernel.size($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DocFingerprintKernel {
  private def firstCp(t: UTF8String): Long =
    if (t.numBytes == 0) 0L
    else {
      val b = t.getByte(0)
      if (b >= 0) b.toLong else t.toString.codePointAt(0).toLong
    }

  private def lastCp(t: UTF8String): Long =
    if (t.numBytes == 0) 0L
    else {
      val b = t.getByte(t.numBytes - 1)
      if (b >= 0) b.toLong
      else { val s = t.toString; s.codePointBefore(s.length).toLong }
    }

  /** Σ i · (chars(tok_i)·131 + cp(first)·7 + cp(last)) mod 1e9+7 —
    * identical to the SQL/DuckDB formulation (ascii() = first/last
    * codepoint; single-byte fast path). */
  def compute(arr: ArrayData): Long = {
    var acc = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        acc += (i + 1).toLong * (t.numChars().toLong * 131L + firstCp(t) * 7L + lastCp(t))
      }
      i += 1
    }
    Math.floorMod(acc, 1000000007L)
  }
}

/** Position-weighted polynomial document fingerprint over a token
  * array — the codegen'd twin of the `aggregate(transform(...))` SQL
  * formulation (which runs interpreted and re-evaluates per-token
  * subexpressions). */
case class DocFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_doc_fingerprint"

  override def nullSafeEval(input: Any): Any =
    DocFingerprintKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.DocFingerprintKernel.compute($arr);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfKernel {
  /** Normalized dot products of `v` against the `k` hash-derived
    * coarse centroids (centroid c, dim d = Hash64.planeVal(seed, c,
    * d); normalized so argmax ~ cosine argmax). Training-free IVF:
    * real deployments replace the centroid function with k-means
    * cells — the plumbing (assign / multi-probe / per-cell join) is
    * identical. */
  private def cellScores(v: ArrayData, seed: Long, k: Int): Array[Double] = {
    val dim = v.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var norm = 0.0
      var d = 0
      while (d < dim) {
        val p = Hash64.planeVal(seed, c, d)
        dot += v.getFloat(d) * p
        norm += p * p
        d += 1
      }
      out(c) = if (norm == 0.0) 0.0 else dot / math.sqrt(norm)
      c += 1
    }
    out
  }

  def assign(v: ArrayData, seed: Long, k: Int): Int = {
    val s = cellScores(v, seed, k)
    var best = 0
    var c = 1
    while (c < k) { if (s(c) > s(best)) best = c; c += 1 }
    best
  }

  def probe(v: ArrayData, seed: Long, k: Int, nProbe: Int): ArrayData = {
    val s = cellScores(v, seed, k)
    val idx = Array.tabulate(k)(identity).sortBy(c => (-s(c), c)).take(nProbe)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx)
  }
}

/** IVF cell assignment: index of the nearest coarse centroid. */
case class IvfAssign(child: Expression, seed: Long, nCells: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ivf_assign"
  override def nullSafeEval(input: Any): Any =
    IvfKernel.assign(input.asInstanceOf[ArrayData], seed, nCells)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.IvfKernel.assign($arr, ${seed}L, $nCells);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF multi-probe: the nProbe nearest cells, best first. */
case class IvfProbe(child: Expression, seed: Long, nCells: Int, nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_probe"
  override def nullSafeEval(input: Any): Any =
    IvfKernel.probe(input.asInstanceOf[ArrayData], seed, nCells, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.IvfKernel.probe($arr, ${seed}L, $nCells, $nProbe);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TrainedIvfKernel {
  /** Dot products of `v` against `k` trained centroids packed row-major
    * into one flat float array (centroids are unit-normalized at
    * training time, so argmax-dot == argmax-cosine; |v| is constant
    * across cells and never needs computing). Plain multiply-adds over
    * primitive arrays — cheaper per row than the hash-centroid kernel,
    * which re-derives every plane component through the mix() hash. */
  private def scores(v: ArrayData, cents: ArrayData): Array[Double] = {
    val dim = v.numElements()
    val k = if (dim == 0) 0 else cents.numElements() / dim
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      val base = c * dim
      var d = 0
      while (d < dim) {
        dot += v.getFloat(d) * cents.getFloat(base + d)
        d += 1
      }
      out(c) = dot
      c += 1
    }
    out
  }

  def assign(v: ArrayData, cents: ArrayData): Int = {
    val s = scores(v, cents)
    if (s.isEmpty) return 0
    var best = 0
    var c = 1
    while (c < s.length) { if (s(c) > s(best)) best = c; c += 1 }
    best
  }

  def probe(v: ArrayData, cents: ArrayData, nProbe: Int): ArrayData = {
    val s = scores(v, cents)
    val idx = Array.tabulate(s.length)(identity).sortBy(c => (-s(c), c)).take(nProbe)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx)
  }
}

/** IVF cell assignment against TRAINED centroids: the centroid matrix
  * arrives as a flat array<float> literal child (k·dim values — coarse
  * quantization keeps this a few KB by design, e.g. 16×64×4 B; it is a
  * plan constant, folded into the codegen references array, NOT
  * recomputed per row). Centroids come from
  * [[graft.operators.VectorOps.trainIvfCentroids]] (sampled spherical
  * k-means). */
case class TrainedIvfAssign(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ivf_assign_trained"
  override def nullSafeEval(v: Any, cents: Any): Any =
    TrainedIvfKernel.assign(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) =>
      s"${ev.value} = graft.functions.TrainedIvfKernel.assign($v, $cents);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Multi-probe against trained centroids: the `nProbe` nearest cells,
  * best first. */
case class TrainedIvfProbe(left: Expression, right: Expression, nProbe: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_probe_trained"
  override def nullSafeEval(v: Any, cents: Any): Any =
    TrainedIvfKernel.probe(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) =>
      s"${ev.value} = graft.functions.TrainedIvfKernel.probe($v, $cents, $nProbe);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def litLong(e: Expression): Long =
    e.eval(null).asInstanceOf[Number].longValue()

  /** The full function surface, shared by [[graft.GraftExtensions]]
    * (session-level injection, SQL-visible) and [[register]]
    * (programmatic fallback for externally built sessions). */
  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      es => CosineSimilarity(es(0), es(1))),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      es => SimHash64(es.head)),
    ("graft_hyperplane_sig",
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
      es => HyperplaneSignature(es(0), litLong(es(1)), litLong(es(2)).toInt)),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      es => MinHashSignature(es(0), litLong(es(1)).toInt)),
    ("graft_doc_fingerprint",
      new ExpressionInfo(classOf[DocFingerprint].getName, "graft_doc_fingerprint"),
      es => DocFingerprint(es.head)),
    ("graft_normalize_text",
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      es => NormalizeText(es.head)),
    ("graft_zorder",
      new ExpressionInfo(classOf[ZOrder2D].getName, "graft_zorder"),
      es => ZOrder2D(es(0), es(1))),
    ("graft_sorted_intersect_size",
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_sorted_intersect_size"),
      es => SortedIntersectSize(es(0), es(1))),
    ("graft_ivf_assign",
      new ExpressionInfo(classOf[IvfAssign].getName, "graft_ivf_assign"),
      es => IvfAssign(es(0), litLong(es(1)), litLong(es(2)).toInt)),
    ("graft_ivf_probe",
      new ExpressionInfo(classOf[IvfProbe].getName, "graft_ivf_probe"),
      es => IvfProbe(es(0), litLong(es(1)), litLong(es(2)).toInt, litLong(es(3)).toInt)),
    ("graft_ivf_assign_trained",
      new ExpressionInfo(classOf[TrainedIvfAssign].getName, "graft_ivf_assign_trained"),
      es => TrainedIvfAssign(es(0), es(1))),
    ("graft_ivf_probe_trained",
      new ExpressionInfo(classOf[TrainedIvfProbe].getName, "graft_ivf_probe_trained"),
      es => TrainedIvfProbe(es(0), es(1), litLong(es(2)).toInt)),
    ("graft_topk",
      new ExpressionInfo(classOf[BoundedTopK].getName, "graft_topk"),
      es => BoundedTopK(es(0), es(1), litLong(es(2)).toInt)),
    ("graft_kll_agg",
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      es => KllSketchAgg(es(0), litLong(es(1)).toInt)),
    ("graft_kll_merge",
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      es => KllMergeAgg(es(0), litLong(es(1)).toInt)),
    ("graft_kll_quantile",
      new ExpressionInfo(classOf[KllQuantile].getName, "graft_kll_quantile"),
      es => KllQuantile(es(0), es(1).eval(null).asInstanceOf[Number].doubleValue())),
    // Spark's own (non-SQL-registered) runtime-filter expressions,
    // surfaced so operators can build/apply semi-join bloom pruning
    // explicitly: graft_bloom_agg(xxhash64(key), estItems) -> binary
    // sketch; graft_bloom_might_contain(sketch, xxhash64(key)) ->
    // boolean. Same pair InjectRuntimeFilter plans internally.
    ("graft_bloom_agg",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), litLong(es(1)))),
    ("graft_bloom_might_contain",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_might_contain"),
      es => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))

  /** Idempotent registration for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions`; no-ops (and logs
    * nothing) when the functions are already present. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, info, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
