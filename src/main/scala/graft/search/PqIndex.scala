package graft.search

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType, DoubleType}

/**
 * Product quantization — the faiss `PQm` factory path
 * (/root/reference/backend/faiss_searcher.py:100-107 accepts any
 * index_factory string, PQ included). Vectors are split into `m`
 * subspaces; each subspace gets a 256-centroid codebook (driver-side
 * Lloyd on a bounded sample, like the IVF coarse quantizer); every vector
 * is stored as `m` BYTES instead of `dim` floats — a dim·4/m× memory
 * compression, which is what makes a 100 TB vector corpus cacheable.
 *
 * Search uses asymmetric distance computation (ADC): per query ONE
 * `m × 256` table of exact subspace distances is built, then each stored
 * code costs `m` table lookups. The per-partition table amortization is
 * genuine imperative logic, so the scorer is a `mapPartitions` over the
 * codes (the documented last-resort tier — nothing declarative can hoist
 * per-query state across rows); everything around it (top-k merge,
 * payload join) stays in the declarative plan.
 *
 * Approximate by construction (codes quantize), fully deterministic given
 * the seeded sample — recall against exact search is spec-gated.
 */
object PqIndex {
  private[search] val CODES = "__pq_codes"
  val K = 256 // centroids per subspace = 1 byte per code (nbits=8)

  /** Per-subspace codebooks: `m × 2^nbits × dsub`, Lloyd on a
    * deterministic bounded sample (one collect, reused for every
    * subspace). `nbits=4` (faiss `PQmx4`) fits 16-centroid codebooks
    * whose codes nibble-pack two per byte at encode. */
  def fitCodebooks(df: DataFrame, vecCol: String, m: Int, dim: Int,
      total: Long, nbits: Int = 8): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"PQ: dim $dim must divide into m=$m subspaces")
    require(nbits == 8 || nbits == 4, s"PQ nbits must be 8 or 4, got $nbits")
    val dsub = dim / m
    val maxTrain = 100000L
    val fraction = if (total <= maxTrain) 1.0 else maxTrain.toDouble / total
    val sample = (if (fraction < 1.0) df.sample(withReplacement = false, fraction, seed = 42) else df)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      IvfIndex.lloyd(sub, math.min(1 << nbits, sub.length), iters = 10)
    }
  }

  /** Encode kernel: nearest codebook centroid per subspace → m codes in
    * `m·nbits/8` bytes. nbits=8 stores one code per byte; nbits=4
    * nibble-packs two (hi nibble = even subspace, lo = odd; an odd
    * trailing subspace packs alone in the hi nibble — the [[SqIndex]]
    * convention). */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Float]]],
      nbits: Int): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](if (nbits == 4) (m + 1) / 2 else m)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = codebooks(s)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = v.getFloat(off + i).toDouble - cent(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      if (nbits == 4) {
        if ((s & 1) == 0) out(s >> 1) = (best << 4).toByte
        else out(s >> 1) = (out(s >> 1) | best).toByte
      } else out(s) = best.toByte
      off += dsub
      s += 1
    }
    out
  }

  def encodeCol(v: Column, codebooks: Array[Array[Array[Float]]],
      nbits: Int = 8): Column =
    column(PqEncodeExpr(expression(v), codebooks, nbits))

  /**
   * One query's ADC scorer. Every reference metric decomposes over the `m`
   * subspaces (faiss_searcher.py:77-86 resolves 8 metrics; faiss serves
   * them all through any factory string, PQ included):
   *
   *  - additive (ip/cos-on-normalized dot, l2, l1, lp, canberra,
   *    jensen_shannon): `dist = Σ_s table(s, code_s)`;
   *  - max-combined (linf): `dist = max_s table(s, code_s)`;
   *  - ratio of two sums (bray_curtis): numerator and denominator each get
   *    a table, `dist = Σ num / Σ den` (0 when the denominator is 0,
   *    matching [[graft.functions.VectorKernels.brayCurtis]]).
   *
   * Tables are `m × 256` exact subspace contributions against the
   * codebook centroids, laid out flat as `table(s·256 + c)`; scoring a
   * stored code is `m` lookups regardless of metric.
   */
  final class AdcScorer(t1: Array[Double], t2: Array[Double], isMax: Boolean,
      mSub: Int, nbits: Int) {
    private[this] val kStride = 1 << nbits
    // per-subspace table lookups in ascending-s order for BOTH widths —
    // 4-bit codes unpack to two lookups per byte rather than pairing into
    // byte-level tables, so the double-accumulation order (and thus the
    // rounded result) is identical to the 8-bit path and the SQL oracle
    @inline private[this] def codeAt(codes: Array[Byte], s: Int): Int =
      if (nbits == 8) codes(s) & 0xff
      else if ((s & 1) == 0) (codes(s >> 1) >> 4) & 0xf
      else codes(s >> 1) & 0xf
    def score(codes: Array[Byte]): Double = {
      val m = mSub
      var s = 0
      if (isMax) {
        var acc = 0.0
        while (s < m) {
          val v = t1(s * kStride + codeAt(codes, s)); if (v > acc) acc = v; s += 1
        }
        acc
      } else if (t2 == null) {
        var acc = 0.0
        while (s < m) { acc += t1(s * kStride + codeAt(codes, s)); s += 1 }
        acc
      } else {
        var num = 0.0
        var den = 0.0
        while (s < m) {
          val o = s * kStride + codeAt(codes, s)
          num += t1(o); den += t2(o); s += 1
        }
        if (den == 0.0) 0.0 else num / den
      }
    }
  }

  /** Build the ADC scorer for `metricName` (same names as
    * [[graft.functions.VectorFunctions.metric]]); `metricArg` is the
    * Minkowski p for `lp`; `nbits` is the stored code width (8 = byte
    * codes, 4 = nibble-packed — tables shrink to 16 entries/subspace). */
  def adcScorer(qv: Array[Float], cbs: Array[Array[Array[Float]]],
      metricName: String, metricArg: Double, nbits: Int = 8): AdcScorer = {
    val m = cbs.length
    val kStride = 1 << nbits
    val t1 = new Array[Double](m * kStride)
    val isMax = metricName == "l_inf" || metricName == "linf"
    val isRatio = metricName == "brayCurtis" || metricName == "bray_curtis"
    val t2 = if (isRatio) new Array[Double](m * kStride) else null
    var s = 0
    // running query offset: subspace widths may differ (SQ4 packs an odd
    // trailing dim into a size-1 subspace after size-2 pairs), so the
    // query slice for subspace s starts where s-1's ended, not at s·dsub
    var off = 0
    while (s < m) {
      val cb = cbs(s)
      val dsub = cb(0).length
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var acc = 0.0
        var acc2 = 0.0
        var i = 0
        metricName match {
          case "ip" | "dot" | "cos" => // cos: vectors pre-normalized at fit
            while (i < dsub) { acc += qv(off + i).toDouble * cent(i); i += 1 }
          case "l2" =>
            while (i < dsub) { val d = qv(off + i).toDouble - cent(i); acc += d * d; i += 1 }
          case "l1" =>
            while (i < dsub) { acc += math.abs(qv(off + i).toDouble - cent(i)); i += 1 }
          case "l_inf" | "linf" =>
            while (i < dsub) {
              val d = math.abs(qv(off + i).toDouble - cent(i))
              if (d > acc) acc = d
              i += 1
            }
          case "l_p" | "lp" =>
            while (i < dsub) {
              acc += math.pow(math.abs(qv(off + i).toDouble - cent(i)), metricArg); i += 1
            }
          case "canberra" =>
            while (i < dsub) {
              val x = qv(off + i).toDouble; val y = cent(i).toDouble
              val den = math.abs(x) + math.abs(y)
              if (den > 0.0) acc += math.abs(x - y) / den
              i += 1
            }
          case "jensen_shannon" =>
            while (i < dsub) {
              val x = qv(off + i).toDouble; val y = cent(i).toDouble
              val mid = 0.5 * (x + y)
              val a1 = if (x > 0.0 && mid > 0.0) 0.5 * x * math.log(x / mid) else 0.0
              val a2 = if (y > 0.0 && mid > 0.0) 0.5 * y * math.log(y / mid) else 0.0
              acc += a1 + a2
              i += 1
            }
          case "brayCurtis" | "bray_curtis" =>
            while (i < dsub) {
              val x = qv(off + i).toDouble; val y = cent(i).toDouble
              acc += math.abs(x - y); acc2 += math.abs(x + y)
              i += 1
            }
          case other => throw new IllegalArgumentException(
            s"no ADC decomposition for metric '$other'")
        }
        t1(s * kStride + c) = acc
        if (t2 != null) t2(s * kStride + c) = acc2
        c += 1
      }
      off += dsub
      s += 1
    }
    new AdcScorer(t1, t2, isMax, m, nbits)
  }

  /** Queries per broadcast chunk: bounds DRIVER memory (one chunk of
    * vectors collected at a time) and EXECUTOR table memory (chunk·m·256
    * doubles of ADC tables per partition) regardless of query-batch size —
    * a corpus self-search no longer OOMs the driver. Each chunk costs one
    * pass over the (byte-code, cached) corpus, the standard batching trade. */
  val DefaultQueryChunk = 4096

  private[search] val hitSchema = StructType(Seq(
    StructField(SparkSearcher.QID, LongType, nullable = false),
    StructField(SparkSearcher.ROW_ID, LongType, nullable = false),
    StructField(SparkSearcher.DIST, DoubleType, nullable = false)))

  /** Deterministic chunk split of a query DataFrame: hash-bucket on qid —
    * no collect of the full batch, each chunk collected separately. */
  private[search] def queryChunks(queries: DataFrame, chunkSize: Int): Seq[DataFrame] = {
    import SparkSearcher.QID
    val nq = queries.count()
    val nChunks = math.max(1, math.ceil(nq.toDouble / chunkSize).toInt)
    if (nChunks == 1) Seq(queries)
    else (0 until nChunks).map(ci =>
      queries.filter(pmod(xxhash64(col(QID)), lit(nChunks)) === ci))
  }

  /** ADC top-k: broadcast the query batch in bounded CHUNKS, stream the
    * code rows, amortize one [[AdcScorer]] per query per partition,
    * bounded heaps, then the same aggregate-merge tail as exact search.
    * `metricName`/`metricArg` select the subspace decomposition — all 8
    * reference metrics are served (see [[adcScorer]]). */
  def pqTopK(indexed: DataFrame, queries: DataFrame, topK: Int,
      codebooks: Array[Array[Array[Float]]], metricName: String,
      metricArg: Double = 2.0,
      queryChunkSize: Int = DefaultQueryChunk, nbits: Int = 8): DataFrame = {
    import SparkSearcher.{QID, QVEC, ROW_ID, DIST, RANK}
    val spark = indexed.sparkSession
    val cbB = spark.sparkContext.broadcast(codebooks)
    val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(hitSchema)
    val asc = !Set("ip", "dot", "cos").contains(metricName)
    val k = topK
    val chunkPartials = queryChunks(queries, queryChunkSize).flatMap { chunk =>
      val qRows = chunk.select(col(QID).cast(LongType).as(QID), col(QVEC)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      if (qRows.isEmpty) None else Some {
        val qB = spark.sparkContext.broadcast(qRows)
        indexed.select(col(ROW_ID), col(CODES)).mapPartitions { it =>
          val cbs = cbB.value
          val qs = qB.value
          // per-query ADC scorers — built once per partition
          val scorers = qs.map { case (_, qv) => adcScorer(qv, cbs, metricName, metricArg, nbits) }
          val heaps = qs.map(_ => new TopKBuffer(k, asc))
          it.foreach { r =>
            val rowId = r.getLong(0)
            val codes = r.getAs[Array[Byte]](1)
            var q = 0
            while (q < qs.length) {
              heaps(q).insert(scorers(q).score(codes), rowId)
              q += 1
            }
          }
          qs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
            heaps(qi).sorted.iterator.map { case (id, d) => Row(qid, id, d) }
          }
        }(enc)
      }
    }
    // empty query batch: no chunks produced rows — return the empty hit
    // shape (the exact path's crossJoin degrades the same way)
    if (chunkPartials.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], hitSchema)
        .withColumn(RANK, lit(1).cast("int"))
    // chunks are disjoint query sets, so union THEN one merge is exact:
    // k per partition per query → global k (same heap aggregate)
    TopKAggregate.mergeHits(chunkPartials.reduce(_ union _), topK, asc)
  }
}

object IvfPqScorer {
  import SparkSearcher.{QID, QVEC, ROW_ID, DIST, RANK}

  /** IVF+PQ ADC search: like [[PqIndex.pqTopK]] but each row is scored
    * only against the queries probing its cell — the composition that
    * gives BOTH partition pruning (IVF) and 4·dim/m× memory compression
    * (PQ), i.e. the canonical faiss `IVFn,PQm` shape for corpora where
    * neither the full scan nor the float vectors fit. */
  def topK(indexed: DataFrame, queries: DataFrame, topK: Int,
      codebooks: Array[Array[Array[Float]]], centroids: Array[Array[Float]],
      nprobe: Int, metricName: String, metricArg: Double = 2.0,
      queryChunkSize: Int = PqIndex.DefaultQueryChunk,
      nbits: Int = 8): DataFrame = {
    val spark = indexed.sparkSession
    val nlist = centroids.length
    val cbB = spark.sparkContext.broadcast(codebooks)
    val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(PqIndex.hitSchema)
    val asc = !Set("ip", "dot", "cos").contains(metricName)
    val k = topK
    // bounded chunks, same rationale as PqIndex.pqTopK: driver collects and
    // executors table-up at most `queryChunkSize` queries at a time
    val chunkPartials = PqIndex.queryChunks(queries, queryChunkSize).flatMap { chunk =>
      val qRows = chunk
        .select(col(QID).cast("long").as(QID), col(QVEC),
          IvfIndex.nearestCentroidsCol(col(QVEC), centroids,
            IndexStrategy.resolveNprobe(nprobe, nlist)).as("__probes"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
          r.getSeq[Int](2).toArray))
      if (qRows.isEmpty) None else Some {
        val qB = spark.sparkContext.broadcast(qRows)
        indexed
          .select(col(ROW_ID), col(IvfIndex.CID), col(PqIndex.CODES))
          .mapPartitions { it =>
            val cbs = cbB.value
            val qs = qB.value
            val scorers = qs.map { case (_, qv, _) =>
              PqIndex.adcScorer(qv, cbs, metricName, metricArg, nbits)
            }
            // cell → indices of the queries probing it (built once per
            // partition; buffers, not immutable-array appends — a 4096-query
            // chunk concentrating its probes on few cells would otherwise
            // pay O(queries²) element copies per partition)
            val byCellBuf = new java.util.HashMap[Int, scala.collection.mutable.ArrayBuffer[Int]]()
            qs.zipWithIndex.foreach { case ((_, _, probes), qi) =>
              probes.foreach { c =>
                var buf = byCellBuf.get(c)
                if (buf == null) {
                  buf = new scala.collection.mutable.ArrayBuffer[Int]()
                  byCellBuf.put(c, buf)
                }
                buf += qi
              }
            }
            val byCell = new java.util.HashMap[Int, Array[Int]]()
            byCellBuf.forEach((c, buf) => byCell.put(c, buf.toArray))
            val heaps = qs.map(_ => new TopKBuffer(k, asc))
            it.foreach { r =>
              val rowId = r.getLong(0)
              val cell = r.getInt(1)
              val qis = byCell.get(cell)
              if (qis != null) {
                val codes = r.getAs[Array[Byte]](2)
                var j = 0
                while (j < qis.length) {
                  val qi = qis(j)
                  heaps(qi).insert(scorers(qi).score(codes), rowId)
                  j += 1
                }
              }
            }
            qs.iterator.zipWithIndex.flatMap { case ((qid, _, _), qi) =>
              heaps(qi).sorted.iterator.map { case (id, d) => Row(qid, id, d) }
            }
          }(enc)
      }
    }
    if (chunkPartials.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], PqIndex.hitSchema)
        .withColumn(RANK, lit(1).cast("int"))
    TopKAggregate.mergeHits(chunkPartials.reduce(_ union _), topK, asc)
  }
}

/** Codegen'd PQ encoder: array<float> → binary(m·nbits/8); codebooks ride
  * as a plan reference object. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Float]]],
    nbits: Int = 8) extends UnaryExpression {
  require(nbits == 8 || nbits == 4, s"PQ nbits must be 8 or 4, got $nbits")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    PqIndex.encode(v.asInstanceOf[ArrayData], codebooks, nbits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.search.PqIndex.encode($c, $ref, $nbits)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_encode"
  // content equality over the codebook arrays (see HashedLinearScore)
  override def equals(o: Any): Boolean = o match {
    case that: PqEncodeExpr => child == that.child && nbits == that.nbits &&
      java.util.Arrays.deepEquals(codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override lazy val hashCode: Int = java.util.Objects.hash(getClass, child,
    Int.box(nbits),
    Int.box(java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])))
}
