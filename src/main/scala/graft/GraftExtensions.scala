package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extensions entry point: registers every native graft expression
 * as a SQL function at session build time, so a cluster deployment enables
 * the engine's functions with
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *
 * or `SparkSession.builder().withExtensions(new GraftExtensions)` in code —
 * no per-session imperative registration calls. This is the standard
 * library-integration surface (the same hook Iceberg/Delta use); the
 * `register(spark)` helpers on the expression objects remain for notebook
 * use on an already-built session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.graftfns.{TextExpressions, VectorExpressions}

  private def fn(name: String, arity: Int,
                 build: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (exprs: Seq[Expression]) => {
      require(exprs.length == arity, s"$name expects $arity arguments, got ${exprs.length}")
      build(exprs)
    }
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("normalize_text", 1,
      es => TextExpressions.NormalizeText(es.head)))
    ext.injectFunction(fn("cosine_fast", 2,
      es => VectorExpressions.CosineSimilarity(es(0), es(1))))
    ext.injectFunction(fn("l2_dist", 2,
      es => VectorExpressions.L2Distance(es(0), es(1))))
    ext.injectFunction(fn("hyperplane_sig", 3,
      es => VectorExpressions.HyperplaneSignature(es(0), es(1), es(2))))
    ext.injectFunction(fn("quantize_i8", 1,
      es => VectorExpressions.QuantizeI8(es.head)))
    ext.injectFunction(fn("euclidean_sig", 4, es => {
      // bucket width is a constructor parameter (compile-time constant in
      // every generated plan) — fold the SQL argument at build time
      require(es(3).foldable, "euclidean_sig width must be a literal")
      val w = es(3).eval() match {
        case d: java.lang.Number => d.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => throw new IllegalArgumentException(
          s"euclidean_sig width must be numeric, got $other")
      }
      VectorExpressions.EuclideanSignature(es(0), es(1), es(2), w)
    }))
    // Composite Column helpers from the linking layer, registered through
    // the public bridge so SQL users get the SAME construction the Scala
    // API builds (shingling -> minhash -> band keys, SURVEY §2.9 M2-M4):
    //   graft_shingles(text, n)           -> array<string>
    //   minhash_sig(shingles, k)          -> array<bigint>
    //   band_keys(sig, bands, rowsPerBand)-> array<bigint>
    import org.apache.spark.sql.graftfns.Bridge
    ext.injectFunction(fn("graft_shingles", 2, es =>
      Bridge.expression(graft.link.MinHashBlocking.shingles(
        Bridge.column(es(0)), foldInt(es(1), "graft_shingles n")))))
    ext.injectFunction(fn("minhash_sig", 2, es =>
      Bridge.expression(graft.link.MinHashBlocking.minhashSignature(
        Bridge.column(es(0)), foldInt(es(1), "minhash_sig k")))))
    ext.injectFunction(fn("band_keys", 3, es =>
      Bridge.expression(graft.link.MinHashBlocking.bandKeys(
        Bridge.column(es(0)), foldInt(es(1), "band_keys bands"),
        foldInt(es(2), "band_keys rowsPerBand")))))
    // nearest_centroid(vec, array(array(..), ..)) -> int cell id; the
    // centroid table shapes the expression (a plan constant, like
    // euclidean_sig's width), so it must be a foldable array literal
    ext.injectFunction(fn("nearest_centroid", 2, es =>
      VectorExpressions.NearestCentroid(es(0), foldCentroids(es(1)))))
    //   hash_sample(id, fraction, seed) -> boolean keep-decision; a pure
    //   pushdown-able predicate (same construction the Scala API builds)
    ext.injectFunction(fn("hash_sample", 3, es =>
      Bridge.expression(graft.textops.Sampling.hashSamplePredicate(
        Bridge.column(es(0)), foldDouble(es(1), "hash_sample fraction"),
        foldString(es(2), "hash_sample seed")))))
    // bucket_dot(bks, xs, array(w0, w1, ...)) -> exact pico margin of the
    // hashed-feature classifier; the weight table is a plan constant like
    // nearest_centroid's centroids, so it must be a foldable array literal
    ext.injectFunction(fn("bucket_dot", 3, es =>
      VectorExpressions.BucketDot(es(0), es(1), foldLongs(es(2)))))
  }

  /** Fold a literal array<integral> SQL argument into the dense weight
    * table a [[VectorExpressions.BucketDot]] plan embeds. */
  private def foldLongs(e: Expression): Seq[Long] = {
    require(e.foldable, "bucket_dot weights must be an array literal")
    import org.apache.spark.sql.catalyst.util.ArrayData
    val get: (ArrayData, Int) => Long = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, _) => (a, i) => a.getLong(i)
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType, _) => (a, i) => a.getInt(i).toLong
      case other => throw new IllegalArgumentException(
        s"bucket_dot weights must be array<int|bigint>, got $other")
    }
    val arr = e.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => get(arr, i))
  }

  /** Fold a literal array<array<numeric>> SQL argument into the centroid
    * rows a [[VectorExpressions.NearestCentroid]] plan embeds. */
  private def foldCentroids(e: Expression): Seq[Seq[Double]] = {
    require(e.foldable, "nearest_centroid centroids must be an array literal")
    import org.apache.spark.sql.catalyst.util.ArrayData
    val elem = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(et, _), _) => et
      case other => throw new IllegalArgumentException(
        s"nearest_centroid centroids must be array<array<numeric>>, got $other")
    }
    val outer = e.eval().asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { c =>
      val inner = outer.getArray(c)
      (0 until inner.numElements()).map { j =>
        inner.get(j, elem) match {
          case n: java.lang.Number => n.doubleValue()
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case other => throw new IllegalArgumentException(
            s"nearest_centroid centroid element must be numeric, got $other")
        }
      }
    }
  }

  private def foldDouble(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a numeric literal")
    e.eval() match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }
  }

  private def foldString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
  }

  /** Fold a literal SQL argument to Int at build time (these parameters
    * shape the expression TREE — k minhash columns, b band keys — so they
    * must be plan-time constants, like euclidean_sig's width). */
  private def foldInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an integer literal")
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }
}
