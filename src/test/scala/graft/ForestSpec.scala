package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GridMeta
import graft.operators.{Cart, Predict}
import graft.queries.StackQueries
import graft.sources.RasterStack

/**
 * Tree-ensemble predict (operators.Cart + Predict.Forest*Model) — the
 * reference's actual estimator family (tests/test_prediction.py trains
 * RandomForestClassifier/Regressor through predict/predict_proba).
 * q80/q81 pin the frozen forests cross-engine; these specs pin the
 * Column ≡ scalar parity, the argmax tie rule, trainer determinism,
 * and that training actually reduces error.
 */
class ForestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val G = GridMeta.TestGrid
  private def st = StackQueries.stack(spark)

  test("forest regressor: Column path ≡ scalar treeEval on valid pixels") {
    val model = StackQueries.RegForest
    val got = Predict.predict(st.df, StackQueries.ForestFeats, model)
      .where(StackQueries.ForestFeats.map(col(_).isNotNull).reduce(_ && _))
      .select("row", "col", "b1", "b2", "b3", "b4", "b5", "pred_raw_0")
      .limit(2000).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val x = Array.tabulate(5)(i => r.getDouble(2 + i))
      assert(r.getDouble(7) === model.predict(x), s"pixel (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("forest classifier: probs sum to 1, pred ≡ scalar argmax, codegen path (no UDF)") {
    val model = StackQueries.ClsForest
    val d = Predict.predict(
      Predict.predictProba(st.df, StackQueries.ForestFeats, model),
      StackQueries.ForestFeats, model)
    // fast path: no ScalaUDF in the plan (generic ProbPredictors keep the UDF)
    assert(!d.queryExecution.optimizedPlan.toString.contains("UDF"))
    val rows = d.where(StackQueries.ForestFeats.map(col(_).isNotNull).reduce(_ && _))
      .select("b1", "b2", "b3", "b4", "b5", "prob_0", "prob_1", "prob_2", "pred_raw_0")
      .limit(2000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = Array.tabulate(5)(i => r.getDouble(i))
      val ps = Seq(5, 6, 7).map(r.getDouble)
      assert(math.abs(ps.sum - 1.0) < 1e-9)
      assert(ps === model.predictProba(x).toSeq)
      assert(r.getDouble(8) === model.predict(x))
    }
  }

  test("argmax tie rule: first max wins (numpy argmax), Column ≡ scalar") {
    // hand-built 1-tree 'forest' whose leaf is a perfect 3-way tie
    val tie = Predict.ForestClassifierModel(
      Array(Predict.Leaf(Array(1.0 / 3, 1.0 / 3, 1.0 / 3))), 3)
    assert(tie.predict(Array(0.0)) === 0.0)
    val d = Seq((1.0, 2.0)).toDF("f", "ignore")
    assert(d.select(tie.column(Seq(col("f"))).as("p")).head.getDouble(0) === 0.0)
    // and a later-class strict max is found
    val skew = Predict.ForestClassifierModel(
      Array(Predict.Leaf(Array(0.2, 0.3, 0.5))), 3)
    assert(skew.predict(Array(0.0)) === 2.0)
  }

  test("trainer is deterministic and beats the constant-mean predictor") {
    val model = StackQueries.RegForest
    val again = Cart.fitRegressionForest(sample._1, sample._2,
      Cart.Config(nTrees = 10, maxDepth = 4, minLeaf = 5, mtry = 5, seed = 29))
    assert(model.sql(StackQueries.ForestFeats) === again.sql(StackQueries.ForestFeats))
    val (xs, ys) = sample
    val mean = ys.sum / ys.length
    val sseMean = ys.map(y => (y - mean) * (y - mean)).sum
    val sseForest = xs.zip(ys).map { case (x, y) =>
      val p = model.predict(x); (y - p) * (y - p)
    }.sum
    assert(sseForest < sseMean, s"forest SSE $sseForest vs mean SSE $sseMean")
  }

  private lazy val sample: (Array[Array[Double]], Array[Double]) = {
    val rows = for {
      key <- 5L until G.cells by 101L
      r = key / G.width; c = key % G.width
      vals = RasterStack.NcBands.map(RasterStack.bandScalar(r, c, _))
      if vals.forall(_.isDefined)
    } yield (vals.init.map(_.get).toArray, vals.last.get)
    (rows.map(_._1).toArray, rows.map(_._2).toArray)
  }

  test("fitForestFrom: bounded deterministic collect, stable across plans") {
    val cfg = Cart.Config(nTrees = 3, maxDepth = 3, minLeaf = 5, mtry = 5, seed = 7)
    val key = col("row") * G.width.toLong + col("col")
    val m1 = Cart.fitForestFrom(st.df, StackQueries.ForestFeats, "b7", key, 500, cfg)
    val m2 = Cart.fitForestFrom(st.df.repartition(7), StackQueries.ForestFeats, "b7", key, 500, cfg)
    assert(m1.sql(StackQueries.ForestFeats) === m2.sql(StackQueries.ForestFeats))
  }
}
