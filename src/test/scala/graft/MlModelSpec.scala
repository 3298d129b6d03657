package graft

import org.apache.spark.sql.functions._

import graft.ops.Ml

/** Model training/prediction surface (reference tribuo.clj): closed-form
  * linear regression (simple + multivariate normal equations), nearest-
  * centroid classification, MLlib-backed logistic, evaluate-regression.
  * The oracle-gated paths are q105/q109/q110; this spec covers the
  * multivariate/iterative paths and the determinism contracts.
  */
class MlModelSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def synth(n: Int, parts: Int) = {
    // y = 3 + 2a − 5b exactly, on exactly-representable values
    spark.range(0, n).repartition(parts)
      .select((col("id") % 97).cast("double").as("a"),
        ((col("id") * 7) % 31).cast("double").as("b"))
      .withColumn("y", lit(3.0) + col("a") * 2.0 - col("b") * 5.0)
  }

  test("multivariate fit recovers exact coefficients") {
    val m = Ml.fitLinearRegression(synth(5000, 8), Seq("a", "b"), "y")
    assert(math.abs(m.intercept - 3.0) < 1e-8, s"intercept ${m.intercept}")
    assert(math.abs(m.coefficients(0) - 2.0) < 1e-10)
    assert(math.abs(m.coefficients(1) + 5.0) < 1e-10)
    // predictions reproduce y on the training frame
    val bad = m.predict(synth(5000, 8))
      .filter(abs(col("prediction") - col("y")) > 1e-6).count()
    assert(bad == 0)
  }

  test("multivariate fit is partition-invariant (exact sums)") {
    val m1 = Ml.fitLinearRegression(synth(4000, 1), Seq("a", "b"), "y")
    val m7 = Ml.fitLinearRegression(synth(4000, 7), Seq("a", "b"), "y")
    assert(m1.intercept == m7.intercept)
    assert(m1.coefficients.toSeq == m7.coefficients.toSeq)
  }

  test("simple fit agrees with multivariate on d=1") {
    val df = synth(3000, 4).withColumn("y1", lit(1.5) + col("a") * 4.0)
    val s = Ml.fitSimpleLinearRegression(df, "a", "y1", 4, 4)
    val mv = Ml.fitLinearRegression(df, Seq("a"), "y1")
    assert(math.abs(s.intercept - mv.intercept) < 1e-8)
    assert(math.abs(s.coefficients(0) - mv.coefficients(0)) < 1e-8)
    assert(math.abs(s.coefficients(0) - 4.0) < 1e-10)
  }

  test("gaussSolve: pivoting solves a system needing row swaps; singular raises") {
    // a11 = 0 forces a pivot swap
    val x = Ml.gaussSolve(
      Array(Array(0.0, 2.0), Array(3.0, 1.0)), Array(4.0, 5.0))
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 2.0) < 1e-12)
    intercept[IllegalArgumentException] {
      Ml.gaussSolve(Array(Array(1.0, 2.0), Array(2.0, 4.0)), Array(1.0, 2.0))
    }
  }

  test("choleskySolve: SPD solve agrees with gaussSolve; non-SPD raises") {
    // SPD 3×3 (a normal-equations shape): both solvers agree
    val a = Array(Array(4.0, 2.0, 1.0), Array(2.0, 5.0, 3.0), Array(1.0, 3.0, 6.0))
    val b = Array(7.0, 10.0, 10.0)
    val xc = Ml.choleskySolve(a, b)
    val xg = Ml.gaussSolve(a, b)
    xc.zip(xg).foreach { case (c, g) => assert(math.abs(c - g) < 1e-12) }
    // residual check: A·x == b
    for (i <- 0 until 3)
      assert(math.abs(a(i).zip(xc).map { case (m, x) => m * x }.sum - b(i)) < 1e-10)
    // singular (rank-1) → non-positive pivot → raises like gaussSolve
    intercept[IllegalArgumentException] {
      Ml.choleskySolve(Array(Array(1.0, 2.0), Array(2.0, 4.0)), Array(1.0, 2.0))
    }
    // indefinite (negative first pivot) → raises, no NaN leakage
    intercept[IllegalArgumentException] {
      Ml.choleskySolve(Array(Array(-1.0, 0.0), Array(0.0, 1.0)), Array(1.0, 1.0))
    }
  }

  test("linearly dependent features raise, not silently mis-fit") {
    val df = synth(1000, 2).withColumn("a2", col("a") * 2.0)
    intercept[IllegalArgumentException] {
      Ml.fitLinearRegression(df, Seq("a", "a2"), "y")
    }
  }

  test("naive bayes: hand-computed posteriors, unseen values, tie to first") {
    // 6 rows, one feature: P(c|A) dominated by the A-heavy class
    //   class "x": f = A,A,B   class "y": f = B,B,B
    val df = Seq(("x", "A"), ("x", "A"), ("x", "B"),
      ("y", "B"), ("y", "B"), ("y", "B")).toDF("lab", "f")
    val m = Ml.fitNaiveBayes(df, Seq("f"), "lab")
    assert(m.labels == Seq("x", "y") && m.priors == Seq(3L, 3L))
    assert(m.cards == Seq(2L))
    val pred = m.predict(Seq(("A"), ("B"), ("Z")).toDF("f"))
      .select("f", "nb_pred").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // A: x has (2+1)/(3+2)=0.6 vs y (0+1)/5=0.2 → x
    assert(pred("A") == "x")
    // B: x (1+1)/5=0.4 vs y (3+1)/5=0.8 → y
    assert(pred("B") == "y")
    // Z unseen: both fall to 1/(3+2) — exact tie → first sorted label
    assert(pred("Z") == "x")
  }

  test("naive bayes: two features improve over either alone (sanity)") {
    val rnd = new scala.util.Random(37)
    val rows = (0 until 400).map { i =>
      val c = if (i % 2 == 0) "p" else "q"
      val f1 = if (c == "p") (if (rnd.nextInt(10) < 8) "u" else "v")
               else (if (rnd.nextInt(10) < 8) "v" else "u")
      val f2 = if (c == "p") (if (rnd.nextInt(10) < 7) "s" else "t")
               else (if (rnd.nextInt(10) < 7) "t" else "s")
      (c, f1, f2)
    }
    val df = rows.toDF("lab", "f1", "f2")
    val m = Ml.fitNaiveBayes(df, Seq("f1", "f2"), "lab")
    val acc = m.predict(df)
      .filter(col("nb_pred") === col("lab")).count().toDouble / rows.size
    assert(acc > 0.7, s"accuracy $acc")
  }

  test("nearest centroid separates clean clusters; ties go to first label") {
    val df = spark.range(0, 300)
      .select(when(col("id") % 2 === 0, "lo").otherwise("hi").as("lab"),
        when(col("id") % 2 === 0, col("id") % 7)
          .otherwise(col("id") % 7 + 100).cast("double").as("x"))
    val m = Ml.fitNearestCentroid(df, Seq("x"), "lab")
    assert(m.centroids.map(_._1) == Seq("hi", "lo")) // sorted labels
    val preds = m.predict(df)
      .filter((col("lab") === "lo" && col("prediction") =!= "lo") ||
        (col("lab") === "hi" && col("prediction") =!= "hi")).count()
    assert(preds == 0)
    // exact tie: point equidistant from both centroids → first (smallest) label
    val tiePoint = (m.centroids(0)._2(0) + m.centroids(1)._2(0)) / 2.0
    val tie = m.predict(Seq(tiePoint).toDF("x")).collect()(0).getString(1)
    assert(tie == "hi", s"tie should go to first sorted label, got $tie")
  }

  test("logistic: separable data trains to high accuracy, shape matches reference") {
    val df = spark.range(0, 400)
      .select(col("id").cast("double").as("x1"),
        ((col("id") * 13) % 41).cast("double").as("x2"))
      .withColumn("lab", when(col("x1") + col("x2") < 210, "neg").otherwise("pos"))
    val m = Ml.fitLogisticRegression(df, Seq("x1", "x2"), "lab", maxIter = 200)
    assert(m.labels == Seq("neg", "pos"))
    val out = m.predict(df)
    // predict-classification output shape: prediction + one column per class
    assert(out.columns.contains("prediction") &&
      out.columns.contains("prob_neg") && out.columns.contains("prob_pos"))
    val acc = out.filter(col("prediction") === col("lab")).count().toDouble / 400
    assert(acc >= 0.95, s"train accuracy $acc")
    // probabilities are a distribution
    val badP = out.filter(abs(col("prob_neg") + col("prob_pos") - 1.0) > 1e-9).count()
    assert(badP == 0)
    // deterministic refit on the same layout
    val m2 = Ml.fitLogisticRegression(df, Seq("x1", "x2"), "lab", maxIter = 200)
    assert(m.intercepts.toSeq == m2.intercepts.toSeq &&
      m.weights.map(_.toSeq).toSeq == m2.weights.map(_.toSeq).toSeq)
    // incomplete rows → NULL prediction (fit excluded them; CentroidModel
    // contract), not a silent first-label default
    val withNull = df.withColumn("x1",
      when(col("x2") === 0, lit(null).cast("double")).otherwise(col("x1")))
    val np = m.predict(withNull).filter(col("x1").isNull).collect()(0)
    assert(np.isNullAt(np.fieldIndex("prediction")))
    // many-class argmax stays array-shaped: plan analysis must not blow up
    // (the old best-so-far fold doubled the tree per class — O(2^k))
    val many = Ml.LinearClassifierModel(
      Seq("x1"), (0 until 30).map(i => f"c$i%02d"),
      Array.tabulate(30)(_.toDouble),
      Array.tabulate(30)(i => Array(i * 0.1)))
    val planned = many.predict(df.limit(5))
    assert(planned.count() == 5)
    val top = planned.select("prediction").distinct().collect().map(_.getString(0))
    assert(top.forall(_ == "c29")) // highest intercept+weight wins on x1 >= 0
  }

  test("linearRegressionByGroup2: Cramer solve == Gauss solve, exact recovery") {
    // per-group planted models: group 0 → y = 3 + 2a − 5b, group 1 → y = −1 + 4a + 0.5b
    val df = spark.range(0, 6000).repartition(5)
      .select((col("id") % 2).as("g"),
        (col("id") % 97).cast("double").as("a"),
        ((col("id") * 7) % 31).cast("double").as("b"))
      .withColumn("y",
        when(col("g") === 0, lit(3.0) + col("a") * 2.0 - col("b") * 5.0)
          .otherwise(lit(-1.0) + col("a") * 4.0 + col("b") * 0.5))
    val out = Ml.linearRegressionByGroup2(df, Seq("g"), "a", "b", "y",
        xDigits = 4, yDigits = 4)
      .orderBy("g").collect()
    assert(out.length == 2)
    val g0 = out(0); val g1 = out(1)
    assert(math.abs(g0.getAs[Double]("intercept") - 3.0) < 1e-7)
    assert(math.abs(g0.getAs[Double]("slope1") - 2.0) < 1e-9)
    assert(math.abs(g0.getAs[Double]("slope2") + 5.0) < 1e-9)
    assert(math.abs(g1.getAs[Double]("intercept") + 1.0) < 1e-7)
    assert(math.abs(g1.getAs[Double]("slope1") - 4.0) < 1e-9)
    assert(math.abs(g1.getAs[Double]("slope2") - 0.5) < 1e-9)
    assert(g0.getAs[Double]("r2") == 1.0 || math.abs(g0.getAs[Double]("r2") - 1.0) < 1e-12)
    assert(g0.getAs[Double]("rmse") < 1e-4)
    // independent cross-check vs the Gauss-elimination path on one group
    val only0 = df.filter(col("g") === 0)
    val mv = Ml.fitLinearRegression(only0, Seq("a", "b"), "y")
    assert(math.abs(mv.intercept - g0.getAs[Double]("intercept")) < 1e-7)
    assert(math.abs(mv.coefficients(0) - g0.getAs[Double]("slope1")) < 1e-9)
    assert(math.abs(mv.coefficients(1) - g0.getAs[Double]("slope2")) < 1e-9)
    // degenerate group: constant feature → singular → mean fallback, no NaN
    val dg = spark.range(0, 100)
      .select(lit(0L).as("g"), lit(1.0).as("a"),
        (col("id") % 5).cast("double").as("b"),
        (col("id") % 7).cast("double").as("y"))
    val dr = Ml.linearRegressionByGroup2(dg, Seq("g"), "a", "b", "y",
      xDigits = 4, yDigits = 4).collect()(0)
    assert(dr.getAs[Double]("slope1") == 0.0 && dr.getAs[Double]("slope2") == 0.0)
    assert(!dr.getAs[Double]("intercept").isNaN)
  }

  test("linearRegressionByGroupN: d=3 exact recovery, agrees with d=2 Cramer") {
    // three features, exact coefficients per group
    val df = spark.range(0, 8000).repartition(6)
      .select((col("id") % 2).as("g"),
        (col("id") % 97).cast("double").as("a"),
        ((col("id") * 7) % 31).cast("double").as("b"),
        ((col("id") * 13) % 17).cast("double").as("c"))
      .withColumn("y",
        when(col("g") === 0, lit(2.0) + col("a") * 1.5 - col("b") * 3.0 + col("c") * 0.25)
          .otherwise(lit(-4.0) + col("a") * 0.5 + col("b") * 2.0 - col("c") * 1.0))
    val out = Ml.linearRegressionByGroupN(df, Seq("g"), Seq("a", "b", "c"), "y")
      .orderBy("g").collect()
    val g0 = out(0)
    assert(math.abs(g0.getAs[Double]("intercept") - 2.0) < 1e-6)
    val cs = g0.getSeq[Double](g0.fieldIndex("coefficients"))
    assert(math.abs(cs(0) - 1.5) < 1e-8 && math.abs(cs(1) + 3.0) < 1e-8 &&
      math.abs(cs(2) - 0.25) < 1e-8)
    // d=2: executor Gauss == codegen Cramer to numerical agreement
    val n2 = Ml.linearRegressionByGroupN(df, Seq("g"), Seq("a", "b"), "y")
      .orderBy("g").collect()
    val c2 = Ml.linearRegressionByGroup2(df, Seq("g"), "a", "b", "y")
      .orderBy("g").collect()
    n2.zip(c2).foreach { case (nr, cr) =>
      assert(math.abs(nr.getAs[Double]("intercept") - cr.getAs[Double]("intercept")) < 1e-6)
      val ncs = nr.getSeq[Double](nr.fieldIndex("coefficients"))
      assert(math.abs(ncs(0) - cr.getAs[Double]("slope1")) < 1e-8)
      assert(math.abs(ncs(1) - cr.getAs[Double]("slope2")) < 1e-8)
    }
    // singular group falls back per group without poisoning others
    val mixed = df.withColumn("a",
      when(col("g") === 1, lit(7.0)).otherwise(col("a")))
    val ms = Ml.linearRegressionByGroupN(mixed, Seq("g"), Seq("a", "b"), "y")
      .orderBy("g").collect()
    assert(ms(1).getSeq[Double](ms(1).fieldIndex("coefficients")) == Seq(0.0, 0.0))
    assert(!ms(0).getSeq[Double](ms(0).fieldIndex("coefficients")).contains(0.0))
  }

  test("PCA methods: corr is scale-invariant; svd reports singular values") {
    val df = synth(4000, 3)
    // corr method: multiplying a column by 1000 must not change components
    val m1 = Ml.fitPca(df, Seq("a", "b"), 2, method = "corr")
    val scaled = df.withColumn("a", col("a") * 1000.0)
    val m2 = Ml.fitPca(scaled, Seq("a", "b"), 2, method = "corr")
    m1.components.zip(m2.components).foreach { case (u, v) =>
      u.zip(v).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    // corr eigenvalues sum to d (trace of the correlation matrix)
    assert(math.abs(m1.eigenvalues.sum - 2.0) < 1e-9)
    // cov method is NOT scale-invariant (sanity that corr differs for a
    // reason): blowing up the SMALLER-variance column flips pc1 to it
    val c1 = Ml.fitPca(df, Seq("a", "b"), 2)
    val cb = Ml.fitPca(df.withColumn("b", col("b") * 1000.0), Seq("a", "b"), 2)
    assert(math.abs(c1.components(0)(0) - cb.components(0)(0)) > 0.5)
    // svd: same components as cov, eigenvalues = sqrt(lambda * n)
    val n = df.count().toDouble
    val sv = Ml.fitPca(df, Seq("a", "b"), 2, method = "svd")
    sv.components.zip(c1.components).foreach { case (u, v) =>
      assert(u.toSeq == v.toSeq)
    }
    sv.eigenvalues.zip(c1.eigenvalues).foreach { case (s, l) =>
      assert(math.abs(s - math.sqrt(l * n)) < 1e-9 * (1.0 + s))
    }
    // covarianceBias=false: eigenvalues scale by n/(n-1), components equal
    val ub = Ml.fitPca(df, Seq("a", "b"), 2, covarianceBias = false)
    ub.eigenvalues.zip(c1.eigenvalues).foreach { case (u, l) =>
      assert(math.abs(u - l * n / (n - 1.0)) < 1e-9 * (1.0 + u))
    }
    // corr transform standardizes: projections match on raw vs scaled data
    val p1 = m1.transform(df).select(element_at(col("pc"), 1)).collect()
      .map(_.getDouble(0))
    val p2 = m2.transform(scaled).select(element_at(col("pc"), 1)).collect()
      .map(_.getDouble(0))
    p1.zip(p2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("Pipeline: stages fit on the previous stages' output and replay pure") {
    val df = synth(2000, 4)
    val pipe = Ml.Pipeline.fit(df, Seq(
      d => Ml.fitStandardScaler(d, Seq("a", "b")),
      // fits on the SCALED columns — metamorph threading; z-features are
      // full-precision doubles, so the moment sums need a finer floor-scale
      // than the integer-data default
      d => Ml.fitLinearRegression(d, Seq("a_z", "b_z"), "y",
        colScale = Map("a_z" -> 8, "b_z" -> 8, "y" -> 8))))
    val out = pipe.transform(df)
    assert(out.columns.contains("a_z") && out.columns.contains("prediction"))
    // the regression on standardized features still reproduces y
    val bad = out.filter(abs(col("prediction") - col("y")) > 1e-4).count()
    assert(bad == 0)
    // a fitted pipeline is a pure function: transforming a DIFFERENT frame
    // uses the TRAINING fit (scaler means from the 2000-row frame)
    val other = pipe.transform(synth(100, 2))
    assert(other.filter(abs(col("prediction") - col("y")) > 1e-4).count() == 0)
    // classifier models compose as stages too
    val labDf = df.withColumn("lab", when(col("y") > 0, "hi").otherwise("lo"))
    val p2 = Ml.Pipeline.fit(labDf, Seq(
      d => Ml.fitStandardScaler(d, Seq("a", "b")),
      d => Ml.fitNearestCentroid(d, Seq("a_z", "b_z"), "lab")))
    assert(p2.transform(labDf).columns.contains("prediction"))
  }

  test("evaluateClassification: hand confusion matrix, asymmetric labels") {
    // actuals: a×3 (2 right, 1→b), b×2 (1 right, 1→c); c never actual but
    // predicted once — the full-outer path
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"))
      .toDF("y", "p")
    val m = Ml.evaluateClassification(df, "y", "p")
      .orderBy("label").collect()
    assert(m.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val a = m(0); val b = m(1); val c = m(2)
    assert(a.getAs[Long]("n_actual") == 3 && a.getAs[Long]("tp") == 2)
    assert(a.getAs[Double]("precision") == 1.0) // 2 predicted-a, both right
    assert(math.abs(a.getAs[Double]("recall") - 2.0 / 3) < 1e-15)
    assert(math.abs(a.getAs[Double]("f1") - 0.8) < 1e-12)
    assert(b.getAs[Double]("precision") == 0.5 && b.getAs[Double]("recall") == 0.5)
    // c: no actuals → recall 0, precision 0 (1 prediction, 0 tp), f1 0
    assert(c.getAs[Long]("n_actual") == 0 && c.getAs[Double]("f1") == 0.0)
  }

  test("evaluateRegression: perfect fit → rmse 0 / r2 1; known residuals") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("y", "p")
    val r = Ml.evaluateRegression(df, "y", "p").collect()(0)
    assert(r.getAs[Double]("rmse") == 0.0 && r.getAs[Double]("mae") == 0.0)
    assert(r.getAs[Double]("r2") == 1.0)
    // constant +1 error: rmse = mae = 1, on real data from the tables
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_quantity").as("y"), (col("l_quantity") + 1.0).as("p"))
    val r2 = Ml.evaluateRegression(li, "y", "p").collect()(0)
    assert(math.abs(r2.getAs[Double]("rmse") - 1.0) < 1e-9)
    assert(math.abs(r2.getAs[Double]("mae") - 1.0) < 1e-9)
  }

  test("winsorize clips to percentile cutoffs, nulls pass through") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (101L, None: Option[Double])).toDF("id", "v")
    val w = Ml.winsorize(df, Seq("v"), 0.05, 0.95).collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // percentile(0.05) over 1..100 = 5.95; (0.95) = 95.05 (interpolated)
    assert(w(1L).get == 5.95 && w(100L).get == 95.05)
    assert(w(50L).get == 50.0, "interior values untouched")
    assert(w(101L).isEmpty, "null passes through")
  }

  test("robust scaler: median 0, IQR 1 on the fitted column; constant col safe") {
    import spark.implicits._
    val df = (1 to 101).map(i => (i.toLong, i.toDouble, 7.0)).toDF("id", "v", "c")
    val m = Ml.fitRobustScaler(df, Seq("v", "c"))
    val out = m.transform(df).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("v_rs"), r.getAs[Double]("c_rs"))).toMap
    assert(out(51L)._1 == 0.0, "median maps to 0")
    // v: med=51, IQR=76-26=50 → v=76 maps to 0.5
    assert(out(76L)._1 == 0.5)
    assert(out(1L)._2 == 0.0, "constant column maps to 0 (divisor 1)")
  }

  test("ridge: λ=0 equals OLS; growing λ shrinks slopes monotonically to 0") {
    import spark.implicits._
    val df = (1 to 60).map { i =>
      val x1 = (i % 10).toDouble; val x2 = (i % 7).toDouble
      ("g", x1, x2, 3.0 + 2.0 * x1 - 1.5 * x2)
    }.toDF("g", "x1", "x2", "y")
    def fit(lambda: Double) =
      Ml.linearRegressionByGroupN(df, Seq("g"), Seq("x1", "x2"), "y",
        ridgeLambda = lambda).collect()(0)
        .getAs[scala.collection.Seq[Double]]("coefficients")
    val ols = fit(0.0)
    assert(math.abs(ols(0) - 2.0) < 1e-6 && math.abs(ols(1) + 1.5) < 1e-6)
    val l1 = fit(100.0); val l2 = fit(10000.0)
    assert(math.abs(l1(0)) < math.abs(ols(0)) + 1e-12)
    assert(math.abs(l2(0)) < math.abs(l1(0)))
    assert(math.abs(l2(1)) < math.abs(l1(1)))
    assert(math.abs(l2(0)) < 0.9, "heavy penalty shrinks hard")
  }

  test("quantileNormalizeByGroup: extremes map to pooled min/max; ties share " +
       "one value; singleton group gets the pooled median; nulls pass through") {
    import spark.implicits._
    // group a: 1..9 (shifted scale), group b: 101..109, group c: singleton,
    // plus a null-value row and a null-group row that must survive un-normalized
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 9).map(i => ("a", java.lang.Double.valueOf(i.toDouble))) ++
      (101 to 109).map(i => ("b", java.lang.Double.valueOf(i.toDouble))) ++
      Seq(("c", java.lang.Double.valueOf(55.0)),
          ("a", null.asInstanceOf[java.lang.Double]),
          (null.asInstanceOf[String], java.lang.Double.valueOf(5.0)))
    val df = rows.toDF("g", "v")
    val out = Ml.quantileNormalizeByGroup(df, "g", "v", gridK = 21)
    assert(out.count() == rows.size, "row-preserving (no join fanout)")
    val got = out.collect().map { r =>
      (Option(r.getAs[String]("g")), Option(r.getAs[Any]("v")).map(_.toString.toDouble),
       Option(r.getAs[Any]("v_qn")).map(_.toString.toDouble))
    }
    // pooled min = 1, pooled max = 109: each group's extremes hit them
    val aMin = got.find(r => r._1.contains("a") && r._2.contains(1.0)).get._3.get
    val bMax = got.find(r => r._1.contains("b") && r._2.contains(109.0)).get._3.get
    assert(aMin == 1.0 && bMax == 109.0, s"extremes: $aMin, $bMax")
    // same-scale groups align: a's rank-k row and b's rank-k row normalize equal
    val aVals = got.filter(r => r._1.contains("a") && r._2.nonEmpty)
      .sortBy(_._2.get).map(_._3.get)
    val bVals = got.filter(r => r._1.contains("b") && r._2.nonEmpty)
      .sortBy(_._2.get).map(_._3.get)
    assert(aVals.sameElements(bVals), "equal in-group positions → equal qn")
    assert(aVals.sorted.sameElements(aVals), "monotone within group")
    // singleton group → p=0.5 → t lands exactly on the grid's midpoint,
    // which is the pooled median: sorted pool (19 values) index 9 = 55
    val cQn = got.find(_._1.contains("c")).get._3.get
    assert(cQn == 55.0, s"singleton maps to pooled median exactly: $cQn")
    // null value / null group rows keep null qn
    assert(got.filter(r => r._2.isEmpty || r._1.isEmpty).forall(_._3.isEmpty))
  }

  test("brierDecomposition: a perfect forecaster has zero reliability and " +
       "resolution = uncertainty; a constant forecaster has zero resolution") {
    import spark.implicits._
    // 40 rows, 25% positives; perfect: p = y exactly
    val perfect = ((1 to 30).map(_ => (0.0, 0L)) ++
      (1 to 10).map(_ => (1.0, 1L))).toDF("p", "y")
    val pr = Ml.brierDecomposition(perfect, "p", "y", bins = 10).collect()(0)
    assert(pr.getAs[Long]("n") == 40L)
    assert(pr.getAs[Double]("reliability") == 0.0)
    assert(pr.getAs[Double]("ece") == 0.0, "perfect forecasts: zero ECE")
    assert(pr.getAs[Double]("uncertainty") == 0.25 * 0.75)
    assert(math.abs(pr.getAs[Double]("resolution") -
      pr.getAs[Double]("uncertainty")) < 1e-9)
    assert(math.abs(pr.getAs[Double]("brier")) < 1e-9)
    // constant forecaster at the base rate: rel 0, res 0, brier = unc
    val flat = ((1 to 30).map(_ => (0.25, 0L)) ++
      (1 to 10).map(_ => (0.25, 1L))).toDF("p", "y")
    val fl = Ml.brierDecomposition(flat, "p", "y", bins = 10).collect()(0)
    assert(fl.getAs[Long]("k_bins") == 1L)
    assert(math.abs(fl.getAs[Double]("reliability")) < 1e-9 &&
      fl.getAs[Double]("resolution") == 0.0)
    assert(math.abs(fl.getAs[Double]("ece")) < 1e-9,
      "base-rate forecaster is perfectly calibrated: zero ECE")
    assert(math.abs(fl.getAs[Double]("brier") - 0.1875) < 1e-9)
  }

  test("splitConformal: exact fit gives zero-width band; k is the " +
       "ceil((n+1)(1-alpha)) order statistic; bad alpha rejected") {
    import spark.implicits._
    // y = 3x exactly: residuals are 0 on both halves -> q_hat = 0
    val df = (1 to 400).map(i => (i.toLong, i % 50 + 1.0, 3.0 * (i % 50 + 1)))
      .toDF("id", "x", "y")
    val r = Ml.splitConformal(df, "x", "y", Seq("id"), alpha = 0.1)
      .collect()(0)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") == 400L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-9)
    assert(r.getAs[Double]("q_hat") < 1e-9, "perfect fit: zero-width band")
    val nCal = r.getAs[Long]("n_cal")
    assert(r.getAs[Long]("k_rank") ==
      math.min(nCal, math.ceil((nCal + 1) * 0.9).toLong))
    // a known noise magnitude bounds the band: |resid| <= 30 everywhere
    val noisy = (1 to 400).map { i =>
      (i.toLong, (i % 50 + 1).toDouble,
        3.0 * (i % 50 + 1) + (i % 7 - 3) * 10.0)
    }.toDF("id", "x", "y")
    val n = Ml.splitConformal(noisy, "x", "y", Seq("id"), alpha = 0.1)
      .collect()(0)
    val q = n.getAs[Double]("q_hat")
    assert(q > 0.0 && q <= 40.0, s"band must reflect the noise scale: $q")
    intercept[IllegalArgumentException] {
      Ml.splitConformal(df, "x", "y", Seq("id"), alpha = 1.5)
    }
  }

  test("cumulativeGains: a perfect ranker captures all positives in the " +
       "top band; the last band closes at gain 1 and lift 1") {
    import spark.implicits._
    // 100 rows, scores 100..1; the 10 positives are exactly the top scores
    val df = (1 to 100).map(i => (i.toLong, (101 - i).toDouble,
      if (i <= 10) 1L else 0L)).toDF("id", "score", "y")
    val out = Ml.cumulativeGains(df, "score", "y", buckets = 10)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    val top = out(1L)
    assert(top.getAs[Long]("n") == 10L && top.getAs[Long]("n_pos") == 10L)
    assert(top.getAs[Double]("gain") == 1.0, "top decile captures all")
    assert(top.getAs[Double]("lift") == 10.0, "10x the base rate")
    val last = out(10L)
    assert(last.getAs[Long]("cum_n") == 100L &&
      last.getAs[Long]("cum_pos") == 10L)
    assert(last.getAs[Double]("gain") == 1.0 &&
      last.getAs[Double]("lift") == 1.0)
  }
}
