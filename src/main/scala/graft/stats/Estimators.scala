package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The WCLS estimator family (SURVEY.md §2.8-§2.10), re-expressed
  * Spark-first: derived columns are Catalyst expressions, every moment
  * reduction is a fused distributed pass (MomentPass), d×d algebra is
  * driver-side Breeze. Semantics pinned against the reference goldens by
  * tools/golden_oracle.py (all 10 methods reproduce example_estimates.csv).
  *
  * Reference: methods/{wcls,pwcls,etwcls,drwcls,petwcls}.R.
  */
final case class EstimateResult(
    betaR: DenseVector[Double],
    seBetaR: DenseVector[Double],
    varBetaR: DenseMatrix[Double],
    chi2: Double,
    zScores: DenseVector[Double],
    n: Long,
    p: Int,
    tiltWarning: Boolean)

object Estimators {

  /** Panel facts computed in one pass; cluster column per the reference's
    * balanced-sandwich block semantics (Sandwich.blockClusterCol).
    */
  final case class PanelInfo(n: Long, nUsers: Int, tMax: Int, piInternal: Double,
      denseUserIds: Boolean = false)

  def panelInfo(df: DataFrame): PanelInfo = {
    // the density probe rides the same single pass: INTEGRAL ids
    // covering exactly 1..nUsers (min 1, max nUsers, all distinct)
    // make rank(user_id) == user_id, so withBlockCluster can skip the
    // rank table entirely. Integral only: fractional ids {1.0, 1.5,
    // 3.0} would pass a cast-to-long min/max probe yet collide under
    // rank = cast(id) — the fast path must be impossible there.
    val numericIds = {
      import org.apache.spark.sql.types._
      df.schema("user_id").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val idMin = if (numericIds) min(col("user_id")).cast("long") else lit(null).cast("long")
    val idMax = if (numericIds) max(col("user_id")).cast("long") else lit(null).cast("long")
    val r = df.agg(
      count(lit(1)),
      countDistinct(col("user_id")),
      avg(col("is_internal").cast("double")),
      idMin, idMax,
      count(col("user_id"))).head()
    val n = r.getLong(0)
    require(n > 0, "empty panel: no rows to fit an estimator on")
    val nU = r.getLong(1).toInt
    // NULL user_id rows are invisible to min/max/countDistinct, so
    // they could fake density; the dense path would emit them with a
    // null __cluster while the fallback's inner join drops them —
    // same input, different row counts. A null id disables the fast
    // path (count(user_id) counts only non-null rows).
    val dense = numericIds && !r.isNullAt(3) &&
      r.getLong(3) == 1L && r.getLong(4) == nU.toLong && r.getLong(5) == n
    PanelInfo(n, nU, math.round(n.toDouble / nU).toInt, r.getDouble(2), dense)
  }

  /** Adds `__cluster`: R-order row position ((t-1)·nUsers + userRank)
    * divided into blocks of tMax.
    *
    * Dense ids (the generator's guarantee, PanelGenerator.scala: user_id
    * = 1..n): rank(user_id) == user_id, so the cluster is pure map-side
    * arithmetic — no rank table, no join, no window, scale-free.
    *
    * Sparse-id fallback: userRank via a broadcast-joined tiny rank
    * table — no global shuffle of the PANEL itself, but the rank table
    * is built with an unpartitioned row_number window (one task sorts
    * all distinct ids) and then broadcast. Bound: fine to ~10M distinct
    * ids (the reference workload tops out at 12,800 users/cell); past
    * that, feed panels with dense ids or pre-rank upstream.
    */
  def withBlockCluster(df: DataFrame, info: PanelInfo): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // __urank is a reserved helper name: the fallback path joins on it
    // and BOTH paths drop it at the end, so a caller column of that
    // name would be silently removed (or make the join ambiguous)
    require(!df.columns.contains("__urank"),
      "withBlockCluster reserves the column name __urank")
    val urank =
      if (info.denseUserIds) col("user_id").cast("long")
      else col("__urank")
    val pos = (col("t") - 1) * lit(info.nUsers.toLong) + urank
    val base =
      if (info.denseUserIds) df
      else {
        val ranks = df.select("user_id").distinct()
          .withColumn("__urank", row_number().over(Window.orderBy(col("user_id"))))
        df.join(broadcast(ranks), "user_id")
      }
    // both paths emit the same schema: __cluster appended, no helper cols
    base.withColumn("__cluster", floor((pos - 1) / lit(info.tMax)))
      .drop("__urank")
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def inference(sand: DenseMatrix[Double], posR: Seq[Int],
                        betaR: DenseVector[Double], betaRTrue: DenseVector[Double],
                        n: Long, tiltWarning: Boolean): EstimateResult = {
    val dR = posR.size
    val v = DenseMatrix.tabulate(dR, dR)((i, j) => sand(posR(i), posR(j)))
    val se = LinAlg.diagSqrt(v)
    val err = betaR - betaRTrue
    val z = err /:/ se
    val chi2 = err.t * LinAlg.solveVec(v, err)
    EstimateResult(betaR, se, v, chi2, z, n, sand.rows, tiltWarning)
  }

  /** Inverse-variance pooling blocks (etwcls.R:171-206, C1-C4). */
  object Pooling {
    /** "full": Λ-weighted combine of k stacked d_r-blocks. */
    def full(betaStacked: DenseVector[Double], v: DenseMatrix[Double], dR: Int, k: Int)
        : (DenseVector[Double], DenseMatrix[Double]) = {
      val lam = LinAlg.cholInv(v)
      val lamSum = DenseMatrix.zeros[Double](dR, dR)
      for (j <- 0 until k; l <- 0 until k)
        lamSum += lam(j * dR until (j + 1) * dR, l * dR until (l + 1) * dR)
      val lamSumInv = LinAlg.cholInv(lamSum)
      val z = lam * betaStacked
      val zSum = DenseVector.zeros[Double](dR)
      for (j <- 0 until k) zSum += z(j * dR until (j + 1) * dR)
      val pooled = lamSumInv * zSum
      val lamHoriz = DenseMatrix.zeros[Double](dR, k * dR)
      for (j <- 0 until k) lamHoriz += lam(j * dR until (j + 1) * dR, ::)
      val vp = lamSumInv * lamHoriz * v * lamHoriz.t * lamSumInv
      (pooled, vp)
    }

    /** "kronecker"/"equal": 2×2 precision summary over 2 blocks of size 2. */
    def kroneckerLike(betaR: DenseVector[Double], v: DenseMatrix[Double],
                      lambdaTilde: DenseMatrix[Double])
        : (DenseVector[Double], DenseMatrix[Double]) = {
      val w1 = lambdaTilde(0, 0) + lambdaTilde(1, 0)
      val w2 = lambdaTilde(0, 1) + lambdaTilde(1, 1)
      val wSum = w1 + w2
      val pooled = (betaR(0 until 2) * w1 + betaR(2 until 4) * w2) / wSum
      val eye = DenseMatrix.eye[Double](2)
      val kronMat = LinAlg.kronecker(lambdaTilde(0, ::).t.toDenseMatrix, eye) +
        LinAlg.kronecker(lambdaTilde(1, ::).t.toDenseMatrix, eye)
      val vp = (kronMat * v * kronMat.t) / (wSum * wSum)
      (pooled, vp)
    }
  }

  // ---------------------------------------------------------------------
  // Shared stage: intercept-only-or-general propensity + derived columns
  // (wcls.R:122-135, P1-P3).
  // ---------------------------------------------------------------------
  private final case class Propensity(
      dfEnriched: DataFrame, fit: Glm.LogisticFit, design: Design)

  private def fitPropensity(df: DataFrame, design: Design, pHat: String,
                            aCentered: String, pHatA: String, wName: String): Propensity = {
    val f = Glm.logistic(df, design, col("a"))
    val p = f.predict(design)
    val enriched = df
      .withColumn(pHat, p)
      .withColumn(aCentered, col("a") - col(pHat))
      .withColumn(pHatA, col("a") * col(pHat) + (lit(1.0) - col("a")) * (lit(1.0) - col(pHat)))
      .withColumn(wName, col(pHatA) / col("p_h_a"))
    Propensity(enriched, f, design)
  }

  // ---------------------------------------------------------------------
  // Shared stage: exponential-tilt model with the spline-df fallback
  // ladder (etwcls.R:112-130, M8 + P7). Returns the enriched frame with
  // raw_tilt_ratios/tilt_ratios plus the omega design & coefficients.
  // ---------------------------------------------------------------------
  final case class Tilt(df: DataFrame, design: Design, omega: DenseVector[Double],
                        warning: Boolean)

  def fitTilt(df: DataFrame, piInternal: Double): Tilt = {
    val ladder = Seq((3, 2), (2, 2), (1, 1))
    var chosen: Option[(Design, Glm.LogisticFit)] = None
    var last: (Design, Glm.LogisticFit) = null
    for ((dfP, deg) <- ladder if chosen.isEmpty) {
      val b1 = BSpline.fit(df, col("x1"), dfP, deg).designOf("bs_x1_", col("x1"))
      val b2 = BSpline.fit(df, col("x2"), dfP, deg).designOf("bs_x2_", col("x2"))
      val inter = Design(for {
        (n2, c2) <- b2.terms
        (n1, c1) <- b1.terms
      } yield (s"$n1:$n2", c1 * c2))
      val design = Design(Seq(Design.intercept)) ++ b1 ++ b2 ++ inter
      val fit = Glm.logistic(df, design, col("is_internal").cast("double"))
      last = (design, fit)
      if (!fit.warning) chosen = Some(last)
    }
    val (design, fit) = chosen.getOrElse(last)
    val warning = design.width <= 10
    val omega = fit.coef.copy
    omega(0) -= math.log(piInternal / (1.0 - piInternal))
    val raw = exp(design.dot(omega.toArray.toSeq))
    val out = df
      .withColumn("raw_tilt_ratios", raw)
      .withColumn("tilt_ratios",
        col("is_internal").cast("double") + col("is_external").cast("double") * col("raw_tilt_ratios"))
    Tilt(out, design, omega, warning)
  }

  /** Tilt score/hessian block contributions (shared by et/dr/pet). */
  private def tiltScoreCols(design: Design, piInternal: Double): (Design, Column) = {
    val rho = piInternal / (1.0 - piInternal)
    val pOmegaNum = lit(rho) * col("raw_tilt_ratios")
    val pOmega = pOmegaNum / (lit(1.0) + pOmegaNum)
    val scores = design.scale(col("is_internal").cast("double") - pOmega)
    (scores, pOmega * (lit(1.0) - pOmega))
  }

  // =====================================================================
  // WCLS (wcls.R:116-194). Battery uses estimate_p_r=TRUE, no tilt.
  // =====================================================================
  def wcls(df0: DataFrame, betaRTrue: DenseVector[Double],
           betaH: Design, betaROf: Column => Design, pRDesign: Design): EstimateResult = {
    val info = panelInfo(df0)
    val prop = fitPropensity(df0, pRDesign, "p_r_hat", "a_centered", "p_r_hat_a", "w")
    val df = withBlockCluster(prop.dfEnriched, info).cache()
    try {
      val xR = betaROf(col("a_centered"))
      val xHr = betaH ++ xR
      val beta = Glm.wls(df, xHr, col("y"), col("w"))
      val dH = betaH.width; val dR = xR.width; val dA = pRDesign.width
      val d = dA + dH + dR
      val betaHv = beta(0 until dH); val betaRv = beta(dH until dH + dR)

      val resid = col("y") - xHr.dot(beta.toArray.toSeq)
      val wres = col("w") * resid // tilt_ratios == 1
      val fitR = xR.dot(betaRv.toArray.toSeq)

      // scores: [(a - p̂)·Xα | wres·Xh | wres·Xr]
      val scores = pRDesign.scale(col("a") - col("p_r_hat")) ++
        xHr.scale(wres)

      // Hessian blocks — ONE pass
      val pHat = col("p_r_hat"); val pHatA = col("p_r_hat_a")
      val logd = (-(lit(2.0) * col("a") - 1.0) * pHat * (lit(1.0) - pHat)) / pHatA
      val prd = -(lit(1.0) - pHat)
      val xRraw = xR.scale(lit(1.0) / col("a_centered"))
      val blkNeg = Design(Design.zeros(dH).map(("z", _))) ++ xRraw.scale(-pHat)

      val pass = new MomentPass(df)
      val gA = pass.gram(pRDesign, pHat * (lit(1.0) - pHat))
      val gHr = pass.gram(xHr, col("w"))
      val c1 = pass.cross(xHr, pRDesign, wres * logd)
      val c2 = pass.cross(blkNeg, pRDesign, wres * prd)
      val c3 = pass.cross(xHr, pRDesign, pHat * fitR / col("a_centered") * col("w") * prd)
      pass.run()

      val h = DenseMatrix.zeros[Double](d, d)
      h(0 until dA, 0 until dA) := pass.matrix(gA)
      h(dA until d, dA until d) := pass.matrix(gHr)
      h(dA until d, 0 until dA) := pass.matrix(c1) + pass.matrix(c2) + pass.matrix(c3)

      val meat = Sandwich.meat(df, scores, col("__cluster"))
      val sand = LinAlg.sandwichStep(h, meat, info.nUsers, d)
      inference(sand, (dA + dH) until d, betaRv, betaRTrue, info.n, tiltWarning = false)
    } finally df.unpersist()
  }

  // =====================================================================
  // P-WCLS (pwcls.R). Battery variants: internal_only / pooled / pooled-obs.
  // =====================================================================
  /** `dividerIdx` (pwcls.R beta_s_formula_divider_idx): 1-based start
    * indices of the 2nd..kth treatment-level blocks inside beta_s. Each
    * block is de-centered by ITS OWN first column (pwcls.R:200 "Assume
    * first column is intercept") and gets its own second-stage
    * regression — multi-response OLS via ONE shared Gramian with
    * multiple right-hand sides (M4). Default: single block (the
    * reference battery's configuration, golden-tested).
    */
  def pwcls(dfAll: DataFrame, betaRTrue: DenseVector[Double],
            betaH: Design, betaSOf: Column => Design, betaROf: DataFrame => Design,
            pSDesign: Design, internalOnly: Boolean = false,
            pHDesign: Option[Design] = None,
            dividerIdx: Seq[Int] = Nil): EstimateResult = {
    val df1 = if (internalOnly) dfAll.filter(col("is_internal")) else dfAll
    val info = panelInfo(df1)

    // optional estimated p_h (observational mode, pwcls.R:149-156)
    val (dfPh, alphaHFit) = pHDesign match {
      case Some(dsg) =>
        val f = Glm.logistic(df1, dsg, col("a"))
        val pH = f.predict(dsg)
        (df1.withColumn("p_h_hat", pH)
           .withColumn("p_h_a_use", col("a") * pH + (lit(1.0) - col("a")) * (lit(1.0) - pH)),
         Some(f))
      case None =>
        (df1.withColumn("p_h_a_use", col("p_h_a")), None)
    }

    val fS = Glm.logistic(dfPh, pSDesign, col("a"))
    val pS = fS.predict(pSDesign)
    val dfE0 = dfPh
      .withColumn("p_s_hat", pS)
      .withColumn("a_centered", col("a") - col("p_s_hat"))
      .withColumn("p_s_hat_a", col("a") * col("p_s_hat") + (lit(1.0) - col("a")) * (lit(1.0) - col("p_s_hat")))
      .withColumn("w", col("p_s_hat_a") / col("p_h_a_use"))
    val df = withBlockCluster(dfE0, info).cache()
    try {
      val xS = betaSOf(col("a_centered"))
      val xHs = betaH ++ xS
      val beta = Glm.wls(df, xHs, col("y"), col("w"))
      val dH = betaH.width; val dS = xS.width
      val betaHv = beta(0 until dH); val betaSv = beta(dH until dH + dS)

      // treatment-level blocks of beta_s; each de-centered by its own
      // first RAW column (pwcls.R:192-209)
      val bounds = (Seq(1) ++ dividerIdx :+ (dS + 1)).distinct.sorted
      val blocks: Seq[Range] = bounds.sliding(2).map { p => (p.head - 1) until (p(1) - 1) }.toSeq
      val nLevels = blocks.size
      val xSrawBlocks = blocks.map { b =>
        val firstCol = xS.terms(b.head)._2
        // pow(x,-1) not `/`: R yields Inf on zero divisors (then NaN in
        // downstream scores); ANSI division would error instead
        Design(b.map(i => xS.terms(i))).scale(pow(firstCol, -1.0))
      }
      val ceCols = blocks.zip(xSrawBlocks).map { case (b, raw) =>
        raw.dot(b.map(i => betaSv(i)))
      }
      var dfCe = df
      for ((c, j) <- ceCols.zipWithIndex) dfCe = dfCe.withColumn(s"__ce$j", c)

      // second stage: multi-response OLS over internal rows — ONE shared
      // Gramian of [Xr | ce_1..ce_L], multiple RHS solves (M4)
      val xRr = betaROf(dfCe)
      val dR = xRr.width
      val dfInt = dfCe.filter(col("is_internal"))
      val aug = xRr ++ Design(ceCols.indices.map(j => (s"__ce$j", col(s"__ce$j"))))
      val p2 = new MomentPass(dfInt)
      val g2 = p2.gram(aug, lit(1.0))
      p2.run()
      val g2m = p2.matrix(g2)
      val xtx = g2m(0 until dR, 0 until dR).toDenseMatrix
      val betaRBlocks = ceCols.indices.map { j =>
        LinAlg.solveVec(xtx, DenseVector((0 until dR).map(i => g2m(i, dR + j)).toArray))
      }
      val betaRv = DenseVector.vertcat(betaRBlocks: _*)

      val dAh = pHDesign.map(_.width).getOrElse(0)
      val dAs = pSDesign.width
      val d = dAh + dAs + dH + dS + dR * nLevels
      val xSraw = xSrawBlocks.reduce(_ ++ _) // block-wise raw (order preserved)

      val resid = col("y") - xHs.dot(beta.toArray.toSeq)
      val wres = col("w") * resid
      val fitS = xS.dot(betaSv.toArray.toSeq)
      val isI = col("is_internal").cast("double")

      // scores
      var scores = Design(Seq.empty[(String, Column)])
      pHDesign.foreach { dsg =>
        scores = scores ++ dsg.scale(col("a") - col("p_h_hat"))
      }
      scores = scores ++ pSDesign.scale(col("a") - col("p_s_hat"))
      scores = scores ++ xHs.scale(wres)
      for (j <- 0 until nLevels) {
        val betaRj = betaRBlocks(j)
        scores = scores ++ xRr.scale(
          isI * (col(s"__ce$j") - xRr.dot(betaRj.toArray.toSeq)))
      }

      // Hessian
      val pHatS = col("p_s_hat"); val pHatSA = col("p_s_hat_a")
      val logd = (-(lit(2.0) * col("a") - 1.0) * pHatS * (lit(1.0) - pHatS)) / pHatSA
      val lpd = -(lit(1.0) - pHatS)
      val blkNeg = Design(Design.zeros(dH).map(("z", _))) ++ xSraw.scale(-pHatS)

      val pass = new MomentPass(dfCe)
      val gAh = pHDesign.map(dsg => pass.gram(dsg, col("p_h_hat") * (lit(1.0) - col("p_h_hat"))))
      val gAs = pass.gram(pSDesign, pHatS * (lit(1.0) - pHatS))
      val gHs = pass.gram(xHs, col("w"))
      val c1 = pass.cross(xHs, pSDesign, wres * logd)
      val c2 = pass.cross(blkNeg, pSDesign, wres * lpd)
      val c3 = pass.cross(xHs, pSDesign, pHatS * fitS / col("a_centered") * col("w") * lpd)
      val cObs = (pHDesign, alphaHFit) match {
        case (Some(dsg), Some(_)) =>
          val pH = col("p_h_hat")
          val logdh = (-(lit(2.0) * col("a") - 1.0) * pH * (lit(1.0) - pH)) / col("p_h_a_use")
          Some(pass.cross(xHs, dsg, wres * logdh))
        case _ => None
      }
      val gR = pass.gram(xRr, isI)
      val cRSBlocks = xSrawBlocks.map(raw => pass.cross(xRr, raw, isI))
      pass.run()

      val h = DenseMatrix.zeros[Double](d, d)
      var cur = 0
      gAh.foreach { g => h(0 until dAh, 0 until dAh) := pass.matrix(g); cur = dAh }
      val sAs = cur; h(sAs until sAs + dAs, sAs until sAs + dAs) := pass.matrix(gAs)
      val sHs = sAs + dAs
      h(sHs until sHs + dH + dS, sHs until sHs + dH + dS) := pass.matrix(gHs)
      h(sHs until sHs + dH + dS, sAs until sAs + dAs) :=
        pass.matrix(c1) + pass.matrix(c2) + pass.matrix(c3)
      cObs.foreach { c =>
        h(sHs until sHs + dH + dS, 0 until dAh) := pass.matrix(c)
      }
      val sR = sHs + dH + dS
      for (j <- 0 until nLevels) {
        val rj = (sR + j * dR) until (sR + (j + 1) * dR)
        h(rj, rj) := pass.matrix(gR)
        val sCols = blocks(j).map(sHs + dH + _)
        val cm = pass.matrix(cRSBlocks(j))
        for ((sc, k) <- sCols.zipWithIndex; ri <- 0 until dR)
          h(rj(ri), sc) = -cm(ri, k)
      }

      val meat = Sandwich.meat(dfCe, scores, col("__cluster"))
      val sand = LinAlg.sandwichStep(h, meat, info.nUsers, d)
      inference(sand, sR until d, betaRv, betaRTrue, info.n, tiltWarning = false)
    } finally df.unpersist()
  }

  // =====================================================================
  // ET-WCLS (etwcls.R): tilted WCLS with 3 pooling modes.
  // =====================================================================
  def etwcls(df0: DataFrame, betaRTrue: DenseVector[Double],
             betaH: Design, betaROf: Column => Design, pRDesign: Design,
             poolingMethod: String): EstimateResult = {
    val info = panelInfo(df0)
    val prop = fitPropensity(df0, pRDesign, "p_r_hat", "a_centered", "p_r_hat_a", "w")
    val dfProp = prop.dfEnriched.cache()
    try {
      val tilt = fitTilt(dfProp, info.piInternal)
      val dfE0 = tilt.df.withColumn("w_and_tilt", col("w") * col("tilt_ratios"))
      val df = withBlockCluster(dfE0, info).cache()
      try {
        val xR = betaROf(col("a_centered"))
        val xHr = betaH ++ xR
        val beta = Glm.wls(df, xHr, col("y"), col("w_and_tilt"))
        val dH = betaH.width; val dR = xR.width; val dA = pRDesign.width
        val dO = tilt.design.width
        val d = dA + dO + dH + dR
        val betaRv = beta(dH until dH + dR)

        val resid = col("y") - xHr.dot(beta.toArray.toSeq)
        val wres = col("w_and_tilt") * resid
        val fitR = xR.dot(betaRv.toArray.toSeq)

        val (tiltScores, tiltW) = tiltScoreCols(tilt.design, info.piInternal)
        val scores = pRDesign.scale(col("a") - col("p_r_hat")) ++
          tiltScores ++ xHr.scale(wres)

        val pHat = col("p_r_hat"); val pHatA = col("p_r_hat_a")
        val logd = (-(lit(2.0) * col("a") - 1.0) * pHat * (lit(1.0) - pHat)) / pHatA
        val prd = -(lit(1.0) - pHat)
        val xRraw = xR.scale(lit(1.0) / col("a_centered"))
        val blkNeg = Design(Design.zeros(dH).map(("z", _))) ++ xRraw.scale(-pHat)
        val isE = col("is_external").cast("double")

        val pass = new MomentPass(df)
        val gA = pass.gram(pRDesign, pHat * (lit(1.0) - pHat))
        val gO = pass.gram(tilt.design, tiltW)
        val gHr = pass.gram(xHr, col("w_and_tilt"))
        val c1 = pass.cross(xHr, pRDesign, wres * logd)
        val c2 = pass.cross(blkNeg, pRDesign, wres * prd)
        val c3 = pass.cross(xHr, pRDesign,
          pHat * fitR / col("a_centered") * col("w") * col("tilt_ratios") * prd)
        val cO = pass.cross(xHr, tilt.design, isE * wres)
        pass.run()

        val h = DenseMatrix.zeros[Double](d, d)
        h(0 until dA, 0 until dA) := pass.matrix(gA)
        h(dA until dA + dO, dA until dA + dO) := pass.matrix(gO)
        val sHr = dA + dO
        h(sHr until d, sHr until d) := pass.matrix(gHr)
        h(sHr until d, 0 until dA) := pass.matrix(c1) + pass.matrix(c2) + pass.matrix(c3)
        h(sHr until d, dA until dA + dO) := -pass.matrix(cO)

        val meat = Sandwich.meat(df, scores, col("__cluster"))
        val sand = LinAlg.sandwichStep(h, meat, info.nUsers, d)

        val posR = (sHr + dH) until d
        val v = DenseMatrix.tabulate(dR, dR)((i, j) => sand(posR(i), posR(j)))
        require(dR % 2 == 0,
          s"ET pooling expects two stacked study blocks (even dR), got dR=$dR")
        val (pooled, vp) = poolingMethod match {
          case "full" =>
            Pooling.full(betaRv, v, dR / 2, 2)
          case "kronecker" =>
            // 2 study blocks of dR/2 coefs: the Kronecker weight reads the
            // per-study precision at each block's leading coefficient
            val b = dR / 2
            val lam = LinAlg.cholInv(v)
            val lt = DenseMatrix((lam(0, 0), lam(0, b)), (lam(b, 0), lam(b, b)))
            Pooling.kroneckerLike(betaRv, v, lt)
          case "equal" =>
            Pooling.kroneckerLike(betaRv, v, DenseMatrix.eye[Double](2) * 0.5)
          case other =>
            throw new IllegalArgumentException(
              s"unknown ET pooling method '$other'; valid: full, kronecker, equal")
        }
        val se = LinAlg.diagSqrt(vp)
        val err = pooled - betaRTrue
        EstimateResult(pooled, se, vp, err.t * LinAlg.solveVec(vp, err), err /:/ se,
          info.n, d, tilt.warning)
      } finally df.unpersist()
    } finally dfProp.unpersist()
  }

  // =====================================================================
  // A-WCLS (methods/awcls.R — extras-tier): plug-in projection
  // β_r = Γ β_s, Γ from a cubic regression of x2 on x1 (internal rows),
  // delta-method variance. Reference quirks kept: n_users = max(user_id),
  // dof scale n/(n-d). Distributed mirror of LocalBattery.awclsMethod
  // (equivalence-tested in AwclsEquivalenceSpec).
  // =====================================================================
  def awcls(df0: DataFrame): EstimateResult = {
    val betaRTrue = DenseVector(-5.0, -1.0, 0.9, 0.3) // awcls.R:104
    val info0 = panelInfo(df0)
    val maxUser = df0.agg(max(col("user_id"))).head().getLong(0).toInt
    val info = info0.copy(nUsers = maxUser,
      tMax = (info0.n / maxUser).toInt) // floor, awcls.R:80
    val prop = fitPropensity(df0, Battery.aIntercept, "p_s_hat", "a_centered", "p_s_hat_a", "w")
    val df = withBlockCluster(prop.dfEnriched, info).cache()
    try {
      val xH = Battery.betaH
      val xS = Battery.betaS(col("a_centered"))
      val xHs = xH ++ xS
      val beta = Glm.wls(df, xHs, col("y"), col("w"))
      val dH = xH.width; val dS = xS.width
      val betaSv = beta(dH until dH + dS)

      // Gamma: x2 ~ x1 + x1^2 + x1^3 on internal rows (awcls.R:126)
      val xG = Design(Design.intercept, ("x1", col("x1")),
        ("x1^2", col("x1") * col("x1")), ("x1^3", col("x1") * col("x1") * col("x1")))
      val dR = xG.width
      val gamma = Glm.wls(df.filter(col("is_internal")), xG, col("x2"), lit(1.0))
      val bigGamma = DenseMatrix.zeros[Double](dR, dS)
      bigGamma(0, 0) = 1.0; bigGamma(1, 1) = 1.0
      for (i <- 0 until dR) bigGamma(i, 2) = gamma(i)
      val betaR = bigGamma * betaSv

      val dA = 1; val d = dA + dH + dS + dR
      val pHat = col("p_s_hat"); val pHatA = col("p_s_hat_a")
      val resid = col("y") - xHs.dot(beta.toArray.toSeq)
      val wres = col("w") * resid
      val fitS = xS.dot(betaSv.toArray.toSeq)
      val isI = col("is_internal").cast("double")
      val xSraw = xS.scale(lit(1.0) / col("a_centered"))

      val scores = Battery.aIntercept.scale(col("a") - pHat) ++
        xHs.scale(wres) ++
        xG.scale(isI * (col("x2") - xG.dot(gamma.toArray.toSeq)))

      val logd = (-(lit(2.0) * col("a") - 1.0) * pHat * (lit(1.0) - pHat)) / pHatA
      val lpd = -(lit(1.0) - pHat)
      val blkNeg = Design(Design.zeros(dH).map(("z", _))) ++ xSraw.scale(-pHat)

      val pass = new MomentPass(df)
      val gA = pass.gram(Battery.aIntercept, pHat * (lit(1.0) - pHat))
      val gHs = pass.gram(xHs, col("w"))
      val c1 = pass.cross(xHs, Battery.aIntercept, wres * logd)
      val c2 = pass.cross(blkNeg, Battery.aIntercept, wres * lpd)
      val c3 = pass.cross(xHs, Battery.aIntercept,
        pHat * fitS / col("a_centered") * col("w") * lpd)
      val gG = pass.gram(xG, isI)
      pass.run()

      val h = DenseMatrix.zeros[Double](d, d)
      h(0, 0) = pass.matrix(gA)(0, 0)
      h(dA until dA + dH + dS, dA until dA + dH + dS) := pass.matrix(gHs)
      h(dA until dA + dH + dS, 0 until dA) :=
        pass.matrix(c1) + pass.matrix(c2) + pass.matrix(c3)
      val sG = dA + dH + dS
      h(sG until d, sG until d) := pass.matrix(gG)

      val meat = Sandwich.meat(df, scores, col("__cluster"))
      // awcls.R:84: dof scale uses n/(n-d), not n_users/(n_users-d)
      val lower = breeze.linalg.cholesky(meat)
      val half = h \ lower
      val sand = (half * half.t) * (info.n.toDouble / (info.n - d).toDouble)

      val posTheta = (dA + dH) until d
      val vTheta = DenseMatrix.tabulate(dS + dR, dS + dR)((i, j) =>
        sand(posTheta(i), posTheta(j)))
      val jTheta = DenseMatrix.horzcat(bigGamma, DenseMatrix.eye[Double](dR) * betaSv(2))
      val vBetaR = jTheta * vTheta * jTheta.t
      val se = LinAlg.diagSqrt(vBetaR)
      val err = betaR - betaRTrue
      EstimateResult(betaR, se, vBetaR, err.t * LinAlg.solveVec(vBetaR, err), err /:/ se,
        info.n, d, tiltWarning = false)
    } finally df.unpersist()
  }

  // =====================================================================
  // DR-WCLS (drwcls.R): pseudo-outcome + closed-form DRET + 2-block pool.
  // =====================================================================
  def drwcls(df0: DataFrame, betaRTrue: DenseVector[Double],
             betaH: Design, betaSOf: Column => Design, betaROf: DataFrame => Design,
             pSDesign: Design): EstimateResult = {
    val info = panelInfo(df0)
    val fS = Glm.logistic(df0, pSDesign, col("a"))
    val pS = fS.predict(pSDesign)
    val dfE0 = df0
      .withColumn("p_s_hat", pS)
      .withColumn("a_centered", col("a") - col("p_s_hat"))
      .withColumn("p_s_hat_a", col("a") * col("p_s_hat") + (lit(1.0) - col("a")) * (lit(1.0) - col("p_s_hat")))
      .withColumn("w", col("p_s_hat_a") / col("p_h_a"))
    val dfP = withBlockCluster(dfE0, info).cache()
    try {
      val xS = betaSOf(col("a_centered"))
      val xHs = betaH ++ xS
      val beta = Glm.wls(dfP, xHs, col("y"), col("w"))
      val dH = betaH.width; val dS = xS.width
      val betaHv = beta(0 until dH); val betaSv = beta(dH until dH + dS)

      val xSraw = xS.scale(lit(1.0) / col("a_centered"))
      val ce = xSraw.dot(betaSv.toArray.toSeq)
      // counterfactual predictions (drwcls.R:163-173, P10): evaluate the
      // same linear predictor under a_centered := 1-p̂ / -p̂ — no table clone.
      val fH = betaH.dot(betaHv.toArray.toSeq)
      val xS1 = betaSOf(lit(1.0) - col("p_s_hat"))
      val xS0 = betaSOf(-col("p_s_hat"))
      val f1 = fH + xS1.dot(betaSv.toArray.toSeq)
      val f0 = fH + xS0.dot(betaSv.toArray.toSeq)
      val dfCe = dfP
        .withColumn("__ce", ce)
        .withColumn("__f1", f1)
        .withColumn("__f0", f0)
        .withColumn("__fa", col("a") * col("__f1") + (lit(1.0) - col("a")) * col("__f0"))
        .withColumn("__ytd", col("a") - (lit(1.0) - col("p_h")))
        .withColumn("__ytf", (col("y") - col("__fa")) / col("__ytd"))
        .withColumn("__yt", col("__ytf") + col("__ce"))

      val tilt = fitTilt(dfCe, info.piInternal)
      val df = tilt.df.cache()
      try {
        val isI = col("is_internal").cast("double")
        val isE = col("is_external").cast("double")
        val xRr = betaROf(df)
        val dR = xRr.width
        val pi = info.piInternal

        // DRP point estimate: OLS ce ~ Xr on internal (drwcls.R:215)
        val betaRv = Glm.wls(df.filter(col("is_internal")), xRr, col("__ce"), lit(1.0))

        // DRET closed form (drwcls.R:218-223): one fused pass
        val pre = new MomentPass(df)
        val gInt = pre.gram(xRr, isI)
        val vCe = pre.vsum(xRr, isI * col("__ce"))
        val vExt = pre.vsum(xRr, isE * col("tilt_ratios") * col("__ytf"))
        pre.run()
        val lhs = pre.matrix(gInt) / pi
        val rhs = pre.vector(vCe) / pi + pre.vector(vExt) / (1.0 - pi)
        val betaRet = LinAlg.solveVec(lhs, rhs)

        val dAs = pSDesign.width; val dO = tilt.design.width
        val d = dAs + dH + dS + dO + 1 + 2 * dR

        val resid = col("y") - xHs.dot(beta.toArray.toSeq)
        val wres = col("w") * resid
        val fitS = xS.dot(betaSv.toArray.toSeq)
        val (tiltScores, tiltW) = tiltScoreCols(tilt.design, pi)
        val retResidI = col("__f1") - col("__f0") - xRr.dot(betaRet.toArray.toSeq)

        val scores =
          pSDesign.scale(col("a") - col("p_s_hat")) ++
          xHs.scale(wres) ++
          tiltScores ++
          Design(Seq(("pi", isI - lit(pi)))) ++
          xRr.scale(isI * (col("__yt") - xRr.dot(betaRv.toArray.toSeq))) ++
          xRr.scale(isE * col("tilt_ratios") * (col("y") - col("__fa")) / (col("__ytd") * lit(1.0 - pi)) +
                    isI * retResidI / lit(pi))

        val pHatS = col("p_s_hat"); val pHatSA = col("p_s_hat_a")
        val logd = (-(lit(2.0) * col("a") - 1.0) * pHatS * (lit(1.0) - pHatS)) / pHatSA
        val lpd = -(lit(1.0) - pHatS)
        val blkNeg = Design(Design.zeros(dH).map(("z", _))) ++ xSraw.scale(-pHatS)

        val pass = new MomentPass(df)
        val gAs = pass.gram(pSDesign, pHatS * (lit(1.0) - pHatS))
        val gHs = pass.gram(xHs, col("w"))
        val c1 = pass.cross(xHs, pSDesign, wres * logd)
        val c2 = pass.cross(blkNeg, pSDesign, wres * lpd)
        val c3 = pass.cross(xHs, pSDesign, pHatS * fitS / col("a_centered") * col("w") * lpd)
        val gO = pass.gram(tilt.design, tiltW)
        val gR = pass.gram(xRr, isI)
        val cRH = pass.cross(xRr, betaH, isI / col("__ytd"))
        val cRS1 = pass.cross(xRr, xS, isI / col("__ytd"))
        val cRS2 = pass.cross(xRr, xSraw, isI)
        val cEtO = pass.cross(xRr, tilt.design, isE * col("tilt_ratios") * col("__ytf"))
        val cEtH = pass.cross(xRr, betaH, isE * col("tilt_ratios") / col("__ytd"))
        val cEtS = pass.cross(xRr, xS, isE * col("tilt_ratios") / col("__ytd"))
        val vPi = pass.vsum(xRr,
          lit(-1.0 / ((1.0 - pi) * (1.0 - pi))) * isE * col("tilt_ratios") * (col("y") - col("__fa")) / col("__ytd") +
          lit(1.0 / (pi * pi)) * isI * retResidI)
        pass.run()

        val h = DenseMatrix.zeros[Double](d, d)
        h(0 until dAs, 0 until dAs) := pass.matrix(gAs)
        val sHs = dAs
        h(sHs until sHs + dH + dS, sHs until sHs + dH + dS) := pass.matrix(gHs)
        h(sHs until sHs + dH + dS, 0 until dAs) :=
          pass.matrix(c1) + pass.matrix(c2) + pass.matrix(c3)
        val sO = sHs + dH + dS
        h(sO until sO + dO, sO until sO + dO) := pass.matrix(gO)
        val pPi = sO + dO
        h(pPi, pPi) = info.n.toDouble
        val sR = pPi + 1
        h(sR until sR + dR, sR until sR + dR) := pass.matrix(gR)
        h(sR until sR + dR, sHs until sHs + dH) := pass.matrix(cRH)
        h(sR until sR + dR, sHs + dH until sO) := pass.matrix(cRS1) - pass.matrix(cRS2)
        val sRet = sR + dR
        h(sRet until d, sRet until d) := pass.matrix(gR) / pi
        h(sRet until d, sO until sO + dO) := -pass.matrix(cEtO) / (1.0 - pi)
        h(sRet until d, sHs until sHs + dH) := pass.matrix(cEtH) / (1.0 - pi)
        h(sRet until d, sHs + dH until sO) :=
          pass.matrix(cEtS) / (1.0 - pi) - pass.matrix(cRS2) / pi
        h(sRet until d, pPi) := pass.vector(vPi)

        val meat = Sandwich.meat(df, scores, col("__cluster"))
        val sand = LinAlg.sandwichStep(h, meat, info.nUsers, d)

        val posR = sR until d
        val v = DenseMatrix.tabulate(2 * dR, 2 * dR)((i, j) => sand(posR(i), posR(j)))
        val stacked = DenseVector.vertcat(betaRv, betaRet)
        val (pooled, vp) = Pooling.full(stacked, v, dR, 2)
        val se = LinAlg.diagSqrt(vp)
        val err = pooled - betaRTrue
        EstimateResult(pooled, se, vp, err.t * LinAlg.solveVec(vp, err), err /:/ se,
          info.n, d, tilt.warning)
      } finally df.unpersist()
    } finally dfP.unpersist()
  }

  // =====================================================================
  // PET-WCLS (petwcls.R): P-stage + ET-stage, 3-block pooling.
  // =====================================================================
  def petwcls(df0: DataFrame, betaRTrue: DenseVector[Double],
              betaH: Design, betaSOf: Column => Design, etBetaROf: Column => Design,
              betaROf: DataFrame => Design, pSDesign: Design): EstimateResult = {
    val info = panelInfo(df0)
    val fS = Glm.logistic(df0, pSDesign, col("a"))
    val pS = fS.predict(pSDesign)
    val dfE0 = df0
      .withColumn("p_s_hat", pS)
      .withColumn("a_centered", col("a") - col("p_s_hat"))
      .withColumn("p_s_hat_a", col("a") * col("p_s_hat") + (lit(1.0) - col("a")) * (lit(1.0) - col("p_s_hat")))
      .withColumn("w", col("p_s_hat_a") / col("p_h_a"))
    val dfP = withBlockCluster(dfE0, info).cache()
    try {
      val tilt = fitTilt(dfP, info.piInternal)
      val df = tilt.df.withColumn("w_and_tilt", col("w") * col("tilt_ratios")).cache()
      try {
        val isI = col("is_internal").cast("double")
        val isE = col("is_external").cast("double")
        val pi = info.piInternal

        val xS = betaSOf(col("a_centered"))
        val xHs = betaH ++ xS
        val bhs = Glm.wls(df, xHs, col("y"), col("w"))
        val dH = betaH.width; val dS = xS.width
        val betaSv = bhs(dH until dH + dS)

        val xSraw = xS.scale(lit(1.0) / col("a_centered"))
        val ce = xSraw.dot(betaSv.toArray.toSeq)
        val dfCe = df.withColumn("__ce", ce)

        val xRw = etBetaROf(col("a_centered"))
        val xHr = betaH ++ xRw
        val bhr = Glm.wls(dfCe, xHr, col("y"), col("w_and_tilt"))
        val dR2 = xRw.width
        val betaRw = bhr(dH until dH + dR2)

        val xRr = betaROf(dfCe)
        val dR = xRr.width
        val betaRv = Glm.wls(dfCe.filter(col("is_internal")), xRr, col("__ce"), lit(1.0))

        val dAs = pSDesign.width; val dO = tilt.design.width
        val d = dAs + dO + 2 * dH + dS + dR2 + dR

        val resid1 = col("y") - xHs.dot(bhs.toArray.toSeq)
        val wres1 = col("w") * resid1
        val fitS = xS.dot(betaSv.toArray.toSeq)
        val resid2 = col("y") - xHr.dot(bhr.toArray.toSeq)
        val wres2 = col("w") * col("tilt_ratios") * resid2
        val fitR2 = xRw.dot(betaRw.toArray.toSeq)
        val (tiltScores, tiltW) = tiltScoreCols(tilt.design, pi)

        val scores =
          pSDesign.scale(col("a") - col("p_s_hat")) ++
          tiltScores ++
          xHs.scale(wres1) ++
          (betaH ++ xRw).scale(wres2) ++
          xRr.scale(isI * (col("__ce") - xRr.dot(betaRv.toArray.toSeq)))

        val pHatS = col("p_s_hat"); val pHatSA = col("p_s_hat_a")
        val logd = (-(lit(2.0) * col("a") - 1.0) * pHatS * (lit(1.0) - pHatS)) / pHatSA
        val lpd = -(lit(1.0) - pHatS)
        val xRwRaw = xRw.scale(lit(1.0) / col("a_centered"))
        val blkNegS = Design(Design.zeros(dH).map(("z", _))) ++ xSraw.scale(-pHatS)
        val blkNegR = Design(Design.zeros(dH).map(("z", _))) ++ xRwRaw.scale(-pHatS)

        val pass = new MomentPass(dfCe)
        val gAs = pass.gram(pSDesign, pHatS * (lit(1.0) - pHatS))
        val gO = pass.gram(tilt.design, tiltW)
        val gHs = pass.gram(xHs, col("w"))
        val c1 = pass.cross(xHs, pSDesign, wres1 * logd)
        val c2 = pass.cross(blkNegS, pSDesign, wres1 * lpd)
        val c3 = pass.cross(xHs, pSDesign, pHatS * fitS / col("a_centered") * col("w") * lpd)
        val gHr = pass.gram(xHr, col("w_and_tilt"))
        val c4 = pass.cross(xHr, pSDesign, wres2 * logd)
        val c5 = pass.cross(blkNegR, pSDesign, wres2 * lpd)
        val c6 = pass.cross(xHr, pSDesign,
          pHatS * fitR2 / col("a_centered") * col("w") * col("tilt_ratios") * lpd)
        val cO2 = pass.cross(xHr, tilt.design, isE * wres2)
        val gR = pass.gram(xRr, isI)
        val cRS = pass.cross(xRr, xSraw, isI)
        pass.run()

        val h = DenseMatrix.zeros[Double](d, d)
        h(0 until dAs, 0 until dAs) := pass.matrix(gAs)
        val sO = dAs
        h(sO until sO + dO, sO until sO + dO) := pass.matrix(gO)
        val sHs = sO + dO
        h(sHs until sHs + dH + dS, sHs until sHs + dH + dS) := pass.matrix(gHs)
        h(sHs until sHs + dH + dS, 0 until dAs) :=
          pass.matrix(c1) + pass.matrix(c2) + pass.matrix(c3)
        val sHr = sHs + dH + dS
        h(sHr until sHr + dH + dR2, sHr until sHr + dH + dR2) := pass.matrix(gHr)
        h(sHr until sHr + dH + dR2, 0 until dAs) :=
          pass.matrix(c4) + pass.matrix(c5) + pass.matrix(c6)
        h(sHr until sHr + dH + dR2, sO until sO + dO) := -pass.matrix(cO2)
        val sR = sHr + dH + dR2
        h(sR until d, sR until d) := pass.matrix(gR)
        h(sR until d, sHs + dH until sHr) := -pass.matrix(cRS)

        val meat = Sandwich.meat(dfCe, scores, col("__cluster"))
        val sand = LinAlg.sandwichStep(h, meat, info.nUsers, d)

        // pool 3 blocks: beta_r_wcls (2 blocks of d_r) + beta_r (1 block)
        val posR = (sHr + dH) until d
        val v = DenseMatrix.tabulate(dR2 + dR, dR2 + dR)((i, j) => sand(posR(i), posR(j)))
        val stacked = DenseVector.vertcat(betaRw, betaRv)
        val (pooled, vp) = Pooling.full(stacked, v, dR, 3)
        val se = LinAlg.diagSqrt(vp)
        val err = pooled - betaRTrue
        EstimateResult(pooled, se, vp, err.t * LinAlg.solveVec(vp, err), err /:/ se,
          info.n, d, tilt.warning)
      } finally df.unpersist()
    } finally dfP.unpersist()
  }
}
