package graft

/** The reference's committed example_estimates.csv, shared by both
  * execution-path golden specs so the pins cannot drift apart.
  */
object GoldenValues {
  // method -> (est, se) per coefficient (Intercept, Slope)
  val estimates: Map[String, Seq[(Double, Double)]] = Map(
    "WCLS-Internal"     -> Seq((-1.876, 1.259), (6.355, 1.379)),
    "WCLS-Pooled"       -> Seq((-0.738, 0.751), (4.281, 0.794)),
    "P-WCLS-Internal"   -> Seq((-1.814, 1.276), (6.321, 1.385)),
    "P-WCLS-Pooled"     -> Seq((-2.363, 0.98), (6.07, 0.994)),
    "P-WCLS-Pooled-Obs" -> Seq((-2.441, 0.988), (6.272, 1.037)),
    "ET-WCLS-Equal"     -> Seq((-1.802, 1.514), (5.688, 1.682)),
    "ET-WCLS-Kron"      -> Seq((-1.826, 1.238), (5.924, 1.365)),
    "ET-WCLS"           -> Seq((-2.003, 1.11), (6.028, 1.22)),
    "DR-WCLS"           -> Seq((-2.164, 1.157), (5.944, 1.286)),
    "PET-WCLS"          -> Seq((-2.561, 0.964), (5.817, 0.959)))
}
