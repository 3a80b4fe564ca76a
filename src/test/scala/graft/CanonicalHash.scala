package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Canonical result-set hash, mirroring the driver's correctness compare:
  * columns sorted by name, rows sorted lexicographically, values
  * stringified with doubles rounded to 6 decimals (absorbs shuffle-order
  * float noise well below any value the queries emit — their doubles are
  * already rounded to ≥ 4 dp at the query level). Locale-pinned
  * formatting and an explicit  column separator keep the hash
  * stable across JVMs and unambiguous across column boundaries.
  *
  * Used by FixturePinSpec to pin the DuckDB-inexpressible (`no_oracle`)
  * queries to committed hashes: a machine-checked value where the driver
  * gate can only count rows.
  */
object CanonicalHash {
  private def fmt(v: Any): String = v match {
    case null                       => "∅"
    case d: java.lang.Double        => String.format(java.util.Locale.ROOT, "%.6f", d)
    case f: java.lang.Float         => String.format(java.util.Locale.ROOT, "%.6f", java.lang.Double.valueOf(f.toDouble))
    case a: scala.collection.Seq[_] => a.map(fmt).mkString("[", ",", "]")
    case x                          => String.valueOf(x)
  }

  def apply(df: DataFrame): String = {
    val cols = df.columns.sorted
    val proj = df.select(cols.map(col): _*)
    val lines = proj.collect().map { r =>
      cols.indices.map(i => fmt(r.get(i))).mkString("")
    }.sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(lines.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
