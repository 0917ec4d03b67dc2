package graft.functions

/** Cross-engine-deterministic logarithms over positive integer SQL
  * expressions — NO libm call anywhere.
  *
  * Why: round 8 proved that any `round(libm_fn(x), 6)` on the oracle
  * comparison surface inherits the oracle ENGINE's libm build — glibc and
  * musl (or two glibc versions) disagree by an ulp on `exp`/`log` near a
  * rounding boundary, flipping a 6th decimal and the hash with it. IEEE-754
  * BASIC operations (+, −, ×, ÷, sqrt) are correctly rounded by the
  * standard, so a logarithm evaluated as a FIXED sequence of basic double
  * ops produces the bit-identical double on the JVM (all fp is strict since
  * Java 17) and on any C++ SQL engine that evaluates the expression as
  * written (vectorized engines run one kernel per operator — no fusion, no
  * reassociation). Quantizing THAT value is then deterministic by
  * construction: both engines floor the same double.
  *
  * Method, for integer n ≥ 1 (n < 2^53 so the double cast is exact):
  *   k  = floor(log2 n) = length(bin(n)) − 1      (pure integer/string op)
  *   m  = n / 2^k ∈ [1, 2)                         (2^k via bit shift; exact)
  *   u  = (m−1)/(m+1) ∈ [0, 1/3]
  *   ln m = 2·atanh(u) ≈ u·(2 + u²·(2/3 + u²·(2/5 + … + u²·(2/15))))
  *   ln n = k·ln2 + ln m
  * The 8-term Horner series truncates below 1e-9 at u = 1/3 — and the
  * truncation is the SAME on every engine, which is all the determinism
  * contract needs; accuracy only has to be "a correct log10" for the
  * operator's semantics (CCNet-style LM filters threshold at whole-number
  * log-prob scales).
  *
  * The constants are the shortest decimal representations of the doubles
  * nearest ln 2, 1/ln 10, 1/ln 2 — decimal→double parsing is correctly
  * rounded in the JVM and in strtod, so both engines hold the identical
  * bit pattern.
  */
object PortableLog {

  private val Ln2 = "0.6931471805599453"
  private val InvLn10 = "0.4342944819032518"
  private val InvLn2 = "1.4426950408889634"

  /** An explicitly DOUBLE-typed literal — a bare `2.0` parses as DECIMAL in
    * BOTH Spark and DuckDB, and Spark then runs `2.0/3.0` as 6-digit decimal
    * division, silently changing the series coefficients (caught by
    * PortabilitySpec bit-compare).
    */
  private def d(lit: String, spark: Boolean): String =
    if (spark) s"${lit}D" else s"${lit}::DOUBLE"

  /** ln(n) as a double-typed SQL fragment over a positive bigint expression
    * `n`; `spark` picks the dialect (Spark SQL vs DuckDB) — the VALUE is
    * identical under both.
    */
  def lnSql(n: String, spark: Boolean): String = {
    val k = s"(length(bin($n)) - 1)"
    val pow2k =
      if (spark) s"cast(shiftleft(cast(1 as bigint), $k) as double)"
      else s"((1::BIGINT << $k)::DOUBLE)"
    val m = s"(cast(($n) as double) / $pow2k)"
    def c(num: String, den: String) = s"(${d(num, spark)} / ${d(den, spark)})"
    val one = d("1.0", spark)
    val two = d("2.0", spark)
    val u = s"(($m - $one) / ($m + $one))"
    val u2 = s"($u * $u)"
    val ser = s"($u * ($two + $u2 * (${c("2.0", "3.0")} + $u2 * (${c("2.0", "5.0")} + " +
      s"$u2 * (${c("2.0", "7.0")} + $u2 * (${c("2.0", "9.0")} + $u2 * (${c("2.0", "11.0")} + " +
      s"$u2 * (${c("2.0", "13.0")} + $u2 * ${c("2.0", "15.0")}))))))))"
    s"(cast($k as double) * ${d(Ln2, spark)} + $ser)"
  }

  /** log10(a/b) for positive bigint expressions — evaluated as
    * (ln a − ln b) · (1/ln 10) so no division result ever feeds the series.
    */
  def log10RatioSql(a: String, b: String, spark: Boolean): String =
    s"((${lnSql(a, spark)} - ${lnSql(b, spark)}) * ${d(InvLn10, spark)})"

  /** log2(n) for a positive bigint expression. */
  def log2Sql(n: String, spark: Boolean): String =
    s"(${lnSql(n, spark)} * ${d(InvLn2, spark)})"

  /** Floor-quantize a double fragment to 6dp as DECIMAL(18,6) — floor of the
    * identical double is identical; no round(), no HALF_UP tie class.
    */
  def floorDec6Sql(x: String, spark: Boolean): String =
    if (spark)
      s"cast(cast(floor($x * 1000000.0D) as decimal(18,0)) * cast(0.000001 as decimal(7,6)) as decimal(18,6))"
    else
      s"(floor($x * 1000000.0::DOUBLE)::DECIMAL(18,0) * 0.000001::DECIMAL(7,6))::DECIMAL(18,6)"

  /** The same fixed op sequence in plain Scala (Java 17 doubles are strict):
    * the independent reference PortabilitySpec pins the SQL fragments to.
    */
  def lnRef(n: Long): Double = {
    require(n >= 1, s"lnRef needs n >= 1, got $n")
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << k).toDouble
    val u = (m - 1.0) / (m + 1.0)
    val u2 = u * u
    val ser = u * (2.0 + u2 * (2.0 / 3.0 + u2 * (2.0 / 5.0 + u2 * (2.0 / 7.0 +
      u2 * (2.0 / 9.0 + u2 * (2.0 / 11.0 + u2 * (2.0 / 13.0 + u2 * (2.0 / 15.0))))))))
    k.toDouble * 0.6931471805599453 + ser
  }

  def log10RatioRef(a: Long, b: Long): Double =
    (lnRef(a) - lnRef(b)) * 0.4342944819032518

  def log2Ref(n: Long): Double = lnRef(n) * 1.4426950408889634
}
