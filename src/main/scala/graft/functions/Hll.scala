package graft.functions

/** The d48/d49 HyperLogLog register semantics as plain JVM functions —
  * ONE definition shared by the streaming stateful operator
  * (StreamingAnalytics.streamingDistinct) and the parity spec that pins
  * it bit-for-bit to the SQL-expression form the batch gates use
  * (TextQueries d48: bucket = first md5 byte mod 64, rho = leading-zero
  * count of the next 48 bits + 1, integer register units 2^(20−r),
  * α_ppm = 709357, linear-counting small-range branch from the shared
  * ln-table). Everything is integer arithmetic: two engines — or a
  * streaming state store and a batch recompute — can only agree if no
  * float sneaks in.
  */
object Hll {
  val m = 64

  /** round(ln(64/V)·1e6) for V = 1..64 — same table as TextQueries. */
  val lnTable: Array[Long] =
    (1 to 64).map(v => Math.round(Math.log(64.0 / v) * 1e6)).toArray

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** (bucket, rho) of one item — the register this item updates. */
  def registerOf(token: String): (Int, Int) = {
    val h = md5Hex(token)
    val bucket = Integer.parseInt(h.substring(0, 2), 16) % m
    val tail = h.substring(2, 14) // 12 hex chars = 48 bits
    val tz = tail.dropWhile(_ == '0')
    val rho =
      if (tz.isEmpty) 49
      else {
        val lead = (12 - tz.length) * 4
        val c = tz.charAt(0)
        val lzb =
          if (c == '1') 3
          else if (c == '2' || c == '3') 2
          else if (c >= '4' && c <= '7') 1
          else 0
        lead + lzb + 1
      }
    (bucket, rho)
  }

  /** Fold one item into a 64-register array (mutates, returns it). */
  def update(regs: Array[Int], token: String): Array[Int] = {
    val (b, r) = registerOf(token)
    if (r > regs(b)) regs(b) = r
    regs
  }

  /** Bucket-wise max merge — the distributed/streaming combine step. */
  def merge(a: Array[Int], b: Array[Int]): Array[Int] =
    Array.tabulate(m)(i => math.max(a(i), b(i)))

  /** Integer estimate: α·m²·2^20 div S, linear counting below 2.5m with
    * empty buckets — identical arithmetic to the d48 SQL.
    */
  def estimate(regs: Array[Int]): Long = {
    val s = regs.map(r => 1L << math.max(20 - r, 0)).sum
    val vEmpty = regs.count(_ == 0)
    val raw = 709357L * 4096L * 1048576L / s / 1000000L
    if (raw < 160 && vEmpty > 0) 64L * lnTable(vEmpty - 1) / 1000000L
    else raw
  }
}
