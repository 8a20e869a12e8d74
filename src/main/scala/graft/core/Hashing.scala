package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** MD5-derived deterministic hashing used by the dedup / ANN / media
  * operators. MD5 (not xxhash) on purpose: it is available verbatim in every
  * SQL engine (`md5(text)` -> same 32-char hex), so operator outputs remain
  * reproducible by an independent oracle. Where a 64-bit family is needed,
  * the digest's two 8-byte halves seed Kirsch-Mitzenmacher double hashing
  * (h_i = h1 + i*h2 mod 2^64). */
object Hashing {

  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = tl.get()
    d.reset()
    d.digest(bytes)
  }

  def md5Hex(s: String): String = {
    val d = md5(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(d(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  /** Big-endian long from 8 digest bytes at `off` — equals interpreting the
    * corresponding 16 hex chars of md5Hex as a base-16 integer. */
  def longBE(d: Array[Byte], off: Int): Long = {
    var h = 0L
    var i = off
    while (i < off + 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }

  /** hex[from, until) as an unsigned value (fits a Long for <= 15 digits). */
  def hexSlice(hex: String, from: Int, until: Int): Long =
    java.lang.Long.parseLong(hex.substring(from, until), 16)

  /** Deterministic pseudo-random hyperplane component for (plane, dim) in
    * [-1, 1): 48 md5 bits of "plane:<p>:<d>" scaled exactly (the 48-bit
    * integer and the power-of-two division are both exact in double, so any
    * SQL engine recomputes the identical value from the same md5). */
  def planeComponent(plane: Int, dim: Int): Double =
    hexSlice(md5Hex(s"plane:$plane:$dim"), 0, 12).toDouble / 0x800000000000L.toDouble - 1.0
}
