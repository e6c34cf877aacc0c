package graft

import java.io.{File, RandomAccessFile}
import java.security.MessageDigest

/** Content identity stamp for a parquet fixture path (file or directory).
  *
  * Why (r14 verdict #2/#8): three rounds running, the sf1 forward baseline
  * was invalidated because /tmp/graft_sf1 was regenerated mid-round and the
  * bench JSONs carried no way to tell — and the per-dir index/BPE memos key
  * on the DIR PATH, so a long-lived JVM that rewrites a dir in place was
  * silently served the prior corpus's trained state. Both problems need the
  * same primitive: a cheap, deterministic content stamp.
  *
  * What it hashes: for every regular non-hidden file under the path (sorted
  * by relative path), the relative path, the byte length, and the LAST 4 KiB
  * of the file. For parquet that tail is the footer — schema, row counts,
  * per-column min/max stats — so any rewrite that changes data changes the
  * stamp, while the stamp never reads more than a few KiB per file (listing
  * + one tail read; microseconds to low ms per table, safe to pay on every
  * memo lookup). mtimes are deliberately excluded: a byte-identical rewrite
  * keeps its identity. Parquet footers embed writer-randomized artifacts
  * (part-file UUIDs in names, row-group offsets), so two independent WRITES
  * of identical data may stamp differently — fine for both uses, which only
  * need "same bytes ⇒ same stamp" and "data changed ⇒ stamp changed". */
object FixtureStamp {
  private val TailBytes = 4096

  /** Hex stamp (16 chars, md5-prefix) of the file/dir content at `path`.
    * Nonexistent path stamps as "absent" — callers memoize on it like any
    * other value and naturally rebuild when the path appears. */
  def stamp(path: String): String = {
    val root = new File(path)
    if (!root.exists()) return "absent"
    val md = MessageDigest.getInstance("MD5")
    def walk(f: File, rel: String): Unit = {
      if (f.isDirectory) {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
          .filterNot(_.getName.startsWith("."))
          .sortBy(_.getName)
        kids.foreach(k => walk(k, rel + "/" + k.getName))
      } else {
        md.update(rel.getBytes("UTF-8"))
        val len = f.length()
        md.update(java.nio.ByteBuffer.allocate(8).putLong(len).array())
        if (len > 0) {
          val raf = new RandomAccessFile(f, "r")
          try {
            val n = math.min(len, TailBytes.toLong).toInt
            raf.seek(len - n)
            val buf = new Array[Byte](n)
            raf.readFully(buf)
            md.update(buf)
          } finally raf.close()
        }
      }
    }
    walk(root, root.getName)
    md.digest().map("%02x".format(_)).mkString.take(16)
  }
}
