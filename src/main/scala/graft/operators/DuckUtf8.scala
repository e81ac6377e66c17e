package graft.operators

/** DuckDB oracle fragments that fold strings by UTF-8 BYTE — the unit
  * every native kernel hashes (PolyHash/ShingleHashes/WindowHashKernel
  * iterate `UTF8String.getByte`). DuckDB's string functions read CODE
  * POINTS (`ascii` returns the code point, `substr` slices characters),
  * so a naive `ascii(substr(...))` fold agrees with the engine only on
  * ASCII text: the first 'é' (two UTF-8 bytes, one code point) makes
  * every shingle signature diverge. These helpers expand each code point
  * to its UTF-8 bytes with pure arithmetic — RFC 3629's four ranges —
  * so the oracle replays the byte fold exactly on any text. (The
  * testbed corpus happens to be ASCII today, which is precisely why the
  * hash gate could never catch the divergence; the expansion keeps the
  * oracle honest for the multilingual corpora the documents fixture
  * models.)
  */
object DuckUtf8 {

  /** UTF-8 bytes of the code point `cp` (a BIGINT SQL expression), as a
    * BIGINT list. */
  def bytesOfCp(cp: String): String =
    s"""CASE WHEN $cp < 128 THEN [$cp]
       |     WHEN $cp < 2048 THEN [192 + $cp // 64, 128 + $cp % 64]
       |     WHEN $cp < 65536 THEN [224 + $cp // 4096,
       |                            128 + ($cp // 64) % 64, 128 + $cp % 64]
       |     ELSE [240 + $cp // 262144, 128 + ($cp // 4096) % 64,
       |           128 + ($cp // 64) % 64, 128 + $cp % 64] END""".stripMargin

  /** The UTF-8 byte values of string column/expression `c`, in order, as
    * one BIGINT list. */
  def byteList(c: String): String =
    s"flatten(list_transform(" +
      s"list_transform(generate_series(1, length($c)), " +
      s"i -> CAST(ascii(substr($c, i, 1)) AS BIGINT)), " +
      s"cp -> ${bytesOfCp("cp")}))"

  /** Base-`base` rolling hash of `c`'s UTF-8 bytes mod `p` — the DuckDB
    * fold bit-identical to the native graft_polyhash family, INCLUDING
    * null propagation: the kernel returns NULL on NULL input, while a
    * bare `list_prepend(0, NULL)` here would yield `[0]` and fold to 0
    * (the hostile-gate null probe caught exactly that on
    * text_fingerprint). */
  def polyFold(c: String, base: Int, p: Long): String =
    s"CASE WHEN $c IS NULL THEN NULL ELSE " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), ${byteList(c)}), " +
      s"(acc, x) -> (acc * $base + x) % $p) END"
}
