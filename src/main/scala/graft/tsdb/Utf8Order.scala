package graft.tsdb

/** Spark orders `StringType` by `UTF8String`'s binary comparison —
  * unsigned byte-wise over the UTF-8 encoding. The driver-resident
  * serving tiers sort and cursor-compare COLLECTED Scala Strings, and
  * `String`'s natural (UTF-16 code unit) order disagrees with UTF-8
  * binary order exactly for supplementary-plane characters: a surrogate
  * pair (0xD800–0xDFFF units) sorts below U+E000–U+FFFF chars in
  * `String.compareTo` but encodes as 0xF0-lead bytes that sort ABOVE
  * their 0xE0-lead encodings. A series key containing an emoji would
  * order (and paginate) differently depending on which tier served the
  * query. Delegating to `UTF8String` itself keeps every driver-side
  * comparison bit-identical to the Spark path's. */
object Utf8Order extends Ordering[String] {
  import org.apache.spark.unsafe.types.UTF8String
  override def compare(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
}
