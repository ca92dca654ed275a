package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Library-surface scalar helpers that the reference exposes but Spark does
  * not ship verbatim (SURVEY §2.6). Everything here composes built-in
  * Catalyst expressions — fully codegen'd, no UDFs — so the 100 TB plan keeps
  * whole-stage codegen across these calls.
  */
object GraftFunctions {

  /** SQL `(s1, e1) OVERLAPS (s2, e2)` — the one reference scalar with no
    * direct Spark function (reference FunctionCatalog `temporalOverlaps`,
    * `flink-table/.../validate/FunctionCatalog.scala:236`). Standard SQL
    * semantics: inclusive start, exclusive ordering by `<`/`>` on swapped
    * bounds; handles unordered (start, end) pairs per spec.
    */
  def temporalOverlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column = {
    val lo1 = least(s1, e1); val hi1 = greatest(s1, e1)
    val lo2 = least(s2, e2); val hi2 = greatest(s2, e2)
    lo1 <= hi2 && lo2 <= hi1
  }

  /** Reference `charLength` (FunctionCatalog.scala:181). */
  def charLength(c: Column): Column = length(c)

  /** Reference `position(needle IN haystack)` — 1-based, 0 when absent. */
  def position(needle: Column, haystack: Column): Column = locate_col(needle, haystack)
  private def locate_col(n: Column, h: Column): Column =
    call_function("locate", n, h)

  /** 64-bit-safe stable token hash shared with the DuckDB oracles: the first
    * 15 hex chars of md5 as a non-negative bigint (60 bits). md5 is
    * bit-identical across engines, unlike murmur/xxhash builtins.
    */
  def stableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** stableHash reduced mod m (m small enough that downstream products stay
    * inside 64-bit signed range). */
  def stableHashMod(c: Column, m: Long): Column = stableHash(c) % m

  /** Whitespace tokenizer used by the text/dedup operators — same regex on
    * the oracle side (`string_split_regex(lower(text), '\s+')`). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles of a token array (n >= 1): concatenated with a
    * single space, positions 0..len-n. Uses higher-order array functions —
    * stays inside codegen, no UDF. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** Order-sensitive document fingerprint: SUM(h(tok) * position) in exact
    * integer arithmetic. h is stableHash mod 1e12+39 so the positional
    * product of a ~1e4-token document stays far below 2^63. Deterministic,
    * associative (integer sum) → identical on any partitioning/order. */
  val FpMod = 1000000000039L
  def fingerprint(toks: Column): Column =
    aggregate(
      zip_with(toks, sequence(lit(1), size(toks)),
        (t, i) => (stableHash(t) % FpMod) * i),
      lit(0L), (acc, x) => acc + x)

  // ---- vector primitives (embeddings: array<float>) -----------------------

  /** Ordered ascending-index dot product in double precision — the native
    * [[DotProduct]] Catalyst expression (codegen'd counted loop; HOF folds
    * are interpreted and unrolled Add-chains exceed the JIT method limit).
    * Summation order matches DuckDB's `list_aggregate(..,'sum')` left fold,
    * so results are bit-identical cross-engine. Requires
    * [[GraftExtensions.install]] (done by Tables.load). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))

  /** L2 norm, same fold-order guarantee as [[dot]]. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact long dot product over two `array<bigint>` columns — the native
    * [[LongDot]] expression (codegen'd counted loop; the HOF fold is
    * interpreted). Associative integer arithmetic: partition-order-free and
    * cross-engine exact. Requires [[GraftExtensions.install]]. */
  def lldot(a: Column, b: Column): Column = call_function("graft_lldot", a, b)

  /** Exact squared L2 distance over two `array<bigint>` columns — the
    * native [[LongSqDist]] expression: the IVF/SemDeDup assignment inner
    * loop (n×cells evaluations per pass), codegen'd where the HOF fold is
    * interpreted. Requires [[GraftExtensions.install]]. */
  def lld2(a: Column, b: Column): Column = call_function("graft_lld2", a, b)

  /** Signed projection of an `array<bigint>` vector by a row-major
    * `array<array<bigint>>` sign matrix — the native [[SignedProject]]
    * kernel: all JL components in one codegen'd nested loop where the
    * unrolled per-component summation trees blow the generated-method
    * limits. Requires [[GraftExtensions.install]]. */
  def jlproject(vec: Column, signs: Column): Column =
    call_function("graft_jl", vec, signs)

  /** 0-based argmin-d² centroid-row index of an `array<bigint>` vector
    * over an `array<array<bigint>>` centroid matrix — the native
    * [[ArgminCell]] kernel: one codegen'd nested loop where the
    * array-of-structs `array_min` literal form grows the expression tree
    * with the cell count and drops out of codegen at production cell
    * counts (the graft_jl failure mode on the placement path). First-wins
    * ties ≡ (d², cid) lexicographic argmin when rows are ordered by
    * ascending cell id. Requires [[GraftExtensions.install]]. */
  def cellArgmin(vec: Column, cents: Column): Column =
    call_function("graft_cell", vec, cents)

  /** Per-subspace PQ codeword argmin — the native [[PqArgmin]] expression
    * replacing the interpreted transform/filter/array_min/aggregate chain
    * that runs the sub×k×dims scan per corpus row. `cb` is an
    * `array<array<double>>` codebook matrix in (subspace, cid) row order.
    * Requires [[GraftExtensions.install]]. */
  def pqArgmin(vec: Column, cb: Column): Column =
    call_function("graft_pqmin", vec, cb)

  /** ADC lookup sum over PQ codes and a per-query distance table — the
    * native [[AdcLookupSum]] expression replacing the interpreted
    * lookup fold that runs once per (query, vector) pair. Requires
    * [[GraftExtensions.install]]. */
  def adcSum(codes: Column, table: Column): Column =
    call_function("graft_adc", codes.cast("array<bigint>"), table)

  /** Cosine similarity of two float vectors (double math, ordered folds). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Integer-quantized view of a float vector: round(x*1e6) per element.
    * Integer sums are associative, so aggregations over arbitrary partition /
    * shuffle order stay exact and cross-engine deterministic. */
  def quantize(a: Column): Column =
    transform(a.cast("array<double>"),
      x => round(x * 1000000).cast("long"))
}
