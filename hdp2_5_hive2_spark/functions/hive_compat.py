"""Hive 2.1 scalar-function surface → Spark (SURVEY.md §2.9).

The reference registers 247 functions in a static block
(ql/exec/FunctionRegistry.java:170-470). Spark SQL covers nearly all of them
name-for-name; this module is the explicit inventory: every Hive function
name, how to express it in this engine, and shims for the handful Spark
lacks. `hive_fn(name)` returns a Column-producing callable;
`register_sql_shims(spark)` makes the shimmed names usable from SQL too.

Coverage classes:
  - "builtin": same name, same semantics in Spark SQL — resolved via F.expr
    so SQL-registered builtins (sentences, reflect, xpath, …) work even when
    pyspark.sql.functions lacks a Python wrapper.
  - shim: implemented here as a composition of Spark expressions.
  - "unsupported": deliberately not carried over (EWAH bitmap internals,
    in_file) — raise with a pointer to the replacement.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _expr_fn(name: str) -> Callable[..., Column]:
    """Builtin resolved by name through the SQL parser (works for every
    function Spark registers, incl. ones without pyspark wrappers)."""

    def call(*args: Column | str | int | float) -> Column:
        cols = [a if isinstance(a, Column) else F.lit(a) for a in args]
        return F.call_function(name, *cols)

    call.__name__ = name
    return call


# --- shims for names Spark doesn't provide -------------------------------

def field(needle: Column, *haystack: Column) -> Column:
    """Hive `field(x, a, b, ...)` → 1-based index of first match, 0 if none
    (ql/udf/UDFField — FunctionRegistry.java:255)."""
    return F.coalesce(F.array_position(F.array(*haystack), needle), F.lit(0)).cast("int")


def create_union(tag: Column, *alternatives: Column) -> Column:
    """Hive UNION type constructor (ObjectInspector.java:45 UNION category).
    Spark has no union type — encode as struct(tag, field0, field1, ...),
    matching SURVEY.md §1.2's chosen mapping."""
    fields = [tag.alias("tag")] + [c.alias(f"field{i}") for i, c in enumerate(alternatives)]
    return F.struct(*fields)


def default_nvl(value: Column, fallback: Column) -> Column:
    return F.coalesce(value, fallback)


def legacy_grouping_id(*cols: Column | str) -> Column:
    """Hive ≤ 2.2 GROUPING__ID (the reference's encoding — grouping-set keys
    built in SemanticAnalyzer.java:3753-3766: ROLLUP set i gets key
    ``(1 << i) - 1``): the LEFTMOST group-by expression is the
    LEAST-significant bit and a set bit means the column IS grouped
    (present) in the row. That is the bit-reverse AND complement of the
    modern encoding (Hive 2.3+ / Spark / standard SQL: leftmost = MSB, set
    bit = aggregated). Use this column when migrating queries that read
    GROUPING__ID written by the reference; `grouping_id()` gives the modern
    value. Drift-guarded in tests/test_functions.py."""
    out = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        out = out + (F.lit(1) - F.grouping(c).cast("bigint")) * F.lit(1 << i)
    return out


def mask(
    col: Column,
    upper_char: str = "X",
    lower_char: str = "x",
    digit_char: str = "n",
    other_char: str | None = None,
) -> Column:
    """Hive 2.1 data-masking `mask(str[, upper, lower, digit, other])`
    (ql/udf/generic/GenericUDFMask.java, registered FunctionRegistry.java:484):
    uppercase → ``upper_char``, lowercase → ``lower_char``, digits →
    ``digit_char``, all other characters → ``other_char`` (None = Hive's -1
    "retain original"). String overload; the reference's numeric and date
    overloads (same UDF, type-dispatched at init) are :func:`mask_number`
    and :func:`mask_date`."""
    return F.mask(
        col, F.lit(upper_char), F.lit(lower_char), F.lit(digit_char), F.lit(other_char)
    )


def mask_number(col: Column, number_char: int = 1, dtype: str = "bigint") -> Column:
    """Hive `mask` numeric overload (GenericUDFMask.java:124-215 — the
    Byte/Short/Integer/Long transforms): every decimal digit of |value|
    becomes ``number_char`` (default MASKED_NUMBER = 1), the sign is kept,
    and 0 stays 0 (the reference's digit loop never runs). mask(123) → 111,
    mask(-405) → -111.

    Expressed as a repunit built by `repeat` over the digit COUNT —
    `length(cast(value as string))` minus one for the sign — so
    Long.MIN_VALUE needs no abs() (which would overflow under ANSI mode).
    The result keeps the input's integral type via try_cast: where Java's
    `ret += maskedNumber * pos` silently wraps (e.g. number_char=9 on a
    3-digit tinyint), this yields NULL instead — the one documented
    divergence, on values Hive itself garbles. ``dtype`` pins the output to
    the input's integral type (Hive returns the argument type)."""
    if not (0 <= int(number_char) <= 9):
        number_char = 1  # GenericUDFMask.init: out-of-range → MASKED_NUMBER
    digits = F.length(col.cast("string")) - F.when(col < 0, 1).otherwise(0)
    repunit = F.repeat(F.lit(str(int(number_char))), digits).try_cast(dtype)
    masked = F.when(col < 0, -repunit).otherwise(repunit)
    return F.when(col == 0, col.cast(dtype)).otherwise(masked)


def mask_date(
    col: Column, day_value: int = 1, month_value: int = 0, year_value: int = 0
) -> Column:
    """Hive `mask` date overload (GenericUDFMask.java:220-226): each
    component is replaced unless the knob is -1 (UNMASKED_VAL). Defaults
    (day=1, month=0, year=0) use java.util.Date's 1900-epoch/0-based-month
    conventions, so the fully-masked default is 1900-01-01, and an explicit
    ``year_value`` yields calendar year 1900+year_value — Hive quirk kept
    verbatim. Out-of-range day (>31) / month (>11) fall back to the default
    per init()'s clamps; a valid day that overflows the target month
    normalizes forward (new Date(y, 1, 31) → Mar 2/3) — reproduced with
    date_add over the month's first day."""
    if day_value != -1 and not (1 <= int(day_value) <= 31):
        day_value = 1
    if month_value != -1 and not (0 <= int(month_value) <= 11):
        month_value = 0
    y = F.year(col) if year_value == -1 else F.lit(1900 + int(year_value))
    m = F.month(col) if month_value == -1 else F.lit(int(month_value) + 1)
    d = F.dayofmonth(col) if day_value == -1 else F.lit(int(day_value))
    masked = F.date_add(F.make_date(y, m, F.lit(1)), d - F.lit(1))
    # NULL in, NULL out even when every component is a pinned literal
    return F.when(col.isNull(), F.lit(None).cast("date")).otherwise(masked)


def _mask_head_tail(col: Column, n: int) -> tuple[Column, Column, Column, Column]:
    """(first_n, rest, all_but_last_n, last_n) substrings, short-string safe."""
    length = F.length(col)
    first_n = col.substr(F.lit(1), F.lit(n))
    rest = col.substr(F.lit(n + 1), length)
    head = col.substr(F.lit(1), F.greatest(length - n, F.lit(0)))
    tail = col.substr(F.greatest(length - n + 1, F.lit(1)), F.lit(n))
    return first_n, rest, head, tail


def mask_first_n(col: Column, n: int = 4, **chars: str) -> Column:
    """Hive `mask_first_n` (GenericUDFMaskFirstN.java): mask the first ``n``
    characters, show the rest."""
    first_n, rest, _, _ = _mask_head_tail(col, n)
    return F.concat(mask(first_n, **chars), rest)


def mask_show_first_n(col: Column, n: int = 4, **chars: str) -> Column:
    """Hive `mask_show_first_n` (GenericUDFMaskShowFirstN.java): show the
    first ``n`` characters, mask the rest."""
    first_n, rest, _, _ = _mask_head_tail(col, n)
    return F.concat(first_n, mask(rest, **chars))


def mask_last_n(col: Column, n: int = 4, **chars: str) -> Column:
    """Hive `mask_last_n` (GenericUDFMaskLastN.java): mask the last ``n``
    characters, show the rest."""
    _, _, head, tail = _mask_head_tail(col, n)
    return F.concat(head, mask(tail, **chars))


def mask_show_last_n(col: Column, n: int = 4, **chars: str) -> Column:
    """Hive `mask_show_last_n` (GenericUDFMaskShowLastN.java): show the last
    ``n`` characters, mask the rest."""
    _, _, head, tail = _mask_head_tail(col, n)
    return F.concat(mask(head, **chars), tail)


def mask_hash(col: Column) -> Column:
    """Hive `mask_hash` (GenericUDFMaskHash.java:50 — DigestUtils.md5Hex):
    replace the value with its md5 hex digest; NULL stays NULL."""
    return F.md5(col)


_INT32_LO = -(1 << 31)
_UINT32 = 1 << 32


def _wrap_int32(c: Column) -> Column:
    """Java int narrowing: keep the low 32 bits, two's complement. Written
    as explicit arithmetic (never a bare bigint→int cast, whose behavior
    flips between wrap and error under ANSI mode), and in overflow-free
    order: ``pmod`` FIRST (safe for any int64 input), then a conditional
    shift down by 2^32 (result stays in [-2^31, 2^32)). The previous form
    subtracted INT32_LO before the pmod, which itself overflowed under
    ANSI for |c| >= 2^63 - 2^31 — e.g. Long.MAX_VALUE.intValue()."""
    x = F.pmod(c, F.lit(_UINT32))
    return (
        F.when(x >= F.lit(1 << 31), x - F.lit(_UINT32)).otherwise(x).cast("int")
    )


def reflect2(
    col: Column, method: str, *args: Column | str | int, receiver: str = "string"
) -> Column:
    """Hive `reflect2(obj, 'method', args...)` — invoke a Java instance
    method ON the value itself (GenericUDFReflect2.java,
    FunctionRegistry.java:410; `reflect`/`java_method` cover only STATIC
    methods). Hive requires the method name to be a constant, so this shim
    resolves it at expression-BUILD time and compiles each supported
    method to plain Spark expressions — whole-stage codegen, no Python
    UDF, no reflection machinery at run time.

    Supported java.lang.String instance methods: length, isEmpty,
    toUpperCase, toLowerCase, trim (Java trim strips every char <= U+0020,
    NOT just spaces — mirrored with an explicit character class),
    substring(begin[, end]) (0-based, end-exclusive; out-of-range yields
    an empty/short string where Java throws StringIndexOutOfBounds),
    indexOf(str) (-1 when absent), contains,
    startsWith, endsWith, replace(target, replacement), concat, hashCode
    (s[0]·31^(n-1) + … with Java int32 overflow; folds via F.aggregate —
    interpreted, so corpus-sized hot paths should pre-compute it, the
    same caveat the repo applies to every Catalyst HOF).

    Supported boxed java.lang.Long methods: longValue, intValue (low-32
    two's-complement narrowing), doubleValue, floatValue, toString,
    hashCode ((int)(v ^ (v >>> 32)) — pass receiver="long", since Hive
    dispatches hashCode on the receiver's Java type and a build-time shim
    cannot see the column's type).

    hashCode superset note: the reference's GenericUDFReflect2.initialize
    REJECTS a bare ``hashCode`` call ("Use hash() UDF instead of this.",
    GenericUDFReflect2.java) — real Hive routes it to ``hash()``. This
    shim implements it anyway as a deliberate superset, because the exact
    Java ``String.hashCode``/``Long.hashCode`` semantics are the useful
    part of reflect2 for deterministic corpus work; callers porting Hive
    scripts verbatim will simply never hit the extra surface.

    Character semantics note: lengths and offsets count Java UTF-16 code
    units; Spark counts codepoints. Identical on BMP-only data (the whole
    test corpus) — documented rather than shimmed, matching the repo's
    treatment of other JVM-vs-engine encoding corners."""
    lits = [a if isinstance(a, Column) else F.lit(a) for a in args]

    def need(n: int) -> None:
        if len(lits) != n:
            raise ValueError(f"reflect2 {method!r} takes {n} argument(s)")

    m = method
    if m == "length":
        need(0)
        return F.length(col).cast("int")
    if m == "isEmpty":
        need(0)
        return F.length(col) == 0
    if m == "toUpperCase":
        need(0)
        return F.upper(col)
    if m == "toLowerCase":
        need(0)
        return F.lower(col)
    if m == "trim":
        need(0)
        return F.regexp_replace(col, r"^[\x00-\x20]+|[\x00-\x20]+$", "")
    if m == "substring":
        if len(lits) == 1:
            b = lits[0]
            return col.substr(
                (b + 1).cast("int"), (F.length(col) - b).cast("int")
            )
        if len(lits) == 2:
            b, e = lits
            return col.substr((b + 1).cast("int"), (e - b).cast("int"))
        raise ValueError("reflect2 'substring' takes 1 or 2 arguments")
    if m == "indexOf":
        need(1)
        return (F.instr(col, lits[0]) - 1).cast("int")
    if m == "contains":
        need(1)
        return F.contains(col, lits[0])
    if m == "startsWith":
        need(1)
        return F.startswith(col, lits[0])
    if m == "endsWith":
        need(1)
        return F.endswith(col, lits[0])
    if m == "replace":
        need(2)
        return F.replace(col, lits[0], lits[1])
    if m == "concat":
        need(1)
        return F.concat(col, lits[0])
    if m == "hashCode":
        # Hive dispatches on the receiver's Java type, known to it from the
        # ObjectInspector; a build-time shim cannot see the column's type,
        # so the caller states it (receiver="string" | "long").
        need(0)
        if receiver == "long":
            v = col.cast("bigint")
            return _wrap_int32(
                v.bitwiseXOR(F.shiftrightunsigned(v, 32)).cast("bigint")
            )
        return _wrap_int32(
            F.aggregate(
                F.transform(
                    F.split(col, ""), lambda ch: F.ascii(ch).cast("bigint")
                ),
                F.lit(0).cast("bigint"),
                lambda acc, c: F.pmod(acc * 31 + c, F.lit(_UINT32)),
            )
        )
    if m == "longValue":
        need(0)
        return col.cast("bigint")
    if m == "intValue":
        need(0)
        return _wrap_int32(col.cast("bigint"))
    if m == "doubleValue":
        need(0)
        return col.cast("double")
    if m == "floatValue":
        need(0)
        return col.cast("float")
    if m == "toString":
        need(0)
        return col.cast("string")
    raise NotImplementedError(
        f"reflect2: unsupported instance method {method!r}; supported: "
        "String(length isEmpty toUpperCase toLowerCase trim substring "
        "indexOf contains startsWith endsWith replace concat hashCode), "
        "Long(longValue intValue doubleValue floatValue toString "
        "hashCode with receiver='long')"
    )


def _unsupported(name: str, why: str) -> Callable[..., Column]:
    def call(*_args, **_kw):
        raise NotImplementedError(f"hive function {name!r} not carried over: {why}")

    call.__name__ = name
    return call


# --- the inventory --------------------------------------------------------
# name → Column-producing callable. Grouped as FunctionRegistry.java does.
HIVE_FUNCTIONS: dict[str, Callable[..., Column]] = {}

_BUILTIN = [
    # string (FunctionRegistry.java:176-268, :426-436)
    "concat", "substr", "substring", "space", "repeat", "ascii", "lpad", "rpad",
    "levenshtein", "soundex", "size", "upper", "ucase", "lower", "lcase",
    "trim", "ltrim", "rtrim", "length", "reverse", "find_in_set", "initcap",
    "like", "rlike", "regexp_replace", "replace", "regexp_extract", "parse_url",
    "split", "str_to_map", "translate", "instr", "locate", "elt", "concat_ws",
    "sentences", "format_number", "printf",
    # math (:196-233)
    "round", "bround", "floor", "cbrt", "ceil", "ceiling", "rand", "abs",
    "pmod", "ln", "log2", "sin", "asin", "cos", "acos", "log10", "log", "exp",
    "power", "pow", "sign", "pi", "degrees", "radians", "atan", "tan", "e",
    "factorial", "crc32", "conv", "bin", "chr", "hex", "unhex",
    # hash/crypto (:234-242)
    "base64", "unbase64", "sha2", "md5", "sha1", "sha", "aes_encrypt",
    "aes_decrypt", "encode", "decode", "hash",
    # date/time (:274-297, :323-326, :440-444)
    "day", "dayofmonth", "month", "quarter", "year", "hour", "minute",
    "second", "from_unixtime", "to_date", "weekofyear", "last_day", "next_day",
    "trunc", "date_format", "date_add", "date_sub", "datediff", "add_months",
    "months_between", "from_utc_timestamp", "to_utc_timestamp",
    "unix_timestamp", "to_unix_timestamp", "current_database", "current_date",
    "current_timestamp", "current_user",
    # arithmetic/comparison/logic (:308-349, :420-438)
    "positive", "negative", "div", "isnull", "isnotnull", "if", "in", "not",
    "between", "nvl", "coalesce", "greatest", "least", "when", "case",
    "shiftleft", "shiftright", "shiftrightunsigned",
    # complex types (:413-434)
    "array", "map", "struct", "named_struct", "sort_array", "array_contains",
    "map_keys", "map_values", "inline", "explode", "posexplode", "stack",
    "json_tuple", "get_json_object", "xpath", "xpath_string", "xpath_boolean",
    "xpath_int", "xpath_long", "xpath_float", "xpath_double", "xpath_number",
    "xpath_short",
    # misc (:353, :409-414)
    "reflect", "java_method", "version", "assert_true",
    # UDAFs usable as expressions (:376-405)
    "max", "min", "sum", "count", "avg", "stddev", "stddev_pop", "stddev_samp",
    "variance", "var_pop", "var_samp", "covar_pop", "covar_samp", "corr",
    "percentile_approx", "percentile", "collect_set", "collect_list",
    "histogram_numeric",
]
for _name in _BUILTIN:
    HIVE_FUNCTIONS[_name] = _expr_fn(_name)


def _in_file(col: Column, filename: str) -> Column:
    """Hive in_file(str, filename) (GenericUDFInFile.java): true iff the
    string equals a whole LINE of the file. The file is read ONCE at
    expression-build time on the driver (Hive loads it per-task into a
    HashSet — same contract, small-file assumption); the membership test
    compiles to an IN literal list, codegen'd per row. For large files use
    a broadcast semi join instead — this mirrors Hive, where in_file on a
    big file was equally a per-task HashSet.

    Line splitting mirrors BufferedReader.readLine (GenericUDFInFile uses
    it): only \\n, \\r and \\r\\n terminate lines — NOT \\x0b, \\x0c,
    \\x85 or \\u2028, which str.splitlines would also split on
    (ADVICE r5)."""
    import re as _re

    with open(filename, "r", encoding="utf-8", newline="") as fh:
        raw = fh.read()
    lines = _re.split("\r\n|\r|\n", raw)
    if lines and lines[-1] == "":
        lines.pop()  # a trailing terminator does not add an empty member
    if not lines:
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.lit(False)
        )
    return col.isin(*set(lines))


def _ewah_and(a: Column, b: Column) -> Column:
    from hdp2_5_hive2_spark.functions.ewah import bitmap_and

    return bitmap_and(a, b)


def _ewah_or(a: Column, b: Column) -> Column:
    from hdp2_5_hive2_spark.functions.ewah import bitmap_or

    return bitmap_or(a, b)


def _ewah_empty(bitmap: Column) -> Column:
    from hdp2_5_hive2_spark.functions.ewah import bitmap_empty

    return bitmap_empty(bitmap)


HIVE_FUNCTIONS.update(
    {
        "field": field,
        "create_union": create_union,
        # data-masking family (FunctionRegistry.java:483-489, Hive 2.1's
        # "mask UDFs" block) — string overloads; numeric/date out of scope
        "mask": mask,
        "mask_first_n": mask_first_n,
        "mask_last_n": mask_last_n,
        "mask_show_first_n": mask_show_first_n,
        "mask_show_last_n": mask_show_last_n,
        "mask_hash": mask_hash,
        # GROUPING__ID with the reference's (Hive ≤ 2.2) bit order; Spark's
        # grouping_id() is the modern standard order — see legacy_grouping_id.
        "grouping__id": legacy_grouping_id,
        # $SUM0: sum that returns 0 instead of NULL on empty input
        "$sum0": lambda c: F.coalesce(F.sum(c), F.lit(0)),
        # regexp == rlike alias in Hive (FunctionRegistry.java:261)
        "regexp": _expr_fn("rlike"),
        # reflect2: instance-method reflection (FunctionRegistry.java:410) —
        # constant method name resolved at build time, see reflect2().
        "reflect2": reflect2,
        # ngrams/context_ngrams: see hdp2_5_hive2_spark.llm.text n-gram support
        # ngrams/context_ngrams are DataFrame-level operators here (a UDAF
        # returning top-k maps doesn't fit Column algebra): see
        # hdp2_5_hive2_spark.llm.text.top_ngrams / context_ngrams.
        "ngrams": _unsupported(
            "ngrams", "use hdp2_5_hive2_spark.llm.text.top_ngrams (DataFrame-native)"
        ),
        "context_ngrams": _unsupported(
            "context_ngrams",
            "use hdp2_5_hive2_spark.llm.text.context_ngrams (DataFrame-native)",
        ),
        # ewah_bitmap (UDAF) is a DataFrame-level aggregation here:
        # hdp2_5_hive2_spark.functions.ewah.bitmap_agg. The Column-algebra
        # binary/unary ops map directly (javaewah-0.3.2 long-array wire
        # format; see functions/ewah.py for the exact-byte caveat).
        "ewah_bitmap": _unsupported(
            "ewah_bitmap",
            "aggregate form: use hdp2_5_hive2_spark.functions.ewah.bitmap_agg "
            "(DataFrame-native UDAF)",
        ),
        "ewah_bitmap_and": _ewah_and,
        "ewah_bitmap_or": _ewah_or,
        "ewah_bitmap_empty": _ewah_empty,
        "in_file": lambda col, filename: _in_file(col, filename),
        "compute_stats": _unsupported(
            "compute_stats", "use ANALYZE TABLE ... COMPUTE STATISTICS"
        ),
    }
)


def hive_fn(name: str) -> Callable[..., Column]:
    """Resolve a Hive function name to a Column-producing callable."""
    return HIVE_FUNCTIONS[name.lower()]


# Names that are SQL syntax rather than catalog functions (operators,
# CASE/WHEN, IN, BETWEEN, ...) — expressible but not via functionExists.
_SYNTAX = {"like", "in", "between", "when", "case", "not", "div", "positive", "negative"}


def missing_functions(spark: SparkSession) -> list[str]:
    """Inventory names Spark's catalog can't resolve (excluding our shims and
    SQL-syntax forms) — the parity report; should be empty."""
    out = []
    for name in _BUILTIN:
        if name in _SYNTAX:
            continue
        if not spark.catalog.functionExists(name):
            out.append(name)
    return out


def register_sql_shims(spark: SparkSession) -> None:
    """Make shimmed names callable from spark.sql too."""
    spark.udf.register  # touch to assert session alive
    # field(): expression-level shim exposed via a SQL temp function is not
    # possible without a Python UDF round-trip; SQL users write
    # coalesce(array_position(array(...), x), 0). DataFrame users get field().
