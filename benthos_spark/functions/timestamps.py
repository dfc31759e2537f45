"""Timestamp parse/format methods, including Go-layout translation.

Reference: internal/bloblang/query/methods_strings.go:1126-1441
(`parse_timestamp_unix`, `parse_timestamp`, `parse_timestamp_strptime`,
`format_timestamp`, `format_timestamp_strftime`, `format_timestamp_unix`,
`format_timestamp_unix_nano`).

Bloblang has NO native timestamp type (SURVEY §1.2) — timestamps are
strings/numbers plus these methods.  This engine upgrades to Spark's
native TimestampType; the methods below are the bridge, including
translating Go reference layouts ("2006-01-02 15:04:05") and strftime
patterns ("%Y-%m-%d") to Spark's Java DateTimeFormatter patterns.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "go_layout_to_java", "strftime_to_java", "parse_timestamp",
    "parse_timestamp_strptime", "parse_timestamp_unix",
    "format_timestamp", "format_timestamp_strftime",
    "format_timestamp_unix", "format_timestamp_unix_nano",
]

# Go reference-time layout fragments → Java DateTimeFormatter pattern.
# Ordered longest-first so e.g. "2006" wins over "06".
_GO_TO_JAVA = [
    ("2006", "yyyy"), ("01", "MM"), ("02", "dd"), ("15", "HH"),
    ("03", "hh"), ("04", "mm"), ("05", "ss"), ("06", "yy"),
    ("Jan", "MMM"), ("January", "MMMM"), ("Mon", "EEE"), ("Monday", "EEEE"),
    ("PM", "a"), ("pm", "a"), (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"), (".000", ".SSS"),
    # `.9…` = trimmed optional fraction; format_timestamp post-trims
    (".999999999", ".SSSSSSSSS"), (".999999", ".SSSSSS"),
    (".999", ".SSS"), ("-07:00", "XXX"),
    ("-0700", "Z"), ("Z07:00", "XXX"), ("Z0700", "XX"), ("MST", "zzz"),
    ("1", "M"), ("2", "d"), ("3", "h"),
]

_STRFTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS",
    "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%p": "a", "%z": "Z", "%Z": "zzz", "%%": "%",
}


def go_layout_to_java(layout: str) -> str:
    """Translate a Go reference layout to a Java pattern.  Covers the
    layouts in the reference docs/tests; unrecognized literal runs are
    quoted so DateTimeFormatter treats them verbatim."""
    out: list[str] = []
    i = 0
    while i < len(layout):
        for go, java in _GO_TO_JAVA:
            if layout.startswith(go, i):
                out.append(java)
                i += len(go)
                break
        else:
            ch = layout[i]
            out.append("''" if ch == "'" else
                       (f"'{ch}'" if ch.isalpha() else ch))
            i += 1
    return "".join(out)


def strftime_to_java(pattern: str) -> str:
    """Translate a strptime/strftime pattern to a Java pattern."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        if pattern[i] == "%" and i + 1 < len(pattern):
            tok = pattern[i:i + 2]
            out.append(_STRFTIME_TO_JAVA.get(tok, tok))
            i += 2
        else:
            ch = pattern[i]
            out.append("''" if ch == "'" else
                       (f"'{ch}'" if ch.isalpha() else ch))
            i += 1
    return "".join(out)


def as_timestamp(c: Column, dtype=None) -> Column:
    """Coerce a timestamp-ish value (reference IGetTimestamp: RFC3339
    string, unix seconds int/float, or native timestamp) to
    TimestampType.  `dtype` is the compile-time type when known."""
    from pyspark.sql import types as T
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return c
    if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType,
                          T.FloatType, T.DecimalType)):
        # fractional unix seconds keep microsecond precision
        return F.timestamp_micros(
            (c.cast("double") * F.lit(1_000_000)).cast("long"))
    # string or UNKNOWN type: go through a string view so every cast
    # stays analyzable (timestamp_ntz → double is an analysis error);
    # ISO forms via cast, "y-M-d H:m:s" via try_to_timestamp, numeric
    # strings as unix seconds
    s = c.cast("string")
    return F.coalesce(
        s.try_cast("timestamp"),
        F.try_to_timestamp(s),
        F.timestamp_micros(
            (s.try_cast("double") * F.lit(1_000_000)).cast("long")))


def _with_tz(ts: Column, tz: str | None) -> Column:
    """Shift wall-clock to `tz` for formatting (session runs UTC)."""
    if not tz or tz.upper() == "UTC":
        return ts
    return F.from_utc_timestamp(ts, tz)


def _trim_fraction(s: Column) -> Column:
    """Go's `.999...` layout fragments trim trailing zeros (and the
    dot when the fraction is empty); Java always zero-pads."""
    return F.regexp_replace(
        F.regexp_replace(s, r"(\.\d*?)0+(?=\D|$)", r"$1"),
        r"\.(?=\D|$)", "")


def parse_timestamp(c: Column, go_layout: str) -> Column:
    """`.parse_timestamp(layout)` (methods_strings.go:1173)."""
    return F.try_to_timestamp(c, F.lit(go_layout_to_java(go_layout)))


def parse_timestamp_strptime(c: Column, pattern: str) -> Column:
    """`.parse_timestamp_strptime(fmt)` (methods_strings.go:1211)."""
    return F.try_to_timestamp(c, F.lit(strftime_to_java(pattern)))


def parse_timestamp_unix(c: Column, go_layout: str | None = None,
                         dtype=None) -> Column:
    """`.parse_timestamp_unix(layout?)` (methods_strings.go:1126):
    parse a timestamp string → unix SECONDS (the reference returns the
    epoch int, not a time value)."""
    ts = (F.try_to_timestamp(c, F.lit(go_layout_to_java(go_layout)))
          if go_layout else as_timestamp(c, dtype))
    return F.unix_timestamp(ts)


# Go zone-layout fragments → (placeholder, colon-form?, utc-display).
# Formatting keeps the INPUT's own utc-offset (Go time.Time carries its
# location; a parsed "…+01:00" formats as +01:00, not shifted to UTC).
# date_format can only print the session zone, so zone fragments become
# placeholder sentinels substituted with the per-row offset text.
_ZONE_FRAGS = [
    ("Z07:00", "\x01", True, "Z"),
    ("Z0700", "\x02", False, "Z"),
    ("-07:00", "\x03", True, "+00:00"),
    ("-0700", "\x04", False, "+0000"),
]


def _input_offset(c: Column):
    """(has_offset, colon_form, nocolon_form) extracted from the
    string form of the input value; absent/Z → UTC."""
    s = c.cast("string")
    off = F.regexp_extract(s, r"(Z|[+-]\d{2}:?\d{2})\s*$", 1)
    has = (off != "") & (off != "Z")
    colon = F.when(F.length(off) == 5,
                   F.concat(F.substring(off, 1, 3), F.lit(":"),
                            F.substring(off, 4, 2))).otherwise(off)
    nocolon = F.replace(colon, F.lit(":"), F.lit(""))
    return has, colon, nocolon


def _format_in_own_zone(c: Column, layout: str, dtype=None,
                        frac_trim: bool = False) -> Column:
    """Format in the value's own zone (reference semantics), splicing
    offset text where the layout asks for it."""
    has, colon, nocolon = _input_offset(c)
    body_layout = layout
    used = []
    for frag, ph, is_colon, utc_disp in _ZONE_FRAGS:
        if frag in body_layout:
            body_layout = body_layout.replace(frag, ph)
            used.append((ph, is_colon, utc_disp))
    ts = as_timestamp(c, dtype)
    local = F.when(has, F.from_utc_timestamp(
        ts, F.concat(F.lit("GMT"), colon))).otherwise(ts)
    out = F.date_format(local, go_layout_to_java(body_layout))
    if frac_trim:
        out = _trim_fraction(out)
    for ph, is_colon, utc_disp in used:
        disp = F.when(has, colon if is_colon else nocolon) \
            .otherwise(F.lit(utc_disp))
        out = F.replace(out, F.lit(ph), disp)
    return out


def _maybe_offset_input(dtype) -> bool:
    """Only STRING inputs can carry their own utc-offset; typed
    timestamps/numbers are instants (skip the offset machinery)."""
    from pyspark.sql import types as T
    return dtype is None or isinstance(dtype, T.StringType)


def format_timestamp(c: Column, go_layout: str, tz: str | None = None,
                     dtype=None) -> Column:
    """`.format_timestamp(layout, tz?)` (methods_strings.go:1293)."""
    if tz is None and _maybe_offset_input(dtype):
        return _format_in_own_zone(c, go_layout, dtype,
                                   frac_trim=".9" in go_layout)
    ts = _with_tz(as_timestamp(c, dtype), tz)
    out = F.date_format(ts, go_layout_to_java(go_layout))
    if ".9" in go_layout:
        out = _trim_fraction(out)
    return out


def format_timestamp_strftime(c: Column, pattern: str,
                              tz: str | None = None, dtype=None) -> Column:
    """`.format_timestamp_strftime(fmt, tz?)` (methods_strings.go:1362)."""
    if tz is None and _maybe_offset_input(dtype):
        # translate %z to the Go -0700 fragment so zone splicing is
        # shared with the layout path
        go_ish = pattern.replace("%z", "\x04")
        has, colon, nocolon = _input_offset(c)
        ts = as_timestamp(c, dtype)
        local = F.when(has, F.from_utc_timestamp(
            ts, F.concat(F.lit("GMT"), colon))).otherwise(ts)
        out = F.date_format(local, strftime_to_java(go_ish))
        if "\x04" in go_ish:
            disp = F.when(has, nocolon).otherwise(F.lit("+0000"))
            out = F.replace(out, F.lit("\x04"), disp)
        return out
    ts = _with_tz(as_timestamp(c, dtype), tz)
    return F.date_format(ts, strftime_to_java(pattern))


def format_timestamp_unix(c: Column, dtype=None) -> Column:
    """`.format_timestamp_unix()` (methods_strings.go:1413)."""
    return F.unix_timestamp(as_timestamp(c, dtype))


def format_timestamp_unix_nano(c: Column, dtype=None) -> Column:
    """`.format_timestamp_unix_nano()` (methods_strings.go:1441)."""
    return F.unix_micros(as_timestamp(c, dtype)) * 1000
