"""Filename -> time parsing: a trollsift-style pattern compiler.

Reference: satbucket/info.py:35-72 parses granule filenames with trollsift
patterns like::

    {product_level:s}.{satellite:s}.{sensor:s}.{algorithm:s}.
    {start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.{granule_id}.{version}.{data_format}

We compile the pattern to a regex once on the driver (trollsift is not a
dependency); parsing is available both driver-side (:func:`parse_filename`) and
as Spark Column expressions over a filename column
(:func:`filename_time_exprs` — ``regexp_extract`` + ``to_timestamp``, fully
JVM-side for scale).

Semantics mirrored from the reference:
- missing ``end_time`` -> ``start_time + 2h`` (info.py:52-54)
- time-only ``end_time`` takes ``start_time``'s date, +1 day if it would end
  before it starts (day wrap, info.py:58-64)
- time-only ``start_time`` combines with ``start_date`` (info.py:44-50)
"""

from __future__ import annotations

import datetime
import os
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "compile_pattern",
    "filename_time_exprs",
    "get_start_end_time_from_filepaths",
    "parse_filename",
]

# strptime directive -> (regex fragment, java datetime fragment)
_DIRECTIVES = {
    "%Y": (r"\d{4}", "yyyy"),
    "%y": (r"\d{2}", "yy"),
    "%m": (r"\d{2}", "MM"),
    "%d": (r"\d{2}", "dd"),
    "%j": (r"\d{3}", "DDD"),
    "%H": (r"\d{2}", "HH"),
    "%M": (r"\d{2}", "mm"),
    "%S": (r"\d{2}", "ss"),
    "%f": (r"\d{1,6}", "SSSSSS"),
}

_FIELD_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)(?::([^{}]*))?\}")


def _time_fmt_to_regex(fmt: str) -> tuple[str, str]:
    """strptime format -> (regex, java format) fragment pair."""
    regex, java = "", ""
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            if d not in _DIRECTIVES:
                raise ValueError(f"unsupported strptime directive {d!r}")
            r, j = _DIRECTIVES[d]
            regex += r
            java += j
            i += 2
        else:
            regex += re.escape(fmt[i])
            # escape java-format letters inside literals
            java += f"'{fmt[i]}'" if fmt[i].isalpha() else fmt[i]
            i += 1
    return regex, java


def compile_pattern(pattern: str):
    """Compile a trollsift-style pattern to ``(compiled_regex, fields)``.

    ``fields`` maps field name -> ("time", strptime_fmt, java_fmt) for
    %-formatted fields, ("int",) for ``:d``-style fields, ("str",) otherwise.
    """
    fields: dict[str, tuple] = {}
    regex_parts: list[str] = []
    pos = 0
    for m in _FIELD_RE.finditer(pattern):
        regex_parts.append(re.escape(pattern[pos : m.start()]))
        name, spec = m.group(1), m.group(2) or ""
        if "%" in spec:
            frag, java = _time_fmt_to_regex(spec)
            fields[name] = ("time", spec, java)
            regex_parts.append(f"(?P<{name}>{frag})")
        elif spec.rstrip("0123456789").endswith("d") or spec == "d":
            fields[name] = ("int",)
            regex_parts.append(f"(?P<{name}>\\d+)")
        else:
            fields[name] = ("str",)
            regex_parts.append(f"(?P<{name}>.*?)")
        pos = m.end()
    regex_parts.append(re.escape(pattern[pos:]))
    return re.compile("^" + "".join(regex_parts) + "$"), fields


def parse_filename(filename: str, pattern: str) -> dict:
    """Parse a filename into an info dict with ``start_time``/``end_time``.

    Mirrors reference info.py:35-72 including the date-combination, 2h default
    end, and next-day wrap rules.
    """
    regex, fields = compile_pattern(pattern)
    m = regex.match(filename)
    if m is None:
        raise ValueError(f"filename {filename!r} does not match pattern {pattern!r}")
    info: dict = {}
    for name, spec in fields.items():
        raw = m.group(name)
        if spec[0] == "time":
            info[name] = datetime.datetime.strptime(raw, spec[1])
        elif spec[0] == "int":
            info[name] = int(raw)
        else:
            info[name] = raw

    if "start_time" not in info:
        raise ValueError("Missing start_time information.")
    start_time = info["start_time"]
    if start_time.year == 1900:  # time-only pattern -> needs start_date
        if "start_date" not in info:
            raise ValueError("start_time is a time object but start_date is missing or invalid.")
        start_time = datetime.datetime.combine(info["start_date"].date(), start_time.time())

    if "end_time" not in info:
        end_time = start_time + datetime.timedelta(hours=2)
    else:
        end_time = info["end_time"]
        if end_time.year == 1900:  # time-only -> same date as start, wrap past midnight
            if "end_date" in info:
                end_time = datetime.datetime.combine(info["end_date"].date(), end_time.time())
            else:
                end_time = datetime.datetime.combine(start_time.date(), end_time.time())
                if end_time < start_time:
                    end_time = end_time + datetime.timedelta(days=1)

    info["start_time"] = start_time
    info["end_time"] = end_time
    info.pop("start_date", None)
    info.pop("end_date", None)
    return info


def get_start_end_time_from_filepaths(filepaths, filename_pattern: str):
    """Start/end time lists parsed from file paths (reference: info.py:118-124)."""
    if isinstance(filepaths, str):
        filepaths = [filepaths]
    infos = [parse_filename(os.path.basename(p), filename_pattern) for p in filepaths]
    return [i["start_time"] for i in infos], [i["end_time"] for i in infos]


def filename_time_exprs(filename: Column | str, pattern: str) -> dict[str, Column]:
    """Compile a pattern into Spark Column expressions over a filename column.

    Returns ``{"start_time": Column, "end_time": Column}`` (timestamps), the
    distributed equivalent of the reference's per-file driver loop
    (info.py:107-124) — used to time-filter a *files DataFrame* with millions of
    entries without driver round-trips.
    """
    col = F.col(filename) if isinstance(filename, str) else filename
    base = F.element_at(F.split(col, "/"), -1)
    regex, fields = compile_pattern(pattern)
    # regexp_extract needs numbered groups: rebuild pattern with plain groups
    pat = regex.pattern
    group_names = list(re.findall(r"\(\?P<([A-Za-z0-9_]+)>", pat))
    plain = re.sub(r"\(\?P<[A-Za-z0-9_]+>", "(", pat)

    def _extract(name: str) -> Column:
        return F.regexp_extract(base, plain, group_names.index(name) + 1)

    out: dict[str, Column] = {}
    time_fields = {n: s for n, s in fields.items() if s[0] == "time"}
    if "start_time" not in time_fields:
        raise ValueError("pattern must contain a start_time field")

    start_spec = time_fields["start_time"]
    start = F.to_timestamp(_extract("start_time"), start_spec[2])
    if "%Y" not in start_spec[1] and "%y" not in start_spec[1] and "start_date" in time_fields:
        date_spec = time_fields["start_date"]
        start = F.to_timestamp(
            F.concat(
                F.date_format(F.to_timestamp(_extract("start_date"), date_spec[2]), "yyyy-MM-dd"),
                F.lit(" "),
                F.date_format(start, "HH:mm:ss"),
            )
        )
    out["start_time"] = start

    if "end_time" not in time_fields:
        out["end_time"] = start + F.expr("INTERVAL 2 HOURS")
        return out

    end_spec = time_fields["end_time"]
    end = F.to_timestamp(_extract("end_time"), end_spec[2])
    if "%Y" not in end_spec[1] and "%y" not in end_spec[1]:
        if "end_date" in time_fields:
            date_spec = time_fields["end_date"]
            end = F.to_timestamp(
                F.concat(
                    F.date_format(F.to_timestamp(_extract("end_date"), date_spec[2]), "yyyy-MM-dd"),
                    F.lit(" "),
                    F.date_format(end, "HH:mm:ss"),
                )
            )
        else:
            end = F.to_timestamp(
                F.concat(
                    F.date_format(start, "yyyy-MM-dd"), F.lit(" "), F.date_format(end, "HH:mm:ss")
                )
            )
            end = F.when(end < start, end + F.expr("INTERVAL 1 DAY")).otherwise(end)
    out["end_time"] = end
    return out
