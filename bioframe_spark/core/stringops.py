"""UCSC-style genomic range string parsing (driver-side, pure Python).

Grammar parity with the reference (``core/stringops.py:88-143`` tokenizer,
``:67-85`` humanized integers, ``:172-249`` ``parse_region``): strings like
``chr1``, ``chr1:1000-2000``, ``chr1:1,000-2,000``, ``chr5:10M-30M``,
``chr1:1000-`` (open end). Coordinates in the string are 1-based inclusive
on the start (UCSC convention used by the reference: start is decremented
by... the reference treats the string coordinates as 0-based half-open
directly), here: 0-based half-open, matching ``parse_region_string``.
"""

from __future__ import annotations

import re

_TOKEN_SPEC = [
    ("HYPHEN", r"-"),
    ("COORD", r"[0-9,]+(\.[0-9]*)?(?:[a-z]+)?"),
    ("OTHER", r".+?"),
]
_TOKEN_RE = re.compile(
    "|".join(f"(?P<{name}>{pat})" for name, pat in _TOKEN_SPEC), re.IGNORECASE
)

_UNIT_MULT = {"k": 10**3, "m": 10**6, "g": 10**9,
              "kb": 10**3, "mb": 10**6, "gb": 10**9}


def to_humanized_int(s: str | int | float) -> int:
    """Parse a human-readable coordinate: commas stripped, k/M/G suffixes."""
    if isinstance(s, (int, float)):
        return int(s)
    s = s.replace(",", "").strip()
    m = re.fullmatch(r"([0-9]+(?:\.[0-9]*)?)\s*([a-zA-Z]*)", s)
    if m is None:
        raise ValueError(f"cannot parse coordinate: {s!r}")
    num, unit = m.groups()
    if not unit:
        if "." in num:
            raise ValueError(f"non-integer coordinate without unit: {s!r}")
        return int(num)
    mult = _UNIT_MULT.get(unit.lower())
    if mult is None:
        raise ValueError(f"unknown unit {unit!r} in {s!r}")
    return int(round(float(num) * mult))


def parse_region_string(s: str) -> tuple[str, int | None, int | None]:
    """Parse ``chrom[:start-end]`` into (chrom, start, end); missing → None."""
    if not isinstance(s, str) or len(s) == 0:
        raise ValueError(f"invalid region string: {s!r}")
    if ":" not in s:
        return (s, None, None)
    chrom, _, rng = s.rpartition(":")
    # reference grammar: sequence names may contain any character except
    # whitespace and colon — "chr1::1000-2000" is an error, not a name
    if chrom == "" or ":" in chrom or any(c.isspace() for c in chrom):
        raise ValueError(f"invalid region string: {s!r}")
    rng = rng.strip()
    # reference grammar (stringops.py:88-143): after the colon a START
    # coord and a hyphen are MANDATORY ("chr1:" and "chr1:10" are
    # errors, as is a missing start "chr1:-20"); the end may be empty
    # ("chr1:10-" → open end); anything after the end token is ignored
    # ("chr1:10-20-30" → (10, 20)); an inverted range parses fine here —
    # only parse_region() validates end >= start.
    parts = rng.split("-")
    if len(parts) == 1:
        raise ValueError(
            f"expected 'start-end' range after ':' in region string: {s!r}")
    start_s = parts[0]
    if not start_s.strip():
        raise ValueError(f"missing start coord in region string: {s!r}")
    end_s = parts[1]
    start = to_humanized_int(start_s)
    end = to_humanized_int(end_s) if end_s.strip() else None
    return (chrom, start, end)


def parse_region(
    region, chromsizes: dict | None = None
) -> tuple[str, int | None, int | None]:
    """Coerce a region (string or (chrom,start,end) tuple) to a triple.

    With *chromsizes*, fills a missing end with the chromosome length and
    bounds-checks (mirrors reference ``stringops.py:172-249``).
    """
    if isinstance(region, str):
        chrom, start, end = parse_region_string(region)
    else:
        chrom, start, end = (
            (region[0], None, None) if len(region) == 1 else (region + (None,) * 3)[:3]
        )
    if chrom is None:
        raise ValueError("no chromosome detected in region")
    if chromsizes is not None:
        clen = chromsizes.get(chrom)
        if clen is None:
            raise ValueError(f"unknown chromosome {chrom!r}")
        if end is None:
            end = int(clen)
        if start is None:
            start = 0
        if not (0 <= start <= end <= clen):
            raise ValueError(f"region out of bounds: {region}")
    if start is None:
        # reference ``parse_region``: a missing start is always 0
        start = 0
    if end is not None and end < start:
        raise ValueError(f"end < start in region: {region}")
    return (chrom, start, end)


def is_complete_ucsc_string(s) -> bool:
    """True if *s* parses to a fully-specified chrom:start-end string."""
    try:
        chrom, start, end = parse_region_string(s)
    except (ValueError, TypeError):
        return False
    return chrom is not None and start is not None and end is not None


def to_ucsc_string(region: tuple) -> str:
    """Format a (chrom, start, end) triple as ``chrom:start-end``."""
    chrom, start, end = region
    return f"{chrom}:{start}-{end}"
