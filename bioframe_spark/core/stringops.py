"""UCSC-style genomic range string parsing (driver-side, pure Python).

Exact grammar parity with the reference (``core/stringops.py:13-24``
token spec, ``:67-85`` humanized integers, ``:88-143`` tokenizer,
``:146-249`` ``parse_region``), verified by differential fuzzing
(tests/test_hypothesis_props.py). The load-bearing quirks, all pinned:

- the name is everything before the FIRST colon, ``.strip()``-ed (so
  leading/trailing whitespace is dropped but interior whitespace is
  legal: ``"ch r1:10-20"`` parses); empty-after-strip is an error;
- ONLY the text between the first and second colon is tokenized as the
  range, so ``"chr1:10-:20"`` is an open-ended range and
  ``"chr1:10-20:junk"`` parses as (10, 20);
- tokens may be separated by whitespace, but a trailing-whitespace
  token after an open end (``"chr1:10- "``) is an error while
  ``"chr1:10-"`` is not;
- unit multipliers TRUNCATE after scaling (``1.0005k`` → 1000, not
  1001); a decimal without a unit is an error (``int("5.5")``);
- commas are stripped anywhere in a coordinate (``1,0,0`` → 100).

Coordinates are 0-based half-open, used directly (no UCSC 1-based
decrement), matching the reference.
"""

from __future__ import annotations

import re

# same token language as reference RANGE_TOKEN_SPEC (stringops.py:15-24):
# optional whitespace, then a hyphen, a coordinate (digits/commas with an
# optional decimal tail and an optional unit suffix), or anything else.
_RANGE_TOKEN_RE = re.compile(
    r"\s*(?:(?P<HYPHEN>-)"
    r"|(?P<COORD>[0-9,]+(?:\.[0-9]*)?(?:[a-z]+)?)"
    r"|(?P<OTHER>.+))",
    re.IGNORECASE,
)

_NUMERIC_RE = re.compile(r"([0-9,.]+)")

_UNIT_MULT = {"K": 10**3, "KB": 10**3, "M": 10**6, "MB": 10**6,
              "G": 10**9, "GB": 10**9}


def to_humanized_int(s: str | int | float) -> int:
    """Parse a human-readable coordinate: commas stripped anywhere,
    case-insensitive k/kb/M/Mb/G/Gb suffixes, decimals truncated after
    scaling (reference ``_parse_humanized_int``, stringops.py:67-85)."""
    if isinstance(s, (int, float)):
        return int(s)
    pieces = _NUMERIC_RE.split(s.replace(",", ""))
    if len(pieces) != 3:
        raise ValueError(f"cannot parse coordinate: {s!r}")
    _, num, unit = pieces
    if not unit:
        return int(num)  # int("5.5") raises — decimals need a unit
    mult = _UNIT_MULT.get(unit.strip().upper())
    if mult is None:
        raise ValueError(f"unknown unit {unit.strip()!r} in {s!r}")
    return int(float(num) * mult)  # truncation, not rounding


def _range_tokens(s: str):
    for m in _RANGE_TOKEN_RE.finditer(s):
        for name in ("HYPHEN", "COORD", "OTHER"):
            tok = m.group(name)
            if tok is not None:
                yield name, tok
                break


def _parse_range(s: str) -> tuple[int, int | None]:
    """``START-`` or ``START-END``; extra tokens after END are ignored."""
    tokens = _range_tokens(s)
    name, tok = next(tokens, (None, None))
    if name != "COORD":
        raise ValueError(f"expected start coord, got {name}: {tok!r}")
    start = to_humanized_int(tok)
    name, tok = next(tokens, (None, None))
    if name != "HYPHEN":
        raise ValueError(f"expected '-' after start coord, got {name}: {tok!r}")
    name, tok = next(tokens, (None, None))
    if name is None:
        end = None  # open end
    elif name == "COORD":
        end = to_humanized_int(tok)
    else:
        raise ValueError(f"expected end coord, got {name}: {tok!r}")
    return start, end


def parse_region_string(s: str) -> tuple[str, int | None, int | None]:
    """Parse ``chrom[:start-end]`` into (chrom, start, end); missing → None.

    An inverted range parses fine here — only :func:`parse_region`
    validates ``end >= start``.
    """
    if not isinstance(s, str):
        raise ValueError(f"invalid region string: {s!r}")
    parts = s.split(":")
    chrom = parts[0].strip()
    if not chrom:
        raise ValueError(f"empty chromosome name in region string: {s!r}")
    if len(parts) == 1:
        return (chrom, None, None)
    start, end = _parse_range(parts[1])
    return (chrom, start, end)


def parse_region(
    region, chromsizes=None, *, check_bounds: bool = True
) -> tuple[str, int | None, int | None]:
    """Coerce a region (string or (chrom, start, end[, ...]) record) to a
    triple.

    Records must have length >= 3; extra fields are ignored; chrom is
    str-cast. With *chromsizes* (dict or pandas Series), a missing end is
    filled with the chromosome length and an unknown chromosome is an
    error. A missing start is always 0. ``end >= start`` is always
    enforced; ``check_bounds`` additionally requires ``start >= 0`` and
    ``end <= chromsize`` when the size is known (mirrors reference
    ``stringops.py:146-249``).
    """
    if isinstance(region, str):
        chrom, start, end = parse_region_string(region)
    else:
        if len(region) < 3:
            raise ValueError(
                f"region record needs at least 3 fields: {region!r}")
        chrom, start, end = region[:3]
        chrom = str(chrom)
        start = int(start) if start is not None else None
        end = int(end) if end is not None else None

    clen = None
    if chromsizes is not None:
        try:
            clen = chromsizes[chrom]
        except KeyError:
            raise ValueError(f"unknown chromosome {chrom!r}") from None
        if end is None:
            end = int(clen)
    if start is None:
        start = 0
    if end is not None and end < start:
        raise ValueError(f"end < start in region: {region!r}")
    if check_bounds and (start < 0 or (clen is not None and end > int(clen))):
        raise ValueError(f"region out of bounds: [{start}, {end})")
    return (chrom, start, end)


def to_ucsc_string(region: tuple) -> str:
    """Format a (chrom, start, end) triple as ``chrom:start-end``."""
    chrom, start, end = region
    return f"{chrom}:{start}-{end}"


def is_complete_ucsc_string(s) -> bool:
    """True if *s* parses to a fully-specified chrom:start-end string.

    Deviation from the reference (stringops.py:44-65): parse errors
    return False here instead of propagating — callers use this as a
    dispatch predicate (construction.from_any), where raising on
    arbitrary non-region strings would be a trap.
    """
    if not isinstance(s, str):
        return False
    try:
        _, _, end = parse_region_string(s)
    except ValueError:
        return False
    return end is not None
