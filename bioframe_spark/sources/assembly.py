"""Genome assembly metadata (reference ``io/assembly.py`` + the curated
seqinfo package data).

The reference ships seqinfo/cytoband TSVs per assembly plus a YAML
registry. Here: a compact registry of the common assemblies' chromosome
sizes (public UCSC data) with the same access surface —
``assembly_info(name)`` returning an object with ``chromsizes``,
``seqinfo`` (as a Spark DataFrame on demand) and ``viewframe``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Assembled-chromosome lengths for the reference's full assembly set
# (public UCSC/NCBI facts; see _assembly_data.py).
from ._assembly_data import ALIASES as _DATA_ALIASES
from ._assembly_data import CHROMSIZES as _DATA_CHROMSIZES
from ._assembly_data import ORGANISM as _DATA_ORGANISM
from ._assembly_data import UNIT_OVERRIDES as _UNIT_OVERRIDES

_REGISTRY = {
    ("ucsc", name): (_DATA_ORGANISM[name], sizes, {})
    for name, sizes in _DATA_CHROMSIZES.items()
}
_ALIASES = dict(_DATA_ALIASES)


def _seq_role_unit(chrom: str) -> tuple[str, str]:
    """Sequence role + assembly unit from UCSC naming conventions
    (reference seqinfo columns; the registry carries only primary +
    non-nuclear sequences, so unlocalized/unplaced/alt rows appear only
    when a user registers a fuller assembly via ``register_assembly``)."""
    if chrom.endswith("M") or chrom in ("chrM", "chrMT", "MT", "Pltd"):
        # reference seqinfo: chrM role=assembled, unit=non-nuclear
        return "assembled", "non-nuclear"
    if chrom.startswith("chrUn"):
        return "unplaced", "primary"
    if chrom.endswith("_random"):
        return "unlocalized", "primary"
    if chrom.endswith("_alt") or "_hap" in chrom:
        return "alt", "alt"
    return "assembled", "primary"


@dataclass
class GenomeAssembly:
    """Mirror of the reference's GenomeAssembly dataclass
    (``io/assembly.py:26-66``): chromsizes/chromnames/viewframe plus a
    seqinfo table with role/unit columns."""

    organism: str
    provider: str
    name: str
    chromsizes: dict = field(repr=False)
    unit_overrides: dict = field(default_factory=dict, repr=False)

    def _role_unit(self, chrom: str) -> tuple:
        role, unit = _seq_role_unit(chrom)
        return role, self.unit_overrides.get(chrom, unit)

    @property
    def chromnames(self) -> list:
        return list(self.chromsizes)

    def seqinfo(self):
        """(name, length, role, unit) as a Spark DataFrame."""
        from pyspark.sql import SparkSession

        rows = [
            (c, int(n), *self._role_unit(c)) for c, n in self.chromsizes.items()
        ]
        from ..core.construction import local_df
        from pyspark.sql import types as T
        return local_df(
            rows,
            T.StructType.fromDDL(
                "name string, length long, role string, unit string"),
        )

    def viewframe(self):
        """Whole-genome view (chrom, 0, length, chrom)."""
        from ..core.construction import make_viewframe

        return make_viewframe(self.chromsizes)


def assemblies_available() -> list[str]:
    return sorted(n for _, n in _REGISTRY)


def register_assembly(name: str, chromsizes: dict, organism: str = "custom",
                      provider: str = "custom", aliases: dict | None = None):
    """Add an assembly to the in-process registry (the stand-in for the
    reference's YAML+TSV package data, ``io/assembly.py:68-83``) — lets a
    deployment carry its full seqinfo without network access."""
    _REGISTRY[(provider, name)] = (organism, dict(chromsizes), aliases or {})
    for a in (aliases or {}):
        _ALIASES[a] = name


_DEFAULT_ROLES = ("assembled",)
_DEFAULT_UNITS = ("primary", "non-nuclear")


def assembly_info(name: str, provider: str = "ucsc",
                  roles=None, units=None) -> GenomeAssembly:
    """Look up an assembly by name or alias (reference
    ``io/assembly.py:85-184``). ``"provider.name"`` syntax is accepted.

    ``roles`` / ``units``: sequences to include — a tuple of role/unit
    names or ``"all"``; defaults mirror the reference (default roles =
    assembled; default units = primary + non-nuclear).
    """
    if "." in name:
        provider, name = name.split(".", 1)
        provider = provider.lower()
    name = _ALIASES.get(name, name)
    key = (provider, name)
    if key not in _REGISTRY:
        raise ValueError(f"unknown assembly {name!r}; have {assemblies_available()}")
    organism, sizes, _ = _REGISTRY[key]

    overrides = _UNIT_OVERRIDES.get(name, {})

    def keep(chrom: str) -> bool:
        role, unit = _seq_role_unit(chrom)
        unit = overrides.get(chrom, unit)
        if roles is None:
            role_ok = role in _DEFAULT_ROLES
        elif roles == "all":
            role_ok = True
        elif isinstance(roles, (tuple, list)):
            role_ok = role in roles
        else:
            raise ValueError(f"roles must be a tuple or 'all', not {roles!r}")
        if units is None:
            unit_ok = unit in _DEFAULT_UNITS
        elif units == "all":
            unit_ok = True
        elif isinstance(units, (tuple, list)):
            unit_ok = unit in units
        else:
            raise ValueError(f"units must be a tuple or 'all', not {units!r}")
        return role_ok and unit_ok

    filtered = {c: n for c, n in sizes.items() if keep(c)}
    return GenomeAssembly(organism=organism, provider=provider, name=name,
                          chromsizes=filtered, unit_overrides=overrides)


def fetch_chromsizes(db: str, provider: str = "ucsc") -> dict:
    """Chromsizes for an assembly from packaged data (the reference also
    falls back to a UCSC HTTP fetch, ``io/resources.py:20-106`` — network
    access intentionally omitted here)."""
    return assembly_info(db, provider).chromsizes
