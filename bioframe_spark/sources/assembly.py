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

# Public chromosome lengths (UCSC goldenPath chrom.sizes), main chromosomes.
_HG38 = {
    "chr1": 248956422, "chr2": 242193529, "chr3": 198295559,
    "chr4": 190214555, "chr5": 181538259, "chr6": 170805979,
    "chr7": 159345973, "chr8": 145138636, "chr9": 138394717,
    "chr10": 133797422, "chr11": 135086622, "chr12": 133275309,
    "chr13": 114364328, "chr14": 107043718, "chr15": 101991189,
    "chr16": 90338345, "chr17": 83257441, "chr18": 80373285,
    "chr19": 58617616, "chr20": 64444167, "chr21": 46709983,
    "chr22": 50818468, "chrX": 156040895, "chrY": 57227415,
    "chrM": 16569,
}
_HG19 = {
    "chr1": 249250621, "chr2": 243199373, "chr3": 198022430,
    "chr4": 191154276, "chr5": 180915260, "chr6": 171115067,
    "chr7": 159138663, "chr8": 146364022, "chr9": 141213431,
    "chr10": 135534747, "chr11": 135006516, "chr12": 133851895,
    "chr13": 115169878, "chr14": 107349540, "chr15": 102531392,
    "chr16": 90354753, "chr17": 81195210, "chr18": 78077248,
    "chr19": 59128983, "chr20": 63025520, "chr21": 48129895,
    "chr22": 51304566, "chrX": 155270560, "chrY": 59373566,
    "chrM": 16571,
}
_MM39 = {
    "chr1": 195154279, "chr2": 181755017, "chr3": 159745316,
    "chr4": 156860686, "chr5": 151758149, "chr6": 149588044,
    "chr7": 144995196, "chr8": 130127694, "chr9": 124359700,
    "chr10": 130530862, "chr11": 121973369, "chr12": 120092757,
    "chr13": 120883175, "chr14": 125139656, "chr15": 104073951,
    "chr16": 98008968, "chr17": 95294699, "chr18": 90720763,
    "chr19": 61420004, "chrX": 169476592, "chrY": 91455967,
    "chrM": 16299,
}

_REGISTRY = {
    ("ucsc", "hg38"): ("homo_sapiens", _HG38, {"GRCh38": "hg38"}),
    ("ucsc", "hg19"): ("homo_sapiens", _HG19, {"GRCh37": "hg19"}),
    ("ucsc", "mm39"): ("mus_musculus", _MM39, {"GRCm39": "mm39"}),
}
_ALIASES = {"GRCh38": "hg38", "GRCh37": "hg19", "GRCm39": "mm39"}


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

    @property
    def chromnames(self) -> list:
        return list(self.chromsizes)

    def seqinfo(self):
        """(name, length, role, unit) as a Spark DataFrame."""
        from pyspark.sql import SparkSession

        rows = [
            (c, int(n), *_seq_role_unit(c)) for c, n in self.chromsizes.items()
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

    def keep(chrom: str) -> bool:
        role, unit = _seq_role_unit(chrom)
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
                          chromsizes=filtered)


def fetch_chromsizes(db: str, provider: str = "ucsc") -> dict:
    """Chromsizes for an assembly from packaged data (the reference also
    falls back to a UCSC HTTP fetch, ``io/resources.py:20-106`` — network
    access intentionally omitted here)."""
    return assembly_info(db, provider).chromsizes
