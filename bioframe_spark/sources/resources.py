"""Remote genomic resources (reference ``io/resources.py``).

The reference fetches chromsizes / centromeres / cytobands / mRNA tables
over HTTP from UCSC (``resources.py:20-296``). This build intentionally
performs NO network I/O: packaged assembly data (``assembly.py``) covers
``fetch_chromsizes``; the HTTP surfaces below keep the reference's call
signatures and raise a clear error, so swapping in a networked
implementation is a drop-in change.
"""

from __future__ import annotations

from .assembly import fetch_chromsizes as _packaged_chromsizes


class NetworkDisabled(RuntimeError):
    pass


def fetch_chromsizes(db: str, provider: str = "ucsc", **_kw) -> dict:
    """Chromsizes for an assembly — served from packaged data; the
    reference additionally falls back to a UCSC HTTP fetch."""
    return _packaged_chromsizes(db, provider)


def fetch_centromeres(db: str, provider: str = "ucsc"):
    """Centromere positions (reference ``resources.py:109-242``): requires
    the UCSC cytoband/centromere HTTP endpoints — disabled here."""
    raise NetworkDisabled(
        "fetch_centromeres needs UCSC HTTP access (disabled in this build); "
        "load a cytoband table with read_table(path, schema='cytoband') instead"
    )


class UCSCClient:
    """Signature-compatible stand-in for the reference's UCSCClient
    (``resources.py:245-296``); every fetch raises NetworkDisabled."""

    def __init__(self, db: str):
        self._db = db

    def _no(self, what: str):
        raise NetworkDisabled(f"UCSCClient.{what}: network disabled in this build")

    def fetch_chromsizes(self):
        return fetch_chromsizes(self._db)

    def fetch_centromeres(self):
        self._no("fetch_centromeres")

    def fetch_gaps(self):
        self._no("fetch_gaps")

    def fetch_cytoband(self):
        self._no("fetch_cytoband")

    def fetch_mrna(self):
        self._no("fetch_mrna")
