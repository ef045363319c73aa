"""Portal clients: ENCODE and 4D Nucleome file catalogs.

Reference ``sandbox/clients.py:12-115`` (EncodeClient) and ``:117-172``
(FDNClient): a metadata table (one row per file accession) drives cached
downloads of individual data files.

Spark-first shape: the metadata catalog is a Spark DataFrame (portal
metadata runs to millions of rows — ENCODE's full TSV is ~240 MB — so
assembly filtering, joins against experiment tables, and accession
selection stay distributed); only the terminal single-accession URL
lookup collects one row. All HTTP goes through an injectable
``transport`` callable ``(url, headers) -> bytes`` so the clients are
fully exercisable offline (tests inject a fake; this container has no
network, so the default transport raises ``NetworkDisabled``).
"""

from __future__ import annotations

import base64
import os
import os.path as op
import posixpath as pp
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .resources import NetworkDisabled


def default_transport(url: str, headers: dict | None = None) -> bytes:
    raise NetworkDisabled(
        f"download of {url!r}: network disabled in this build — pass "
        "transport=callable(url, headers) -> bytes to enable fetching"
    )


def _read_metadata(spark: SparkSession, path: str, comment: str | None = None):
    reader = (spark.read.option("sep", "\t").option("header", "true")
              .option("inferSchema", "false"))
    if comment:
        reader = reader.option("comment", comment)
    return reader.csv(path)


class EncodeClient:
    """ENCODE portal file catalog (reference ``sandbox/clients.py:12-115``).

    ``metadata`` is a Spark DataFrame with at least
    (``File accession``, ``File assembly``, ``File download URL``) — the
    column layout of ENCODE's published metadata.tsv — or ``None`` to
    read ``<cachedir>/metadata.tsv`` (the reference auto-downloads it;
    this build requires the file or frame to be supplied).
    """

    BASE_URL = "https://www.encodeproject.org/"
    METADATA_URL = ("https://www.encodeproject.org/metadata/"
                    "type=Experiment&status=released/metadata.tsv")
    KNOWN_ASSEMBLIES = (
        "GRCh38", "GRCh38-minimal", "ce10", "ce11", "dm3", "dm6",
        "hg19", "mm10", "mm10-minimal", "mm9",
    )
    _ACCESSION, _ASSEMBLY, _URL = ("File accession", "File assembly",
                                   "File download URL")

    def __init__(self, cachedir: str, assembly: str,
                 metadata: DataFrame | None = None, transport=None):
        if assembly not in self.KNOWN_ASSEMBLIES:
            raise ValueError(f"assembly must be one of {self.KNOWN_ASSEMBLIES}")
        self.assembly = assembly
        self.cachedir = op.join(cachedir, assembly)
        os.makedirs(self.cachedir, exist_ok=True)
        self._transport = transport or default_transport
        if metadata is None:
            path = op.join(cachedir, "metadata.tsv")
            if not op.exists(path):
                raise FileNotFoundError(
                    f"{path} not found; place ENCODE's metadata.tsv there "
                    f"(see EncodeClient.METADATA_URL) or pass metadata="
                )
            metadata = _read_metadata(SparkSession.active(), path)
        # catalog stays a DataFrame: assembly filter + any downstream joins
        # (experiment / target / biosample selection) run distributed
        self._meta = metadata.filter(F.col(self._ASSEMBLY) == assembly)

    @property
    def meta(self) -> DataFrame:
        return self._meta

    def info_url(self, accession: str) -> str:
        return urljoin(self.BASE_URL, pp.join("experiments", accession))

    def _lookup_url(self, accession: str) -> str:
        rows = (self._meta.filter(F.col(self._ACCESSION) == accession)
                .select(self._URL).limit(2).collect())
        if not rows:
            raise KeyError(f"accession {accession!r} not in the {self.assembly} "
                           "catalog")
        return rows[0][0]

    def fetch(self, accession: str) -> str:
        """Download (or reuse) one accession's file; returns the local path."""
        url = self._lookup_url(accession)
        path = op.join(self.cachedir, op.split(url)[1])
        if not op.exists(path):
            data = self._transport(url, None)
            with open(path, "wb") as f:
                f.write(data)
        return path

    def fetch_all(self, accessions) -> list[str]:
        return [self.fetch(a) for a in accessions]


class FDNClient:
    """4D Nucleome portal catalog (reference ``sandbox/clients.py:117-172``).

    Same catalog-DataFrame shape as ``EncodeClient``; adds HTTP basic-auth
    (``key_id``/``key_secret``) on downloads, and the reference's
    GRCh38→human organism filter.
    """

    BASE_URL = "https://data.4dnucleome.org/"
    _ACCESSION, _URL = "File Accession", "File Download URL"

    def __init__(self, cachedir: str, assembly: str,
                 metadata: DataFrame | None = None,
                 key_id: str | None = None, key_secret: str | None = None,
                 transport=None):
        self.assembly = assembly
        self.cachedir = op.join(cachedir, assembly)
        if not op.isdir(cachedir):
            raise OSError(f"Directory doesn't exist: '{cachedir}'")
        os.makedirs(self.cachedir, exist_ok=True)
        self._transport = transport or default_transport
        if metadata is None:
            import glob

            paths = sorted(glob.glob(op.join(cachedir, "metadata*.tsv")))
            if not paths:
                raise FileNotFoundError(
                    f"no metadata*.tsv under {cachedir}; pass metadata="
                )
            metadata = _read_metadata(SparkSession.active(), paths[-1],
                                      comment="#")
        if assembly == "GRCh38" and "Organism" in metadata.columns:
            metadata = metadata.filter(F.col("Organism") == "human")
        self._meta = metadata
        if key_id is not None:
            cred = (key_id + ":" + key_secret).encode("utf-8")
            self._token = base64.b64encode(cred)
        else:
            self._token = None

    @property
    def meta(self) -> DataFrame:
        return self._meta

    def info_url(self, accession: str) -> str:
        return urljoin(self.BASE_URL, pp.join("experiments", accession))

    def fetch(self, accession: str) -> str:
        rows = (self._meta.filter(F.col(self._ACCESSION) == accession)
                .select(self._URL).limit(2).collect())
        if not rows:
            raise KeyError(f"accession {accession!r} not in the catalog")
        url = rows[0][0]
        path = op.join(self.cachedir, op.split(url)[1])
        if not op.exists(path):
            headers = None
            if self._token:
                headers = {"Authorization": b"Basic " + self._token}
            data = self._transport(url, headers)
            with open(path, "wb") as f:
                f.write(data)
        return path

    def fetch_all(self, accessions) -> list[str]:
        return [self.fetch(a) for a in accessions]
