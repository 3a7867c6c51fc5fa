"""Driver-side staging fetch: authenticated HTTP + zip → local CSV files.

Mirrors the reference's extract() (Angelo_ETL_Task.py:131-147): a
requests.Session login POST followed by two zip downloads, unzipped in
memory and handed to the reader. Deliberately NOT a Spark datasource — two
small dimension files fetched once on the driver, then ``spark.read.csv``
with explicit schemas. (A DataSource V2 would buy nothing here; for
genuinely distributed archive ingest use ``spark.read.format('binaryFile')``
plus a mapInPandas unzip.)

The fetcher is injectable so tests (and offline runs) use local files —
no network, no credentials in the engine.
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Callable, Mapping

#: fetcher(url, data) -> response bytes
Fetcher = Callable[[str, Mapping[str, str]], bytes]

LOINC_LOGIN_URL = "https://loinc.org/wp-login.php"
LOINC_TABLE_URL = "https://loinc.org/download/loinc-table-file-csv/"
LOINC_HIERARCHY_URL = "https://loinc.org/download/loinc-multiaxial-hierarchy/"


def requests_session_fetcher(username: str, password: str) -> Fetcher:
    """Authenticated fetcher over one requests.Session (reference :135-141).
    Imported lazily so offline environments never touch requests."""
    import requests  # local import: optional dependency at runtime

    session = requests.Session()
    session.post(LOINC_LOGIN_URL, data={"log": username, "pwd": password})

    def fetch(url: str, data: Mapping[str, str]) -> bytes:
        resp = session.post(url, data=dict(data))
        resp.raise_for_status()
        return resp.content

    return fetch


def unzip_member_to(staging_dir: str, zip_bytes: bytes, member: str) -> str:
    """Extract one member of an in-memory zip (reference
    ``ZipFile(BytesIO(...)).open(name)``, :21-26) to a staging path."""
    os.makedirs(staging_dir, exist_ok=True)
    out_path = os.path.join(staging_dir, member)
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf, zf.open(member) as src:
        with open(out_path, "wb") as dst:
            dst.write(src.read())
    return out_path


def stage_loinc_inputs(
    staging_dir: str,
    fetcher: Fetcher,
) -> dict[str, str]:
    """Fetch + unzip both LOINC inputs; returns name → staged csv path."""
    download_form = {"tc_submit": "Download", "tc_accepted": "1"}
    table_zip = fetcher(LOINC_TABLE_URL, download_form)
    hier_zip = fetcher(LOINC_HIERARCHY_URL, download_form)
    return {
        "loinc": unzip_member_to(staging_dir, table_zip, "Loinc.csv"),
        "hierarchy": unzip_member_to(
            staging_dir, hier_zip, "MultiAxialHierarchy.csv"
        ),
    }
