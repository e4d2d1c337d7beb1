"""WFS source (SURVEY.md §2.1 source-wfs — vestigial in the reference:
the constant at ``src/utils/constants.py:1-3`` is noted "doesn't seem
to work" and never fetched successfully).

Design: a batch HTTP GetFeature fetch on the driver (or foreachPartition
for URL lists) that lands GeoJSON files, which then feed the ordinary
distributed ``scan-geojson`` path. Network access is absent in this
environment, so the fetch is import/connectivity-gated; the downstream
pipeline is the fully-tested GeoJSON scanner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def build_getfeature_url(
    base_url: str, type_name: str, srs: str = "EPSG:27700", fmt: str = "application/json"
) -> str:
    """WFS 2.0 GetFeature URL (the reference's constant, parameterized)."""
    from urllib.parse import urlencode

    q = {
        "service": "WFS",
        "version": "2.0.0",
        "request": "GetFeature",
        "typeNames": type_name,
        "srsName": srs,
        "outputFormat": fmt,
    }
    return f"{base_url}?{urlencode(q)}"


def fetch_wfs_to_geojson(url: str, out_path: str, timeout: int = 60) -> str:
    """Fetch one WFS GetFeature response to a local GeoJSON file.

    Raises NotImplementedError when no network stack is available —
    callers fall back to pre-fetched files (the reference operates the
    same way in practice: its WFS URL is dead and inputs arrive as
    files).
    """
    try:
        from urllib.request import urlopen
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("no urllib available") from e
    from urllib.parse import urlsplit

    if urlsplit(url).scheme == "file":
        # Offline transport: a canned GetFeature response served from
        # disk (tests / air-gapped runs). The filesystem takes no query
        # string, so drop the WFS params the URL builder attached — the
        # response file IS the answer to that query.
        url = url.split("?", 1)[0]
    try:
        with urlopen(url, timeout=timeout) as r, open(out_path, "wb") as f:
            f.write(r.read())
    except OSError as e:
        raise NotImplementedError(
            f"WFS fetch unavailable in this environment ({e}); "
            "stage GeoJSON files and use scan-geojson instead"
        ) from e
    return out_path


def read_wfs(spark: SparkSession, url: str, staging_path: str) -> DataFrame:
    """Fetch + scan in one call (fetch on driver; scan distributed)."""
    from transit_scrape_spark.sources.geojson import read_geojson_features

    fetch_wfs_to_geojson(url, staging_path)
    return read_geojson_features(spark, staging_path)
