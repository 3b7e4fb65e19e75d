"""Configuration loader mirroring the reference's ``application.properties``
(`ApplaudoETL.scala:270-275`; keys at `application.properties:1-14`).

Java-properties ``key=value`` lines parsed into a dict; identical key names
kept (``azure.sas_key``, ``azure.storage.container.name``,
``azure.storage.account.name``, ``mssql.driver``, ``mssql.url``,
``mssql.dbtable``, ``mssql.user``, ``mssql.password``, ``api.url``) plus
engine-local keys (``source.csv.path``, ``sink.path``).
"""

from __future__ import annotations

from pathlib import Path


def load_properties(path: str | Path) -> dict[str, str]:
    """Parse a java-properties file (``#``/``!`` comments, ``key=value``)."""
    props: dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" in line:
            key, _, value = line.partition("=")
            props[key.strip()] = value.strip()
    return props
