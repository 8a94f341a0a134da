"""Engine configuration.

Mirrors the reference's env contract (reference README.md:48-58 documents
`.env` keys: bucket, path, warehouse, credential, catalog URI, CDC id field,
CDC ts field; batch_bootstrapper.py:10-27 reads them) but makes the CDC
key/ts columns fully config-driven everywhere — the reference hardcodes
``('id', 'transact_seq')`` at tabular.py:68 instead of using its own env
vars, a latent bug SURVEY.md §1.4 says not to reproduce.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CdcTarget:
    """One monitored prefix → one (changelog, mirror) table pair.

    Reference semantics: each S3 URI's last path segment names the mirror
    table (batch_bootstrapper.py:55) and ``{mirror}_changelog`` names the
    changelog (batch_bootstrapper.py:56).
    """

    source_uri: str
    key_column: str = "id"
    ts_column: str = "transact_seq"
    op_column: str = "op"
    delete_op: str = "D"
    # Reference glob contract (batch_bootstrapper.py:69,85): the changelog
    # loader EXCLUDES DMS full-load files (`**/LOAD*`); the mirror's one-shot
    # initial load EXCLUDES incrementals (`**/*-*`). Spark's pathGlobFilter
    # is include-only, so exclusion is handled in sources/files.py.
    changelog_exclude_glob: str = "**/LOAD*"
    initial_load_exclude_glob: str = "**/*-*"

    @property
    def table_name(self) -> str:
        # reference batch_bootstrapper.py:55: last path segment of the URI.
        # Sanitized for the catalog: Spark's session catalog allows only
        # [A-Za-z0-9_] in table names (INVALID_SCHEMA_OR_RELATION_NAME
        # otherwise), and S3 prefixes routinely carry dashes/dots — map
        # every illegal character to '_' so `customer-data` becomes the
        # valid `customer_data` instead of failing bootstrap.
        import re as _re

        raw = self.source_uri.rstrip("/").split("/")[-1]
        return _re.sub(r"[^A-Za-z0-9_]", "_", raw)

    @property
    def changelog_table_name(self) -> str:
        # reference batch_bootstrapper.py:56
        return f"{self.table_name}_changelog"

    def validate(self) -> None:
        # reference tabular.py:51-56 rejects empty cdc id/ts fields
        if not self.key_column or not self.ts_column:
            raise ValueError(
                f"cdc key/ts columns must be non-empty for {self.source_uri!r}"
            )


def split_storage_uri(uri: str) -> tuple[str, str]:
    """``s3://bucket/a/b`` → ``('bucket', 'a/b')`` (reference tabular.py:127).

    Generalized to any scheme so local ``file://`` test fixtures flow through
    the same path.
    """
    m = re.match(r"^[a-z0-9+.-]+://([^/]+)/?(.*)$", uri)
    if not m:
        return "", uri
    return m.group(1), m.group(2)


@dataclass(frozen=True)
class EngineConfig:
    """Top-level engine config (reference README.md:48-58 `.env` contract)."""

    database: str = "cdc_bootstrap"  # reference batch_bootstrapper.py:17
    warehouse_dir: str = "/tmp/tabular_cdc_bootstrapper_spark/warehouse"
    targets: tuple[CdcTarget, ...] = field(default_factory=tuple)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "EngineConfig":
        e = dict(os.environ if env is None else env)
        bucket = e.get("TABULAR_BUCKET_NAME", "")
        path = e.get("TABULAR_BUCKET_MONITOR_PATH", "")
        targets: tuple[CdcTarget, ...] = ()
        if bucket and path:
            targets = (
                CdcTarget(
                    source_uri=f"s3://{bucket}/{path.strip('/')}",
                    key_column=e.get("TABULAR_CDC_ID_FIELD", "id"),
                    ts_column=e.get("TABULAR_CDC_TIMESTAMP_FIELD", "transact_seq"),
                ),
            )
        return cls(
            database=e.get("TABULAR_TARGET_DATABASE", "cdc_bootstrap"),
            warehouse_dir=e.get(
                "ENGINE_WAREHOUSE_DIR", "/tmp/tabular_cdc_bootstrapper_spark/warehouse"
            ),
            targets=targets,
        )
