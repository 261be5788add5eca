"""Environment-driven configuration surface (SURVEY.md §2 Part A
``config_env``; reference main.py:10-17).

Resolution happens ONCE, on the driver (never in executors — executors
may not share the driver's environment on a real cluster); the resolved
frozen config is closed over by source/sink builders.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from collections.abc import Mapping

# (env var, default) — the reference's exact names; CH_PORT is the only
# defaulted value (reference main.py:13).
ENV_DEFAULTS: dict[str, str | None] = {
    "APPSFLYER_TOKEN": None,
    "APP_ID": None,
    "CH_HOST": None,
    "CH_PORT": "9000",
    "CH_USER": None,
    "CH_PASSWORD": None,
    "CH_DATABASE": None,
    "CH_TABLE": None,
}


@dataclass(frozen=True)
class PipelineConfig:
    appsflyer_token: str | None
    app_id: str | None
    ch_host: str | None
    ch_port: int
    ch_user: str | None
    ch_password: str | None
    ch_database: str | None
    ch_table: str | None

    @property
    def jdbc_url(self) -> str:
        """ClickHouse JDBC URL for the Spark connector / JDBC sink."""
        return f"jdbc:clickhouse://{self.ch_host}:{self.ch_port}/{self.ch_database}"


def resolve_config(env: Mapping[str, str] | None = None) -> PipelineConfig:
    """Resolve config from ``env`` (default: ``os.environ``) with the
    reference's defaulting rules. Injectable for tests/oracles."""
    e = os.environ if env is None else env

    def get(name: str) -> str | None:
        v = e.get(name)
        return v if v is not None else ENV_DEFAULTS[name]

    return PipelineConfig(
        appsflyer_token=get("APPSFLYER_TOKEN"),
        app_id=get("APP_ID"),
        ch_host=get("CH_HOST"),
        ch_port=int(get("CH_PORT")),  # type: ignore[arg-type]
        ch_user=get("CH_USER"),
        ch_password=get("CH_PASSWORD"),
        ch_database=get("CH_DATABASE"),
        ch_table=get("CH_TABLE"),
    )
