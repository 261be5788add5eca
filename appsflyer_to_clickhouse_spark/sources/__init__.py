"""Source connectors: AppsFlyer HTTP-CSV (partitioned fetch) and local
CSV files (SURVEY.md §2 Part A rows ``source_http_csv`` /
``csv_parse_header_bom``)."""

from .csv_source import read_af_csv, write_fixture_csv  # noqa: F401
from .http_source import fetch_installs_distributed, split_window  # noqa: F401
