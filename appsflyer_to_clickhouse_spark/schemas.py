"""Fixed, hand-declared schemas (SURVEY.md §1.2: never infer).

The 49-column AppsFlyer→ClickHouse mapping is the reference's projection
list, rename map, and column-order spec all at once
(reference main.py:19-69). It is configuration data, reproduced here as
the compatibility contract; the execution strategy around it is new.
"""

from __future__ import annotations

from pyspark.sql import types as T

# AppsFlyer Pull API v5 display name -> ClickHouse snake_case column.
# Reference main.py:19-69 (dict order == output column order, except the
# campaignid reorder — see operators.etl.reorder_campaignid).
APPSFLYER_TO_CH: dict[str, str] = {
    "Attributed Touch Type": "attributed_touch_type",
    "Attributed Touch Time": "attributed_touch_time",
    "Install Time": "install_time",
    "Event Time": "event_time",
    "Event Name": "event_name",
    "Partner": "partner",
    "Media Source": "media_source",
    "Campaign": "campaign",
    "Adset": "adset",
    "Ad": "ad",
    "Ad Type": "ad_type",
    "Contributor 1 Touch Type": "contributor_1_touch_type",
    "Contributor 1 Touch Time": "contributor_1_touch_time",
    "Contributor 1 Partner": "contributor_1_partner",
    "Contributor 1 Match Type": "contributor_1_match_type",
    "Contributor 1 Media Source": "contributor_1_media_source",
    "Contributor 1 Campaign": "contributor_1_campaign",
    "Contributor 1 Engagement Type": "contributor_1_engagement_type",
    "Contributor 2 Touch Type": "contributor_2_touch_type",
    "Contributor 2 Touch Time": "contributor_2_touch_time",
    "Contributor 2 Partner": "contributor_2_partner",
    "Contributor 2 Media Source": "contributor_2_media_source",
    "Contributor 2 Campaign": "contributor_2_campaign",
    "Contributor 2 Match Type": "contributor_2_match_type",
    "Contributor 2 Engagement Type": "contributor_2_engagement_type",
    "Contributor 3 Touch Type": "contributor_3_touch_type",
    "Contributor 3 Touch Time": "contributor_3_touch_time",
    "Contributor 3 Partner": "contributor_3_partner",
    "Contributor 3 Media Source": "contributor_3_media_source",
    "Contributor 3 Campaign": "contributor_3_campaign",
    "Contributor 3 Match Type": "contributor_3_match_type",
    "Contributor 3 Engagement Type": "contributor_3_engagement_type",
    "City": "city",
    "IP": "ip",
    "AppsFlyer ID": "appsflyer_id",
    "Customer User ID": "customer_user_id",
    "IDFA": "idfa",
    "IDFV": "idfv",
    "Device Category": "device_category",
    "Platform": "platform",
    "OS Version": "os_version",
    "Bundle ID": "bundle_id",
    "Is Retargeting": "is_retargeting",
    "Attribution Lookback": "attribution_lookback",
    "Match Type": "match_type",
    "Device Download Time": "device_download_time",
    "Device Model": "device_model",
    "Engagement Type": "engagement_type",
    "Campaign ID": "campaignid",
}

# Columns typed TIMESTAMP in the sink (reference main.py:81-85). All
# other mapped columns are strings.
DATETIME_CH_COLS: frozenset[str] = frozenset(
    {
        "attributed_touch_time",
        "install_time",
        "event_time",
        "contributor_1_touch_time",
        "contributor_2_touch_time",
        "contributor_3_touch_time",
        "device_download_time",
    }
)

# Extra fields requested from the API but dropped by the mapping
# (reference main.py:70-79; main.py:160-161 only reads mapped keys).
ADDITIONAL_FIELDS: tuple[str, ...] = (
    "blocked_reason_rule", "store_reinstall", "impressions",
    "contributor3_match_type", "custom_dimension", "conversion_type",
    "gp_click_time", "match_type", "mediation_network", "oaid",
    "deeplink_url", "blocked_reason", "blocked_sub_reason",
    "gp_broadcast_referrer", "gp_install_begin", "campaign_type",
    "custom_data", "rejected_reason", "device_download_time",
    "keyword_match_type", "contributor1_match_type",
    "contributor2_match_type", "device_model", "monetization_network",
    "segment", "is_lat", "gp_referrer", "blocked_reason_value",
    "store_product_page", "device_category", "app_type",
    "rejected_reason_value", "ad_unit", "keyword_id", "placement",
    "network_account_id", "install_app_store", "amazon_aid", "att",
    "engagement_type", "gdpr_applies", "ad_user_data_enabled",
    "ad_personalization_enabled", "campaign_id",
)


def af_raw_schema() -> T.StructType:
    """AppsFlyer installs_report CSV schema: 49 display-name columns, all
    nullable strings (FIXTURES.md §1)."""
    return T.StructType(
        [T.StructField(name, T.StringType(), True) for name in APPSFLYER_TO_CH]
    )


def sink_columns() -> list[str]:
    """ClickHouse sink column order: mapping values with ``campaignid``
    moved to immediately after ``media_source`` (the *intended* semantics
    of reference main.py:146-154 — the reference implementation is buggy,
    see operators.etl.reorder_campaignid)."""
    from .operators.etl import reorder_campaignid

    return reorder_campaignid(list(APPSFLYER_TO_CH.values()))


def ch_sink_schema() -> T.StructType:
    """Typed sink schema: 7 timestamp columns, 42 strings."""
    return T.StructType(
        [
            T.StructField(
                c,
                T.TimestampType() if c in DATETIME_CH_COLS else T.StringType(),
                True,
            )
            for c in sink_columns()
        ]
    )


# ---------------------------------------------------------------------------
# Driver-generated testdata tables (TESTDATA.md). Parquet carries its own
# schema; these StructTypes document the contract and back the streaming
# reader (readStream needs an explicit schema).
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
