"""S13 WhoIs extraction as a driver-gated query: raw API payloads are
constructed deterministically from the supplier/nation tables (same
technique as xml_field_extraction's constructed feeds), parsed with
``from_json`` through sources/http.whois_contacts, and checked against
a DuckDB oracle that json-extracts the identical payloads. The HTTP
transport itself (S12) is exercised by tests/test_http_source.py
against a local server — the driver gate covers the parse+layout
contract, which is the part that runs at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.text import (
    json_escape_free_text,
    json_escape_free_text_sql,
)
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.http import RAW_DELIMITER, whois_contacts
from htmlentityextraction_spark.sources.tables import load_table

# payload: registrant always present (name + country + phone);
# admin contact only for s_suppkey % 3 = 0 (company only);
# technical never present -> all N/A.
# Names are free text: the shared json_escape_free_text helpers
# (functions/text.py) strip C0 controls then JSON-escape when
# templating (textuni-fuzz aligned; identical chain both engines) —
# one quoted supplier name otherwise makes the payload malformed
# (from_json nulls it; DuckDB's yyjson refuses to parse), and one raw
# VT crashed the DuckDB oracle outright before the r12 class fix.

_esc_sql = json_escape_free_text_sql


_PAYLOAD_SQL = f"""
    '{{"whois_record": {{"registrant_contact": {{"full_name": "' || {_esc_sql('s_name')} ||
    '", "country_name": "' || {_esc_sql('n_name')} || '", "phone_number": "+1-' || s_suppkey || '-555"}}' ||
    CASE WHEN s_suppkey % 3 = 0
         THEN ', "administrative_contact": {{"company_name": "' || {_esc_sql('s_name')} || ' Corp"}}'
         ELSE '' END || '}}}}'
"""

_SHORT = {
    "registrant_contact": "registrant",
    "administrative_contact": "administrative",
    "technical_contact": "technical",
}
_FIELDS = (
    "full_name", "company_name", "mailing_address", "city_name", "state_name",
    "zip_code", "country_name", "email_address", "phone_number",
)


def _oracle() -> str:
    extracts = []
    line_parts = ["domain"]
    for c, short in _SHORT.items():
        for f in _FIELDS:
            alias = f"{short}_{f}"
            extracts.append(
                f"coalesce(json_extract_string(raw, '$.whois_record.{c}.{f}'), 'N/A')"
                f" AS {alias}"
            )
            line_parts.append(alias)
    line = f"concat_ws('{RAW_DELIMITER}', {', '.join(line_parts)}) AS contact_line"
    return f"""
    WITH payload AS (
        SELECT 'supplier' || s_suppkey || '.example.com' AS domain,
               {_PAYLOAD_SQL} AS raw
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ), parsed AS (
        SELECT domain, {', '.join(extracts)} FROM payload
    )
    SELECT domain, registrant_full_name, registrant_country_name,
           registrant_phone_number, administrative_company_name,
           technical_email_address, {line}
    FROM parsed
    """


@register("whois_contact_extraction", _oracle())
def whois_contact_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 (`emr/WhoIsExtractor.scala:25-68`): WhoIs payloads →
    3-contact x 9-field layout with "N/A" fallback and the exact
    "!@#@!"-delimited contact line. Parsing is one JVM-side
    ``from_json``; the oracle re-extracts every field from the same
    payloads, so the hash proves layout, fallback, and delimiter
    parity."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    esc = json_escape_free_text

    payload = F.concat(
        F.lit('{"whois_record": {"registrant_contact": {"full_name": "'),
        esc(F.col("s_name")),
        F.lit('", "country_name": "'),
        esc(F.col("n_name")),
        F.lit('", "phone_number": "+1-'),
        F.col("s_suppkey").cast("string"),
        F.lit('-555"}'),
        F.when(
            F.pmod("s_suppkey", F.lit(3)) == 0,
            F.concat(
                F.lit(', "administrative_contact": {"company_name": "'),
                esc(F.col("s_name")),
                F.lit(' Corp"}'),
            ),
        ).otherwise(F.lit("")),
        F.lit("}}"),
    )
    raw = sup.join(nat, sup["s_nationkey"] == nat["n_nationkey"]).select(
        F.concat(F.lit("supplier"), F.col("s_suppkey").cast("string"), F.lit(".example.com"))
        .alias("domain"),
        payload.alias("raw"),
    )
    out = whois_contacts(raw)
    return out.select(
        "domain",
        "registrant_full_name",
        "registrant_country_name",
        "registrant_phone_number",
        "administrative_company_name",
        "technical_email_address",
        "contact_line",
    )
