"""I3 LLM schema client: sample prep, fence-stripping, validation, gating.

Everything runs with injected transports — no network, fully deterministic
(reference behavior: ``etl.py:712-848``).
"""

from __future__ import annotations

import json

import pandas as pd

from worker_etl_spark.operators import inference
from worker_etl_spark.operators.llm_schema import (
    build_schema_prompt,
    gemini_schema_client,
    parse_schema_text,
    prepare_sample,
)


def test_prepare_sample_nulls_and_stringify():
    pdf = pd.DataFrame({"a": [1, None], "b": ["x", "y"]})
    recs = prepare_sample(pdf)
    # pandas promotes int+NaN to float (so '1.0') — the reference stringifies
    # the same pandas frame the same way (etl.py:716-727)
    assert recs == [{"a": "1.0", "b": "x"}, {"a": "null", "b": "y"}]


def test_prepare_sample_empty_and_all_null_abort():
    assert prepare_sample(pd.DataFrame()) is None
    assert prepare_sample(pd.DataFrame({"a": [None, None]})) is None


def test_parse_schema_text_plain_and_fenced():
    items = [{"name": "a", "type": "INTEGER"}]
    assert parse_schema_text(json.dumps(items)) == items
    fenced = "```json\n" + json.dumps(items) + "\n```"
    assert parse_schema_text(fenced) == items
    assert parse_schema_text("not json at all") is None
    assert parse_schema_text("{}") is None  # non-list
    assert parse_schema_text("[]") is None  # empty list


def test_prompt_pins_rules_and_sample():
    p = build_schema_prompt([{"col": "1"}])
    assert "VERBATIM" in p and "STRING" in p and '{"col": "1"}' in p


def test_client_off_without_key(monkeypatch):
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    client = gemini_schema_client()
    assert client(pd.DataFrame({"a": ["1"]})) is None


def test_client_end_to_end_with_fake_transport():
    sent = {}

    def fake_transport(prompt: str) -> str:
        sent["prompt"] = prompt
        return (
            "```json\n"
            + json.dumps(
                [
                    {"name": "n", "type": "INT64"},
                    {"name": "ghost", "type": "FLOAT"},
                    {"name": "s", "type": "WEIRD"},
                ]
            )
            + "\n```"
        )

    client = gemini_schema_client(transport=fake_transport)
    raw = client(pd.DataFrame({"n": ["1"], "s": ["x"]}))
    assert raw is not None and '"n": "1"' in sent["prompt"]
    # downstream gate: hallucinated 'ghost' skipped, WEIRD → STRING
    validated = inference.validate_llm_schema(raw, ["n", "s"])
    assert validated == [
        {"name": "n", "type": "INT64"},
        {"name": "s", "type": "STRING"},
    ]


def test_client_transport_failure_returns_none():
    def boom(prompt: str) -> str:
        raise ConnectionError("no network")

    client = gemini_schema_client(transport=boom, attempts=2)
    assert client(pd.DataFrame({"a": ["1"]})) is None


def test_validate_strict_malformed_item_aborts():
    assert inference.validate_llm_schema(
        [{"name": "a", "type": "INTEGER"}, "garbage"], ["a"]
    ) is None
    assert inference.validate_llm_schema([{"name": "a"}], ["a"]) is None
    assert inference.validate_llm_schema([{"name": "", "type": "X"}], ["a"]) is None


def test_determine_schema_with_client(spark):
    fake = lambda sample_pdf: [{"name": "n", "type": "INTEGER"}]  # noqa: E731
    df = spark.createDataFrame([("1", "x")], "n string, s string")
    schema = inference.determine_schema(
        spark, df, "no.such_table", "existing_or_gemini", llm_infer=fake
    )
    assert schema == [{"name": "n", "type": "INTEGER", "mode": "NULLABLE"}]
