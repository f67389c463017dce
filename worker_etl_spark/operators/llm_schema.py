"""I3: LLM schema inference — prompt, REST call, fence-strip, validation.

Re-expresses the reference's ``infer_schema_gemini`` (``etl.py:712-848``)
as a composable, *deterministic-by-default* client:

- OFF unless an API key is configured (reference: no key → None,
  ``etl.py:714``), so the engine's default strategy chain stays reproducible
  (SURVEY §7); any failure anywhere returns None — never raises — exactly
  like the reference's catch-all error handling (``etl.py:838-848``).
- Sample preparation mirrors ``etl.py:716-727``: head-N rows, nulls become
  the literal string 'null', every value stringified, an all-null sample
  aborts.
- The response text is parsed as JSON with a markdown-fence fallback
  (``etl.py:778-790``), then validated by ``inference.validate_llm_schema``
  (strict item shape → abort; hallucinated names → skipped; off-whitelist
  types → STRING; nothing left → abort; ``etl.py:793-836``).
- The HTTP transport is stdlib urllib against a public REST endpoint
  (env-configured, Gemini-shaped request/response by default like the
  reference) and fully injectable, so tests drive the whole path without a
  network.

Wire-up: ``determine_schema(..., llm_infer=gemini_schema_client())`` under a
``*gemini*``/``*llm*`` strategy reproduces the reference default
(``existing_or_gemini``).
"""

from __future__ import annotations

import json
import os
import re
import urllib.request
from collections.abc import Callable

import pandas as pd

#: transport: prompt text → raw response TEXT (the model's message body).
Transport = Callable[[str], str]

DEFAULT_MODEL = "gemini-1.5-flash-latest"
#: Public REST endpoint template (the reference's URL, etl.py:745).
DEFAULT_ENDPOINT = (
    "https://generativelanguage.googleapis.com/v1beta/models/"
    "{model}:generateContent?key={key}"
)

_ALLOWED_TYPES_PROMPT = (
    "STRING, INTEGER, FLOAT, NUMERIC, BOOLEAN, TIMESTAMP, DATE, TIME, "
    "DATETIME, GEOGRAPHY, JSON, BYTES"
)


def prepare_sample(sample_pdf: pd.DataFrame) -> list[dict] | None:
    """Head-N rows → JSON-ready records (etl.py:716-727): nulls become the
    literal 'null' string, everything else stringified; an effectively empty
    sample returns None."""
    if sample_pdf is None or sample_pdf.empty:
        return None
    prepped = sample_pdf.copy()
    for col in prepped.columns:
        s = prepped[col].astype(object)
        prepped[col] = s.where(s.notna(), "null").astype(str)
    records = prepped.to_dict(orient="records")
    if not records or all(
        all(v == "null" or not v for v in row.values()) for row in records
    ):
        return None
    return records


def build_schema_prompt(sample_records: list[dict]) -> str:
    """Schema-suggestion prompt with the reference's rule set
    (etl.py:731-744): exact input keys, whitelisted types, judge only from
    sample values, bare JSON list output."""
    return (
        "Given the sample rows below (JSON objects from one table), propose a "
        "column schema.\n"
        "Rules:\n"
        "1. Use each input object's keys VERBATIM as the 'name' values — "
        "never invent or rename columns.\n"
        f"2. Every 'type' must be one of: {_ALLOWED_TYPES_PROMPT}. "
        "When unsure, use STRING.\n"
        "3. Decide each type only from that column's sample values.\n"
        "4. Reply with NOTHING but one valid JSON list of objects, each "
        "exactly {\"name\": ..., \"type\": ...}.\n"
        "5. No markdown fences or commentary.\n"
        "Sample rows:\n"
        f"{json.dumps(sample_records)}\n\n"
        "JSON schema:"
    )


def parse_schema_text(text: str) -> list | None:
    """JSON-parse the model text; strip ```json fences`` on failure
    (etl.py:778-790).  Non-list / empty → None."""
    if not text:
        return None
    try:
        parsed = json.loads(text)
    except json.JSONDecodeError:
        cleaned = re.sub(
            r"```json\s*([\s\S]*?)\s*```", r"\1", text, flags=re.IGNORECASE
        ).strip()
        try:
            parsed = json.loads(cleaned)
        except json.JSONDecodeError:
            return None
    if not isinstance(parsed, list) or not parsed:
        return None
    return parsed


def http_transport(
    api_key: str,
    endpoint: str | None = None,
    model: str | None = None,
    timeout: float = 60.0,
) -> Transport:
    """Stdlib-urllib POST transport, Gemini-shaped request/response
    (etl.py:745-772): temperature 0.1, JSON response mime, text extracted
    from ``candidates[0].content.parts[0].text``."""
    url = (endpoint or os.getenv("WORKER_LLM_ENDPOINT") or DEFAULT_ENDPOINT).format(
        model=model or os.getenv("WORKER_LLM_MODEL", DEFAULT_MODEL), key=api_key
    )

    def call(prompt: str) -> str:
        payload = {
            "contents": [{"parts": [{"text": prompt}]}],
            "generationConfig": {
                "temperature": 0.1,
                "responseMimeType": "application/json",
            },
        }
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = json.loads(resp.read().decode())
        return body["candidates"][0]["content"]["parts"][0]["text"]

    return call


def gemini_schema_client(
    transport: Transport | None = None,
    api_key: str | None = None,
    attempts: int = 1,
) -> Callable[[pd.DataFrame], list | None]:
    """Build the ``llm_infer`` callable ``determine_schema`` expects.

    Resolution order: injected *transport* (tests/custom backends) → HTTP
    transport when an API key is configured (``GEMINI_API_KEY``, the
    reference's env name) → permanently-None client (deterministic off —
    the engine default).  Validation against the actual DataFrame columns
    happens downstream in ``inference.validate_llm_schema``.
    """
    if transport is None:
        key = api_key or os.getenv("GEMINI_API_KEY", "")
        if not key:
            return lambda sample_pdf: None
        timeout = float(os.getenv("WORKER_GEMINI_TIMEOUT", "60"))
        transport = http_transport(key, timeout=timeout)

    def infer(sample_pdf: pd.DataFrame) -> list | None:
        records = prepare_sample(sample_pdf)
        if records is None:
            return None
        prompt = build_schema_prompt(records)
        for _ in range(max(1, attempts)):
            try:
                parsed = parse_schema_text(transport(prompt))
            except Exception:  # noqa: BLE001 — any transport failure → None
                parsed = None
            if parsed is not None:
                return parsed
        return None

    return infer
