"""Engine configuration.

Mirrors the reference worker's env-knob surface (names, defaults, semantics:
``etl.py:56-90``), minus the GCP-credential concerns (out of scope — see
SURVEY.md §2 O5).  The LLM schema-inference strategy is pluggable but the
engine defaults to the deterministic heuristic chain (``existing_or_pandas``)
so tests are reproducible; the reference default is ``existing_or_gemini``
(``etl.py:63``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    return int(os.getenv(name, default))


def _env_float(name: str, default: float) -> float:
    return float(os.getenv(name, default))


@dataclass
class EngineConfig:
    # Schema strategy chain (reference: etl.py:63, 934-1009).  Engine default
    # is deterministic; set "existing_or_gemini" + an LLM client for parity
    # with the reference default.
    schema_strategy: str = field(
        default_factory=lambda: os.getenv("SCHEMA_STRATEGY", "existing_or_pandas")
    )
    # Sink write disposition (reference: etl.py:64).
    write_disposition: str = field(
        default_factory=lambda: os.getenv("BQ_WRITE_DISPOSITION", "WRITE_APPEND")
    )
    # LLM inference sample size (reference: etl.py:66).
    llm_sample_size: int = field(default_factory=lambda: _env_int("GEMINI_SAMPLE_SIZE", 5))
    # Multi-table detection knobs (reference: etl.py:72-75).
    min_table_rows: int = field(default_factory=lambda: _env_int("WORKER_MIN_TABLE_ROWS", 3))
    min_table_cols: int = field(default_factory=lambda: _env_int("WORKER_MIN_TABLE_COLS", 2))
    min_header_confidence: float = field(
        default_factory=lambda: _env_float("WORKER_MIN_HEADER_CONFIDENCE", 0.6)
    )
    block_density_threshold: float = field(
        default_factory=lambda: _env_float("WORKER_BLOCK_DENSITY_THRESHOLD", 0.25)
    )
    # Detection toggle — False reproduces the reference's no-scipy fallback
    # path (whole sheet as one candidate table, etl.py:340-359).
    multi_table_detection: bool = True

    # Engine-only knobs (no reference counterpart).
    shuffle_partitions: int = field(
        default_factory=lambda: _env_int("SPARK_GRAFT_SHUFFLE_PARTITIONS", 32)
    )
    cpus: int = field(default_factory=lambda: _env_int("SPARK_GRAFT_CPUS", 32))


# Null-token vocabularies.  The reference uses two distinct sets:
#  - detection/masking set (etl.py:365-366): case-SENSITIVE whole-cell match,
#    plus the all-whitespace regex ^\s*$;
#  - cleaning set (etl.py:702-705): case-INSENSITIVE whole-cell match applied
#    after whitespace strip.
DETECT_NULL_TOKENS = (
    "None", "none", "null", "NULL", "NaN", "NAN", "<NA>", "na", "N/A", "n/a",
)
CLEAN_NULL_TOKENS = ("", "none", "null", "nan", "<na>", "nat")

# Boolean token map (reference: etl.py:899, 1081-1087).
BOOL_TRUE_TOKENS = ("true", "t", "yes", "y", "1", "1.0")
BOOL_FALSE_TOKENS = ("false", "f", "no", "n", "0", "0.0")
