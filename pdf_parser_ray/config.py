"""Engine configuration: validation limits and regex field definitions.

Parity notes (values, not code, taken from the reference):
  - size limits: /root/reference/src/pdf_parser/config/config.py:25-26
  - regex fields: /root/reference/src/pdf_parser/config/config.py:32-45
  - AI truncation limits: /root/reference/src/pdf_parser/extractors/ai_extractor.py:116,197
"""

from __future__ import annotations

MAX_FILE_SIZE = 50 * 1024 * 1024  # 50 MB per document payload
MIN_FILE_SIZE = 100  # bytes

# Shared zero-sort coalesce gate (BENCH/TUNING.md): below this many SLIM
# rows a repartition(1) + one vectorized kernel replaces a sort-based
# groupby exchange (~2 s fixed planner/barrier cost per sort at any row
# count). One constant so retuning (e.g. after a Ray upgrade changes the
# sort fixed cost) happens in one place.
COALESCE_ROW_LIMIT = 2_000_000

# Field → list of regex patterns, tried in order, first match wins,
# compiled with re.IGNORECASE (reference classic_extractor.py:54-57).
REGEX_FIELDS: dict[str, dict[str, object]] = {
    "customer_name": {
        "display": "Customer Name",
        "patterns": [r"Customer Name[:\s]*([A-Za-zÀ-ž ,.'-]+)"],
    },
    "policy_number": {
        "display": "Policy Number",
        "patterns": [r"Policy Number[:\s]*([\w-]+)"],
    },
    "claim_amount": {
        "display": "Claim Amount",
        "patterns": [r"Claim Amount[:\s]*\$?([\d,]+\.\d{2})"],
    },
}

# AI-mode truncation limits kept as config surface (stage is a deterministic
# stub offline; limits preserved so prompts match reference shape).
AI_DISCOVERY_TRUNCATE = 3_000
AI_EXTRACT_TRUNCATE = 20_000
AI_MAX_LABELS = 15

# Scale/partitioning knobs (ours; tuned via bench).
DEFAULT_PARSE_BATCH_SIZE = 16  # docs per batch in the parse stage (heavy per-doc cost)
DEFAULT_TEXT_BATCH_SIZE = 4096  # rows per batch in cheap vectorized text stages
PARTITION_BYTE_BUDGET = 256 * 1024 * 1024  # byte-budget repartition target
