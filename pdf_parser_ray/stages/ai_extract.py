"""AI-extractor stage parity (reference ai_extractor.py semantics, offline).

Reproduces the reference AI mode's *shape* — discover labels → select →
extract → JSON-fish parse — behind a pluggable model interface (the
reference's Strategy pattern, SURVEY.md E1/ST2), with a deterministic stub
model so the path is testable without network:

  - discovery prompt truncates input to 3,000 chars (ai_extractor.py:116)
  - extraction prompt truncates to 20,000 chars (ai_extractor.py:197)
  - label post-filter keeps 2 < len(label) < 40, caps at 15 labels
    (ai_extractor.py:129-133, :93)
  - response parse: first ``\\{.*\\}`` DOTALL match → json.loads → must be a
    dict (ai_extractor.py:200-227); failure → row error, never a crash

The stage is an actor-pool class holding the model client (reference ST2:
client built once in __init__).
"""

from __future__ import annotations

import hashlib
import json
import re

import pyarrow as pa

from ..config import AI_DISCOVERY_TRUNCATE, AI_EXTRACT_TRUNCATE, AI_MAX_LABELS
from ..state.metrics import observe

_JSON_FISH = re.compile(r"\{.*\}", re.S)


class ModelClient:
    """Pluggable model interface: complete(prompt) -> str."""

    def complete(self, prompt: str) -> str:  # pragma: no cover - interface
        raise NotImplementedError


class StubModel(ModelClient):
    """Deterministic offline stand-in.

    Discovery: returns comma-separated 'labels' derived from the most common
    ``Key: value``-looking lines of the prompt text. Extraction: returns a
    JSON object mapping each requested label to the text after ``label:`` in
    the document (or a stable hash-derived token when absent). Wrapped in
    chatty prose so the JSON-fish parser is actually exercised.
    """

    def complete(self, prompt: str) -> str:
        if prompt.startswith("DISCOVER:"):
            text = prompt[len("DISCOVER:"):]
            labels = []
            for m in re.finditer(r"(?m)^([A-Za-z][A-Za-z ]{1,30}):", text):
                label = m.group(1).strip().lower().replace(" ", "_")
                if label not in labels:
                    labels.append(label)
            return "Sure! The labels are: " + ", ".join(labels)
        if prompt.startswith("EXTRACT:"):
            header, text = prompt[len("EXTRACT:"):].split("\n", 1)
            labels = [l for l in header.split(",") if l]
            out = {}
            for label in labels:
                pat = re.compile(
                    rf"(?im)^{re.escape(label.replace('_', ' '))}:\s*(.+)$")
                m = pat.search(text)
                out[label] = m.group(1).strip() if m else None
            return "Here is the JSON you asked for:\n" + json.dumps(out) + "\nHope it helps!"
        return "{}"


class HTTPChatModel(ModelClient):
    """Env-keyed OpenAI-compatible chat-completions client (stdlib urllib).

    The real-model counterpart of the reference's wired client
    (ai_extractor.py:39-56), behind the same pluggable interface. Reads
    ``AI_MODEL_BASE_URL`` (e.g. https://api.openai.com/v1),
    ``AI_MODEL_API_KEY`` (falls back to ``OPENAI_API_KEY``) and
    ``AI_MODEL_NAME``. Never constructed by default — ``model_from_env``
    returns the offline StubModel unless the env is configured — so the
    sandbox (no network) always runs the deterministic path.
    """

    def __init__(self, base_url: str, api_key: str, model_name: str,
                 timeout_s: int = 60):
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.api_key = api_key
        self.model_name = model_name
        self.timeout_s = timeout_s

    def complete(self, prompt: str) -> str:
        import urllib.request

        body = json.dumps({
            "model": self.model_name,
            "messages": [{"role": "user", "content": prompt}],
            "temperature": 0,
        }).encode("utf-8")
        req = urllib.request.Request(
            self.url, data=body,
            headers={"Authorization": f"Bearer {self.api_key}",
                     "Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["choices"][0]["message"]["content"]


def model_from_env() -> ModelClient:
    """StubModel unless AI_MODEL_BASE_URL + an API key are configured."""
    import os

    base = os.environ.get("AI_MODEL_BASE_URL")
    key = os.environ.get("AI_MODEL_API_KEY") or os.environ.get("OPENAI_API_KEY")
    if base and key:
        return HTTPChatModel(base, key, os.environ.get("AI_MODEL_NAME", "gpt-4o-mini"))
    return StubModel()


def parse_model_json(raw: str) -> dict:
    """Reference ai_extractor.py:200-227: first {...} DOTALL → dict or raise."""
    m = _JSON_FISH.search(raw or "")
    if not m:
        raise ValueError("No JSON object found in model response")
    obj = json.loads(m.group(0))
    if not isinstance(obj, dict):
        raise ValueError("Model response JSON is not an object")
    return obj


def filter_labels(labels: list[str], max_labels: int = AI_MAX_LABELS) -> list[str]:
    """Reference ai_extractor.py:129-133: keep 2 < len < 40, cap at max."""
    return [l for l in labels if 2 < len(l) < 40][:max_labels]


class AIExtract:
    """Actor-pool stage: discover labels (per doc) then extract them.

    Batch in: table with ``text_col``; batch out: + ``ai_labels``
    (list<string>), ``ai_fields_json`` (string, ensure_ascii=False — the
    reference's persisted form, extraction_repository.py:63), ``ai_error``.
    """

    def __init__(self, model: ModelClient | None = None, text_col: str = "text",
                 labels: list[str] | None = None):
        self.model = model if model is not None else model_from_env()
        self.text_col = text_col
        self.fixed_labels = labels

    @observe("ai_extract.discover")
    def _discover(self, text: str) -> list[str]:
        raw = self.model.complete("DISCOVER:" + text[:AI_DISCOVERY_TRUNCATE])
        tail = raw.split(":", 1)[1] if ":" in raw else raw
        labels = [l.strip() for l in tail.split(",")]
        return filter_labels([l for l in labels if l])

    @observe("ai_extract.extract")
    def _extract(self, text: str, labels: list[str]) -> dict:
        prompt = ("EXTRACT:" + ",".join(labels) + "\n" + text[:AI_EXTRACT_TRUNCATE])
        return parse_model_json(self.model.complete(prompt))

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_labels, all_json, all_err = [], [], []
        for v in batch.column(self.text_col).to_pylist():
            text = v or ""
            try:
                if not text.strip():
                    raise ValueError("No text content to process")
                labels = self.fixed_labels or self._discover(text)
                fields = self._extract(text, labels) if labels else {}
                all_labels.append(labels)
                all_json.append(json.dumps(fields, ensure_ascii=False))
                all_err.append(None)
            except Exception as e:  # noqa: BLE001 — per-row fail-soft is the
                # contract (module docstring / reference per-file try-except):
                # a real model client can raise HTTP/socket/shape errors for
                # ONE document, and that must land in the row's ai_error, not
                # kill the whole map_batches task
                all_labels.append([])
                all_json.append(None)
                all_err.append(str(e))
        batch = batch.append_column("ai_labels", pa.array(all_labels, type=pa.list_(pa.string())))
        batch = batch.append_column("ai_fields_json", pa.array(all_json, type=pa.string()))
        batch = batch.append_column("ai_error", pa.array(all_err, type=pa.string()))
        return batch


def stable_token(seed_text: str, n: int = 8) -> str:
    """Deterministic token for stub outputs (no RNG, no wall clock)."""
    return hashlib.sha256(seed_text.encode()).hexdigest()[:n]
