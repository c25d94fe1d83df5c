"""Concrete LLM generate transport for answer synthesis.

The reference's synthesis provider (worker/providers/llm/ollama.py:21-72)
POSTs ``{"model", "prompt", "stream": false, "options": {...}}`` to
``{host}/api/generate`` and returns ``data["response"].strip()`` — with the
deliberate failure contract that ANY error (non-2xx, network, bad JSON)
returns the empty string, so the caller's retrieve-only fallback engages
(ask.py:333-341; our :func:`jsonify2ai_spark.api.ask_and_generate` records
``synth_skipped_reason="empty_generation"`` for it).

Stdlib urllib — no extra dependency. The sandbox has no model server, so
nothing imports this by default; pass the result as ``generate=`` to
``ask_and_generate`` to go live.
"""

from __future__ import annotations

from typing import Callable

# Reference worker/app/config.py sampling defaults.
DEFAULT_OPTIONS = {
    "temperature": 0.2,
    "top_p": 0.9,
    "repeat_penalty": 1.1,
    "num_ctx": 4096,
    "num_predict": 512,
}


def ollama_generate_fn(
    host: str = "http://localhost:11434",
    model: str = "llama3.1:8b",
    timeout: float = 180.0,
    options: dict | None = None,
) -> Callable[[str], str]:
    """Build a ``generate(prompt) -> str`` callable with the reference's
    request/response/failure contract. Empty string on ANY failure —
    never raises."""
    import json
    import urllib.request

    url = f"{host.rstrip('/')}/api/generate"
    opts = dict(DEFAULT_OPTIONS, **(options or {}))

    def generate(prompt: str) -> str:
        try:
            req = urllib.request.Request(
                url,
                data=json.dumps(
                    {"model": model, "prompt": prompt, "stream": False, "options": opts}
                ).encode("utf-8"),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                status = getattr(resp, "status", 200)
                if not (200 <= status < 300):
                    return ""
                data = json.loads(resp.read().decode("utf-8"))
            return str(data.get("response", "")).strip()
        except Exception:
            return ""

    return generate
