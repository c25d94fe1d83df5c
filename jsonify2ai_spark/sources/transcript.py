"""Transcript detection & parsing (S13/S14).

Semantics contract (reference: worker/app/services/parse_transcript.py):
- detector (:24-48,51-142): weighted regex scoring over lines — role-prefix
  x1.2, timestamped-role x1.5, markdown-bold role x1.2, JSON-ish role x0.5;
  fewer than 2 distinct roles multiplies the score by 0.3; filename hint adds
  +0.15; detection threshold 0.85. (Weights/threshold per SURVEY §2.1 S13;
  the combining formula is re-derived, not a line port.)
- parser (:145-291): split into {role, content} messages, normalize roles
  ({human,user}->user, {assistant,ai,bot,agent}->assistant), deterministic
  thread id ``sha1(text[:1000])[:12]_0`` and document id
  ``transcript:{sha1(text)[:16]}:{thread_id}``, re-render "Label: content"
  blocks joined by blank lines, title from the first user message (40 chars).

Kernels are pure Python; the Spark path maps them per-file inside the ingest
UDF (a transcript is one file = one row, so this is map-parallel by file).
"""

from __future__ import annotations

import hashlib
import re

DETECT_THRESHOLD = 0.85

_ROLE_WORDS = r"(?:user|human|assistant|ai|bot|agent|system|me|q|a)"
_RE_ROLE_PREFIX = re.compile(rf"^\s*{_ROLE_WORDS}\s*[:>]\s+", re.IGNORECASE)
_RE_TIMESTAMPED = re.compile(
    rf"^\s*\[?\d{{1,4}}[-/:]\d{{1,2}}[^\]]*\]?\s*{_ROLE_WORDS}\s*[:>]", re.IGNORECASE
)
_RE_BOLD_ROLE = re.compile(rf"^\s*\*\*{_ROLE_WORDS}\*\*\s*[:>]?", re.IGNORECASE)
_RE_JSON_ROLE = re.compile(r'"role"\s*:\s*"\w+"', re.IGNORECASE)
_RE_FILENAME_HINT = re.compile(r"transcript|conversation|chat", re.IGNORECASE)

_ROLE_MAP = {
    "human": "user", "user": "user", "me": "user", "q": "user",
    "assistant": "assistant", "ai": "assistant", "bot": "assistant",
    "agent": "assistant", "a": "assistant",
}


def normalize_role(role: str) -> str:
    """F15 role normalization (parse_transcript.py:106-111,180-189)."""
    return _ROLE_MAP.get(role.strip().lower(), role.strip().lower())


def detect_transcript(text: str, filename: str = "") -> tuple[bool, float]:
    """S13: (is_transcript, confidence)."""
    if not text or not text.strip():
        return False, 0.0
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        return False, 0.0
    score = 0.0
    roles: set[str] = set()
    for ln in lines:
        if _RE_TIMESTAMPED.match(ln):
            score += 1.5
        elif _RE_BOLD_ROLE.match(ln):
            score += 1.2
        elif _RE_ROLE_PREFIX.match(ln):
            score += 1.2
        elif _RE_JSON_ROLE.search(ln):
            score += 0.5
        else:
            continue
        m = re.match(rf"^\s*(?:\[[^\]]*\]\s*)?(?:\*\*)?({_ROLE_WORDS})", ln, re.IGNORECASE)
        if m:
            roles.add(normalize_role(m.group(1)))
    confidence = min(1.0, score / len(lines))
    if len(roles) < 2:
        confidence *= 0.3
    if filename and _RE_FILENAME_HINT.search(filename):
        confidence = min(1.0, confidence + 0.15)
    return confidence >= DETECT_THRESHOLD, round(confidence, 4)


_RE_MSG_SPLIT = re.compile(
    rf"^\s*(?:\[(?P<ts>[^\]]*)\]\s*)?(?:\*\*)?(?P<role>{_ROLE_WORDS})(?:\*\*)?\s*[:>]\s*",
    re.IGNORECASE | re.MULTILINE,
)


def parse_transcript(text: str, filename: str = "") -> list[tuple[str, str, dict]]:
    """S14: -> [(document_id, rendered_text, meta)] (single thread)."""
    if not text or not text.strip():
        return []
    matches = list(_RE_MSG_SPLIT.finditer(text))
    if not matches:
        return []
    messages: list[dict] = []
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        content = text[m.end():end].strip()
        if content:
            messages.append({"role": normalize_role(m.group("role")), "content": content})
    if not messages:
        return []
    sig = hashlib.sha1(text.encode("utf-8")).hexdigest()[:16]
    tid = hashlib.sha1(text[:1000].encode("utf-8")).hexdigest()[:12] + "_0"
    doc_id = f"transcript:{sig}:{tid}"
    blocks = [f"{m['role'].capitalize()}: {m['content']}" for m in messages]
    first_user = next((m["content"] for m in messages if m["role"] == "user"), messages[0]["content"])
    title = first_user[:40] + ("..." if len(first_user) > 40 else "")
    meta = {
        "source_system": "transcript",
        "doc_type": "chat",
        "detected_as": "transcript",
        "thread_id": tid,
        "title": title,
        "message_count": str(len(messages)),
        **({"source_file": filename} if filename else {}),
    }
    return [(doc_id, "\n\n".join(blocks), meta)]
