"""ChatGPT-export detection & parsing (S11/S12).

Semantics contract (reference: worker/app/services/parse_chatgpt.py):
- detector (:16-101): structural — a list of conversations each carrying a
  ``mapping`` of nodes whose ``message`` has ``author.role`` and content;
  filename ``conversations.json`` is an accepted hint.
- parser (:104-331): per conversation, walk mapping nodes, extract role +
  content (string | dict.parts | dict.text | list), sort messages by
  ``create_time``, render ``"[YYYY-MM-DD HH:MM] role: content"`` blocks
  joined by blank lines; document_id = ``chatgpt:{conversation_id}``
  (process.py:1336); meta carries conversation_id/title/created/updated/
  logical_path (parse_chatgpt.py:287-301).

One export file fans out into N conversation documents (§3.1 step 3 fan-out).
Kernels are pure Python; at scale the per-conversation explode happens inside
the ingest UDF and parallelism comes from files x conversations.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Any


def _content_text(content: Any) -> str:
    """Extract text from the polymorphic message content shapes."""
    if content is None:
        return ""
    if isinstance(content, str):
        return content
    if isinstance(content, list):
        return "\n".join(_content_text(c) for c in content if c)
    if isinstance(content, dict):
        if "parts" in content and isinstance(content["parts"], list):
            return "\n".join(
                p if isinstance(p, str) else _content_text(p) for p in content["parts"] if p
            )
        if "text" in content:
            return str(content["text"] or "")
    return ""


def _valid_conversation(conv: Any) -> bool:
    if not isinstance(conv, dict) or not isinstance(conv.get("mapping"), dict):
        return False
    for node in conv["mapping"].values():
        msg = node.get("message") if isinstance(node, dict) else None
        if isinstance(msg, dict) and isinstance(msg.get("author"), dict) and "role" in msg["author"]:
            return True
    return False


def is_chatgpt_export(data: Any, filename: str = "") -> bool:
    """S11 structural detector."""
    if filename.rsplit("/", 1)[-1] == "conversations.json" and isinstance(data, list):
        return True
    if not isinstance(data, list) or not data:
        return False
    return any(_valid_conversation(c) for c in data)


def _fmt_ts(ts: Any) -> str:
    try:
        return datetime.fromtimestamp(float(ts), tz=timezone.utc).strftime("%Y-%m-%d %H:%M")
    except (TypeError, ValueError, OSError):
        return ""


def parse_conversation(conv: dict, source_file: str = "") -> tuple[str, str, dict] | None:
    """One conversation -> (document_id, rendered_text, meta)."""
    conv_id = str(conv.get("id") or conv.get("conversation_id") or "")
    if not conv_id:
        return None
    messages = []
    for node in (conv.get("mapping") or {}).values():
        msg = node.get("message") if isinstance(node, dict) else None
        if not isinstance(msg, dict):
            continue
        role = ((msg.get("author") or {}).get("role") or "").strip()
        text = _content_text(msg.get("content")).strip()
        if not role or not text:
            continue
        messages.append({"role": role, "text": text, "create_time": msg.get("create_time") or 0})
    if not messages:
        return None
    messages.sort(key=lambda m: (m["create_time"], m["role"], m["text"]))
    blocks = []
    for m in messages:
        ts = _fmt_ts(m["create_time"])
        prefix = f"[{ts}] {m['role']}" if ts else m["role"]
        blocks.append(f"{prefix}: {m['text']}")
    meta = {
        "source_system": "chatgpt",
        "doc_type": "chat",
        "detected_as": "chatgpt",
        "conversation_id": conv_id,
        "logical_path": f"chatgpt/{conv_id}",
        "message_count": str(len(messages)),
        **({"title": str(conv["title"])} if conv.get("title") else {}),
        **({"chat_created_at": _fmt_ts(conv["create_time"])} if conv.get("create_time") else {}),
        **({"chat_updated_at": _fmt_ts(conv["update_time"])} if conv.get("update_time") else {}),
        **({"source_file": source_file} if source_file else {}),
    }
    return (f"chatgpt:{conv_id}", "\n\n".join(blocks), meta)


def parse_chatgpt_export(data: Any, source_file: str = "") -> list[tuple[str, str, dict]]:
    """S12: export (list of conversations) -> one document per conversation."""
    if isinstance(data, str):
        try:
            data = json.loads(data)
        except ValueError:
            return []
    if not isinstance(data, list):
        return []
    out = []
    for conv in data:
        if not _valid_conversation(conv):
            continue
        parsed = parse_conversation(conv, source_file)
        if parsed:
            out.append(parsed)
    return out
