"""Deterministic identity: UUID5 document/chunk ids, content signatures.

The reference derives every id from content, which is what makes re-ingest
idempotent (reference: worker/app/utils/docids.py:25,44-49 — document_id =
uuid5(namespace, canonical_relpath), chunk id = uuid5(document_id, "chunk:{idx}");
namespace UUID "00000000-0000-5000-8000-000000000000"; sha256 content sigs at
scripts/dev/tools/ingest_dropzone.py:41-42).

UUID5 is SHA-1(namespace_bytes || name) with version/variant bit twiddling.
``uuid5_sql`` implements it as pure string surgery over ``sha1`` so id
derivation is a codegen'd projection over billions of rows — no Python round
trip. Validated against CPython's ``uuid.uuid5`` in tests.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference namespace (docids.py:25): a fixed UUID with version nibble 5.
DOCID_NAMESPACE = "00000000-0000-5000-8000-000000000000"


def _ns_hex(namespace: str) -> str:
    return uuid.UUID(namespace).hex


_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def uuid5_sql(name: Column | str, namespace: str | Column = DOCID_NAMESPACE) -> Column:
    """uuid5(namespace, name) as a Column expression producing the canonical
    hyphenated lowercase form.

    namespace may be a literal UUID string (precompiled to hex) or a Column.
    A column namespace that is not itself a UUID (the reference's prefixed
    document ids like ``chatgpt:{id}`` / ``transcript:{sig}:{tid}``) is first
    folded into one via uuid5(DOCID_NAMESPACE, value), keeping chunk-id
    derivation total and deterministic for every id shape.
    """
    name = F.col(name) if isinstance(name, str) else name
    if isinstance(namespace, str):
        ns_bytes = F.unhex(F.lit(_ns_hex(namespace)))
    else:
        ns_hex = F.when(
            namespace.rlike(_UUID_RE), F.regexp_replace(namespace, "-", "")
        ).otherwise(F.regexp_replace(uuid5_sql(namespace), "-", ""))
        ns_bytes = F.unhex(ns_hex)
    digest = F.sha1(F.concat(ns_bytes, name.cast("binary")))  # 40 hex chars
    h = F.substring(digest, 1, 32)
    # version nibble (byte 6 high nibble, hex char 13) := '5'
    # variant nibble (byte 8 high nibble, hex char 17) := (n & 0x3) | 0x8
    variant = F.lower(F.conv(
        (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4 + 8).cast("string"), 10, 16
    ))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def uuid5_py(name: str, namespace: str = DOCID_NAMESPACE) -> str:
    """Driver-side twin for tests and single-value derivation."""
    return str(uuid.uuid5(uuid.UUID(namespace), name))


def chunk_id_py(document_id: str, idx: int) -> str:
    """Driver-side twin of :func:`chunk_id_for` (non-UUID ids folded first)."""
    try:
        ns = uuid.UUID(document_id)
    except ValueError:
        ns = uuid.UUID(uuid5_py(document_id))
    return str(uuid.uuid5(ns, f"chunk:{idx}"))


def canonical_relpath(path: Column | str) -> Column:
    """Normalize a path the way the reference canonicalizes before hashing
    (reference: worker/app/utils/docids.py:28-41): backslashes -> '/', strip
    leading './' and the 'data/dropzone/' prefix.
    """
    p = F.col(path) if isinstance(path, str) else path
    p = F.regexp_replace(p, r"\\", "/")
    p = F.regexp_replace(p, r"^\./", "")
    return F.regexp_replace(p, r"^data/dropzone/", "")


def document_id_for(path: Column | str) -> Column:
    """document_id = uuid5(namespace, canonical relpath) (docids.py:44-45)."""
    return uuid5_sql(canonical_relpath(path))


def chunk_id_for(document_id: Column | str, idx: Column | str) -> Column:
    """chunk id = uuid5(document_id, f"chunk:{idx}") (docids.py:48-49)."""
    document_id = F.col(document_id) if isinstance(document_id, str) else document_id
    idx = F.col(idx) if isinstance(idx, str) else idx
    return uuid5_sql(F.concat(F.lit("chunk:"), idx.cast("string")), namespace=document_id)


def content_sig(content: Column | str) -> Column:
    """sha256 of file bytes / text — the watcher's change signature
    (reference: scripts/dev/tools/watch_dropzone.py:81-86)."""
    c = F.col(content) if isinstance(content, str) else content
    return F.sha2(c, 256)
