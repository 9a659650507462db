"""Bulk documentation attachment from a schema-ref JSON spec
(tools/schema_ref.py:23-151 + tools/bootstrapper.py:101-140 semantics):
a JSON document listing, per source, a table doc/note/category/owner and
per-field docs/notes, applied onto already-registered sources through the
registry's metadata surfaces — the batch form of annotating a catalog for
a documentation tool.

Spec shape (keys all optional; ``defaults`` fills the gaps)::

    {
      "doc_source": "https://...",        # provenance of the ref itself
      "doc_owner": "data-team@example",   # default note author
      "docs": [
        {
          "namespace": "main", "source": "orders",
          "doc": "...", "note": "...", "category": "sales",
          "owner_email": "...", "file_display": "...", "file_url": "...",
          "contains_pii": false,
          "fields": [{"name": "o_custkey", "doc": "...", "note": "..."}]
        }
      ]
    }

Application is driver-side catalog mutation (registry dictionaries), not
a Spark job — the registry's DataFrame views pick the results up on next
read.  Unknown sources/fields are collected into the returned summary
instead of failing the whole batch, so one bad entry cannot abort a
thousand-table ref.
"""

from __future__ import annotations

import json
from typing import Any

from data_pipeline_spark.registry import SchemaRegistry

_SOURCE_META_KEYS = (
    "doc",
    "note",
    "category",
    "owner_email",
    "file_display",
    "file_url",
)


class SchemaRef:
    """Parsed schema-ref spec with default fallbacks: ``get_source_val``
    resolves source attributes, falling back to ``defaults`` for keys a
    source entry omits."""

    def __init__(self, spec: dict, defaults: dict | None = None):
        self.spec = spec or {}
        self.defaults = defaults or {}
        self._by_source = {
            (
                d.get("namespace", self.defaults.get("namespace")),
                d["source"],
            ): d
            for d in self.spec.get("docs", ())
        }

    @classmethod
    def load_from_file(cls, path: str, defaults: dict | None = None) -> "SchemaRef":
        with open(path) as fh:
            return cls(json.load(fh), defaults)

    @property
    def doc_owner(self) -> str | None:
        return self.spec.get("doc_owner", self.defaults.get("doc_owner"))

    def sources(self) -> list[tuple[str, str]]:
        return list(self._by_source)

    def get_source_ref(self, namespace: str, source: str) -> dict | None:
        return self._by_source.get((namespace, source))

    def get_ref_val(self, ref: dict | None, key: str) -> Any:
        if ref is not None and key in ref:
            return ref[key]
        return self.defaults.get(key)

    def get_source_val(self, namespace: str, source: str, key: str) -> Any:
        return self.get_ref_val(self.get_source_ref(namespace, source), key)


def generate_schema_ref(
    registry: SchemaRegistry,
    namespace: str | None = None,
    doc_source: str | None = None,
    doc_owner: str | None = None,
) -> dict:
    """The inverse of ``apply_schema_ref``
    (tools/schema_ref_json_generator.py semantics): dump the registry's
    current documentation state — per-source metadata, record notes,
    per-field docs/notes — as a schema-ref JSON spec, so a catalog's
    annotations can be exported, reviewed in code review, and re-applied
    elsewhere.  Only sources in ``namespace`` (all if None); keys a
    source has no value for are omitted, so applying the generated spec
    onto a fresh registry reproduces exactly the captured state."""
    seen: set[tuple[str, str]] = set()
    docs = []
    for rs in sorted(registry._schemas.values(), key=lambda r: -r.schema_id):
        key = (rs.namespace, rs.source)
        if key in seen or (namespace and rs.namespace != namespace):
            continue
        seen.add(key)  # newest schema_id wins: that's what apply targets
        entry: dict = {"namespace": rs.namespace, "source": rs.source}
        entry.update(
            {
                k: v
                for k, v in registry.get_source_metadata(*key).items()
                if k != "doc_owner"
            }
        )
        fields = []
        for e in registry.get_schema_elements_by_schema_id(rs.schema_id):
            if e.element_name is None:
                if e.note is not None:
                    entry["note"] = e.note
                continue
            f = {"name": e.element_name}
            if e.doc is not None:
                f["doc"] = e.doc
            if e.note is not None:
                f["note"] = e.note
            if len(f) > 1:
                fields.append(f)
        if fields:
            entry["fields"] = fields
        docs.append(entry)
    spec: dict = {"docs": sorted(docs, key=lambda d: (d["namespace"], d["source"]))}
    if doc_source is not None:
        spec["doc_source"] = doc_source
    if doc_owner is not None:
        spec["doc_owner"] = doc_owner
    return spec


def apply_schema_ref(
    registry: SchemaRegistry, ref: SchemaRef, override: bool = True
) -> dict:
    """Apply every source entry of ``ref`` onto the registry's LATEST
    schema for that source: table-level metadata via
    ``set_source_metadata`` plus a record-level note, and per-field
    doc/note via the element APIs.  ``override=False`` preserves any
    already-present value (registry metadata and existing element
    docs/notes win over the ref) — the bootstrapper's override flag.

    Returns a summary: sources/fields applied, unknown sources, unknown
    fields — per-entry failures never abort the batch.
    """
    summary = {
        "sources_applied": 0,
        "fields_applied": 0,
        "sources_missing": [],
        "fields_missing": [],
    }
    for namespace, source in ref.sources():
        latest = registry.latest_schema_for_source(namespace, source)
        if latest is None:
            summary["sources_missing"].append(f"{namespace}.{source}")
            continue
        entry = ref.get_source_ref(namespace, source)

        existing = registry.get_source_metadata(namespace, source)
        meta = {}
        for key in _SOURCE_META_KEYS:
            val = ref.get_ref_val(entry, key)
            if val is None or (not override and existing.get(key) is not None):
                continue
            meta[key] = val
        if ref.doc_owner is not None and (
            override or existing.get("doc_owner") is None
        ):
            meta["doc_owner"] = ref.doc_owner
        if meta:
            registry.set_source_metadata(namespace, source, **meta)

        elements = {
            e.element_name: e
            for e in registry.get_schema_elements_by_schema_id(
                latest.schema_id
            )
        }
        record_note = ref.get_ref_val(entry, "note")
        if record_note is not None and (
            override or elements[None].note is None
        ):
            registry.register_schema_element_note(
                latest.schema_id, None, record_note
            )
        summary["sources_applied"] += 1

        for f in entry.get("fields", ()):
            el = elements.get(f.get("name"))
            if el is None:
                summary["fields_missing"].append(
                    f"{namespace}.{source}.{f.get('name')}"
                )
                continue
            doc = ref.get_ref_val(f, "doc")
            if doc is not None and (override or el.doc is None):
                registry.register_schema_element_doc(
                    latest.schema_id, el.element_name, doc
                )
            note = ref.get_ref_val(f, "note")
            if note is not None and (override or el.note is None):
                registry.register_schema_element_note(
                    latest.schema_id, el.element_name, note
                )
            summary["fields_applied"] += 1
    return summary
