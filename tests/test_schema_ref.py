"""schema_ref bulk-doc attachment: apply a two-table JSON ref onto
registered sources and read it back through the registry element surface
and Introspector.topic_info."""

from __future__ import annotations

import json

import pytest

from data_pipeline_spark.introspector import Introspector
from data_pipeline_spark.registry import SchemaRegistry
from data_pipeline_spark.schema_ref import (
    SchemaRef,
    apply_schema_ref,
    generate_schema_ref,
)

ORDERS = {
    "type": "record",
    "name": "orders",
    "fields": [
        {"name": "o_orderkey", "type": "long", "doc": "avro-level doc"},
        {"name": "o_custkey", "type": "long"},
    ],
}
CUSTOMER = {
    "type": "record",
    "name": "customer",
    "fields": [{"name": "c_custkey", "type": "long"}],
}

REF = {
    "doc_source": "https://example.com/models",
    "doc_owner": "data-team@example.com",
    "docs": [
        {
            "namespace": "main",
            "source": "orders",
            "doc": "All orders ever placed",
            "note": "refreshed nightly",
            "category": "sales",
            "owner_email": "orders-team@example.com",
            "file_display": "models/orders.py",
            "fields": [
                {"name": "o_orderkey", "doc": "pk", "note": "monotonic"},
                {"name": "o_custkey", "doc": "fk to customer"},
                {"name": "no_such_field", "doc": "dropped"},
            ],
        },
        {
            "namespace": "main",
            "source": "customer",
            "category": "crm",
            "fields": [{"name": "c_custkey", "note": "pk"}],
        },
        {"namespace": "main", "source": "ghost_table", "doc": "missing"},
    ],
}


@pytest.fixture
def registry():
    reg = SchemaRegistry()
    reg.register_schema("main", "orders", json.dumps(ORDERS), ("o_orderkey",))
    reg.register_schema("main", "customer", json.dumps(CUSTOMER), ("c_custkey",))
    return reg


def test_apply_two_table_ref_and_read_back(spark, registry):
    ref = SchemaRef(REF, defaults={"category": "uncategorized"})
    summary = apply_schema_ref(registry, ref)
    assert summary["sources_applied"] == 2
    assert summary["fields_applied"] == 3
    assert summary["sources_missing"] == ["main.ghost_table"]
    assert summary["fields_missing"] == ["main.orders.no_such_field"]

    # table-level metadata through the Introspector
    rs = registry.latest_schema_for_source("main", "orders")
    info = Introspector(spark, registry).topic_info(rs.topic)
    assert info["source_meta"]["doc"] == "All orders ever placed"
    assert info["source_meta"]["category"] == "sales"
    assert info["source_meta"]["owner_email"] == "orders-team@example.com"
    assert info["source_meta"]["doc_owner"] == "data-team@example.com"

    # field docs/notes through the element surface (schema's own avro doc
    # is overridden for o_orderkey, attached fresh for o_custkey)
    els = {e["name"]: e for e in info["elements"]}
    assert els["o_orderkey"]["doc"] == "pk"
    assert els["o_orderkey"]["note"] == "monotonic"
    assert els["o_custkey"]["doc"] == "fk to customer"

    # record-level note landed on the record element
    rec = [
        e
        for e in registry.get_schema_elements_by_schema_id(rs.schema_id)
        if e.element_name is None
    ][0]
    assert rec.note == "refreshed nightly"

    # defaults fill omitted keys; explicit entries win
    cust = registry.get_source_metadata("main", "customer")
    assert cust["category"] == "crm"
    ords = registry.get_source_metadata("main", "orders")
    assert ords["category"] == "sales"

    # the avro schema itself is untouched (docs are registry overrides)
    assert json.loads(rs.schema_json)["fields"][0]["doc"] == "avro-level doc"


def test_override_false_preserves_existing(registry):
    registry.set_source_metadata("main", "orders", category="hand-set")
    rs = registry.latest_schema_for_source("main", "orders")
    registry.register_schema_element_note(rs.schema_id, "o_orderkey", "keep me")

    apply_schema_ref(registry, SchemaRef(REF), override=False)
    assert registry.get_source_metadata("main", "orders")["category"] == "hand-set"
    els = {
        e.element_name: e
        for e in registry.get_schema_elements_by_schema_id(rs.schema_id)
    }
    assert els["o_orderkey"].note == "keep me"
    # but empty slots still fill
    assert els["o_custkey"].doc == "fk to customer"
    assert registry.get_source_metadata("main", "orders")["doc"] == (
        "All orders ever placed"
    )


def test_unknown_source_metadata_raises(registry):
    with pytest.raises(KeyError):
        registry.set_source_metadata("main", "nope", doc="x")


def test_generate_apply_roundtrip(registry):
    """generate_schema_ref exports the registry's documentation state;
    applying the export onto a FRESH registry reproduces it exactly
    (avro-level field docs carry over as overrides on the target)."""
    apply_schema_ref(registry, SchemaRef(REF))
    spec = generate_schema_ref(registry, doc_owner="data-team@example.com")

    fresh = SchemaRegistry()
    fresh.register_schema("main", "orders", json.dumps(ORDERS), ("o_orderkey",))
    fresh.register_schema(
        "main", "customer", json.dumps(CUSTOMER), ("c_custkey",)
    )
    summary = apply_schema_ref(fresh, SchemaRef(spec))
    assert summary["sources_missing"] == [] and summary["fields_missing"] == []

    for reg in (registry, fresh):
        assert reg.get_source_metadata("main", "orders")["category"] == "sales"
        rs = reg.latest_schema_for_source("main", "orders")
        els = {
            e.element_name: (e.doc, e.note)
            for e in reg.get_schema_elements_by_schema_id(rs.schema_id)
        }
        assert els["o_orderkey"] == ("pk", "monotonic")
        assert els[None][1] == "refreshed nightly"


def test_list_sources_surfaces_applied_metadata(spark, registry):
    apply_schema_ref(registry, SchemaRef(REF))
    rows = {
        (r.namespace, r.source): (r.category, r.owner_email)
        for r in Introspector(spark, registry).list_sources().collect()
    }
    assert rows[("main", "orders")] == ("sales", "orders-team@example.com")
    assert rows[("main", "customer")][0] == "crm"


def test_schema_ref_metadata_survives_save_load(spark, registry, tmp_path):
    """Bulk-applied docs/notes/meta round-trip through registry
    persistence — a documentation pass must not vanish on restart."""
    apply_schema_ref(registry, SchemaRef(REF))
    path = str(tmp_path / "reg")
    registry.save(spark, path)
    reloaded = SchemaRegistry.load(spark, path)

    assert reloaded.get_source_metadata("main", "orders")["category"] == "sales"
    rs = reloaded.latest_schema_for_source("main", "orders")
    els = {
        e.element_name: e
        for e in reloaded.get_schema_elements_by_schema_id(rs.schema_id)
    }
    assert els["o_orderkey"].doc == "pk"
    assert els["o_orderkey"].note == "monotonic"
    assert els[None].note == "refreshed nightly"
