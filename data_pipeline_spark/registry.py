"""Schema registry — the Schematizer analogue as an in-engine catalog.

The reference talks to an external registry service
(schematizer_clientlib/schematizer.py); messages carry only an int
schema_id.  Here the registry is a driver-side catalog (dict-backed, with
parquet persistence and DataFrame views) holding the same entities:
namespaces / sources / topics / schemas (models/*.py), with the semantics
the rebuild must reproduce:

- register_schema is idempotent: the same (namespace, source, schema) returns
  the existing id (schematizer.py:474-521);
- a compatibility-breaking change creates a NEW topic for the same source
  (schematizer.py:474-521 + compatibility check :1191-1219) — compatibility
  here is avro_codec.fully_compatible;
- topic/source discovery with criteria (namespace, source, created_after)
  (schematizer.py:793-859);
- latest enabled schema per topic (schematizer.py:455-472).

Registry tables are tiny next to the data (thousands of rows vs TBs), so at
scale every registry join is a broadcast; ``topics_df``/``schemas_df`` views
exist precisely to join against streams.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from data_pipeline_spark import avro_codec


@dataclass
class RegisteredSchema:
    schema_id: int
    topic: str
    source: str
    namespace: str
    schema_json: str
    primary_keys: tuple[str, ...]
    contains_pii: bool
    created_at: int  # epoch seconds


@dataclass
class AvroSchemaElement:
    """Per-field schema element with docs/notes
    (models/avro_schema_element.py:41-46): one element for the record
    itself plus one per field, keyed ``record|field`` like the reference.
    ``doc`` comes from the Avro schema's own "doc" attributes; ``note`` is
    user-attached post-registration (models/note.py analogue)."""

    element_id: int
    schema_id: int
    element_type: str  # "record" for the record element, else the field type
    element_name: str | None
    key: str
    doc: str | None
    note: str | None
    created_at: int


@dataclass
class DataTarget:
    """A destination data(messages) are eventually sent to, e.g. a warehouse
    cluster (models/data_target.py:25-37)."""

    data_target_id: int
    name: str
    target_type: str
    destination: str


@dataclass
class ConsumerGroup:
    """A group of consumers sending all messages to one data target
    (models/consumer_group.py:25-38)."""

    consumer_group_id: int
    group_name: str
    data_target_id: int


@dataclass
class ConsumerGroupDataSource:
    """Mapping between a consumer group and a data source — a namespace or
    a (namespace, source) pair (models/consumer_group_data_source.py:25-42;
    the reference keys sources by int id, this catalog keys them by name)."""

    consumer_group_data_source_id: int
    consumer_group_id: int
    data_source_type: str  # "NAMESPACE" | "SOURCE"
    namespace: str
    source: str | None = None  # required when data_source_type == "SOURCE"


@dataclass
class SchemaRegistry:
    """In-engine schema registry with reference-parity registration rules."""

    _schemas: dict[int, RegisteredSchema] = field(default_factory=dict)
    _topic_versions: dict[tuple[str, str], int] = field(default_factory=dict)
    _next_id: int = 1
    _data_targets: dict[int, DataTarget] = field(default_factory=dict)
    _consumer_groups: dict[int, ConsumerGroup] = field(default_factory=dict)
    _cg_data_sources: dict[int, ConsumerGroupDataSource] = field(
        default_factory=dict
    )
    _next_dt_id: int = 1
    _next_cg_id: int = 1
    _next_cgds_id: int = 1
    # (schema_id, element key) -> user note; elements themselves are derived
    # from the schema JSON, so only the mutable notes need storage
    _element_notes: dict[tuple[int, str], str] = field(default_factory=dict)
    # (schema_id, element key) -> doc OVERRIDE: the Avro "doc" attribute is
    # immutable once registered, but schema-ref bulk specs attach/update
    # docs post-registration (tools/schema_ref.py:23-76 semantics)
    _element_docs: dict[tuple[int, str], str] = field(default_factory=dict)
    # (namespace, source) -> table-level documentation metadata
    # (doc/note/category/owner_email/file_display/file_url)
    _source_meta: dict[tuple[str, str], dict] = field(default_factory=dict)

    # -- registration -------------------------------------------------------

    def register_schema(
        self,
        namespace: str,
        source: str,
        schema_json: str | dict,
        primary_keys: tuple[str, ...] = (),
        contains_pii: bool = False,
    ) -> RegisteredSchema:
        """Idempotently register; breaking changes roll the topic version."""
        canonical = json.dumps(avro_codec.parse_schema(schema_json), sort_keys=True)
        for rs in self._schemas.values():
            if (
                rs.namespace == namespace
                and rs.source == source
                and rs.schema_json == canonical
            ):
                return rs  # idempotent re-registration

        key = (namespace, source)
        version = self._topic_versions.get(key, 1)
        # FULL_TRANSITIVE gate: a topic's consumers may hold ANY schema ever
        # registered on it as their reader schema, so the newcomer must be
        # fully compatible with every schema on the current topic — checking
        # only the latest admits A->B->C chains where each hop passes but
        # A<->C cannot resolve, and an A-reader then gets garbage from
        # C-written messages.
        topic = f"{namespace}.{source}.v{version}"
        peers = [rs for rs in self._schemas.values() if rs.topic == topic]
        if peers and not all(
            avro_codec.fully_compatible(rs.schema_json, canonical) for rs in peers
        ):
            version += 1  # breaking change => new topic
            self._topic_versions[key] = version
        else:
            self._topic_versions.setdefault(key, version)

        rs = RegisteredSchema(
            schema_id=self._next_id,
            topic=f"{namespace}.{source}.v{version}",
            source=source,
            namespace=namespace,
            schema_json=canonical,
            primary_keys=tuple(primary_keys),
            contains_pii=contains_pii,
            created_at=int(time.time()),
        )
        self._schemas[rs.schema_id] = rs
        self._next_id += 1
        return rs

    # -- lookups (schematizer.py:116-139 cached get_schema_by_id etc.) ------

    def get_schema_by_id(self, schema_id: int) -> RegisteredSchema:
        return self._schemas[schema_id]

    def latest_schema_for_topic(self, topic: str) -> RegisteredSchema | None:
        matches = [rs for rs in self._schemas.values() if rs.topic == topic]
        return max(matches, key=lambda rs: rs.schema_id) if matches else None

    def latest_schema_for_source(
        self, namespace: str, source: str
    ) -> RegisteredSchema | None:
        matches = [
            rs
            for rs in self._schemas.values()
            if rs.namespace == namespace and rs.source == source
        ]
        return max(matches, key=lambda rs: rs.schema_id) if matches else None

    def topics(
        self,
        namespace: str | None = None,
        source: str | None = None,
        created_after: int | None = None,
        filter_func=None,
    ) -> list[str]:
        """Topic discovery with criteria (consumer_source.py:27-265).

        ``filter_func`` is the user-defined predicate over the registered
        schema (TopicFilter.filter_func, base_consumer.py:950-976) —
        called with each RegisteredSchema; keep topics where any schema
        passes."""
        seen: dict[str, int] = {}
        for rs in self._schemas.values():
            if namespace is not None and rs.namespace != namespace:
                continue
            if source is not None and rs.source != source:
                continue
            if created_after is not None and rs.created_at < created_after:
                continue
            if filter_func is not None and not filter_func(rs):
                continue
            seen[rs.topic] = max(seen.get(rs.topic, 0), rs.created_at)
        return sorted(seen)

    def topics_with_primary_keys(self) -> list[str]:
        """Topics whose latest schema declares primary keys
        (schematizer.py:1221-1242) — the compaction-eligible set."""
        out = []
        for topic in self.topics():
            latest = self.latest_schema_for_topic(topic)
            if latest and latest.primary_keys:
                out.append(topic)
        return out

    # -- data targets / consumer groups (schematizer.py:861-1190) -----------

    def create_data_target(
        self, name: str, target_type: str, destination: str
    ) -> DataTarget:
        """Idempotent by name (schematizer.py:861-880 create_data_target)."""
        for dt in self._data_targets.values():
            if dt.name == name:
                if (dt.target_type, dt.destination) != (target_type, destination):
                    raise ValueError(
                        f"data target {name!r} exists with different attributes"
                    )
                return dt
        dt = DataTarget(self._next_dt_id, name, target_type, destination)
        self._data_targets[dt.data_target_id] = dt
        self._next_dt_id += 1
        return dt

    def get_data_target_by_id(self, data_target_id: int) -> DataTarget:
        return self._data_targets[data_target_id]

    def get_data_target_by_name(self, name: str) -> DataTarget:
        for dt in self._data_targets.values():
            if dt.name == name:
                return dt
        raise KeyError(f"unknown data target {name!r}")

    def create_consumer_group(
        self, group_name: str, data_target_id: int
    ) -> ConsumerGroup:
        if data_target_id not in self._data_targets:
            raise KeyError(f"unknown data target id {data_target_id}")
        for cg in self._consumer_groups.values():
            if cg.group_name == group_name:
                if cg.data_target_id != data_target_id:
                    raise ValueError(
                        f"consumer group {group_name!r} exists on another target"
                    )
                return cg
        cg = ConsumerGroup(self._next_cg_id, group_name, data_target_id)
        self._consumer_groups[cg.consumer_group_id] = cg
        self._next_cg_id += 1
        return cg

    def get_consumer_group_by_id(self, consumer_group_id: int) -> ConsumerGroup:
        return self._consumer_groups[consumer_group_id]

    def create_consumer_group_data_source(
        self,
        consumer_group_id: int,
        data_source_type: str,
        namespace: str,
        source: str | None = None,
    ) -> ConsumerGroupDataSource:
        """Attach a namespace or source to a group (schematizer.py:1157-1190)."""
        if consumer_group_id not in self._consumer_groups:
            raise KeyError(f"unknown consumer group id {consumer_group_id}")
        if data_source_type not in ("NAMESPACE", "SOURCE"):
            raise ValueError(f"invalid data_source_type {data_source_type!r}")
        if data_source_type == "SOURCE" and source is None:
            raise ValueError("SOURCE data source requires a source name")
        for ds in self._cg_data_sources.values():
            if (
                ds.consumer_group_id == consumer_group_id
                and ds.data_source_type == data_source_type
                and ds.namespace == namespace
                and ds.source == source
            ):
                return ds
        ds = ConsumerGroupDataSource(
            self._next_cgds_id,
            consumer_group_id,
            data_source_type,
            namespace,
            source,
        )
        self._cg_data_sources[ds.consumer_group_data_source_id] = ds
        self._next_cgds_id += 1
        return ds

    def get_topics_by_data_target_id(
        self, data_target_id: int, created_after: int | None = None
    ) -> list[str]:
        """Union of topics under every data source of every consumer group
        attached to the target (schematizer.py:960-979) — the discovery a
        warehouse destination uses to decide what to tail."""
        if data_target_id not in self._data_targets:
            raise KeyError(f"unknown data target id {data_target_id}")
        groups = [
            cg.consumer_group_id
            for cg in self._consumer_groups.values()
            if cg.data_target_id == data_target_id
        ]
        out: set[str] = set()
        for ds in self._cg_data_sources.values():
            if ds.consumer_group_id not in groups:
                continue
            out.update(
                self.topics(
                    namespace=ds.namespace,
                    source=ds.source,  # None for NAMESPACE-wide sources
                    created_after=created_after,
                )
            )
        return sorted(out)

    # -- schema elements (schematizer.py:141-163; per-field docs/notes) -----

    @staticmethod
    def _element_type_str(t: object) -> str:
        if isinstance(t, str):
            return t
        if isinstance(t, list):  # union
            return "union[" + ",".join(
                SchemaRegistry._element_type_str(b) for b in t
            ) + "]"
        if isinstance(t, dict):
            return str(t.get("type"))
        return str(t)

    def get_schema_elements_by_schema_id(
        self, schema_id: int
    ) -> list[AvroSchemaElement]:
        """One element for the record plus one per field, with the Avro
        "doc" strings and any user notes attached via
        ``register_schema_element_note``."""
        rs = self.get_schema_by_id(schema_id)
        schema = json.loads(rs.schema_json)
        record = schema.get("name", "record")
        elements = [
            AvroSchemaElement(
                element_id=schema_id * 1000,
                schema_id=schema_id,
                element_type="record",
                element_name=None,
                key=record,
                doc=self._element_docs.get(
                    (schema_id, record), schema.get("doc")
                ),
                note=self._element_notes.get((schema_id, record)),
                created_at=rs.created_at,
            )
        ]
        for i, f in enumerate(schema.get("fields", ()), start=1):
            key = f"{record}|{f['name']}"
            elements.append(
                AvroSchemaElement(
                    element_id=schema_id * 1000 + i,
                    schema_id=schema_id,
                    element_type=self._element_type_str(f.get("type")),
                    element_name=f["name"],
                    key=key,
                    doc=self._element_docs.get((schema_id, key), f.get("doc")),
                    note=self._element_notes.get((schema_id, key)),
                    created_at=rs.created_at,
                )
            )
        return elements

    def register_schema_element_note(
        self, schema_id: int, element_name: str | None, note: str
    ) -> None:
        """Attach/replace a user note on an element (None = the record)."""
        rs = self.get_schema_by_id(schema_id)
        record = json.loads(rs.schema_json).get("name", "record")
        key = record if element_name is None else f"{record}|{element_name}"
        known = {e.key for e in self.get_schema_elements_by_schema_id(schema_id)}
        if key not in known:
            raise KeyError(
                f"schema {schema_id} has no element {element_name!r}"
            )
        self._element_notes[(schema_id, key)] = note

    def register_schema_element_doc(
        self, schema_id: int, element_name: str | None, doc: str
    ) -> None:
        """Attach/replace a doc override on an element (None = the
        record).  The Avro schema's own "doc" attribute stays untouched
        (schemas are immutable once registered); reads through
        ``get_schema_elements_by_schema_id`` see the override."""
        rs = self.get_schema_by_id(schema_id)
        record = json.loads(rs.schema_json).get("name", "record")
        key = record if element_name is None else f"{record}|{element_name}"
        known = {e.key for e in self.get_schema_elements_by_schema_id(schema_id)}
        if key not in known:
            raise KeyError(
                f"schema {schema_id} has no element {element_name!r}"
            )
        self._element_docs[(schema_id, key)] = doc

    # -- source-level documentation metadata --------------------------------

    def set_source_metadata(
        self, namespace: str, source: str, **attrs: str | bool | None
    ) -> None:
        """Attach/update table-level documentation attributes (doc, note,
        category, owner_email, file_display, file_url) on a registered
        source.  None values are ignored; repeated calls merge."""
        if self.latest_schema_for_source(namespace, source) is None:
            raise KeyError(f"unknown source {namespace}.{source}")
        meta = self._source_meta.setdefault((namespace, source), {})
        meta.update({k: v for k, v in attrs.items() if v is not None})

    def get_source_metadata(self, namespace: str, source: str) -> dict:
        return dict(self._source_meta.get((namespace, source), {}))

    # -- DataFrame views (broadcastable catalog dimensions) -----------------

    SCHEMA_VIEW_TYPE = T.StructType(
        [
            T.StructField("schema_id", T.IntegerType()),
            T.StructField("topic", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("namespace", T.StringType()),
            T.StructField("schema_json", T.StringType()),
            T.StructField("primary_keys", T.ArrayType(T.StringType())),
            T.StructField("contains_pii", T.BooleanType()),
            T.StructField("created_at", T.LongType()),
        ]
    )

    ELEMENT_VIEW_TYPE = T.StructType(
        [
            T.StructField("element_id", T.LongType()),
            T.StructField("schema_id", T.IntegerType()),
            T.StructField("element_type", T.StringType()),
            T.StructField("element_name", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("doc", T.StringType()),
            T.StructField("note", T.StringType()),
            T.StructField("created_at", T.LongType()),
        ]
    )

    def schema_elements_df(self, spark: SparkSession) -> DataFrame:
        """Per-field schema elements as a broadcastable catalog dimension
        (join streams on schema_id to surface field docs/notes)."""
        rows = [
            (
                e.element_id,
                e.schema_id,
                e.element_type,
                e.element_name,
                e.key,
                e.doc,
                e.note,
                e.created_at,
            )
            for sid in self._schemas
            for e in self.get_schema_elements_by_schema_id(sid)
        ]
        return spark.createDataFrame(rows, self.ELEMENT_VIEW_TYPE)

    def schemas_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                rs.schema_id,
                rs.topic,
                rs.source,
                rs.namespace,
                rs.schema_json,
                list(rs.primary_keys),
                rs.contains_pii,
                rs.created_at,
            )
            for rs in self._schemas.values()
        ]
        return spark.createDataFrame(rows, self.SCHEMA_VIEW_TYPE)

    # -- persistence --------------------------------------------------------

    def save(self, spark: SparkSession, path: str) -> None:
        self.schemas_df(spark).coalesce(1).write.mode("overwrite").parquet(path)
        # data-target/consumer-group catalog: a handful of driver-side rows,
        # so a JSON sidecar beats three more parquet datasets
        catalog = {
            "data_targets": [vars(dt) for dt in self._data_targets.values()],
            "consumer_groups": [vars(cg) for cg in self._consumer_groups.values()],
            "cg_data_sources": [vars(ds) for ds in self._cg_data_sources.values()],
            "element_notes": [
                {"schema_id": sid, "key": key, "note": note}
                for (sid, key), note in self._element_notes.items()
            ],
            "element_docs": [
                {"schema_id": sid, "key": key, "doc": doc}
                for (sid, key), doc in self._element_docs.items()
            ],
            "source_meta": [
                {"namespace": ns, "source": src, "meta": meta}
                for (ns, src), meta in self._source_meta.items()
            ],
        }
        with open(path.rstrip("/") + "__catalog.json", "w") as f:
            json.dump(catalog, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SchemaRegistry":
        reg = cls()
        if not os.path.exists(path):
            return reg
        for r in spark.read.parquet(path).collect():
            rs = RegisteredSchema(
                schema_id=r.schema_id,
                topic=r.topic,
                source=r.source,
                namespace=r.namespace,
                schema_json=r.schema_json,
                primary_keys=tuple(r.primary_keys),
                contains_pii=r.contains_pii,
                created_at=r.created_at,
            )
            reg._schemas[rs.schema_id] = rs
            reg._next_id = max(reg._next_id, rs.schema_id + 1)
            ns_src = (rs.namespace, rs.source)
            ver = int(rs.topic.rsplit(".v", 1)[-1])
            reg._topic_versions[ns_src] = max(
                reg._topic_versions.get(ns_src, 1), ver
            )
        sidecar = path.rstrip("/") + "__catalog.json"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                catalog = json.load(f)
            for d in catalog.get("data_targets", ()):
                dt = DataTarget(**d)
                reg._data_targets[dt.data_target_id] = dt
                reg._next_dt_id = max(reg._next_dt_id, dt.data_target_id + 1)
            for d in catalog.get("consumer_groups", ()):
                cg = ConsumerGroup(**d)
                reg._consumer_groups[cg.consumer_group_id] = cg
                reg._next_cg_id = max(reg._next_cg_id, cg.consumer_group_id + 1)
            for d in catalog.get("cg_data_sources", ()):
                ds = ConsumerGroupDataSource(**d)
                reg._cg_data_sources[ds.consumer_group_data_source_id] = ds
                reg._next_cgds_id = max(
                    reg._next_cgds_id, ds.consumer_group_data_source_id + 1
                )
            for d in catalog.get("element_notes", ()):
                reg._element_notes[(d["schema_id"], d["key"])] = d["note"]
            for d in catalog.get("element_docs", ()):
                reg._element_docs[(d["schema_id"], d["key"])] = d["doc"]
            for d in catalog.get("source_meta", ()):
                reg._source_meta[(d["namespace"], d["source"])] = d["meta"]
        return reg
