"""Topic-discovery sources for consumers (S4).

Re-expresses data_pipeline/consumer_source.py:27-265 — the seven
ConsumerSource variants that decide WHICH topics a consumer tails:

- FixedTopics: explicit list
- FixedSchemas: topics of explicit schema ids
- TopicInNamespace / TopicsInSource: registry criteria
- TopicInDataTarget: destination-driven discovery through the registry's
  consumer-group / data-target catalog (consumer_source.py:150-165)
- NewTopicsOnly variants: keep a last-query watermark and return only
  topics created since (consumer_source.py:167-265) — wraps any of the
  above, covering the three New* reference variants

Against a real Kafka source these resolve to a `subscribe` list that the
driver refreshes periodically (S5, streaming/dynamic.py); the registry
queries are tiny catalog lookups.
"""

from __future__ import annotations

import time

from data_pipeline_spark.registry import SchemaRegistry


class ConsumerSource:
    """Base: `get_topics()` returns the current topic list."""

    def __init__(self, registry: SchemaRegistry):
        self.registry = registry

    def get_topics(self) -> list[str]:
        raise NotImplementedError


class FixedTopics(ConsumerSource):
    def __init__(self, registry: SchemaRegistry, *topics: str):
        super().__init__(registry)
        if not topics:
            raise ValueError("at least one topic required")
        self._topics = list(topics)

    def get_topics(self) -> list[str]:
        return list(self._topics)


class FixedSchemas(ConsumerSource):
    """Topics addressed by explicit schema ids (consumer_source.py:75-96)."""

    def __init__(self, registry: SchemaRegistry, *schema_ids: int):
        super().__init__(registry)
        if not schema_ids:
            raise ValueError("at least one schema id required")
        self._schema_ids = list(schema_ids)

    def get_topics(self) -> list[str]:
        return sorted(
            {self.registry.get_schema_by_id(s).topic for s in self._schema_ids}
        )


class TopicsInNamespace(ConsumerSource):
    def __init__(self, registry: SchemaRegistry, namespace: str):
        super().__init__(registry)
        self.namespace = namespace

    def get_topics(self) -> list[str]:
        return self.registry.topics(namespace=self.namespace)


class TopicsInSource(ConsumerSource):
    def __init__(self, registry: SchemaRegistry, namespace: str, source: str):
        super().__init__(registry)
        self.namespace = namespace
        self.source = source

    def get_topics(self) -> list[str]:
        return self.registry.topics(namespace=self.namespace, source=self.source)


class TopicInDataTarget(ConsumerSource):
    """Tail the topics feeding a data target — the destination-driven
    discovery a warehouse connector uses (consumer_source.py:150-165):
    data target -> its consumer groups -> their data sources (namespaces /
    sources) -> topics."""

    def __init__(self, registry: SchemaRegistry, data_target_id: int):
        super().__init__(registry)
        if not data_target_id:
            raise ValueError("data_target_id must be specified")
        self.data_target_id = data_target_id

    def get_topics(self) -> list[str]:
        return self.registry.get_topics_by_data_target_id(self.data_target_id)


class NewTopicsOnly(ConsumerSource):
    """Wrap any source; return only topics registered since the last query
    (the created_after watermark pattern, consumer_source.py:167-265)."""

    def __init__(self, inner: ConsumerSource):
        super().__init__(inner.registry)
        self.inner = inner
        self._seen: set[str] = set()
        self.last_query_at: int | None = None

    def get_topics(self) -> list[str]:
        self.last_query_at = int(time.time())
        current = set(self.inner.get_topics())
        new = sorted(current - self._seen)
        self._seen |= current
        return new
