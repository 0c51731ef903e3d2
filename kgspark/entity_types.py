"""Pluggable entity-type registry (custom types + attribute schemas).

Analog of the reference's ``add_episode(entity_types={...})`` surface
(/root/reference/graphiti_core/graphiti.py:199, entity classification +
dynamic Pydantic attribute models at
utils/maintenance/node_operations.py:206-234,338-341): the caller registers
named types with deterministic match rules and a static attribute schema;
classification consults the registry FIRST, then falls back to the built-in
classifier (kgspark/textcore.classify_name).

Registries are plain frozen dataclasses → picklable, so the same registry
object drives the Arrow extraction UDFs on executors and any driver-side
checks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class EntityType:
    """One custom entity type.

    Match rules (checked in order): full-name regex ``pattern``, last-token
    ``suffixes``, first-token ``keywords``. ``attributes`` is the static
    attribute schema stamped onto nodes of this type (the deterministic
    analog of the reference's per-type Pydantic model fields).

    ``dynamic``: mark True for event-like types whose instances must NEVER
    merge in entity linking and instead chain via PREVIOUS_INSTANCE —
    the custom-type analog of the built-in DynamicEvent never-merge
    invariant (node_operations.py:56-64,379-394). A registry type that
    shadows names the built-in classifier would call DynamicEvent (e.g.
    keyword 'Outage' over 'Outage 2024-01-05') should set this, otherwise
    its recurrences become linkable."""
    name: str
    pattern: str | None = None
    suffixes: tuple[str, ...] = ()
    keywords: tuple[str, ...] = ()
    attributes: tuple[tuple[str, str], ...] = ()
    dynamic: bool = False

    def matches(self, entity_name: str) -> bool:
        toks = entity_name.split()
        if self.pattern and re.fullmatch(self.pattern, entity_name):
            return True
        if toks and toks[-1] in self.suffixes:
            return True
        if toks and toks[0] in self.keywords:
            return True
        return False


@dataclass(frozen=True)
class EntityTypeRegistry:
    types: tuple[EntityType, ...] = ()

    def classify(self, entity_name: str) -> str | None:
        for t in self.types:
            if t.matches(entity_name):
                return t.name
        return None

    def attributes_for(self, label: str) -> dict[str, str]:
        for t in self.types:
            if t.name == label:
                return dict(t.attributes)
        return {}

    def dynamic_labels(self) -> frozenset[str]:
        """All labels whose instances never merge in linking: the built-in
        DynamicEvent plus every registered type with dynamic=True."""
        return frozenset({"DynamicEvent"}
                         | {t.name for t in self.types if t.dynamic})


def dynamic_labels(registry: EntityTypeRegistry | None) -> frozenset[str]:
    return registry.dynamic_labels() if registry is not None \
        else frozenset({"DynamicEvent"})


def make_classifier(registry: EntityTypeRegistry | None):
    """Returns name -> label, registry-first with built-in fallback."""
    from kgspark.textcore import classify_name

    if registry is None:
        return classify_name

    def classify(name: str) -> str:
        return registry.classify(name) or classify_name(name)

    return classify
