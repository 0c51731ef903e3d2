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

import functools
import re
from dataclasses import dataclass


@functools.lru_cache(maxsize=65536)
def _compiled_extract(template: str, name: str) -> re.Pattern:
    """(template, entity name) -> compiled extraction regex. Web text
    re-mentions the same entities constantly, and the interpreter's own
    512-entry ``re`` cache thrashes once distinct names exceed it — this
    keeps the sre compile out of the Arrow hot loop (bounded: patterns are
    tiny, 64k entries is a few MB per Python worker)."""
    return re.compile(template.replace("{name}", re.escape(name)))


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
    its recurrences become linkable.

    ``extract``: per-attribute VALUE extraction from episode content — the
    deterministic analog of the reference's dynamic-Pydantic-model fill
    (node_operations.py:303-358, prompts/summarize_nodes.py:91-129), where
    the LLM populates each declared field from the episode text. Each entry
    is (attr_name, pattern_template); the template's ``{name}`` placeholder
    is replaced with the re-escaped entity name and capture group 1 is the
    value, e.g. ``("hq", r"{name} is headquartered in ([A-Z][a-zA-Z]+)")``.
    Values found in content OVERRIDE the static ``attributes`` defaults.
    JSON episodes additionally fill declared attribute names directly from
    same-named scalar fields of the payload (the subject entity only)."""
    name: str
    pattern: str | None = None
    suffixes: tuple[str, ...] = ()
    keywords: tuple[str, ...] = ()
    attributes: tuple[tuple[str, str], ...] = ()
    dynamic: bool = False
    extract: tuple[tuple[str, str], ...] = ()

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


def has_extraction(registry: EntityTypeRegistry | None,
                   json_possible: bool = True) -> bool:
    """True when any registered type declares content-extraction work —
    the pipeline skips the attribute aggregation (and the per-page
    ``extract_attributes`` calls in the Arrow UDFs) entirely otherwise.

    Extraction work means pattern templates (``EntityType.extract``), or —
    only when the corpus can contain json episodes (``json_possible``:
    callers pass whether the pages table carries a ``source`` column) — a
    static ``attributes`` schema a JSON payload could fill. Registries
    with static schemas alone on text-only corpora do no content work, so
    gating them out keeps the hot extraction path free of dead stages."""
    if registry is None:
        return False
    return any(t.extract for t in registry.types) or (
        json_possible and any(t.attributes for t in registry.types))


def extract_attributes(registry: EntityTypeRegistry | None, source: str,
                       text: str, mentions) -> dict[str, dict[str, str]]:
    """entity name -> {attr: value} extracted from one episode's content.

    Two deterministic fill rules (node_operations.py:303-358 analog):
    1. pattern templates (``EntityType.extract``) applied to the episode
       text per typed mention — works for every episode source;
    2. JSON episodes: declared attribute names of the SUBJECT entity's type
       are filled from same-named scalar payload fields (the prompt's
       "simple properties are attributes" rule, prompts/extract_nodes.py:131).
    """
    if registry is None:
        return {}
    out: dict[str, dict[str, str]] = {}
    by_label = {t.name: t for t in registry.types}
    for m in mentions:
        t = by_label.get(m.label)
        if t is None or not t.extract:
            continue
        vals = {}
        for attr, template in t.extract:
            rx = _compiled_extract(template, m.name)
            got = rx.search(text)
            if got:
                vals[attr] = got.group(1)
        if vals:
            out.setdefault(m.name, {}).update(vals)
    if source == "json":
        from kgspark.textcore import json_entity_fields, parse_json_episode
        fields = json_entity_fields(text)
        subject = next((v for k, v in fields if k == "name"),
                       next((v for k, v in fields if k.endswith("_name")),
                            None))
        if subject is not None:
            label = next((m.label for m in mentions if m.name == subject),
                         None)
            t = by_label.get(label)
            if t is not None and t.attributes:
                declared = {k for k, _ in t.attributes}
                obj = parse_json_episode(text) or {}
                for k, v in obj.items():
                    if k in declared and isinstance(v, (str, int, float)) \
                            and not isinstance(v, bool):
                        out.setdefault(subject, {})[k] = str(v)
    return out


def make_classifier(registry: EntityTypeRegistry | None):
    """Returns name -> label, registry-first with built-in fallback."""
    from kgspark.textcore import classify_name

    if registry is None:
        return classify_name

    def classify(name: str) -> str:
        return registry.classify(name) or classify_name(name)

    return classify
