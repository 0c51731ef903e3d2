"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``(url string, warc_ts timestamp, html binary, text string, lang string,
group_id string)``.

Each page is a pure function of ``(page_index, n_pages, seed)``, so the table
can be generated **distributed** (``spark.range(n).mapInPandas``) with no
driver-side materialization — the same function at any scale, which is how the
bench input reaches 200k+ rows without a single-node bottleneck.

Content embeds known ground truth (FIXTURES.md §1): entity mentions with
full-name vs abbreviated aliases, Zipf-skewed hub entities, CAPS-predicate
relation sentences, explicit/relative/present-tense date phrases,
cross-page contradiction pairs (LIKES→DISLIKES, WORKS_FOR→LEFT_JOB,
LIVES_IN moves — mirroring the reference scenarios in
/root/reference/tests/utils/maintenance/test_temporal_operations_int.py:95-265),
recurring dynamic events (PREVIOUS_INSTANCE chains), and duplicate facts for
provenance-merge tests.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Iterable

import pandas as pd

from kgspark.textcore import html_to_text

SEED = 42
BASE_TS = datetime(2024, 1, 1)

_FIRST = ["Priya", "Rahul", "Alice", "Marco", "Yuki", "Amara", "Diego", "Lena",
          "Omar", "Sofia", "Ivan", "Mei", "Tomas", "Nadia", "Kofi", "Elena"]
_LAST = ["Sharma", "Mehta", "Wong", "Rossi", "Tanaka", "Okafor", "Silva",
         "Fischer", "Hassan", "Garcia", "Petrov", "Chen", "Novak", "Karim"]
_BRAND_A = ["Glow", "Nex", "Vera", "Zen", "Kor", "Lum", "Pix", "Tav", "Mira", "Sol"]
_BRAND_B = ["co", "tra", "lia", "dex", "non", "vis", "ta", "rex", "len", "max"]
_CAMP_A = ["Summer", "Winter", "Spring", "Autumn", "Festive", "Launch", "Prime", "Mega"]
_CAMP_B = ["Glow", "Deal", "Style", "Save", "Fresh", "Boost"]
_CITIES = ["Berlin", "Lagos", "Lima", "Osaka", "Pune", "Quito", "Riga", "Seoul"]
_TEAMS = ["Growth", "Payments", "Search", "Trust", "Creator", "Data"]
_EVENTS = ["Outage", "Incident", "Blocker", "Discrepancy", "Dip"]
_DOMAINS = ["crawl-a.example.org", "crawl-b.example.org", "crawl-c.example.org",
            "crawl-d.example.org", "crawl-e.example.org", "crawl-f.example.org"]
_FILLERS = [
    "the quarterly report shows steady growth in link clicks",
    "engagement metrics improved across all tracked cohorts",
    "the dashboard refresh completed without errors overnight",
    "several new product listings went live this morning",
    "commission payouts were processed on schedule this cycle",
]
_LANGS = ["en"] * 18 + ["es", "de"]  # mostly en, a few non-en rows


def _person(k: int) -> str:
    return f"{_FIRST[k % len(_FIRST)]} {_LAST[(k // len(_FIRST)) % len(_LAST)]}"


def _person_alias(k: int) -> str:
    """Abbreviated alias: 'Priya Sharma' -> 'Priya Sh' (no dot: keeps the
    sentence splitter trivial and deterministic)."""
    full = _person(k)
    first, last = full.split()
    return f"{first} {last[:2]}"


def _brand(k: int) -> str:
    n = len(_BRAND_A) * len(_BRAND_B)
    k = k % n
    return _BRAND_A[k % len(_BRAND_A)] + _BRAND_B[k // len(_BRAND_A)]


def _campaign(k: int) -> str:
    n = len(_CAMP_A) * len(_CAMP_B)
    k = k % n
    return f"{_CAMP_A[k % len(_CAMP_A)]} {_CAMP_B[k // len(_CAMP_A)]} Campaign"


def _city(k: int) -> str:
    return f"{_CITIES[k % len(_CITIES)]} City"


def _team(k: int) -> str:
    return f"{_TEAMS[k % len(_TEAMS)]} Team"


def _zipf(rng: random.Random, n: int) -> int:
    """Zipf-ish index: heavy mass on low ranks -> deliberate hub-entity skew
    (stresses the link join; salting requirement of SURVEY.md §4)."""
    return min(n - 1, int(n * (rng.random() ** 3)))


def _long_date(d: datetime) -> str:
    # portable 'March 5, 2024' (strftime %-d is glibc-only; %d would emit a
    # zero-padded day that _LONG_DATE does not match)
    return f"{d.strftime('%B')} {d.day}, {d.year}"


def _date_str(d: datetime) -> str:
    return d.strftime("%Y-%m-%d")


def _misc_sentences(rng: random.Random, n_people: int, n_brands: int,
                    count: int) -> list[str]:
    s = []
    for _ in range(count):
        kind = rng.randint(0, 4)
        if kind == 0:
            s.append(f"{_brand(_zipf(rng, n_brands))} sponsors {_campaign(rng.randint(0, 40))}")
        elif kind == 1:
            s.append(f"{_person(_zipf(rng, n_people))} participates in {_campaign(rng.randint(0, 40))}")
        elif kind == 2:
            pa, pb = _zipf(rng, n_people), _zipf(rng, n_people)
            if pa != pb:
                s.append(f"{_person(pa)} collaborates with {_person(pb)}")
        elif kind == 3:
            s.append(f"{_person(_zipf(rng, n_people))} manages {_team(rng.randint(0, 5))}")
        else:
            s.append(f"{_campaign(rng.randint(0, 40))} features {_brand(_zipf(rng, n_brands))}")
    return s


def _page_sentences(i: int, n_pages: int, rng: random.Random,
                    richness: int = 1) -> list[str]:
    sid = i // 10          # storyline id: roles r and r+5 share entities
    role = i % 10
    n_people = max(24, n_pages // 20)
    n_brands = max(12, n_pages // 50)
    p = sid % n_people
    b = sid % n_brands
    s: list[str] = []
    story_day = BASE_TS + timedelta(days=(sid % 300))

    if role == 0:
        s.append(f"{_person(p)} likes {_brand(b)}")
    elif role == 5:
        s.append(f"{_person(p)} dislikes {_brand(b)}")
    elif role == 1:
        # rotate the explicit-date surface form (r4 grammar breadth:
        # long, slash Y/M/D, dotted D.M.Y, month-year -> first of month,
        # ISO, bare year -> January 1st); textcore.parse_dates resolves
        # every form, so the storyline's valid_at is format-independent
        # except month-year/bare-year, which snap to the first of the
        # month / January 1st (extract_edge_dates rule 5 analog)
        form = sid % 6
        if form == 0:
            d = _long_date(story_day)
        elif form == 1:
            d = story_day.strftime("%Y/%m/%d")
        elif form == 2:
            d = f"{story_day.day}.{story_day.month:02d}.{story_day.year}"
        elif form == 3:
            d = f"{story_day.strftime('%B')} {story_day.year}"
        elif form == 4:
            d = _date_str(story_day)
        else:
            d = str(story_day.year)
        s.append(f"{_person(p)} works for {_brand(b)} since {d}")
    elif role == 6:
        s.append(f"{_person(p)} no longer works for {_brand(b)}")
    elif role == 2:
        s.append(f"{_person(p)} lives in {_city(sid)}")
    elif role == 7:
        s.append(f"{_person(p)} moved to {_city(sid + 3)}")
    elif role == 3:
        ev = f"{_EVENTS[sid % len(_EVENTS)]} {_date_str(story_day)}"
        s.append(f"{_person(p)} reports {ev}")
    elif role == 8:
        ev = f"{_EVENTS[sid % len(_EVENTS)]} {_date_str(story_day + timedelta(days=35))}"
        s.append(f"{_person(p)} resolves {ev}")
    elif role == 4:
        # restated fact under an alias surface form: exercises entity
        # linking (alias -> canonical endpoint). NOTE: the two surface
        # forms keep distinct norm_fact dedup classes BY DESIGN (dedup
        # class = exact normalized sentence), so this yields two edges on
        # the same canonical pair, not a provenance merge; provenance
        # merging is exercised by verbatim restatements across pages.
        s.append(f"{_person_alias(p)} likes {_brand(b)}")
    else:  # role 9: misc relations over Zipf-skewed hub entities
        s.extend(_misc_sentences(rng, n_people, n_brands, rng.randint(1, 3)))
    # richness > 1 (bench sizing knob): extra relation sentences per page so
    # extraction work per page scales without changing the storyline shape
    if richness > 1:
        s.extend(_misc_sentences(rng, n_people, n_brands, 3 * (richness - 1)))
    # occasional extra explicitly-dated relation: from/to span, or a
    # numeric relative phrase ("N days/weeks/months/years ago", resolved against the
    # page's crawl timestamp by parse_dates)
    if role == 9 and rng.random() < 0.3:
        d0 = BASE_TS + timedelta(days=rng.randint(0, 200))
        if rng.random() < 0.5:
            dated = (f"from {_long_date(d0)} to "
                     f"{_long_date(d0 + timedelta(days=30))}")
        else:
            n = rng.randint(2, 9)
            unit = ("days", "weeks", "months", "years")[rng.randint(0, 3)]
            dated = f"{n} {unit} ago"
        s.append(f"{_campaign(rng.randint(0, 40))} features "
                 f"{_brand(rng.randint(0, n_brands - 1))} {dated}")
    rng.shuffle(s)
    # filler (lowercase: never extracted)
    for _ in range(rng.randint(1, 2)):
        s.append(rng.choice(_FILLERS))
    # speaker-first message form on some pages (prompts/extract_nodes.py:91)
    if rng.random() < 0.25 and s:
        handle = _person(p).lower().replace(" ", "_")
        s[0] = f"{handle}: {s[0]}"
    return s


def _episode_source(i: int) -> str:
    """Deterministic EpisodeType mix (nodes.py:42-75): a fifth of the
    storylines carry structured JSON pages — role 4 (the restatement slot)
    becomes a JSON twin of role 0's text fact (same norm_fact class →
    cross-source provenance MERGE), roles 1/2/5 become JSON replacements
    whose facts contradict/are contradicted by text pages (cross-source
    bi-temporal pairs) — and a third of the misc pages (role 9) arrive as
    speakered chat logs."""
    role, sid = i % 10, i // 10
    if role in (4, 1, 2, 5) and sid % 5 == 2:
        return "json"
    if role == 9 and sid % 3 == 1:
        return "message"
    return "text"


def _json_payload(i: int, n_pages: int) -> str:
    """Flat JSON object restating the page's storyline fact. Relation keys
    lower_snake of the CAPS predicate; 'since' carries the explicit date
    (textcore.JSON_RELATION_KEYS / _JSON_DATE_KEYS_VALID rules). norm_fact
    of the emitted "<subj> <key> <obj>." sentence equals the text page's
    dedup class (underscores normalize to spaces, date phrases strip), so a
    JSON restatement provenance-merges with its text twin."""
    import json as _json

    role, sid = i % 10, i // 10
    n_people = max(24, n_pages // 20)
    n_brands = max(12, n_pages // 50)
    p, b = sid % n_people, sid % n_brands
    story_day = BASE_TS + timedelta(days=(sid % 300))
    obj: dict = {"name": _person(p)}
    if role == 4:
        # JSON twin of role 0's text fact: "<P> likes <B>." lands in the
        # SAME norm_fact dedup class -> cross-source provenance merge
        obj["likes"] = _brand(b)
    elif role == 5:
        obj["dislikes"] = _brand(b)
    elif role == 1:
        obj["works_for"] = _brand(b)
        obj["since"] = _date_str(story_day)
    elif role == 2:
        obj["lives_in"] = _city(sid)
    obj["status"] = "active"
    return _json.dumps(obj)


def _render_json_html(payload: str) -> str:
    # minimal wrapper: html_to_text must yield EXACTLY the payload line
    # (no title/boilerplate), so json extraction parses the text column
    return f"<html><body><p>{payload}</p></body></html>"


def _render_html(sentences: list[str], rng: random.Random) -> str:
    body = "".join(f"<p>{s}.</p>" for s in sentences)
    noise_class = f"c{rng.randint(0, 999)}"
    return (
        "<html><head><title>crawl snapshot</title>"
        f"<style>.{noise_class} {{color: #333;}}</style>"
        "<script>var tracked = 1;</script></head>"
        f"<body class=\"{noise_class}\"><!-- boilerplate -->"
        f"<div id=\"main\">{body}</div>"
        "<p>contact us via q&amp;a &#8212; all rights reserved</p>"
        "</body></html>"
    )


def _warc_ts(i: int) -> datetime:
    ts = BASE_TS + timedelta(minutes=7 * i)
    if i % 17 == 0 and i > 0:
        ts -= timedelta(days=3)  # controlled out-of-order rows (late data)
    return ts


def group_of_domain(domain: str) -> str:
    # stable hash-bucket of the url domain (FIXTURES.md §1 group_id rule);
    # NOT python hash() (randomized across processes)
    import hashlib
    return "g" + str(int(hashlib.md5(domain.encode()).hexdigest(), 16) % 4)


def gen_pages_batch(indices: Iterable[int], n_pages: int, seed: int = SEED,
                    richness: int = 1) -> pd.DataFrame:
    rows = []
    for i in indices:
        rng = random.Random(f"{seed}|page|{i}")
        sid = i // 10
        domain = _DOMAINS[sid % len(_DOMAINS)]
        source = _episode_source(i)
        if source == "json":
            html = _render_json_html(_json_payload(i, n_pages))
        else:
            sentences = _page_sentences(i, n_pages, rng, richness)
            if source == "message":
                # speakered chat log: every line is "handle: sentence"
                n_people = max(24, n_pages // 20)
                handles = [_person(sid % n_people).lower().replace(" ", "_"),
                           _person((sid + 1) % n_people).lower().replace(" ", "_")]
                # strip any pre-existing "handle: " prefix (the 25%
                # speaker-form text rule), then re-prefix every line
                sentences = [f"{handles[j % 2]}: {s.split(': ', 1)[-1]}"
                             for j, s in enumerate(sentences)]
            html = _render_html(sentences, rng)
        rows.append({
            "url": f"https://{domain}/p/{i:08d}",
            "warc_ts": _warc_ts(i),
            "html": html.encode("utf-8"),
            "text": html_to_text(html),
            "lang": _LANGS[rng.randint(0, len(_LANGS) - 1)],
            "group_id": group_of_domain(domain),
            "source": source,
        })
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang",
                                     "group_id", "source"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def pages_pandas(n_pages: int, seed: int = SEED, richness: int = 1) -> pd.DataFrame:
    return gen_pages_batch(range(n_pages), n_pages, seed, richness)


PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string, group_id string, source string")


def pages_spark(spark, n_pages: int, seed: int = SEED, partitions: int | None = None,
                richness: int = 1):
    """Distributed generation: one task generates one index-range slice.

    ``spark.range`` is evenly partitioned, so generation parallelizes to any
    cluster size with zero shuffle; at 10^12-document scale the same shape
    would read the real Iceberg `pages` table instead.
    """
    n_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield gen_pages_batch(pdf["id"].tolist(), n_pages, seed, richness)

    return spark.range(0, n_pages, numPartitions=n_parts).mapInPandas(gen, PAGES_DDL)
