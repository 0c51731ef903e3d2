"""Independent SQL re-derivation of edge-date extraction from RAW text.

The replay oracle (kgspark/oracle.py) and the kg_* DuckDB oracles verify
everything DOWNSTREAM of extraction against independent re-derivations,
but date parsing itself (textcore.parse_dates — the deterministic analog
of prompts/extract_edge_dates.py) is shared code between the Spark UDFs
and those oracles. This test closes that link: DuckDB re-parses every
dated storyline sentence of the synthetic corpus from the RAW page text
(regexp + make_timestamp — none of textcore's code), and the re-derived
valid_at/invalid_at must match the Spark-extracted triples row for row.

Covers all six absolute "since" surface forms (long, slash Y/M/D, dotted
D.M.Y, month-year -> first of month, ISO, bare year -> January 1st), the
from-to span, and the "N days/weeks/months/years ago" relative phrases
(resolved against the page's warc_ts) — each asserted NON-VACUOUS (the
corpus must actually contain every form).
"""

from __future__ import annotations

import duckdb
import pytest

from kgspark import udfs
from kgspark.datagen import pages_pandas

_MONTHS_SQL = ("['january','february','march','april','may','june','july',"
               "'august','september','october','november','december']")


def _month_no(expr: str) -> str:
    return f"list_position({_MONTHS_SQL}, lower({expr}))"


# one CASE over the six absolute forms; `d` is the raw date substring
def _abs_parse(d: str) -> str:
    return f"""CASE
      WHEN regexp_matches({d}, '^[A-Za-z]+ \\d{{1,2}}, \\d{{4}}$') THEN
        make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                       {_month_no(f"regexp_extract({d}, '^([A-Za-z]+)', 1)")},
                       CAST(regexp_extract({d}, ' (\\d{{1,2}}),', 1) AS INT),
                       0, 0, 0)
      WHEN regexp_matches({d}, '^\\d{{4}}/\\d{{2}}/\\d{{2}}$')
        THEN strptime({d}, '%Y/%m/%d')
      WHEN regexp_matches({d}, '^\\d{{1,2}}\\.\\d{{1,2}}\\.\\d{{4}}$') THEN
        make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                       CAST(regexp_extract({d}, '^\\d{{1,2}}\\.(\\d{{1,2}})', 1) AS INT),
                       CAST(regexp_extract({d}, '^(\\d{{1,2}})', 1) AS INT),
                       0, 0, 0)
      WHEN regexp_matches({d}, '^[A-Za-z]+ \\d{{4}}$') THEN
        make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                       {_month_no(f"regexp_extract({d}, '^([A-Za-z]+)', 1)")},
                       1, 0, 0, 0)
      WHEN regexp_matches({d}, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
        THEN strptime({d}, '%Y-%m-%d')
      WHEN regexp_matches({d}, '^(19|20)\\d{{2}}$')
        THEN make_timestamp(CAST({d} AS INT), 1, 1, 0, 0, 0)
    END"""


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pages_pandas(4000)
    triples = udfs.extract_triples(spark.createDataFrame(pdf)).toPandas()
    con = duckdb.connect()
    con.register("pages", pdf[pdf["source"] == "text"][
        ["url", "warc_ts", "text"]])
    con.register("triples", triples)
    con.execute(f"""
        CREATE VIEW lines AS
        SELECT url, warc_ts, unnest(string_split(text, chr(10))) AS line
        FROM pages""")
    return con


def _check(con, sql: str, form_counts: dict[str, int] | None = None):
    """sql must yield (url, line, want_valid, want_invalid, form). Joins
    each re-derived line to its Spark triple (fact == the raw line) and
    asserts dates match row for row; returns the per-form counts."""
    rows = con.execute(f"""
        WITH want AS ({sql})
        SELECT w.form,
               count(*) AS n,
               sum(CASE WHEN t.url IS NULL THEN 1 ELSE 0 END) AS missing,
               sum(CASE WHEN t.url IS NOT NULL AND (
                     t.valid_at_explicit IS DISTINCT FROM w.want_valid
                     OR t.invalid_at_explicit IS DISTINCT FROM w.want_invalid
                     OR NOT t.explicit_dates) THEN 1 ELSE 0 END) AS wrong
        FROM want w LEFT JOIN triples t
          ON t.url = w.url AND t.fact = w.line
        GROUP BY w.form ORDER BY w.form""").fetchall()
    got = {}
    for form, n, missing, wrong in rows:
        assert missing == 0, f"{form}: {missing}/{n} lines with no triple"
        assert wrong == 0, f"{form}: {wrong}/{n} triples with wrong dates"
        got[form] = n
    return got


def test_since_forms_rederived_in_sql(corpus):
    d = "regexp_extract(line, ' since (.*)\\.$', 1)"
    counts = _check(corpus, f"""
        SELECT url, line,
               {_abs_parse(d)} AS want_valid,
               CAST(NULL AS TIMESTAMP) AS want_invalid,
               CASE
                 WHEN regexp_matches({d}, '^[A-Za-z]+ \\d{{1,2}}, \\d{{4}}$') THEN 'long'
                 WHEN regexp_matches({d}, '^\\d{{4}}/\\d{{2}}/\\d{{2}}$') THEN 'slash'
                 WHEN regexp_matches({d}, '^\\d{{1,2}}\\.\\d{{1,2}}\\.\\d{{4}}$') THEN 'dot'
                 WHEN regexp_matches({d}, '^[A-Za-z]+ \\d{{4}}$') THEN 'month_year'
                 WHEN regexp_matches({d}, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$') THEN 'iso'
                 WHEN regexp_matches({d}, '^(19|20)\\d{{2}}$') THEN 'bare_year'
               END AS form
        FROM lines
        WHERE regexp_matches(line, ' works for .* since .*\\.$')""")
    # every one of the six surface forms must be present AND green
    assert set(counts) == {"long", "slash", "dot", "month_year", "iso",
                           "bare_year"}, counts
    assert all(n > 0 for n in counts.values()), counts


def test_from_to_span_rederived_in_sql(corpus):
    v = "regexp_extract(line, ' from (.*) to ', 1)"
    iv = "regexp_extract(line, ' to (.*)\\.$', 1)"
    counts = _check(corpus, f"""
        SELECT url, line,
               {_abs_parse(v)} AS want_valid,
               {_abs_parse(iv)} AS want_invalid,
               'from_to' AS form
        FROM lines
        WHERE regexp_matches(line, ' from [A-Za-z]+ \\d{{1,2}}, \\d{{4}} to ')""")
    assert counts.get("from_to", 0) > 0, counts


def test_relative_phrases_rederived_in_sql(corpus):
    # "N days/weeks/months/years ago" resolves against the page's crawl
    # day at the flat 1/7/30/365-day convention — re-derived here from
    # warc_ts arithmetic, independent of textcore
    counts = _check(corpus, """
        SELECT url, line,
               date_trunc('day', warc_ts)
                 - to_days(CAST(regexp_extract(line, ' (\\d{1,3}) [a-z]+ ago\\.$', 1) AS INT)
                           * CASE regexp_extract(line, ' \\d{1,3} ([a-z])[a-z]* ago\\.$', 1)
                               WHEN 'd' THEN 1 WHEN 'w' THEN 7
                               WHEN 'm' THEN 30 WHEN 'y' THEN 365 END)
                 AS want_valid,
               CAST(NULL AS TIMESTAMP) AS want_invalid,
               regexp_extract(line, ' \\d{1,3} ([a-z]+) ago\\.$', 1) AS form
        FROM lines
        WHERE regexp_matches(line, ' \\d{1,3} (days?|weeks?|months?|years?) ago\\.$')""")
    units = {f.rstrip("s") for f in counts}
    assert units == {"day", "week", "month", "year"}, counts


def test_ordinal_and_dmy_forms_rederived_in_sql(spark):
    """r4 session-5 grammar breadth: ordinal long ("March 5th, 2024") and
    day-first textual ("5 March 2024"). The default datagen corpus stays
    WITHOUT these forms on purpose (its byte-identity pins 14 scaling
    campaigns' edge counts), so this test builds its own corpus and
    re-derives the dates in DuckDB regexp + make_timestamp — none of
    textcore's code — exactly like the six-form test above."""
    import pandas as pd

    months = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November",
              "December"]
    rows = []
    i = 0
    for year in (1999, 2007, 2019, 2024):
        for month in (1, 3, 11, 12):
            for day in (1, 2, 3, 11, 13, 21, 22, 23, 30):
                sfx = ("th" if 11 <= day <= 13
                       else {1: "st", 2: "nd", 3: "rd"}.get(day % 10, "th"))
                forms = [f"{months[month - 1]} {day}{sfx}, {year}",
                         f"{day} {months[month - 1]} {year}"]
                for text_date in forms:
                    rows.append({
                        "url": f"https://example.org/d{i}",
                        "group_id": "gdates",
                        "warc_ts": pd.Timestamp("2025-02-01"),
                        "text": ("Alice Cooper works for GlowCo "
                                 f"since {text_date}."),
                    })
                    i += 1
    pdf = pd.DataFrame(rows)
    triples = udfs.extract_triples(spark.createDataFrame(pdf)).toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    con.register("triples", triples)
    con.execute("""
        CREATE VIEW lines AS
        SELECT url, warc_ts, unnest(string_split(text, chr(10))) AS line
        FROM pages""")
    d = "regexp_extract(line, ' since (.*)\\.$', 1)"
    ord_month = _month_no(f"regexp_extract({d}, '^([A-Za-z]+)', 1)")
    dmy_month_re = r"'^\d{1,2} ([A-Za-z]+)'"
    dmy_month = _month_no(f"regexp_extract({d}, {dmy_month_re}, 1)")
    counts = _check(con, f"""
        SELECT url, line,
          CASE
            WHEN regexp_matches({d}, '^[A-Za-z]+ \\d{{1,2}}(st|nd|rd|th), \\d{{4}}$') THEN
              make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                             {ord_month},
                             CAST(regexp_extract({d}, ' (\\d{{1,2}})(st|nd|rd|th),', 1) AS INT),
                             0, 0, 0)
            WHEN regexp_matches({d}, '^\\d{{1,2}} [A-Za-z]+ \\d{{4}}$') THEN
              make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                             {dmy_month},
                             CAST(regexp_extract({d}, '^(\\d{{1,2}})', 1) AS INT),
                             0, 0, 0)
          END AS want_valid,
          CAST(NULL AS TIMESTAMP) AS want_invalid,
          CASE
            WHEN regexp_matches({d}, '^[A-Za-z]+ \\d{{1,2}}(st|nd|rd|th), \\d{{4}}$')
              THEN 'ordinal'
            WHEN regexp_matches({d}, '^\\d{{1,2}} [A-Za-z]+ \\d{{4}}$') THEN 'dmy'
          END AS form
        FROM lines
        WHERE regexp_matches(line, ' works for .* since .*\\.$')""")
    assert set(counts) == {"ordinal", "dmy"}, counts
    assert all(n == len(rows) / 2 for n in counts.values()), counts


def test_quarter_and_eml_forms_rederived_in_sql(spark):
    """r5 long-tail: quarters ("Q2 2024" -> first day of the quarter) and
    "early/mid/late YYYY" (-> Jan 1 / Jul 1 / Oct 1). Dedicated corpus
    (the default datagen corpus stays byte-identical for the pinned
    scaling campaigns); dates re-derived in DuckDB arithmetic — none of
    textcore's code — like the ordinal/dmy test above. Every (form x
    capitalization) variant is asserted non-vacuous."""
    import pandas as pd

    rows = []
    i = 0
    for year in (1999, 2007, 2019, 2024):
        for text_date in ([f"Q{q} {year}" for q in (1, 2, 3, 4)]
                          + [f"{lab} {year}"
                             for lab in ("early", "Early", "mid", "Mid",
                                         "late", "Late")]):
            rows.append({
                "url": f"https://example.org/q{i}",
                "group_id": "gq",
                "warc_ts": pd.Timestamp("2025-02-01"),
                "text": ("Alice Cooper works for GlowCo "
                         f"since {text_date}."),
            })
            i += 1
    pdf = pd.DataFrame(rows)
    triples = udfs.extract_triples(spark.createDataFrame(pdf)).toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    con.register("triples", triples)
    con.execute("""
        CREATE VIEW lines AS
        SELECT url, warc_ts, unnest(string_split(text, chr(10))) AS line
        FROM pages""")
    d = "regexp_extract(line, ' since (.*)\\.$', 1)"
    counts = _check(con, f"""
        SELECT url, line,
          CASE
            WHEN regexp_matches({d}, '^Q[1-4] (19|20)\\d{{2}}$') THEN
              make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                             3 * (CAST(regexp_extract({d}, '^Q([1-4])', 1) AS INT) - 1) + 1,
                             1, 0, 0, 0)
            WHEN regexp_matches({d}, '^[EeMmLl]') THEN
              make_timestamp(CAST(regexp_extract({d}, '(\\d{{4}})$', 1) AS INT),
                             CASE lower(regexp_extract({d}, '^([A-Za-z]+)', 1))
                               WHEN 'early' THEN 1 WHEN 'mid' THEN 7
                               WHEN 'late' THEN 10 END,
                             1, 0, 0, 0)
          END AS want_valid,
          CAST(NULL AS TIMESTAMP) AS want_invalid,
          CASE
            WHEN regexp_matches({d}, '^Q[1-4]') THEN 'quarter'
            ELSE lower(regexp_extract({d}, '^([A-Za-z]+)', 1))
          END AS form
        FROM lines
        WHERE regexp_matches(line, ' works for .* since .*\\.$')""")
    assert set(counts) == {"quarter", "early", "mid", "late"}, counts
    assert counts["quarter"] == 16 and all(
        counts[f] == 8 for f in ("early", "mid", "late")), counts
