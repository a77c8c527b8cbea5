"""COVERAGE.md can't silently drift from the query registry: every
registered driver query must appear in the doc (VERDICT r3 flagged a
stale coverage line; this pins the map to the code)."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_lists_every_registered_query():
    from explorer_spark.queries import QUERIES

    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    # backticked names ONLY: a bare-substring fallback is blind to any
    # name that is a substring of another (q_sample_replace inside
    # q_grouped_sample_replace), silently defeating the sync check
    missing = [n for n in QUERIES if f"`{n}`" not in text]
    assert not missing, f"COVERAGE.md is missing registered queries: {missing}"


def test_coverage_index_has_no_ghost_queries():
    # names listed in the generated index must still exist in the registry
    import re

    from explorer_spark.queries import QUERIES

    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    marker = "## Registered driver queries"
    assert marker in text, "generated query index section was removed"
    section = text.split(marker, 1)[1]
    listed = re.findall(r"^- `(q[\w]*)`", section, flags=re.M)
    ghosts = [n for n in listed if n not in QUERIES]
    assert not ghosts, f"COVERAGE.md lists queries that no longer exist: {ghosts}"
