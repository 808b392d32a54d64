"""Many-to-many closure through an association table (SURVEY §2.4 J3).

The reference loads many-to-many relationships exactly like one-to-many
ones since v0.6.0 (`/root/reference/CHANGES.rst`, selectinload at
`/root/reference/dbcut/query.py:234-235`): root → assoc rows (backref
hop) → far side (many-to-one hop). The harness TPC-H schema has no
association table, so this pins the semantics on a Chinook-shaped
fixture (playlist ⟷ playlist_track ⟷ track, per FIXTURES.md).
"""

import pytest

from dbcut_spark.catalog import Catalog, ForeignKey, TableSpec
from dbcut_spark.operators.closure import ClosureExecutor
from dbcut_spark.plans.extraction import build_plan


def _chinook_catalog() -> Catalog:
    cat = Catalog()
    for name, pk, cols in [
        ("artist", ("id",), ("id", "name")),
        ("album", ("id",), ("id", "title", "artist_id")),
        ("track", ("id",), ("id", "name", "album_id")),
        ("playlist", ("id",), ("id", "name")),
        ("playlist_track", ("id",), ("id", "playlist_id", "track_id")),
    ]:
        cat.tables[name] = TableSpec(name, pk, cols)
    cat.fks += [
        ForeignKey("album", ("artist_id",), "artist", ("id",)),
        ForeignKey("track", ("album_id",), "album", ("id",)),
        ForeignKey("playlist_track", ("playlist_id",), "playlist", ("id",)),
        ForeignKey("playlist_track", ("track_id",), "track", ("id",)),
    ]
    return cat


@pytest.fixture(scope="module")
def chinook(spark):
    frames = {
        "artist": spark.createDataFrame(
            [(1, "beatles"), (2, "miles"), (3, "unreachable")],
            "id long, name string",
        ),
        "album": spark.createDataFrame(
            [(10, "abbey road", 1), (11, "kind of blue", 2), (12, "orphan", 3)],
            "id long, title string, artist_id long",
        ),
        "track": spark.createDataFrame(
            [(100, "come together", 10), (101, "so what", 11), (102, "not on p1", 12)],
            "id long, name string, album_id long",
        ),
        "playlist": spark.createDataFrame(
            [(7, "p1"), (8, "p2")], "id long, name string"
        ),
        "playlist_track": spark.createDataFrame(
            [(1000, 7, 100), (1001, 7, 101), (1002, 8, 102)],
            "id long, playlist_id long, track_id long",
        ),
    }
    return frames


def test_m2m_tree_reaches_far_side(chinook):
    """playlist → ⁿ playlist_track → ¹ track must appear in the tree."""
    plan = build_plan(_chinook_catalog(), {"from": "playlist", "limit": "no"})
    tables = set(plan.tree.root.all_tables())
    assert {"playlist", "playlist_track", "track", "album", "artist"} <= tables
    rendered = plan.tree.render()
    assert "playlist_track" in rendered and "track" in rendered


def test_m2m_closure_restricts_far_side(spark, chinook):
    """Extracting playlist p1 pulls only its assoc rows, their tracks,
    and the tracks' album/artist ancestry — nothing from p2's subgraph."""
    plan = build_plan(
        _chinook_catalog(), {"from": "playlist", "where": {"name": "p1"}, "limit": "no"}
    )
    out = ClosureExecutor(spark, lambda t: chinook[t]).execute(plan)

    got = {t: {r["id"] for r in df.collect()} for t, df in out.items()}
    assert got["playlist"] == {7}
    assert got["playlist_track"] == {1000, 1001}  # only p1's assoc rows
    assert got["track"] == {100, 101}  # far side through the assoc
    assert got["album"] == {10, 11}
    assert got["artist"] == {1, 2}  # artist 3 unreachable from p1


def test_m2m_closure_from_far_side(spark, chinook):
    """The reverse traversal (track roots → assoc backref → playlists)
    also restricts correctly."""
    plan = build_plan(
        _chinook_catalog(),
        {"from": "track", "where": {"name": "so what"}, "limit": "no"},
    )
    out = ClosureExecutor(spark, lambda t: chinook[t]).execute(plan)
    got = {t: {r["id"] for r in df.collect()} for t, df in out.items()}
    assert got["track"] == {101}
    assert got["playlist_track"] == {1001}
    assert got["playlist"] == {7}
