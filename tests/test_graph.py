from dbcut_spark.catalog import TPCH_CATALOG, synthesize_pk
from dbcut_spark.config import normalize_query
from dbcut_spark.graph import Direction, build_relation_tree, relationships_of


def test_relationships_manytoone_first():
    rels = relationships_of(TPCH_CATALOG, "customer")
    assert rels[0].direction is Direction.MANYTOONE
    assert rels[0].target == "nation"
    targets = {r.target for r in rels}
    assert targets == {"nation", "orders", "events"}


def test_tree_depths():
    tree = build_relation_tree(
        TPCH_CATALOG, "customer", join_depth=3, backref_depth=2,
        exclude=["events", "part", "supplier"],
    )
    tables = tree.root.all_tables()
    assert tables == ["customer", "nation", "orders", "region", "lineitem"]


def test_tree_depth_zero():
    tree = build_relation_tree(TPCH_CATALOG, "customer", join_depth=0, backref_depth=0)
    assert tree.root.all_tables() == ["customer"]


def test_self_edge_visited_once():
    # each FK edge traversed at most once tree-wide (cycle guard)
    tree = build_relation_tree(TPCH_CATALOG, "lineitem", join_depth=9, backref_depth=9)
    edges = []
    for node in tree.root.walk():
        if node.relationship:
            edges.append(node.relationship.fk_name)
    assert len(edges) == len(set(edges))


def test_include_prunes():
    tree = build_relation_tree(
        TPCH_CATALOG, "region", join_depth=10**6, backref_depth=10**6,
        include=["customer"], exclude=["events", "supplier"],
    )
    assert tree.root.all_tables() == ["region", "nation", "customer"]


def test_render_mentions_arity():
    tree = build_relation_tree(TPCH_CATALOG, "nation", join_depth=1, backref_depth=1)
    art = tree.render()
    assert "¹ region" in art
    assert "ⁿ" in art
    assert "tables loaded" in art


def test_normalize_query_defaults():
    spec = normalize_query({"from": "customer", "limit": "no"})
    assert spec.limit is None
    assert spec.backref_limit == 50
    spec2 = normalize_query({"from": "customer"}, {"default_limit": 7})
    assert spec2.limit == 7


def test_include_sets_unlimited_depths():
    spec = normalize_query({"from": "region", "include": ["customer"]})
    assert spec.join_depth >= 10**6 and spec.backref_depth >= 10**6


def test_synthesize_pk():
    assert synthesize_pk(["id", "name"]) == (("id",), True)
    assert synthesize_pk(["name", "user_id"]) == (("user_id",), True)
    assert synthesize_pk(["a", "b"]) == (("a", "b"), True)
